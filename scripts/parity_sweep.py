#!/usr/bin/env python
"""Oracle parity sweep at an arbitrary scale factor (default sf0.1 — 10x
the driver's correctness gate). The per-round gate runs at sf0.01 and the
in-repo test gate at sf0.001; this sweep exists because some divergence
is SCALE-DEPENDENT and invisible down there: the events_hourly avg/ulp
boundary (found by this sweep, 2026-08-14: round(avg(value),6) split
43.472812/43.472813 across engines at sf0.1 only — fixed by deriving avg
from the rounded sum) needed thousands of groups before a mean landed on
a 6-dp rounding boundary.

Usage: python scripts/parity_sweep.py [sf_dir]      (~12 min at sf0.1)
Exit status is nonzero on any mismatch.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm(v):
    # Fold NULL/NaT/NaN to one marker and stringify everything else —
    # pandas NaT != NaT, so a raw-value compare false-flags any query
    # emitting NULL timestamps (user_state_scd2's open intervals did
    # exactly that, 2026-08-15). The driver hashes string forms and
    # accepts NULLs; this mirrors it (same rule as the /verify recipe).
    import pandas as pd

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    return str(round(v, 6)) if isinstance(v, float) else str(v)


def main() -> None:
    import __spark_entry__ as e
    from week5_datingnlp_big_data_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("parity-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad, n = [], 0
    t0 = time.time()
    for name, fn in e.queries().items():
        sql = e.oracle_sql().get(name)
        if sql is None:
            continue
        n += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(sql).df()
            cols = sorted(sdf.columns)
            ok = (
                cols == sorted(odf.columns)
                and sorted(
                    tuple(norm(v) for v in r)
                    for r in sdf[cols].itertuples(index=False)
                )
                == sorted(
                    tuple(norm(v) for v in r)
                    for r in odf[cols].itertuples(index=False)
                )
            )
        except Exception as ex:  # noqa: BLE001 — a crash IS a mismatch
            ok = False
            print(f"{name} EXC {str(ex)[:200]}", file=sys.stderr)
        if not ok:
            bad.append(name)
            print(f"{name} MISMATCH", file=sys.stderr)
    print(
        f"parity sweep @ {sf_dir}: {n} oracle-backed queries, "
        f"{len(bad)} mismatches, {time.time() - t0:.0f}s"
    )
    if bad:
        raise SystemExit(f"mismatches: {bad}")


if __name__ == "__main__":
    main()
