#!/usr/bin/env python
"""Second measured scale decade: sf0.1 -> sf1 -> sf10 for the headline
relational + text/dedup subset. The sf1 sweep (scripts/sf1_headroom.py)
measures one 10x step; this harness replicates sf0.1 100x (keys offset
per replica, replica text mutated through a bijective affine letter
cipher so the 100 copies are NOT near-duplicates of each other) and
records BOTH decades' wall ratios in SCALE2_STRESS.json — turning
"the plans survive 100x" from an extrapolation into two measured
decades (VERDICT r6 item 4).

Replica-mutation note: sf1's Caesar rotation gives only 26 distinct
alphabets, so at 100 replicas copies i and i+26 would be byte-identical
and every pair-emitting dedup query's output would grow ~100x for DATA
reasons. The affine family psi(x) = a*x + b mod 26 with
a in {1, 3, 5, 7} coprime to 26 and b in 0..25 yields 104 distinct
bijections — word lengths, repetition patterns, and k-gram diversity
are preserved within each replica (same pair/dup topology as the base
corpus), while shingle sets across replicas are disjoint with
overwhelming probability.

Only the tables the query subset touches are generated (lineitem,
orders, customer, supplier, part, region, nation, documents — events
and embeddings are not in the subset), keeping the sf10 footprint to a
few GB.

Usage: python scripts/scale2_stress.py [--regen]
"""

from __future__ import annotations

import json
import sys
import time
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
SF10 = "/tmp/sf10"
FACTOR = 100
FACTOR_PER_DECADE = 10
OFFSET = 1_000_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "region": [],
    "nation": [],
}

# The fixed subset VERDICT r6 item 4 prescribes: the 3 headline TPC-H
# shapes, the 2 flagship text aggregates, and the 3 highest
# superlinear-risk self-join plans.
QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q18_large_orders",
    "wordcount_top100",
    "doc_term_counts",
    "minhash_near_dups",
    "vocab_fuzzy_pairs",
    "media_audio_dup_pairs",
    # round-8 (VERDICT r7 item 3): one URL-family and one boilerplate
    # query get a measured second decade — the rollup exercises the
    # canonicalizer + keep-first election + host groupBy, the rewrite
    # exercises the line explode + per-doc window + struct-sorted rebuild
    "host_quality_rollup",
    "main_content_extract",
    # round-8 continuation: the pointer-doubling iterative shape and the
    # sitemap keep-first + anti-join discovery get a measured second
    # decade (both derive solely from documents, which the sf10 replica
    # carries)
    "redirect_chain_resolution",
    "sitemap_new_urls",
    # round-8 continuation: the eval family's distinct-score prefix sums
    # (NB trains on 10x docs; the score axis grows but stays tiny vs the
    # corpus) and the DUST residual groupBy chain (param explode grows
    # with data — near-data-factor expected) get a second decade; both
    # derive solely from documents
    "nb_margin_auc",
    "dust_param_rules",
]

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_DIGIT = "0123456789"


def _affine_alphabet(i: int) -> str:
    a = (1, 3, 5, 7)[i // 26]
    b = i % 26
    return "".join(_ALPHA[(a * j + b) % 26] for j in range(26))


def regenerate(spark) -> None:
    from pyspark.sql import functions as F

    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    Path(SF10).mkdir(parents=True, exist_ok=True)
    for name, keys in KEY_COLS.items():
        df = load_table(spark, SRC, name)
        if keys:
            reps = []
            for i in range(FACTOR):
                rep = df
                for c in keys:
                    rep = rep.withColumn(c, F.col(c) + F.lit(i * OFFSET))
                if name == "documents" and i > 0:
                    tgt = _affine_alphabet(i)
                    rot_d = _DIGIT[i % 10:] + _DIGIT[: i % 10]
                    rep = rep.withColumn(
                        "text",
                        F.translate(
                            "text",
                            _ALPHA + _ALPHA.upper() + _DIGIT,
                            tgt + tgt.upper() + rot_d,
                        ),
                    )
                reps.append(rep)
            df = reduce(lambda a, b: a.unionByName(b), reps)
        df.write.mode("overwrite").parquet(f"{SF10}/{name}.parquet")
        print(f"wrote {name}", file=sys.stderr)


def main() -> None:
    from week5_datingnlp_big_data_spark import registry
    from week5_datingnlp_big_data_spark.session import get_spark

    spark = get_spark("scale2-stress")
    if "--regen" in sys.argv or not Path(SF10, "lineitem.parquet").exists():
        t0 = time.perf_counter()
        regenerate(spark)
        print(f"regen sf10: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    if not Path(SF1, "lineitem.parquet").exists():
        # sf1 fixture shared with the headroom sweep
        import importlib

        sf1 = importlib.import_module("scripts.sf1_headroom")
        sf1.regenerate(spark)

    results: dict[str, dict] = {}
    for sf_label, sf_dir in [("sf0.1", SRC), ("sf1", SF1), ("sf10", SF10)]:
        for name in QUERIES:
            # cache-cold min-of-2 (the sf1 harness's measured rationale:
            # first-run JIT/GC tails fake ratios; persisted intermediates
            # fake cache hits)
            best, n = None, 0
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = registry.QUERIES[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[sf_label] = round(best, 3)
            results[name][f"rows_{sf_label}"] = n
            print(f"{sf_label} {name}: {best:.2f}s rows={n}", file=sys.stderr)

    # Two-decade flag rule. The first decade keeps sf1_headroom's
    # tightened early-warning rule — wall ratio > max(3, output growth)
    # — because at sf0.1 fixed overhead masks quadratics (round 4
    # measured a real one at 6.85x, under the naive `> FACTOR` bar).
    # The second decade CANNOT reuse that rule: a scan query whose sf1
    # wall was still overhead-dominated legitimately approaches the
    # data factor at sf10 (q5: 1.76 s -> 9.9 s = 5.6x wall for 10x data
    # — SUBLINEAR), so max(3, growth) mass-false-positives exactly the
    # healthy plans. A d2 flag fires only for TRUE superlinearity
    # (wall growth beyond both the data factor and the output growth)
    # or for growth > max(3, output) CONSISTENT across both decades
    # (the masked-quadratic signature: d1 already ran hot).
    flagged = []
    for name, r in results.items():
        for lo, hi, tag in [("sf0.1", "sf1", "d1"), ("sf1", "sf10", "d2")]:
            ratio = round(r[hi] / max(r[lo], 1e-9), 2)
            growth = r[f"rows_{hi}"] / max(r[f"rows_{lo}"], 1)
            r[f"ratio_{tag}"] = ratio
            if tag == "d1":
                thr = round(max(3.0, growth), 2)
                hot = ratio > thr
            else:
                thr = round(max(FACTOR_PER_DECADE, growth), 2)
                hot = ratio > thr or (
                    ratio > max(3.0, growth)
                    and r["ratio_d1"] > r["flag_threshold_d1"]
                )
            r[f"flag_threshold_{tag}"] = thr
            if hot and r[hi] > 1.0:
                flagged.append(f"{name}:{tag}")

    # adjudication in a FRESH session (heap/GC contamination after the
    # sweep is measured fact — see sf1_headroom's round-6 note)
    adjudicated = {}
    if flagged:
        spark.stop()
        spark = get_spark("scale2-adjudicate")

        def _min_of(name: str, sf_dir: str, reps: int = 4) -> float:
            best = None
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                registry.QUERIES[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        dirs = {"d1": ("sf0.1", SRC, "sf1", SF1), "d2": ("sf1", SF1, "sf10", SF10)}
        still = []
        for item in flagged:
            name, tag = item.split(":")
            lo_l, lo_d, hi_l, hi_d = dirs[tag]
            lo_t = _min_of(name, lo_d)
            hi_t = _min_of(name, hi_d)
            ratio = round(hi_t / max(lo_t, 1e-9), 2)
            adjudicated[item] = {
                lo_l: round(lo_t, 3), hi_l: round(hi_t, 3), "ratio": ratio,
            }
            if ratio > results[name][f"flag_threshold_{tag}"]:
                still.append(item)
        flagged = still

    out = {
        "factor_per_decade": 10,
        "decades": ["sf0.1->sf1", "sf1->sf10"],
        "sf10_tables": sorted(KEY_COLS),
        "queries": results,
        "totals": {
            lbl: round(sum(r[lbl] for r in results.values()), 3)
            for lbl in ("sf0.1", "sf1", "sf10")
        },
        "flagged_superlinear": sorted(flagged),
        "adjudicated": adjudicated,
    }
    Path("SCALE2_STRESS.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out["totals"]))


if __name__ == "__main__":
    main()
