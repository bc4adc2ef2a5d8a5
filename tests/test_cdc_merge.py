"""apply_changelog / latest_state: the compaction invariant at every
cutoff, delete/re-insert cycles, and broadcastable-anti-join shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import relational

SCHEMA = "user_id bigint, ts timestamp, event_id bigint, op string, v double"


def _log(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), e, op, v)
         for u, s, e, op, v in rows],
        SCHEMA,
    )


ROWS = [
    # user 1: insert, update, update — survives with last value
    (1, 1, 10, "I", 1.0), (1, 5, 11, "U", 2.0), (1, 9, 12, "U", 3.0),
    # user 2: insert then delete — gone
    (2, 2, 20, "I", 1.0), (2, 7, 21, "D", 0.0),
    # user 3: insert, delete, REINSERT — survives with the reinsert
    (3, 1, 30, "I", 5.0), (3, 4, 31, "D", 0.0), (3, 8, 32, "I", 7.0),
    # user 4: same-ts tie broken by event_id — the later id wins
    (4, 6, 40, "I", 1.0), (4, 6, 41, "U", 9.0),
    # user 5: only a delete
    (5, 3, 50, "D", 0.0),
]


def _state(df):
    return {
        r["user_id"]: (r["op"], r["v"], r["event_id"])
        for r in df.collect()
    }


def test_latest_state_basics(spark):
    log = _log(spark, ROWS)
    snap = relational.latest_state(
        log, ["user_id"], ["ts", "event_id"], "op", ("D",)
    )
    assert _state(snap) == {
        1: ("U", 3.0, 12),
        3: ("I", 7.0, 32),
        4: ("U", 9.0, 41),
    }


def test_merge_invariant_at_every_cutoff(spark):
    log = _log(spark, ROWS)
    want = _state(
        relational.latest_state(
            log, ["user_id"], ["ts", "event_id"], "op", ("D",)
        )
    )
    for cutoff_s in range(0, 11):
        cut = datetime(2024, 1, 1, 0, 0, cutoff_s)
        base = relational.latest_state(
            log.filter(F.col("ts") <= F.lit(cut)),
            ["user_id"], ["ts", "event_id"], "op", ("D",),
        )
        merged = relational.apply_changelog(
            base,
            log.filter(F.col("ts") > F.lit(cut)),
            ["user_id"], ["ts", "event_id"], "op", ("D",),
        )
        assert _state(merged) == want, f"cutoff={cutoff_s}"


def test_merge_empty_changelog_is_identity(spark):
    log = _log(spark, ROWS)
    base = relational.latest_state(
        log, ["user_id"], ["ts", "event_id"], "op", ("D",)
    )
    merged = relational.apply_changelog(
        base, log.filter(F.lit(False)),
        ["user_id"], ["ts", "event_id"], "op", ("D",),
    )
    assert _state(merged) == _state(base)


def test_merge_delete_only_changelog_empties_key(spark):
    log = _log(spark, [(1, 1, 10, "I", 1.0), (9, 2, 90, "I", 4.0)])
    base = relational.latest_state(
        log, ["user_id"], ["ts", "event_id"], "op", ("D",)
    )
    changes = _log(spark, [(9, 5, 91, "D", 0.0)])
    merged = relational.apply_changelog(
        base, changes, ["user_id"], ["ts", "event_id"], "op", ("D",)
    )
    assert _state(merged) == {1: ("I", 1.0, 10)}
