"""Reusable relational/analytic operators beyond plain DataFrame calls:
sessionization, as-of joins, top-k per group — the extension surface for
the events/TPC-H-ish tables (SURVEY.md section 2.10).

Everything composes built-in window/join primitives: one hash shuffle on
the partition key, no UDFs, AQE-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_minutes``. Adds ``session_seq``
    (per-user session ordinal, 1-based).

    Classic lag + cumulative-sum: one shuffle on ``user_col``; both window
    passes share the same partitioning so Catalyst plans a single
    exchange."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *id_cols)
    gap_usec = F.unix_micros(F.col(ts_col)) - F.lag(
        F.unix_micros(F.col(ts_col))
    ).over(w)
    is_new = F.when(
        gap_usec.isNull() | (gap_usec > int(gap_minutes * 60 * 1_000_000)), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session aggregates: event count, span seconds, start/end."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 1_000_000.0
        ).alias("span_sec"),
    )


def asof_join_last_event(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    mark: Column | None = None,
    mark_name: str = "anchor",
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """As-of join within one stream: attach to every row the timestamp of
    the most recent *marked* row (``mark`` predicate) at or before it, per
    key. The classic Spark formulation: conditional last_value with
    ignorenulls over an unbounded-preceding window — equivalent to an
    ASOF JOIN but with ONE shuffle and no range join explosion."""
    if mark is None:
        raise ValueError("mark predicate required")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *id_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked_ts = F.when(mark, F.col(ts_col))
    return events.withColumn(
        f"last_{mark_name}_ts", F.last(marked_ts, ignorenulls=True).over(w)
    )


def asof_join_two_tables(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_vals: tuple[str, ...],
    right_vals: tuple[str, ...],
    right_tiebreak: tuple[str, ...] | None = None,
) -> DataFrame:
    """General two-table as-of join: for each left row, the latest right
    row with ``right_ts <= left_ts`` on the same key. Union trick: tag both
    sides, sort within key by time, carry right values forward with
    last(ignorenulls), keep left rows. ONE shuffle on ``key`` and no
    range-join explosion — the 100 TB-safe formulation.

    Output: (key, left_ts, *left_vals, *asof_<right_vals>). Ties
    (right_ts == left_ts): the right row sorts first (side 0 < 1), so a
    simultaneous right row IS visible — standard ASOF `<=` semantics.

    When several right rows share (key, right_ts), the carried row is the
    LAST one ordered by ``right_tiebreak`` (default: ``right_vals``), so
    results are deterministic across runs and partitionings — a
    sort-order-dependent pick here would make oracle comparisons flaky."""
    if right_tiebreak is None:
        right_tiebreak = right_vals
    extra = tuple(c for c in right_tiebreak if c not in right_vals)
    lt = left.select(
        F.col(key), F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        *[F.col(c) for c in left_vals],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in (*right_vals, *extra)
        ],
    )
    rt = right.select(
        F.col(key), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_vals],
        *[F.col(c) for c in (*right_vals, *extra)],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", *[F.col(c) for c in right_tiebreak])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lt.unionByName(rt).select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col(key),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left_vals],
        *[F.col(f"asof_{c}") for c in right_vals],
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
) -> DataFrame:
    """Dense idiom for per-group top-k (row_number ≤ k). Single shuffle;
    at scale prefer this over per-group sorts or collect_list."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def range_join_point_in_interval(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_micros: int,
) -> DataFrame:
    """Range join — every (left, right) pair on the same ``key`` where
    ``right_start <= left_point < right_end`` — via BUCKETIZATION, the
    equi-join reduction Spark lacks natively (a naive theta join plans as
    a per-key cross product; Catalyst has no interval-join strategy, so
    at crawl scale the inner loop explodes on hot keys).

    Trick: points and intervals are mapped onto fixed ``bucket_micros``
    buckets of the epoch-microsecond axis. A point falls in EXACTLY ONE
    bucket; an interval explodes to every bucket it overlaps. The join is
    then a plain equi join on (key, bucket) plus the residual range
    predicate — and because the point's bucket is unique, each qualifying
    pair meets exactly once: NO distinct pass needed.

    Sizing: explode factor per right row ≈ interval_len / bucket_micros
    (+1); join selectivity within a bucket falls as buckets shrink. Set
    ``bucket_micros`` to the TYPICAL interval length — intervals then
    explode to ~2 buckets while unrelated points stay separated. All
    columns of both inputs are preserved; callers ensure distinct names.

    Timestamps are compared in integer epoch microseconds (DATE columns
    cast to midnight timestamps first), the same integer discipline as
    events_trailing_hour — float seconds would drift cross-engine."""
    lp = F.unix_micros(F.col(left_point).cast("timestamp"))
    rs = F.unix_micros(F.col(right_start).cast("timestamp"))
    re_ = F.unix_micros(F.col(right_end).cast("timestamp"))
    lb = left.withColumn("_pb", F.floor(lp / bucket_micros))
    rb = right.withColumn("_sb", F.floor(rs / bucket_micros)).withColumn(
        # end is EXCLUSIVE: an interval ending exactly on a bucket
        # boundary does not reach into that bucket
        "_eb",
        F.floor((re_ - 1) / bucket_micros),
    )
    rb = rb.withColumn(
        "_b",
        F.explode(
            # guard: empty/negative intervals get no buckets (Spark's
            # sequence(a, b) runs DESCENDING when b < a — without the
            # guard an empty interval would fabricate buckets)
            F.when(
                F.col("_eb") >= F.col("_sb"),
                F.sequence(F.col("_sb"), F.col("_eb")),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    ).drop("_sb", "_eb")
    joined = lb.join(
        rb,
        (lb[key] == rb[key]) & (F.col("_pb") == F.col("_b")),
    ).drop(rb[key]).drop("_pb", "_b")
    return joined.filter(
        (F.unix_micros(F.col(right_start).cast("timestamp"))
         <= F.unix_micros(F.col(left_point).cast("timestamp")))
        & (F.unix_micros(F.col(left_point).cast("timestamp"))
           < F.unix_micros(F.col(right_end).cast("timestamp")))
    )
