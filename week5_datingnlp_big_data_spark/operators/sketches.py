"""Mergeable-sketch analytics: HLL distinct counts and quantile sketches.

The 100 TB pattern these demonstrate: a sketch is a small, MERGEABLE
partial aggregate — each partition (or source, or day) builds its own,
and any grouping rolls up by merging sketches WITHOUT rescanning data.
That is how a trillion-row pipeline answers "distinct documents per
source AND overall" in one pass, and how per-shard quantiles combine
into global ones. Spark 4 ships Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg``); quantiles use
``approx_percentile`` (KLL-style bounded-memory summary).

Estimates are deterministic for a given dataset (register updates are
commutative max operations, so partitioning/order don't change the
result) — safe for the driver's rerun-stability contract — but
algorithm-specific, so there is no DuckDB hash-match: rows-only at the
driver + tolerance tests against exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_distinct_hll(
    docs: DataFrame,
    key_col: str = "text",
    group_col: str = "source",
    lg_k: int = 12,
) -> DataFrame:
    """Distinct-content estimate per source PLUS a merged '__all__' row:
    one scan builds per-source HLL sketches over the content hash; the
    global row is a sketch MERGE of the per-source sketches (hll_union_agg
    over already-built sketches — no second scan). Output:
    ``(source, n_docs, est_distinct)``."""
    hashed = docs.select(
        F.col(group_col).alias("source"), F.sha2(F.coalesce(F.col(key_col), F.lit("")), 256).alias("h")
    )
    per_source = hashed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.hll_sketch_agg("h", F.lit(lg_k)).alias("sk"),
    )
    # Roll-up WITHOUT rescanning: merge the per-source sketches.
    merged = per_source.agg(
        F.lit("__all__").alias("source"),
        F.sum("n_docs").alias("n_docs"),
        F.hll_union_agg("sk").alias("sk"),
    )
    return (
        per_source.unionByName(merged)
        .select(
            "source",
            "n_docs",
            F.hll_sketch_estimate("sk").alias("est_distinct"),
        )
    )


def value_quantile_sketch(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles of a numeric column via Spark's
    bounded-memory percentile summary (mergeable across partitions — the
    per-executor summaries combine exactly like the HLL sketches above).
    Output: ``(group, n, q50, q90, q99)``-style columns, rounded to 6dp
    for rerun stability."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.round(
            F.approx_percentile(F.col(value_col), F.lit(q), F.lit(accuracy)), 6
        ).alias(f"q{int(q * 100)}")
        for q in quantiles
    ]
    return events.groupBy(F.col(group_col).alias("grp")).agg(*aggs)
