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


def profile_table(df: DataFrame, approx: bool = True) -> DataFrame:
    """One-pass data profiling: per column — null count/fraction,
    distinct count, lexicographic-as-string min/max. The ingest sanity
    check a training pipeline runs before anything else (null spikes,
    cardinality collapses, range drift).

    ``approx=True`` (the scale path) uses HLL for distincts so the whole
    profile is ONE aggregate pass with mergeable state per column;
    ``approx=False`` is exact (Spark plans multi-distinct via expand —
    fine at audit scale, the deterministic choice for the oracle twin).
    Output: (column, n_rows, n_nulls, null_frac, n_distinct, min_value,
    max_value) — min/max cast to string so one schema fits all column
    types."""
    cols = df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
            distinct(c).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.round(F.col(f"_nulls_{c}") / F.greatest(F.col("_n"), F.lit(1)), 6).alias(
                    "null_frac"
                ),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


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
