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


# Count-Min parameters are operator knobs, not data-dependent: the sketch
# table is exactly depth × width cells regardless of corpus size.
CMS_PRIME = 2147483647  # 2^31 − 1, same Mersenne modulus as the MinHash family


def _cms_cells(depth: int, width: int):
    """Per-token (row, bucket) cells via a Kirsch-Mitzenmacher md5 double
    hash reduced mod width — shared by build and probe so they cannot
    drift; mirrored in the registry's DuckDB twin."""
    digest = F.md5("tok")
    p = F.lit(CMS_PRIME)
    h1 = F.conv(F.substring(digest, 1, 14), 16, 10).cast("long") % p
    h2 = F.conv(F.substring(digest, 17, 14), 16, 10).cast("long") % p
    return F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda r: F.struct(
                r.cast("int").alias("row"),
                ((h1 + r * h2) % width).cast("int").alias("bucket"),
            ),
        )
    )


def tokenize_whitespace(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One (tok) row per token occurrence — the cheap lowercase whitespace
    tokenization the shingle/span family uses."""
    words = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), "\\s+"),
        lambda w: F.length(w) > 0,
    )
    return docs.select(F.explode(words).alias("tok"))


def countmin_from_tokens(tokens: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a token stream
    as a TABLE of counters: (row, bucket, c), ≤ depth×width rows.

    Each of the ``depth`` hash rows buckets a token by an md5 double hash
    mod ``width``; a token's estimate is the MIN of its cells across rows
    and NEVER undercounts (est ≥ true; overcounting only from collisions —
    the one-sided error that makes CMS safe for heavy-hitter screens and
    frequency caps). Like the Bloom filter and HLL here, the sketch is
    MERGEABLE — two slices' tables combine by summing cells — so per-day
    token-frequency state for a crawl is a depth×width grid, not a
    vocabulary-sized table. And because the hashing is md5-derived (no
    seeds), the sketch — unlike HLL — is bit-identical in the DuckDB
    oracle, so the driver value-verifies every cell path end to end.
    One explode + one groupBy on (row, bucket): uniform keys, map-side
    partial sums, tiny shuffle."""
    return (
        tokens.select(_cms_cells(depth, width).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def token_countmin_sketch(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Corpus token-frequency Count-Min sketch; see countmin_from_tokens."""
    return countmin_from_tokens(tokenize_whitespace(docs, text_col), depth, width)


def cms_estimate_from_sketch(
    sketch: DataFrame,
    probe_tokens: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimate frequencies for a (tok) probe table against a built
    sketch: (tok, cms_est). The sketch side is a bounded broadcast
    (≤ depth×width rows, a fixed parameter); absent cells are zero
    counters. est = min over rows of the token's cell."""
    probes = probe_tokens.select("tok", _cms_cells(depth, width).alias("cell")).select(
        "tok", F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )
