"""Skew-mitigation utilities: salted aggregation and salted broadcast-side
joins for power-law keys.

The engine's NLP workloads are inherently skewed — term frequencies are
Zipfian (the reference's corpus: 153,385 terms where the head stem covers
millions of occurrences, SURVEY.md section 4). AQE's skew-join splitting
covers sort-merge joins; these helpers cover the remaining cases:

  salted_count        — two-phase count for a groupBy with hot keys
  salted_agg          — general two-phase aggregation (sum/count/min/max)
  salted_broadcast_join — replicate the small side per salt so a hot key's
                        rows spread over N tasks

Partial (map-side) aggregation already absorbs most groupBy skew; salting
matters when the DISTINCT key count is small relative to hot-key volume
(e.g. per-language counts over a 100 TB corpus where 'en' is 60 %)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Row-unique salt: consecutive rows in a partition round-robin over
    the ``n_salts`` buckets via ``monotonically_increasing_id``.

    NOT derived from column values — hashing the row's columns would give
    every occurrence of a hot key the SAME salt (identical rows → identical
    hash), silently defeating the Zipf-head spreading this exists for.
    ``monotonically_increasing_id`` is deterministic for a fixed partition
    layout, and the salt only affects phase-1 grouping: the collapse phase
    makes final results independent of salt assignment."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 16) -> DataFrame:
    """Two-phase count: groupBy(key, salt) pre-aggregates hot keys across
    ``n_salts`` reducers, then a cheap second agg over |keys| × n_salts
    rows collapses the salt. Output: (key_cols..., cnt)."""
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*key_cols, SALT_COL).agg(F.count(F.lit(1)).alias("_c"))
    return phase1.groupBy(*key_cols).agg(F.sum("_c").alias("cnt"))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """General two-phase aggregation for decomposable functions.
    ``aggs`` maps output name → (column, fn) with fn ∈ {sum, count, min,
    max}. (avg = sum/count at the call site; non-decomposable aggs like
    exact distinct need a different strategy.)"""
    _phase = {
        "sum": (F.sum, F.sum),
        "count": (F.count, F.sum),
        "min": (F.min, F.min),
        "max": (F.max, F.max),
    }
    salted = with_salt(df, n_salts)
    p1 = salted.groupBy(*key_cols, SALT_COL).agg(
        *[_phase[fn][0](col).alias(f"_{name}") for name, (col, fn) in aggs.items()]
    )
    return p1.groupBy(*key_cols).agg(
        *[_phase[fn][1](f"_{name}").alias(name) for name, (col, fn) in aggs.items()]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join: salt the big side, replicate the small side once
    per salt value, join on (key, salt). A hot key's rows land in
    ``n_salts`` different tasks instead of one straggler.

    Only needed when the small side is too big for a plain broadcast AND
    the key histogram is pathological; with a true dim table, prefer
    ``F.broadcast`` and let AQE handle the rest."""
    big_s = with_salt(big, n_salts)
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias(SALT_COL))
    small_r = small.crossJoin(F.broadcast(salts))
    out = big_s.join(small_r, [on, SALT_COL], how)
    return out.drop(SALT_COL)
