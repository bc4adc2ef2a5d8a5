"""Physical-data-layout operators: compaction planning, elastic
resharding, and Z-order (Morton) clustering.

These are the table-maintenance jobs a 100 TB lakehouse runs nightly:
bin-packing small files into target-size rewrite groups (the
small-files problem), deciding how much data moves when the shard
count changes (mod-hash vs rendezvous hashing), and laying rows out
along a space-filling curve so min/max file statistics prune
multi-dimensional predicates.

All three are pure column arithmetic over catalog-sized or row-sized
inputs — no UDFs, no collects — so every one has a bit-exact DuckDB
oracle twin in the registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    manifest: DataFrame,
    bytes_col: str = "bytes",
    order_col: str = "file",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Assign each file of a manifest to a compaction bin by sequential
    fill: walk the files in deterministic ``order_col`` order and start a
    new bin whenever the running total crosses ``target_bytes`` — i.e.
    ``bin_id = floor(cum_bytes_before_this_file / target)``. This is the
    rewrite planner for the lakehouse small-files problem (Iceberg's
    ``rewrite_data_files`` / Delta OPTIMIZE use the same
    order-then-cut rule for sort-preserving compaction): the running
    total crosses one bin boundary per bin (cumulative bytes through
    bin k ≥ (k+1)·target for every non-final bin), each bin holds less
    than target + one file, and adjacent files stay adjacent so any
    sort order the manifest encodes survives the rewrite.

    Output: the manifest plus ``bin_id`` (0-based), ``bin_files``,
    ``bin_bytes`` (per-bin totals, repeated on each member row).

    Scale shape: the input is a FILE CATALOG, not data — 100 TB at
    128 MB/file is ~800k rows, kilobytes per shuffle. The cumulative
    sum is one ordered window; at catalog scale a single-partition
    window is the right plan (cheaper than a two-level prefix-sum
    decomposition whose merge step would dominate), and the per-bin
    rollup joins back on bin_id with AQE free to broadcast the
    bin-count side."""
    w = Window.orderBy(F.col(order_col).asc())
    planned = manifest.withColumn(
        "bin_id",
        F.floor(
            (
                F.coalesce(
                    F.sum(bytes_col).over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            )
            / F.lit(int(target_bytes))
        ).cast("bigint"),
    )
    totals = planned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("bin_files"),
        F.sum(bytes_col).cast("bigint").alias("bin_bytes"),
    )
    return planned.join(totals, "bin_id")


def clustering_depth(
    manifest: DataFrame,
    min_col: str = "min_key",
    max_col: str = "max_key",
) -> DataFrame:
    """Clustering-depth audit over a file manifest's per-file key
    ranges — the metric that decides WHEN to re-cluster (Delta
    OPTIMIZE / Iceberg rewrite planners use the same signal): for every
    point of the key space, how many files' [min_key, max_key] ranges
    cover it, i.e. how many files a point lookup or range scan must
    open after min/max pruning. Depth 1 everywhere = perfectly
    clustered; depth ≈ #files = the table needs a re-sort.

    Sweep-line over range boundaries: +1 at each file's min, −1 just
    past its max, cumulative-sum in key order — the same prefix-sum
    reduction as the session-concurrency operator, over a CATALOG-sized
    input. Output: the constant-depth segments
    ``(k_start, k_end, depth)`` with depth > 0 (inclusive bounds,
    integer keys), deterministic and oracle-twinnable.

    Scale shape: the input is a file catalog (~800k rows at 100 TB /
    128 MB), so the single-partition ordered window is the right plan —
    same adjudication as compaction_plan's cumulative fill."""
    pts = manifest.select(
        F.col(min_col).cast("long").alias("k"), F.lit(1).alias("d")
    ).unionAll(
        manifest.select(
            (F.col(max_col).cast("long") + 1).alias("k"), F.lit(-1).alias("d")
        )
    )
    agg = pts.groupBy("k").agg(F.sum("d").alias("dd"))
    w = Window.orderBy("k")
    return (
        agg.withColumn(
            "depth",
            F.sum("dd")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("int"),
        )
        .withColumn("k_end", F.lead("k").over(w) - 1)
        .filter(F.col("k_end").isNotNull() & (F.col("depth") > 0))
        .select(F.col("k").alias("k_start"), "k_end", "depth")
    )


def rendezvous_shard(
    id_col: Column | str, n_shards: int, salt: str = "hrw"
) -> Column:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1996): every (row, shard) pair gets the score
    ``md5(salt:id:shard)`` and the row lands on the argmax shard. The
    defining property — and the reason consistent schemes exist at all —
    is MINIMAL movement under elasticity: growing N→M moves only the
    rows whose new-shard score beats their old winner, an expected
    ``1 − N/M`` fraction, and every move lands on a NEW shard. Mod-hash
    (``hash % N``) reshuffles an expected ``1 − 1/M`` of ALL rows.

    Pure codegen column arithmetic: an inline array of ``n_shards``
    (score, shard) structs reduced by ``array_max`` (struct ordering =
    score first, shard as tiebreak). ``n_shards`` is a cluster
    dimension (tens to thousands), not a data dimension, so the
    per-row work is a bounded constant and nothing shuffles."""
    ident = F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string")
    return F.array_max(
        F.array(
            *[
                F.struct(
                    F.md5(
                        F.concat_ws(":", F.lit(salt), ident, F.lit(str(s)))
                    ).alias("h"),
                    F.lit(s).alias("s"),
                )
                for s in range(n_shards)
            ]
        )
    )["s"]


def reshard_moves(
    df: DataFrame,
    id_col: str,
    n_old: int,
    n_new: int,
    salt: str = "hrw",
) -> DataFrame:
    """Movement matrix for growing a sharded corpus ``n_old → n_new``
    under both schemes: one row per (scheme, old_shard, new_shard) with
    its row count — the off-diagonal mass IS the data that must
    physically move. ``scheme`` ∈ {'hrw', 'mod'}: rendezvous hashing
    moves an expected ``1 − n_old/n_new`` of rows (all onto the added
    shards — every hrw off-diagonal row has ``new_shard >= n_old``,
    unit-pinned); mod-hash moves almost everything. This is the
    capacity-planning query behind any rebalance: multiply the moved
    fraction by the table size to cost the migration.

    Scale shape: two inline score-argmax columns (hrw) and two modulos
    (mod) per row — one scan — then a groupBy on a ``2·shards²``-sized
    key space. One shuffle with map-side partials; output is
    cluster-dimension-sized, independent of row count."""
    ident = F.col(id_col).cast("string")
    bucket = F.conv(F.substring(F.md5(ident), 1, 14), 16, 10).cast("long")
    assigned = df.select(
        rendezvous_shard(id_col, n_old, salt).alias("hrw_old"),
        rendezvous_shard(id_col, n_new, salt).alias("hrw_new"),
        (bucket % n_old).cast("int").alias("mod_old"),
        (bucket % n_new).cast("int").alias("mod_new"),
    )
    hrw = assigned.groupBy(
        F.lit("hrw").alias("scheme"),
        F.col("hrw_old").alias("old_shard"),
        F.col("hrw_new").alias("new_shard"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    mod = assigned.groupBy(
        F.lit("mod").alias("scheme"),
        F.col("mod_old").alias("old_shard"),
        F.col("mod_new").alias("new_shard"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    return hrw.unionByName(mod)


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton/Z-order interleave of two ``bits``-wide non-negative
    integer columns into one ``2·bits``-wide key: bit i of x lands at
    position 2i+1, bit i of y at 2i. Sorting by this key lays rows out
    along the Z space-filling curve, so any contiguous key range spans
    a bounded rectangle in (x, y) — the property min/max file statistics
    need to prune BOTH dimensions (Morton 1966; the same layout behind
    Delta/Iceberg ZORDER BY).

    This is the RAW 2-D interleave primitive over already-integer
    columns — exact integer arithmetic with a bit-exact SQL twin, which
    is what the oracle-verified audit query needs.
    ``sources/sinks.zorder_key`` is the production n-D wrapper (min-max
    quantizes arbitrary numeric columns first) and
    ``sources/sinks.write_zordered`` the writer that materializes the
    layout this function audits.

    Unrolled shift-mask-or per bit — whole-stage-codegen integer ops,
    no UDF, no lookup table."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
            ).bitwiseOR(
                F.shiftleft(F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
            )
        )
    return z


def zorder_bucket_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    bucket_shift: int = 8,
) -> DataFrame:
    """Locality audit of a Z-order layout: bucket rows by the top bits of
    their Morton key (each bucket ≈ one output file under a
    sort-by-z write) and report each bucket's (x, y) bounding box —
    ``x_span·y_span`` is exactly the min/max-statistics rectangle a
    reader must scan for a point/range predicate touching the bucket.
    Tight boxes on BOTH axes are the Z-curve's win over a plain sort,
    which is tight on its leading axis and full-range on the other
    (asserted by the layout unit tests, and visible here in the span
    columns).

    One scan computing the interleave, one groupBy on the bucket key —
    map-side partial min/max, bounded output (``2^(2·bits −
    bucket_shift)`` rows)."""
    zb = df.select(
        x.cast("bigint").alias("xv"), y.cast("bigint").alias("yv")
    ).select(
        "xv",
        "yv",
        F.shiftright(zorder_value(F.col("xv"), F.col("yv"), bits), bucket_shift).alias(
            "z_bucket"
        ),
    )
    return zb.groupBy("z_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xv").alias("x_min"),
        F.max("xv").alias("x_max"),
        F.min("yv").alias("y_min"),
        F.max("yv").alias("y_max"),
        (F.max("xv") - F.min("xv")).alias("x_span"),
        (F.max("yv") - F.min("yv")).alias("y_span"),
    )
