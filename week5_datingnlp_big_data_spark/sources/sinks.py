"""Sinks: parquet/CSV writers + model persistence.

Reference S4 (Week5_datingNLP.R:249): ``save(file='Week5_datingNLP.rdata',
tree, all.tokens.tfidf)`` — a binary blob of model + matrix (stripped from
the repo for size, per .MISSING_LARGE_BLOBS). The Spark-native equivalents
are columnar, splittable, and schema'd: parquet for data, the MLlib
writer for models.

Scale: ``partition_by`` turns a write into a partition-pruned layout
(readers of one key touch one directory); ``bucket_by`` pre-shuffles so
later joins/aggs on the bucket key skip their exchange. Use
``repartition(cols)`` before a partitioned write so each output partition
is written by one task (avoids the many-small-files explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    coalesce_small: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` → hive-style directory layout;
    ``coalesce_small`` caps output files for small results."""
    out = df.coalesce(coalesce_small) if coalesce_small else df
    if partition_by:
        out = out.repartition(*[out[c] for c in partition_by])
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (reference-corpus fidelity path)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (the interchange format most training-data
    pipelines speak): one JSON object per line, splittable by newline.
    Columnar formats beat it at rest — this is the export/ingest edge."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema — never schema
    inference, which at 100 TB costs a full pre-scan and silently widens
    types on dirty rows. Corrupt lines land in no column and the row
    comes back null-filled (PERMISSIVE mode), so ingest stays total."""
    return spark.read.schema(schema).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """ORC sink — Spark's other native columnar format (Hive ecosystems
    standardize on it). Same pushdown/pruning behavior as parquet from
    Catalyst's side; same partition-layout rules as write_parquet."""
    out = df
    if partition_by:
        out = out.repartition(*[out[c] for c in partition_by])
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def save_model(model, path: str) -> None:
    """MLlib model sink (S4's rdata analog): self-describing directory of
    parquet metadata + data, reloadable cross-language."""
    model.write().overwrite().save(path)


def load_pipeline_model(path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table sink: pre-shuffles rows into
    ``num_buckets`` files per partition, clustered on ``bucket_cols``.

    This is the storage-level answer to repeated joins/aggregations on the
    same key at 100 TB: two tables bucketed on the join key with the same
    bucket count join with NO exchange on either side (and no sort, when
    ``sort_cols`` matches the join key) — the shuffle is paid once at
    write time instead of once per query. Requires ``saveAsTable`` (the
    bucket metadata lives in the catalog, not the parquet files); ``path``
    makes it an external table so the data location stays explicit."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog-table reader (bucketed tables keep their clustering spec
    only through this path — ``spark.read.parquet`` on the files would
    discard it)."""
    return spark.table(table)


def write_plot_data(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5 (data layer) — plot-data sink: write a chart-ready table (e.g.
    ml.cluster_plot_data's (id, pc1, pc2, cluster), a t-SNE coordinate
    table, or a top-k frequency table) as a single headered CSV a
    notebook/BI layer renders directly. The reference pipes these tables
    straight into fviz_cluster/plot/rpart.plot (Week5_datingNLP.R:191,
    302-314,322); this engine scopes rendering out (SURVEY section 2.1)
    and ships the data contract instead. coalesce(1) is deliberate and
    safe ONLY because plot tables are small by definition (points on a
    chart) — bulk exports go through write_csv/write_parquet, which keep
    full parallelism."""
    df.coalesce(1).write.mode(mode).option("header", True).csv(path)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) interleave of ``len(cols)`` numeric columns as a
    single BIGINT sort key: each column is min-max quantized to ``bits``
    levels, then the columns' bits are interleaved so that sorting by
    the key clusters rows that are close in EVERY dimension — the
    public Delta/Iceberg OPTIMIZE ZORDER idea expressed as plain
    DataFrame expressions.

    Why: a single-column sorted layout (write_sorted) gives perfect
    min/max pruning on one predicate column and none on the others; the
    Z-curve trades a little per-dimension locality for bounded locality
    on ALL of them, so parquet zone maps prune on any predicate subset.

    Mechanics: per-column global min/max ride ONE 1-row broadcast (no
    driver collect); quantization and the bit interleave are integer
    HOF arithmetic inside codegen. ``bits`` × len(cols) must stay ≤ 62;
    16 bits × 2-3 dims is the practical sweet spot — pruning acts at
    file/row-group granularity, so finer quantization buys nothing.
    NULLs quantize to level 0 (they cluster together at curve start).
    (``operators/layout.zorder_value`` is the raw 2-D integer-column
    primitive with a bit-exact SQL twin; ``layout.zorder_bucket_stats``
    audits the bounding boxes of the layout this key produces.)"""
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit key")
    levels = (1 << bits) - 1
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    )
    tagged = df.crossJoin(F.broadcast(stats))
    quant = []
    for c in cols:
        span = F.col(f"_mx_{c}") - F.col(f"_mn_{c}")
        q = F.when(
            span > 0,
            F.floor(
                (F.col(c).cast("double") - F.col(f"_mn_{c}")) * levels / span
            ),
        ).otherwise(F.lit(0))
        quant.append(F.coalesce(q, F.lit(0)).cast("bigint"))
    # interleave: output bit (i*len(cols) + j) = bit i of column j
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, q in enumerate(quant):
            z = z + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)),
                i * len(cols) + j,
            ).cast("bigint")
    return tagged, z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int | None = None,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional data-skipping layout: range-partition and sort
    on the Z-order key of ``zorder_cols``, so every output file covers a
    bounded hyper-rectangle of the key space and parquet min/max stats
    prune files for predicates on ANY of the clustered columns — the
    companion of :func:`write_sorted` when queries filter on more than
    one high-cardinality column. The transient key never reaches disk."""
    tagged, z = zorder_key(df, zorder_cols, bits)
    keyed = tagged.select(*df.columns, z.alias("_zkey"))
    out = (
        keyed.repartitionByRange(n_files, "_zkey")
        if n_files
        else keyed.repartitionByRange("_zkey")
    )
    out.sortWithinPartitions("_zkey").drop("_zkey").write.mode(mode).parquet(
        path
    )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Zone-map-friendly layout: range-partition on ``sort_cols`` then
    sort within each partition before writing. Parquet stores per-row-
    group min/max statistics; with data globally range-clustered, a
    point/range predicate on the sort column prunes whole FILES and row
    groups at planning/scan time — the third layout lever next to
    partition pruning (write_parquet(partition_by=...)) and bucketing
    (write_bucketed): partitioning prunes by directory on LOW-cardinality
    keys, sorting prunes by statistics on HIGH-cardinality keys where a
    directory per value is impossible.

    ``repartitionByRange`` samples the key distribution, so output files
    hold DISJOINT key ranges (not just locally-sorted rows) — maximal
    stat selectivity. One range exchange; the per-file sort is spill-safe
    ExternalSort. At 100 TB pick ``n_files`` so each file lands near the
    row-group/HDFS-block sweet spot (~128 MB-1 GB)."""
    parts = [F.col(c) for c in sort_cols]
    out = (
        df.repartitionByRange(n_files, *parts)
        if n_files
        else df.repartitionByRange(*parts)
    )
    out.sortWithinPartitions(*parts).write.mode(mode).parquet(path)
