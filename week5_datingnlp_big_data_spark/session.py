"""SparkSession factory with scale-aware defaults.

Local test runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
configs apply (AQE, arrow, partition sizing) — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "week5_datingnlp_big_data_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
      dynamic broadcast conversion — the first line of defense for the
      power-law skew in ``groupBy(term)`` aggregations.
    - Arrow on: every Pandas UDF (stemmer, vector math) moves batches, not rows.
    - ``spark.sql.shuffle.partitions`` sized to cores locally; AQE coalesces
      down when partitions are small, so oversizing is safe at scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread(df, min_partitions: int | None = None):
    """Ensure enough partitions ahead of CPU-heavy per-row work (tokenize,
    shingle+hash): small/single-file parquet scans otherwise serialize an
    embarrassingly-parallel stage on one core.

    No-op when the scan already splits well (the normal case at cluster
    scale, where repartitioning raw text would be a pointless full
    shuffle); the round-robin shuffle only fires when the input is too
    small to split across the cores.

    The partition count is read from the JVM-side internal RDD
    (``queryExecution.toRdd``). The r8-build form called
    ``df.rdd.getNumPartitions()``, which additionally builds the
    Python-serializer RDD wrapper (an extra mapPartitions + pickler
    setup) per call — measured ~110 ms per invocation at sf0.1 across
    ~48 call sites, pure plan-time overhead; the internal RDD answers
    the identical question in half the time (optimization r8)."""
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        parts = df.rdd.getNumPartitions()
    if parts < n:
        return df.repartition(n)
    return df
