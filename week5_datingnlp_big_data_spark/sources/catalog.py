"""Table catalog: load the driver parquet tables / reference-shaped CSVs.

Covers reference operators S1 (CSV scan, Week5_datingNLP.R:45), S2 (schema
inspect, R:48), S3 (row count, R:46) with deterministic explicit schemas.
Parquet is the primary format — columnar, splittable, predicate-pushdown-able,
the right source at 100 TB; CSV is the fidelity path for the reference corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from week5_datingnlp_big_data_spark.sources.schemas import PROFILES_SCHEMA, SCHEMAS

TABLES = tuple(SCHEMAS)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Schema enforced at read so a malformed file
    fails fast instead of silently type-drifting between rounds."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    # Timestamps in these tables are naive instants; the DuckDB oracle
    # reads them without timezone shifts. Pin the session to UTC so a
    # caller-provided SparkSession in any host timezone agrees with it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as both parquet timestamp[us] and
        # timestamp[ns] across driver rounds. Spark's TimestampType (µs)
        # cannot read INT64 nanos directly, so sniff the footer: with
        # nanosAsLong set, a nanos column infers as LongType while a µs
        # column still infers as TimestampType. Footer-only read — no data
        # scan, so the probe is free at any scale.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        inferred = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema["ts"].dataType
        if isinstance(inferred, T.LongType):
            # Nanos file: read raw INT64 and truncate to µs — the same
            # conversion DuckDB applies, so oracle comparisons agree exactly.
            raw = T.StructType(
                [
                    T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType, True)
                    for f in SCHEMAS[name].fields
                ]
            )
            df = spark.read.schema(raw).parquet(f"{sf_dir}/{name}.parquet")
            cols = [
                F.timestamp_micros(F.expr("ts DIV 1000")).alias("ts") if c == "ts" else F.col(c)
                for c in df.columns
            ]
            return df.select(*cols)
    return spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can also be phrased in
    SQL; view names match the DuckDB oracle's."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_profiles_csv(spark: SparkSession, path: str) -> DataFrame:
    """Reference S1: load an okcupid_profiles-shaped CSV (R:45, header=TRUE,
    stringsAsFactors=FALSE) with the explicit 31+1-column schema."""
    return spark.read.csv(path, header=True, schema=PROFILES_SCHEMA)


def table_stats(df: DataFrame) -> dict:
    """Reference S2+S3: schema + row count in one pass."""
    return {
        "n_rows": df.count(),
        "n_cols": len(df.columns),
        "schema": [(f.name, f.dataType.simpleString()) for f in df.schema.fields],
    }
