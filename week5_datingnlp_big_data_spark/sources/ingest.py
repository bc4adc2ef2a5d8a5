"""Raw-corpus ingestion: turn directories of text / JSONL files (optionally
gzip-compressed — Spark decompresses by extension) into the engine's
``documents`` shape with DETERMINISTIC ids.

Parquet is the engine's working format (sources/catalog.py); this module is
the on-ramp for the formats crawls actually arrive in:

  ingest_text_dir   — one document per line (the webtext convention) or
                      per file; doc_id = first 60 bits of
                      sha2(source_file ':' line_idx), stable across runs,
                      executors, and partitionings.
  ingest_jsonl_dir  — JSON-lines with an explicit schema (corrupt lines
                      quarantined to a `_corrupt` column, never dropped
                      silently — at crawl scale silent drops hide data
                      loss).

Scale notes: ids derive from (file, position), NOT monotonically_increasing_id
(partition-dependent) and NOT a global zipWithIndex (a full pass + barrier).
The per-file line index comes from a window over the file name — one shuffle
whose key cardinality is the file count; at 100 TB with ~100k files the
partitions stay balanced because each file's lines hash together only for the
index, then redistribute. For line-addressed formats where even that shuffle
is unwanted, ids can come from content hashing instead (``id_from='content'``),
which is shuffle-free but collides exact duplicate lines onto one id —
acceptable when exact dedup runs next anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stable_id(*cols) -> F.Column:
    """60-bit positive BIGINT from sha2 of the joined parts (60 bits keeps
    the literal positive and bit-identical in engines without unsigned
    64-bit types — same discipline as dedup.BLOOM_BITS_PER_WORD)."""
    return (
        F.conv(F.substring(F.sha2(F.concat_ws(":", *cols), 256), 1, 15), 16, 10)
        .cast("long")
    )


def ingest_text_dir(
    spark: SparkSession,
    path: str,
    per_line: bool = True,
    id_from: str = "position",
    source: str | None = None,
) -> DataFrame:
    """Read a directory of ``.txt`` / ``.txt.gz`` files into
    ``(doc_id, text, source)``.

    ``per_line=True`` (default): one document per non-empty line.
    ``per_line=False``: one document per file (``wholeTextFiles`` shape,
    but via ``spark.read.text(wholetext=True)`` so it stays DataFrame-native).

    ``id_from='position'``: doc_id = hash(file ':' line_idx) — stable and
    collision-free for distinct positions (one window shuffle keyed by
    file). ``id_from='content'``: doc_id = hash(file-agnostic content) —
    shuffle-free; exact duplicate lines share an id."""
    if per_line:
        df = spark.read.text(path).withColumn("_file", F.input_file_name())
        df = df.filter(F.length(F.trim("value")) > 0)
        if id_from == "content":
            did = _stable_id(F.col("value"))
        elif id_from == "position":
            idx = F.row_number().over(
                Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
            )
            df = df.withColumn("_idx", idx)
            did = _stable_id(F.col("_file"), F.col("_idx"))
        else:
            raise ValueError(f"id_from must be 'position' or 'content', got {id_from!r}")
    else:
        df = spark.read.text(path, wholetext=True).withColumn(
            "_file", F.input_file_name()
        )
        did = _stable_id(F.col("_file"))
    src = F.lit(source) if source is not None else F.regexp_extract(
        F.col("_file"), r"([^/]+)$", 1
    )
    return df.select(
        did.alias("doc_id"),
        F.col("value").alias("text"),
        src.alias("source"),
    )


def ingest_jsonl_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    source: str | None = None,
) -> DataFrame:
    """Read ``.jsonl`` / ``.jsonl.gz`` files with an EXPLICIT schema plus a
    ``_corrupt`` quarantine column (PERMISSIVE mode): corrupt lines come
    back with every data field NULL and the raw line preserved, so the
    caller can count/route them — schema inference is never used (a 100 TB
    inference pass reads everything twice and locks in whatever the first
    sample implied)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    if source is not None:
        df = df.withColumn("source", F.lit(source))
    return df
