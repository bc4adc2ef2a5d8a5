"""Shared fixtures: one SparkSession per test run, sf0.001 data dir, and a
DuckDB oracle comparator that mirrors the driver's correctness gate
(row-count + schema-width + order-insensitive value comparison)."""

from __future__ import annotations

import math

import duckdb
import pytest

from week5_datingnlp_big_data_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "\x00<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v)


def assert_matches_oracle(spark_df, duck_con, sql: str):
    """Order-insensitive, column-name-sorted value comparison — the same
    contract the driver applies (SURVEY.md section 5)."""
    sdf = spark_df.toPandas()
    odf = duck_con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    cols = sorted(sdf.columns)
    s_rows = sorted(
        tuple(_norm(v) for v in row) for row in sdf[cols].itertuples(index=False)
    )
    o_rows = sorted(
        tuple(_norm(v) for v in row) for row in odf[cols].itertuples(index=False)
    )
    assert len(s_rows) == len(o_rows), f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        assert a == b, f"row {i} differs:\n  spark:  {a}\n  oracle: {b}"
