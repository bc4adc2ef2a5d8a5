"""Bucketed tables: pre-shuffled layout so joins/aggs on the bucket key
skip their Exchange — the persisted-data answer to repeated big joins
(SURVEY.md section 2.10 relational core)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # saveAsTable writes into the session warehouse; register both sides
    # bucketed by the join key.
    for name, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        df = load_table(spark, sf_dir, name)
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"bkt_{name}")
        )
    yield
    for name in ("orders", "customer"):
        spark.sql(f"DROP TABLE IF EXISTS bkt_{name}")


def test_bucketed_join_skips_shuffle(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        o = spark.table("bkt_orders")
        c = spark.table("bkt_customer")
        joined = o.join(c, o.o_custkey == c.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Both sides read bucketed → SortMergeJoin with NO Exchange.
        assert "Exchange" not in plan, plan[:2000]
        n = joined.count()
        plain_o = load_table(spark, "/root/testdata/sf0.001", "orders")
        plain_c = load_table(spark, "/root/testdata/sf0.001", "customer")
        assert n == plain_o.join(plain_c, plain_o.o_custkey == plain_c.c_custkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_skips_shuffle(spark, warehouse):
    o = spark.table("bkt_orders")
    agg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert agg.count() > 0
