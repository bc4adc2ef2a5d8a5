"""Storage-layout scale evidence: bucketed tables join/aggregate with no
exchange, partitioned writes prune at scan time, and the layout survives a
catalog round-trip. These are the write-side halves of the 100 TB design —
pay the shuffle once at load time, then every downstream join/agg on the
clustered key is exchange-free."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.sources.catalog import load_table
from week5_datingnlp_big_data_spark.sources.sinks import read_table, write_bucketed


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_orders_lineitem(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bucketed"))
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        o, "orders_b", ("o_orderkey",), num_buckets=8,
        sort_cols=("o_orderkey",), path=os.path.join(base, "orders_b"),
    )
    write_bucketed(
        li, "lineitem_b", ("l_orderkey",), num_buckets=8,
        sort_cols=("l_orderkey",), path=os.path.join(base, "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_orders_lineitem):
    # The whole point of bucketing: co-clustered tables sort-merge join
    # with zero Exchange operators (the shuffle happened at write time).
    ot, lt = bucketed_orders_lineitem
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, lt).join(
            read_table(spark, ot),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # sortBy on the bucket key also removes the per-task sort.
    assert joined.count() > 0


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_orders_lineitem):
    ot, lt = bucketed_orders_lineitem
    a = (
        read_table(spark, lt)
        .join(read_table(spark, ot), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    b = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    # Hive-style partition layout: a filter on the partition column must
    # show up as a PartitionFilters entry, not a post-scan Filter over
    # every file.
    out = str(tmp_path / "orders_by_priority")
    o = load_table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = _plan_of(back)
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    expected = o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == expected


def test_partitioned_dirs_exist_per_key(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_part")
    o = load_table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    statuses = {r[0] for r in o.select("o_orderstatus").distinct().collect()}
    dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("o_orderstatus=")
    }
    assert dirs == statuses


# ---------------------------------------------------------------------------
# Sorted-run layout (zone-map / min-max row-group pruning)
# ---------------------------------------------------------------------------


def test_write_sorted_produces_disjoint_key_ranges(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from week5_datingnlp_big_data_spark.sources.sinks import write_sorted

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_sorted")
    write_sorted(orders, out, ["o_totalprice"], n_files=4)

    ranges = []
    for f in sorted(glob.glob(f"{out}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = md.schema.names.index("o_totalprice")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min); maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 3          # range partitioner actually split
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2            # files hold DISJOINT key ranges


def test_write_sorted_read_back_prunes_and_matches(spark, sf_dir, tmp_path):
    from week5_datingnlp_big_data_spark.sources.sinks import write_sorted

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_sorted2")
    write_sorted(orders, out, ["o_totalprice"], n_files=4)
    rd = spark.read.parquet(out).filter(F.col("o_totalprice") > 400000)
    want = orders.filter(F.col("o_totalprice") > 400000).count()
    assert rd.count() == want
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "o_totalprice" in plan and "PushedFilters" in plan


def test_write_zordered_bounds_both_dims(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from week5_datingnlp_big_data_spark.sources.sinks import (
        write_sorted,
        write_zordered,
    )

    orders = load_table(spark, sf_dir, "orders")
    zout = str(tmp_path / "orders_z")
    sout = str(tmp_path / "orders_s")
    write_zordered(orders, zout, ["o_totalprice", "o_custkey"], n_files=8)
    write_sorted(orders, sout, ["o_totalprice"], n_files=8)

    def spans(path, col):
        got = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            ci = md.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min); maxs.append(st.max)
            got.append(max(maxs) - min(mins))
        return got

    lo, hi = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    ck_global = hi - lo
    lo, hi = orders.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    tp_global = hi - lo

    z_ck = spans(zout, "o_custkey")
    z_tp = spans(zout, "o_totalprice")
    s_ck = spans(sout, "o_custkey")
    assert len(z_ck) >= 4
    # Z-order bounds BOTH dimensions: average per-file span well under
    # the global span on each clustered column...
    assert sum(z_ck) / len(z_ck) < 0.62 * ck_global
    assert sum(z_tp) / len(z_tp) < 0.62 * tp_global
    # ...while the single-column sorted layout leaves the second
    # dimension unclustered (near-global span per file).
    assert sum(s_ck) / len(s_ck) > 0.9 * ck_global


def test_write_zordered_read_back_matches(spark, sf_dir, tmp_path):
    from week5_datingnlp_big_data_spark.sources.sinks import write_zordered

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_z2")
    write_zordered(orders, out, ["o_totalprice", "o_custkey"], n_files=8)
    rd = spark.read.parquet(out)
    assert "_zkey" not in rd.columns
    pred = (F.col("o_totalprice") > 200000) & (F.col("o_custkey") < 300)
    assert rd.filter(pred).count() == orders.filter(pred).count()
    assert rd.count() == orders.count()


def test_clustering_depth_segments(spark):
    from week5_datingnlp_big_data_spark.operators import layout

    # files: A[0,9] B[5,14] C[20,29] -> depths: [0,4]=1 [5,9]=2
    # [10,14]=1 [20,29]=1; gap [15,19] depth 0 is dropped
    manifest = spark.createDataFrame(
        [("A", 0, 9), ("B", 5, 14), ("C", 20, 29)],
        "file string, min_key long, max_key long",
    )
    segs = {
        (r["k_start"], r["k_end"]): r["depth"]
        for r in layout.clustering_depth(manifest).collect()
    }
    assert segs == {(0, 4): 1, (5, 9): 2, (10, 14): 1, (20, 29): 1}
    # perfectly clustered: disjoint ranges -> depth 1 everywhere
    tidy = spark.createDataFrame(
        [("A", 0, 4), ("B", 5, 9)], "file string, min_key long, max_key long"
    )
    assert all(
        r["depth"] == 1 for r in layout.clustering_depth(tidy).collect()
    )
