"""Physical-layout operators (operators/layout.py) and the temporal KMV
rollup (sketches.kmv_running_distinct): compaction bin-fill invariants,
rendezvous-hashing minimal-movement guarantees, Z-order bounding-box
tightness vs a plain sort, and running-sketch accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import layout, shards, sketches
from week5_datingnlp_big_data_spark.sources.catalog import load_table


# ---------------------------------------------------------------- compaction

def _manifest(spark, sizes):
    rows = [(f"f{i:03d}", int(s)) for i, s in enumerate(sizes)]
    return spark.createDataFrame(rows, "file string, bytes bigint")


def test_compaction_bins_fill_to_target(spark):
    plan = layout.compaction_plan(
        _manifest(spark, [40, 40, 40, 40, 40, 40]), target_bytes=100
    ).orderBy("file").collect()
    # [40]*6, target 100: starts 0,40,80,120,160,200 → bins 0,0,0,1,1,2
    assert [r["bin_id"] for r in plan] == [0, 0, 0, 1, 1, 2]
    by_bin = {}
    for r in plan:
        by_bin[r["bin_id"]] = r["bin_bytes"]
    # the sequential-fill invariant: the RUNNING total crosses each bin
    # boundary inside that bin (cumulative through bin k >= (k+1)*target
    # for every non-final bin) — individual bins may undershoot when the
    # previous bin overshot into their range
    cum = 0
    bins = sorted(by_bin)
    for b in bins[:-1]:
        cum += by_bin[b]
        assert cum >= (b + 1) * 100
    # overshoot is bounded by one file
    assert all(v < 100 + 40 for v in by_bin.values())


def test_compaction_preserves_order_and_totals(spark):
    sizes = [10, 200, 5, 5, 90, 10, 10, 300, 1]
    plan = layout.compaction_plan(
        _manifest(spark, sizes), target_bytes=100
    ).orderBy("file").collect()
    # adjacency: bin ids are non-decreasing in manifest order
    bin_seq = [r["bin_id"] for r in plan]
    assert bin_seq == sorted(bin_seq)
    assert sum(r["bytes"] for r in plan) == sum(sizes)
    # per-bin totals agree with the member rows
    agg = {}
    for r in plan:
        agg[r["bin_id"]] = agg.get(r["bin_id"], 0) + r["bytes"]
    for r in plan:
        assert agg[r["bin_id"]] == r["bin_bytes"]


def test_compaction_on_real_shard_manifest(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    manifest = shards.shard_manifest(docs, n_shards=8)
    rows = layout.compaction_plan(
        manifest, bytes_col="n_tokens", order_col="shard",
        target_bytes=1 << 40,
    ).collect()
    assert len(rows) == 8
    assert all(r["bin_id"] == 0 for r in rows)  # everything fits one bin
    tight = layout.compaction_plan(
        manifest, bytes_col="n_tokens", order_col="shard", target_bytes=1
    ).collect()
    assert len({r["bin_id"] for r in tight}) == 8  # one bin per shard


# ---------------------------------------------------------------- rendezvous

def test_rendezvous_moves_only_to_new_shards(spark):
    moves = layout.reshard_moves(
        spark.range(4000), "id", n_old=8, n_new=10
    ).collect()
    hrw = [r for r in moves if r["scheme"] == "hrw"]
    moved = [r for r in hrw if r["old_shard"] != r["new_shard"]]
    # the defining HRW property: every move lands on an ADDED shard
    assert moved and all(r["new_shard"] >= 8 for r in moved)
    total = sum(r["n_rows"] for r in hrw)
    frac = sum(r["n_rows"] for r in moved) / total
    assert 0.1 < frac < 0.3  # expected 1 - 8/10 = 0.2


def test_mod_hash_moves_almost_everything(spark):
    moves = layout.reshard_moves(
        spark.range(4000), "id", n_old=8, n_new=10
    ).collect()
    mod = [r for r in moves if r["scheme"] == "mod"]
    total = sum(r["n_rows"] for r in mod)
    moved = sum(r["n_rows"] for r in mod if r["old_shard"] != r["new_shard"])
    assert moved / total > 0.7  # expected ~1 - 1/10


def test_rendezvous_is_deterministic_and_balanced(spark):
    a = layout.rendezvous_shard("id", 8)
    counts = (
        spark.range(8000).select(a.alias("s")).groupBy("s").count().collect()
    )
    assert len(counts) == 8
    # multinomial(8000, 1/8): mean 1000, sd ~30 — 5 sd band
    assert all(850 < r["count"] < 1150 for r in counts)


# ------------------------------------------------------------------- Z-order

def test_zorder_value_interleaves_bits(spark):
    row = spark.range(1).select(
        layout.zorder_value(F.lit(0b1111), F.lit(0), bits=4).alias("zx"),
        layout.zorder_value(F.lit(0), F.lit(0b1111), bits=4).alias("zy"),
        layout.zorder_value(F.lit(0b1010), F.lit(0b0101), bits=4).alias("zm"),
    ).first()
    assert row["zx"] == 0b10101010
    assert row["zy"] == 0b01010101
    assert row["zm"] == 0b10011001  # x bits at odd positions, y at even


def test_zorder_buckets_bound_both_spans(spark):
    # full 256x256 grid: with bucket_shift=8 each z-bucket is EXACTLY a
    # 16x16 rectangle — the bounding box a min/max-stats reader scans.
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("bigint").alias("y")
    )
    stats = layout.zorder_bucket_stats(
        grid, F.col("x"), F.col("y"), bits=8, bucket_shift=8
    ).collect()
    assert len(stats) == 256
    assert all(r["x_span"] == 15 and r["y_span"] == 15 for r in stats)
    # a plain sort on x cut into 256 equal files: tight on x, FULL range on y
    # (15 vs 255 per file) — the comparison that motivates the Z layout.


# ----------------------------------------------------- KMV running distinct

def test_kmv_running_distinct_exact_below_k(spark):
    ev = spark.createDataFrame(
        [(f"2024-01-0{d}", u) for d in (1, 2, 3) for u in range(d * 5)],
        "ts string, user_id bigint",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    out = {
        r["day"].isoformat(): r
        for r in sketches.kmv_running_distinct(ev, k=64).collect()
    }
    # under k distinct the sketch IS the set: estimate exact, rel_err 0
    assert out["2024-01-01"]["est_distinct"] == 5.0
    assert out["2024-01-02"]["est_distinct"] == 10.0
    assert out["2024-01-03"]["est_distinct"] == 15.0
    assert all(r["rel_err"] == 0.0 for r in out.values())


def test_kmv_running_distinct_estimates_above_k(spark):
    ev = spark.createDataFrame(
        [("2024-01-01", u) for u in range(400)]
        + [("2024-01-02", u) for u in range(200, 800)],
        "ts string, user_id bigint",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    rows = {
        r["day"].isoformat(): r
        for r in sketches.kmv_running_distinct(ev, k=128).collect()
    }
    assert rows["2024-01-01"]["true_distinct"] == 400
    assert rows["2024-01-02"]["true_distinct"] == 800
    # KMV with k=128: sd ~ n/sqrt(k-2) ≈ 9% — assert a generous 25% band
    for r in rows.values():
        assert r["n_sketch"] == 128
        assert r["rel_err"] < 0.25
    # running estimate reflects growth day-over-day
    assert (
        rows["2024-01-02"]["est_distinct"]
        > rows["2024-01-01"]["est_distinct"]
    )
