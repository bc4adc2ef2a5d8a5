"""Skew utilities (salted agg/join equivalence), winnowing guarantees,
IVF recall, and the stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import dedup, similarity, skew
from week5_datingnlp_big_data_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 'en' has 50x the rows of the tail
    rows = [(i, "en", float(i % 7)) for i in range(5000)]
    rows += [(10_000 + i, lang, float(i)) for i, lang in enumerate(["fr", "de", "es"] * 30)]
    return spark.createDataFrame(rows, "id long, lang string, v double").cache()


def test_salt_spreads_hot_key(skewed):
    # The point of salting: identical hot-key rows must NOT all land on one
    # salt (a value-derived salt would collapse them — the exploded-words
    # case where every 'the' row is byte-identical).
    hot = skewed.filter(F.col("lang") == "en").drop("id", "v")
    n_buckets = (
        skew.with_salt(hot, n_salts=8)
        .select(skew.SALT_COL).distinct().count()
    )
    assert n_buckets >= 4, f"hot key spread over only {n_buckets} salts"


def test_salted_count_equals_plain(skewed):
    plain = {r["lang"]: r["cnt"] for r in
             skewed.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["lang"]: r["cnt"] for r in
              skew.salted_count(skewed, ["lang"], n_salts=8).collect()}
    assert salted == plain


def test_salted_agg_equals_plain(skewed):
    plain = skewed.groupBy("lang").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    )
    salted = skew.salted_agg(
        skewed, ["lang"],
        {"s": ("v", "sum"), "c": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
        n_salts=8,
    )
    p = {r["lang"]: (r["s"], r["c"], r["mn"], r["mx"]) for r in plain.collect()}
    s = {r["lang"]: (r["s"], r["c"], r["mn"], r["mx"]) for r in salted.collect()}
    assert s == p


def test_salted_broadcast_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("en", "english"), ("fr", "french"), ("de", "german"), ("es", "spanish")],
        "lang string, name string",
    )
    plain = skewed.join(dim, "lang").select("id", "name")
    salted = skew.salted_broadcast_join(skewed, dim, "lang", n_salts=4).select("id", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_approx_count_distinct_tolerance(spark, sf_dir):
    # The 100 TB path for distinct counts is HLL; check the sketch lands
    # within its advertised error on real data.
    docs = load_table(spark, sf_dir, "documents")
    from week5_datingnlp_big_data_spark.operators import dfm as dfm_op
    from week5_datingnlp_big_data_spark.operators.corpus import clean_text
    from week5_datingnlp_big_data_spark.functions.text import tokenize

    words = docs.select(F.explode(tokenize(clean_text("text"))).alias("w"))
    exact = words.select("w").distinct().count()
    approx = words.agg(F.approx_count_distinct("w", rsd=0.05).alias("a")).first()["a"]
    assert abs(approx - exact) <= max(2, 0.10 * exact), (approx, exact)


def test_winnowing_shared_substring_guarantee(spark):
    # Winnowing guarantee: any shared substring of length >= k + window - 1
    # (= 11 chars here) produces at least one shared fingerprint.
    shared = "zqxwvutsrqponml"  # 15 chars, appears in both docs
    rows = [
        (1, f"aaa bbb {shared} ccc ddd"),
        (2, f"eee fff {shared} ggg hhh"),
        (3, "totally unrelated text with nothing in common at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: set(r["fingerprints"]) for r in
          dedup.winnowing_fingerprints(docs).collect()}
    assert fp[1] & fp[2], "shared substring must share a fingerprint"
    assert not (fp[1] & fp[3] and fp[2] & fp[3] and len(fp[3] & fp[1]) > 2)


def test_winnowing_short_text_fallback(spark):
    docs = spark.createDataFrame([(1, "hi"), (2, "hi")], "doc_id long, text string")
    fps = [r["fingerprints"] for r in dedup.winnowing_fingerprints(docs).collect()]
    assert fps[0] == fps[1] and len(fps[0]) == 1


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    try:
        qids = list(range(8))
        exact = similarity.cosine_topk(emb, qids, k=5)
        approx = similarity.ivf_topk(emb, qids, k=5, n_cells=8, n_probe=4)
        rec = similarity.knn_recall(exact, approx)
        # probing half the cells should recover well over half the true top-k
        assert rec >= 0.6, rec
    finally:
        emb.unpersist()


def test_stream_stream_click_attribution(spark, tmp_path):
    import glob, shutil

    from week5_datingnlp_big_data_spark.streaming import counts as sc

    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:20:00", 1, "purchase", 9.0, "{}"),   # attributed to 1
        (3, "2024-01-01 09:30:00", 2, "click", 1.0, "{}"),
        (4, "2024-01-01 11:00:00", 2, "purchase", 9.0, "{}"),   # >1h after click 3 → no match
        (5, "2024-01-01 10:55:00", 2, "click", 1.0, "{}"),      # within 1h of purchase 4
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    stage = tmp_path / "_st" / "b1.parquet"
    df.coalesce(1).write.parquet(str(stage))
    (tmp_path / "ss").mkdir(parents=True)
    shutil.copy(glob.glob(str(stage / "part-*.parquet"))[0], str(tmp_path / "ss" / "b1.parquet"))

    stream = sc.stream_events(spark, str(tmp_path / "ss"))
    q = sc.run_stream_to_memory(
        sc.streaming_click_to_purchase(stream), "attr_stream", "append"
    )
    try:
        q.processAllAvailable()
        out = spark.table("attr_stream").collect()
    finally:
        q.stop()
    pairs = {(r["purchase_id"], r["click_id"]) for r in out}
    assert pairs == {(2, 1), (4, 5)}


def test_stateful_running_counts(spark, tmp_path):
    import glob, shutil

    from week5_datingnlp_big_data_spark.streaming import counts as sc

    def drop(rows, name):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).withColumn("ts", F.to_timestamp("ts"))
        stage = tmp_path / "_stage" / name
        df.coalesce(1).write.parquet(str(stage))
        (tmp_path / "st").mkdir(parents=True, exist_ok=True)
        shutil.copy(glob.glob(str(stage / "part-*.parquet"))[0], str(tmp_path / "st" / name))

    drop([(1, "2024-01-01 10:00:00", 1, "click", 2.0, "{}"),
          (2, "2024-01-01 10:01:00", 1, "click", 3.0, "{}")], "b1.parquet")

    stream = sc.stream_events(spark, str(tmp_path / "st"))
    q = sc.run_stream_to_memory(
        sc.streaming_running_user_counts(stream), "state_stream", "update"
    )
    try:
        q.processAllAvailable()
        drop([(3, "2024-01-01 10:02:00", 1, "click", 5.0, "{}")], "b2.parquet")
        q.processAllAvailable()
        rows = spark.table("state_stream").collect()
    finally:
        q.stop()
    # update-mode emissions: after batch1 (2 events, 5.0), after batch2
    # state carried over -> (3 events, 10.0)
    emissions = sorted((r["n_events"], r["total_value"]) for r in rows)
    assert (2, 5.0) in emissions and (3, 10.0) in emissions
