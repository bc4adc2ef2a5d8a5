"""Unit tests for the C4/Gopher filter cascades (published-default
parameterizations, which the synthetic corpus can't exercise) and the
deterministic training-shard layout."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from week5_datingnlp_big_data_spark.operators import filters, shards


GOOD_LINE = "This is a perfectly reasonable sentence with many words in it."


def _c4(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in filters.c4_line_stats(df, **kw).collect()}


def test_c4_defaults_keep_clean_doc(spark):
    out = _c4(spark, [(1, "\n".join([GOOD_LINE] * 3))])
    assert out[1]["n_lines"] == 3
    assert out[1]["n_kept_lines"] == 3
    assert out[1]["keep"] is True
    assert out[1]["kept_text"] == "\n".join([GOOD_LINE] * 3)


def test_c4_line_rules(spark):
    text = "\n".join([
        GOOD_LINE,                       # kept
        "Too short.",                    # < 5 words
        "No terminal punctuation here at all",  # no terminal punct
        "Please enable JavaScript to view this page.",  # blockword
        GOOD_LINE,                       # kept
        "",                              # blank: not a line at all
        GOOD_LINE,                       # kept
    ])
    out = _c4(spark, [(1, text)])
    assert out[1]["n_lines"] == 6
    assert out[1]["n_kept_lines"] == 3
    assert out[1]["n_kept_words"] == 33
    assert out[1]["keep"] is True


def test_c4_doc_rules(spark):
    three_good = "\n".join([GOOD_LINE] * 3)
    out = _c4(spark, [
        (1, three_good + "\nLorem Ipsum dolor sit amet consectetur adipiscing."),
        (2, three_good + "\nfunction f() { return 1; }"),
        (3, "\n".join([GOOD_LINE] * 2)),   # only 2 kept lines < 3
        (4, None),                          # null text
    ])
    assert out[1]["doc_blocked"] is True and out[1]["keep"] is False
    assert out[2]["doc_blocked"] is True and out[2]["keep"] is False
    assert out[3]["doc_blocked"] is False and out[3]["keep"] is False
    assert out[4]["n_lines"] == 0 and out[4]["keep"] is False


def _gopher(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in filters.gopher_quality_flags(df, **kw).collect()
    }


def test_gopher_rules_fire_individually(spark):
    good = ("the quick brown fox jumps over the lazy dog and that have "
            "with be to of " * 5).strip()  # 70 words, stopword-rich
    out = _gopher(spark, [
        (1, good),
        (2, "short text"),                                    # too few words
        (3, " ".join(["x#y#"] * 60)),                         # symbol ratio + no stops
        (4, "\n".join(["• bullet line"] * 9) + "\n" + good),  # 9/10 = exactly 0.9
        (5, " ".join(["12345"] * 60)),                        # alpha fraction 0
    ])
    assert out[1]["keep"] is True
    assert out[2]["ok_words"] is False and out[2]["keep"] is False
    assert out[3]["ok_symbols"] is False
    assert out[4]["ok_bullets"] is True          # boundary inclusive: 0.9 <= 0.9
    assert out[5]["ok_alpha_words"] is False and out[5]["ok_stop_words"] is False


def test_gopher_bullet_and_ellipsis_fractions(spark):
    text = "\n".join(["• a bullet"] * 19 + ["plain line here..."])
    out = _gopher(spark, [(1, text)])
    assert out[1]["bullet_line_frac"] == 0.95
    assert out[1]["ellipsis_line_frac"] == 0.05
    assert out[1]["ok_bullets"] is False
    assert out[1]["ok_ellipsis"] is True


def test_assign_shards_deterministic_and_in_range(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["shard_key"])
         for r in shards.assign_shards(df, 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_key"])
         for r in shards.assign_shards(df.repartition(7), 8).collect()}
    assert a == b  # pure function of id — layout-independent
    assert {s for s, _ in a.values()} == set(range(8))
    # a different seed draws an independent assignment
    c = {r["doc_id"]: r["shard"]
         for r in shards.assign_shards(df, 8, seed="other").collect()}
    assert any(c[k] != a[k][0] for k in c)


def test_shard_stats_balance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = {r["shard"]: r for r in shards.shard_stats(docs, 4).collect()}
    assert set(stats) == {0, 1, 2, 3}
    total = sum(r["n_docs"] for r in stats.values())
    assert total == docs.count()
    # md5 is uniform: no shard holds more than 2x its fair share
    assert max(r["n_docs"] for r in stats.values()) <= 2 * total / 4


def test_write_training_shards_layout(spark, tmp_path):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shardout")
    shards.write_training_shards(df, path, n_shards=4)
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{path}/shard=*"))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    # within a shard file, rows are in shard_key order and cover the
    # exact membership assign_shards computes
    expect = {
        r["doc_id"]: (r["shard"], r["shard_key"])
        for r in shards.assign_shards(
            spark.range(0, 200).withColumnRenamed("id", "doc_id"), 4
        ).collect()
    }
    seen = 0
    for d in dirs:
        k = int(d.split("=")[1])
        files = glob.glob(f"{path}/{d}/*.parquet")
        assert len(files) == 1  # one exchange task per shard → one file
        t = pq.read_table(files[0]).to_pydict()
        keys = t["shard_key"]
        assert keys == sorted(keys)
        for doc_id in t["doc_id"]:
            assert expect[doc_id][0] == k
            seen += 1
    assert seen == 200


# ---------------------------------------------------------------------------
# Bucketized range join (point-in-interval)
# ---------------------------------------------------------------------------


def test_range_join_matches_naive_theta_join(spark):
    import datetime as dt

    from week5_datingnlp_big_data_spark.operators import relational

    base = dt.datetime(2024, 1, 1)
    # points every 13 hours; intervals of varying length incl. empty
    left = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=13 * i), i % 3) for i in range(40)],
        "lid long, pt timestamp, k long",
    )
    right = spark.createDataFrame(
        [
            (j, base + dt.timedelta(hours=7 * j),
             base + dt.timedelta(hours=7 * j + (j % 5) * 10), j % 3)
            for j in range(30)
        ],
        "rid long, s timestamp, e timestamp, k long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in relational.range_join_point_in_interval(
            left, right, key="k", left_point="pt", right_start="s",
            right_end="e", bucket_micros=3_600_000_000 * 24,
        ).collect()
    )
    r2 = right.withColumnRenamed("k", "k_r")
    naive = left.join(
        r2, (left.k == r2.k_r) & (r2.s <= left.pt) & (left.pt < r2.e)
    )
    want = sorted((r.lid, r.rid) for r in naive.collect())
    assert got == want and len(want) > 0


def test_range_join_bucket_width_invariance(spark):
    import datetime as dt

    from week5_datingnlp_big_data_spark.operators import relational

    base = dt.datetime(2024, 6, 1)
    left = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=i * 5), 0) for i in range(20)],
        "lid long, pt timestamp, k long",
    )
    right = spark.createDataFrame(
        [(j, base + dt.timedelta(hours=j * 9),
          base + dt.timedelta(hours=j * 9 + 24), 0) for j in range(10)],
        "rid long, s timestamp, e timestamp, k long",
    )
    results = []
    for w in (3_600_000_000, 86_400_000_000, 7 * 86_400_000_000):
        results.append(sorted(
            (r.lid, r.rid)
            for r in relational.range_join_point_in_interval(
                left, right, key="k", left_point="pt",
                right_start="s", right_end="e", bucket_micros=w,
            ).collect()
        ))
    assert results[0] == results[1] == results[2]


def test_range_join_boundary_semantics(spark):
    import datetime as dt

    from week5_datingnlp_big_data_spark.operators import relational

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    left = spark.createDataFrame(
        [(1, t0, 0), (2, t1, 0)], "lid long, pt timestamp, k long"
    )
    right = spark.createDataFrame(
        [(1, t0, t1, 0)], "rid long, s timestamp, e timestamp, k long"
    )
    got = {r.lid for r in relational.range_join_point_in_interval(
        left, right, key="k", left_point="pt",
        right_start="s", right_end="e", bucket_micros=86_400_000_000,
    ).collect()}
    assert got == {1}  # start inclusive, end exclusive
