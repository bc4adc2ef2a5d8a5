"""Sketch-accuracy tolerance tests: HLL distinct estimates and approx
quantiles vs exact answers, plus the mergeability contract (union of
per-source sketches ≈ global distinct, computed WITHOUT a second scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import sketches
from week5_datingnlp_big_data_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # Unpersist at teardown: a cached full-table relation would otherwise
    # be substituted (CacheManager) into later tests' scans, hiding the
    # column pruning the plan tests assert on.
    df = load_table(spark, sf_dir, "documents").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").cache()
    yield df
    df.unpersist()


def test_hll_per_source_within_tolerance(docs):
    est = {r["source"]: r for r in sketches.source_distinct_hll(docs).collect()}
    exact = {
        r["source"]: r["d"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct(F.sha2(F.coalesce("text", F.lit("")), 256)).alias("d"))
        .collect()
    }
    for src, d in exact.items():
        assert est[src]["est_distinct"] == pytest.approx(d, rel=0.05), src


def test_hll_merged_rollup_matches_global(docs):
    est = {r["source"]: r for r in sketches.source_distinct_hll(docs).collect()}
    global_exact = docs.agg(
        F.countDistinct(F.sha2(F.coalesce("text", F.lit("")), 256)).alias("d")
    ).first()["d"]
    assert est["__all__"]["est_distinct"] == pytest.approx(global_exact, rel=0.05)
    assert est["__all__"]["n_docs"] == docs.count()


def test_hll_deterministic_across_reruns(docs):
    a = sorted(map(tuple, sketches.source_distinct_hll(docs).collect()))
    b = sorted(map(tuple, sketches.source_distinct_hll(docs).collect()))
    assert a == b


def test_quantile_sketch_hits_true_order_statistics(events):
    """approx_percentile returns actual data elements (nearest-rank, not
    interpolated); at accuracy=10000 and test-scale group sizes the rank
    error is ~0, so each estimate must be an element whose true rank sits
    within ±1% of the requested quantile's rank."""
    approx = {r["grp"]: r for r in sketches.value_quantile_sketch(events).collect()}
    rows = events.select("event_type", "value").collect()
    by_grp: dict[str, list[float]] = {}
    for r in rows:
        by_grp.setdefault(r["event_type"], []).append(r["value"])
    for grp, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        for q in (0.5, 0.9, 0.99):
            got = approx[grp][f"q{int(q * 100)}"]
            # true rank window: requested rank ± max(1, 1% of n)
            target = q * (n - 1)
            slack = max(1.0, 0.01 * n)
            lo = vals[max(0, int(target - slack))]
            hi = vals[min(n - 1, int(target + slack) + 1)]
            assert lo - 1e-9 <= got <= hi + 1e-9, (grp, q, got, lo, hi)


def test_profile_table_exact_matches_manual(docs):
    from week5_datingnlp_big_data_spark.operators import sketches

    prof = {r["column"]: r for r in sketches.profile_table(docs, approx=False).collect()}
    n = docs.count()
    assert set(prof) == set(docs.columns)
    for c in docs.columns:
        assert prof[c]["n_rows"] == n
    exact_lang = docs.select("lang").distinct().count()
    assert prof["lang"]["n_distinct"] == exact_lang
    nulls_text = docs.filter(F.col("text").isNull()).count()
    assert prof["text"]["n_nulls"] == nulls_text


def test_profile_table_approx_within_tolerance(docs):
    from week5_datingnlp_big_data_spark.operators import sketches

    approx = {r["column"]: r for r in sketches.profile_table(docs, approx=True).collect()}
    exact = {r["column"]: r for r in sketches.profile_table(docs, approx=False).collect()}
    for c in exact:
        assert approx[c]["n_distinct"] == pytest.approx(exact[c]["n_distinct"], rel=0.05), c
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
        assert approx[c]["min_value"] == exact[c]["min_value"]


def test_cms_never_undercounts_any_token(docs):
    toks = sketches.tokenize_whitespace(docs).persist()
    sketch = sketches.countmin_from_tokens(toks)
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = sketches.cms_estimate_from_sketch(sketch, truth.select("tok"))
    joined = truth.join(est, "tok")
    under = joined.filter(F.col("cms_est") < F.col("true_cnt")).count()
    assert under == 0  # the one-sided error law: est >= true, always


def test_cms_absent_token_estimates_from_collisions_only(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(30)], "doc_id long, text string"
    )
    sketch = sketches.countmin_from_tokens(sketches.tokenize_whitespace(docs))
    probe = spark.createDataFrame([("neverseen",)], "tok string")
    est = sketches.cms_estimate_from_sketch(sketch, probe).collect()[0]
    # min-of-rows bounds the collision inflation; with 90 tokens in a
    # 4x256 grid a fixed probe should be ~0 (and never negative)
    assert 0 <= est.cms_est <= 3


def test_cms_merge_is_cell_sum(spark):
    a = spark.createDataFrame([(1, "x y z x")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "x q r")], "doc_id long, text string")
    sa = sketches.countmin_from_tokens(sketches.tokenize_whitespace(a))
    sb = sketches.countmin_from_tokens(sketches.tokenize_whitespace(b))
    merged = (
        sa.unionByName(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    direct = sketches.countmin_from_tokens(
        sketches.tokenize_whitespace(a.unionByName(b))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


# ---------------------------------------------------------------------------
# KMV sketches + cross-group overlap
# ---------------------------------------------------------------------------


def _kmv_pairs_df(spark, rows):
    return spark.createDataFrame(rows, "source string, key string")


def test_kmv_sketch_is_bounded_and_deterministic(spark):
    rows = [("a", f"w{i}") for i in range(500)] + [("b", f"w{i}") for i in range(100)]
    sk1 = sketches.kmv_sketch(_kmv_pairs_df(spark, rows), k=64)
    sizes = {r["source"]: r["n"] for r in sk1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"a": 64, "b": 64}
    sk2 = sketches.kmv_sketch(_kmv_pairs_df(spark, rows), k=64)
    assert sorted(map(tuple, sk1.collect())) == sorted(map(tuple, sk2.collect()))


def test_kmv_overlap_exact_when_k_covers_union(spark):
    # |A ∪ B| = 30 < k: the sketch IS the set, the estimate is exact.
    a = [("a", f"w{i}") for i in range(20)]          # w0..w19
    b = [("b", f"w{i}") for i in range(10, 30)]      # w10..w29 → |∩|=10, |∪|=30
    sk = sketches.kmv_sketch(_kmv_pairs_df(spark, a + b), k=64)
    [row] = sketches.kmv_group_overlap(sk, k=64).collect()
    assert (row["source_a"], row["source_b"]) == ("a", "b")
    assert row["n_union_k"] == 30
    assert row["n_both"] == 10
    assert row["est_jaccard"] == pytest.approx(10 / 30, abs=1e-6)


def test_kmv_overlap_estimates_within_tolerance(spark):
    # 2000-key union at 50% overlap, k=256 → stderr ≈ J(1-J)/sqrt(k) ~ 0.03;
    # assert a loose ±0.15 band (deterministic data → deterministic result,
    # the band guards the estimator's correctness, not flakiness).
    a = [("a", f"w{i}") for i in range(1500)]
    b = [("b", f"w{i}") for i in range(1000, 2500)]  # |∩|=500, |∪|=2500 → J=0.2
    sk = sketches.kmv_sketch(_kmv_pairs_df(spark, a + b), k=256)
    [row] = sketches.kmv_group_overlap(sk, k=256).collect()
    assert row["est_jaccard"] == pytest.approx(0.2, abs=0.15)


def test_kmv_overlap_disjoint_groups_is_zero(spark):
    a = [("a", f"left{i}") for i in range(300)]
    b = [("b", f"right{i}") for i in range(300)]
    sk = sketches.kmv_sketch(_kmv_pairs_df(spark, a + b), k=128)
    [row] = sketches.kmv_group_overlap(sk, k=128).collect()
    assert row["n_both"] == 0
    assert row["est_jaccard"] == 0.0
