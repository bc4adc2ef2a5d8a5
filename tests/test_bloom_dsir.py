"""Bloom-filter incremental dedup + DSIR importance resampling units.

The registry oracle pins cross-engine bit-exactness; these tests pin the
*semantic guarantees*: Bloom filters never produce false negatives and
stay under a sane false-positive rate when sized correctly; the OR-merge
law holds; DSIR ranks target-distribution documents above off-target ones
and is invariant to partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import corpus, dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_no_false_negatives(spark):
    seen_rows = [(i, f"document number {i} about topic {i % 7}") for i in range(200)]
    seen = _docs(spark, seen_rows)
    # batch: 50 exact copies of seen content (new ids) + 50 fresh docs
    batch = _docs(
        spark,
        [(1000 + i, seen_rows[i][1]) for i in range(50)]
        + [(2000 + i, f"unseen fresh content {i} xyzzy") for i in range(50)],
    )
    bloom = dedup.bloom_filter_build(seen, num_words=256, num_hashes=7)
    out = {
        r.doc_id: r.maybe_seen
        for r in dedup.bloom_maybe_seen(
            batch, bloom, num_words=256, num_hashes=7
        ).collect()
    }
    # every true duplicate MUST flag — the Bloom guarantee
    for i in range(50):
        assert out[1000 + i] is True, f"false negative on planted dup {i}"


def test_bloom_fpr_bounded_when_sized(spark):
    # 256 words * 63 bits = 16128 bits for 200 docs at k=7 → theoretical
    # FPR ≈ (1-e^(-7*200/16128))^7 ≈ 2e-8; assert a generous 5% bound.
    seen = _docs(spark, [(i, f"seen doc {i}") for i in range(200)])
    fresh = _docs(spark, [(i, f"novel doc {i} qwerty") for i in range(400)])
    bloom = dedup.bloom_filter_build(seen, num_words=256, num_hashes=7)
    flagged = (
        dedup.bloom_maybe_seen(fresh, bloom, num_words=256, num_hashes=7)
        .filter(F.col("maybe_seen"))
        .count()
    )
    assert flagged / 400 <= 0.05


def test_bloom_merge_equals_union_build(spark):
    a = _docs(spark, [(i, f"slice a doc {i}") for i in range(60)])
    b = _docs(spark, [(100 + i, f"slice b doc {i}") for i in range(60)])
    merged = dedup.bloom_filter_merge(
        dedup.bloom_filter_build(a, num_words=64, num_hashes=5),
        dedup.bloom_filter_build(b, num_words=64, num_hashes=5),
    )
    direct = dedup.bloom_filter_build(a.unionByName(b), num_words=64, num_hashes=5)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_bloom_empty_filter_flags_nothing(spark):
    empty = _docs(spark, []).filter(F.lit(False))
    bloom = dedup.bloom_filter_build(empty, num_words=64, num_hashes=5)
    batch = _docs(spark, [(1, "anything at all")])
    out = dedup.bloom_maybe_seen(batch, bloom, num_words=64, num_hashes=5).collect()
    assert [(r.doc_id, r.maybe_seen) for r in out] == [(1, False)]


def test_dsir_ranks_target_like_docs_first(spark):
    # target slice speaks "cats"; off-target speaks "bonds"; probes mix.
    rows = (
        [(i, "cats purr and cats nap on warm windowsills", True) for i in range(20)]
        + [(100 + i, "bonds yield coupons and bonds mature at par", False) for i in range(20)]
        + [(200, "cats nap on warm windowsills", False)]      # target-like probe
        + [(201, "bonds mature at par today", False)]          # off-target probe
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    w = {
        r.doc_id: r.log_weight
        for r in corpus.dsir_importance_weights(
            docs, F.col("is_tgt"), num_buckets=128
        ).collect()
    }
    assert w[200] > w[201], f"target-like probe should outrank off-target: {w[200]} vs {w[201]}"
    assert w[200] > 0 and w[201] < 0


def test_dsir_weights_partitioning_invariant(spark):
    rows = [(i, f"word{i % 11} filler text number {i} with shared words") for i in range(80)]
    base = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = F.col("doc_id") % 3 == 0
    a = corpus.dsir_importance_weights(base.repartition(1), tgt, num_buckets=64)
    b = corpus.dsir_importance_weights(base.repartition(13), tgt, num_buckets=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_short_and_null_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, None), (3, "two words here")],
        "doc_id long, text string",
    )
    out = corpus.dsir_importance_weights(docs, F.lit(True), num_buckets=32)
    assert sorted(r.doc_id for r in out.collect()) == [3]


def test_dsir_select_is_total_ordered_cut(spark):
    rows = [(i, "alpha beta gamma " + ("alpha beta " * (i % 4))) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = F.col("doc_id") < 10
    top = corpus.dsir_select(docs, tgt, 7, num_buckets=64).collect()
    assert len(top) == 7
    # deterministic across reruns (the driver reruns rows-only checks)
    again = corpus.dsir_select(docs, tgt, 7, num_buckets=64).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]


def test_span_rewrite_removes_only_cross_doc_spans(spark):
    span = "one two three four five six seven eight"       # exactly 8 words
    rows = [
        (1, f"{span} unique alpha beta gamma delta epsilon zeta eta"),
        (2, f"{span} other words here entirely different from one tail bit"),
        (3, "solo content " + "rep rep rep rep rep rep rep rep"),  # within-doc only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.remove_duplicate_spans(docs).collect()}
    # the shared leading span vanishes from both docs
    assert not out[1].text_clean.startswith("one two")
    assert not out[2].text_clean.startswith("one two")
    assert out[1].n_dup_spans == 1 and out[2].n_dup_spans == 1
    # the unique remainder survives, in order
    assert out[1].text_clean == "unique alpha beta gamma delta epsilon zeta eta"
    # a span repeated only WITHIN one doc is not cross-document — kept
    assert out[3].n_dup_spans == 0
    assert "rep rep" in out[3].text_clean


def test_span_rewrite_short_and_empty_docs_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, "short doc only"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.remove_duplicate_spans(docs).collect()}
    assert out[1].text_clean == "short doc only" and out[1].n_spans == 0
    assert out[2].text_clean == "" and out[2].n_dup_spans == 0
    assert out[3].text_clean == ""


def test_span_rewrite_preserves_word_order_and_tail(spark):
    words = [f"w{i}" for i in range(20)]  # 2 full spans + 4-word tail
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(words[:8]) + " totally different second span words here x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.remove_duplicate_spans(docs).collect()}
    # doc 1: first span removed (shared with doc 2), second span + tail kept in order
    assert out[1].text_clean == " ".join(words[8:])
    assert out[1].n_spans == 2 and out[1].n_dup_spans == 1
