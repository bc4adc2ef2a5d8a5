"""The composed training-data prep cascade: funnel counts must be
monotone, planted duplicates must fall out at the right stage, survivors
must carry stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.plans import datapipe
from week5_datingnlp_big_data_spark.sources.catalog import load_table


def test_funnel_on_planted_corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and you that it for "
        "with is to of all good things in life and work today"
    )
    rows = [
        (1, base),
        (2, base),                                  # exact dup → dropped at stage 3
        (3, base.replace("today", "tonight")),      # near dup → dropped at stage 4
        (4, "the ?!?! ### !!! ---"),                # en marker but junk → quality-filtered
        (5, "le la les de et un une est que pour toujours paris"),  # french
        (6, "the data pipeline with spark is good for you and it works on "
            "all of the big corpora that we have to process for training"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = datapipe.prepare_corpus(
        docs, keep_langs=("en",), min_quality=0.5, near_dup_threshold=0.5
    )
    assert r.n_input == 6
    assert r.n_after_lang == 5          # doc 5 predicted fr
    assert r.n_after_quality == 4       # doc 4 too short/low quality
    assert r.n_after_exact == 3         # doc 2 collapses into 1
    assert r.n_after_near == 2          # doc 3 near-dups doc 1
    ids = {row["doc_id"] for row in r.clean.select("doc_id").collect()}
    assert ids == {1, 6}
    s = r.stats.first()
    assert s["n_docs"] == 2 and s["total_tokens"] > 0


def test_funnel_monotone_on_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    r = datapipe.prepare_corpus(docs, min_quality=0.0, near_dup_threshold=0.9)
    assert (
        r.n_input >= r.n_after_lang >= r.n_after_quality
        >= r.n_after_exact >= r.n_after_near > 0
    )
    assert r.clean.filter(F.col("n_tokens") <= 0).count() == 0


def test_near_dup_keep_best_prefers_quality_over_min_id(spark):
    from week5_datingnlp_big_data_spark.plans.datapipe import near_dup_keep_best

    # Docs 1/2 are near-dups; doc 2 (the HIGHER id) is the cleaner copy —
    # doc 1 is the same text drowned in punctuation noise, so min-id
    # selection would keep the worse one. Doc 9 is unrelated (no row).
    base = ("the quick brown fox jumps over the lazy dog and then it naps "
            "for a while under the old oak tree every single afternoon")
    rows = [
        (1, base + " !!!! #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@"),
        (2, base),
        (9, "completely different content that is about nothing at all here"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in near_dup_keep_best(docs, threshold=0.5).collect()}
    assert set(out) == {1, 2}
    assert out[2]["keep"] and not out[1]["keep"]
    assert out[1]["component"] == out[2]["component"] == 1
    assert out[2]["quality"] > out[1]["quality"]


def test_prepare_corpus_v2_funnel_monotone(spark, sf_dir):
    from week5_datingnlp_big_data_spark.plans import datapipe
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    r = datapipe.prepare_corpus_v2(load_table(spark, sf_dir, "documents"))
    assert r.n_input >= r.n_after_gopher >= r.n_after_dedup_min_len
    assert r.n_after_dedup_min_len > 0
    assert r.kept_tokens >= 10 * r.n_after_dedup_min_len  # min_kept_words
    # clean frame matches the funnel tail and never exceeds raw length
    rows = r.clean.collect()
    assert len(rows) == r.n_after_dedup_min_len
    assert all(x.kept_words >= 10 for x in rows)


def test_prepare_corpus_v2_dedup_shrinks_planted_dups(spark):
    from week5_datingnlp_big_data_spark.plans import datapipe

    # 60-word docs that pass Gopher; two share a verbatim 30-word block
    common = " ".join(
        "the quick brown fox and that dog have run with great speed".split()
    )
    filler1 = " ".join(f"alpha{i} of the word" for i in range(12))  # 48 words
    filler2 = " ".join(f"beta{i} to be here" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, f"{common} {filler1}"),
            (2, f"{common} {filler2}"),
            (3, f"short junk"),  # fails Gopher word-count rule
        ],
        "doc_id long, text string",
    )
    r = datapipe.prepare_corpus_v2(docs)
    assert r.n_input == 3 and r.n_after_gopher == 2
    kept = {x.doc_id: x.kept_words for x in r.clean.collect()}
    # both docs lose the duplicated common block (within-corpus dup)
    n_common = len(common.split())
    assert all(v <= 60 - n_common + 8 for v in kept.values())
