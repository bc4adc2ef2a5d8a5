"""Facade smoke: the one-object surface a reference user would adopt."""

from __future__ import annotations

import pytest

from week5_datingnlp_big_data_spark.engine import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_table_and_query(eng):
    assert eng.table("documents").count() == 500
    top = eng.query("wordcount_top100")
    assert top.columns == ["word", "cnt"]
    assert len(eng.query_names()) >= 45


def test_corpus_chain(eng):
    docs = eng.table("documents").select("doc_id", "text")
    toked = eng.tokenize_corpus(docs, stem=False)
    counts = eng.doc_term_counts(toked)
    weighted = eng.tf_idf(counts, persist=False)
    assert {"doc_id", "term", "tfidf"} <= set(weighted.columns)
    assert weighted.count() > 0


def test_training_prep(eng):
    docs = eng.table("documents").select("doc_id", "text")
    r = eng.prepare_training_corpus(docs, min_quality=0.0, near_dup_threshold=0.9)
    assert r.n_after_near <= r.n_input
    assert eng.exact_dedup(docs).count() <= 500


def test_similarity(eng):
    out = eng.cosine_topk(eng.table("embeddings"), query_ids=[0, 1], k=3)
    assert out.count() == 6


def test_round3_surface(eng):
    docs = eng.table("documents")
    rep = eng.repetition_scores(docs)
    assert set(rep.columns) == {
        "doc_id", "n_words", "dup_word_frac", "dup_2gram_frac", "top_2gram_frac"
    }
    import pyspark.sql.functions as F
    flags = eng.decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    )
    assert set(flags.columns) == {"doc_id", "overlap_grams"}
    chunks = eng.chunk(docs, chunk_tokens=16, overlap=4)
    assert chunks.count() > docs.count()  # docs split into multiple windows
    mix = eng.mixture_sample(docs, rates={"src0": 1.0}, default_rate=0.0)
    assert 0 < mix.count() < docs.count()


def test_round4_surface(eng):
    docs = eng.table("documents")
    pii = eng.pii_scrub(docs)
    assert {"doc_id", "n_email", "n_ipv4", "n_phone", "redacted"} <= set(pii.columns)
    rare = eng.rarity_scores(docs)
    assert {"doc_id", "n_tokens", "mean_neg_logprob"} <= set(rare.columns)
    comp = eng.compression_ratios(docs)
    assert {"doc_id", "compression_ratio"} <= set(comp.columns)
    kept = eng.semantic_dedup(eng.table("embeddings"), threshold=0.35, n_clusters=8)
    assert 0 < kept.count() <= 500


def test_round4_packing_surface(eng):
    docs = eng.table("documents")
    chunks = eng.chunk(docs, chunk_tokens=32, overlap=8)
    packed = eng.pack_sequences(chunks, seq_len=128, n_buckets=4)
    assert {"bucket", "seq_id", "n_chunks", "seq_tokens"} == set(packed.columns)
    mix = eng.token_budget_mixture(docs, budget_tokens=10_000)
    assert 0 < mix.count() < docs.count()


def test_round10_surface(eng):
    emb = eng.table("embeddings")
    docs = eng.table("documents")
    cov = eng.coverage_sample(emb, per_bucket=2)
    assert {"vec_id", "cell", "pick"} <= set(cov.columns)
    assert cov.groupBy("cell").count().filter("count > 2").count() == 0
    mined = eng.margin_mine(emb, min_margin=0.0)
    assert {"query_id", "match_id", "cos", "margin"} <= set(mined.columns)
    rr = eng.mmr_rerank(emb, query_id=0, k=4, pool=10)
    assert rr.count() == 4
    rep = eng.source_report(docs)
    assert {"source", "n_docs", "mean_quality", "dup_rate"} <= set(rep.columns)
    plan = eng.batch_plan(docs, batch_token_budget=256)
    assert {"len_bucket", "batch_idx", "padding_frac"} <= set(plan.columns)
    chunks = eng.sentence_chunks(docs, max_words=32)
    assert {"doc_id", "chunk_idx", "chunk_text"} <= set(chunks.columns)
    assert chunks.count() > 0
    trip = eng.contrastive_triples(emb, anchor_ids=[0, 1, 2], pos_threshold=0.3)
    assert {"anchor_id", "pos_id", "neg_id"} <= set(trip.columns)


def test_facade_round4_surfaces(eng, spark):
    from pyspark.sql import functions as F

    docs = eng.table("documents")
    hist = eng.dup_cluster_sizes(docs)
    rows = {r["cluster_size"]: r for r in hist.collect()}
    assert 1 in rows  # singleton row always present
    total_docs = docs.count()
    assert sum(r["n_docs"] for r in rows.values()) == total_docs

    base = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    idx = eng.build_near_dup_index(base)
    nov = eng.batch_novelty(base, batch)
    assert {"doc_id", "n_base_dups", "is_novel"} <= set(nov.columns)
    assert set(idx.columns) == {"doc_id", "band_idx", "band_key"}
