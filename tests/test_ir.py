"""BM25 ranked retrieval (operators/ir.py): formula golden on a tiny
hand-built corpus, weights/topk consistency, ranking invariants, and the
TakeOrderedAndProject plan guard."""

from __future__ import annotations

import math

import pytest

from week5_datingnlp_big_data_spark.operators import ir

COUNTS = [
    # (doc_id, term, count) — N=3, dl: d1=3, d2=2, d3=2, avgdl=7/3
    (1, "a", 2),
    (1, "b", 1),
    (2, "a", 1),
    (2, "c", 1),
    (3, "b", 1),
    (3, "c", 1),
]


def _expected_bm25(count, dl, df, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (count * (k1 + 1.0)) / (count + k1 * (1.0 - b + b * dl / avgdl))


@pytest.fixture(scope="module")
def counts(spark):
    return spark.createDataFrame(COUNTS, ["doc_id", "term", "count"])


def test_bm25_weights_formula_golden(spark, counts):
    rows = {
        (r.doc_id, r.term): r
        for r in ir.bm25_weights(counts, persist=False).collect()
    }
    dl = {1: 3, 2: 2, 3: 2}
    df = {"a": 2, "b": 2, "c": 2}
    assert len(rows) == len(COUNTS)
    for doc_id, term, count in COUNTS:
        r = rows[(doc_id, term)]
        assert r.dl == dl[doc_id] and r.df == df[term]
        want = _expected_bm25(count, dl[doc_id], df[term], 3, 7 / 3)
        assert r.bm25 == pytest.approx(want, abs=1e-12), (doc_id, term)
        assert r.idf > 0  # the +1 variant never goes negative


def test_bm25_topk_equals_sum_of_weights(spark, counts):
    top = {
        r.doc_id: r
        for r in ir.bm25_topk(counts, ["a", "c"], k=10, persist=False).collect()
    }
    w = ir.bm25_weights(counts, persist=False).filter("term IN ('a','c')").collect()
    want: dict[int, float] = {}
    matched: dict[int, int] = {}
    for r in w:
        want[r.doc_id] = want.get(r.doc_id, 0.0) + r.bm25
        matched[r.doc_id] = matched.get(r.doc_id, 0) + 1
    assert set(top) == set(want)
    for doc_id, r in top.items():
        assert r.score == pytest.approx(round(want[doc_id], 6), abs=2e-6)
        assert r.n_matched == matched[doc_id]


def test_bm25_ranking_invariants(spark):
    # Same dl, more occurrences of the query term → strictly higher rank;
    # rarer term → higher idf contribution than a common one.
    counts = spark.createDataFrame(
        [
            (1, "x", 3), (1, "pad", 1),
            (2, "x", 1), (2, "pad", 3),
            (3, "rare", 1), (3, "pad", 3),
            (4, "pad", 4),
        ],
        ["doc_id", "term", "count"],
    )
    top = ir.bm25_topk(counts, ["x"], k=10, persist=False).collect()
    assert [r.doc_id for r in top] == [1, 2]  # doc 1 outranks doc 2
    w = {
        (r.doc_id, r.term): r.bm25
        for r in ir.bm25_weights(counts, persist=False).collect()
    }
    # df(rare)=1 < df(pad)=4 → idf(rare) > idf(pad) at equal count and dl
    assert w[(3, "rare")] > w[(3, "pad")] / 3  # pad count=3 inflates tf only


def test_bm25_topk_plan_is_take_ordered(spark, counts):
    plan = ir.bm25_topk(counts, ["a"], k=5, persist=False)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# TF-IDF retrieval + reciprocal rank fusion
# ---------------------------------------------------------------------------


def test_tfidf_topk_formula_golden(spark, counts):
    # score(d, {a,c}) = Σ (count/dl) * log10(N/df); N=3, df(a)=2, df(c)=2
    top = {
        r.doc_id: r
        for r in ir.tfidf_topk(counts, ["a", "c"], k=10, persist=False).collect()
    }
    dl = {1: 3, 2: 2, 3: 2}
    want = {
        1: (2 / 3) * math.log10(3 / 2),
        2: (1 / 2) * math.log10(3 / 2) + (1 / 2) * math.log10(3 / 2),
        3: (1 / 2) * math.log10(3 / 2),
    }
    for d, r in top.items():
        assert r.score == pytest.approx(round(want[d], 6), abs=2e-6)
    # doc 2 matches both terms → ranked first
    assert top[2].n_matched == 2


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(10, 5.0), (20, 4.0), (30, 3.0)], ["doc_id", "score"]
    )
    b = spark.createDataFrame(
        [(20, 0.9), (40, 0.8), (10, 0.7)], ["doc_id", "score"]
    )
    out = {r.doc_id: r for r in ir.rrf_fuse({"A": a, "B": b}, rrf_k=60, top=10).collect()}
    # ranks: A -> 10:1, 20:2, 30:3 ; B -> 20:1, 40:2, 10:3
    assert out[10].rrf_score == pytest.approx(round(1 / 61 + 1 / 63, 6), abs=1e-9)
    assert out[20].rrf_score == pytest.approx(round(1 / 62 + 1 / 61, 6), abs=1e-9)
    assert out[30].rrf_score == pytest.approx(round(1 / 63, 6), abs=1e-9)
    assert out[40].rrf_score == pytest.approx(round(1 / 62, 6), abs=1e-9)
    assert out[10].n_systems == 2 and out[30].n_systems == 1
    assert out[20].best_rank == 1
    # doc in both systems outranks single-system docs here
    order = [r.doc_id for r in
             ir.rrf_fuse({"A": a, "B": b}, rrf_k=60, top=10).collect()]
    assert order[0] == 20 and order[1] == 10


def test_rrf_fuse_tie_break_deterministic(spark):
    # identical scores → rank assigned by doc_id ascending, both systems
    a = spark.createDataFrame([(2, 1.0), (1, 1.0)], ["doc_id", "score"])
    b = spark.createDataFrame([(1, 7.0), (2, 7.0)], ["doc_id", "score"])
    out = {r.doc_id: r for r in ir.rrf_fuse({"A": a, "B": b}).collect()}
    assert out[1].rrf_score == pytest.approx(round(2 / 61, 6), abs=1e-9)
    assert out[2].rrf_score == pytest.approx(round(2 / 62, 6), abs=1e-9)


def test_rrf_fuse_respects_top_limit(spark):
    a = spark.createDataFrame([(i, float(100 - i)) for i in range(30)], ["doc_id", "score"])
    assert ir.rrf_fuse({"A": a}, top=7).count() == 7


def test_phrase_match_counts_positions(spark):
    from week5_datingnlp_big_data_spark.operators.ir import phrase_match_counts

    docs = spark.createDataFrame(
        [
            (1, "big data big data big".split()),
            (2, "data big".split()),
            (3, "big big data".split()),
        ],
        "doc_id long, tokens array<string>",
    )
    got = {
        (r["doc_id"], r["phrase"]): r["n_hits"]
        for r in phrase_match_counts(docs, [["big", "data"], ["data", "big"]]).collect()
    }
    assert got[(1, "big data")] == 2
    assert got[(1, "data big")] == 2
    assert got[(2, "data big")] == 1
    assert got[(3, "big data")] == 1
    assert (2, "big data") not in got  # no hit -> no row


def test_phrase_match_three_token_chain(spark):
    from week5_datingnlp_big_data_spark.operators.ir import phrase_match_counts

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b".split()), (2, "c b a".split())],
        "doc_id long, tokens array<string>",
    )
    got = {
        (r["doc_id"], r["phrase"]): r["n_hits"]
        for r in phrase_match_counts(docs, [["a", "b", "c"]]).collect()
    }
    assert got == {(1, "a b c"): 2}
