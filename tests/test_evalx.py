"""Classifier-evaluation metrics (operators/evalx.py): hand-computed
rank-AUC goldens (including the tie half-weight), PR-sweep cumulative
arithmetic, calibration-bin edges, and a randomized cross-check of the
two-level prefix-sum cumulative machinery against a brute-force pairs
count."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import evalx


def _df(spark, rows):
    return spark.createDataFrame(rows, "score long, is_pos boolean")


def _brute_auc2(rows):
    """2U by enumerating all (pos, neg) pairs: 2 per correctly ordered
    pair, 1 per tie."""
    pos = [s for s, p in rows if p]
    neg = [s for s, p in rows if not p]
    u2 = 0
    for sp, sn in itertools.product(pos, neg):
        if sp > sn:
            u2 += 2
        elif sp == sn:
            u2 += 1
    return len(pos), len(neg), u2


def test_auc_hand_case_with_ties(spark):
    # scores: pos {3, 2, 2}, neg {2, 1}:
    #   pairs ordered: (3>2)x1 (3>1)x1 (2>1)x2 -> 4 pairs * 2 = 8
    #   ties: (2==2) x2 -> +2  => 2U = 10, AUC = 10 / (2*3*2) = 0.8333...
    rows = [(3, True), (2, True), (2, True), (2, False), (1, False)]
    out = evalx.binary_rank_auc(_df(spark, rows)).collect()[0]
    assert (out["n_pos"], out["n_neg"], out["u_stat_x2"]) == (3, 2, 10)
    assert abs(out["auc"] - 10 / 12) < 1e-9


def test_auc_perfect_and_reversed(spark):
    perfect = [(10, True), (9, True), (1, False), (0, False)]
    out = evalx.binary_rank_auc(_df(spark, perfect)).collect()[0]
    assert out["auc"] == 1.0
    reversed_ = [(s, not p) for s, p in perfect]
    out = evalx.binary_rank_auc(_df(spark, reversed_)).collect()[0]
    assert out["auc"] == 0.0


def test_auc_single_class_is_null(spark):
    out = evalx.binary_rank_auc(
        _df(spark, [(1, True), (2, True)])
    ).collect()[0]
    assert out["auc"] is None and out["n_neg"] == 0


def test_auc_randomized_matches_brute_force(spark):
    rng = random.Random(8)
    for trial in range(3):
        rows = [
            (rng.randint(-5, 5), rng.random() < 0.4) for _ in range(60)
        ]
        if not any(p for _, p in rows) or all(p for _, p in rows):
            rows += [(0, True), (0, False)]
        p, n, u2 = _brute_auc2(rows)
        out = evalx.binary_rank_auc(_df(spark, rows)).collect()[0]
        assert (out["n_pos"], out["n_neg"], out["u_stat_x2"]) == (p, n, u2)


def test_pr_sweep_hand_case(spark):
    # scores desc: 3(pos) 2(pos,neg) 1(neg)
    rows = [(3, True), (2, True), (2, False), (1, False)]
    out = {
        r["threshold"]: r
        for r in evalx.pr_threshold_sweep(_df(spark, rows)).collect()
    }
    assert (out[3]["tp"], out[3]["fp"]) == (1, 0)
    assert out[3]["precision"] == 1.0 and out[3]["recall"] == 0.5
    assert (out[2]["tp"], out[2]["fp"]) == (2, 1)
    assert abs(out[2]["precision"] - 2 / 3) < 1e-5
    assert (out[1]["tp"], out[1]["fp"]) == (2, 2)
    assert out[1]["recall"] == 1.0


def test_pr_sweep_one_row_per_distinct_score(spark):
    rows = [(s % 4, s % 3 == 0) for s in range(40)]
    out = evalx.pr_threshold_sweep(_df(spark, rows)).collect()
    assert len(out) == 4
    # recall is monotone non-increasing in the threshold
    by_t = sorted(out, key=lambda r: r["threshold"])
    recalls = [r["recall"] for r in by_t]
    assert recalls == sorted(recalls, reverse=True)


def test_calibration_bins_degenerate_single_score(spark):
    rows = [(7, True), (7, False), (7, True)]
    out = evalx.calibration_bins(_df(spark, rows), n_bins=10).collect()
    assert len(out) == 1 and out[0]["bin"] == 0
    assert out[0]["n"] == 3 and out[0]["n_pos"] == 2
    assert abs(out[0]["frac_pos"] - 2 / 3) < 1e-5
    assert out[0]["avg_score"] == 7.0


def test_calibration_bins_edges(spark):
    # range [0, 99], 10 bins -> width 10; min lands in bin 0, max in 9
    rows = [(s, s >= 50) for s in range(100)]
    out = {
        r["bin"]: r
        for r in evalx.calibration_bins(_df(spark, rows), n_bins=10).collect()
    }
    assert sorted(out) == list(range(10))
    assert all(out[b]["n"] == 10 for b in out)
    assert out[0]["frac_pos"] == 0.0 and out[9]["frac_pos"] == 1.0
    assert out[4]["avg_score"] == 44.5


def test_cum_machinery_band_decomposition_is_exact(spark):
    # many distinct scores spread across bands; cum counts must equal a
    # global ordered walk regardless of the band split
    rows = [((s * 37) % 1000 - 500, s % 5 == 0) for s in range(500)]
    c = evalx._cum_by_score(
        _df(spark, rows), "score", "is_pos", n_bands=16
    ).collect()
    seen_n = 0
    seen_pos = 0
    for r in sorted(c, key=lambda r: r["score"]):
        seen_n += r["n"]
        seen_pos += r["n_pos"]
        assert (r["cum_n"], r["cum_pos"]) == (seen_n, seen_pos)


def test_chi2_hand_contingency(spark):
    # 4 docs: class x = {t in 2 of 2}, class y = {t in 0 of 2}
    # for (x, "t"): A=2 B=0 C=0 D=2, N=4 -> chi2 = 4*(2*2-0)^2/(2*2*2*2) = 4.0
    rows = [
        (1, "x", ["t", "u"]),
        (2, "x", ["t"]),
        (3, "y", ["u"]),
        (4, "y", ["w"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, label string, tokens array<string>"
    )
    out = {
        (r["label"], r["term"]): r
        for r in evalx.chi2_term_class(df, label_col="label").collect()
    }
    t = out[("x", "t")]
    assert (t["a_docs"], t["term_docs"]) == (2, 2)
    assert t["chi2_x1e6"] == 4_000_000
    # "t" is maximally associated with x -> rank 1
    assert t["rnk"] == 1
    # a term present in EVERY doc is excluded (zero signal, div-by-zero)
    rows_all = rows[:2] + [(3, "y", ["u", "t"]), (4, "y", ["w", "t"])]
    df2 = spark.createDataFrame(
        rows_all, "doc_id long, label string, tokens array<string>"
    )
    out2 = {
        (r["label"], r["term"])
        for r in evalx.chi2_term_class(df2, label_col="label").collect()
    }
    assert ("x", "t") not in out2 and ("y", "t") not in out2


def test_chi2_presence_not_frequency(spark):
    # repeating a token in one doc must not change A (doc-level presence)
    base = [(1, "x", ["t"]), (2, "y", ["u"])]
    rep = [(1, "x", ["t", "t", "t"]), (2, "y", ["u"])]
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, label string, tokens array<string>"
    )
    a = {(r["label"], r["term"]): r["chi2_x1e6"]
         for r in evalx.chi2_term_class(mk(base), label_col="label").collect()}
    b = {(r["label"], r["term"]): r["chi2_x1e6"]
         for r in evalx.chi2_term_class(mk(rep), label_col="label").collect()}
    assert a == b


def _kappa(spark, pairs):
    df = spark.createDataFrame(pairs, "rater_a string, rater_b string")
    return evalx.cohens_kappa(df).collect()[0]


def test_kappa_perfect_and_hand_case(spark):
    assert _kappa(spark, [("a", "a"), ("b", "b")] * 5)["kappa"] == 1.0
    # classic 2x2: agree 15 of 20, marginals a:(12,11) b:(8,9)
    pairs = (
        [("p", "p")] * 10 + [("n", "n")] * 5
        + [("p", "n")] * 2 + [("n", "p")] * 3
    )
    out = _kappa(spark, pairs)
    # po = 15/20; pe = (12*13 + 8*7)/400 = 212/400; kappa = (300-212)/(400-212)
    assert (out["n"], out["n_agree"], out["pe_num"]) == (20, 15, 212)
    assert abs(out["kappa"] - 88 / 188) < 1e-9


def test_kappa_degenerate_single_category_is_null(spark):
    out = _kappa(spark, [("a", "a")] * 4)
    assert out["kappa"] is None and out["n_agree"] == 4


def test_kappa_disjoint_categories_zero_pe(spark):
    # raters never use the same category names: pe_num = 0, kappa = agree rate
    out = _kappa(spark, [("a", "x"), ("b", "y")])
    assert out["pe_num"] == 0 and out["kappa"] == 0.0


def test_hand_till_matches_brute_force(spark):
    """Per-pair direction AUCs must equal brute-force pair counting on
    a small 3-class score table."""
    rng = random.Random(42)
    classes = ["x", "y", "z"]
    docs = list(range(30))
    truth_rows = [(d, classes[rng.randrange(3)]) for d in docs]
    scored_rows = [
        (d, c, rng.randint(-5, 5)) for d in docs for c in classes
    ]
    scored = spark.createDataFrame(
        scored_rows, "doc_id long, label string, score long"
    )
    truth = spark.createDataFrame(truth_rows, "doc_id long, lang string")
    out = {
        (r["class_a"], r["class_b"]): r
        for r in evalx.hand_till_auc(scored, truth).collect()
    }
    t = dict(truth_rows)
    s = {(d, c): v for d, c, v in scored_rows}

    def brute_u2(scorer, pos_c, neg_c):
        pos = [s[(d, scorer)] for d in docs if t[d] == pos_c]
        neg = [s[(d, scorer)] for d in docs if t[d] == neg_c]
        u2 = 0
        for a in pos:
            for b in neg:
                u2 += 2 if a > b else (1 if a == b else 0)
        return u2, len(pos), len(neg)

    for ca, cb in [("x", "y"), ("x", "z"), ("y", "z")]:
        u2_ab, p, nn = brute_u2(ca, ca, cb)
        u2_ba, p2, nn2 = brute_u2(cb, cb, ca)
        r = out[(ca, cb)]
        assert r["u2_ab"] == u2_ab and r["u2_ba"] == u2_ba
        if p and nn:
            assert abs(r["auc_ab"] - u2_ab / (2 * p * nn)) < 1e-8
        if p2 and nn2:
            assert abs(r["auc_ba"] - u2_ba / (2 * p2 * nn2)) < 1e-8


def test_hand_till_empty_class_direction_is_null(spark):
    # class z never appears in truth: every pair with z has no
    # positives for the z-ranked direction -> NULL aucs
    scored = spark.createDataFrame(
        [(d, c, d + (1 if c == "x" else 0)) for d in range(6)
         for c in ("x", "y", "z")],
        "doc_id long, label string, score long",
    )
    truth = spark.createDataFrame(
        [(d, "x" if d % 2 else "y") for d in range(6)],
        "doc_id long, lang string",
    )
    out = {
        (r["class_a"], r["class_b"]): r
        for r in evalx.hand_till_auc(scored, truth).collect()
    }
    assert out[("x", "z")]["auc_ba"] is None
    assert out[("x", "z")]["auc_pair"] is None
    assert out[("x", "y")]["auc_pair"] is not None


def test_group_divergence_identical_and_disjoint(spark):
    from week5_datingnlp_big_data_spark.operators import similarity

    dim = 8

    def vec(seed):
        return [float((seed * 31 + i * 7) % 11 - 5) for i in range(dim)]

    # identical populations -> TV = 0
    rows = [(i, g, vec(i)) for i in range(20) for g in (0, 1)]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    )
    out = similarity.group_divergence(df, num_planes=4, dim=dim).collect()[0]
    assert out["tv_num"] == 0 and out["tv_distance"] == 0.0
    assert out["n_a"] == 20 and out["n_b"] == 20

    # disjoint cell support -> TV = 1 (group 1 vectors are negated, and
    # sign cells of v and -v never collide unless some dot product is 0;
    # the vec() values make all plane sums nonzero for these seeds)
    rows2 = [(i, 0, vec(i)) for i in range(10)] + [
        (100 + i, 1, [-x for x in vec(i)]) for i in range(10)
    ]
    df2 = spark.createDataFrame(
        rows2, "vec_id long, label long, embedding array<float>"
    )
    out2 = similarity.group_divergence(df2, num_planes=4, dim=dim).collect()[0]
    if out2["cells_a_only"] + out2["cells_b_only"] == out2["n_cells"]:
        assert out2["tv_distance"] == 1.0


def test_group_divergence_single_group_null(spark):
    from week5_datingnlp_big_data_spark.operators import similarity

    rows = [(i, 0, [1.0] * 8) for i in range(5)]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    )
    out = similarity.group_divergence(df, num_planes=4, dim=8).collect()[0]
    assert out["n_b"] == 0 and out["tv_distance"] is None


def test_lexical_diversity_hand_counts(spark):
    from week5_datingnlp_big_data_spark.operators import textstats

    rows = [
        ("a", "the cat the cat"),     # toks 4, types 2; bigrams 3, types 3
        ("a", "the cat"),             # toks 2, types 2; bigrams 1 (dup of 'the cat')
        ("b", "x"),                   # 1 token, no bigrams
        ("c", "   "),                 # empty after trim
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in textstats.lexical_diversity(df).collect()}
    a = out["a"]
    assert (a["n_docs"], a["n_tokens"], a["n_types"]) == (2, 6, 2)
    # bigrams: doc1 = [the cat, cat the, the cat], doc2 = [the cat]
    assert (a["n_bigrams"], a["n_bigram_types"]) == (4, 2)
    assert a["ttr"] == round(2 / 6, 6) and a["distinct2"] == 0.5
    b = out["b"]
    assert (b["n_tokens"], b["n_bigrams"]) == (1, 0)
    assert b["ttr"] == 1.0 and b["distinct2"] is None
    c = out["c"]
    assert (c["n_docs"], c["n_tokens"]) == (1, 0)
    assert c["ttr"] is None


def test_retrieval_metrics_hand_case(spark):
    # query q1: ranked docs 1..4, relevant {2, 3, 99}: hits at ranks 2,3
    ranked = spark.createDataFrame(
        [("q1", d, r) for r, d in enumerate([1, 2, 3, 4], 1)]
        + [("q2", 7, 1), ("q2", 8, 2)],
        "query_id string, doc_id long, rank long",
    )
    relevant = spark.createDataFrame(
        [("q1", 2), ("q1", 3), ("q1", 99), ("q2", 9)],
        "query_id string, doc_id long",
    )
    out = {
        r["query_id"]: r
        for r in evalx.ranked_retrieval_metrics(
            ranked, relevant, k=4
        ).collect()
    }
    g = evalx._dcg_gain_table(4)
    q1 = out["q1"]
    assert q1["n_relevant"] == 3 and q1["hits_at_k"] == 2
    assert q1["rr"] == 0.5
    assert q1["precision_at_k"] == 0.5
    assert q1["recall_at_k"] == round(2 / 3, 6)
    assert q1["dcg_q"] == g[1] + g[2]          # hits at ranks 2 and 3
    assert q1["idcg_q"] == g[0] + g[1] + g[2]  # min(3, 4) ideal hits
    assert q1["ndcg"] == round((g[1] + g[2]) / (g[0] + g[1] + g[2]), 9)
    # q2: relevant doc never retrieved -> zero hits, NULL rr, dcg 0
    q2 = out["q2"]
    assert q2["hits_at_k"] == 0 and q2["rr"] is None
    assert q2["dcg_q"] == 0 and q2["ndcg"] == 0.0


def test_retrieval_metrics_perfect_ranking_ndcg_one(spark):
    ranked = spark.createDataFrame(
        [("q", d, d) for d in range(1, 6)],
        "query_id string, doc_id long, rank long",
    )
    relevant = spark.createDataFrame(
        [("q", 1), ("q", 2)], "query_id string, doc_id long"
    )
    out = evalx.ranked_retrieval_metrics(ranked, relevant, k=5).collect()[0]
    assert out["rr"] == 1.0 and out["ndcg"] == 1.0
    assert out["recall_at_k"] == 1.0
