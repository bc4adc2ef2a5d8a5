"""Distributed binary-classifier evaluation: exact AUC via the
Mann–Whitney rank statistic, precision/recall threshold sweeps, and
reliability (calibration) bins — the model-quality measurements a
training-data pipeline runs over its quality/language classifiers
before trusting them to filter a corpus (cf. the classifier-quality
audits in Brown et al. 2020 Appendix A's quality-filter calibration and
RefinedWeb, Penedo et al. 2023 §3.1). No analog in the reference
(`Week5_datingNLP.R` reports only a confusion matrix, R:303); this
module generalizes its M-series evaluation surface to threshold-free
and threshold-sweep metrics.

All three metrics reduce to cumulative counts over the DISTINCT-SCORE
axis:

  * AUC — the U statistic counts (pos, neg) pairs ordered correctly,
    ties at half weight: ``U = Σ_s n_pos(s)·neg_below(s) +
    ½·n_pos(s)·n_neg(s)``, with ``AUC = U / (P·N)`` (Mann & Whitney
    1947; Hand & Till 2001 eq. 3). Kept as the INTEGER ``2U`` so the
    statistic rides a value hash exactly.
  * PR sweep — at threshold t (predict positive when score ≥ t),
    ``tp = P − pos_below(t)``, ``fp = N − neg_below(t)``.
  * Calibration — equal-width integer bins over [min, max] with
    per-bin empirical positive rate vs mean score.

Scale shape: scores first collapse with one map-side-partial
``groupBy(score)`` (distinct-score axis ≤ corpus, usually ≪), then the
running totals use the two-level prefix-sum decomposition
(relational.py:interval_concurrency): cumsum WITHIN a coarse score
band (parallel, one hash exchange), per-band totals cumsum on the tiny
≤``n_bands``-row band axis, offsets broadcast back. Identical to the
global ordered walk, executed at full parallelism — the naive
single-partition ``Window.orderBy(score)`` would serialize the whole
score axis through one task at 100 TB. All counts are int64; the only
doubles are final ratios of exact integers (deterministic IEEE
division, safe to value-hash cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cum_by_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bands: int = 1024,
    strata: tuple[str, ...] = (),
) -> DataFrame:
    """Per-distinct-score cumulative counts (ascending, inclusive),
    independently WITHIN each stratum when ``strata`` names grouping
    columns: ``(*strata, score, n, n_pos, cum_n, cum_pos)`` with
    ``cum_* = Σ over scores ≤ this one in the same stratum``. Two-level
    prefix sum over ``n_bands`` equal-width integer bands per stratum
    (module docstring); with strata the band-offset window partitions
    BY stratum, so no single-partition exchange exists anywhere — the
    offset axis is (strata × n_bands) rows, each stratum's slice
    ≤ n_bands.

    Band arithmetic is exact int64: ``(score − mn) · n_bands`` must not
    overflow — fine for any score range below ~2⁶³/n_bands ≈ 9·10¹⁵,
    which covers the engine's 1e-9-quantized log-likelihood scale by
    two orders of magnitude.
    """
    ks = list(strata)
    g = df.groupBy(
        *ks, F.col(score_col).cast("long").alias("score")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("n_pos"),
    )
    # bounds derive from g, not df: per (strata,) min/max over the
    # distinct-score axis equals min/max over the raw rows (every score
    # appears in g), and it removes the second full-upstream reference.
    if ks:
        bounds = g.groupBy(*ks).agg(
            F.min("score").alias("_mn"),
            F.max("score").alias("_mx"),
        )
        g = g.join(F.broadcast(bounds), ks)
    else:
        bounds = g.agg(
            F.min("score").alias("_mn"), F.max("score").alias("_mx")
        )
        g = g.crossJoin(F.broadcast(bounds))
    g = g.withColumn(
        "_band",
        F.expr(f"((score - _mn) * {n_bands}) div (_mx - _mn + 1)"),
    )
    w_in = (
        Window.partitionBy(*ks, "_band")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = g.select(
        *ks,
        "score",
        "n",
        "n_pos",
        "_band",
        F.sum("n").over(w_in).alias("_in_n"),
        F.sum("n_pos").over(w_in).alias("_in_pos"),
    )
    # strictly-earlier band offsets: each stratum's band axis is
    # ≤ n_bands rows, so this window's partitions are bounded dimension
    # slices (single-partition only in the stratum-free binary case)
    w_bands = (
        Window.partitionBy(*ks) if ks else Window.partitionBy()
    ).orderBy("_band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        g.groupBy(*ks, "_band")
        .agg(F.sum("n").alias("_bn"), F.sum("n_pos").alias("_bp"))
        .select(
            *ks,
            "_band",
            F.coalesce(F.sum("_bn").over(w_bands), F.lit(0)).alias("_off_n"),
            F.coalesce(F.sum("_bp").over(w_bands), F.lit(0)).alias("_off_p"),
        )
    )
    return within.join(F.broadcast(offsets), [*ks, "_band"]).select(
        *ks,
        "score",
        "n",
        "n_pos",
        (F.col("_off_n") + F.col("_in_n")).alias("cum_n"),
        (F.col("_off_p") + F.col("_in_pos")).alias("cum_pos"),
    )


def binary_rank_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "is_pos",
) -> DataFrame:
    """One-row exact ROC-AUC via the rank/U statistic (module
    docstring): ``(n_pos, n_neg, u_stat_x2, auc)``. ``u_stat_x2 = 2U``
    is exact int64 (ties weighted ½ → ×2 stays integral);
    ``auc = 2U / (2·P·N)``, NULL when either class is empty."""
    c = _cum_by_score(df, score_col, label_col)
    per = c.select(
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("_neg"),
        (
            F.col("n_pos")
            * (
                2 * ((F.col("cum_n") - F.col("n")) - (F.col("cum_pos") - F.col("n_pos")))
                + (F.col("n") - F.col("n_pos"))
            )
        ).alias("_u2"),
    )
    t = per.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("_neg").cast("long").alias("n_neg"),
        F.sum("_u2").cast("long").alias("u_stat_x2"),
    )
    return t.select(
        "n_pos",
        "n_neg",
        "u_stat_x2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("u_stat_x2").cast("double")
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                9,
            ),
        ).alias("auc"),
    )


def pr_threshold_sweep(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "is_pos",
) -> DataFrame:
    """Precision/recall at EVERY distinct score threshold (predict
    positive when score ≥ t): ``(threshold, tp, fp, precision,
    recall)``. One row per distinct score — the full PR curve, never a
    sampled approximation; ratios are 6-dp-rounded divisions of exact
    int64 counts. ``tp + fp ≥ n(t) ≥ 1`` at every emitted threshold, so
    precision never divides by zero; recall is NULL when there are no
    positives at all."""
    c = _cum_by_score(df, score_col, label_col)
    totals = c.agg(
        F.sum("n_pos").cast("long").alias("_p"),
        F.sum(F.col("n") - F.col("n_pos")).cast("long").alias("_nn"),
    )
    tp = F.col("_p") - (F.col("cum_pos") - F.col("n_pos"))
    fp = F.col("_nn") - (
        (F.col("cum_n") - F.col("n")) - (F.col("cum_pos") - F.col("n_pos"))
    )
    return c.crossJoin(F.broadcast(totals)).select(
        F.col("score").alias("threshold"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision"),
        F.when(
            F.col("_p") > 0, F.round(tp.cast("double") / F.col("_p"), 6)
        ).alias("recall"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "is_pos",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins (Murphy & Winkler 1977; the data layer
    of a calibration plot): equal-width integer bins over the observed
    [min, max] score range, per-bin ``(bin, n, n_pos, frac_pos,
    avg_score)``. Bin index is exact int64 arithmetic
    (``(s−mn)·n_bins div (mx−mn+1)``, same overflow bound as
    ``_cum_by_score``); ``avg_score`` divides the exact int64 sum, so
    both doubles hash cross-engine. One map-side-partial groupBy after
    a broadcast bounds attach — scan-speed at any scale."""
    scored = df.select(
        F.col(score_col).cast("long").alias("score"),
        F.col(label_col).alias("_pos"),
    )
    bounds = scored.agg(
        F.min("score").alias("_mn"), F.max("score").alias("_mx")
    )
    binned = scored.crossJoin(F.broadcast(bounds)).withColumn(
        "bin",
        F.expr(f"((score - _mn) * {n_bins}) div (_mx - _mn + 1)"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_pos"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.round(
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("frac_pos"),
        F.round(
            F.sum("score").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_score"),
    )


def chi2_term_class(
    train: DataFrame,
    label_col: str = "label",
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    top_k: int = 25,
) -> DataFrame:
    """χ² term–class association for feature selection (Manning,
    Raghavan & Schütze, IIR §13.5.2): doc-level presence contingency
    per (term, class) —

        A = docs in c containing t      B = docs not in c containing t
        C = docs in c without t         D = docs in neither

        χ² = N·(AD − CB)² / ((A+C)(B+D)(A+B)(C+D))

    — ranked top-``top_k`` terms per class (χ² desc, term asc). Returns
    ``(label, term, a_docs, term_docs, chi2_x1e6, rnk)`` with
    ``chi2_x1e6 = floor(χ²·1e6)`` int64: A/B/C/D are exact int64, the
    double intermediates ((AD−CB)² · N) stay below 2⁵³ for corpora up
    to ~10⁷ docs, so the quantized statistic is engine-stable; beyond
    that, rank on the raw double (ordering survives ulp error long
    after the 6th decimal does).

    Terms present in EVERY doc carry no signal and divide by zero —
    they are excluded (A+B < N). Scale shape: one distinct (doc, term)
    projection, one (label, term) groupBy, broadcast class/term
    marginal attaches, and a per-class rank window (partitioned by
    label; per-partition cardinality is the vocab, Zipf-bounded — never
    the corpus).
    """
    presence = train.select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("_doc"),
        F.explode(tokens_col).alias("term"),
    ).filter(F.length("term") > 0).distinct()
    a = presence.groupBy("label", "term").agg(
        F.count(F.lit(1)).alias("a_docs")
    )
    term_docs = a.groupBy("term").agg(F.sum("a_docs").alias("term_docs"))
    class_docs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("_n_c")
    )
    n_tot = class_docs.agg(F.sum("_n_c").alias("_n"))
    big_a = F.col("a_docs").cast("double")
    big_b = (F.col("term_docs") - F.col("a_docs")).cast("double")
    big_c = (F.col("_n_c") - F.col("a_docs")).cast("double")
    big_d = (
        F.col("_n") - F.col("_n_c") - F.col("term_docs") + F.col("a_docs")
    ).cast("double")
    chi2 = (
        F.col("_n").cast("double")
        * (big_a * big_d - big_c * big_b) ** 2
        / (
            (big_a + big_c)
            * (big_b + big_d)
            * (big_a + big_b)
            * (big_c + big_d)
        )
    )
    scored = (
        a.join(F.broadcast(term_docs), "term")
        .join(F.broadcast(class_docs), "label")
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("term_docs") < F.col("_n"))
        .select(
            "label",
            "term",
            "a_docs",
            "term_docs",
            F.floor(chi2 * 1e6).cast("long").alias("chi2_x1e6"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("chi2_x1e6"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str = "rater_a",
    rater_b: str = "rater_b",
) -> DataFrame:
    """Cohen's κ chance-corrected agreement (Cohen 1960) between two
    categorical columns — the label-quality audit behind any
    classifier-vs-gold or annotator-vs-annotator comparison. With
    integer marginals the statistic is a ratio of exact int64s:

        κ = (po − pe) / (1 − pe) = (n·agree − Σ_k rowₖ·colₖ)
                                   / (n² − Σ_k rowₖ·colₖ)

    Returns one row ``(n, n_agree, pe_num, kappa)`` — ``pe_num`` is the
    integer Σ_k rowₖ·colₖ so the whole derivation rides a value hash;
    ``kappa`` (round 9) is NULL when pe = 1 (both raters constant on
    the same single category). Scale shape: one scan for the agreement
    count, two tiny per-category marginal aggregates joined broadcast —
    the category axis is a label set, never the corpus."""
    pairs = df.select(
        F.col(rater_a).alias("_a"), F.col(rater_b).alias("_b")
    )
    tot = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_a") == F.col("_b")).cast("long")).alias("n_agree"),
    )
    ma = pairs.groupBy(F.col("_a").alias("_k")).agg(
        F.count(F.lit(1)).alias("_ra")
    )
    mb = pairs.groupBy(F.col("_b").alias("_k")).agg(
        F.count(F.lit(1)).alias("_rb")
    )
    pe = (
        ma.join(mb, "_k")
        .agg(F.sum(F.col("_ra") * F.col("_rb")).alias("pe_num"))
        .select(F.coalesce("pe_num", F.lit(0)).alias("pe_num"))
    )
    return tot.crossJoin(F.broadcast(pe)).select(
        "n",
        "n_agree",
        "pe_num",
        F.when(
            F.col("n") * F.col("n") != F.col("pe_num"),
            F.round(
                (F.col("n") * F.col("n_agree") - F.col("pe_num")).cast(
                    "double"
                )
                / (F.col("n") * F.col("n") - F.col("pe_num")),
                9,
            ),
        ).alias("kappa"),
    )


def hand_till_auc(
    scored: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
    score_col: str = "score",
    true_col: str = "lang",
    classes: list | None = None,
) -> DataFrame:
    """Multi-class AUC by class-pair decomposition (Hand & Till 2001,
    "A Simple Generalisation of the Area Under the ROC Curve for
    Multiple Class Classification Problems", §3): for every unordered
    class pair {i, j}, Â(i|j) ranks the pair's docs by CLASS i's score
    (docs truly of class i are the positives), Â(j|i) symmetrically by
    class j's score, and the pair's separability is their mean. The
    overall M statistic is the unweighted mean of ``auc_pair`` over
    rows — left to the caller so the per-pair diagnostic (WHICH
    languages the classifier confuses) stays visible.

    Inputs: ``scored`` is the full per-(doc, class) score table
    (ml.naive_bayes_score) and ``truth`` maps each doc to its true
    class. Output: one row per unordered pair —
    ``(class_a, class_b, u2_ab, u2_ba, auc_ab, auc_ba, auc_pair)``
    with the integer 2U statistics riding a value hash and every AUC an
    exact-int ratio (round 9); a direction with an empty class yields
    NULL aucs and a NULL pair mean.

    Scale shape: the class axis is collected to the driver (a label
    set, vocab-bounded — the same bounded-collect discipline as the EM
    tokenizers). Callers that already know the class axis pass it via
    ``classes`` (it MUST equal the distinct ``label_col`` values of
    ``scored``) so construction does not run the scorer pipeline once
    just to enumerate labels — e.g. an NB caller derives it from the
    training labels, a one-column scan instead of the full
    train→score chain (optimization r8). Each scored row expands to at
    most (C−1) strata; then
    the SAME two-level prefix-sum cumulative machinery as the binary
    AUC, with every window partitioned by (pair, scorer[, band]) — no
    single-partition exchange anywhere.
    """
    if classes is None:
        classes = sorted(
            r[0] for r in scored.select(label_col).distinct().collect()
        )
    # defensive (ADVICE r8): a duplicated or unsorted caller-supplied
    # axis would silently skew the pair decomposition — normalizing is
    # free and a no-op for a correct axis
    classes = sorted(set(classes))
    class_arr = F.array(*[F.lit(c) for c in classes])
    j = scored.join(truth, id_col).select(
        F.col(label_col).alias("_scorer"),
        F.col(score_col).cast("long").alias("_score"),
        F.col(true_col).alias("_t"),
    )
    # one lazy truncation at the scores⋈truth seam (optimization r9):
    # the pos/neg strata reference j twice and the banded prefix sum
    # references its input three more times — without the barrier every
    # static copy re-inlines the caller's whole scoring pipeline (the NB
    # caller planned 144 parquet scans in one query). j is one narrow
    # row per scored (doc, class); the upstream plans and runs once.
    j = j.localCheckpoint(eager=False)
    # positives: docs whose true class IS the scorer, one stratum per
    # partner class; negatives: one stratum {scorer, true class}
    pos = j.filter(F.col("_t") == F.col("_scorer")).select(
        "_scorer",
        "_score",
        F.explode(
            F.filter(class_arr, lambda c: c != F.col("_scorer"))
        ).alias("_other"),
    ).select(
        F.least("_scorer", "_other").alias("ca"),
        F.greatest("_scorer", "_other").alias("cb"),
        "_scorer",
        "_score",
        F.lit(True).alias("_pos"),
    )
    neg = j.filter(F.col("_t") != F.col("_scorer")).select(
        F.least("_scorer", "_t").alias("ca"),
        F.greatest("_scorer", "_t").alias("cb"),
        "_scorer",
        "_score",
        F.lit(False).alias("_pos"),
    )
    strata = pos.unionByName(neg)
    c = _cum_by_score(
        strata, "_score", "_pos", strata=("ca", "cb", "_scorer")
    )
    per = c.groupBy("ca", "cb", "_scorer").agg(
        F.sum("n_pos").cast("long").alias("_p"),
        F.sum(F.col("n") - F.col("n_pos")).cast("long").alias("_nn"),
        F.sum(
            F.col("n_pos")
            * (
                2
                * (
                    (F.col("cum_n") - F.col("n"))
                    - (F.col("cum_pos") - F.col("n_pos"))
                )
                + (F.col("n") - F.col("n_pos"))
            )
        )
        .cast("long")
        .alias("_u2"),
    )
    auc = F.when(
        (F.col("_p") > 0) & (F.col("_nn") > 0),
        F.col("_u2").cast("double") / (2.0 * F.col("_p") * F.col("_nn")),
    )
    dirs = per.select(
        "ca", "cb", "_scorer", "_u2", auc.alias("_auc")
    )
    pick = lambda side, col: F.max(
        F.when(F.col("_scorer") == F.col(side), F.col(col))
    )
    return dirs.groupBy("ca", "cb").agg(
        pick("ca", "_u2").alias("u2_ab"),
        pick("cb", "_u2").alias("u2_ba"),
        F.round(pick("ca", "_auc"), 9).alias("auc_ab"),
        F.round(pick("cb", "_auc"), 9).alias("auc_ba"),
        F.round(
            (pick("ca", "_auc") + pick("cb", "_auc")) / 2.0, 9
        ).alias("auc_pair"),
    ).select(
        F.col("ca").alias("class_a"),
        F.col("cb").alias("class_b"),
        "u2_ab", "u2_ba", "auc_ab", "auc_ba", "auc_pair",
    )


def _dcg_gain_table(k: int, q: int = 1_000_000_000) -> list[int]:
    """``floor(q / log2(rank+1))`` for ranks 1..k, computed ONCE in
    Python and inlined as literals into both the Spark plan and the
    oracle SQL (the hyperplane-weight discipline): per-hit DCG gains
    become integer TABLE LOOKUPS at query time, so no engine ever runs
    libm log2 on the hot path and the summed DCG is exact int64 on any
    engine/run/partitioning."""
    import math

    return [math.floor(q / math.log2(i + 1)) for i in range(1, k + 1)]


def ranked_retrieval_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 20,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Ranked-retrieval quality per query — the IR-evaluation trinity
    (Manning, Raghavan & Schütze, IIR §8.4): reciprocal rank,
    precision/recall at k, and nDCG@k with binary relevance
    (Järvelin & Kekäläinen 2002). Evaluates the engine's OWN retrieval
    arms (BM25 / RRF / ANN) against a relevance table.

    Inputs: ``ranked`` — ``(query_id, doc_id, rank)`` with rank 1-based
    per query; ``relevant`` — ``(query_id, doc_id)`` binary ground
    truth. Returns per query: ``(query_id, n_relevant, hits_at_k, rr,
    precision_at_k, recall_at_k, dcg_q, idcg_q, ndcg)``.

    Determinism: DCG per-hit gains and the IDCG prefix sums are
    INTEGER literals from :func:`_dcg_gain_table` (no runtime libm), so
    ``dcg_q``/``idcg_q`` ride a value hash exactly; rr/precision/
    recall/ndcg are single divisions of exact ints. A query with no
    relevant docs yields NULL recall/ndcg; no relevant doc in the top-k
    yields NULL rr and dcg 0. Scale shape: one rank-filtered equi-join
    plus two per-query aggregates — the query axis is the evaluation
    set, never the corpus; the join's build side (relevance table) is
    AQE-broadcastable.
    """
    gains = _dcg_gain_table(k)
    idcg_cum = []
    run = 0
    for g in gains:
        run += g
        idcg_cum.append(run)
    gain_arr = F.array(*[F.lit(g) for g in gains])
    idcg_arr = F.array(*[F.lit(c) for c in idcg_cum])

    topk = ranked.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).alias("rank"),
    )
    rel = relevant.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
    )
    n_rel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_relevant")
    )
    hits = topk.join(rel, ["query_id", "doc_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits_at_k"),
        F.min("rank").alias("_first"),
        F.sum(F.element_at(gain_arr, F.col("rank").cast("int")))
        .cast("long")
        .alias("dcg_q"),
    )
    out = n_rel.join(hits, "query_id", "left")
    idcg = F.element_at(
        idcg_arr, F.least(F.col("n_relevant"), F.lit(k)).cast("int")
    )
    return out.select(
        "query_id",
        "n_relevant",
        F.coalesce("hits_at_k", F.lit(0)).alias("hits_at_k"),
        F.when(
            F.col("_first").isNotNull(),
            F.round(F.lit(1.0) / F.col("_first"), 9),
        ).alias("rr"),
        F.round(
            F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("double") / k, 6
        ).alias("precision_at_k"),
        F.when(
            F.col("n_relevant") > 0,
            F.round(
                F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("double")
                / F.col("n_relevant"),
                6,
            ),
        ).alias("recall_at_k"),
        F.coalesce("dcg_q", F.lit(0)).cast("long").alias("dcg_q"),
        F.when(F.col("n_relevant") > 0, idcg)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("idcg_q"),
        F.when(
            F.col("n_relevant") > 0,
            F.round(
                F.coalesce(F.col("dcg_q"), F.lit(0)).cast("double") / idcg,
                9,
            ),
        ).alias("ndcg"),
    )
