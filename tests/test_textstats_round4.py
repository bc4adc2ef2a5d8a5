"""Unit tests for the round-4 training-data operators: PII scrubbing,
unigram-LM rarity scoring, zlib compression-ratio signal, and SemDeDup
semantic near-dup pairs."""

from __future__ import annotations

import math

import pytest

from week5_datingnlp_big_data_spark.operators import similarity, textstats


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "reach me at jane.doe+spam@mail-host.co.uk or at work"),
        (2, "server 192.168.0.17 and backup 10.0.0.1 are down"),
        (3, "call +1 (555) 010-4242 after five"),
        (4, "no sensitive content here at all"),
        (5, "two mails: a@b.io c.d@e-f.org and ip 8.8.8.8 and +44 20 7946 0958 ok"),
        (6, None),
        (7, "order #123456789 costs 99.99 dollars"),  # digit runs, no PII
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_pii_counts(pii_docs):
    out = {r["doc_id"]: r for r in textstats.pii_scrub(pii_docs).collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 0, 0)
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 2, 0)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 1)
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
    assert (out[5]["n_email"], out[5]["n_ipv4"], out[5]["n_phone"]) == (2, 1, 1)
    # Conservative by design: bare digit runs / prices are NOT phones.
    assert (out[7]["n_email"], out[7]["n_ipv4"], out[7]["n_phone"]) == (0, 0, 0)


def test_pii_redaction_replaces_spans(pii_docs):
    out = {r["doc_id"]: r["redacted"] for r in textstats.pii_scrub(pii_docs).collect()}
    assert out[1] == "reach me at <EMAIL> or at work"
    assert out[2] == "server <IPV4> and backup <IPV4> are down"
    assert out[3] == "call <PHONE> after five"
    assert out[4] == "no sensitive content here at all"
    assert "<EMAIL>" in out[5] and "<IPV4>" in out[5] and "<PHONE>" in out[5]
    # No raw PII survives anywhere.
    for doc_id, red in out.items():
        if red is None:
            continue
        assert "@" not in red, doc_id
        assert "192.168" not in red and "8.8.8.8" not in red
        assert "+1 (555)" not in red and "+44" not in red


def test_unigram_logprob_rare_doc_scores_higher(spark):
    # 9 docs of a common phrase + 1 doc of hapax words: the hapax doc must
    # carry a strictly higher mean negative logprob (rarer tokens).
    rows = [(i, "the cat sat on the mat") for i in range(9)]
    rows.append((9, "zyzzyva quetzal ocelot axolotl"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.unigram_logprob_scores(docs).collect()}
    common = out[0]["mean_neg_logprob"]
    rare = out[9]["mean_neg_logprob"]
    assert rare > common
    assert out[0]["n_tokens"] == 6
    assert out[9]["n_tokens"] == 4
    # Hand-check the hapax doc: every token has count 1 of 58 total tokens
    # (9*6 + 4), so the score is exactly log10(58).
    assert rare == pytest.approx(math.log10(58), abs=1e-6)


def test_unigram_logprob_skips_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    out = textstats.unigram_logprob_scores(docs).collect()
    assert {r["doc_id"] for r in out} == {1}


def test_compression_ratio_orders_repetitive_below_prose(spark):
    rows = [
        (1, "spam " * 400),                      # highly compressible
        (2, ("the quick brown fox jumps over the lazy dog and then wanders "
             "through seventeen unrelated meadows describing each flower "
             "uniquely with varied vocabulary every single time ") * 4),
        (3, ""),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.compression_ratios(docs).collect()}
    assert out[1]["compression_ratio"] < out[2]["compression_ratio"]
    assert out[1]["compression_ratio"] < 0.05
    assert out[3]["compression_ratio"] is None
    assert out[4]["compression_ratio"] is None
    # Deterministic across runs (driver reruns rows-only queries per round).
    again = {r["doc_id"]: r for r in textstats.compression_ratios(docs).collect()}
    assert out[1]["compression_ratio"] == again[1]["compression_ratio"]


@pytest.fixture(scope="module")
def emb4(spark, sf_dir):
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    df = load_table(spark, sf_dir, "embeddings").cache()
    yield df
    df.unpersist()


def test_semantic_dedup_finds_planted_duplicates(emb4, spark):
    """SemDeDup's contract is HIGH-threshold semantic duplicates: plant a
    jittered near-copy of 20 corpus vectors (cos ≈ 0.999) and require ≥
    90% of the planted pairs back — near-identical vectors land in the
    same k-means cell except at cell boundaries. The synthetic corpus
    itself is near-orthogonal (no pairs above cos 0.5), so planted copies
    ARE the ground truth at threshold 0.95."""
    from pyspark.sql import functions as F

    base = emb4.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * 1.001 + 0.0003,
        ).alias("embedding"),
    )
    corpus = (
        emb4.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .unionByName(base)
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(
            corpus, threshold=0.95, n_clusters=8
        ).collect()
    }
    planted = {(i, i + 100_000) for i in range(20)}
    assert len(got & planted) / len(planted) >= 0.9
    # Exact in-cell verification means nothing below the threshold sneaks in.
    assert all(a < b for a, b in got)


def test_semantic_dedup_keep_drops_one_per_pair(spark):
    # Two identical vectors + two far-away ones: exactly one of the twin
    # pair is dropped, everything else kept.
    v = [1.0] + [0.0] * 63
    w = [0.0] * 32 + [1.0] + [0.0] * 31
    u = [0.0, 1.0] + [0.0] * 62
    rows = [(1, v), (2, v), (3, w), (4, u)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {
        r["vec_id"]
        for r in similarity.semantic_dedup_keep(
            df, threshold=0.99, n_clusters=2
        ).collect()
    }
    assert 1 in kept and 2 not in kept
    assert {3, 4} <= kept


def test_semantic_dedup_deterministic_across_runs(emb4):
    a = sorted(
        map(tuple, similarity.semantic_dedup_pairs(emb4, 0.35, 8).collect())
    )
    b = sorted(
        map(tuple, similarity.semantic_dedup_pairs(emb4, 0.35, 8).collect())
    )
    assert a == b


def test_bigram_logprob_hand_computed(spark):
    # d1 = "a b a b" → bigrams (a,b)×2, (b,a)×1; d2 = "a b" → (a,b)×1.
    # Corpus: c(a,b)=3, c(b,a)=1, ctx a=3, b=1; V=3 (the vocabulary
    # includes the bigram-less doc's "solo"), α=0.4.
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.bigram_logprob_scores(docs).collect()}
    p_ab = (3 + 0.4) / (3 + 0.4 * 3)
    p_ba = (1 + 0.4) / (1 + 0.4 * 3)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["mean_neg_logprob"] == pytest.approx(-math.log10(p_ab), abs=1e-6)
    assert out[1]["n_bigrams"] == 3
    want = -(2 * math.log10(p_ab) + math.log10(p_ba)) / 3
    assert out[1]["mean_neg_logprob"] == pytest.approx(want, abs=1e-6)
    assert 3 not in out  # single-word doc has no bigrams


# ---------------------------------------------------------------------------
# Cross-document span dedup (C4/CCNet signal)
# ---------------------------------------------------------------------------

_SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        # docs 1 and 2 share their first 8-word span verbatim
        (1, _SPAN + " unique tail one two three four five six"),
        (2, _SPAN + " other ending seven eight nine ten eleven twelve"),
        # doc 3 repeats ITS OWN span twice (within-doc only — must not flag)
        (3, "solo words here repeated block four five six " * 2),
        # doc 4 has fewer than 8 words → no spans, no output row
        (4, "too short for a span"),
        # doc 5 shares nothing
        (5, "entirely different content with no overlap at all in any span"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    yield df
    df.unpersist()


def test_span_dedup_cross_doc_flags(spark, span_docs):
    from week5_datingnlp_big_data_spark.operators import dedup

    out = {r["doc_id"]: r for r in dedup.span_dup_fractions(span_docs).collect()}
    # doc 1: 2 spans (16 words), first is shared with doc 2
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_spans"] == 1
    assert out[1]["dup_span_frac"] == pytest.approx(0.5)
    assert out[2]["n_dup_spans"] == 1
    # within-doc repetition does not flag
    assert out[3]["n_dup_spans"] == 0
    # sub-span_words doc yields no row at all (trailing partial dropped)
    assert 4 not in out
    assert out[5]["n_dup_spans"] == 0


def test_span_dedup_span_width_respected(spark, span_docs):
    from week5_datingnlp_big_data_spark.operators import dedup

    # with 4-word spans doc 4 (5 words) gets exactly one span
    out = {r["doc_id"]: r for r in dedup.span_dup_fractions(span_docs, span_words=4).collect()}
    assert out[4]["n_spans"] == 1
    # docs 1 and 2 now share the two 4-word halves of the planted span
    assert out[1]["n_dup_spans"] == 2


# ---------------------------------------------------------------------------
# CCNet head/middle/tail LM-quality buckets
# ---------------------------------------------------------------------------


def test_lm_quality_buckets_terciles(spark):
    # 9 docs: three groups of three with sharply different rarity — common
    # words (head), mixed (middle), hapax-heavy (tail).
    rows = [(i, "the the the common common words") for i in range(3)]
    rows += [(i, "the common rare%d mix blend" % i) for i in range(3, 6)]
    rows += [(i, "zzq%d xwv%d qqj%d kkp%d mmz%d" % (i, i, i, i, i)) for i in range(6, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.lm_quality_buckets(docs).collect()}
    assert len(out) == 9
    buckets = [out[i]["lm_bucket"] for i in range(9)]
    assert buckets[:3] == ["head"] * 3
    assert buckets[3:6] == ["middle"] * 3
    assert buckets[6:] == ["tail"] * 3
    # scores are monotone with the buckets
    assert out[0]["mean_neg_logprob"] < out[3]["mean_neg_logprob"] < out[6]["mean_neg_logprob"]


def test_lm_quality_buckets_ties_share_bucket(spark):
    # identical docs → identical scores → everyone lands in ONE bucket
    docs = spark.createDataFrame(
        [(i, "same words every time") for i in range(6)], "doc_id long, text string"
    )
    out = textstats.lm_quality_buckets(docs).collect()
    assert {r["lm_bucket"] for r in out} == {"head"}


def test_normalize_documents_branches(spark):
    from week5_datingnlp_big_data_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "Café plain"),          # NFC composes to é: 1 char shorter
            (2, "a\r\nb\rc"),                 # CRLF and CR both become LF
            (3, "x\x00y\x07z"),               # control chars stripped
            (4, "a  b\t\tc"),                 # space/tab runs collapse
            (5, "  padded  "),                # outer trim
            (6, None),                        # NULL passes through
            (7, "clean"),                     # untouched
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.normalize_documents(docs).collect()}
    assert got[1]["norm_text"] == "Café plain" and got[1]["n_chars_removed"] == 1
    assert got[2]["norm_text"] == "a\nb\nc" and got[2]["n_chars_removed"] == 1
    assert got[3]["norm_text"] == "xyz" and got[3]["n_chars_removed"] == 2
    assert got[4]["norm_text"] == "a b c"
    assert got[5]["norm_text"] == "padded"
    assert got[6]["norm_text"] is None and got[6]["n_chars_removed"] is None
    assert got[7]["norm_text"] == "clean" and got[7]["n_chars_removed"] == 0


# ---------------------------------------------------------------------------
# Cross-corpus LM scoring (CCNet proper: train on reference, score others)
# ---------------------------------------------------------------------------


def test_cross_lm_hand_computed(spark):
    train = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    score = spark.createDataFrame([(10, "a c")], "doc_id long, text string")
    out = textstats.unigram_logprob_cross(train, score).collect()
    assert len(out) == 1
    r = out[0]
    # LM: cnt(a)=2, cnt(b)=1, total=3, V=2; denom = 3 + 0.4*(2+1) = 4.2
    p_a = (2 + 0.4) / 4.2
    p_c = 0.4 / 4.2           # OOV bucket
    want = -(math.log10(p_a) + math.log10(p_c)) / 2
    assert r.n_tokens == 2
    assert r.oov_frac == pytest.approx(0.5, abs=1e-9)
    assert r.mean_neg_logprob == pytest.approx(round(want, 6), abs=2e-6)


def test_cross_lm_oov_scores_higher_than_in_domain(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(10, "the quick brown fox"), (11, "zzz qqq www vvv")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.unigram_logprob_cross(train, score).collect()}
    assert out[10].oov_frac == 0.0
    assert out[11].oov_frac == 1.0
    assert out[11].mean_neg_logprob > out[10].mean_neg_logprob


def test_cross_lm_all_docs_scored_even_if_fully_oov(spark):
    train = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "a b c"), (11, ""), (12, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textstats.unigram_logprob_cross(train, score).collect()}
    assert set(out) == {10}  # empty/null score docs drop like the unigram scorer
    assert out[10].oov_frac == 1.0


def test_normalize_documents_strips_nul_before_nfc(spark):
    # NUL is a C-string terminator in libutf8proc-style NFC
    # implementations (the oracle's nfc_normalize truncates at it); the
    # normalizer strips it pre-NFC so the chain is engine-independent.
    docs = spark.createDataFrame(
        [(1, "ab\x00cd"), (2, "\x00"), (3, "e\x00́f")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textstats.normalize_documents(docs).collect()}
    assert got[1].norm_text == "abcd" and got[1].n_chars_removed == 1
    assert got[2].norm_text == "" and got[2].n_chars_removed == 1
    # with NUL gone pre-NFC, the combining acute composes onto 'e'
    assert got[3].norm_text == "éf"


def test_pq_index_save_load_roundtrip_same_results(spark, sf_dir, tmp_path):
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2]
    cb = similarity.pq_train(emb, num_subspaces=4, codebook_size=8)
    codes = similarity.pq_encode(emb, cb, num_subspaces=4)
    inline = sorted(
        (r.query_id, r.neighbor_id, r.rnk)
        for r in similarity.pq_topk(
            emb, qids, k=5, num_subspaces=4, codebook_size=8, index=(cb, codes)
        ).collect()
    )
    path = str(tmp_path / "pq_index")
    similarity.save_pq_index(path, cb, codes)
    loaded = similarity.load_pq_index(spark, path)
    reloaded = sorted(
        (r.query_id, r.neighbor_id, r.rnk)
        for r in similarity.pq_topk(
            emb, qids, k=5, num_subspaces=4, codebook_size=8, index=loaded
        ).collect()
    )
    assert inline == reloaded and len(inline) == 15


def test_boilerplate_line_stats_flags_per_source_repeats(spark):
    from week5_datingnlp_big_data_spark.operators.textstats import (
        boilerplate_line_stats,
    )

    footer = "Cookie notice: we use cookies"
    docs = spark.createDataFrame(
        [
            # srcA: three docs share the footer (df=3 -> boilerplate);
            # each unique body line stays clean
            (1, f"unique body one\n{footer}", "srcA"),
            (2, f"unique body two\n{footer}\n\n  ", "srcA"),
            (3, f"unique body three\nCOOKIE   notice: we use cookies", "srcA"),
            # srcB: the SAME footer appears only once -> NOT boilerplate
            # there (per-source isolation)
            (4, f"other text\n{footer}", "srcB"),
            # line-less doc -> total row with 0.0 fraction
            (5, None, "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r for r in boilerplate_line_stats(docs).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_boiler"] == 1
    assert out[1]["boiler_frac"] == 0.5
    # blank lines don't count; case/whitespace variants normalize together
    assert out[2]["n_lines"] == 2 and out[2]["n_boiler"] == 1
    assert out[3]["n_boiler"] == 1
    # same footer in srcB is NOT boilerplate (df=1 within that source)
    assert out[4]["n_boiler"] == 0
    assert out[5]["n_lines"] == 0 and out[5]["boiler_frac"] == 0.0


def test_kn_bigram_hand_computed(spark):
    # corpus: d0 = "a b a b" (bigrams ab ab ba), d1 = "a c"
    # big: (a,b)=2 (b,a)=1 (a,c)=1; c1: a=3 b=1; N1+(a.)=2 N1+(b.)=1;
    # N1+(.b)=1 N1+(.a)=1 N1+(.c)=1; N1+(..)=3; D=0.75
    import math

    from week5_datingnlp_big_data_spark.operators import textstats

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in textstats.kn_bigram_logprob_scores(docs).collect()
    }
    p_ab = (2 - 0.75) / 3 + 0.75 * 2 / 3 * 1 / 3
    p_ba = (1 - 0.75) / 1 + 0.75 * 1 / 1 * 1 / 3
    p_ac = (1 - 0.75) / 3 + 0.75 * 2 / 3 * 1 / 3
    want0 = round(
        -(2 * math.log10(p_ab) + math.log10(p_ba)) / 3, 6
    )
    want1 = round(-math.log10(p_ac), 6)
    assert out[0]["n_bigrams"] == 3 and out[0]["mean_neg_logprob"] == want0
    assert out[1]["n_bigrams"] == 1 and out[1]["mean_neg_logprob"] == want1


def test_kn_bigram_mass_bounded_per_context(spark, sf_dir):
    # KN is a proper (sub-)distribution: over each context's OBSERVED
    # continuations, sum P = (c1 - D*N1f)/c1 + D*N1f/c1 * sum(Pcont) <= 1
    from pyspark.sql import functions as F

    from week5_datingnlp_big_data_spark.operators import textstats
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    words = F.split(F.trim(F.lower(F.col("text"))), "\\s+")
    base = docs.filter(
        F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) > 0
    ).select(words.alias("ws"))
    grams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 2),
            lambda i: F.struct(
                F.col("ws")[i].alias("w1"), F.col("ws")[i + 1].alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = (
        base.select(F.explode(grams).alias("g"))
        .groupBy("g.w1", "g.w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    ctx = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p"))
    n1tot = big.count()
    p = (
        (F.col("c12") - F.lit(0.75)) / F.col("c1")
        + F.lit(0.75) * F.col("n1f") / F.col("c1")
        * F.col("n1p") / F.lit(float(n1tot))
    )
    mass = (
        big.join(ctx, "w1").join(cont, "w2")
        .groupBy("w1")
        .agg(F.sum(p).alias("mass"), F.min(p).alias("pmin"))
    )
    rows = mass.collect()
    assert rows and all(r["mass"] <= 1.0 + 1e-9 for r in rows)
    assert all(r["pmin"] > 0 for r in rows)


def test_readability_scores_hand_case(spark):
    from week5_datingnlp_big_data_spark.operators import textstats

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran! Did it?"), (2, "xyz qqq"),
         (3, "reading comprehension evaluation")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.readability_scores(df).collect()}
    r = got[1]
    # 8 words, 3 sentence runs; syllables: the=1 cat=1 sat=1 the=1 dog=1
    # ran=1 did=1 it=1 -> 8
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (8, 3, 8)
    fre = round(206.835 - 1.015 * (8 / 3) - 84.6 * (8 / 8), 6)
    assert abs(r["flesch_ease"] - fre) < 1e-9
    # vowel-less words still count one syllable each
    assert got[2]["n_syllables"] == 2 and got[2]["n_sentences"] == 1
    # long-word doc: rea-ding=2? spec counts vowel RUNS: r(ea)d(i)ng=2,
    # c(o)mpr(e)h(e)ns(io)n=4, (e)v(a)l(ua)t(io)n=4 -> 10
    assert got[3]["n_syllables"] == 10


def test_zipf_fit_exact_golden(spark):
    """zipf_fit must equal the same quantized OLS computed in Python."""
    import math

    from week5_datingnlp_big_data_spark.operators import textstats

    counts = [("a", 64), ("b", 32), ("c", 16), ("d", 8), ("e", 8)]
    df = spark.createDataFrame(counts, "word string, cnt long")
    out = textstats.zipf_fit(df, top_k=5).collect()[0]

    Q = 1_000_000
    pts = [
        (math.floor(math.log(r + 1) * Q), math.floor(math.log(c) * Q))
        for r, (_, c) in enumerate(sorted(counts, key=lambda t: (-t[1], t[0])))
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert out["n_terms"] == n and out["sum_xy_q"] == sxy
    assert out["slope"] == round(slope, 6)
    # counts halve per rank: slope near -1.5 in ln-ln space... exact
    # perfect-doubling would be -log(2)/log(2)=-1 per rank STEP but the
    # x axis is ln(rank); just pin the sane range
    assert -4.0 < out["slope"] < -0.5
    r2num = float(n * sxy - sx * sy)
    r2 = (r2num * r2num) / (float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    assert out["r2"] == round(r2, 6)
    intercept = (sy / Q - slope * (sx / Q)) / n
    assert out["intercept"] == round(intercept, 6)


def test_zipf_fit_zero_y_variance_r2_null(spark):
    from week5_datingnlp_big_data_spark.operators import textstats

    df = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)], "word string, cnt long"
    )
    out = textstats.zipf_fit(df, top_k=3).collect()[0]
    assert out["r2"] is None
    assert out["slope"] == 0.0  # flat counts -> zero slope exactly
