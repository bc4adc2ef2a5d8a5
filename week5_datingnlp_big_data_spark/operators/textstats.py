"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

Extension surface (SURVEY.md section 2.10 north star). Everything here is
pure ``pyspark.sql.functions`` — per-row, shuffle-free, codegen'd — and
SQL-expressible for the DuckDB oracle. At 100 TB these run at scan speed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker-word profiles for the n-gram/stopword language heuristic. Small
# on purpose: the intent is a cheap scan-speed filter, not a classifier.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "you", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht"],
}

_BPE_ISH_PAT = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lang_id_score(c: Column | str, lang: str) -> Column:
    """Marker hits for one language over the whitespace-lowered tokens."""
    words = F.split(F.lower(_col(c)), "\\s+")
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(words, lambda w: w.isin(markers)))


def lang_id(c: Column | str, default: str = "und") -> Column:
    """Argmax language over the marker profiles; 'und' when no marker hits.
    Deterministic tiebreak: profile order (en > fr > es > de)."""
    scores = [(lang, lang_id_score(c, lang)) for lang in LANG_MARKERS]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit(default)
    # Build reversed so earlier profiles win ties.
    for lang, s in reversed(scores):
        result = F.when(s == best_score, F.lit(lang)).otherwise(result)
    return F.when(best_score > 0, result).otherwise(F.lit(default))


# Char-trigram profiles (top distinctive trigrams per language, spaces
# marked with '_'): the classic n-gram language-ID signal.
LANG_TRIGRAMS: dict[str, list[str]] = {
    "en": ["the", "ing", "and", "ion", "_th", "he_", "ed_", "_of"],
    "fr": ["es_", "de_", "_de", "le_", "ent", "que", "_le", "ais"],
    "es": ["de_", "_de", "os_", "la_", "_la", "ión", "que", "ar_"],
    "de": ["en_", "er_", "ch_", "sch", "die", "ein", "_de", "und"],
}


def chargram_score(c: Column | str, lang: str, n: int = 3) -> Column:
    """Count occurrences of the language's profile trigrams in the text
    (spaces normalized to '_'). Pure built-ins: sequence → substring →
    profile membership."""
    s = F.concat(F.lit("_"), F.regexp_replace(F.lower(_col(c)), "\\s+", "_"), F.lit("_"))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(s) - n, F.lit(0))),
        lambda i: s.substr(i + 1, F.lit(n)),
    )
    profile = LANG_TRIGRAMS[lang]
    return F.when(F.length(s) >= n, F.size(F.filter(grams, lambda g: g.isin(profile)))).otherwise(
        F.lit(0)
    )


def lang_id_chargram(c: Column | str, default: str = "und") -> Column:
    """Argmax language over char-trigram profile hits, length-normalized
    implicitly by comparing raw counts on the same text. Deterministic
    tiebreak: profile order."""
    scores = [(lang, chargram_score(c, lang)) for lang in LANG_TRIGRAMS]
    best = F.greatest(*[s for _, s in scores])
    result = F.lit(default)
    for lang, s in reversed(scores):
        result = F.when(s == best, F.lit(lang)).otherwise(result)
    return F.when(best > 0, result).otherwise(F.lit(default))


def token_count_ws(c: Column | str) -> Column:
    """Whitespace token count."""
    s = F.trim(_col(c))
    return F.when(F.length(s) == 0, F.lit(0)).otherwise(F.size(F.split(s, "\\s+")))


def token_count_bpe_ish(c: Column | str) -> Column:
    """BPE-flavored proxy count: alpha runs count 1, each digit counts 1,
    each other non-space char counts 1 (≈ how byte-pair vocabularies split
    text-vs-numbers-vs-punctuation)."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(_BPE_ISH_PAT), 0))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: char length, word count, mean word length,
    alpha/space/punct ratios, stopword ratio, all-caps-word ratio."""
    s = _col(text_col)
    words = F.split(F.trim(s), "\\s+")
    n_chars = F.length(s)
    n_words = token_count_ws(s)
    stop_hits = F.size(
        F.filter(F.split(F.lower(s), "\\s+"), lambda w: w.isin(LANG_MARKERS["en"]))
    )
    n_alpha = F.length(F.regexp_replace(s, "[^a-zA-Z]", ""))
    n_space = F.length(F.regexp_replace(s, "[^ \\t\\n]", ""))
    n_punct = F.length(F.regexp_replace(s, "[a-zA-Z0-9 \\t\\n]", ""))
    return docs.withColumns({
        "n_chars_m": n_chars,
        "n_words": n_words,
        "mean_word_len": F.round(
            F.when(n_words > 0, (n_chars - n_space) / n_words).otherwise(F.lit(0.0)), 6
        ),
        "alpha_ratio": F.round(F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0), 6),
        "punct_ratio": F.round(F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0), 6),
        "stopword_ratio": F.round(
            F.when(n_words > 0, stop_hits / n_words).otherwise(0.0), 6
        ),
    })


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score: in-range length + wordy + some
    stopwords + low punctuation. The weights are heuristic; the VALUE is
    that it is deterministic, cheap, and filterable at scan speed."""
    feat = quality_features(docs, text_col)
    len_ok = F.when(F.col("n_words").between(10, 100_000), 1.0).otherwise(0.3)
    alpha_ok = F.least(F.col("alpha_ratio") / 0.6, F.lit(1.0))
    stop_ok = F.least(F.col("stopword_ratio") / 0.05, F.lit(1.0))
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    return feat.withColumn(
        "quality",
        F.round((len_ok * 0.3 + alpha_ok * 0.3 + stop_ok * 0.2 + punct_ok * 0.2), 6),
    )


def fingerprint(c: Column | str) -> Column:
    """Normalization fingerprint: md5 of the lowercased,
    punctuation-collapsed, whitespace-normalized text. Robust exact-dedup
    key (catches case/punct/spacing variants)."""
    # Positive-class extract + join == trim(replace(runs, " ")) exactly,
    # minus the JDK negated-class lambda slow path (see functions/text.py).
    norm = F.array_join(
        F.regexp_extract_all(F.lower(_col(c)), F.lit("[a-z0-9]+"), F.lit(0)), " "
    )
    return F.md5(norm)


def doc_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col),
        fingerprint(text_col).alias("fingerprint"),
        F.sha2(_col(text_col), 256).alias("content_hash"),
    )


# PII surface patterns. Written to the regex subset shared by Java
# (Spark) and RE2 (DuckDB): no lookaround, no backreferences, so the
# SAME pattern string runs in both engines for the oracle twin. The
# phone pattern requires a leading '+' on purpose — a bare digit-run
# heuristic false-positives on ids/quantities, and a training-data
# scrubber would rather under-redact deterministically than shred
# numerals (the conservative choice is also the dialect-stable one).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9 ()\-]{6,}[0-9]",
}

# Replacement order matters: emails first (an email's domain would
# otherwise be half-eaten by nothing, but an IPv4-looking local part
# must be consumed as part of the email), then IPs, then phones.
_PII_ORDER = ("email", "ipv4", "phone")


def pii_counts(c: Column | str) -> dict[str, Column]:
    """Per-type PII hit counts over one text column (scan-speed
    built-ins; each count is a regexp_extract_all size)."""
    return {
        kind: F.size(F.regexp_extract_all(_col(c), F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def pii_redact(c: Column | str) -> Column:
    """Replace every PII span with a typed tag ('<EMAIL>', '<IPV4>',
    '<PHONE>'). Pure regexp_replace chain — per-row, shuffle-free,
    whole-stage codegen; at 100 TB this is a scan-speed rewrite pass."""
    out = _col(c)
    for kind in _PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII stats + redacted text: counts per type and the scrubbed
    string. Counting runs on the ORIGINAL text (redaction is applied
    after), so counts equal the number of tags inserted."""
    counts = pii_counts(text_col)
    return docs.select(
        F.col(id_col),
        *[cnt.alias(f"n_{kind}") for kind, cnt in counts.items()],
        pii_redact(text_col).alias("redacted"),
    )


def _doc_term_counts_ws(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace-lowered per-doc term counts ``(id, term, c)`` — the
    shared base of the unigram LM and the per-doc score."""
    from week5_datingnlp_big_data_spark.session import spread

    words = F.split(F.trim(F.lower(_col(text_col))), "\\s+")
    nonempty = docs.filter(F.length(F.trim(F.coalesce(_col(text_col), F.lit("")))) > 0)
    # spread() before the explode: a single-file parquet scan would run
    # the split+explode single-threaded ahead of the groupBy shuffle.
    return (
        spread(nonempty).select(F.col(id_col), F.explode(words).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_lm(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus unigram language model: (term, logprob) with
    logprob = log10(count(term) / total_tokens) over whitespace-lowered
    tokens. One explode + one groupBy — partial aggregation absorbs the
    Zipf head map-side, and the total is a scalar broadcast."""
    counts = (
        _doc_term_counts_ws(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.sum("c").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "term", F.log10(F.col("cnt") / F.col("total")).alias("logprob")
    )


def unigram_logprob_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style document rarity score: mean negative log10 unigram
    probability per document (the unigram stand-in for LM perplexity;
    Wenzek et al. 2020 bucket CommonCrawl by exactly this kind of score
    to split head/middle/tail quality tiers).

    Distributed shape: tokenize + explode + per-doc term counts happen
    ONCE (persisted — the table feeds both the LM aggregate and the score
    join); the LM is then a vocab-sized rollup of those counts, never a
    second pass over the token stream. The final join keys on term over
    distinct (doc, term) pairs — volume bounded by the DFM's nnz, not
    token count — joining the LM side by hash key with NO forced
    broadcast: the table has one row per distinct corpus token, which is
    unbounded at 100 TB, so AQE decides (it broadcasts when the measured
    size is small and falls back to a shuffle join — with skew handling —
    when it is not)."""
    doc_terms = _doc_term_counts_ws(docs, text_col, id_col).persist()
    lm = (
        doc_terms.groupBy("term")
        .agg(F.sum("c").alias("cnt"))
        .crossJoin(
            F.broadcast(
                doc_terms.agg(F.sum("c").alias("total"))
            )
        )
        .select("term", F.log10(F.col("cnt") / F.col("total")).alias("logprob"))
    )
    return (
        doc_terms.join(lm, "term")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(-F.sum(F.col("c") * F.col("logprob")) / F.sum("c"), 6).alias(
                "mean_neg_logprob"
            ),
        )
    )


def unigram_logprob_cross(
    train_docs: DataFrame,
    score_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Cross-corpus LM scoring — the CCNet recipe PROPER (Wenzek et al.
    2020 train their LM on Wikipedia and score CommonCrawl with it;
    ``unigram_logprob_scores`` is the single-corpus simplification): fit
    the unigram LM on ``train_docs``, score ``score_docs`` against it.
    Out-of-vocabulary terms get add-α mass via one shared unknown bucket:
    p(w) = (cnt_train(w) + α) / (total_train + α·(V_train + 1)), so every
    unseen type scores α/(total + α(V+1)). Returns per scored doc
    ``(doc_id, n_tokens, oov_frac, mean_neg_logprob)`` — oov_frac (the
    fraction of tokens unseen in training) is itself a standard
    domain-mismatch signal.

    Scale shape: the train side collapses to a vocab-sized (term, cnt)
    table in one tokenize pass; its (total, V) is a one-row rollup OF THAT
    TABLE (no second pass). The scored side joins the LM per distinct
    (doc, term) pair — LEFT join so OOV terms survive with NULL counts —
    with the LM side joined by hash key, no forced broadcast (the train
    vocabulary is unbounded at crawl scale; AQE broadcasts only when the
    measured size permits). Neither corpus is ever scanned twice, and
    nothing is collected at the driver."""
    lm = (
        _doc_term_counts_ws(train_docs, text_col, id_col)
        .groupBy("term")
        .agg(F.sum("c").alias("cnt"))
        .persist()
    )
    stats = lm.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("v")
    )
    score_terms = _doc_term_counts_ws(score_docs, text_col, id_col)
    logp = F.log10(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
        / (F.col("total") + F.lit(alpha) * (F.col("v") + 1))
    )
    oov = F.when(F.col("cnt").isNull(), F.col("c")).otherwise(F.lit(0))
    return (
        score_terms.join(lm, "term", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(F.sum(oov) / F.sum("c"), 6).alias("oov_frac"),
            F.round(-F.sum(F.col("c") * logp) / F.sum("c"), 6).alias(
                "mean_neg_logprob"
            ),
        )
    )


def bigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Bigram-LM document scores: mean −log10 P(w₂|w₁) with add-α
    smoothing, P = (c(w₁w₂)+α) / (c(w₁·)+α·V) where c(w₁·) is the
    context count (Σ_w₂ c(w₁w₂)) and V the corpus vocabulary size — the
    conditional upgrade of ``unigram_logprob_scores``: repeated boilerplate
    transitions score low, incoherent word salad scores high.

    Distributed shape: one explode of adjacent pairs → per-doc bigram
    counts (one (doc,w₁,w₂) shuffle, volume bounded by distinct per-doc
    bigrams); the global bigram table and its w₁-context rollup are both
    derived from those counts (vocab²-bounded aggregates, never a second
    corpus pass); V is a scalar broadcast. The final join is
    bigram-vocab-sized — hash-keyed with no forced hint, AQE-planned at extreme
    vocabulary sizes (same note as the unigram scorer). Docs with fewer
    than 2 words have no bigrams and are excluded, like empty docs in the
    unigram scorer."""
    from week5_datingnlp_big_data_spark.session import spread

    words = F.split(F.trim(F.lower(_col(text_col))), "\\s+")
    nonempty = docs.filter(F.length(F.trim(F.coalesce(_col(text_col), F.lit("")))) > 0)
    # Persist: the tokenized rows feed TWO consumers — the bigram explode
    # and the vocabulary-size aggregate — and the split would otherwise
    # re-run over the whole corpus for each. spread() first: the persist
    # materializes at scan parallelism, which for a single-file scan
    # would tokenize the whole corpus on one core.
    base = spread(nonempty).select(F.col(id_col), words.alias("ws")).persist()
    grams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 2),
            lambda i: F.struct(
                F.col("ws")[i].alias("w1"), F.col("ws")[i + 1].alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    doc_bi = (
        base.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    big = doc_bi.groupBy("w1", "w2").agg(F.sum("c").alias("c12"))
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab_size = (
        base.select(F.explode("ws").alias("t")).agg(
            F.countDistinct("t").alias("v")
        )
    )
    lm = (
        big.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .select(
            "w1", "w2",
            F.log10(
                (F.col("c12") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ).alias("logprob"),
        )
    )
    return (
        doc_bi.join(lm, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(-F.sum(F.col("c") * F.col("logprob")) / F.sum("c"), 6).alias(
                "mean_neg_logprob"
            ),
        )
    )


def kn_bigram_logprob_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scores (Kneser & Ney 1995; Chen &
    Goodman 1998 — the smoothing every serious count-based LM uses):

        P_KN(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·)
                      + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)

    where N₁₊(w₁·) = distinct continuations of w₁, N₁₊(·w₂) = distinct
    contexts preceding w₂ (the continuation probability — "how many
    contexts has w₂ completed", which is what makes KN beat add-α on
    burstiness), and N₁₊(··) = distinct bigram types. Scoring is over
    observed corpus bigrams only (single-corpus rarity scoring, like the
    unigram scorer), so the max(·−D, 0) clamp is vacuous (c ≥ 1 > D)
    and omitted to keep the float expression identical in both engines.

    Distributed shape mirrors ``bigram_logprob_scores``: one adjacent-
    pair explode → per-doc bigram counts; the bigram table, its context
    rollup (c₁, N₁₊(w₁·)), and the continuation rollup (N₁₊(·w₂)) are
    all vocab²-bounded aggregates OF THAT TABLE; N₁₊(··) is a scalar
    broadcast; the two LM joins are hash-keyed with no forced hint
    (AQE decides — the bigram vocabulary is unbounded at 100 TB)."""
    from week5_datingnlp_big_data_spark.session import spread

    words = F.split(F.trim(F.lower(_col(text_col))), "\\s+")
    nonempty = docs.filter(F.length(F.trim(F.coalesce(_col(text_col), F.lit("")))) > 0)
    base = spread(nonempty).select(F.col(id_col), words.alias("ws"))
    grams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 2),
            lambda i: F.struct(
                F.col("ws")[i].alias("w1"), F.col("ws")[i + 1].alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    doc_bi = (
        base.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    big = doc_bi.groupBy("w1", "w2").agg(F.sum("c").alias("c12")).persist()
    ctx = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p"))
    n_types = big.agg(F.count(F.lit(1)).alias("n1tot"))
    # identical association in the DuckDB twin: (c12-D)/c1 + D*n1f/c1*n1p/n1tot
    p = (
        (F.col("c12") - F.lit(discount)) / F.col("c1")
        + F.lit(discount) * F.col("n1f") / F.col("c1")
        * F.col("n1p") / F.col("n1tot")
    )
    lm = (
        big.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(n_types))
        .select("w1", "w2", F.log10(p).alias("logprob"))
    )
    return (
        doc_bi.join(lm, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(-F.sum(F.col("c") * F.col("logprob")) / F.sum("c"), 6).alias(
                "mean_neg_logprob"
            ),
        )
    )


def compression_ratios(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) — the
    classic cheap redundancy signal: boilerplate and looping text
    compresses far below ~0.4 while natural prose sits higher. Not
    SQL-expressible (no zlib in the oracle) → rows-only + unit-pinned.

    Arrow-batched pandas UDF: one Python call per batch, zlib releases
    the GIL, and only (id, text) cross the JVM boundary."""
    import zlib

    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def _ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return texts.map(one)

    return docs.select(
        F.col(id_col),
        F.length(_col(text_col)).alias("n_chars"),
        _ratio(_col(text_col)).alias("compression_ratio"),
    )


def repetition_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/MassiveText-style within-document repetition signals
    (Rae et al. 2021 §A1.1 "repetitious documents"): duplicate-word
    fraction, duplicate-2-gram fraction, and the share of the document
    taken by its single most frequent 2-gram. High values mark the
    looping/boilerplate pages a pretraining quality filter drops.

    Distributed form: explode → (doc, gram) partial count → per-doc
    aggregate. Both shuffles key on (doc_id[, gram]) so no single doc's
    grams ever need to fit anywhere but its own partition rows — the
    per-doc max/distinct never materializes a vocabulary map per doc the
    way a UDF would. One-word docs have no 2-grams; their 2-gram
    fractions are defined as 0.0 (left join + coalesce, not a crash).
    """
    nonempty = docs.filter(F.length(F.trim(F.coalesce(_col(text_col), F.lit("")))) > 0)
    words = F.split(F.trim(F.lower(_col(text_col))), "\\s+")
    base = nonempty.select(F.col(id_col), words.alias("ws"))
    grams2 = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - 2),
            lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    uni = (
        base.select(F.col(id_col), F.explode("ws").alias("g"))
        .groupBy(id_col, "g")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_words"),
            F.count(F.lit(1)).alias("_n_dw"),
        )
    )
    bi = (
        base.select(F.col(id_col), F.explode(grams2).alias("g"))
        .groupBy(id_col, "g")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("_n_g"),
            F.count(F.lit(1)).alias("_n_dg"),
            F.max("count").alias("_top_g"),
        )
    )
    return uni.join(bi, id_col, "left").select(
        F.col(id_col),
        F.col("n_words"),
        F.round(1 - F.col("_n_dw") / F.col("n_words"), 6).alias("dup_word_frac"),
        F.coalesce(
            F.round(1 - F.col("_n_dg") / F.col("_n_g"), 6), F.lit(0.0)
        ).alias("dup_2gram_frac"),
        F.coalesce(
            F.round(F.col("_top_g") / F.col("_n_g"), 6), F.lit(0.0)
        ).alias("top_2gram_frac"),
    )


def lm_quality_buckets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet head/middle/tail quality tiers (Wenzek et al. 2020): split
    the corpus into terciles of the per-doc LM score
    (``unigram_logprob_scores``) and label each document head (most
    LM-probable third), middle, or tail.

    Scale shape — deliberately NOT a global ``ntile`` (a rank window over
    every document is a single-partition sort at corpus cardinality).
    Tercile thresholds come from a type-level cumulative histogram
    instead: scores are already rounded to 6 dp, so the distinct-value
    table is bounded by the score value-space (≤ ~10^7 values regardless
    of corpus size); one ordered window over THAT table yields exact
    cumulative counts, and the two thresholds broadcast back as a 1-row
    dimension. Ties share a bucket (all docs with an equal score land
    together), which also makes the assignment deterministic with no
    tiebreak column.
    """
    from pyspark.sql import Window

    scores = unigram_logprob_scores(docs, text_col, id_col).persist()
    dist = scores.groupBy("mean_neg_logprob").agg(F.count(F.lit(1)).alias("c"))
    cum = dist.withColumn(
        "cum", F.sum("c").over(Window.orderBy("mean_neg_logprob"))
    )
    # corpus size as a broadcast scalar derived from the histogram
    # itself (Σ c ≡ count of scored docs) — the old eager ``count()``
    # executed the whole scoring pipeline once at CONSTRUCTION time
    # just to inline N as a Python literal (optimization r8)
    n_total = dist.agg(F.sum("c").alias("_n"))
    thresholds = cum.crossJoin(F.broadcast(n_total)).agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("_n"), F.col("mean_neg_logprob"))
        ).alias("t1"),
        F.min(
            F.when(F.col("cum") * 3 >= 2 * F.col("_n"), F.col("mean_neg_logprob"))
        ).alias("t2"),
    )
    return scores.crossJoin(F.broadcast(thresholds)).select(
        id_col,
        "n_tokens",
        "mean_neg_logprob",
        F.when(F.col("mean_neg_logprob") <= F.col("t1"), F.lit("head"))
        .when(F.col("mean_neg_logprob") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("lm_bucket"),
    )


def quality_ensemble(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Multi-signal quality ensemble (the FineWeb/DataComp-style blend):
    orient three independent per-doc signals — heuristic quality score
    (higher = better), duplicate-word fraction (higher = worse), unigram
    LM rarity (higher = worse, CCNet tail) — as corpus percentile ranks,
    average them, and bucket into deciles. Single-signal filters each
    have blind spots (a repetitive page can score well on length/punct
    heuristics); production curation stacks rank on a blend.

    Scale shape: percentile ranks are deliberately NOT a global
    ``percent_rank`` window (single-partition sort at corpus
    cardinality). Each signal is rounded to 6 dp, so its distinct-value
    table is bounded by the signal's value space (ratios ≤ 10^6+1 values,
    LM scores ≤ ~10^7) regardless of corpus size; one ordered window over
    THAT table yields exact strictly-less counts, and
    pr = less/(n-1) — bit-identical to percent_rank — joins back on the
    value column (AQE broadcasts the small side). Ties share a rank, so
    the assignment is deterministic with no tiebreak column.

    Returns ``(doc_id, quality, dup_word_frac, mean_neg_logprob, q_pr,
    rep_pr, lm_pr, ensemble, decile)`` — prs/ensemble rounded to 6,
    decile = least(floor(ensemble*10), 9) over non-empty documents.

    The token-derived signals share ONE ``(doc, term, c)`` table:
    dup_word_frac is 1 − distinct/total of exactly the counts the LM
    score aggregates (the inner term join keeps every row — the LM is
    fit on the same corpus), so the corpus is tokenized once, not once
    per signal. Only the scan-speed heuristic features read the text a
    second time. Signal values are bit-identical to the standalone
    ``repetition_scores`` / ``unigram_logprob_scores`` operators.
    """
    from pyspark.sql import Window

    q = quality_score(
        docs.filter(F.length(F.trim(F.coalesce(_col(text_col), F.lit("")))) > 0),
        text_col,
    ).select(id_col, "quality")
    # persisted for the duration of THIS call only: doc_terms feeds the
    # LM rollup, the corpus total and the signal join (relying on AQE
    # exchange reuse instead measured 2x slower cache-cleared, r9 A/B —
    # only the shuffle write is shared; each consumer re-runs the
    # reduce-side aggregation). Released below once ``joined`` is
    # materialized (VERDICT r8 #1: the r8 form never unpersisted it).
    doc_terms = _doc_term_counts_ws(docs, text_col, id_col).persist()
    lm = (
        doc_terms.groupBy("term")
        .agg(F.sum("c").alias("cnt"))
        .crossJoin(F.broadcast(doc_terms.agg(F.sum("c").alias("total"))))
        .select("term", F.log10(F.col("cnt") / F.col("total")).alias("logprob"))
    )
    sig = (
        doc_terms.join(lm, "term")
        .groupBy(id_col)
        .agg(
            F.round(1 - F.count(F.lit(1)) / F.sum("c"), 6).alias("dup_word_frac"),
            F.round(-F.sum(F.col("c") * F.col("logprob")) / F.sum("c"), 6).alias(
                "mean_neg_logprob"
            ),
        )
    )
    # ``joined`` IS a load-bearing materialization barrier: the returned
    # plan references it four times (the row side plus the three signal
    # histograms) by DIFFERENT keys, so exchange reuse cannot deduplicate
    # them — without the persist the three-signal join would execute four
    # times. It is materialized HERE (the count populates the cache — the
    # exact work the first downstream action would have done; on a warm
    # session the CacheManager resolves the identical plan to the
    # existing entry and the count is a cache read) so doc_terms can be
    # released as soon as the barrier has consumed it — fixing the r8
    # leak of the largest intermediate, the tokenized (doc, term, c)
    # table (VERDICT r8 #1). ``joined`` itself must outlive the call:
    # the returned plan reads this cache entry.
    joined = q.join(sig, id_col).persist()
    joined.count()
    doc_terms.unpersist()
    # corpus size as a broadcast scalar per signal histogram (Σ _c over
    # the distinct-value table ≡ row count of joined) — the old eager
    # ``count()`` executed the whole three-signal pipeline once at
    # CONSTRUCTION time just to inline N as a Python literal; with the
    # scalar attached in-plan, one action materializes the persisted
    # join exactly once per run (optimization r8). n == 1 keeps the
    # old 0.0 rank via the when() guard (identical values: same double
    # division of the same exact integers).

    def pr_table(col: str, out: str) -> DataFrame:
        dist = joined.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
        tot = dist.agg(F.sum("_c").alias("_n"))
        less = F.sum("_c").over(Window.orderBy(col)) - F.col("_c")
        pr = F.when(
            F.col("_n") > 1, less / (F.col("_n") - 1).cast("double")
        ).otherwise(F.lit(0.0))
        return dist.crossJoin(F.broadcast(tot)).select(
            F.col(col), pr.alias(out)
        )

    ranked = (
        joined.join(pr_table("quality", "_q_pr"), "quality")
        .join(pr_table("dup_word_frac", "_rep_pr"), "dup_word_frac")
        .join(pr_table("mean_neg_logprob", "_lm_pr"), "mean_neg_logprob")
    )
    ensemble = (
        F.col("_q_pr") + (1 - F.col("_rep_pr")) + (1 - F.col("_lm_pr"))
    ) / F.lit(3.0)
    return ranked.select(
        id_col,
        "quality",
        "dup_word_frac",
        "mean_neg_logprob",
        F.round("_q_pr", 6).alias("q_pr"),
        F.round("_rep_pr", 6).alias("rep_pr"),
        F.round("_lm_pr", 6).alias("lm_pr"),
        F.round(ensemble, 6).alias("ensemble"),
        F.least(F.floor(ensemble * 10), F.lit(9).cast("long")).alias("decile"),
    )


def normalize_documents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode text normalization — the cleanup pass every crawl pipeline
    runs before anything hashes or tokenizes (mojibake-adjacent variants
    of one page must dedup together): NFC composition, CRLF/CR → LF,
    control characters stripped (TAB and LF survive), space/tab runs
    collapsed to one space, outer whitespace trimmed. Output:
    ``(doc_id, norm_text, n_chars_removed)``.

    Spark ships no NFC built-in, so this is the engine's one
    text-transform pandas UDF on the hot path — Arrow-batched, only
    (id, text) crossing the JVM boundary, embarrassingly parallel (no
    shuffle). The step order and character classes are pinned by the
    DuckDB oracle twin (``nfc_normalize`` + the same RE2 classes), which
    value-verifies the whole chain per document — UDF paths rarely get
    oracle backing; this one does because NFC is a published standard
    both engines implement identically."""
    import re
    import unicodedata

    from pyspark.sql import types as T

    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    ws = re.compile("[ \t]+")

    def one(t):
        if t is None:
            return None
        # NUL is stripped BEFORE NFC (it is removed by the control class
        # anyway, but C-library NFC implementations — including the
        # oracle's nfc_normalize — treat it as a string terminator, so
        # running NFC on NUL-bearing text is undefined cross-engine; the
        # pre-strip makes the chain well-defined everywhere).
        t = t.replace("\x00", "")
        t = unicodedata.normalize("NFC", t)
        t = t.replace("\r\n", "\n").replace("\r", "\n")
        t = ctrl.sub("", t)
        t = ws.sub(" ", t)
        return t.strip(" \t\n")

    @F.pandas_udf(T.StringType())
    def _norm(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    return docs.select(
        F.col(id_col),
        F.length(_col(text_col)).alias("_raw_len"),
        _norm(_col(text_col)).alias("norm_text"),
    ).select(
        id_col,
        "norm_text",
        (F.col("_raw_len") - F.length("norm_text")).alias("n_chars_removed"),
    )


# Candidate credit-card pattern: 13-19 digits with optional single
# space/dash separators between digits. Written to the Java-regex ∩ RE2
# subset (no lookaround) so the SAME string runs in Spark and the DuckDB
# oracle; \b is ASCII-word-boundary in both dialects. The pattern alone
# over-matches (any long digit run with separators) — Luhn validation
# below is what makes the signal usable: card numbers pass the mod-10
# checksum, random ids fail it 90% of the time.
CCN_PATTERN = r"\b[0-9](?:[ -]?[0-9]){12,18}\b"


def luhn_valid(c: Column) -> Column:
    """Luhn mod-10 checksum over the digits of ``c`` (ISO/IEC 7812):
    from the RIGHT, double every second digit (subtracting 9 when the
    double exceeds 9) and require the total ≡ 0 (mod 10). Pure
    higher-order-function arithmetic — no UDF, runs inside codegen, and
    the identical integer recurrence is expressible in the oracle's SQL
    dialect, so validation is cross-engine exact (no floats anywhere)."""
    digits = F.filter(
        F.split(F.regexp_replace(c, "[^0-9]", ""), ""), lambda d: d != ""
    )
    length = F.size(digits)
    contrib = F.transform(
        digits,
        # 0-based index i → 1-based position from the right r = length-i;
        # double when r is even ⇔ (length - i) % 2 == 0.
        lambda d, i: F.when(
            ((length - i) % 2) == 0,
            d.cast("int") * 2
            - F.when(d.cast("int") > 4, F.lit(9)).otherwise(F.lit(0)),
        ).otherwise(d.cast("int")),
    )
    total = F.aggregate(contrib, F.lit(0), lambda a, x: a + x)
    return (total % 10) == 0


def ccn_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc credit-card-number detection with checksum validation:
    ``(doc_id, n_ccn_candidates, n_ccn_valid)`` where candidates match
    CCN_PATTERN and valid ones additionally pass the Luhn check — the
    standard two-stage PII detector (regex recall, checksum precision)
    that a bare pattern scrubber (``pii_counts``) cannot express.

    Scale shape: regexp_extract_all + nested HOF arithmetic per row —
    scan-speed, shuffle-free, no UDF; at 100 TB this is a free rider on
    any existing corpus pass."""
    cands = F.regexp_extract_all(
        F.coalesce(_col(text_col), F.lit("")), F.lit(CCN_PATTERN), F.lit(0)
    )
    return docs.select(
        F.col(id_col),
        F.size(cands).alias("n_ccn_candidates"),
        F.size(F.filter(cands, luhn_valid)).alias("n_ccn_valid"),
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc character-level Shannon entropy (bits/char) — the cheap
    "is this text or garbage" signal complementing the zlib
    ``compression_ratios`` UDF: binary junk and repeated-key mashing sit
    at the entropy extremes while natural language clusters ~3.5-4.5
    bits. Unlike the zlib signal this one is pure built-ins, so it is
    oracle-verifiable and stays inside whole-stage codegen.

    Output: ``(doc_id, n_chars, n_distinct_chars, char_entropy_bits)``
    for non-empty docs; entropy rounded to 6 dp (the fold runs over the
    SORTED distinct characters so both engines sum the identical term
    sequence — float reproducibility discipline, same as the bench's
    rounded-mean rule).

    Scale shape: O(distinct_chars × len) HOF work per row (alphabet
    sizes are small constants), shuffle-free scan-speed projection."""
    chars = F.filter(F.split(_col(text_col), ""), lambda ch: ch != "")
    n = F.size(chars)
    dist = F.array_sort(F.array_distinct(chars))
    terms = F.transform(
        dist,
        lambda ch: (F.size(F.filter(chars, lambda x: x == ch)) / n)
        * F.log2(F.size(F.filter(chars, lambda x: x == ch)) / n),
    )
    ent = -F.aggregate(terms, F.lit(0.0), lambda a, t: a + t)
    return (
        docs.filter(F.length(F.coalesce(_col(text_col), F.lit(""))) > 0)
        .select(
            F.col(id_col),
            n.alias("n_chars"),
            F.size(dist).alias("n_distinct_chars"),
            F.round(ent, 6).alias("char_entropy_bits"),
        )
    )


def boilerplate_line_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_docfreq: int = 3,
) -> DataFrame:
    """Per-source boilerplate-line detection (the CCNet/C4 per-domain
    pass): a line is boilerplate when its NORMALIZED form (lowercased,
    whitespace-collapsed) appears in >= ``min_docfreq`` distinct
    documents of the SAME source — headers, footers, nav chrome, cookie
    banners. Reported per document: non-blank line count, boilerplate
    line count, and the boilerplate fraction a curation filter thresholds
    on (0.0 for line-less docs — total, never NULL, per the driver
    compare's sort contract).

    Scale shape: one explode over lines, one distinct on
    (source, doc, norm) so within-doc repeats count once toward
    doc-frequency, one aggregate to the (source, norm) df table, and one
    hash join back — NO broadcast hint on the line table (one row per
    distinct line per source: unbounded at crawl scale, AQE decides).
    Per-source partitioning means a domain's boilerplate never shuffles
    against another domain's lines.
    """
    lines = (
        docs.select(
            F.col(id_col),
            F.col(source_col),
            F.explode(
                F.split(F.coalesce(_col(text_col), F.lit("")), "\n")
            ).alias("line"),
        )
        .withColumn(
            "norm",
            F.trim(F.regexp_replace(F.lower(F.col("line")), "\\s+", " ")),
        )
        .filter(F.col("norm") != "")
        .select(id_col, source_col, "norm")
    )
    df_tab = (
        lines.distinct()
        .groupBy(source_col, "norm")
        .agg(F.count(F.lit(1)).alias("line_df"))
    )
    per_line = lines.join(df_tab, [source_col, "norm"])
    per_doc = per_line.groupBy(id_col, source_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.when(F.col("line_df") >= min_docfreq, 1).otherwise(0)
        ).alias("n_boiler"),
    )
    return (
        docs.select(id_col, source_col)
        .join(per_doc, [id_col, source_col], "left")
        .select(
            F.col(id_col),
            F.col(source_col),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("bigint").alias("n_boiler"),
            F.when(
                F.coalesce(F.col("n_lines"), F.lit(0)) > 0,
                F.round(F.col("n_boiler") / F.col("n_lines"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("boiler_frac"),
        )
    )


# Unicode script classes as LITERAL character ranges, so the Java-regex
# (Spark) and RE2 (DuckDB oracle) dialects see byte-identical patterns —
# the same cross-dialect discipline as the ASCII \b pin in functions/text.
SCRIPT_RANGES = {
    "latin": "[A-Za-zÀ-ÖØ-öø-ÿ]",  # Latin-1 letters, excluding × and ÷
    "cjk": f"[{chr(0x4E00)}-{chr(0x9FFF)}]",
    "cyrillic": f"[{chr(0x0400)}-{chr(0x04FF)}]",
    "digit": "[0-9]",
}


def script_stats(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document Unicode-script composition — the multilingual-corpus
    curation signal (mixed-script spam, mislabeled language rows, CJK
    content routed to a Latin tokenizer): counts and fractions of
    Latin/CJK/Cyrillic/digit characters plus a cjk_dominant flag.
    Scan-speed ``regexp_count`` built-ins over literal char-range
    patterns — no UDF, one pass, no shuffle."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(text)
    counts = {
        k: F.regexp_count(text, F.lit(pat)) for k, pat in SCRIPT_RANGES.items()
    }
    safe_n = F.greatest(n, F.lit(1))
    return docs.select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        *[c.cast("bigint").alias(f"n_{k}") for k, c in counts.items()],
        *[
            F.round(c / safe_n, 6).alias(f"{k}_frac")
            for k, c in counts.items()
        ],
        (counts["cjk"] > counts["latin"]).alias("cjk_dominant"),
    )


def readability_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade level (Kincaid et al.
    1975), the classic readability prior in quality-filter stacks.

    Engine spec (owned, deterministic — syllabification proper needs a
    dictionary, and every public implementation approximates):
      * words: whitespace split of the trimmed lowercased text
      * sentences: max(1, number of ``[.!?]+`` runs in the raw text)
      * syllables: per word, max(1, number of ``[aeiouy]+`` vowel runs)
      * FRE  = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
      * FKGL = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59
    both rounded to 6 decimals (the repo's float discipline).

    Pure HOF/regex scan algebra — no shuffle, no UDF; at 100 TB this is
    one more predicate inside the quality-scan's codegen span."""
    raw = F.coalesce(_col(text_col), F.lit(""))
    words = F.split(F.trim(F.lower(raw)), "\\s+")
    n_words = F.size(words).cast("long")
    n_sentences = F.greatest(
        F.size(F.regexp_extract_all(raw, F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("long")
    n_syllables = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wps = n_words.cast("double") / n_sentences
    spw = n_syllables.cast("double") / n_words
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6)
        .alias("flesch_ease"),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6)
        .alias("fk_grade"),
    )


def zipf_fit(
    word_counts: DataFrame,
    word_col: str = "word",
    cnt_col: str = "cnt",
    top_k: int = 100,
    q: int = 1_000_000,
) -> DataFrame:
    """Zipf's-law fit over the word-frequency table (Zipf 1949; the
    log–log rank–frequency regression of Piantadosi 2014's review):
    OLS of ln(freq) on ln(rank) for the top-``top_k`` terms. The Zipf
    exponent is a standard corpus-health diagnostic — natural text sits
    near slope −1; boilerplate-heavy or template-generated corpora
    drift flat or steep (cf. the corpus-statistics audits in Gopher,
    Rae et al. 2021 App. A).

    Determinism discipline: both logs quantize to int64
    (``floor(ln(·)·q)``), so every OLS power sum (Σx Σy Σxy Σx² Σy²) is
    EXACT integer arithmetic — immune to partial-aggregation order —
    and the slope/intercept/R² are fixed expression trees over those
    exact ints (the same quantize-then-divide discipline as the NB/KN
    scorers). With ``q = 1e6`` and ``top_k = 100`` the largest sum
    (n·Σy²) stays under 2⁶³ for per-term counts up to ~10¹² — document
    counts far beyond any corpus here.

    Returns one row: ``(n_terms, sum_xy_q, slope, intercept, r2)`` —
    slope/intercept in natural-log units (intercept de-quantized),
    6-dp; ``r2`` NULL when every top-k count is identical (zero y
    variance). Scale shape: one TakeOrderedAndProject bounds the input
    to ``top_k`` rows; the rank window and OLS aggregate run on that
    bounded set, so corpus size only affects the upstream word count.
    """
    from pyspark.sql import Window

    top = word_counts.orderBy(
        F.desc(cnt_col), F.asc(word_col)
    ).limit(top_k)
    # rank window over the already-bounded top-k set (single partition
    # of <= top_k rows by construction)
    w = Window.orderBy(F.desc(cnt_col), F.asc(word_col))
    pts = top.select(
        F.floor(F.log(F.row_number().over(w).cast("double")) * q)
        .cast("long")
        .alias("xq"),
        F.floor(F.log(F.col(cnt_col).cast("double")) * q)
        .cast("long")
        .alias("yq"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    slope = num / den_x
    fq = float(q)
    intercept = (
        F.col("sy").cast("double") / fq
        - slope * (F.col("sx").cast("double") / fq)
    ) / F.col("n")
    return s.select(
        F.col("n").alias("n_terms"),
        F.col("sxy").alias("sum_xy_q"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.when(
            den_y != 0.0,
            # num*num, not pow(num, 2): IEEE multiply is correctly
            # rounded on every engine; libm pow is only ~1 ulp
            F.round((num * num) / (den_x * den_y), 6),
        ).alias("r2"),
    )


def lexical_diversity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group lexical diversity: type–token ratio and distinct-2
    (distinct bigram share) — the repetitiveness/diversity audit of
    generated or scraped text (distinct-n from Li et al. 2016 §4.1,
    applied corpus-side; a template farm shows high volume with
    collapsed TTR and distinct-2). Whitespace-lower tokens (the NB
    tokenization), bigrams joined with a space.

    Returns per group: ``(group, n_docs, n_tokens, n_types, ttr,
    n_bigrams, n_bigram_types, distinct2)`` — ratios are 6-dp
    divisions of exact counts; groups whose docs have <2 tokens have 0
    bigrams and a NULL distinct2.

    Scale shape: one explode per n-gram order feeding
    count(DISTINCT ...) aggregates — Spark plans these as expand +
    partial aggregation; the group axis is the source dimension.
    """
    base = docs.select(
        F.col(group_col).alias("grp"),
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
            "\\s+",
        ).alias("toks"),
    ).withColumn(
        "toks", F.filter(F.col("toks"), lambda t: F.length(t) > 0)
    )
    docs_per = base.groupBy("grp").agg(F.count(F.lit(1)).alias("n_docs"))
    uni = base.select("grp", F.explode("toks").alias("t")).groupBy(
        "grp"
    ).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("t").alias("n_types"),
    )
    bi = base.filter(F.size("toks") >= 2).select(
        "grp",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("toks", i.cast("int")),
                    F.element_at("toks", (i + 1).cast("int")),
                ),
            )
        ).alias("bg"),
    ).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("bg").alias("n_bigram_types"),
    )
    return (
        docs_per.join(uni, "grp", "left")
        .join(bi, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_types", F.lit(0)).alias("n_types"),
            F.when(
                F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                F.round(
                    F.col("n_types").cast("double") / F.col("n_tokens"), 6
                ),
            ).alias("ttr"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_bigram_types", F.lit(0)).alias("n_bigram_types"),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                F.round(
                    F.col("n_bigram_types").cast("double")
                    / F.col("n_bigrams"),
                    6,
                ),
            ).alias("distinct2"),
        )
    )
