"""Fuzzy string matching at corpus scale: edit-distance-1 typo pair
detection over a word-frequency table via SymSpell-style
delete-neighborhood blocking (Garbe 2012's public symmetric-delete idea:
two words are within edit distance 1 iff their {self} ∪ {1-deletion}
variant sets intersect), then exact Levenshtein verification.

This is the vocabulary-cleaning primitive a crawl pipeline needs (OCR
noise, keyboard typos, tokenizer damage): map rare misspellings onto
their frequent canonical forms WITHOUT an all-pairs distance matrix.

Scale shape: each word explodes to ≤ len+1 variant keys (linear), the
candidate join is a plain equi self-join on the variant string, and
Levenshtein runs on candidates only. Variant-bucket fan-out is bounded by
the alphabet and word length — no quadratic blow-up on Zipf heads,
because a bucket only collects words within deletion distance 1 of one
specific string. The ``min_len`` floor keeps ultra-short words (whose
buckets WOULD be dense and whose edit-distance-1 "typos" are mostly
legitimate words) out of the candidate set entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def delete_variants(word=None):
    """{word} ∪ {word minus character i} as a distinct array column.

    ``Column.substr`` with Column offsets keeps the generation inside
    whole-stage codegen — no UDF. Repeated characters collapse via
    array_distinct so a pair never meets through duplicate keys of the
    same deletion."""
    if word is None:
        word = F.col("word")
    dels = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.concat(
            word.substr(F.lit(1), i - F.lit(1)),
            word.substr(i + F.lit(1), F.length(word)),
        ),
    )
    return F.array_distinct(F.concat(F.array(word), dels))


def edit1_typo_pairs(
    word_freq: DataFrame,
    word_col: str = "word",
    freq_col: str = "n",
    min_len: int = 4,
    freq_ratio: int = 4,
    min_canon_freq: int = 5,
) -> DataFrame:
    """Typo → canonical pairs: unordered word pairs at Levenshtein
    distance exactly 1 where one side (the typo) is at least
    ``freq_ratio``× rarer than the other (the canon) and the canon
    clears ``min_canon_freq``. The frequency asymmetry is what separates
    a misspelling from two legitimate neighbors (``cat``/``car``).

    Output: ``(typo, canon, typo_n, canon_n)``. Direction is decided by
    frequency; the ratio > 1 requirement makes ties impossible, so the
    output is deterministic under any execution order.

    Candidates come from the symmetric-delete join: insertion/deletion
    pairs meet on the shorter word itself, substitution pairs meet on
    the shared deletion — so distance-1 recall is EXACT (no LSH-style
    misses), and the verify step discards the distance-2 pairs the
    blocking over-admits."""
    base = word_freq.filter(F.length(word_col) >= min_len).select(
        F.col(word_col).alias("word"), F.col(freq_col).alias("n")
    )
    v = base.select(
        "word", "n", F.explode(delete_variants(F.col("word"))).alias("key")
    )
    a = v.alias("a")
    b = v.alias("b")
    cand = (
        a.join(b, "key")
        .filter(F.col("a.word") < F.col("b.word"))
        .select(
            F.col("a.word").alias("word_a"),
            F.col("b.word").alias("word_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        # a pair can share several variant keys (e.g. mutual deletions of
        # repeated letters) — collapse before paying for Levenshtein
        .dropDuplicates(["word_a", "word_b"])
    )
    verified = cand.filter(F.levenshtein("word_a", "word_b") == 1)
    typo_n = F.least("n_a", "n_b")
    canon_n = F.greatest("n_a", "n_b")
    return (
        verified.filter(
            (canon_n >= freq_ratio * typo_n) & (canon_n >= min_canon_freq)
        )
        .select(
            F.when(F.col("n_a") < F.col("n_b"), F.col("word_a"))
            .otherwise(F.col("word_b"))
            .alias("typo"),
            F.when(F.col("n_a") < F.col("n_b"), F.col("word_b"))
            .otherwise(F.col("word_a"))
            .alias("canon"),
            typo_n.alias("typo_n"),
            canon_n.alias("canon_n"),
        )
    )


def _delete_variants_upto2(word):
    """{word} ∪ 1-deletions ∪ 2-deletions, distinct — the symmetric-
    delete key set for edit distance ≤ 2 (two strings within Levenshtein
    distance d always meet on a string reachable by ≤ d deletions from
    each; Garbe 2012). Size ≤ 1 + L + L·(L−1)/2 — fine for the SHORT
    strings this blocks (the long ones go through the q-gram path)."""
    one = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.concat(
            word.substr(F.lit(1), i - F.lit(1)),
            word.substr(i + F.lit(1), F.length(word)),
        ),
    )
    two = F.flatten(
        F.transform(
            one,
            lambda w1: F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(w1), F.lit(1))),
                lambda i: F.when(
                    F.length(w1) > 0,
                    F.concat(
                        w1.substr(F.lit(1), i - F.lit(1)),
                        w1.substr(i + F.lit(1), F.length(w1)),
                    ),
                ).otherwise(w1),
            ),
        )
    )
    return F.array_distinct(
        F.concat(F.array(word), one, two)
    )


def qgram_edit_pairs(
    words: DataFrame,
    word_col: str = "word",
    max_dist: int = 2,
    q: int = 2,
    min_len: int = 3,
) -> DataFrame:
    """EXACT-recall fuzzy self-join: every unordered pair of distinct
    strings within Levenshtein distance ``max_dist`` — the scalable
    string-similarity-join machinery of the SSJoin literature, not an
    approximation. Output ``(word_a, word_b, dist)`` with word_a <
    word_b, 1 ≤ dist ≤ max_dist.

    Two lossless candidate generators, split by the count-filter
    validity boundary L = q·(max_dist+1) (= 6 at the q=2/d=2 default):

    * **q-gram prefix filter** (pairs whose longer side has length ≥ L):
      Gravano et al. 2001's count filter — strings within distance d
      share ≥ max(|s1|,|s2|) − q + 1 − q·d positional q-grams (as
      multisets, so grams carry an occurrence index) — combined with the
      prefix filter (Chaudhuri et al. 2006): under ANY global total
      order on the (gram, occ) universe, if |G1 ∩ G2| ≥ t then the
      (|G1|−t+1)-prefixes intersect; with t's lower bound that is the
      (q·d+1)-prefix. Ordering grams by ASCENDING global frequency makes
      every indexed key a string's RAREST grams — the join's hot-key
      mitigation is built into the theorem (Zipf-head grams like "th"
      never become join keys unless a string has nothing rarer).
    * **symmetric-delete neighborhood** (both sides shorter than L,
      where the count-filter threshold degenerates to ≤ 0): delete-≤d
      variant keys, exact for Levenshtein ≤ 2; neighborhood size is
      quadratic in length but the strings here are ≤ L−1 chars by
      construction.

    Candidates from both paths union, dedup, and verify with ONE
    JVM-side ``F.levenshtein`` per pair — the filters are recall-lossless,
    so the verified output equals the brute-force all-pairs join (the
    DuckDB oracle computes exactly that cross join).

    Scale shape: gram/variant explodes are linear-ish per string over
    the Zipf-BOUNDED distinct-word table, never the corpus; the prefix
    join keys are frequency-ordered rarest grams; the only window is
    per-word (vocab-partitioned). ``min_len`` keeps ultra-short strings
    (dense neighborhoods, mostly legitimate words) out entirely."""
    d = max_dist
    boundary = q * (d + 1)
    base = (
        words.select(F.col(word_col).alias("word"))
        .filter(F.length("word") >= min_len)
        .distinct()
        .persist()
    )
    # ---- q-gram prefix-filter path (strings long enough to gram) ----
    grammable = base.filter(F.length("word") >= q)
    grams = grammable.select(
        "word",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - (q - 1)),
                lambda i: F.col("word").substr(i, F.lit(q)),
            )
        ).alias("pos", "gram"),
    )
    # occurrence index turns multiset intersection into an equi-join
    occ_w = Window.partitionBy("word", "gram").orderBy("pos")
    keyed = grams.withColumn("occ", F.row_number().over(occ_w))
    gfreq = keyed.groupBy("gram", "occ").agg(
        F.count(F.lit(1)).alias("gf")
    )
    pref_w = Window.partitionBy("word").orderBy(
        F.asc("gf"), F.asc("gram"), F.asc("occ")
    )
    prefix = (
        keyed.join(gfreq, ["gram", "occ"])
        .withColumn("rk", F.row_number().over(pref_w))
        .filter(F.col("rk") <= q * d + 1)
        .select("word", "gram", "occ")
        .persist()
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    long_pairs = (
        pa.join(pb, ["gram", "occ"])
        .filter(
            (F.col("a.word") < F.col("b.word"))
            # the count filter is only valid (threshold ≥ 1) when the
            # longer side reaches the boundary; shorter pairs come from
            # the delete-neighborhood path
            & (
                F.greatest(F.length("a.word"), F.length("b.word"))
                >= boundary
            )
            & (
                (F.length("a.word") - F.length("b.word")).between(-d, d)
            )
        )
        .select(
            F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b")
        )
    )
    # ---- symmetric-delete path (both sides below the boundary) ----
    short = base.filter(F.length("word") < boundary)
    if d == 1:
        variants = delete_variants(F.col("word"))
    elif d == 2:
        variants = _delete_variants_upto2(F.col("word"))
    else:
        raise NotImplementedError(
            f"max_dist={d} unsupported (1 or 2; the delete-neighborhood "
            "short-string block grows combinatorially beyond that)"
        )
    sv = short.select(
        "word", F.explode(variants).alias("key")
    )
    sa, sb = sv.alias("a"), sv.alias("b")
    short_pairs = (
        sa.join(sb, "key")
        .filter(F.col("a.word") < F.col("b.word"))
        .select(
            F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b")
        )
    )
    return (
        long_pairs.unionAll(short_pairs)
        .dropDuplicates(["word_a", "word_b"])
        .withColumn(
            "dist", F.levenshtein("word_a", "word_b").cast("bigint")
        )
        .filter((F.col("dist") >= 1) & (F.col("dist") <= d))
    )
