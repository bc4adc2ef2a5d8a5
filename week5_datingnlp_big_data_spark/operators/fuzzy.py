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

from pyspark.sql import DataFrame
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
