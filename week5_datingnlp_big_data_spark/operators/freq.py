"""Word-frequency analytics: counts, rankings, top-k, distinctive-word sets.

Reference EP-3 (Week5_datingNLP.R:258–286): per-sex word frequency tables
(A5), sort-desc (T1), top-k slice (T2), setdiff of top-500 lists (T3), and
the *intended* semantics of the banned-word column drop (W4 — the
reference's version is a silent no-op bug; see SURVEY.md section 2.2 P6).

Scale notes: ``explode → groupBy(word)`` is the canonical distributed word
count — partial (map-side) aggregation absorbs the Zipf head before the
shuffle, and the final ``orderBy+limit`` plans as TakeOrderedAndProject
(no global sort materialization). At 100 TB the only heavy exchange is the
single hash shuffle on ``word``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.functions.text import split_raw, tokenize


def explode_words(docs: DataFrame, text_col: str = "text", *, raw: bool = True) -> DataFrame:
    """A5 step 1 — one row per word occurrence.

    ``raw=True`` reproduces the reference's ``str_split(" ")`` (keeps ""
    tokens, R:259); ``raw=False`` uses the engine tokenizer."""
    from week5_datingnlp_big_data_spark.operators.corpus import explode_tokens

    words = split_raw(text_col) if raw else tokenize(text_col)
    return explode_tokens(docs, words, "word")


def word_counts(docs: DataFrame, text_col: str = "text", *, raw: bool = True) -> DataFrame:
    """A5+T1 — ``(word, cnt)`` ranked descending, word ascending as the
    deterministic tiebreak (the reference's ``sort`` is stable; an explicit
    tiebreak keeps top-k reproducible under parallel execution)."""
    return (
        explode_words(docs, text_col, raw=raw)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
    )


def top_k_words(docs: DataFrame, k: int, text_col: str = "text", *, raw: bool = True) -> DataFrame:
    """T2 — top-k slice; Catalyst plans TakeOrderedAndProject."""
    return word_counts(docs, text_col, raw=raw).limit(k)


def distinctive_words(
    docs: DataFrame,
    group_col: Column | str,
    group_a: str,
    group_b: str,
    k: int = 500,
    text_col: str = "text",
    *,
    raw: bool = True,
) -> DataFrame:
    """T3 — words in group A's top-k absent from group B's top-k
    (reference ``setdiff(male.words[1:500], female.words[1:500])``,
    R:278–280). Anti-join of two TakeOrderedAndProject results — both
    sides are ≤k rows, so the join broadcasts."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    top_a = top_k_words(docs.filter(g == group_a), k, text_col, raw=raw)
    top_b = top_k_words(docs.filter(g == group_b), k, text_col, raw=raw)
    return (
        top_a.join(F.broadcast(top_b.select("word")), "word", "left_anti")
        .orderBy(F.desc("cnt"), F.asc("word"))
    )


def remove_banned_terms(counts: DataFrame, banned: DataFrame, term_col: str = "term") -> DataFrame:
    """W4 intended semantics — drop rows whose term is in the banned set
    via broadcast anti-join (the reference's data.frame ``%in%`` matched
    nothing, R:284–286; we implement what was meant)."""
    return counts.join(F.broadcast(banned.select(term_col)), term_col, "left_anti")
