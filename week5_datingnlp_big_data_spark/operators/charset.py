"""Charset / encoding hygiene: the byte-level repairs a crawl pipeline
runs BEFORE any tokenization — declared-vs-actual encoding
classification and repair of the classic UTF-8-read-as-Windows-1252
mojibake (the core case of ftfy, Speer 2019, "ftfy: fixes text for
you"; the repair table below is derived from the public cp1252 code
page, not copied from any implementation). No analog in the reference
(`Week5_datingNLP.R` assumes a clean CSV); this module is north-star
training-data surface: a 100 TB web crawl contains megabytes of
double-encoded text per shard, and every downstream operator (tokenize,
dedup, LM scoring) silently degrades on it.

Scale shape: everything here is pure Catalyst string algebra — chained
``replace`` / ``regexp_replace`` / ``length`` expressions, one
WholeStageCodegen span, zero Python in the loop, zero shuffles. The
repair table is a compile-time constant folded into the plan.

Mojibake model: a character's UTF-8 bytes decoded as cp1252 yield a
deterministic marker sequence (``é`` → ``0xC3 0xA9`` → ``Ã©``). The
table is GENERATED from that round trip at import, restricted to
characters whose every UTF-8 byte is defined in cp1252 and whose
repaired output cannot re-create another table entry's marker (so the
replace chain is order-robust; see ``_REPAIR_CHARS``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Characters repaired by the table. Curated so that (a) every UTF-8
# byte decodes in cp1252 (drops e.g. U+201D whose 0x9D is undefined),
# (b) no output char is itself a marker prefix (drops â, whose repair
# could assemble a new â€¦-style marker), and (c) no marker contains an
# invisible char (drops í, whose 0xAD is a soft hyphen).
_REPAIR_CHARS = "éèêáóúñçäöü’“…«»°"


def _mk_table() -> tuple[tuple[str, str], ...]:
    out = []
    for ch in _REPAIR_CHARS:
        moji = ch.encode("utf-8").decode("cp1252")
        out.append((moji, ch))
    # longest marker first: shared prefixes (â€™ vs â€œ differ only in
    # the third char; all 2-char Ã-markers are disjoint from them) can
    # never shadow a longer match
    out.sort(key=lambda p: (-len(p[0]), p[0]))
    return tuple(out)


#: (mojibake_marker, repaired_char), longest marker first — the public
#: contract; oracles regenerate their SQL from this same tuple.
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = _mk_table()


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def mojibake_mark_count(text: Column | str) -> Column:
    """Total occurrences of known mojibake markers in ``text`` —
    the length-difference trick per marker, summed: scan-speed, no
    regex engine involved."""
    t = F.coalesce(_col(text), F.lit(""))
    total = F.lit(0).cast("long")
    for moji, _ in MOJIBAKE_TABLE:
        total = total + (
            (F.length(t) - F.length(F.replace(t, F.lit(moji), F.lit(""))))
            / F.lit(len(moji))
        ).cast("long")
    return total


def nonascii_char_count(text: Column | str) -> Column:
    """Number of non-ASCII code points in ``text``."""
    t = F.coalesce(_col(text), F.lit(""))
    return (
        F.length(t) - F.length(F.regexp_replace(t, "[^\\x00-\\x7F]", ""))
    ).cast("long")


def encoding_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    declared_col: str | None = None,
) -> DataFrame:
    """Per-doc declared-vs-actual encoding classification: byte-pattern
    evidence (mojibake markers, non-ASCII density) against whatever the
    source DECLARED (HTTP header / meta charset — the two disagree
    constantly in real crawls). Returns ``(id, n_chars, n_nonascii,
    n_moji_marks, charset_class)`` plus — when ``declared_col`` is given
    — the declared label and ``is_mismatch``.

    ``charset_class``: ``mojibake`` when any marker fires, else
    ``ascii`` when every char is ASCII, else ``utf8``. A declared
    ``ascii`` source with non-ASCII content, or any mojibake, is a
    mismatch (the rows a pipeline routes to the repair step).
    """
    t = F.coalesce(_col(text_col), F.lit(""))
    n_moji = mojibake_mark_count(t)
    n_nonascii = nonascii_char_count(t)
    klass = (
        F.when(n_moji > 0, F.lit("mojibake"))
        .when(n_nonascii == 0, F.lit("ascii"))
        .otherwise(F.lit("utf8"))
    )
    cols = [
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_nonascii.alias("n_nonascii"),
        n_moji.alias("n_moji_marks"),
        klass.alias("charset_class"),
    ]
    if declared_col is not None:
        mismatch = (klass == F.lit("mojibake")) | (
            (_col(declared_col) == F.lit("ascii")) & (klass != F.lit("ascii"))
        )
        cols += [
            _col(declared_col).alias("declared"),
            mismatch.alias("is_mismatch"),
        ]
    return df.select(*cols)


def mojibake_repair(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The destructive consumer of :func:`encoding_profile` (the
    flags-then-cut pairing the filter family ships): undo every known
    UTF-8-as-cp1252 marker. Returns ``(id, n_repairs, text_fixed)``;
    ``n_repairs`` counts markers detected in the INPUT (the replace
    chain applies longest-first, so on non-pathological text that
    equals the number of substitutions made).

    One chained ``replace`` expression — constant-folded, codegen'd,
    shuffle-free; the 100 TB cost is one extra scan predicate."""
    t = F.coalesce(_col(text_col), F.lit(""))
    n = mojibake_mark_count(t)
    fixed = t
    for moji, ch in MOJIBAKE_TABLE:
        fixed = F.replace(fixed, F.lit(moji), F.lit(ch))
    return df.select(
        F.col(id_col),
        n.alias("n_repairs"),
        fixed.alias("text_fixed"),
    )
