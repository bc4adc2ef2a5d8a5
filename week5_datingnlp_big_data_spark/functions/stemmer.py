"""Snowball English ("Porter2") stemmer, pure Python, plus its Spark surface.

Covers reference operator N3 (``tokens_wordstem(language="english")``,
Week5_datingNLP.R:84 — quanteda delegates to SnowballC, i.e. this exact
algorithm). Implemented from the published algorithm description at
snowballstem.org/algorithms/english/stemmer.html (public spec). Golden
parity targets from the reference trace: identify→identifi,
furniture→furnitur, dancing→danc.

Spark mapping: there is no JVM built-in stemmer, so this is the engine's
canonical Pandas-UDF case (SURVEY.md section 4). The UDF is Arrow-batched
and operates on whole token arrays per row; everything before/after it
stays in whole-stage codegen.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOWELS = "aeiouy"
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = "cdeghkmnrt"

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS_1A = {"inning", "outing", "canning", "herring", "earring",
                  "proceed", "exceed", "succeed"}

_STEP2_SUFFIXES = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]
_STEP3_SUFFIXES = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
    ("ness", ""),
]
_STEP4_SUFFIXES = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "al", "er", "ic",
]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """Start offsets of R1 and R2 per the spec, with the gener/commun/arsen
    prefix special case for R1."""
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        # non-vowel, vowel, non-vowel-and-not-(w|x|Y)
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
        )
    return False


def _contains_vowel(word: str) -> bool:
    return any(ch in _VOWELS for ch in word)


@lru_cache(maxsize=1 << 18)
def porter2_stem(word: str) -> str:
    """Stem one lowercase word. Non-alpha input passes through unchanged."""
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS:
        return _EXCEPTIONS[word]

    if word.startswith("'"):
        word = word[1:]
    # Mark consonant-y as Y.
    if word.startswith("y"):
        word = "Y" + word[1:]
    word = "".join(
        "Y" if ch == "y" and i > 0 and word[i - 1] in _VOWELS else ch
        for i, ch in enumerate(word)
    )

    r1, r2 = _regions(word)

    # Step 0: strip trailing ' / 's / 's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(ch in _VOWELS for ch in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS_1A:
        return word.lower()

    # Step 1b
    if word.endswith(("eedly", "eed")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _contains_vowel(stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _ends_short_syllable(word) and _regions(word)[0] >= len(word):
                        word += "e"
                break

    # Step 1c: y/Y -> i when preceded by a non-vowel that is not word-initial
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # Regions on the marked word: consonant-Y must NOT count as a vowel.
    r1, r2 = _regions(word)

    # Step 2 (suffix must lie in R1). No suffix contains y, so matching the
    # marked word directly is safe.
    for suf, repl in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            break
    else:
        if word.endswith("ogi") and len(word) - 3 >= r1 and len(word) >= 4 and word[-4] == "l":
            word = word[:-3] + "og"
        elif word.endswith("li") and len(word) - 2 >= r1 and len(word) >= 3 and word[-3] in _LI_ENDING:
            word = word[:-2]

    # Step 3 (suffix in R1; "ative" additionally requires R2)
    for suf, repl in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            break
    else:
        if word.endswith("ative") and len(word) - 5 >= r2:
            word = word[:-5]

    # Step 4 (suffix in R2); "ion" only after s/t
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("ion") and len(word) - 3 >= r2 and len(word) >= 4 and word[-4] in "st":
            word = word[:-3]

    # Step 5
    r1, r2 = _regions(word)
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
        word = word[:-1]

    return word.lower()


@F.pandas_udf(T.ArrayType(T.StringType()))
def _stem_array_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(
        lambda arr: None if arr is None else [porter2_stem(t) for t in arr]
    )


def stem_tokens(tokens: Column | str) -> Column:
    """N3 — stem every token in an ``array<string>`` column. Arrow-batched;
    the lru_cache makes the per-batch cost proportional to *distinct* words
    (Zipf: a 60k-doc corpus has ~150k distinct words vs ~25M tokens)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return _stem_array_udf(c)


def stem_one_udf():
    """Scalar stemming pandas UDF for string columns — the building block
    of the distinct-vocabulary stemming path (dfm.stem_counts, EP-1):
    apply to a DISTINCT term column, broadcast the (term, stem) map back,
    and no Python ever sees a token occurrence."""

    @F.pandas_udf(T.StringType())
    def _stem_one(s: pd.Series) -> pd.Series:
        return s.map(lambda w: None if w is None else porter2_stem(w))

    return _stem_one
