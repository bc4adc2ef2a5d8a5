"""Deterministic reference-shaped profiles fixture (FIXTURES.md section 2).

~500 rows, seed fixed, ~60/40 m/f split. Essays embed the edge cases the
golden tests need: HTML fragments matching the reference strip patterns,
custom + snowball stop words, hyphen/apostrophe words, numbers, punct-only
tokens, single letters, double spaces, and planted gender-skewed stems
(guy/girl/danc) mirroring the reference's learned tree splits."""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from week5_datingnlp_big_data_spark.sources.schemas import PROFILES_SCHEMA

N_ROWS = 500
SEED = 32984

_MALE_WORDS = ["guy", "guys", "sports", "engineering", "beard"]
_FEMALE_WORDS = ["girl", "girls", "dancing", "yoga", "sparkle"]
_COMMON = [
    "think", "kind", "intellectual", "either", "music", "coffee", "travel",
    "books", "hiking", "movies", "food", "friends", "work", "life",
]
_NOISE = [
    "<a href=\"http://x.com\">link</a>", "&amp;", "<br />", "</p>",
    "class=\"fancy\"", "42", "1990", "---", "!!!", "x", "q",
    "mid-century", "don't", "o'clock", "self-aware",
]
_STOPS = ["i", "am", "the", "love", "like", "to", "with", "you", "very", "doing"]


def _essay(rng: random.Random, sex: str) -> str:
    words: list[str] = []
    skew = _MALE_WORDS if sex == "m" else _FEMALE_WORDS
    for _ in range(rng.randint(20, 60)):
        r = rng.random()
        if r < 0.30:
            words.append(rng.choice(skew))
        elif r < 0.70:
            words.append(rng.choice(_COMMON))
        elif r < 0.85:
            words.append(rng.choice(_STOPS))
        else:
            words.append(rng.choice(_NOISE))
    text = " ".join(words)
    if rng.random() < 0.3:
        text = text.replace(" ", "  ", 1)  # double space → "" raw token
    return text


def make_profiles(spark: SparkSession, n_rows: int = N_ROWS, seed: int = SEED) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        sex = "m" if rng.random() < 0.6 else "f"
        essays = [_essay(rng, sex) if rng.random() > 0.1 else "" for _ in range(10)]
        rows.append((
            i, rng.randint(18, 70), "single", sex, "straight", "fit",
            "anything", "socially", "", "college", "white", 66.0 + rng.random() * 12,
            -1, "engineer", "2012-06-28-20-30", "san francisco, california",
            "", "likes dogs", "", "gemini", "no", "english", *essays,
        ))
    return spark.createDataFrame(rows, PROFILES_SCHEMA)
