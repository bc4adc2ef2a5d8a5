"""qgram_edit_pairs: exact-recall equality against a brute-force
Levenshtein twin on adversarial vocabularies (repeated grams, boundary
lengths, short strings that bypass the count filter)."""

from __future__ import annotations

from week5_datingnlp_big_data_spark.operators import fuzzy


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(words, d, min_len=3):
    ws = sorted({w for w in words if len(w) >= min_len})
    out = set()
    for i, a in enumerate(ws):
        for b in ws[i + 1 :]:
            dist = _lev(a, b)
            if 1 <= dist <= d:
                out.add((a, b, dist))
    return out


def _run(spark, words, d=2, min_len=3):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = fuzzy.qgram_edit_pairs(df, max_dist=d, min_len=min_len)
    return {
        (r["word_a"], r["word_b"], r["dist"]) for r in got.collect()
    }


VOCAB_ADVERSARIAL = [
    # repeated-gram multiset cases
    "aaaa", "aaab", "aabb", "aaaaaa", "aaaaab", "ababab", "bababa",
    # short strings below the q=2/d=2 count-filter boundary (len < 6)
    "abc", "cba", "xyz", "abd", "bcd", "abcde", "abcdf", "vwxyz",
    # boundary lengths 5/6/7 with cross-boundary near pairs
    "stream", "streams", "stream7", "steam", "scream", "streaky",
    # transposition-ish (cost 2 in plain Levenshtein)
    "window", "windwo", "winnow", "widow",
    # no neighbors
    "zzzzzzzzzz", "qqq",
]


def test_qgram_matches_brute_force_adversarial(spark):
    assert _run(spark, VOCAB_ADVERSARIAL) == _brute(VOCAB_ADVERSARIAL, 2)


def test_qgram_matches_brute_force_source_tags(spark):
    words = [f"src{i}" for i in range(25)] + ["source", "spark", "sprk"]
    assert _run(spark, words) == _brute(words, 2)


def test_qgram_distance1_mode(spark):
    words = ["table", "cable", "tale", "tables", "stable", "fable"]
    assert _run(spark, words, d=1) == _brute(words, 1)


def test_qgram_min_len_floor(spark):
    got = _run(spark, ["ab", "ac", "abc", "abd"], min_len=3)
    assert got == {("abc", "abd", 1)}


def test_qgram_duplicate_inputs_collapse(spark):
    words = ["alpha", "alpha", "alphas", "alphas", "alpha"]
    assert _run(spark, words) == {("alpha", "alphas", 1)}


def test_qgram_randomized_against_brute(spark):
    # deterministic pseudo-random vocabulary over a tiny alphabet —
    # dense near-neighborhoods stress every blocking path at once
    import random

    rng = random.Random(20260816)
    words = {
        "".join(rng.choice("abc") for _ in range(rng.randint(3, 9)))
        for _ in range(120)
    }
    assert _run(spark, sorted(words)) == _brute(words, 2)
