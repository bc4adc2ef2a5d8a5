"""Round-8 operators: Luhn-validated CCN detection, char-level entropy,
destructive benchmark decontamination."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import dedup, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------- Luhn CCN


def test_ccn_luhn_valid_and_invalid(spark):
    rows = [
        (1, "call me at 4111111111111111 ok"),          # canonical valid Visa
        (2, "fake 4111111111111112 here"),               # checksum off by one
        (3, "spaced 4111 1111 1111 1111 card"),          # separators allowed
        (4, "dashed 4111-1111-1111-1111 card"),          # dash separators
        (5, "short 411111111111 run"),                   # 12 digits: no candidate
        (6, "no digits at all"),
        (7, None),
    ]
    out = {
        r["doc_id"]: (r["n_ccn_candidates"], r["n_ccn_valid"])
        for r in textstats.ccn_stats(_docs(spark, rows)).collect()
    }
    assert out[1] == (1, 1)
    assert out[2] == (1, 0)
    assert out[3] == (1, 1)
    assert out[4] == (1, 1)
    assert out[5] == (0, 0)
    assert out[6] == (0, 0)
    assert out[7] == (0, 0)


def test_ccn_luhn_reference_checksums(spark):
    # Hand-computed Luhn: 79927398713 is the textbook valid example but
    # too short for the pattern; embed it in a 16-digit construction
    # instead and verify both polarities on full-length numbers.
    valid16 = "5500005555555559"   # valid Mastercard test number
    invalid16 = "5500005555555550"
    rows = [(1, f"a {valid16} b"), (2, f"a {invalid16} b")]
    out = {
        r["doc_id"]: r["n_ccn_valid"]
        for r in textstats.ccn_stats(_docs(spark, rows)).collect()
    }
    assert out == {1: 1, 2: 0}


# ---------------------------------------------------------- char entropy


def test_char_entropy_goldens(spark):
    rows = [
        (1, "aaaa"),      # one symbol: 0 bits
        (2, "ab"),        # two equiprobable: 1 bit
        (3, "abcd"),      # four equiprobable: 2 bits
        (4, "aab"),       # 2/3,1/3 mix
        (5, ""),          # empty: excluded
        (6, None),        # null: excluded
    ]
    got = {
        r["doc_id"]: r
        for r in textstats.char_entropy(_docs(spark, rows)).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["n_chars"], got[1]["n_distinct_chars"]) == (4, 1)
    assert got[1]["char_entropy_bits"] == 0.0
    assert got[2]["char_entropy_bits"] == 1.0
    assert got[3]["char_entropy_bits"] == 2.0
    expected = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert abs(got[4]["char_entropy_bits"] - round(expected, 6)) < 1e-9


def test_char_entropy_counts_spaces(spark):
    got = textstats.char_entropy(_docs(spark, [(1, "a a")])).collect()[0]
    assert got["n_chars"] == 3
    assert got["n_distinct_chars"] == 2  # 'a' and ' '


# -------------------------------------------------------- decontaminate


def test_decontaminate_drops_colliding_docs(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over")])
    corpus = _docs(
        spark,
        [
            (1, "prefix the quick brown fox jumps suffix"),  # shares a 5-gram
            (2, "completely unrelated text with other words here"),
            (3, ""),        # empty: no grams, survives
            (4, None),      # null text survives (hash of '')
        ],
    )
    out = dedup.decontaminate(corpus, bench, n=5)
    got = {r["doc_id"]: r["text_md5"] for r in out.collect()}
    assert set(got) == {2, 3, 4}
    assert got[2] == hashlib.md5(
        b"completely unrelated text with other words here"
    ).hexdigest()
    assert got[3] == hashlib.md5(b"").hexdigest()
    assert got[4] == hashlib.md5(b"").hexdigest()


def test_decontaminate_threshold_tolerates_single_collision(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [
            # exactly one shared 5-gram ("alpha beta gamma delta epsilon")
            (1, "x alpha beta gamma delta epsilon y"),
            # two shared 5-grams (both windows of the 6 benchmark words)
            (2, "alpha beta gamma delta epsilon zeta"),
        ],
    )
    strict = dedup.decontaminate(corpus, bench, n=5, max_overlap_grams=0)
    assert {r["doc_id"] for r in strict.collect()} == set()
    lenient = dedup.decontaminate(corpus, bench, n=5, max_overlap_grams=1)
    assert {r["doc_id"] for r in lenient.collect()} == {1}


def test_decontaminate_short_benchmark_doc_still_flags(spark):
    # Benchmark doc shorter than n contributes its whole text as one gram.
    bench = _docs(spark, [(100, "rare pair")])
    corpus = _docs(
        spark,
        [(1, "rare pair"), (2, "the rare pair appears with other words")],
    )
    out = dedup.decontaminate(corpus, bench, n=5)
    # doc 1 (< n words) also shingles to the whole text -> collides; doc 2
    # has >= 5 words so its grams are 5-grams, none equal to "rare pair".
    assert {r["doc_id"] for r in out.collect()} == {2}
