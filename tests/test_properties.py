"""Property-based tests (hypothesis) for the pure-Python pieces: the
Snowball stemmer and the identifier sanitizer. No Spark session needed —
these run in milliseconds and fuzz far wider than example tests."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from week5_datingnlp_big_data_spark.functions.stemmer import porter2_stem
from week5_datingnlp_big_data_spark.functions.text import make_names

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz'", min_size=0, max_size=30)


@given(words)
@settings(max_examples=500)
def test_stemmer_total_and_deterministic(w):
    s1 = porter2_stem(w)
    s2 = porter2_stem(w)
    assert s1 == s2
    assert isinstance(s1, str)


@given(words)
@settings(max_examples=500)
def test_stemmer_output_lowercase_no_growth_beyond_e(w):
    s = porter2_stem(w)
    assert s == s.lower()
    # steps only delete or substitute; the only growth is 1b's added 'e'
    assert len(s) <= len(w) + 1


@given(st.lists(st.text(min_size=0, max_size=20), min_size=0, max_size=30))
@settings(max_examples=300)
def test_make_names_unique_and_valid(names):
    out = make_names(names)
    assert len(out) == len(names)
    assert len(set(out)) == len(out)  # unique
    for n in out:
        assert re.fullmatch(r"[A-Za-z_.][A-Za-z0-9_.]*", n), n


@given(st.lists(st.text(alphabet="ab _1.", min_size=0, max_size=6), min_size=0, max_size=20))
@settings(max_examples=200)
def test_make_names_idempotent_on_valid(names):
    once = make_names(names)
    # names that are already valid and unique pass through unchanged
    again = make_names(once)
    assert len(again) == len(once)
    assert len(set(again)) == len(again)
