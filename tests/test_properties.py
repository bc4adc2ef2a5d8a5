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


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=40),
             min_size=1, max_size=8),
    st.integers(2, 12),
    st.integers(0, 11),
)
def test_chunking_reconstructs_documents(spark, docs_words, chunk, overlap):
    """Property: stripping each chunk's `overlap` leading tokens (except
    chunk 0) and concatenating reconstructs the original word sequence —
    chunks lose nothing and duplicate only the overlap."""
    from week5_datingnlp_big_data_spark.operators.corpus import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect():
        out.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for doc_id, ws in enumerate(docs_words):
        if not ws:
            assert doc_id not in out  # empty docs are dropped
            continue
        chunks = [t for _, t in sorted(out[doc_id])]
        rebuilt = chunks[0].split(" ") if chunks else []
        for c in chunks[1:]:
            rebuilt += c.split(" ")[overlap:] if len(c.split(" ")) > overlap else []
        # tail suppression can shorten the last chunk below overlap; the
        # covered-prefix property still must hold exactly
        assert rebuilt == ws, (doc_id, chunk, overlap)
