"""BPE training goldens: the distributed implementation must produce the
EXACT merge sequence and vocabulary of a pure-Python reference BPE
(Sennrich et al. 2016, the canonical ~25-line algorithm)."""

from __future__ import annotations

from collections import Counter

import pytest

from week5_datingnlp_big_data_spark.operators import bpe


# -- pure-Python reference (dict-of-tuples BPE, greedy-leftmost merge) ----

def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        if t:
            for w in t.lower().split():
                if w:
                    c[w] += 1
    return {tuple(w) + (bpe.EOW,): n for w, n in c.items()}


def _ref_pair_counts(vocab):
    pc = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
    return pc


def _ref_merge(vocab, pair):
    out = {}
    a, b = pair
    for syms, n in vocab.items():
        merged, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + n
    return out


def _ref_bpe_train(texts, n_merges, min_pair_count=2):
    vocab = _ref_word_freqs(texts)
    merges = []
    for _ in range(n_merges):
        pc = _ref_pair_counts(vocab)
        if not pc:
            break
        # argmax with (count desc, pair asc) tiebreak — the engine's rule
        pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((pair[0], pair[1], cnt))
        vocab = _ref_merge(vocab, pair)
    return merges, vocab


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "low and newer and lower",
    None,
    "",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    ).cache()


def test_bpe_merges_match_reference(docs):
    got = bpe.bpe_train(docs, n_merges=15)
    want, _ = _ref_bpe_train([t for t in TEXTS], 15)
    assert got == want


def test_bpe_vocab_matches_reference(docs):
    merges = bpe.bpe_train(docs, n_merges=10)
    _, ref_vocab = _ref_bpe_train([t for t in TEXTS], 10)
    ref_syms = Counter()
    for syms, n in ref_vocab.items():
        for s in syms:
            ref_syms[s] += n
    got = {r["symbol"]: r["cnt"] for r in bpe.bpe_vocab(docs, merges).collect()}
    assert got == dict(ref_syms)


def test_bpe_early_stop_on_tiny_corpus(spark):
    tiny = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    # No pair ever reaches min_pair_count=2 across distinct 1-char words →
    # stops before n_merges without error.
    assert bpe.bpe_train(tiny, n_merges=5) == []


def test_bpe_segment_udf_consistent_with_training(docs, spark):
    """Encoding a training word with the rank-priority segmenter must give
    the same symbols as sequentially applying the merge list (the two
    application orders are equivalent because merge i's inputs are only
    produced by merges j<i)."""
    merges = bpe.bpe_train(docs, n_merges=12)
    seg = bpe.bpe_segment_udf(merges)
    from pyspark.sql import functions as F

    words = ["low", "lowest", "newer", "unseen"]
    wdf = spark.createDataFrame([(w,) for w in words], "text string")
    got = {
        r["text"]: r["syms"]
        for r in wdf.select("text", seg(F.col("text")).alias("syms")).collect()
    }
    for w in words:
        syms = list(w) + [bpe.EOW]
        for left, right, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert got[w] == syms, w


def test_bpe_merges_deterministic_across_runs(docs):
    assert bpe.bpe_train(docs, n_merges=8) == bpe.bpe_train(docs, n_merges=8)
