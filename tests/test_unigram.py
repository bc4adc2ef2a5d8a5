"""Unigram-LM tokenizer: exact forward-backward twin (brute-force
enumeration), EM likelihood monotonicity, Viterbi round-trip, char
coverage, and rerun determinism."""

from __future__ import annotations

import math

from week5_datingnlp_big_data_spark.operators import unigram


def _enumerate_segmentations(word, pieces, max_len):
    """All segmentations of ``word`` into known pieces — the brute-force
    twin of the lattice forward pass."""
    if not word:
        return [[]]
    out = []
    for n in range(1, min(max_len, len(word)) + 1):
        piece = word[:n]
        lp = pieces.get(piece)
        if lp is None and n != 1:
            continue
        for rest in _enumerate_segmentations(word[n:], pieces, max_len):
            out.append([piece] + rest)
    return out


def _brute_expected(word, logp, max_len):
    segs = _enumerate_segmentations(word, logp, max_len)
    probs = []
    for seg in segs:
        probs.append(
            math.exp(
                sum(logp.get(p, unigram._UNK_LOGP) for p in seg)
            )
        )
    z = sum(probs)
    counts = {}
    for seg, pr in zip(segs, probs):
        for p in seg:
            counts[p] = counts.get(p, 0.0) + pr / z
    return counts, math.log(z)


def test_forward_backward_matches_brute_force():
    logp = {
        "a": math.log(0.15),
        "b": math.log(0.1),
        "c": math.log(0.05),
        "ab": math.log(0.4),
        "bc": math.log(0.2),
        "abc": math.log(0.1),
    }
    for word in ("abc", "abab", "cabab", "aaaa", "abcabc"):
        got_c, got_z = unigram._forward_backward(word, logp, 3)
        exp_c, exp_z = _brute_expected(word, logp, 3)
        assert abs(got_z - exp_z) < 1e-9, word
        assert set(got_c) == set(exp_c)
        for p in exp_c:
            assert abs(got_c[p] - exp_c[p]) < 1e-9, (word, p)


def test_forward_backward_unknown_char_penalized():
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    counts, z = unigram._forward_backward("axb", logp, 3)
    assert counts["x"] > 0  # fallback arc exists
    assert z < math.log(0.25)  # penalized below any known-only path


def test_viterbi_roundtrip_and_best_path():
    logp = {
        "a": math.log(0.2),
        "b": math.log(0.2),
        "ab": math.log(0.6),
    }
    assert unigram.viterbi_segment("abab", logp, 4) == ["ab", "ab"]
    for word in ("aab", "bbbb", "ababa"):
        seg = unigram.viterbi_segment(word, logp, 4)
        assert "".join(seg) == word


def test_train_learns_the_planted_piece(spark):
    # 'ing' dominates the corpus: the trained vocab must keep it and the
    # segmenter must use it whole.
    docs = spark.createDataFrame(
        [(f"walking talking running sing{i % 2}ing",) for i in range(40)],
        "text string",
    )
    pieces = unigram.unigram_train(
        docs, vocab_size=24, seed_size=100, max_piece_len=4
    )
    vocab = dict(pieces)
    assert "ing" in vocab
    seg = unigram.viterbi_segment("walking", vocab, 4)
    assert seg[-1] == "ing"
    assert "".join(seg) == "walking"


def test_train_vocab_bounded_and_chars_covered(spark):
    docs = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)] * 10,
        "text string",
    )
    pieces = unigram.unigram_train(
        docs, vocab_size=30, seed_size=200, max_piece_len=5
    )
    vocab = dict(pieces)
    corpus_chars = set("thequickbrownfoxjumpsoverthelazydog")
    assert corpus_chars <= {p for p in vocab if len(p) == 1}
    assert len([p for p in vocab if len(p) > 1]) <= 30


def test_em_likelihood_monotone(spark):
    # one EM round at a time against the same seed: corpus likelihood
    # must not decrease (full-EM guarantee; integer quantization loses
    # < 1/2^20 per count — tolerance covers it)
    docs = spark.createDataFrame(
        [("abab abba baab",)] * 5, "text string"
    )
    words = unigram.word_frequencies(docs).persist()
    seeds = unigram.seed_vocabulary(words, max_piece_len=3, seed_size=50)
    total = sum(c for _, c in seeds)
    logp = {p: math.log(c / total) for p, c in seeds}

    def corpus_ll(lp):
        rows = words.collect()
        return sum(
            unigram._forward_backward(r["word"], lp, 3)[1] * r["cnt"]
            for r in rows
        )

    lls = [corpus_ll(logp)]
    for _ in range(3):
        rows = unigram._expected_counts(words, logp, 3).collect()
        counts = {r["piece"]: r["ec"] for r in rows}
        counts.pop(unigram._LL_KEY, None)
        tot = sum(counts.values())
        logp = {p: math.log(c / tot) for p, c in counts.items() if c > 0}
        lls.append(corpus_ll(logp))
    words.unpersist()
    for prev, nxt in zip(lls, lls[1:]):
        assert nxt >= prev - 1e-6, lls


def test_train_is_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(f"stream batch window join doc{i}",) for i in range(20)],
        "text string",
    )
    kw = dict(vocab_size=40, seed_size=150, max_piece_len=5)
    a = unigram.unigram_train(docs, **kw)
    b = unigram.unigram_train(docs.repartition(7), **kw)
    assert a == b  # bit-identical incl. float logprobs (integer E-step)


def test_fertility_stats_shape(spark):
    docs = spark.createDataFrame(
        [("aa bb aa", "s1"), ("aa", "s1"), ("bb bb", "s2")],
        "text string, source string",
    )
    pieces = unigram.unigram_train(
        docs, vocab_size=10, seed_size=20, max_piece_len=2
    )
    rows = {
        r["source"]: r
        for r in unigram.unigram_fertility_stats(docs, pieces).collect()
    }
    assert rows["s1"]["n_docs"] == 2 and rows["s2"]["n_docs"] == 1
    assert rows["s1"]["n_words"] == 4
    assert rows["s1"]["fertility"] >= 1.0
    assert rows["s2"]["n_pieces"] >= 2
