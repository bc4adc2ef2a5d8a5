"""quality_ensemble (operators/textstats.py): orientation, bounds, and
bucketing invariants on a crafted corpus — the oracle parity test covers
value equality; these pin the semantics."""

from __future__ import annotations

import pytest

from week5_datingnlp_big_data_spark.operators import textstats

DOCS = [
    # good: wordy, stopword-bearing, varied vocabulary shared with others
    (1, "the quick brown fox jumps over the lazy dog and it is for you "
        "that we write these varied words of prose today my friend"),
    # repetitive boilerplate: one bigram looped
    (2, "click here click here click here click here click here click "
        "here click here click here click here click here click here"),
    # rare-word salad: hapax tokens → worst LM rarity
    (3, "zyx qwv plonk fnord glorble snark quux blivet frobnitz wibble "
        "zork grue xyzzy plugh"),
    # short + punctuation-heavy → low heuristic quality
    (4, "!!! ??? ... ###"),
    (5, ""),  # empty: excluded from the ensemble
]


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = textstats.quality_ensemble(docs).collect()
    return {r.doc_id: r for r in rows}


def test_empty_doc_excluded_and_bounds(result):
    assert set(result) == {1, 2, 3, 4}
    for r in result.values():
        for c in ("q_pr", "rep_pr", "lm_pr"):
            assert 0.0 <= r[c] <= 1.0, (r.doc_id, c)
        assert 0.0 <= r.ensemble <= 1.0
        assert 0 <= r.decile <= 9
        assert r.decile == min(int(r.ensemble * 10), 9)


def test_signal_orientation(result):
    # The looping doc has the worst duplicate-word fraction → top rep_pr.
    assert result[2].dup_word_frac == max(r.dup_word_frac for r in result.values())
    assert result[2].rep_pr == max(r.rep_pr for r in result.values())
    # The hapax salad is the rarest under the corpus unigram LM.
    assert result[3].mean_neg_logprob == max(
        r.mean_neg_logprob for r in result.values()
    )
    # The good doc beats both degenerate docs on the blended rank.
    assert result[1].ensemble > result[2].ensemble
    assert result[1].ensemble > result[4].ensemble


def test_percentile_ranks_match_percent_rank_def(result):
    # pr = (#strictly less)/(n-1) over the 4 ranked docs, ties shared.
    vals = sorted(r.quality for r in result.values())
    n = len(vals)
    for r in result.values():
        less = sum(1 for v in vals if v < r.quality)
        # output pr is rounded to 6 dp
        assert r.q_pr == pytest.approx(less / (n - 1), abs=1e-6)
