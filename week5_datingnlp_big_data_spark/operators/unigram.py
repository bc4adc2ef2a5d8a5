"""Distributed unigram-LM subword tokenizer (SentencePiece-style EM).

Kudo 2018 ("Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates", ACL) trains a subword
vocabulary as a unigram language model: pieces carry probabilities, a
word's segmentations form a lattice, and EM alternates expected piece
counts (forward-backward over the lattice) with probability
re-estimation, pruning the vocabulary between rounds. This is the OTHER
mainstream subword algorithm next to BPE (operators/bpe.py) — SentencePiece's
default — and the two share nothing but the word-frequency table, so the
engine ships both.

Distributed shape (mirrors bpe.py's discipline):
  * ONE corpus scan builds the Zipf-bounded ``(word, cnt)`` table; every
    EM pass afterwards touches only that table (~10⁷ rows for a
    trillion-token corpus), never the corpus.
  * Seeding = substring explode + groupBy + distributed top-k; only the
    chosen seed table (≤ ``seed_size`` rows — model-sized, same footprint
    class as BPE's merge list or ml.py's fitted models) reaches the driver.
  * E-step = ``mapInPandas`` over the word table with the piece log-probs
    riding the closure (broadcast-sized): per word, forward-backward over
    the segmentation lattice; per Arrow batch, counts collapse into a
    local dict BEFORE emission — Python-side map-side combine — then one
    vocab-sized ``groupBy(piece)`` shuffle.
  * M-step + pruning = driver-side renormalization of the bounded piece
    table (sorted ties: count desc, piece asc — fully deterministic).

Determinism: expected counts are emitted as FLOOR(ec · 2²⁰) integers and
summed as int64 — float partial-sum order never reaches an aggregate, so
training is bit-stable across runs and partitionings (same trick as
graph.py's integer PageRank). The quantization loses < 1/2²⁰ per
(word, piece) — noise against Zipf counts. Overflow bound: total
expected piece mass ≈ corpus tokens, so int64 holds to ~8·10¹² tokens at
this scale factor; drop ``EC_SCALE`` a bit for larger corpora.

Not SQL-expressible (iterative EM over a lattice) → rows-only at the
driver + golden/invariant tests (tests/test_unigram.py): exact
forward-backward twin, monotone likelihood, lossless Viterbi round-trip.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators.bpe import word_frequencies

# Expected counts quantize to 1/EC_SCALE units before the int64 sum.
EC_SCALE = 1 << 20
# Reserved key carrying the corpus log-likelihood through the same
# aggregate (floor(cnt * logZ(word) * EC_SCALE); negative, int64-safe).
_LL_KEY = "\x00__ll__"
# Segmentation-lattice fallback for a character absent from the piece
# table (can only happen when ENCODING text the model never saw).
_UNK_LOGP = -30.0


def seed_vocabulary(
    word_freqs: DataFrame,
    max_piece_len: int = 8,
    seed_size: int = 2000,
) -> list[tuple[str, int]]:
    """Seed pieces: the ``seed_size`` highest-frequency substrings of
    length ≤ ``max_piece_len`` (weighted by word count), PLUS every
    single character of the corpus (unprunable — they guarantee any word
    stays segmentable). Returns ``[(piece, weighted_count), ...]``.

    The explode emits O(len·max_piece_len) substrings per DISTINCT word —
    vocab-sized, not corpus-sized; the top-k is a distributed
    TakeOrdered, so the driver only ever holds the chosen seeds."""
    subs = F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.length("word") - 1),
                lambda i: F.transform(
                    F.sequence(
                        F.lit(1),
                        F.least(F.lit(max_piece_len), F.length("word") - i),
                    ),
                    lambda n: F.substring(F.col("word"), i + 1, n),
                ),
            )
        ),
        lambda s: F.length(s) > 0,
    )
    counted = (
        word_freqs.select(F.explode(subs).alias("piece"), F.col("cnt"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
        .persist()
    )
    top = (
        counted.filter(F.length("piece") >= 2)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(seed_size)
        .collect()
    )
    chars = counted.filter(F.length("piece") == 1).collect()
    counted.unpersist()
    seeds = {r["piece"]: int(r["c"]) for r in chars}
    for r in top:
        seeds[r["piece"]] = int(r["c"])
    return sorted(seeds.items(), key=lambda kv: (-kv[1], kv[0]))


def _forward_backward(word: str, logp: dict[str, float], max_len: int):
    """Expected piece counts + log-evidence for one word's segmentation
    lattice. Returns ``(counts: dict[piece, float], logZ: float)``.
    Pure function — the E-step UDF and the test golden both call it."""
    n = len(word)
    neg = float("-inf")
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    arcs: list[tuple[int, int, str, float]] = []
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i == 1:
                    lp = _UNK_LOGP  # unseen char: penalized fallback arc
                else:
                    continue
            arcs.append((i, j, piece, lp))
            if alpha[i] != neg:
                a = alpha[i] + lp
                m = max(alpha[j], a)
                alpha[j] = m + math.log(
                    math.exp(alpha[j] - m) + math.exp(a - m)
                )
    if alpha[n] == neg:
        return {}, 0.0
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i, j, piece, lp in reversed(arcs):
        if beta[j] != neg:
            b = beta[j] + lp
            m = max(beta[i], b)
            beta[i] = m + math.log(math.exp(beta[i] - m) + math.exp(b - m))
    counts: dict[str, float] = {}
    for i, j, piece, lp in arcs:
        if alpha[i] != neg and beta[j] != neg:
            counts[piece] = counts.get(piece, 0.0) + math.exp(
                alpha[i] + lp + beta[j] - alpha[n]
            )
    return counts, alpha[n]


def _expected_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """One distributed E-step: ``(piece, ec)`` with ec in 1/EC_SCALE
    units, plus the ``_LL_KEY`` row carrying Σ cnt·logZ."""
    spark = words.sparkSession

    def estep(batches):
        for pdf in batches:
            acc: dict[str, int] = {}
            ll = 0
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                counts, log_z = _forward_backward(word, logp, max_piece_len)
                for piece, ec in counts.items():
                    acc[piece] = acc.get(piece, 0) + math.floor(
                        ec * cnt * EC_SCALE
                    )
                ll += math.floor(log_z * cnt * EC_SCALE)
            acc[_LL_KEY] = acc.get(_LL_KEY, 0) + ll
            yield pd.DataFrame(
                {"piece": list(acc), "ec": list(acc.values())}
            )

    return (
        words.mapInPandas(estep, "piece string, ec long")
        .groupBy("piece")
        .agg(F.sum("ec").alias("ec"))
    )


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 300,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_size: int = 2000,
    em_iters_per_round: int = 2,
    shrink_factor: float = 0.75,
) -> list[tuple[str, float]]:
    """Train the unigram LM: seed → (EM × ``em_iters_per_round`` → prune
    to ``max(vocab_size, |V|·shrink_factor)``) until the vocabulary
    reaches ``vocab_size``. Pruning keeps the highest-probability pieces
    (all single characters are unprunable) — the documented simplification
    of SentencePiece's likelihood-loss ranking; ties break (count desc,
    piece asc) so the result is unique. Returns ``[(piece, logprob), ...]``
    sorted by (logprob desc, piece asc)."""
    words = word_frequencies(docs, text_col).persist()
    words.count()
    seeds = seed_vocabulary(words, max_piece_len, seed_size)
    total = sum(c for _, c in seeds)
    logp = {p: math.log(c / total) for p, c in seeds}
    try:
        while True:
            for _ in range(em_iters_per_round):
                rows = _expected_counts(words, logp, max_piece_len).collect()
                counts = {r["piece"]: r["ec"] for r in rows}
                counts.pop(_LL_KEY, None)
                tot = sum(counts.values())
                if tot <= 0:
                    break
                logp = {
                    p: math.log(c / tot)
                    for p, c in counts.items()
                    if c > 0
                }
                seed_chars = {p for p, _ in seeds if len(p) == 1}
                for ch in seed_chars - set(logp):
                    # a char EM starved to zero mass stays segmentable
                    logp[ch] = math.log(0.5 / tot)
            multi = sorted(
                ((p, lp) for p, lp in logp.items() if len(p) > 1),
                key=lambda kv: (-kv[1], kv[0]),
            )
            chars = {p: lp for p, lp in logp.items() if len(p) == 1}
            target = max(vocab_size - len(chars), 0)
            if len(multi) <= target:
                break
            keep = max(target, int(len(multi) * shrink_factor))
            multi = multi[:keep]
            logp = dict(multi) | chars
            if keep <= target:
                break
    finally:
        words.unpersist()
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Best segmentation under the unigram LM (ties: fewer pieces, then
    lexicographically earlier piece at the first divergence — unique)."""
    n = len(word)
    best: list[tuple[float, int]] = [(0.0, 0)] + [(float("-inf"), -1)] * n
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i == 1:
                    lp = _UNK_LOGP
                else:
                    continue
            if best[i][0] == float("-inf"):
                continue
            cand = (best[i][0] + lp, best[i][1] + 1)
            score = (cand[0], -cand[1])
            cur = (best[j][0], -best[j][1])
            if score > cur or (
                score == cur
                and back[j] is not None
                and (i, piece) < back[j]
            ):
                best[j] = cand
                back[j] = (i, piece)
    out: list[str] = []
    j = n
    while j > 0:
        i, piece = back[j]
        out.append(piece)
        j = i
    return out[::-1]


def unigram_segment_udf(pieces: list[tuple[str, float]], max_piece_len: int = 8):
    """Arrow-batched tokenizer applying a trained unigram LM to raw text
    (the production encode path; the piece table rides the closure as a
    broadcast-sized constant)."""
    from pyspark.sql import types as T

    logp = dict(pieces)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _segment(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            return [
                s
                for w in t.lower().split()
                for s in viterbi_segment(w, logp, max_piece_len)
            ]

        return texts.map(one)

    return _segment


def unigram_fertility_stats(
    docs: DataFrame,
    pieces: list[tuple[str, float]],
    text_col: str = "text",
    group_col: str = "source",
    max_piece_len: int = 8,
) -> DataFrame:
    """Per-source fertility report for a trained unigram LM — same
    token-budget numbers as bpe.bpe_fertility_stats, so the two
    tokenizers are directly comparable on identical corpora.
    Output: ``(source, n_docs, n_words, n_pieces, n_chars, fertility,
    chars_per_piece)``."""
    from week5_datingnlp_big_data_spark.operators.textstats import token_count_ws

    seg = unigram_segment_udf(pieces, max_piece_len)
    toks = docs.select(
        F.col(group_col).alias("source"),
        token_count_ws(text_col).alias("_w"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_c"),
        F.size(seg(F.col(text_col))).alias("_p"),
    )
    return (
        toks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").cast("bigint").alias("n_words"),
            F.sum(F.when(F.col("_p") >= 0, F.col("_p")).otherwise(0))
            .cast("bigint")
            .alias("n_pieces"),
            F.sum("_c").cast("bigint").alias("n_chars"),
        )
        .withColumn(
            "fertility",
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("n_pieces") / F.col("n_words"), 6),
            ),
        )
        .withColumn(
            "chars_per_piece",
            F.when(
                F.col("n_pieces") > 0,
                F.round(F.col("n_chars") / F.col("n_pieces"), 6),
            ),
        )
    )
