"""Fuzz the dedup surface the way test_fuzz_oracle fuzzes the text layer:
Hypothesis-generated near-dup corpora — base docs plus mutated copies at
controlled word-edit distance, exact duplicates, empties, one-worders —
written as a real documents.parquet and run through the REGISTERED Spark
queries AND their driver oracle SQL (verbatim from the registry). Any
cross-engine drift in shingling, MinHash arithmetic, banding, winnowing
hashes, or component labeling shows up here before the driver gate."""

from __future__ import annotations

import math
import shutil
import tempfile

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from week5_datingnlp_big_data_spark import registry
from week5_datingnlp_big_data_spark.sources.schemas import SCHEMAS

FUZZED_QUERIES = (
    "exact_dedup",
    "minhash_signatures",
    "minhash_near_dups",
    "winnow_dup_pairs",
    "ngram_jaccard_near_dups",
    "near_dup_components",
    # round-3 text-quality surface: repetition fractions, decontamination
    # (sources cycle src0/src1/src2 below so the benchmark split is
    # non-empty), and context-window chunking
    "doc_repetition_scores",
    "benchmark_ngram_overlap",
    "doc_chunks",
    "corpus_mixture_sample",
    # cross-doc span dedup: mutated copies produce partially-shared spans
    "span_dedup_fractions",
    # Bloom membership (exact dups across the even/odd split flag as
    # maybe_seen; the undersized filter exercises FP bit arithmetic) and
    # DSIR selection (langs cycle en/fr below so the target slice is a
    # strict subset and the λ table is non-degenerate)
    "bloom_dedup_incremental",
    "dsir_target_sample",
    # destructive span rewrite: mutated copies share spans, so removal
    # paths (full-removal, partial, tail-only) all fire; the oracle
    # reconstructs the rewritten text independently
    "span_dedup_rewrite",
    # CMS heavy hitters: the small fuzz vocab forces collisions, pinning
    # the min-of-rows estimate and the (cnt desc, tok) tiebreak
    "token_cms_heavy_hitters",
    # round-5 surface: KMV overlap (shared fuzz vocab across the src0-2
    # groups gives high-Jaccard pairs; k exceeds the vocab so the
    # estimator runs exact), snapshot diff (small ids hit every %7/%11/
    # %13 branch), soft dedup (fuzz exact duplicates stack with the
    # planted replicas for multiplicities beyond the base {1,2,3})
    "source_overlap_kmv",
    "corpus_snapshot_diff",
    "soft_dedup_weights",
    # round-6 surface: BM25 retrieval (VOCAB includes two of the fixed
    # query terms so the posting filter is non-vacuous), the multi-signal
    # ensemble (percentile ties across mutated copies stress the
    # histogram-rank/percent_rank equivalence), and fixed-k sampling
    # (groups smaller than k exercise the min(k, size) path)
    "bm25_topk",
    "quality_ensemble_deciles",
    "eval_set_sample",
    # round-7 surface: ExactSubstr sliding spans (mutated copies leave
    # shared ≥8-word runs → island merging fires on partial overlaps;
    # exact dups exercise whole-doc spans and the within-doc rule),
    # destructive rewrite (oracle reconstructs the rewritten text via an
    # independent interval join), RRF hybrid fusion (rank-tie handling
    # across two systems on tiny score spaces), and perceptual-hash pairs
    # (exact dups collide bit-for-bit; the md5 tile arithmetic is pinned
    # cross-engine)
    "exact_substr_spans",
    "exact_substr_rewrite",
    "hybrid_rrf_topk",
    "media_phash_near_dups",
    # keep-first line dedup (the query's derived multi-line corpus makes
    # mutated copies share footer/case-variant lines) and cross-corpus LM
    # scoring (en-slice LM over fr-slice docs; OOV branch fires whenever
    # a fr doc draws vocab absent from the en slice)
    "line_dedup_rewrite",
    "cross_lm_scores",
    # component-keyed split: mutated copies share groups across the fuzz
    # corpus, so the no-straddle property is exercised on real clusters
    "leakage_safe_split",
    # round-10 surface: per-source report (fuzz exact dups + empties hit
    # every counter; src0-2 cycling populates multiple report rows) and
    # the batching plan (one-worders land in bucket 0, dup lengths stress
    # the md5 order ties, empties must vanish)
    "source_quality_report",
    "inference_batch_plan",
    # PSI drift cells: fuzz dup/empty skew makes per-source distributions
    # genuinely different; the dense 10-bin grid + smoothing arithmetic
    # is value-verified per cell
    "source_quality_drift",
    # round-4 surface: cluster-size histogram (mutated-copy clusters give
    # sizes >= 2; singleton arithmetic covers the empty/NULL rows) and
    # incremental batch-vs-base near-dedup (the md5 %5 slice puts some
    # mutated copies on opposite sides of the split, so non-novel rows
    # appear; the asymmetric band join + LEFT-join rollup is value-pinned)
    "near_dup_cluster_sizes",
    "batch_near_dup_novelty",
    # per-source boilerplate: fuzz dup docs repeat whole body lines within
    # a source (df >= 3 fires beyond the always-boiler derived footer);
    # NULL/blank docs pin the 0-line total-row contract
    "doc_boilerplate_stats",
)

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "dogs", "cats",
    "likes", "hiking", "coffee", "music",
    # two of bm25_topk's fixed query terms, so its retrieval fuzz is
    # non-vacuous (matched postings exist in most drawn corpora)
    "hash", "scan",
]


@st.composite
def near_dup_corpus(draw):
    """Base docs + mutated copies at a drawn word-edit distance."""
    rng = draw(st.randoms(use_true_random=False))
    n_base = draw(st.integers(4, 10))
    rows = []
    doc_id = 0
    for _ in range(n_base):
        n_words = draw(st.integers(8, 40))
        words = [rng.choice(VOCAB) for _ in range(n_words)]
        rows.append((doc_id, " ".join(words)))
        doc_id += 1
        for _ in range(draw(st.integers(0, 2))):  # mutated copies
            mutated = list(words)
            for _ in range(draw(st.integers(0, 6))):  # edit distance
                op = rng.randrange(3)
                pos = rng.randrange(len(mutated)) if mutated else 0
                if op == 0 and mutated:
                    mutated[pos] = rng.choice(VOCAB)
                elif op == 1 and len(mutated) > 1:
                    del mutated[pos]
                else:
                    mutated.insert(pos, rng.choice(VOCAB))
            rows.append((doc_id, " ".join(mutated)))
            doc_id += 1
    # exact duplicates of an existing doc
    for _ in range(draw(st.integers(0, 2))):
        rows.append((doc_id, rows[rng.randrange(len(rows))][1]))
        doc_id += 1
    # degenerate shapes; one NULL text ALWAYS (absent from the driver's
    # synthetic tables, present in any real crawl — every fuzzed query's
    # NULL path must match its oracle on every example)
    for text in draw(st.lists(st.sampled_from(["", " ", "solo", "a b", None]),
                              max_size=3)):
        rows.append((doc_id, text))
        doc_id += 1
    rows.append((doc_id, None))
    doc_id += 1
    return [
        (i, text, ("en", "fr")[i % 2], f"src{i % 3}",
         len(text) if text is not None else 0) for i, text, in
        ((r[0], r[1]) for r in rows)
    ]


def _norm(v):
    # fold NULL/NaN and stringify — NULL-text rows put None into
    # otherwise-typed columns, and mixed None/value tuples don't sort
    # (the driver compares string forms too)
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else str(round(v, 6))
    return str(v)


def _canon(df):
    cols = sorted(df.columns)
    return cols, sorted(
        tuple(_norm(v) for v in row) for row in df[cols].itertuples(index=False)
    )


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=near_dup_corpus())
def test_dedup_queries_match_oracle_on_fuzz(spark, rows):
    tmp = tempfile.mkdtemp(prefix="dedup_fuzz_")
    try:
        spark.createDataFrame(rows, SCHEMAS["documents"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/documents.parquet")
        con = duckdb.connect()
        # Spark writes a parquet DIRECTORY; glob its part files.
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp}/documents.parquet/*.parquet')"
        )
        for name in FUZZED_QUERIES:
            got = _canon(registry.QUERIES[name](spark, tmp).toPandas())
            want = _canon(con.execute(registry.ORACLE[name]).df())
            assert got == want, f"{name} diverged on corpus of {len(rows)} docs"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
