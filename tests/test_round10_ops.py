"""Round-10 operators: coverage-balanced embedding sampling, margin-based
best-match mining (CCMatrix scorer), per-source quality report, BPE
fertility stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import bpe, similarity
from week5_datingnlp_big_data_spark.plans.datapipe import source_quality_report

EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in rows], EMB_SCHEMA
    )


# ------------------------------------------------------- coverage_sample


def test_coverage_sample_caps_every_cell(spark):
    # 30 near-identical vectors (one dense cluster) + 3 spread-out ones.
    base = [1.0, 0.5] + [0.0] * 62
    rows = [(i, [b + i * 1e-6 for b in base], 0) for i in range(30)]
    rows += [(100, [-1.0] + [0.2] * 63, 0), (101, [0.0, -1.0] + [0.1] * 62, 0),
             (102, [0.5] * 64, 0)]
    out = similarity.coverage_sample(
        _vecs(spark, rows), per_bucket=2, num_planes=4, dim=64
    )
    per_cell = out.groupBy("cell").count().collect()
    assert all(r["count"] <= 2 for r in per_cell)
    # The 30-vector dense cluster lands in one cell -> contributes <= 2.
    kept = {r["vec_id"] for r in out.collect()}
    assert len(kept & set(range(30))) <= 2
    # Sparse singletons always survive (their cells are under-capacity)
    assert {100, 101, 102} <= kept or len(kept) >= 3


def test_coverage_sample_deterministic(spark, sf_dir):
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(
        (r["vec_id"], r["cell"], r["pick"])
        for r in similarity.coverage_sample(emb).collect()
    )
    b = sorted(
        (r["vec_id"], r["cell"], r["pick"])
        for r in similarity.coverage_sample(emb.repartition(7)).collect()
    )
    assert a == b


# ----------------------------------------------------- margin_mined_pairs


def test_margin_prefers_aligned_pair(spark):
    # Query 0 is exactly aligned with candidate 10; everything else is
    # near-orthogonal noise. The aligned pair must surface with the top
    # margin, and each query emits at most one row.
    def unit(axis):
        v = [0.0] * 64
        v[axis] = 1.0
        return v

    rows = [(0, unit(0), 0), (1, unit(1), 0), (2, unit(2), 0)]
    # candidate 10 ≈ query 0's direction; 11/12/13 off-axis noise
    rows += [(10, [1.0, 0.05] + [0.0] * 62, 1)]
    rows += [(11, unit(40), 1), (12, unit(41), 1), (13, unit(42), 1)]
    out = similarity.margin_mined_pairs(
        _vecs(spark, rows), query_label=0, cand_label=1, k=2, min_margin=0.0
    )
    rows_out = {r["query_id"]: r for r in out.collect()}
    assert len(rows_out) == 3  # one best match per query, min_margin=0
    assert rows_out[0]["match_id"] == 10
    assert rows_out[0]["cos"] > 0.99
    # the aligned pair's margin dwarfs the orthogonal queries' margins
    assert rows_out[0]["margin"] > rows_out[1]["margin"]
    assert rows_out[0]["margin"] > rows_out[2]["margin"]


def test_margin_threshold_filters(spark):
    def unit(axis):
        v = [0.0] * 64
        v[axis] = 1.0
        return v

    # queries all orthogonal to every candidate -> cos = 0, margin = NULL
    # or <= min_margin -> no rows survive a positive threshold.
    rows = [(0, unit(0), 0), (1, unit(1), 0)]
    rows += [(10, unit(30), 1), (11, unit(31), 1)]
    out = similarity.margin_mined_pairs(
        _vecs(spark, rows), query_label=0, cand_label=1, k=2, min_margin=0.5
    )
    assert out.count() == 0


def test_margin_at_most_one_row_per_query(spark, sf_dir):
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.margin_mined_pairs(emb, min_margin=0.0)
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 1 for r in per_q)


def test_margin_blocked_matches_oracle_with_active_cells(spark, tmp_path):
    # 48 vectors per label -> nx*ny = 2304 > the registered pair_budget
    # of 1024, so the LSH-cell prefix length is L = 2 (16 cells used at
    # 2-bit depth) and the BLOCKED code path actually runs — the sf0.001
    # parity sweep sits below the budget and degenerates to L = 0, so
    # this is the in-repo pin of the cell join + integer prefix-length
    # arithmetic against the verbatim driver oracle.
    import duckdb

    from tests.conftest import assert_matches_oracle
    from week5_datingnlp_big_data_spark.registry import ORACLE

    import random

    rng = random.Random(41)
    rows = []
    for i in range(96):
        v = [round(rng.uniform(-1.0, 1.0), 3) for _ in range(64)]
        rows.append((i, v, i % 2))
    # a near-aligned cross-label pair so the margin >= 1.0 gate passes
    rows.append((200, list(rows[0][1]), 1))
    df = _vecs(spark, rows)
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    out = similarity.margin_mined_pairs(
        spark.read.parquet(path),
        pair_budget=1024, min_cell_cands=8, max_planes=16, dim=64,
    )
    # blocking is structurally active: the physical plan joins on the
    # cell prefix instead of broadcasting the full query side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    assert_matches_oracle(out, con, ORACLE["embedding_margin_pairs"])
    con.close()


def test_margin_blocked_layout_invariant(spark, sf_dir):
    # The cell depth comes from two counts (layout-free) and every cell,
    # cosine, and tiebreak is a pure function of the rows — so the blocked
    # mining must return identical pairs under any partitioning.
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, similarity.margin_mined_pairs(
        emb, min_margin=0.0, pair_budget=64, min_cell_cands=2).collect()))
    b = sorted(map(tuple, similarity.margin_mined_pairs(
        emb.repartition(7), min_margin=0.0, pair_budget=64,
        min_cell_cands=2).collect()))
    assert a == b and len(a) > 0


# --------------------------------------------------- source_quality_report


def test_source_quality_report_counts(spark):
    good = "the quick brown fox jumps over the lazy dog and runs for it with vigor"
    docs = spark.createDataFrame(
        [
            # src A: one dup pair + one empty
            (1, good, "en", "A", len(good)),
            (2, good, "en", "A", len(good)),
            (3, "", "en", "A", 0),
            # src B: one copy of the SAME content (cross-source dup) + unique
            (4, good, "en", "B", len(good)),
            (5, "totally unique text here", "en", "B", 24),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rep = {r["source"]: r for r in source_quality_report(docs).collect()}
    a, b = rep["A"], rep["B"]
    assert (a["n_docs"], a["n_empty"]) == (3, 1)
    assert (b["n_docs"], b["n_empty"]) == (2, 0)
    # content of docs 1/2/4 appears 3x corpus-wide -> all three are dups
    assert a["n_dup_docs"] == 2 and b["n_dup_docs"] == 1
    assert abs(a["dup_rate"] - 2 / 3) < 1e-6
    assert a["total_tokens"] == 2 * len(good.split())
    assert 0.0 <= a["mean_quality"] <= 1.0


def test_source_quality_report_null_text(spark):
    docs = spark.createDataFrame(
        [(1, None, "en", "A", 0), (2, "some words here live on", "en", "A", 23)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    r = source_quality_report(docs).collect()[0]
    # NULL text counts as a doc and as empty; quality mean skips it
    assert r["n_docs"] == 2 and r["n_empty"] == 1
    assert r["mean_quality"] is not None


# ---------------------------------------------------- bpe_fertility_stats


def test_bpe_fertility_bounds(spark):
    docs = spark.createDataFrame(
        [
            (1, "banana banana bandana", "en", "A", 21),
            (2, "banana band ban", "en", "B", 15),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    merges = bpe.bpe_train(docs, n_merges=5)
    rep = {r["source"]: r for r in bpe.bpe_fertility_stats(docs, merges).collect()}
    for r in rep.values():
        # every word maps to >= 1 subword token
        assert r["n_bpe_tokens"] >= r["n_words"]
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] > 0
    assert rep["A"]["n_words"] == 3 and rep["B"]["n_words"] == 3


def test_bpe_fertility_zero_merges_is_char_level(spark):
    docs = spark.createDataFrame(
        [(1, "abc de", "en", "A", 6)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    r = bpe.bpe_fertility_stats(docs, []).collect()[0]
    # char-level segmentation: one symbol per char + the </w> sentinel
    # per word -> (3+1) + (2+1) = 7
    assert r["n_words"] == 2
    assert r["n_bpe_tokens"] == 7


# --------------------------------------------------------- mmr_rerank


def _py_mmr(vecs, query_id, k, pool, lam):
    """Pure-Python MMR twin: same pool, same rounding, same tiebreaks."""
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da, db = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return num / (da * db) if da > 0 and db > 0 else 0.0

    q = dict(vecs)[query_id]
    pooled = sorted(
        ((i, round(cos(q, v), 6)) for i, v in vecs if i != query_id),
        key=lambda t: (-t[1], t[0]),
    )[:pool]
    by_id = dict(vecs)
    picked, chosen = [], []
    remaining = list(pooled)
    while remaining and len(picked) < k:
        best_key, best = None, None
        for i, rel in remaining:
            red = max((round(cos(by_id[i], by_id[j]), 6) for j, _ in chosen),
                      default=0.0)
            score = round(lam * rel - (1 - lam) * red, 6)
            if best_key is None or (score, -i) > best_key:
                best_key, best = (score, -i), (i, rel)
        picked.append((len(picked) + 1, best[0], best[1], best_key[0]))
        chosen.append(best)
        remaining = [t for t in remaining if t[0] != best[0]]
    return picked


def test_mmr_matches_python_twin(spark, sf_dir):
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = [(r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.collect()]
    got = [
        (r["rank"], r["vec_id"], round(r["relevance"], 6), round(r["mmr_score"], 6))
        for r in similarity.mmr_rerank(emb, query_id=0, k=8, pool=20).collect()
    ]
    want = [(rk, i, round(rel, 6), round(sc, 6))
            for rk, i, rel, sc in _py_mmr(vecs, 0, 8, 20, 0.7)]
    assert got == want


def test_mmr_diversifies_duplicates(spark):
    # candidates 10/11 are byte-identical (cos 1.0 with each other) and
    # most relevant; plain top-k would take both, MMR must interleave the
    # less-redundant 12 before the duplicate.
    rows = [
        (0, [1.0, 0.0] + [0.0] * 62, 0),
        (10, [0.9, 0.1] + [0.0] * 62, 0),
        (11, [0.9, 0.1] + [0.0] * 62, 0),
        (12, [0.5, -0.8] + [0.0] * 62, 0),
    ]
    out = [r["vec_id"] for r in
           similarity.mmr_rerank(_vecs(spark, rows), query_id=0, k=3,
                                 pool=10, lam=0.5).collect()]
    assert out[0] == 10           # most relevant, smallest id on the tie
    assert out[1] == 12           # the duplicate 11 is deferred
    assert out[2] == 11


def test_mmr_deterministic_across_layouts(spark, sf_dir):
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = similarity.mmr_rerank(emb, query_id=0, k=5, pool=15).collect()
    b = similarity.mmr_rerank(emb.repartition(5), query_id=0, k=5, pool=15).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---------------------------------------------------- inference_batch_plan


def test_inference_batch_plan_invariants(spark, sf_dir):
    from week5_datingnlp_big_data_spark.operators import shards
    from week5_datingnlp_big_data_spark.operators.textstats import token_count_ws
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    budget = 256
    plan = shards.inference_batch_plan(docs, batch_token_budget=budget).collect()
    total = (
        docs.select(token_count_ws("text").alias("n"))
        .filter(F.col("n") > 0)
        .groupBy()
        .sum("n")
        .collect()[0][0]
    )
    # conservation: every non-empty doc's tokens land in exactly one batch
    assert sum(r["sum_len"] for r in plan) == total
    for r in plan:
        # batches overrun the budget by at most one document
        assert r["sum_len"] < budget + r["max_len"]
        # log2 bucketing: max/min length ratio within a bucket < 2
        assert r["max_len"] < 2 ** (r["len_bucket"] + 1)
        # padding waste is a valid fraction
        assert 0.0 <= r["padding_frac"] < 1.0


def test_inference_batch_plan_deterministic(spark, sf_dir):
    from week5_datingnlp_big_data_spark.operators import shards
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, shards.inference_batch_plan(docs).collect()))
    b = sorted(map(tuple, shards.inference_batch_plan(docs.repartition(9)).collect()))
    assert a == b


def test_inference_batch_plan_splits_at_budget(spark):
    # 5 docs of 10 tokens in one bucket (bit_length(10)-1 = 3), budget 20
    # -> md5 order is fixed; batches split every 2 docs: sizes 2/2/1
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10), "en", "A", 19) for i in range(5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    from week5_datingnlp_big_data_spark.operators import shards

    plan = sorted(
        (r["batch_idx"], r["n_docs"], r["sum_len"])
        for r in shards.inference_batch_plan(docs, batch_token_budget=20).collect()
    )
    assert plan == [(0, 2, 20), (1, 2, 20), (2, 1, 10)]


# -------------------------------------------------------- sentence_chunks


def _doc(spark, text):
    return spark.createDataFrame(
        [(1, text, "en", "A", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def test_sentence_chunks_golden(spark):
    from week5_datingnlp_big_data_spark.operators import corpus

    text = "alpha bravo. charlie delta echo. foxtrot golf! hotel india?"
    out = sorted(
        (r["chunk_idx"], r["n_sentences"], r["n_words"], r["chunk_text"])
        for r in corpus.sentence_chunks(
            _doc(spark, text), max_words=5, overlap_sentences=1
        ).collect()
    )
    # s0(2w) + s1(3w) fill chunk 0 exactly; chunk 1 seeds with s1 + s2;
    # chunk 2 seeds with s2 + s3
    assert out == [
        (0, 2, 5, "alpha bravo. charlie delta echo."),
        (1, 2, 5, "charlie delta echo. foxtrot golf!"),
        (2, 2, 4, "foxtrot golf! hotel india?"),
    ]


def test_sentence_chunks_long_sentence_is_own_chunk(spark):
    from week5_datingnlp_big_data_spark.operators import corpus

    text = "short one. " + " ".join(["w"] * 20) + ". tail two."
    rows = {r["chunk_idx"]: r for r in corpus.sentence_chunks(
        _doc(spark, text), max_words=8, overlap_sentences=1
    ).collect()}
    # the 21-word sentence never splits and never carries a seed
    long_rows = [r for r in rows.values() if r["n_words"] > 8]
    assert len(long_rows) == 1 and long_rows[0]["n_sentences"] == 1


def test_sentence_chunks_covers_every_sentence(spark, sf_dir):
    from week5_datingnlp_big_data_spark.operators import corpus
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    chunks = corpus.sentence_chunks(docs, max_words=32).collect()
    import re

    boundary = re.compile(r"(?<=[.!?])\s+")
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for row in docs.collect():
        if not row["text"] or not row["text"].strip():
            assert row["doc_id"] not in by_doc
            continue
        sents = [s for s in boundary.split(row["text"].strip()) if s.strip()]
        joined = " ".join(c["chunk_text"] for c in by_doc[row["doc_id"]])
        for s in sents:
            assert s in joined, (row["doc_id"], s)


def test_sentence_chunks_deterministic(spark, sf_dir):
    from week5_datingnlp_big_data_spark.operators import corpus
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, corpus.sentence_chunks(docs).collect()))
    b = sorted(map(tuple, corpus.sentence_chunks(docs.repartition(11)).collect()))
    assert a == b


# ------------------------------------------------------ contrastive_triples


def test_contrastive_triples_polarity(spark):
    def unit(axis, eps=0.0):
        v = [0.0] * 64
        v[axis] = 1.0
        if eps:
            v[(axis + 1) % 64] = eps
        return v

    rows = [
        (0, unit(0), 0),          # anchor
        (10, unit(0, 0.05), 0),   # near-aligned -> the positive
        (11, unit(5), 0),         # orthogonal -> the hard negative
        (12, unit(6), 0),
    ]
    out = similarity.contrastive_triples(
        _vecs(spark, rows), anchor_ids=[0], pos_threshold=0.9, neg_margin=0.05
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["pos_id"] == 10 and r["pos_cos"] > 0.9
    # hard negative = best-ranked below the band; ties break on id
    assert r["neg_id"] == 11 and r["neg_cos"] < 0.85


def test_contrastive_triples_drops_anchor_without_positive(spark):
    def unit(axis):
        v = [0.0] * 64
        v[axis] = 1.0
        return v

    rows = [(0, unit(0), 0), (10, unit(5), 0), (11, unit(6), 0)]
    out = similarity.contrastive_triples(
        _vecs(spark, rows), anchor_ids=[0], pos_threshold=0.9
    )
    assert out.count() == 0


def test_contrastive_triples_null_negative_when_all_positive(spark):
    base = [1.0, 0.2] + [0.0] * 62
    rows = [(0, base, 0), (10, [x + 0.01 for x in base], 0),
            (11, [x + 0.02 for x in base], 0)]
    out = similarity.contrastive_triples(
        _vecs(spark, rows), anchor_ids=[0], pos_threshold=0.5
    ).collect()
    assert len(out) == 1 and out[0]["neg_id"] is None


# ---------------------------------------------------- source_quality_drift


def test_source_quality_drift_detects_shifted_source(spark):
    from week5_datingnlp_big_data_spark.plans.datapipe import source_quality_drift

    good = ("the quick brown fox jumps over the lazy dog and it runs for "
            "miles with great vigor every single day")
    junk = "@@@@ #### %%%% ^^^^ &&&& **** (((( )))) @@@@ ####"
    docs = spark.createDataFrame(
        [(i, good, "en", "clean", len(good)) for i in range(20)]
        + [(100 + i, junk, "en", "spam", len(junk)) for i in range(20)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    cells = source_quality_drift(docs).collect()
    # dense grid: 2 sources x 10 bins, every bin present
    assert len(cells) == 20
    by_src = {}
    for c in cells:
        by_src.setdefault(c["source"], 0.0)
        by_src[c["source"]] += c["contribution"]
    # both sources are maximally shifted from each other -> both PSIs large
    assert by_src["spam"] > 0.5 and by_src["clean"] > 0.5
    # identical-distribution control: split one source in two
    docs2 = spark.createDataFrame(
        [(i, good, "en", f"s{i % 2}", len(good)) for i in range(40)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    cells2 = source_quality_drift(docs2).collect()
    psi = sum(c["contribution"] for c in cells2) / 2
    assert abs(psi) < 0.01  # smoothing noise only


def test_source_quality_drift_counts_consistent(spark, sf_dir):
    from week5_datingnlp_big_data_spark.plans.datapipe import source_quality_drift
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    cells = source_quality_drift(docs).collect()
    srcs = {c["source"] for c in cells}
    assert all(
        sum(1 for c in cells if c["source"] == s) == 10 for s in srcs
    )
    # n_source + n_rest is the same corpus total in every cell's bin row
    bins = {}
    for c in cells:
        tot = c["n_source"] + c["n_rest"]
        bins.setdefault(c["bin"], set()).add(tot)
    assert all(len(v) == 1 for v in bins.values())
