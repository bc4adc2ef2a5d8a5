"""Fuzz the embedding-query surface the way test_fuzz_dedup fuzzes the
dedup layer: Hypothesis-generated vector tables — random directions,
exact-duplicate vectors, scaled copies (same direction), near-aligned
perturbations, and a zero vector — written as a real embeddings.parquet
and run through the REGISTERED Spark queries AND their driver oracle SQL
verbatim. Any cross-engine drift in the hyperplane signature fold, the
cosine micro-unit arithmetic, the margin's integer numerator/denominator,
or a rank tiebreak shows up here before the driver gate."""

from __future__ import annotations

import math
import shutil
import tempfile

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from week5_datingnlp_big_data_spark import registry

DIM = 64

FUZZED_QUERIES = (
    "embedding_coverage_sample",
    "embedding_margin_pairs",
    "embedding_near_dup_pairs",
    "embedding_cosine_topk",
    "embedding_sq8_topk",
    "contrastive_triples",
)

EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


@st.composite
def vector_table(draw):
    """Random vectors + structured degeneracies, labels cycling 0/1 so
    both margin-mining sides are populated. vec_ids start at 0 so the
    fixed query_ids=range(8) of the top-k queries always resolve."""
    rng = draw(st.randoms(use_true_random=False))
    n = draw(st.integers(10, 24))
    rows = []
    for i in range(n):
        v = [round(rng.uniform(-1.0, 1.0), 3) for _ in range(DIM)]
        rows.append((i, v, i % 2))
    vid = n
    # exact duplicate (cos = 1 against its source, same LSH cell)
    src = rows[rng.randrange(n)][1]
    rows.append((vid, list(src), vid % 2)); vid += 1
    # scaled copy: same direction, different magnitude — cosine invariant
    src = rows[rng.randrange(n)][1]
    rows.append((vid, [round(2.0 * x, 3) for x in src], vid % 2)); vid += 1
    # near-aligned perturbation (high-cos pair for the near-dup query)
    src = rows[rng.randrange(n)][1]
    pert = list(src)
    pert[rng.randrange(DIM)] = round(pert[0] + 0.01, 3)
    rows.append((vid, pert, vid % 2)); vid += 1
    if draw(st.booleans()):
        # zero vector: no direction — margin mining must drop it, the
        # signature fold must still agree bit-for-bit
        rows.append((vid, [0.0] * DIM, vid % 2)); vid += 1
    return rows


def _norm(v):
    # everything becomes a string so tuples stay sortable even when a
    # column mixes NULL/NaN markers with values (the driver compares
    # string forms too)
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
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
        # 64-dim vectors make every drawn table big by construction
        HealthCheck.large_base_example,
        HealthCheck.data_too_large,
    ],
)
@given(rows=vector_table())
def test_embedding_queries_match_oracle_on_fuzz(spark, rows):
    tmp = tempfile.mkdtemp(prefix="emb_fuzz_")
    try:
        spark.createDataFrame(rows, EMB_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/embeddings.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{tmp}/embeddings.parquet/*.parquet')"
        )
        has_zero = any(all(x == 0.0 for x in r[1]) for r in rows)
        for name in FUZZED_QUERIES:
            if has_zero and name in (
                "embedding_near_dup_pairs", "embedding_cosine_topk",
                "contrastive_triples",
            ):
                # raw-cosine queries divide by the norm product; the
                # zero-vector policy for those paths is pinned by their
                # own units, not fuzzed here
                continue
            got = _canon(registry.QUERIES[name](spark, tmp).toPandas())
            want = _canon(con.execute(registry.ORACLE[name]).df())
            assert got == want, f"{name} diverged on {len(rows)} vectors"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
