"""Similarity search over embedding columns (``array<float>``).

Extension surface for LLM-data pipelines (SURVEY.md section 2.10): the
``embeddings`` table carries 64-dim vectors. Three tiers:

  cosine_topk        — exact brute-force top-k for a bounded query set
                       (JVM-side ``zip_with``/``aggregate``; the baseline)
  cosine_near_dup_pairs — exact pairs above a cosine threshold within
                       LSH buckets (random-hyperplane signs, md5-derived →
                       deterministic + oracle-checkable)
  brp_lsh_topk       — MLlib BucketedRandomProjectionLSH approx-NN (the
                       100 TB path; rows-only checked, recall-tested
                       against the brute force)

Scale: brute force is O(Q×N) — fine for Q small (reranking, eval); the
LSH variants bound candidate generation by bucket collisions. All vector
math stays in whole-stage codegen (no Python) via higher-order functions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id: broadcast the Q query
    vectors against the full table, rank by cosine. Output:
    (query_id, neighbor_id, cos) — self-matches excluded.

    The double cast to double before the arithmetic keeps Spark and the
    DuckDB oracle in the same float semantics (both compute in float64)."""
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    queries = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    pairs = vecs.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def hyperplane_weights(num_planes: int, dim: int, seed_tag: str = "hp") -> list[list[float]]:
    """Deterministic ±1 hyperplane weights: plane p, dim d gets the low
    md5 bit of '{seed_tag}#{p}#{d}'. Computed driver-side once (they are
    constants) and inlined as literals into BOTH the Spark plan and the
    SQL oracle — no per-row hashing."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{seed_tag}#{p}#{d}".encode()).digest()[-1] & 1 else -1.0
            for d in range(dim)
        ]
        for p in range(num_planes)
    ]


def hyperplane_signature(
    vec: Column, num_planes: int = 16, dim: int = 64, seed_tag: str = "hp"
) -> Column:
    """Random-hyperplane LSH signature: sign(Σ ±vᵢ) per plane → a
    bit-string key. Cosine-similar vectors agree on most bits. Weight
    literals are constant-folded; the per-row work is num_planes dot
    products inside codegen."""
    weights = hyperplane_weights(num_planes, dim, seed_tag)
    bits = []
    for p in range(num_planes):
        terms = F.zip_with(
            vec,
            F.array(*[F.lit(w) for w in weights[p]]),
            lambda v, w: v * w,
        )
        s = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(s >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs: bucket by hyperplane signature, verify
    exact cosine ≥ threshold within buckets. High-threshold pairs agree on
    all signature bits with high probability; the cross join never runs."""
    vecs = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("sig", hyperplane_signature(F.col("v"), num_planes, dim))
    a, b = vecs.alias("a"), vecs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def brp_lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH approximate top-k (Euclidean
    proxy for cosine on ~normalized embeddings). The production-scale
    path: candidates come from hash buckets, not a cross join. Seeded →
    stable per Spark version, but not SQL-expressible → rows-only check +
    recall test against cosine_topk."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=42,
    )
    model = brp.fit(feat)
    queries = feat.filter(F.col(id_col).isin(query_ids)).collect()
    out = None
    for row in queries:
        nn = model.approxNearestNeighbors(feat, row["features"], k + 1)
        nn = (
            nn.filter(F.col(id_col) != row[id_col])
            .limit(k)
            .select(
                F.lit(row[id_col]).alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
                F.col("distCol").alias("dist"),
            )
        )
        out = nn if out is None else out.unionByName(nn)
    return out


def brp_lsh_topk_join(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    dist_threshold: float = 8.0,
) -> DataFrame:
    """Set-oriented LSH top-k: ONE ``approxSimilarityJoin`` between the
    query table and the corpus, then a per-query window rank — the
    companion to ``brp_lsh_topk``'s per-vector loop, which launches one
    Spark job per query and is only sane for a handful of vectors. This
    form takes a query *table* of any size in a single bucketed join
    (candidates = hash-bucket collisions, never Q×N), so it is the shape
    that survives a 100 TB corpus with a large query set.

    ``dist_threshold`` bounds candidate distance; neighbors farther than
    it are unreachable (recall-tested against cosine_topk). Seeded MLlib
    hash family → rows-only at the driver."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=42,
    )
    model = brp.fit(feat)
    queries = feat.filter(F.col(id_col).isin(query_ids))
    joined = model.approxSimilarityJoin(queries, feat, dist_threshold, distCol="dist")
    scored = joined.select(
        F.col(f"datasetA.{id_col}").alias("query_id"),
        F.col(f"datasetB.{id_col}").alias("neighbor_id"),
        F.round("dist", 6).alias("dist"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "dist", "rnk")
    )


def cosine_pandas_udf(dim: int = 64):
    """Vectorized Pandas-UDF cosine (Arrow-batched NumPy) — the
    alternative formulation for when vector math must leave the JVM (e.g.
    calling a real embedding library). The built-in ``cosine`` (zip_with/
    aggregate, codegen'd) is the default hot path; this exists for parity
    with Python-native pipelines and is equality-tested against it."""
    import numpy as np
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy())
        B = np.stack(b.to_numpy())
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = num / den
        return pd.Series(out)

    return _cos


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    with k-means into ``n_cells`` cells; a query scans only its ``n_probe``
    nearest cells. The classic ANN scale path: candidate count drops from
    N to ~N × n_probe / n_cells, and the cell assignment is a narrow
    column that partitions/prunes naturally at 100 TB.

    Seeded k-means → stable within a Spark version, but not
    SQL-expressible → rows-only at the driver + recall-tested against
    cosine_topk."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    feat = vecs.withColumn("features", array_to_vector("v"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, "v", "cell").cache()

    centers = [np.asarray(c) for c in model.clusterCenters()]
    q_rows = assigned.filter(F.col(id_col).isin(query_ids)).select(id_col, "v").collect()

    def nearest_cells(v):
        d = [float(np.linalg.norm(np.array(v) - c)) for c in centers]
        return [int(i) for i in np.argsort(d)[:n_probe]]

    probe = [(r[id_col], r["v"], nearest_cells(r["v"])) for r in q_rows]
    probe_df = embeddings.sparkSession.createDataFrame(
        [(qid, qv, cell) for qid, qv, cells in probe for cell in cells],
        f"query_id long, qv array<double>, cell int",
    )
    cands = assigned.join(F.broadcast(probe_df), "cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space into ``n_clusters``
    cells and compare vectors ONLY within a cell, emitting pairs with
    cosine ≥ threshold. The 100 TB shape: the self-join keys on the
    cluster id, so candidate count is Σ|cell|² instead of N² — and the
    cell column partitions naturally, with AQE skew-split absorbing a
    giant cell. High-cosine pairs land in the same cell with high
    probability (recall-tested against the exact hyperplane-bucketed
    variant); pairs whose members straddle a k-means boundary are the
    known, paper-documented miss mode.

    Seeded k-means → stable per Spark version but not SQL-expressible →
    rows-only at the driver + recall/unit tests."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    feat = vecs.withColumn("features", array_to_vector("v"))
    km = KMeans(k=n_clusters, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(feat)
    assigned = model.transform(feat).select(id_col, "v", "cell")
    a, b = assigned.alias("a"), assigned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semantic_dedup_keep(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """The dedup decision on top of ``semantic_dedup_pairs``: drop the
    higher id of every near-dup pair (SemDeDup keeps one exemplar per
    semantic duplicate set; min-id is the deterministic choice), keep
    everything else. One anti-join against the distinct drop set."""
    pairs = semantic_dedup_pairs(
        embeddings, threshold, n_clusters, id_col, vec_col, seed
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return embeddings.join(drops, id_col, "left_anti")


def knn_recall(exact: DataFrame, approx: DataFrame) -> float:
    """Fraction of exact top-k pairs recovered by the approx variant."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hit = e.join(a, ["query_id", "neighbor_id"], "inner").count()
    total = e.count()
    return hit / total if total else 1.0


def pq_train(
    embeddings: DataFrame,
    num_subspaces: int = 4,
    codebook_size: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Product-quantization codebooks (Jégou, Douze, Schmid 2011,
    "Product Quantization for Nearest Neighbor Search"): split each
    D-dim vector into ``num_subspaces`` contiguous subvectors and k-means
    each subspace into ``codebook_size`` centroids. A vector then
    compresses to m log2(k*) bits (m=4, k*=16 → 2 BYTES for a 64-dim
    float vector, 128:1) while distances remain approximately computable
    from codes alone — the memory leg of the ANN scale triad next to
    IVF's candidate pruning and LSH's bucketing.

    Returns the codebook TABLE (subspace, code, centroid array<double>):
    m × k* rows — a fixed-parameter bounded broadcast, engine-agnostic
    state like the Bloom word table. The m subspace fits run as a driver
    loop over m (a small constant), each a distributed MLlib k-means.
    Seeded estimator → rows-only at the driver, recall-tested."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(F.col(vec_col).cast("array<double>").alias("v")).cache()
    dim = len(vecs.first()["v"])
    sub_dim = dim // num_subspaces
    spark = embeddings.sparkSession
    rows = []
    for j in range(num_subspaces):
        sub = vecs.select(
            array_to_vector(F.slice("v", j * sub_dim + 1, sub_dim)).alias("features")
        )
        model = KMeans(
            k=codebook_size, seed=seed + j, featuresCol="features"
        ).fit(sub)
        rows += [
            (j, c, [float(x) for x in center])
            for c, center in enumerate(model.clusterCenters())
        ]
    return spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    )


def _sub_l2sq(sub_vec: Column, centroid: Column) -> Column:
    """Squared L2 distance between a subvector and a centroid — the inner
    quantity both encode (argmin) and ADC (lookup) minimize/sum."""
    return F.aggregate(
        F.zip_with(sub_vec, centroid, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    num_subspaces: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against trained codebooks: (vec_id, codes
    array<int>), codes[j] = argmin_c ||v_j − centroid(j,c)||². Fully
    relational: explode to (vec, subspace) subvectors, broadcast-join the
    m×k* codebook, min_by over codes, ordered array rebuild. One narrow
    shuffle on vec_id; the corpus never leaves the executors."""
    dim_row = embeddings.select(
        F.size(F.col(vec_col).cast("array<double>")).alias("d")
    ).first()
    sub_dim = dim_row["d"] // num_subspaces
    subs = embeddings.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_subspaces - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("subspace"),
                    F.slice(
                        F.col(vec_col).cast("array<double>"), j * sub_dim + 1, sub_dim
                    ).alias("sub_vec"),
                ),
            )
        ).alias("s"),
    ).select(id_col, "s.subspace", "s.sub_vec")
    assigned = (
        subs.join(F.broadcast(codebooks), "subspace")
        .withColumn("d2", _sub_l2sq(F.col("sub_vec"), F.col("centroid")))
        .groupBy(id_col, "subspace")
        .agg(F.min_by("code", F.struct("d2", "code")).alias("code"))
    )
    return assigned.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_subspaces: int = 8,
    codebook_size: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    rerank_factor: int = 8,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) with
    exact re-ranking: the corpus lives as PQ codes; each query precomputes
    an m×k* lookup table of subvector distances to every centroid, a
    candidate's ADC distance is the SUM of m table lookups — no float
    vector is ever touched in the scan — and only the ADC shortlist
    (``k × rerank_factor`` per query) has its true vectors fetched for
    exact re-ranking, the standard two-stage recipe (ADC recall@shortlist
    is what matters, not recall@k; re-rank fixes the ordering). Output:
    (query_id, neighbor_id, dist, rnk), ascending exact distance with an
    id tiebreak.

    Scale shape: codes are bytes per vector; the per-query lookup table is
    |Q|·m·k* rows — bounded like cosine_topk's query set — broadcast into
    the join; the explode is m narrow rows per candidate; the exact stage
    joins only |Q|·k·rerank_factor ids back to the vector table. Exactly
    the IVF-ADC serving layout (this op is the PQ leg; compose with
    ivf_topk's cell pruning for both).

    ``index``: a prebuilt ``(codebooks, codes)`` pair — e.g. from
    ``load_pq_index`` — skips the train+encode build entirely: the
    build-once / query-many serving split (at 100 TB the index build is a
    batch job; queries hit only the saved code and codebook tables plus
    the shortlist's true vectors)."""
    if index is not None:
        codebooks, encoded = index
    else:
        codebooks = pq_train(embeddings, num_subspaces, codebook_size, vec_col, seed)
        encoded = pq_encode(embeddings, codebooks, num_subspaces, id_col, vec_col)
    dim_row = embeddings.select(
        F.size(F.col(vec_col).cast("array<double>")).alias("d")
    ).first()
    sub_dim = dim_row["d"] // num_subspaces
    queries = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    lookup = (
        queries.select(
            "query_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(num_subspaces - 1)),
                    lambda j: F.struct(
                        j.cast("int").alias("subspace"),
                        F.slice(F.col("qv"), j * sub_dim + 1, sub_dim).alias("q_sub"),
                    ),
                )
            ).alias("s"),
        )
        .select("query_id", "s.subspace", "s.q_sub")
        .join(F.broadcast(codebooks), "subspace")
        .select(
            "query_id",
            "subspace",
            "code",
            _sub_l2sq(F.col("q_sub"), F.col("centroid")).alias("d2"),
        )
    )
    cand = encoded.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("subspace", "code"),
    ).filter(~F.col("neighbor_id").isin(query_ids))
    scored = (
        cand.join(F.broadcast(lookup), ["subspace", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sqrt(F.sum("d2")), 6).alias("adc_dist"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "neighbor_id")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    exact = (
        shortlist.join(corpus, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.sqrt(_sub_l2sq(F.col("qv"), F.col("nv"))), 6).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "dist", "rnk")
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    num_subspaces: int = 8,
    codebook_size: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    rerank_factor: int = 8,
) -> DataFrame:
    """IVF-PQ: the full ANN serving layout — IVF cell pruning bounds WHICH
    vectors are scanned (~N·n_probe/n_cells candidates), PQ codes bound
    WHAT is scanned (bytes, not floats, via the ADC lookup table), and an
    exact re-rank of the shortlist fixes the ordering. This composition is
    the standard billion-vector architecture (Jégou et al. 2011 IVFADC;
    FAISS's IVFx,PQy): at 100 TB the cell id is a partition column — a
    probe reads n_probe partitions of byte codes and nothing else.

    Codes quantize raw vectors (IVF-flat-PQ) rather than cell residuals —
    one shared codebook table instead of per-cell state; the exact re-rank
    absorbs the modest ADC precision loss. Output:
    (query_id, neighbor_id, dist, rnk) by exact distance, id tiebreak."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    feat = vecs.withColumn("features", array_to_vector("v"))
    coarse = KMeans(
        k=n_cells, seed=seed, featuresCol="features", predictionCol="cell"
    ).fit(feat)
    assigned = coarse.transform(feat).select(id_col, "v", "cell").cache()

    codebooks = pq_train(embeddings, num_subspaces, codebook_size, vec_col, seed)
    encoded = pq_encode(embeddings, codebooks, num_subspaces, id_col, vec_col).join(
        assigned.select(id_col, "cell"), id_col
    )

    centers = [np.asarray(c) for c in coarse.clusterCenters()]
    q_rows = assigned.filter(F.col(id_col).isin(query_ids)).select(id_col, "v").collect()
    probe = [
        (int(r[id_col]), r["v"], [int(i) for i in np.argsort(
            [float(np.linalg.norm(np.array(r["v"]) - c)) for c in centers]
        )[:n_probe]])
        for r in q_rows
    ]
    spark = embeddings.sparkSession
    probe_cells = spark.createDataFrame(
        [(qid, cell) for qid, _qv, cells in probe for cell in cells],
        "query_id long, cell int",
    )
    queries = spark.createDataFrame(
        [(qid, qv) for qid, qv, _cells in probe], "query_id long, qv array<double>"
    )

    dim = len(probe[0][1]) if probe else 0
    sub_dim = dim // num_subspaces
    lookup = (
        queries.select(
            "query_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(num_subspaces - 1)),
                    lambda j: F.struct(
                        j.cast("int").alias("subspace"),
                        F.slice(F.col("qv"), j * sub_dim + 1, sub_dim).alias("q_sub"),
                    ),
                )
            ).alias("s"),
        )
        .select("query_id", "s.subspace", "s.q_sub")
        .join(F.broadcast(codebooks), "subspace")
        .select(
            "query_id", "subspace", "code",
            _sub_l2sq(F.col("q_sub"), F.col("centroid")).alias("d2"),
        )
    )
    cand = (
        encoded.join(F.broadcast(probe_cells), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.posexplode("codes").alias("subspace", "code"),
        )
    )
    scored = (
        cand.join(F.broadcast(lookup), ["query_id", "subspace", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sqrt(F.sum("d2")), 6).alias("adc_dist"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= k * rerank_factor)
        .select("query_id", "neighbor_id")
    )
    exact = (
        shortlist.join(
            vecs.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv")),
            "neighbor_id",
        )
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(F.sqrt(_sub_l2sq(F.col("qv"), F.col("nv"))), 6).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "dist", "rnk")
    )


def save_pq_index(path: str, codebooks: DataFrame, codes: DataFrame) -> None:
    """Persist a PQ index as two parquet tables: ``<path>/codebooks``
    (m×k* centroid rows) and ``<path>/codes`` (one narrow codes row per
    vector). Plain columnar tables — engine-agnostic state, re-loadable
    by any Spark session (or DuckDB) with no pickled estimator objects;
    the codebook side stays a bounded broadcast on reload."""
    codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
    codes.write.mode("overwrite").parquet(f"{path}/codes")


def load_pq_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a saved PQ index → ``(codebooks, codes)``, ready to pass as
    ``pq_topk(..., index=...)`` for the build-once / query-many split."""
    return (
        spark.read.parquet(f"{path}/codebooks"),
        spark.read.parquet(f"{path}/codes"),
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (SQ8): the oracle-verifiable compressed-vector
# path. PQ/IVF-PQ compress harder but their k-means codebooks are only
# rows-only checkable; SQ8's whole scoring path is integer dot products
# plus IEEE sqrt/divide, so a SQL oracle reproduces it bit-for-bit.
# ---------------------------------------------------------------------------


def sq8_codes(vec: Column) -> Column:
    """Symmetric int8 quantization: q_i = round(x_i / (max|x| / 127)),
    values in [-127, 127] (a zero vector encodes to zeros). round() is
    half-away-from-zero in BOTH Spark (HALF_UP) and DuckDB, so codes are
    engine-identical. 4x smaller than float32, 8x smaller than the
    float64 compare path."""
    m = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = m / F.lit(127.0)
    return F.transform(
        vec,
        lambda x: F.when(m > 0, F.round(x / scale, 0)).otherwise(F.lit(0.0))
        .cast("int"),
    )


def sq8_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-shape top-k over int8-quantized vectors. Key identity: the
    per-vector scales cancel in cosine —
    cos_q = dot(qa,qb) / (sqrt(dot(qa,qa)) * sqrt(dot(qb,qb))) — so the
    quantized score needs NO dequantization: integer dot products (exact
    far below 2^53), one sqrt each side (IEEE correctly rounded), one
    division. Deterministic across engines, runs, partitionings.

    Scale shape mirrors cosine_topk (broadcast bounded query set, one
    rank window) but the scanned payload is 8x smaller than float64 —
    at 100 TB of embeddings, SQ8 is the difference between a memory-
    resident scan and a disk-bound one; re-rank survivors with the full
    vectors when recall must be exact (same coarse-to-fine contract as
    IVF-PQ)."""
    coded = embeddings.select(
        F.col(id_col),
        sq8_codes(F.col(vec_col).cast("array<double>")).alias("q"),
    )
    self_dot = F.aggregate(
        F.zip_with("q", "q", lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    coded = coded.withColumn("_n2", self_dot)
    queries = coded.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("qq"),
        F.col("_n2").alias("_qn2"),
    )
    pairs = coded.join(
        F.broadcast(queries), F.col(id_col) != F.col("query_id")
    )
    dot_ab = F.aggregate(
        F.zip_with("qq", "q", lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    den = F.sqrt(F.col("_qn2").cast("double")) * F.sqrt(
        F.col("_n2").cast("double")
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.when(den > 0, F.round(dot_ab.cast("double") / den, 6)).alias(
            "sq_cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc_nulls_last("sq_cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "sq_cos", "rnk")
    )


def coverage_sample(
    embeddings: DataFrame,
    per_bucket: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    dim: int = 64,
    seed: str = "cov",
) -> DataFrame:
    """Coverage-balanced diversity sampling: keep at most ``per_bucket``
    vectors from every hyperplane-LSH cell, so the sample spans the
    embedding space instead of mirroring its density. This is the
    pruning complement of SemDeDup (Abbas et al. 2023) / the
    "diversify before training" step of density-balanced corpus
    pruning: dense regions (near-duplicate topic clusters) contribute
    the same budget as sparse ones.

    Deterministic end to end: cells come from the md5-seeded ±1
    hyperplanes (constants inlined into the plan — same discipline as
    cosine_near_dup_pairs), and the within-cell pick order is
    ``md5(seed:id)`` — a pure function of ids, identical on any
    engine/run/layout (same rule as corpus.stratified_fixed_sample).

    Scale shape: one scan computes the signature (num_planes codegen
    dot products), one hash exchange on the cell key, one bounded
    row_number window per cell. No joins, no collect; at 100 TB the
    2^num_planes cells each see a ~uniform slice, so no window
    partition is corpus-sized (raise num_planes with corpus size).

    Output: ``(vec_id, cell, pick)`` for the kept rows, pick ∈
    [1, per_bucket] in md5 order.
    """
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("cell", hyperplane_signature(F.col("v"), num_planes, dim))
    order_key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy("cell").orderBy(order_key, F.col(id_col))
    return (
        vecs.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= per_bucket)
        .select(id_col, "cell", "pick")
    )


def margin_mined_pairs(
    embeddings: DataFrame,
    query_label: int = 0,
    cand_label: int = 1,
    k: int = 4,
    min_margin: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    pair_budget: int | None = None,
    min_cell_cands: int = 8,
    max_planes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Margin-based best-match mining (Artetxe & Schwenk 2019, the
    CCMatrix/LASER bitext-mining scorer): for every query vector x the
    best candidate y is scored not by raw cosine — which is miscalibrated
    across query neighborhood densities — but by the RATIO margin

        margin(x, y) = cos(x, y) / ((nx + ny) / 2)

    where nx / ny are the means of each side's top-k cosine
    neighborhoods. A pair is emitted only when its margin clears
    ``min_margin`` (> 1 means "closer than either side's typical
    neighbor"). Labels stand in for the two corpora being aligned.

    Cross-engine float discipline: per-pair cosines are rounded to 6dp,
    then scaled to INTEGER micro-units; neighborhood sums are bigint
    sums, and the margin collapses algebraically to

        margin = 2 * c6 * kx * ky / (sx * ky + sy * kx)

    — integer numerator and denominator, ONE IEEE division, so the
    oracle is bit-exact (same power-sums trick as event_type_daily_trend).

    Scale shape — two registered modes:

    * ``pair_budget=None`` (default, the bounded-batch form): the query
      side is a mining BATCH — broadcast; candidates stream scan-side,
      so the scored table is O(|Y| x |Q|) rows — linear in the corpus
      for a bounded Q.
    * ``pair_budget=B`` (the corpus x corpus form): both sides are
      assigned to hyperplane-LSH cells and the scorer runs WITHIN cells
      (the CCMatrix practice — FAISS-sharded mining; here the shards are
      sign-LSH cells so the whole thing stays one declarative plan). The
      cell-prefix length L is a pure INTEGER function of the two side
      counts — enough bits that the expected within-cell pair total
      stays near B, capped so every cell keeps >= ``min_cell_cands``
      expected candidates — so the scored table is ~B rows no matter the
      corpus size, and the same L falls out of the same integer
      arithmetic in the SQL oracle (bit-length, not float log2, so no
      ulp can flip it). Neighborhoods and the best match are then
      per-cell, which is exactly the approximation mined systems make.

    Both neighborhood aggregates and the final best-match rank reuse one
    persisted scored table (three consumers).

    Output: ``(query_id, match_id, cos, margin)`` — at most one row per
    query (its best candidate by margin), margin >= min_margin.
    """
    vecs = embeddings.select(
        F.col(id_col), F.col(label_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    # Zero vectors have no direction — cosine against them is 0/0. Drop
    # them up front (both sides; the oracle mirrors the same predicate)
    # instead of letting ANSI mode abort the whole mining batch.
    nonzero = F.aggregate(
        F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x
    ) > 0
    xs = vecs.filter((F.col(label_col) == query_label) & nonzero).select(
        F.col(id_col).alias("x_id"), F.col("v").alias("xv")
    )
    ys = vecs.filter((F.col(label_col) == cand_label) & nonzero).select(
        F.col(id_col).alias("y_id"), F.col("v").alias("yv")
    )
    c6 = F.round(F.round(cosine(F.col("xv"), F.col("yv")), 6) * 1e6).cast("bigint")
    if pair_budget is None:
        scored = (
            ys.join(F.broadcast(xs)).select("x_id", "y_id", c6.alias("c6")).persist()
        )
    else:
        # Blocked form: L-bit hyperplane-cell prefix where
        # L = min(pair_l, cand_l, max_planes):
        #   pair_l — ceil(log2(ceil(nx*ny / pair_budget))) bits shrink
        #            the expected pair total to ~pair_budget;
        #   cand_l — floor(log2(ny / min_cell_cands)) bits keep the
        #            expected candidates-per-cell >= min_cell_cands.
        # Both are bit-length INTEGER arithmetic (never float log2), so
        # the DuckDB oracle derives the identical L from the identical
        # counts. The two count() actions run driver-side at plan-build
        # time — still a pure function of the data, but inlining L as a
        # literal lets the plan compute only the L planes actually used
        # and drops the four adaptive sub-stages (two count aggregates +
        # two broadcast cross joins) the in-plan formulation needed:
        # measured 3.6 s -> ~1 s at sf0.1 for identical results.
        n_x, n_y = xs.count(), ys.count()
        pairm = (n_x * n_y + pair_budget - 1) // pair_budget
        pair_l = (pairm - 1).bit_length() if pairm > 1 else 0
        candm = n_y // min_cell_cands
        cand_l = candm.bit_length() - 1 if candm >= 1 else 0
        level = min(pair_l, cand_l, max_planes)
        if level <= 0:
            # one cell == the bounded-batch join; the oracle's
            # substr(sig, 1, 0) = '' key degenerates to the same product
            scored = (
                ys.join(F.broadcast(xs))
                .select("x_id", "y_id", c6.alias("c6"))
                .persist()
            )
        else:
            # signature of the FIRST `level` planes == the L-prefix of the
            # max_planes signature (plane bits are independent)
            xc = xs.withColumn(
                "cell", hyperplane_signature(F.col("xv"), level, dim)
            )
            yc = ys.withColumn(
                "cell", hyperplane_signature(F.col("yv"), level, dim)
            )
            # Cell equi-join — no broadcast hint (both sides are
            # corpus-sized at 100 TB; AQE picks the strategy and splits
            # skewed cells).
            scored = (
                yc.join(xc, "cell")
                .select("x_id", "y_id", c6.alias("c6"))
                .persist()
            )

    wx = Window.partitionBy("x_id").orderBy(F.desc("c6"), F.asc("y_id"))
    nx = (
        scored.withColumn("r", F.row_number().over(wx))
        .filter(F.col("r") <= k)
        .groupBy("x_id")
        .agg(F.sum("c6").alias("sx"), F.count(F.lit(1)).alias("kx"))
    )
    wy = Window.partitionBy("y_id").orderBy(F.desc("c6"), F.asc("x_id"))
    ny = (
        scored.withColumn("r", F.row_number().over(wy))
        .filter(F.col("r") <= k)
        .groupBy("y_id")
        .agg(F.sum("c6").alias("sy"), F.count(F.lit(1)).alias("ky"))
    )
    # A zero denominator means both neighborhoods average to exactly 0
    # (e.g. mutually orthogonal corpora) — there is no meaningful margin,
    # so the pair is dropped via NULL (also keeps ANSI mode happy).
    den = F.col("sx") * F.col("ky") + F.col("sy") * F.col("kx")
    margin = F.when(
        den != 0,
        F.round((F.lit(2.0) * F.col("c6") * F.col("kx") * F.col("ky")) / den, 6),
    )
    # In batch mode nx is query-batch-sized (broadcastable); ny — and in
    # blocked mode BOTH sides — are corpus-sized at 100 TB, so they join
    # by hash key and AQE may still demote to broadcast when measured small.
    nx_side = F.broadcast(nx) if pair_budget is None else nx
    ranked = (
        scored.join(nx_side, "x_id")
        .join(ny, "y_id")
        .select(
            F.col("x_id").alias("query_id"),
            F.col("y_id").alias("match_id"),
            F.round(F.col("c6") / 1e6, 6).alias("cos"),
            margin.alias("margin"),
        )
    )
    wbest = Window.partitionBy("query_id").orderBy(
        F.desc("margin"), F.asc("match_id")
    )
    return (
        ranked.withColumn("_b", F.row_number().over(wbest))
        .filter((F.col("_b") == 1) & (F.col("margin") >= min_margin))
        .drop("_b")
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick k results that balance relevance to the
    query against redundancy with what is already picked —

        pick argmax over c of  lam * cos(q, c)
                               - (1 - lam) * max over s in S of cos(c, s)

    The de-facto diversification pass over a dense-retrieval shortlist
    (RAG context assembly, dedup-aware eval pools).

    Coarse-to-fine contract (same as tsne_driver / the ANN re-rank
    tiers): the DISTRIBUTED part is the top-``pool`` candidate retrieval
    (cosine_topk — broadcast query, rank window); the greedy selection
    is inherently sequential in k, so it runs driver-side over the
    bounded pool (pool x dim floats — a few KB). Scores are rounded to
    6dp before the argmax so the pick sequence is reproducible across
    runs/layouts; ties break on the smaller id (then id order), making
    the whole rerank a pure function of the data.

    Returns ``(rank, vec_id, relevance, mmr_score)`` — rank 1..k in pick
    order.
    """
    pooled = cosine_topk(embeddings, [query_id], k=pool, id_col=id_col,
                         vec_col=vec_col).select("neighbor_id", "cos")
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cands = (
        pooled.join(vecs, pooled["neighbor_id"] == vecs[id_col])
        .select("neighbor_id", "cos", "v")
        .collect()
    )
    import math

    by_rel = sorted(cands, key=lambda r: (-r["cos"], r["neighbor_id"]))

    def _cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return num / (da * db) if da > 0 and db > 0 else 0.0

    picked: list[tuple[int, int, float, float]] = []
    chosen: list = []
    remaining = list(by_rel)
    while remaining and len(picked) < k:
        best_key, best_row = None, None
        for r in remaining:
            redundancy = max(
                (round(_cos(r["v"], s["v"]), 6) for s in chosen), default=0.0
            )
            score = round(lam * r["cos"] - (1.0 - lam) * redundancy, 6)
            key = (score, -r["neighbor_id"])
            if best_key is None or key > best_key:
                best_key, best_row = key, r
        picked.append(
            (len(picked) + 1, best_row["neighbor_id"], best_row["cos"], best_key[0])
        )
        chosen.append(best_row)
        remaining = [
            c for c in remaining if c["neighbor_id"] != best_row["neighbor_id"]
        ]

    spark = embeddings.sparkSession
    return spark.createDataFrame(
        picked, "rank int, vec_id bigint, relevance double, mmr_score double"
    )


def contrastive_triples(
    embeddings: DataFrame,
    anchor_ids: list[int],
    pos_threshold: float = 0.35,
    neg_margin: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive training-triple construction — the dataset-building
    step of embedding-model training (SimCSE/E5/GTR recipes): for each
    anchor, pick the POSITIVE (most-similar vector at cosine >=
    ``pos_threshold``) and the HARD NEGATIVE (the highest-ranked vector
    that is NOT positive-grade — cosine < pos_threshold - neg_margin,
    the margin keeping label noise out of the negative pool). Anchors
    with no positive-grade neighbor are dropped; hard negatives beat
    random negatives because they carry gradient (Xiong et al. 2021,
    ANCE).

    Scale shape: one scored table — broadcast bounded anchor batch x
    corpus scan (same plan as cosine_topk) — persisted for the two
    ranked picks; both picks are per-anchor row_number windows over the
    same partitioning. Ties break on the smaller id, cosines round to
    6dp: deterministic and fully oracle-expressible.

    Output: ``(anchor_id, pos_id, neg_id, pos_cos, neg_cos)``, one row
    per anchor that has a positive.
    """
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    anchors = vecs.filter(F.col(id_col).isin(anchor_ids)).select(
        F.col(id_col).alias("anchor_id"), F.col("v").alias("av")
    )
    scored = (
        vecs.join(F.broadcast(anchors), F.col(id_col) != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col(id_col).alias("other_id"),
            F.round(cosine(F.col("av"), F.col("v")), 6).alias("cos"),
        )
        .persist()
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("other_id"))
    pos = (
        scored.filter(F.col("cos") >= pos_threshold)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("pos_id"),
            F.col("cos").alias("pos_cos"),
        )
    )
    neg = (
        scored.filter(F.col("cos") < pos_threshold - neg_margin)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("neg_id"),
            F.col("cos").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor_id", "left").select(
        "anchor_id", "pos_id", "neg_id", "pos_cos", "neg_cos"
    )


def pack_sign_bits(vec, dim: int):
    """Sign-quantize an ``array<double>`` into packed 32-bit words
    (``array<bigint>``, ceil(dim/32) entries): bit = 1 iff the dimension
    is > 0. 32 bits per word keeps every fold value far inside int64 —
    a 64-bit fold would overflow the ANSI multiply at the top bit. Both
    vectors of a pair pack through the same fold, so XOR+popcount over
    words equals the per-dimension sign-mismatch count exactly."""
    n_words = (dim + 31) // 32
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda wi: F.aggregate(
            F.slice(vec, wi * 32 + 1, 32),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc * 2
            + F.when(x > 0, 1).otherwise(0).cast("bigint"),
        ),
    )


def sign_hamming_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Binary-embedding search: sign-quantize every vector to 1 bit per
    dimension (a 32-64x scan-payload reduction — the standard binary-
    embedding trick for first-stage retrieval; sign-Hamming approximates
    angular distance) and rank neighbors by XOR+popcount Hamming
    distance over the packed words. Output
    ``(query_id, neighbor_id, hamming, rnk)`` — top-``k`` per query,
    ties by neighbor id; distances are exact integers, so the oracle
    (which counts per-dimension sign mismatches WITHOUT packing)
    hash-matches bit-for-bit.

    Scale shape: packing is one narrow per-row transform; the packed
    corpus is dim/8 bytes per row, the query side broadcasts, and the
    distance is ceil(dim/32) XOR+bit_count instructions per pair —
    whole-stage codegen, no Python. The brute-force scan here is the
    oracle-checked exact baseline; at corpus scale feed the packed
    column through any blocked/banded candidate path first."""
    vecs = embeddings.select(
        F.col(id_col),
        pack_sign_bits(
            F.col(vec_col).cast("array<double>"), dim
        ).alias("bits"),
    )
    queries = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("bits").alias("qbits")
    )
    pairs = vecs.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.aggregate(
            F.zip_with(
                F.col("qbits"),
                F.col("bits"),
                lambda a, b: F.bit_count(a.bitwiseXOR(b)),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, c: acc + c,
        ).alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "hamming", "rnk")
    )


def group_divergence(
    embeddings: DataFrame,
    group_col: str = "label",
    group_a: int = 0,
    group_b: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Distribution shift between two embedding populations via total
    variation distance over hyperplane-LSH cells — the cheap
    monitoring statistic behind "did this source / this crawl snapshot
    drift?" (the discretized, deterministic cousin of MAUVE's
    cluster-histogram divergence, Pillutla et al. 2021 §2: quantize the
    embedding space, compare the two cell histograms). TV = ½ Σ_cells
    |p_A(c) − p_B(c)| ∈ [0, 1]; 0 = identical occupancy, 1 = disjoint
    support.

    Determinism: the per-cell deviation cross-multiplies to integers —
    ``|n_A·N_B − n_B·N_A|`` — so the summed numerator is EXACT int64
    (immune to partial-agg order) and TV is one final division:
    ``tv = tv_num / (2·N_A·N_B)``. Overflow bound: n·N ≤ 2⁶³ needs
    N_A·N_B ≤ 9·10¹⁸ — populations up to ~3·10⁹ vectors each.

    Returns one row: ``(n_cells, cells_a_only, cells_b_only, n_a, n_b,
    tv_num, tv_distance)``. Scale shape: one scan computes the
    signature (codegen dot products), one groupBy on (cell) with
    conditional counts — the cell axis is 2^num_planes, so everything
    after the first aggregate is dimension-sized.
    """
    vecs = embeddings.select(
        F.col(group_col).alias("_g"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).filter(F.col("_g").isin(group_a, group_b))
    cells = vecs.withColumn(
        "cell", hyperplane_signature(F.col("v"), num_planes, dim)
    ).groupBy("cell").agg(
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    totals = cells.agg(
        F.sum("n_a").cast("long").alias("_na"),
        F.sum("n_b").cast("long").alias("_nb"),
    )
    dev = F.abs(F.col("n_a") * F.col("_nb") - F.col("n_b") * F.col("_na"))
    per = cells.crossJoin(F.broadcast(totals))
    return per.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(((F.col("n_a") > 0) & (F.col("n_b") == 0)).cast("long"))
        .cast("long")
        .alias("cells_a_only"),
        F.sum(((F.col("n_b") > 0) & (F.col("n_a") == 0)).cast("long"))
        .cast("long")
        .alias("cells_b_only"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.sum(dev).cast("long").alias("tv_num"),
    ).select(
        "n_cells",
        "cells_a_only",
        "cells_b_only",
        "n_a",
        "n_b",
        "tv_num",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.col("tv_num").cast("double")
                / (2.0 * F.col("n_a") * F.col("n_b")),
                9,
            ),
        ).alias("tv_distance"),
    )
