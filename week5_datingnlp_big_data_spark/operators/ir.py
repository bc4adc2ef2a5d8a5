"""BM25 ranked retrieval over the long-form DFM (Okapi BM25).

Robertson & Spärck Jones' probabilistic relevance framework (Robertson et
al., TREC-3 1994) with the Lucene ``+1`` idf variant (non-negative for
every df, including df > N/2):

  idf(t)     = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)
  bm25(d,t)  = idf(t) * count(d,t) * (k1 + 1)
               / (count(d,t) + k1 * (1 - b + b * dl(d) / avgdl))
  score(d,Q) = sum over query terms t in Q of bm25(d,t)

Defaults k1 = 1.2, b = 0.75 are the published Okapi constants. This
complements the reference's TF-IDF surface (Week5_datingNLP.R:215-247,
operators/tfidf.py): TF-IDF feeds the feature-weighting pipelines, BM25 is
the ranked *retrieval* side — "find the top-k documents for this query" —
which a training-data curation stack uses for targeted corpus pulls
(e.g. retrieving seed-topic documents before DSIR-style resampling).

Scale design (100 TB):
- ``bm25_weights`` builds the full postings-weight table: dl is a window
  over doc_id (one hash exchange), df is a |vocab|-sized aggregate joined
  back by hash key with no forced broadcast (the term table grows with
  the corpus; AQE broadcasts it when measured small), and (N, avgdl) is a
  ONE-ROW aggregate attached via crossJoin(broadcast(...)) — no driver
  collect anywhere.
- ``bm25_topk`` is the inverted-index query path: the term filter is
  applied to the postings FIRST (predicate on the scan side, so only the
  query terms' postings are ever joined or scored), df is computed for
  query terms only, and per-doc lengths arrive from a doc-level aggregate
  joined on doc_id. The final top-k is orderBy+limit —
  TakeOrderedAndProject, never a global sort. At cluster scale the dl and
  df sides would be precomputed once per index build (bm25_weights) and
  the query path reads only matched postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def _corpus_stats(counts: DataFrame) -> DataFrame:
    """One-row ``(n_docs, avgdl)`` aggregate: avgdl = total tokens / N."""
    return counts.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        (F.sum("count") / F.countDistinct("doc_id")).alias("avgdl"),
    )


def _bm25_expr(k1: float, b: float):
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_part = (F.col("count") * F.lit(k1 + 1.0)) / (
        F.col("count")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return idf.alias("idf"), (idf * tf_part).alias("bm25")


def bm25_weights(
    counts: DataFrame, k1: float = BM25_K1, b: float = BM25_B, persist: bool = True
) -> DataFrame:
    """Full BM25 postings table: ``(doc_id, term, count, dl, df, idf, bm25)``.

    ``counts`` is the long-form DFM ``(doc_id, term, count)``
    (dfm.doc_term_counts). The counts DAG feeds three consumers (dl
    window, df aggregate, corpus stats) — persist it once, same rationale
    as tfidf.tf_idf."""
    if persist:
        counts = counts.persist()
    dl = Window.partitionBy("doc_id")
    with_dl = counts.withColumn("dl", F.sum("count").over(dl))
    df_ = counts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf, bm25 = _bm25_expr(k1, b)
    return (
        with_dl.join(df_, "term")
        .crossJoin(F.broadcast(_corpus_stats(counts)))
        .select("doc_id", "term", "count", "dl", "df", idf, bm25)
    )


def bm25_topk(
    counts: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
    persist: bool = True,
    dl: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents for a bag-of-words query: ``(doc_id, n_matched,
    score)``, score rounded to 6 decimals (cross-engine float discipline),
    ordered by (score desc, doc_id) with k rows.

    Inverted-index shape: postings are filtered to the query terms BEFORE
    any join, so the per-term work is |matched postings|, not |corpus|.
    dl/avgdl/N still describe the FULL corpus (they are length/priors, not
    query-dependent) — but both come from ONE pass: (n_docs, avgdl) is a
    one-row rollup of the doc-length table (avgdl = Σdl / N ≡
    Σcount / countDistinct(doc_id), integer sums, bit-identical), so the
    postings table is scanned once for lengths instead of twice
    (lengths + a separate distinct-count pass).

    ``dl`` — a precomputed ``(doc_id, dl)`` doc-length table. A caller
    running SEVERAL retrieval arms over the same postings (hybrid RRF:
    BM25 ⊕ TF-IDF) builds it once and passes it to every arm, so the
    build is shared structurally — one plan subtree, one cache entry —
    rather than relying on the cache layer to unify per-arm rebuilds of
    an identical plan (optimization r9)."""
    if persist:
        counts = counts.persist()
    q = sorted({t.lower() for t in query_terms})
    matched = counts.filter(F.col("term").isin(q))
    if dl is None:
        dl = counts.groupBy("doc_id").agg(F.sum("count").alias("dl")).persist()
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_ = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    _, bm25 = _bm25_expr(k1, b)
    scored = (
        matched.join(dl, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", bm25)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.sum("bm25"), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def tfidf_topk(
    counts: DataFrame,
    query_terms: list[str],
    k: int = 20,
    persist: bool = True,
    dl: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents by summed TF-IDF weight over the query terms:
    ``(doc_id, n_matched, score)``, score rounded to 6 decimals, ordered
    (score desc, doc_id). The lexical second system for hybrid fusion —
    same inverted-index shape as ``bm25_topk`` (postings filtered to the
    query terms first, per-doc totals from a doc-level aggregate, |Q|- and
    1-row sides broadcast, TakeOrderedAndProject top-k). TF-IDF semantics
    are the engine's own (reference EP-2): tf = count/doc_total,
    idf = log10(N/df). ``dl`` as in :func:`bm25_topk` — pass a shared
    doc-length table when fusing several arms over the same postings."""
    if persist:
        counts = counts.persist()
    q = sorted({t.lower() for t in query_terms})
    matched = counts.filter(F.col("term").isin(q))
    if dl is None:
        dl = counts.groupBy("doc_id").agg(F.sum("count").alias("dl")).persist()
    df_ = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N from the doc-length table (one pass over postings, not a second
    # distinct-count scan — same trick as bm25_topk)
    n_docs = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (F.col("count") / F.col("dl")) * F.log10(F.col("n_docs") / F.col("df"))
    scored = (
        matched.join(dl, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.sum(w), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def rrf_fuse(
    systems: dict[str, DataFrame],
    rrf_k: int = 60,
    top: int = 20,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    merge the ranked lists of several retrieval systems by
    ``score(d) = Σ_systems 1 / (rrf_k + rank_s(d))`` — the standard
    hybrid-retrieval combiner (e.g. BM25 ⊕ dense ANN) that needs no score
    calibration because only ranks enter. ``systems`` maps a system name
    to its ``(doc_id, score)`` result; ranks are assigned per system by
    (score desc, doc_id) — deterministic under ties. rrf_k = 60 is the
    published default.

    Output: ``(doc_id, n_systems, rrf_score, best_rank)`` ordered
    (rrf_score desc, doc_id), ``top`` rows.

    Scale shape: inputs are already top-k lists (bounded), so the union
    is tiny regardless of corpus size; the per-system rank window
    partitions on the system label over ≤ k rows each. All heavy lifting
    stays in the upstream retrieval plans."""
    from functools import reduce

    labeled = [
        df.select(
            F.lit(name).alias("system"),
            F.col("doc_id"),
            F.col("score").cast("double").alias("score"),
        )
        for name, df in systems.items()
    ]
    u = reduce(DataFrame.unionByName, labeled)
    w = Window.partitionBy("system").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = u.withColumn("rank", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_systems"),
            F.round(F.sum(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))), 6).alias(
                "rrf_score"
            ),
            F.min("rank").cast("bigint").alias("best_rank"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(top)
    )


def positional_postings(
    docs: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional inverted index: one ``(id, term, pos)`` row per token
    occurrence (0-based position in the token stream) — the posting
    format phrase and proximity queries need. Pure posexplode: the index
    is corpus-token-sized, built in one scan with no shuffle; writers
    should partition/bucket it by term for the query path."""
    return docs.select(
        F.col(id_col), F.posexplode(tokens_col).alias("pos", "term")
    ).filter(F.length("term") > 0)


def phrase_match_counts(
    docs: DataFrame,
    phrases: list[list[str]],
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over the positional index: for each phrase
    (a token sequence), count its occurrences per document by chaining
    position equi-joins — term_i at ``pos`` matches term_{i+1} at
    ``pos + 1`` (the classic positional-postings AND-merge, e.g.
    Manning et al., IIR §2.4.2). Returns ``(id, phrase, n_hits)`` for
    phrases with at least one hit.

    Scale shape: each join leg filters postings to ONE term before
    joining (predicate pushdown to the scan), so per-phrase work is
    bounded by the rarest term's postings, never the corpus; joins are
    equi-joins on ``(id, pos)``. Phrases are a driver-side list (a query
    workload, not data)."""
    postings = positional_postings(docs, tokens_col, id_col).persist()
    try:
        outs = []
        for phrase in phrases:
            if not phrase:
                continue
            cur = postings.filter(F.col("term") == phrase[0]).select(
                F.col(id_col), F.col("pos")
            )
            for i, term in enumerate(phrase[1:], start=1):
                nxt = postings.filter(F.col("term") == term).select(
                    F.col(id_col).alias("_id2"),
                    (F.col("pos") - i).alias("_p2"),
                )
                cur = cur.join(
                    nxt,
                    (F.col(id_col) == F.col("_id2"))
                    & (F.col("pos") == F.col("_p2")),
                ).select(F.col(id_col), F.col("pos"))
            outs.append(
                cur.groupBy(id_col).agg(
                    F.count(F.lit(1)).alias("n_hits")
                ).select(
                    F.col(id_col),
                    F.lit(" ".join(phrase)).alias("phrase"),
                    "n_hits",
                )
            )
        if not outs:
            # derive the id field's type from the input so the empty
            # schema agrees with the non-empty path for string doc ids
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            return docs.sparkSession.createDataFrame(
                [],
                StructType(
                    [
                        StructField(
                            id_col, docs.schema[id_col].dataType, True
                        ),
                        StructField("phrase", StringType(), True),
                        StructField("n_hits", LongType(), True),
                    ]
                ),
            )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        # materialize before releasing the shared postings cache
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        postings.unpersist()
