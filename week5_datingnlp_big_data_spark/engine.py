"""User-facing facade: one object exposing the engine's surfaces.

A reference user's workflow (load corpus → clean/tokenize → DFM → TF-IDF →
classify → word analysis) maps onto one `Engine` instance; the extension
surfaces (dedup, similarity, quality, relational queries by name) hang off
the same object. Everything returns lazy DataFrames unless stated.

    from week5_datingnlp_big_data_spark.engine import Engine
    eng = Engine.local()
    docs = eng.table("documents")
    top = eng.query("wordcount_top100")
    r = eng.classify_profiles(profiles_df)         # EP-1
    clean = eng.prepare_training_corpus(docs)      # dedup/quality cascade
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from week5_datingnlp_big_data_spark import registry
from week5_datingnlp_big_data_spark.operators import corpus as _corpus
from week5_datingnlp_big_data_spark.operators import dedup as _dedup
from week5_datingnlp_big_data_spark.operators import dfm as _dfm
from week5_datingnlp_big_data_spark.operators import similarity as _similarity
from week5_datingnlp_big_data_spark.operators import textstats as _textstats
from week5_datingnlp_big_data_spark.operators import tfidf as _tfidf
from week5_datingnlp_big_data_spark.plans import datapipe as _datapipe
from week5_datingnlp_big_data_spark.plans import pipelines as _pipelines
from week5_datingnlp_big_data_spark.session import get_spark
from week5_datingnlp_big_data_spark.sources.catalog import (
    DEFAULT_SF_DIR,
    load_table,
    read_profiles_csv,
    register_views,
)


class Engine:
    """Facade over the operator library, bound to a session + data root."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir

    @classmethod
    def local(cls, sf_dir: str = DEFAULT_SF_DIR, **spark_kwargs) -> "Engine":
        return cls(get_spark(**spark_kwargs), sf_dir)

    # -- sources ----------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        register_views(self.spark, self.sf_dir)

    def read_profiles_csv(self, path: str) -> DataFrame:
        return read_profiles_csv(self.spark, path)

    # -- named queries (the driver-contract registry) ---------------------
    def query(self, name: str) -> DataFrame:
        return registry.QUERIES[name](self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        return sorted(registry.QUERIES)

    # -- reference pipelines ---------------------------------------------
    def tokenize_corpus(self, docs: DataFrame, **kw) -> DataFrame:
        return _corpus.tokenize_corpus(docs, **kw)

    def doc_term_counts(self, tokenized: DataFrame) -> DataFrame:
        return _dfm.doc_term_counts(tokenized)

    def tf_idf(self, counts: DataFrame, **kw) -> DataFrame:
        return _tfidf.tf_idf(counts, **kw)

    def classify_profiles(self, profiles: DataFrame, **kw):
        """EP-1 end to end; returns the pipelines.EP1Result bundle."""
        return _pipelines.ep1_classification(profiles, **kw)

    def word_analysis(self, profiles: DataFrame, **kw):
        """EP-3: per-sex rankings + distinctive-word setdiffs."""
        return _pipelines.ep3_word_analysis(profiles, **kw)

    # -- training-data extension -----------------------------------------
    def prepare_training_corpus(self, docs: DataFrame, **kw):
        return _datapipe.prepare_corpus(docs, **kw)

    def exact_dedup(self, docs: DataFrame, **kw) -> DataFrame:
        return _dedup.exact_dedup(docs, **kw)

    def near_dups(self, docs: DataFrame, **kw) -> DataFrame:
        return _dedup.jaccard_near_dups(docs, **kw)

    def cosine_topk(self, embeddings: DataFrame, query_ids: list[int], **kw) -> DataFrame:
        return _similarity.cosine_topk(embeddings, query_ids, **kw)

    def quality_scores(self, docs: DataFrame, **kw) -> DataFrame:
        return _textstats.quality_score(docs, **kw)

    def repetition_scores(self, docs: DataFrame, **kw) -> DataFrame:
        """Gopher-style within-doc repetition signals (quality filter)."""
        return _textstats.repetition_scores(docs, **kw)

    def decontaminate(self, docs: DataFrame, benchmark: DataFrame, **kw) -> DataFrame:
        """Flag docs sharing word n-grams with a held-out benchmark set."""
        return _dedup.ngram_overlap_flags(docs, benchmark, **kw)

    def chunk(self, docs: DataFrame, **kw) -> DataFrame:
        """Context-window packing: sliding token windows with overlap."""
        return _corpus.chunk_documents(docs, **kw)

    def mixture_sample(self, docs: DataFrame, rates: dict, **kw) -> DataFrame:
        """Deterministic per-source sampling for training mixtures."""
        return _corpus.mixture_sample(docs, rates, **kw)

    def pack_sequences(self, chunks: DataFrame, **kw) -> DataFrame:
        """Concat-and-split packing of chunks into fixed token budgets."""
        return _corpus.pack_sequences(chunks, **kw)

    def token_budget_mixture(self, docs: DataFrame, budget_tokens: int, **kw) -> DataFrame:
        """Temperature-weighted deterministic sampling to a token budget."""
        return _corpus.token_budget_mixture(docs, budget_tokens, **kw)

    def pii_scrub(self, docs: DataFrame, **kw) -> DataFrame:
        """Per-doc PII counts + redacted text (email/IPv4/phone tags)."""
        return _textstats.pii_scrub(docs, **kw)

    def rarity_scores(self, docs: DataFrame, **kw) -> DataFrame:
        """CCNet-style mean negative unigram logprob per doc."""
        return _textstats.unigram_logprob_scores(docs, **kw)

    def bigram_scores(self, docs: DataFrame, **kw) -> DataFrame:
        """Bigram-LM conditional perplexity proxy per doc."""
        return _textstats.bigram_logprob_scores(docs, **kw)

    def distinct_sketches(self, docs: DataFrame, **kw) -> DataFrame:
        """Per-source HLL distinct estimates + merged '__all__' rollup."""
        from week5_datingnlp_big_data_spark.operators import sketches as _sketches

        return _sketches.source_distinct_hll(docs, **kw)

    def profile(self, df: DataFrame, **kw) -> DataFrame:
        """One-pass per-column profile: nulls, distincts, min/max."""
        from week5_datingnlp_big_data_spark.operators import sketches as _sketches

        return _sketches.profile_table(df, **kw)

    def compression_ratios(self, docs: DataFrame, **kw) -> DataFrame:
        """zlib compression-ratio redundancy signal per doc."""
        return _textstats.compression_ratios(docs, **kw)

    def semantic_dedup(self, embeddings: DataFrame, **kw) -> DataFrame:
        """SemDeDup: keep one exemplar per high-cosine embedding cluster."""
        return _similarity.semantic_dedup_keep(embeddings, **kw)

    def train_bpe(self, docs: DataFrame, **kw) -> list[tuple[str, str, int]]:
        """Learn a BPE merge table from the corpus (Sennrich et al.)."""
        from week5_datingnlp_big_data_spark.operators import bpe as _bpe

        return _bpe.bpe_train(docs, **kw)

    def bpe_tokenize(self, docs: DataFrame, merges, text_col: str = "text") -> DataFrame:
        """Segment text with a learned BPE merge table (Arrow-batched)."""
        from pyspark.sql import functions as F

        from week5_datingnlp_big_data_spark.operators import bpe as _bpe

        return docs.withColumn("bpe_tokens", _bpe.bpe_segment_udf(merges)(F.col(text_col)))

    def bloom_build(self, docs: DataFrame, **kw) -> DataFrame:
        """Mergeable Bloom filter over contents (packed-bit-word table)."""
        return _dedup.bloom_filter_build(docs, **kw)

    def bloom_probe(self, batch: DataFrame, bloom: DataFrame, **kw) -> DataFrame:
        """Probe new docs against a built filter: (id, maybe_seen)."""
        return _dedup.bloom_maybe_seen(batch, bloom, **kw)

    def dsir_weights(self, docs: DataFrame, target, **kw) -> DataFrame:
        """DSIR hashed-bigram importance weights vs a target slice."""
        return _corpus.dsir_importance_weights(docs, target, **kw)

    def dsir_select(self, docs: DataFrame, target, n_select: int, **kw) -> DataFrame:
        """Top-n documents by DSIR importance weight (deterministic cut)."""
        return _corpus.dsir_select(docs, target, n_select, **kw)

    def remove_duplicate_spans(self, docs: DataFrame, **kw) -> DataFrame:
        """C4-style destructive span dedup: rewrite docs without
        cross-document duplicated word spans."""
        return _dedup.remove_duplicate_spans(docs, **kw)

    def pq_topk(self, embeddings: DataFrame, query_ids: list[int], **kw) -> DataFrame:
        """Product-quantization ANN: ADC scan over PQ codes + exact re-rank."""
        return _similarity.pq_topk(embeddings, query_ids, **kw)

    def ivf_pq_topk(self, embeddings: DataFrame, query_ids: list[int], **kw) -> DataFrame:
        """IVF-PQ ANN: cell pruning + ADC code scan + exact re-rank."""
        return _similarity.ivf_pq_topk(embeddings, query_ids, **kw)

    def snapshot_diff(self, old: DataFrame, new: DataFrame, **kw) -> DataFrame:
        """Classify docs across two snapshots as added/removed/changed/
        unchanged by content hash (incremental crawl refresh)."""
        return _corpus.snapshot_diff(old, new, **kw)

    def soft_dedup_weights(self, docs: DataFrame, **kw) -> DataFrame:
        """Down-weight exact duplicates at 1/multiplicity instead of
        dropping them (SlimPajama-style soft dedup)."""
        return _dedup.soft_dedup_weights(docs, **kw)

    def source_overlap(self, docs: DataFrame, k: int = 256, **kw) -> DataFrame:
        """Pairwise vocabulary-overlap (Jaccard) estimates between sources
        from k-minimum-values sketches; full vocabularies never joined."""
        from pyspark.sql import functions as F

        from week5_datingnlp_big_data_spark.functions.text import tokenize
        from week5_datingnlp_big_data_spark.operators import sketches as _sketches
        from week5_datingnlp_big_data_spark.session import spread

        toks = spread(docs.filter(F.length("text") > 0)).select(
            "source", F.explode(tokenize(_corpus.clean_text("text"))).alias("key")
        )
        sk = _sketches.kmv_sketch(toks, key_col="key", group_col="source", k=k, **kw)
        return _sketches.kmv_group_overlap(sk, k=k)

    def normalize_documents(self, docs: DataFrame, **kw) -> DataFrame:
        """Unicode cleanup: NFC, CR/LF unification, control strip,
        whitespace collapse (Arrow-batched; run before hashing/dedup)."""
        return _textstats.normalize_documents(docs, **kw)

    def bm25_search(self, counts: DataFrame, query_terms: list, **kw) -> DataFrame:
        """Okapi BM25 top-k documents for a bag-of-words query over the
        long-form DFM (inverted-index plan; see operators/ir.py)."""
        from week5_datingnlp_big_data_spark.operators import ir as _ir

        return _ir.bm25_topk(counts, query_terms, **kw)

    def quality_ensemble(self, docs: DataFrame, **kw) -> DataFrame:
        """Blend heuristic quality, repetition, and LM-rarity percentile
        ranks into one decile-bucketed score (FineWeb-style)."""
        return _textstats.quality_ensemble(docs, **kw)

    def eval_sample(self, df: DataFrame, group_col: str, k: int, **kw) -> DataFrame:
        """Deterministic fixed-k per-group sample (eval-set carving)."""
        return _corpus.stratified_fixed_sample(df, group_col, k, **kw)

    def exact_substr_spans(self, docs: DataFrame, **kw) -> DataFrame:
        """ExactSubstr audit (Lee et al. 2021): maximal duplicated
        ≥min_len-word regions from stride-1 sliding grams."""
        return _dedup.exact_substr_spans(docs, **kw)

    def exact_substr_rewrite(self, docs: DataFrame, **kw) -> DataFrame:
        """Destructive ExactSubstr dedup: rewrite docs with every maximal
        duplicated region removed (suffix-array rule, relational plan)."""
        return _dedup.exact_substr_rewrite(docs, **kw)

    def leakage_safe_split(self, docs: DataFrame, **kw) -> DataFrame:
        """Near-dup-aware train/test split: hash the near-dup component,
        not the doc id, so no near-duplicate straddles the boundary."""
        return _dedup.leakage_safe_split(docs, **kw)

    def save_pq_index(self, path: str, codebooks: DataFrame, codes: DataFrame) -> None:
        """Persist a PQ ANN index (codebooks + codes) as parquet tables."""
        _similarity.save_pq_index(path, codebooks, codes)

    def load_pq_index(self, path: str):
        """Load a saved PQ index → (codebooks, codes) for pq_topk(index=...)."""
        return _similarity.load_pq_index(self.spark, path)

    def range_join(
        self, left: DataFrame, right: DataFrame, **kw
    ) -> DataFrame:
        """Point-in-interval range join via time-axis bucketization (the
        equi-join reduction; see relational.range_join_point_in_interval)."""
        from week5_datingnlp_big_data_spark.operators import relational as _rel

        return _rel.range_join_point_in_interval(left, right, **kw)

    def ingest_text(self, path: str, **kw) -> DataFrame:
        """Read a directory of .txt/.txt.gz files into the documents
        shape with deterministic position-hashed ids."""
        from week5_datingnlp_big_data_spark.sources import ingest as _ingest

        return _ingest.ingest_text_dir(self.spark, path, **kw)

    def ingest_jsonl(self, path: str, schema, **kw) -> DataFrame:
        """Read .jsonl/.jsonl.gz with an explicit schema; corrupt lines
        quarantined to a _corrupt column, never silently dropped."""
        from week5_datingnlp_big_data_spark.sources import ingest as _ingest

        return _ingest.ingest_jsonl_dir(self.spark, path, schema, **kw)

    def audit_plan(self, df: DataFrame, **kw) -> dict:
        """Structured physical-plan audit (cartesian/BNLJ hazards,
        exchange budget, pushdown/pruning, codegen coverage)."""
        from week5_datingnlp_big_data_spark.plans.audit import audit_plan as _audit

        return _audit(df, **kw)

    def prepare_training_corpus_v2(self, docs: DataFrame, **kw):
        """Round-7 cascade: Gopher rules → ExactSubstr span removal →
        min-surviving-length cut; returns the funnel + clean frame."""
        from week5_datingnlp_big_data_spark.plans import datapipe as _dp

        return _dp.prepare_corpus_v2(docs, **kw)

    def line_dedup(self, docs: DataFrame, **kw) -> DataFrame:
        """CCNet/SlimPajama line-level global dedup: duplicated
        normalized lines keep one canonical copy (keep-first)."""
        return _dedup.line_dedup_rewrite(docs, **kw)

    def cross_lm_scores(
        self, train_docs: DataFrame, score_docs: DataFrame, **kw
    ) -> DataFrame:
        """CCNet-style cross-corpus LM scoring: unigram LM fit on
        train_docs, score_docs scored with add-α OOV smoothing."""
        return _textstats.unigram_logprob_cross(train_docs, score_docs, **kw)

    def image_near_dups(self, media: DataFrame, **kw) -> DataFrame:
        """Perceptual image near-dup pairs: dHash fingerprints + Hamming
        pigeonhole blocking (use_real_codec=True for BMP/PPM decode)."""
        from week5_datingnlp_big_data_spark.operators import multimodal as _mm

        return _mm.image_near_dups(media, **kw)

    def hybrid_search(
        self, counts: DataFrame, query_terms: list, k: int = 20, **kw
    ) -> DataFrame:
        """Hybrid retrieval: BM25 ⊕ TF-IDF rankings fused by reciprocal
        rank fusion (rrf_k=60)."""
        from week5_datingnlp_big_data_spark.operators import ir as _ir

        counts = counts.persist()
        return _ir.rrf_fuse(
            {
                "bm25": _ir.bm25_topk(counts, query_terms, k=50, persist=False)
                .select("doc_id", "score"),
                "tfidf": _ir.tfidf_topk(counts, query_terms, k=50, persist=False)
                .select("doc_id", "score"),
            },
            top=k,
            **kw,
        )

    def coverage_sample(self, embeddings: DataFrame, **kw) -> DataFrame:
        """Coverage-balanced diversity sampling: cap every hyperplane-LSH
        cell's budget (density-flattening corpus pruning)."""
        return _similarity.coverage_sample(embeddings, **kw)

    def margin_mine(self, embeddings: DataFrame, **kw) -> DataFrame:
        """CCMatrix/LASER ratio-margin best-match mining between two
        labeled vector sets (Artetxe & Schwenk 2019)."""
        return _similarity.margin_mined_pairs(embeddings, **kw)

    def mmr_rerank(self, embeddings: DataFrame, query_id: int, **kw) -> DataFrame:
        """Maximal-marginal-relevance diversification of a dense-retrieval
        shortlist (Carbonell & Goldstein 1998)."""
        return _similarity.mmr_rerank(embeddings, query_id, **kw)

    def source_report(self, docs: DataFrame, **kw) -> DataFrame:
        """Per-source corpus health rollup: counts, token volume, mean
        quality, corpus-wide exact-dup rate."""
        from week5_datingnlp_big_data_spark.plans import datapipe as _dp

        return _dp.source_quality_report(docs, **kw)

    def bpe_fertility(self, docs: DataFrame, merges, **kw) -> DataFrame:
        """Tokenizer fertility per source (tokens/word, chars/token) from
        a trained BPE merge table."""
        from week5_datingnlp_big_data_spark.operators import bpe as _bpe

        return _bpe.bpe_fertility_stats(docs, merges, **kw)

    def batch_plan(self, docs: DataFrame, **kw) -> DataFrame:
        """Length-bucketed dynamic batching plan with per-batch
        padding-waste report (serving layout)."""
        from week5_datingnlp_big_data_spark.operators import shards as _shards

        return _shards.inference_batch_plan(docs, **kw)

    def sentence_chunks(self, docs: DataFrame, **kw) -> DataFrame:
        """Sentence-aware chunk packing to a word budget with sentence
        overlap (RAG splitter semantics; never splits a sentence)."""
        return _corpus.sentence_chunks(docs, **kw)

    def contrastive_triples(
        self, embeddings: DataFrame, anchor_ids: list[int], **kw
    ) -> DataFrame:
        """Anchor/positive/hard-negative triples for embedding-model
        training (SimCSE/E5 recipe, ANCE hard negatives)."""
        return _similarity.contrastive_triples(embeddings, anchor_ids, **kw)

    def source_drift(self, docs: DataFrame, **kw) -> DataFrame:
        """PSI drift cells per (source, quality decile) vs the rest of
        the corpus — the per-ingest-batch data-drift alarm."""
        from week5_datingnlp_big_data_spark.plans import datapipe as _dp

        return _dp.source_quality_drift(docs, **kw)

    def dup_cluster_sizes(self, docs: DataFrame, **kw) -> DataFrame:
        """Duplicate-cluster size histogram over the MinHash components
        (plus the singleton row) — the post-dedup mass summary."""
        from week5_datingnlp_big_data_spark.operators import dedup as _d

        return _d.dup_cluster_sizes(docs, **kw)

    def build_near_dup_index(self, docs: DataFrame, path: str | None = None,
                             **kw) -> DataFrame:
        """Corpus LSH band table — build once per snapshot, join every
        ingest batch against it (parquet-partitioned by band_idx when a
        path is given)."""
        from week5_datingnlp_big_data_spark.operators import dedup as _d

        return _d.build_near_dup_index(docs, path, **kw)

    def batch_novelty(self, base: DataFrame, batch: DataFrame, **kw) -> DataFrame:
        """Incremental ingest near-dedup: per-batch-doc count of base
        near-dups + the is_novel keep flag."""
        from week5_datingnlp_big_data_spark.operators import dedup as _d

        return _d.batch_novelty(base, batch, **kw)

    def register_media_codec(self, fmt: str, decode_fn) -> None:
        """Plug an external compressed-format decoder (PIL/libav style)
        into the multimodal decode path; see multimodal.register_codec."""
        from week5_datingnlp_big_data_spark.operators import multimodal as _mm

        _mm.register_codec(fmt, decode_fn)

    def compaction_plan(self, manifest: DataFrame, **kw) -> DataFrame:
        """Bin-pack a file manifest into target-size rewrite groups
        (lakehouse small-file compaction); see layout.compaction_plan."""
        from week5_datingnlp_big_data_spark.operators import layout as _l

        return _l.compaction_plan(manifest, **kw)

    def reshard_moves(self, df: DataFrame, id_col: str, n_old: int,
                      n_new: int, **kw) -> DataFrame:
        """Movement matrix for growing n_old → n_new shards under
        rendezvous vs mod hashing; see layout.reshard_moves."""
        from week5_datingnlp_big_data_spark.operators import layout as _l

        return _l.reshard_moves(df, id_col, n_old, n_new, **kw)

    def zorder_stats(self, df: DataFrame, x, y, **kw) -> DataFrame:
        """Z-order locality audit: per-bucket (x, y) bounding boxes of
        the Morton layout; see layout.zorder_bucket_stats."""
        from week5_datingnlp_big_data_spark.operators import layout as _l

        return _l.zorder_bucket_stats(df, x, y, **kw)

    def running_distinct(self, events: DataFrame, **kw) -> DataFrame:
        """Running distinct-key estimate per day from merged KMV
        sketches; see sketches.kmv_running_distinct."""
        from week5_datingnlp_big_data_spark.operators import sketches as _sk

        return _sk.kmv_running_distinct(events, **kw)

    def audio_near_dups(self, media: DataFrame, **kw) -> DataFrame:
        """Audio near-dup pairs from Goertzel spectral fingerprints
        through the Hamming pigeonhole join; see
        multimodal.audio_near_dups."""
        from week5_datingnlp_big_data_spark.operators import multimodal as _mm

        return _mm.audio_near_dups(media, **kw)

    def scene_changes(self, media: DataFrame, **kw) -> DataFrame:
        """Per-video scene-change stats from consecutive-frame luma
        diffs; see multimodal.scene_changes."""
        from week5_datingnlp_big_data_spark.operators import multimodal as _mm

        return _mm.scene_changes(media, **kw)

    def daily_anomalies(self, events: DataFrame, **kw) -> DataFrame:
        """Weekday-cohort median/MAD robust z-scores on daily volume;
        see relational.daily_count_anomalies."""
        from week5_datingnlp_big_data_spark.operators import relational as _r

        return _r.daily_count_anomalies(events, **kw)

    def session_paths(self, events: DataFrame, **kw) -> DataFrame:
        """Top-k session event-type paths (flow/Sankey source data); see
        relational.session_paths."""
        from week5_datingnlp_big_data_spark.operators import relational as _r

        return _r.session_paths(events, **kw)

    def script_stats(self, docs: DataFrame, **kw) -> DataFrame:
        """Per-doc Unicode-script composition (Latin/CJK/Cyrillic/digit);
        see textstats.script_stats."""
        from week5_datingnlp_big_data_spark.operators import textstats as _ts

        return _ts.script_stats(docs, **kw)

    def attribution(self, events: DataFrame, **kw) -> DataFrame:
        """Multi-touch conversion attribution (linear/first/last +
        unattributed, conservation-preserving); see
        relational.attribution_credits."""
        from week5_datingnlp_big_data_spark.operators import relational as _r

        return _r.attribution_credits(events, **kw)

    def register_bundled_jpeg_codec(self) -> None:
        """Plug the bundled pure-NumPy baseline grayscale JPEG decoder
        into the media codec seam; see
        multimodal.register_bundled_jpeg_codec."""
        from week5_datingnlp_big_data_spark.operators import multimodal as _mm

        _mm.register_bundled_jpeg_codec()
