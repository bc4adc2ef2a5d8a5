"""Pre-driver correctness gate: run EVERY registered query against its
DuckDB oracle at sf0.001 with the same compare the driver applies."""

from __future__ import annotations

import pytest

from week5_datingnlp_big_data_spark.registry import ORACLE, QUERIES

from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, duck, ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_kmeans_pca_stable_across_reruns(spark, sf_dir):
    # Seeded estimators: the driver's rows-only check reruns per round, so
    # the outputs must be identical run to run.
    for name in (
        "embedding_kmeans_sizes", "embedding_pca_variance", "embedding_cluster_plot"
    ):
        a = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        b = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        assert a == b, name


def test_driver_window_holds_flagships():
    # The driver records at most 50 correctness rows in queries() order;
    # the flagship LLM-pipeline queries must sit inside that window and
    # every slot must carry an oracle (rows-only entries sort after).
    from week5_datingnlp_big_data_spark.registry import all_oracles, all_queries

    window = list(all_queries())[:50]
    oracles = all_oracles()
    assert all(n in oracles for n in window)
    for flagship in (
        "minhash_near_dups",
        # (winnow_dup_pairs / exact_dedup / user_event_lag /
        # q21_waiting_suppliers ceded their slots in round 5 to the
        # layout/sketch shape families; each is covered by an in-window
        # sibling — see registry.DEMOTED — and stays parity-gated below)
        # (embedding_near_dup_pairs ceded its slot in round 10 — the
        # hyperplane-signature machinery is driver-verified via
        # embedding_coverage_sample; the pairs form stays parity-gated)
        # (token_counts ceded its slot in round 10 — scan-count shape
        # carried by quality_scores + inference_batch_plan; quality_scores
        # itself ceded in round 6 to the gopher/c4/lm rows + the incoming
        # doc_script_stats scan-stat row)
        # (lang_id_confusion ceded its slot in round 8 to
        # nb_lang_confusion — the same confusion cells plus the
        # value-verified int64 train→predict path)
        "near_dup_components",
        # the TPC-H window spans every distinct shape, including the round-3
        # tail (Q2/Q9/Q11/Q21/Q22) and the four shapes round 2 left outside
        # (q9/q11 ceded their slots in round 10: q9's profit rollup shares
        # q8's join tree, q11's scalar-subquery HAVING is q15's shape;
        # q2/q20 ceded in round 6 — correlated-min is q15's extremum shape
        # over q8's join tree, semi-join family kept by q16/q18/q22)
        # (q16 ceded in round 8 — NOT-IN negation carried by q22's
        # anti-join + q18's join+group+HAVING)
        "q8_market_share", "q15_top_supplier",
        "q22_global_sales_opportunity",
        # round-3 training-data flagships (lm_quality_buckets ceded its
        # slot in round 7 to doc_kn_bigram_logprob — the richer
        # interpolated-KN form of the same LM-scoring family;
        # near_dup_keep_best ceded to the in-window line_dedup_rewrite
        # elect rule + near_dup_components machinery;
        # c4_line_filter_stats ceded to boilerplate_line_stats — the
        # same per-line HOF classification plus the jusText context rule)
        "gopher_quality_flags",
        "pii_redaction_stats",
        "bloom_dedup_incremental", "dsir_target_sample",
        # round-7 flagships (ngram_jaccard_near_dups ceded its slot in
        # round 7 to the banded/blocked near-dup rows already in-window:
        # minhash_near_dups + media_phash_near_dups)
        "exact_substr_spans", "line_dedup_rewrite", "media_phash_near_dups",
        # round-9 flagships (span_dedup_fractions ceded its slot to the
        # destructive line_dedup_rewrite form already in-window)
        # (part_copurchase_pairs ceded its slot in round 6 to
        # copurchase_triangles, which drives the same basket pair-support
        # core end to end plus the orientation/wedge/closure joins; the
        # lift/confidence enrichment stays parity-gated. vocab_typo_pairs
        # ceded to vocab_fuzzy_pairs — the d<=2 join's short path IS the
        # symmetric-delete blocking + levenshtein verify, plus the q-gram
        # count/prefix-filter path; frequency labeling stays parity-gated.
        # funnel_conversion ceded in round 7 to prep_cascade_funnel +
        # purchase_attribution; session_top_paths to session_concurrency's
        # sessionize + purchase_attribution's ordered sequences)
        # (vocab_fuzzy_pairs ceded in round 8 to behavior_signature_pairs
        # — the 2nd domain of the same Gravano/prefix machinery;
        # textrank_keywords to host_link_pagerank — the identical integer
        # PageRank recurrence with a closed-form edge oracle)
        # (copurchase_triangles ceded late round 8 to
        # redirect_chain_resolution — the graph family keeps
        # copurchase_core_numbers' oriented-edge machinery + the
        # host_link_pagerank/hits rows; green r6+r7 rows recorded)
        "session_concurrency",
        # round-10 flagships (coverage sampling, batch planning, PSI
        # drift; source_quality_report ceded in round 6 —
        # source_quality_drift is the same report + the drift dimension;
        # embedding_margin_pairs ceded in round 7 to the same
        # hyperplane-cell machinery in embedding_coverage_sample;
        # embedding_cosine_topk ceded to embedding_sign_hamming_topk —
        # identical broadcast brute-force + rank-window plan)
        # (embedding_coverage_sample ceded in round 8 to
        # embedding_sign_hamming_topk — the same hyperplane sign-cell
        # signature, packed)
        "inference_batch_plan", "source_quality_drift",
        # round-5 flagships (reshard_movement ceded in round 7 to
        # shard_compaction_plan + inference_batch_plan;
        # events_distinct_kmv_running to streaming_kmv_distinct_parity's
        # identical sketch merge + stateful twin; orders_price_percentiles
        # to events_daily_anomalies' quantile machinery)
        # (events_zorder_buckets ceded in round 8 to shard_compaction_plan
        # + inference_batch_plan — the storage-layout family's richer rows)
        "shard_compaction_plan",
        # round-6 flagships: the round-5 families' first driver rows
        # (doc_script_stats ceded in round 8 to charset_mismatch_stats —
        # the same byte/script scan classification + declared-vs-actual)
        # (purchase_attribution ceded late round 8 to
        # host_doc_cap_sample — ordered-event credit carried by
        # session_concurrency's sessionize + user_state_cdc_merge's
        # argmax election; green r6+r7 rows recorded)
        "events_daily_anomalies", "streaming_kmv_distinct_parity",
        "shuffle_skew_profile",
        # round-7 flagships: the round-6 families' first driver rows
        # (quality_aes_sample ceded late round 8 to anchor_term_topk —
        # md5-priority weighted sampling carried by dsir_target_sample's
        # identical TakeOrdered cut; green r7 row recorded,
        # perf-exonerated r8)
        "doc_kn_bigram_logprob", "copurchase_core_numbers",
        "embedding_sign_hamming_topk",
        "user_state_cdc_merge", "behavior_signature_pairs",
        "media_png_decode_stats",
        # round-7 new surface: URL/host crawl hygiene (url_canonical_dedup
        # ceded in round 8 to host_quality_rollup — which embeds the same
        # election — + url_frontier_schedule; boilerplate_line_stats to
        # main_content_extract — same classification, destructive rewrite
        # rides the hash)
        "host_quality_rollup",
        # round-7: the unigram E-step's hash-equal row
        "unigram_char_em_counts",
        # round-8 flagships: the round-7 families' first driver rows +
        # the charset and host-link-graph surface
        "url_frontier_schedule", "main_content_extract",
        "nb_lang_predictions", "nb_lang_confusion",
        "hashed_features_dfm", "phrase_search_counts",
        "charset_mismatch_stats", "mojibake_repair_rewrite",
        "host_link_pagerank",
        # late round 8: the crawl-loop closers (slots freed by
        # copurchase_triangles / quality_aes_sample /
        # purchase_attribution above)
        "redirect_chain_resolution", "anchor_term_topk",
        "host_doc_cap_sample",
    ):
        assert flagship in window, f"{flagship} fell out of the driver window"
