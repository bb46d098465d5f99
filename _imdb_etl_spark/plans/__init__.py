"""Query library.

`registry` collects every declared query as a (spark builder, oracle SQL)
pair; importing the submodules populates it.
"""

from _imdb_etl_spark.plans.registry import REGISTRY, QuerySpec, register

# populate the registry
from _imdb_etl_spark.plans import tpch  # noqa: E402,F401
from _imdb_etl_spark.plans import tpch2  # noqa: E402,F401
from _imdb_etl_spark.plans import tpch3  # noqa: E402,F401
from _imdb_etl_spark.plans import tpch4  # noqa: E402,F401
from _imdb_etl_spark.plans import grafs  # noqa: E402,F401
from _imdb_etl_spark.plans import relational  # noqa: E402,F401
from _imdb_etl_spark.plans import events  # noqa: E402,F401
from _imdb_etl_spark.plans import advanced  # noqa: E402,F401
from _imdb_etl_spark.plans import scale  # noqa: E402,F401
from _imdb_etl_spark.plans import scalar  # noqa: E402,F401
from _imdb_etl_spark.plans import parity  # noqa: E402,F401
from _imdb_etl_spark.plans import audit  # noqa: E402,F401
from _imdb_etl_spark.operators import text  # noqa: E402,F401
from _imdb_etl_spark.operators import dedup  # noqa: E402,F401
from _imdb_etl_spark.operators import similarity  # noqa: E402,F401
from _imdb_etl_spark.operators import multimodal  # noqa: E402,F401
from _imdb_etl_spark.operators import pipeline  # noqa: E402,F401
from _imdb_etl_spark.operators import corpus  # noqa: E402,F401
from _imdb_etl_spark.operators import webcorpus  # noqa: E402,F401
from _imdb_etl_spark.operators import semantic  # noqa: E402,F401
from _imdb_etl_spark.operators import retrieval  # noqa: E402,F401
from _imdb_etl_spark.sources import pysource  # noqa: E402,F401
from _imdb_etl_spark.sources import jsonl  # noqa: E402,F401
from _imdb_etl_spark.sources import xml  # noqa: E402,F401
from _imdb_etl_spark.sources import orc  # noqa: E402,F401
from _imdb_etl_spark.sources import partitioned  # noqa: E402,F401
from _imdb_etl_spark.operators import quality  # noqa: E402,F401
from _imdb_etl_spark.operators import evaluation  # noqa: E402,F401
from _imdb_etl_spark import streaming  # noqa: E402,F401

# Gate priority: the driver's correctness gate evaluates queries in
# registry insertion order and records only the first GATE_WINDOW_SIZE
# per round. GATE_WINDOW is the intended per-round window — EXACTLY the
# prefix the driver will record, enforced <= GATE_WINDOW_SIZE by
# tests/test_plans.py (round 4 listed 52 names ahead of the cut and
# silently lost the last two).
#
GATE_WINDOW_SIZE = 50
# ROTATION RECIPE (round 9+): replace GATE_WINDOW with the first 50
# names of _GATE_REST (tools/ledger.py prints any no-driver-row names
# — after round 8 there should be NONE, so future windows are pure
# refresh/re-gate rotations: oldest rows first, plus any
# implementation that changed since its last row), append the retired
# window to the BACK of _GATE_REST, replay the new window at sf0.01
# (tools/check.py) before committing.
#
# Round 8 window (rotation per the round-7 verdict task 1, applied at
# round start): the first 50 of the round-7 _GATE_REST verbatim, with
# ONE substitution the round-7 verdict itself prescribed (task 4):
# dedup_embedding_ivf — demoted this round to the pytest verifier
# behind its output-identical GEMM twin (operators/similarity.py, the
# round-6 precedent; it was the registry's only sf1 watchdog cap-out
# at 434 s) — yields its slot to dedup_winnow_clusters, the newly
# implemented cluster-level production face of winnowing dedup
# (round-7 verdict task 3). Composition: the 45 never-gated names
# from tools/ledger.py (44 carried + dedup_winnow_clusters new), the
# 3 policy re-gates (sim_knn_ivfpq helper refactor,
# tokenizer_bpe_train_n checkpoint-namespace fix, dedup_winnow_pairs
# edge-helper refactor — this round''s corpus.py/text.py changes touch
# the last two, so their fresh rows certify the final code), and 2
# refresh slots (vocab_oov_rate, fact_star_left_joins). All 50
# replayed green locally at sf0.001 + sf0.01 before commit. After
# this round EVERY registered query has a driver row: the
# never-gated ledger is closed.
GATE_WINDOW = [
    "multimodal_audio_pitch",
    "events_ewma_burst",
    "corpus_ccnet_buckets",
    "retrieval_hard_negatives",
    "neardup_kcore",
    "source_schema_evolution",
    "runtime_bloom_filter_join",
    "sim_knn_binary_rerank",
    "aqe_skew_join_events",
    "dq_observe_metrics",
    "corpus_span_corruption",
    "events_new_vs_returning",
    "corpus_batch_padding_plan",
    "text_hashing_vectorizer",
    "tokenizer_vocab_coverage_ladder",
    "dedup_minhash_index_persisted",
    "privacy_pseudonymize_users",
    "sql_identifier_binding",
    "features_user_daily",
    "reco_negative_sampling",
    "features_target_encoding",
    "sql_session_variable",
    "features_psi_drift",
    "embedding_silhouette_simplified",
    "events_forecast_backtest",
    "text_winnowing_fingerprints",
    "scalar_try_suite",
    "dedup_winnow_pairs",
    "corpus_canary_scan",
    "corpus_datasheet",
    "sketch_distinct_kmv_setops",
    "events_attribution_last_touch",
    "privacy_k_anonymity_audit",
    "scalar_map_suite",
    "distinct_users_bitmap_exact",
    "streaming_foreachbatch_upsert",
    "sink_dynamic_partition_backfill",
    "events_attribution_linear",
    "sim_knn_ivfpq_refined",
    "sim_knn_ivfpq",
    "dedup_winnow_clusters",
    "dedup_jaccard_prefix_persisted",
    "dedup_jaccard_prefix_incremental",
    "corpus_canary_scan_many",
    "dedup_lsh_recall_audit",
    "tokenizer_bpe_train_batched",
    "fuzzy_part_name_groups",
    "tokenizer_bpe_train_n",
    "vocab_oov_rate",
    "fact_star_left_joins",
]
# everything below keeps per-round local coverage (tools/check.py +
# pytest); ordering = round-9 rotation priority. With the never-gated
# ledger closed, the queue is pure refresh order: oldest driver rows
# first (the r1-r5 era spillover), then the retired round-6 window
# (r6 rows), then the retired round-7 window (r7 rows, newest
# evidence) at the back.
_GATE_REST = [
    "merge_scd2_customer_history",
    "approx_quantiles_price",
    "approx_distinct_users",
    "sim_knn_ivf_trained",
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "corpus_balanced_sample",
    "streaming_join_view_purchase",
    "grouped_agg_pandas_udaf",
    "sql_udf_revenue",
    "recursive_cte_amortization",
    "lateral_top_orders_per_customer",
    "pysink_roundtrip_docs",
    "embedding_quantize_int8",
    "xml_roundtrip_source",
    "sql_tvf_brand_stats",
    "scd2_point_in_time_join",
    "window_range_trailing_30d",
    "stringagg_top_customers_per_nation",
    "corpus_temperature_sample",
    "neardup_graph_stats",
    "decontaminate_embedding",
    "embedding_centroid_cohesion",
    "sim_knn_pq",
    "multimodal_phash_dedup",
    "events_funnel_analysis",
    "text_duplicate_spans",
    "pipeline_pretrain_mix",
    "zorder_events_locality",
    "split_leakage_audit",
    "events_retention_cohorts",
    "events_value_drift_daily",
    "corpus_token_budget_plan",
    "multimodal_audio_stats",
    "multimodal_shot_boundaries",
    "embedding_pca_top_component",
    "events_markov_transitions",
    "neardup_pagerank",
    "events_session_window_native",
    "decontaminate_bloom",
    "text_lang_id_confusion",
    "corpus_source_quality_profile",
    "dedup_cluster_size_histogram",
    "dedup_clusters",
    "corpus_domain_cap",
    "jsonl_roundtrip_source",
    "dedup_simhash",
    "sim_knn_lsh",
    "sim_knn_bruteforce",
    "events_hourly_rollup",
    "streaming_hourly_rollup",
    "pipeline_docs_prep",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "w1_top3_parts_per_brand",
    "graf4_top3_customers_top3_nations",
    "imdb_reference_parity",
    "dedup_jaccard_lsh",
    "dedup_containment_lsh",
    "dedup_embedding_cosine_ivf",
    "dedup_minhash_lsh",
    "streaming_corpus_ingest",
    "dedup_semantic_clusters",
    "dedup_threshold_sweep",
    "text_bm25_search",
    "text_bigram_lm_score",
    "dedup_keep_best",
    "events_anomaly_mad",
    "sql_pipe_revenue",
    "sketch_heavy_users_cms",
    "orc_roundtrip_source",
    "dedup_cdc_chunks",
    "text_tfidf_keywords",
    "corpus_chars_tokens_regression",
    "events_rollup_incremental",
    "sim_knn_ivf_persisted",
    "events_sliding_distinct_hll",
    "events_welch_ttest",
    "corpus_ngram_novelty",
    "corpus_entropy_profile",
    "events_cusum_changepoint",
    "tokenizer_bpe_first_merges",
    "text_embed_batch_inference",
    "events_conversion_latency",
    "quality_logreg_scorecard",
    "quality_score_auc",
    "quality_pr_curve",
    "retrieval_hybrid_rrf",
    "shuffle_skew_profile",
    "corpus_upsample_epochs",
    "corpus_epoch_shuffle",
    "split_temporal_embargo",
    "tokenizer_bpe_apply_merge",
    "basket_part_affinity",
    "events_funnel_time_bound",
    "sim_recall_curve",
    "scalar_timestamp_suite",
    "text_lm_heldout_perplexity",
    "sql_parameterized_revenue",
    "sql_group_by_all_revenue",
    "udtf_polymorphic_first_tokens",
    "pysource_pushdown_range",
    "grouped_arrow_user_stats",
    "setop_except_all_views",
    "setop_intersect_all_views",
    "tokenizer_bpe_encode",
    "fuzzy_part_name_match",
    "dedup_incremental_minhash",
    "cube_orders_status_year",
    "median_exact_price_per_brand",
    "audit_referential_integrity",
    "profile_table_orders",
    "dedup_jaccard_prefix",
    "text_cooccurrence_pmi",
    "events_gapfill_interpolate",
    "corpus_weighted_reservoir",
    "bucketed_join_orders_lineitem",
    "events_mannwhitney_u",
    "audit_benford_totalprice",
    "customers_rfm_segments",
    "customers_gini_spend",
    "orders_spearman_price_items",
    "corpus_js_divergence",
    "events_seasonal_anomaly",
    "parts_abc_classification",
    "embedding_matryoshka_recall",
    "orders_cohort_ltv",
    "events_ab_srm_check",
    "orders_mom_yoy_growth",
    "events_dau_wau_mau",
    "events_attribution_first_touch",
    "scalar_bitwise_suite",
    "events_bot_regularity",
    "neardup_rate_by_source",
    "embedding_outlier_mahalanobis",
    "privacy_dp_noisy_counts",
    "events_ks_two_sample",
    "events_attribution_time_decay",
    "lineitem_weighted_median_price",
    "supplier_hhi_by_nation",
    "vocab_zipf_slope",
    "events_decompose_additive",
    "events_acf_lag1",
    "corpus_dsir_importance",
    "dedup_soft_weights",
    "shipping_lag_percentiles",
    "events_survival_km",
    "events_ab_conversion_ztest",
    "customers_tier_migration",
    "events_interval_coalesce",
    "events_sequence_pattern",
    "quality_calibration_bins",
    "multimodal_audio_segments",
    "text_remove_duplicate_spans",
    "neardup_clustering_coefficient",
]
_GATE_ORDER = GATE_WINDOW + _GATE_REST


def apply_gate_order() -> None:
    """Reorder REGISTRY in place to gate-priority order (idempotent).

    Runs once at import, but consumers of the ORDER (the driver
    contract in __spark_entry__.py, the gate-window test) re-apply it:
    if an operator module is imported before this package, the
    circular import back into the partially-initialized package means
    that module's queries register only AFTER the import-time reorder
    ran, leaving them appended at the end — silently outside the
    driver's recording window. Re-applying at consumption time makes
    the order correct under any import order.
    """
    ordered = {n: REGISTRY[n] for n in _GATE_ORDER if n in REGISTRY}
    for n, spec in list(REGISTRY.items()):
        ordered.setdefault(n, spec)
    REGISTRY.clear()
    REGISTRY.update(ordered)


apply_gate_order()

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "register",
    "GATE_WINDOW",
    "GATE_WINDOW_SIZE",
    "apply_gate_order",
]
