"""The external driver verifies registry entries front-to-back within
a per-round budget (~50). The front block is therefore a deliberate,
rotated choice (the explicit ROUND3_FRONT reorder in queries.py) — and
a new @query appended anywhere can no longer silently land inside the
window, but a front-block edit still must be deliberate. This test
pins the current front-50: when rotating (or deliberately front-
loading a new query), update this list in the same commit and say so.
"""

from __future__ import annotations

from dso_import_spark.queries import REGISTRY, ROUND3_FRONT, ROUND4_QUEUE

FRONT_50 = [
    "json_extract_events", "dedup_minhash_lsh",
    "q02_min_cost_supplier", "q07_volume_shipping", "q08_market_share",
    "q09_product_type_profit", "q10_returned_items", "q11_important_balances",
    "q12_late_shipment_priority", "q13_customer_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_counts",
    "q19_disjunctive_revenue", "q20_part_promotion_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    "wkt_file_scan",
    "collated_dedup_groups", "recursive_cte_chain", "listagg_order_sequences",
    "stream_interval_left_outer", "stream_tail_ingest",
    "sparse_tfidf_topk", "hard_negative_mining",
    "bloom_join_prune", "basket_pair_affinity", "record_linkage_fuzzy",
    "pagerank_shipments", "incremental_agg_refresh", "feature_scale_normalize",
    "notin_null_semantics", "ewma_fixed_lags", "drift_psi_periods",
    "benford_first_digit", "triangle_count_parts", "dedup_prefix_filter_pairs",
    "capped_running_balance", "incremental_distinct_sketch",
    "attribution_first_last_touch", "exact_quota_sample", "twap_time_weighted",
    "ohlc_hourly_bars", "table_content_checksum", "event_path_trigrams",
    "ab_test_welch_t", "revenue_gini", "dq_expectations_report",
    "drift_ks_statistic", "cuped_variance_reduction",
]


def test_driver_front_block_is_deliberate():
    assert list(REGISTRY)[:50] == FRONT_50
    assert ROUND3_FRONT == FRONT_50


def test_round4_queue_is_staged():
    # every queued name is real, and none is already in the front block
    assert set(ROUND4_QUEUE) <= set(REGISTRY)
    assert not set(ROUND4_QUEUE) & set(FRONT_50)
