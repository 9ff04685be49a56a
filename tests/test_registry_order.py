"""The external driver verifies registry entries front-to-back within
a per-round budget (~50). The front block is therefore a deliberate,
rotated choice (the explicit ROUND6_FRONT reorder in queries.py) — and
a new @query appended anywhere can no longer silently land inside the
window, but a front-block edit still must be deliberate. This test
pins the current front-50: when rotating (or deliberately front-
loading a new query), update this list in the same commit and say so.
"""

from __future__ import annotations

from dso_import_spark.queries import REGISTRY, ROUND6_FRONT, ROUND7_QUEUE

FRONT_50 = [
    # ALL nine never-verified queries first: the fourth mlops batch
    # (staged at the old ROUND6_QUEUE head in r5), the round-6
    # banded-containment scale composition (VERDICT r5 weak-item fix),
    # the round-6 mlops2 batch, and the banding estimator cert
    "ridge_regression_normal_eq", "dp_sensitivity_audit",
    "selectivity_estimate_cert", "shingle_containment_banded",
    "calibration_ece_bins", "js_divergence_sources",
    "pmi_collocations", "purged_timeseries_cv",
    "banding_estimator_cert",
    # stale backlog in staged priority order: text-only re-staled pair
    "json_extract_events", "dq_expectations_report",
    # windows module
    "window_topk_per_group", "running_sum", "lag_lead_delta",
    "sessionize_events", "tumbling_hour_window", "asof_join_last_signup",
    "ntile_rank_analytics", "rolling_hour_stats", "group_exact_percentiles",
    "revenue_share_window",
    # tpch_rest module (hint-drop-touched: physical plans changed)
    "q14_promo_revenue", "q16_supplier_part_counts", "q22_idle_customers",
    "q10_returned_items", "q11_important_balances",
    "q12_late_shipment_priority", "q13_customer_order_distribution",
    # core module (hint-drop-touched)
    "q01_pricing_summary", "q03_top_revenue_orders", "q06_forecast_revenue",
    "conditional_agg_pivot", "distinct_agg", "semi_join_big_spenders",
    "anti_join_no_orders", "rollup_lineitem", "cube_orders",
    "pivot_returnflag", "percentile_quantity", "range_join_price_bands",
    "string_math_funcs", "q04_order_priority", "q18_large_orders",
    # remaining staleys in registry order
    "asof_tolerance_cogroup",
    "ann_brute_force_topk", "ann_ivf_topk", "ann_lsh_topk",
    "embedding_near_dup_lsh", "embedding_near_dup", "ivf_kmeans_train",
]


def test_driver_front_block_is_deliberate():
    assert list(REGISTRY)[:50] == FRONT_50
    assert ROUND6_FRONT == FRONT_50


def test_front_covers_every_never_verified_query():
    # the r4 verdict's headline process bug: never-verified queries
    # sitting past the driver budget. Every one of them must be in
    # the front block, or — when the front is already full — form the
    # exact HEAD of the staged queue, so surplus budget (or the next
    # rotation) reaches them before any already-green query.
    from dso_import_spark.queries import FRONT_CHOSEN_AGAINST_ROUND
    from dso_import_spark.rotation import green_queries

    green = green_queries(max_round=FRONT_CHOSEN_AGAINST_ROUND)
    never = [n for n in REGISTRY if n not in green]
    beyond = [n for n in never if n not in set(FRONT_50)]
    assert set(beyond) == set(ROUND7_QUEUE[: len(beyond)]), beyond


def test_round7_queue_is_staged():
    # every queued name is real, and none is already in the front block
    assert set(ROUND7_QUEUE) <= set(REGISTRY)
    assert not set(ROUND7_QUEUE) & set(FRONT_50)
    # the staged surplus sits directly behind the front block so extra
    # driver budget lands on it, never on random import order
    assert list(REGISTRY)[50:50 + len(ROUND7_QUEUE)] == ROUND7_QUEUE
    # front + queue covers the whole stale backlog: together with the
    # front's never-verified coverage, registry order is fully pinned
    from dso_import_spark.rotation import stale_green

    assert set(stale_green()) <= set(ROUND7_QUEUE) | set(FRONT_50)
