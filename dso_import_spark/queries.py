"""Named query registry: every operator exposed to the driver harness.

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DF``
with an equivalent DuckDB ``oracle`` SQL string (or None for
non-SQL-expressible operators, which get a weaker rows-only check).

Determinism rules (the driver hash-compares values order-insensitively
but exactly):
- alias every computed column identically on both sides;
- ROUND floating aggregates to a fixed scale on both sides (double
  summation order differs between Spark partitions and DuckDB);
- cast timestamps to DATE or strings where the value is date-like;
- break ties deterministically (min/row_number with full ORDER BY).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL over pre-registered fixture views
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


# Importing the modules below populates REGISTRY via the decorator;
# the explicit ROUND3_FRONT reorder below then pins the driver-facing
# front block exactly (the external harness verifies registry entries
# front-to-back with a ~50/round budget, so the front block is a
# deliberate, rotated choice — see dso_import_spark/rotation.py).
from dso_import_spark.queries_pkg import (  # noqa: E402,F401
    ref_semantics,
    windows,
    similarity,
    text,
    multimodal,
    scale,
    streaming_queries,
    tpch_rest,
    wkt_scan,
    modern_sql,
    cleaning,
    core,
    dedup,
    extras,
    layout,
    llm_pipeline,
    advanced,
    corpus_quality,
    curation,
    analytics,
)

# ROUND 3 FRONT BLOCK (applied): exactly 50 queries that have never had
# a green driver correctness row, chosen per the round-2 rotation plan:
# the two ex-red fixes first, the 15 remaining TPC-H queries, the
# custom Python DataSource scan, modern-SQL trio, the two most
# failure-prone streaming features (watermark-closed LOJ padding and
# exactly-once tail-source offsets), the two round-3-fixed weak
# operators, then the head of `advanced`.
ROUND3_FRONT = [
    # ex-red: json oracle cast fixed r2 (core.py), LSH oracle added r2
    "json_extract_events", "dedup_minhash_lsh",
    # TPC-H remainder
    "q02_min_cost_supplier", "q07_volume_shipping", "q08_market_share",
    "q09_product_type_profit", "q10_returned_items", "q11_important_balances",
    "q12_late_shipment_priority", "q13_customer_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_counts",
    "q19_disjunctive_revenue", "q20_part_promotion_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
    # splittable custom Python DataSource
    "wkt_file_scan",
    # modern SQL (Spark 4): collation, recursive CTE, listagg
    "collated_dedup_groups", "recursive_cte_chain", "listagg_order_sequences",
    # streaming certs
    "stream_interval_left_outer", "stream_tail_ingest",
    # round-3 weak-op fixes (max-df cap / ANN candidate path)
    "sparse_tfidf_topk", "hard_negative_mining",
    # advanced head
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

# Highest CORRECTNESS_r{N} round the front block above was chosen
# against: queries green in rounds <= this were deliberately excluded.
# Bump when rotating (tests/test_rotation.py checks the choice against
# exactly these rounds, so a *new* round's results landing mid-cycle
# doesn't retroactively red the suite).
FRONT_CHOSEN_AGAINST_ROUND = 2

# ROUND 4 QUEUE (pre-staged): the never-verified remainder after round
# 3 lands, in intended order — promote to the front block next round.
# Ends with the four operators ADDED in round 3 (corpus_quality ×3 and
# the FULL OUTER streaming join); ~10 spare round-4 slots go to
# `stale_green` re-verifies (python -m dso_import_spark.rotation).
ROUND4_QUEUE = [
    # llm_pipeline
    "lm_bigram_quality", "source_overlap_matrix", "quality_classifier_score",
    "priority_sample_topk", "dsir_importance_scores",
    "diversity_distinct_ngrams",
    # extras remainder
    "dedup_cluster_canonical", "cms_frequency_estimate",
    "bpe_regex_token_count", "vocab_oov_rates", "temperature_mix_weights",
    "ann_pq_topk", "ann_ivf_pq_topk", "hopping_window_counts",
    "stream_hopping_hour", "stream_static_enrich", "funnel_conversion",
    "gapfill_locf_hourly", "semdedup_prune", "cohort_retention",
    "sliding_distinct_users", "activity_streaks", "mode_event_type",
    "value_outliers_mad",
    # advanced tail
    "did_difference_in_differences", "srm_sample_ratio_check",
    "winsorized_variant_means", "spatial_knn_radius", "weekly_growth_rates",
    "arrival_anomaly_days", "funnel_time_to_convert", "abc_pareto_classes",
    "event_transition_matrix", "rendezvous_sharding",
    "session_duration_stats", "daily_retention_d1_d7",
    # added in round 3, never driver-checked
    "boilerplate_ngram_mass", "bpe_pair_merge_counts",
    "length_quantile_filter", "stream_interval_full_outer",
    # round-3 second batch (curation / certification / layout)
    "char_entropy_quality", "gopher_quality_gate", "ngram_novelty_decay",
    "word_zipf_slope", "embedding_dim_stats", "embedding_quantize_int8",
    "ann_recall_report", "schema_evolution_scan", "partition_overwrite_merge",
    "k_anonymity_audit", "join_key_skew_profile", "cdc_apply_changes",
    "rfm_segmentation", "bitmap_exact_distinct",
    "seasonal_baseline_residuals", "multimodal_wav_decode",
    "wkt_write_roundtrip", "stream_session_dynamic_gap",
    "embedding_covariance", "decimal_money_totals",
]


def _apply_front_block(front: list[str], then: list[str] = ()) -> None:
    """Reorder REGISTRY in place: `front` first, then `then` (the
    staged next-round queue — if the driver's per-round budget ever
    exceeds the front block, the surplus lands on never-verified
    queries instead of already-green ones), rest in import order."""
    missing = [n for n in [*front, *then] if n not in REGISTRY]
    if missing:  # fail loudly — a typo here silently wastes driver slots
        raise KeyError(f"front-block names not in registry: {missing}")
    head = [*front, *(n for n in then if n not in set(front))]
    chosen = set(head)
    reordered = {n: REGISTRY[n] for n in head}
    reordered.update((n, s) for n, s in REGISTRY.items() if n not in chosen)
    REGISTRY.clear()
    REGISTRY.update(reordered)


_apply_front_block(ROUND3_FRONT, ROUND4_QUEUE)
