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
# the explicit ROUND4_FRONT reorder below then pins the driver-facing
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
    placement,
    stats_ops,
    mlops,
)

# ROUND 4 FRONT BLOCK (applied): exactly 50 of the 60 queries that had
# never had a green driver correctness row after round 3 — the
# pre-staged ROUND4_QUEUE reordered so the most failure-prone / most
# novel subsystems are checked first (round-3 verdict task 6 asked for
# the DataSource WRITE path early) and the 10 leftovers are all simple
# aggregation/window shapes with many driver-proven siblings.
ROUND4_FRONT = [
    # round-3 novel subsystems: 2-phase-commit DataSource write, the
    # two remaining streaming certs, the real WAV/RIFF codec
    "wkt_write_roundtrip", "stream_interval_full_outer",
    "stream_session_dynamic_gap", "multimodal_wav_decode",
    # the round-3 weak operator, now measured (SCALING.md grid)
    "lm_bigram_quality",
    # ANN / embedding tier: SemDeDup, PQ, IVF-PQ, recall cert,
    # BLAS-partial covariance
    "semdedup_prune", "ann_pq_topk", "ann_ivf_pq_topk", "ann_recall_report",
    "embedding_covariance",
    # exact-DECIMAL money, layout/ops tier
    "decimal_money_totals", "cdc_apply_changes", "schema_evolution_scan",
    "partition_overwrite_merge",
    # dedup canonicalization + the rest of llm_pipeline
    "dedup_cluster_canonical", "source_overlap_matrix",
    "quality_classifier_score", "priority_sample_topk",
    "dsir_importance_scores", "diversity_distinct_ngrams",
    # extras: sketches, tokenizer prep, corpus mixing, event/stream ops
    "cms_frequency_estimate", "bpe_regex_token_count", "vocab_oov_rates",
    "temperature_mix_weights", "hopping_window_counts", "stream_hopping_hour",
    "stream_static_enrich", "funnel_conversion", "gapfill_locf_hourly",
    # curation batch
    "char_entropy_quality", "gopher_quality_gate", "ngram_novelty_decay",
    "word_zipf_slope", "embedding_dim_stats", "embedding_quantize_int8",
    "k_anonymity_audit", "join_key_skew_profile",
    # corpus_quality batch
    "boilerplate_ngram_mass", "bpe_pair_merge_counts",
    "length_quantile_filter",
    # analytics batch
    "rfm_segmentation", "bitmap_exact_distinct",
    "seasonal_baseline_residuals",
    # advanced tail (the non-trivial shapes)
    "did_difference_in_differences", "srm_sample_ratio_check",
    "spatial_knn_radius", "arrival_anomaly_days", "funnel_time_to_convert",
    "event_transition_matrix", "rendezvous_sharding",
]

# Highest CORRECTNESS_r{N} round the front block above was chosen
# against: queries green in rounds <= this were deliberately excluded.
# Bump when rotating (tests/test_rotation.py checks the choice against
# exactly these rounds, so a *new* round's results landing mid-cycle
# doesn't retroactively red the suite).
FRONT_CHOSEN_AGAINST_ROUND = 3

# ROUND 5 QUEUE (pre-staged): promote to the front block next round.
# Priority order: (1) the 10 never-verified round-4 leftovers — simple
# aggregation/window shapes deliberately deferred; (2) stale greens
# whose SEMANTICS changed after their verifying round (set_ops_nations
# subtract semantics `e2a9d48`, date parsers `acbd504`, merge default
# narrowed `a26bf70`) — re-verify these before the merely-re-staled;
# (3) the r3 greens re-staled by round 4's ordered edits (broadcast-
# hint drop touched tpch_rest/core/advanced; escape fix touched dedup)
# — code-identical or posture-only changes, lowest risk. Recompute
# with `python -m dso_import_spark.rotation` before rotating.
ROUND5_QUEUE = [
    # (1) never-verified: the round-4 auto-k SemDeDup variant and the
    # round-4 placement module (both added after the front block was
    # frozen) + the 10 deferred leftovers
    "semdedup_prune_autok", "zorder_layout_stats", "cluster_aware_split",
    "cohort_retention", "sliding_distinct_users", "activity_streaks",
    "mode_event_type", "value_outliers_mad", "winsorized_variant_means",
    "weekly_growth_rates", "abc_pareto_classes", "session_duration_stats",
    "daily_retention_d1_d7",
    # (2) semantics changed after verification
    "set_ops_nations", "date_parse_variants", "merge_insert_update",
    # (3) re-staled by round-4 ordered edits, highest-traffic first
    "json_extract_events", "dedup_minhash_lsh", "sparse_tfidf_topk",
    "hard_negative_mining", "dq_expectations_report",
    "q02_min_cost_supplier", "q05_nation_revenue", "q07_volume_shipping",
    "q08_market_share", "q09_product_type_profit", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_part_counts", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q20_part_promotion_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers",
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


_apply_front_block(ROUND4_FRONT, ROUND5_QUEUE)
