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
# the explicit ROUND*_FRONT reorder below then pins the driver-facing
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
    compositions,
    mlops2,
    mlops3,
    mlops4,
    tsops,
    mlops5,
)

# ROUND 9 FRONT BLOCK (applied): the 11 never-verified round-8 queries
# first (mlops4 ×8 + tsops ×3 — the only registry rows with zero driver
# evidence; a green front makes the registry 269/269 ever-green), then
# the ENTIRE 37-row stale backlog in registry order (round-8 review
# passes touched text/extras/similarity/multimodal/streaming modules
# after their verifying artifacts landed), then 2 refresh picks: the
# two oldest FORCE_REVERIFY rows (r2 evidence; functions/parsers.py
# try_cast hardening is stale-invisible at module granularity).
ROUND9_FRONT = [
    # (1) never-verified: the round-8 mlops4 batch (FDR, shrinkage,
    # MI, ratio CI, water-filling, local-DP, pinball loss, JSONL
    # rescue)
    "bh_fdr_correction", "eb_shrunken_rates", "mutual_information_cols",
    "ratio_metric_delta_ci", "budget_water_filling",
    "randomized_response_debias", "pinball_loss_eval", "jsonl_rescue_scan",
    # (1b) never-verified: round-8 batch 2 (time-series ACF,
    # header/detail reconciliation, k-hop BFS)
    "autocorrelation_lags", "order_lineitem_reconcile", "khop_reachability",
    # (2) the ENTIRE stale backlog, registry order (37)
    "text_token_stats", "text_quality_scores", "doc_fingerprints",
    "text_tfidf_top_terms", "doc_chunking",
    "wkt_coerce_geometries", "date_parse_variants",
    "hash_split_train_test", "dedup_cluster_components",
    "dedup_cluster_canonical", "sql_entry_point", "udaf_geometric_mean",
    "udtf_sentence_split", "unpivot_melt_measures", "table_profile",
    "cms_frequency_estimate", "bpe_regex_token_count", "vocab_oov_rates",
    "temperature_mix_weights", "ann_pq_topk", "ann_ivf_pq_topk",
    "hopping_window_counts", "stream_hopping_hour", "stream_static_enrich",
    "funnel_conversion", "gapfill_locf_hourly", "semdedup_prune",
    "semdedup_prune_autok", "cohort_retention", "sliding_distinct_users",
    "sparse_tfidf_topk", "activity_streaks", "mode_event_type",
    "value_outliers_mad", "stream_session_dynamic_gap",
    "shingle_containment_banded", "banding_estimator_cert",
    # (3) refresh picks filling to 50: the two oldest FORCE_REVERIFY
    # rows (r2 evidence; round-8 functions/parsers.py try_cast
    # hardening is invisible to stale_green's module granularity)
    "surrogate_key", "multi_id_zip",
]

# Highest CORRECTNESS_r{N} round the front block above was chosen
# against: queries green in rounds <= this were deliberately excluded
# (unless stale or FORCE_REVERIFY). Bump when rotating
# (tests/test_rotation.py checks the choice against exactly these
# rounds, so a *new* round's results landing mid-cycle doesn't
# retroactively red the suite).
FRONT_CHOSEN_AGAINST_ROUND = 8

# Green queries whose SEMANTICS changed in a module stale_green can't
# see (operators/*, not the defining queries_pkg module), plus
# deliberate evidence-freshness picks. Spending a front slot on these
# is deliberate re-verification, not waste.
FORCE_REVERIFY: list[str] = [
    # round-8 review fixes touched sources/wkt_source.py (shared
    # register_once helper) and sources/tail_source.py (truncation
    # generations) — the registered callables live in queries_pkg
    # modules stale_green can't see through, so mark explicitly
    "wkt_file_scan", "wkt_write_roundtrip",
    # functions/text.py simhash32 NULL-propagation and
    # functions/parsers.py try_cast hardening (round-8 review): no
    # fixture-visible output change (differentials green), but the
    # defining functions module is stale-invisible — re-verify
    # (surrogate_key and multi_id_zip took r9 front slots)
    "dedup_simhash_fingerprints", "surrogate_key", "multi_id_zip",
    # operators/{multimodal,asof,similarity,skew}.py review fixes
    # (NULL-payload guards, loud type guards, bound-column normalize,
    # helper reuse) — same stale-invisible posture; differentials green
    "multimodal_metadata", "multimodal_decode_stats",
    "multimodal_frame_sample", "multimodal_features",
    "multimodal_wav_decode", "asof_tolerance_cogroup",
    "salted_heavy_hitters", "salted_join_revenue", "ann_lsh_topk",
    "semdedup_autok_kernel",
]

# ROUND 10 QUEUE (pre-staged): the residual stale tail the round-9
# front could not fit — next-oldest driver evidence first (r2 rows
# whose functions/ dependencies were hardened in r8), then r3/r4 rows
# plus the review-touched WKT write and simhash paths, then the
# operator-module FORCE_REVERIFY entries (multimodal/asof/skew/
# similarity review fixes). New queries added mid-round go at the
# HEAD. Recompute with `python -m dso_import_spark.rotation` when
# rotating.
ROUND10_QUEUE = [
    # (0) queries born in round 9 (mlops5 stats/eval batches + the
    # graph/ts additions) — never driver-verified, so they go first
    "kaplan_meier_interarrival", "spearman_rank_correlation",
    "permutation_test_signflip", "unigram_perplexity_heldout",
    "jl_projection_distortion_cert", "ab_minimum_detectable_effect",
    "mcnemar_paired_test", "vocab_chao1_richness",
    "copurchase_degree_histogram",
    "logrank_two_arm", "rrf_rank_fusion", "weighted_median_groups",
    "mase_seasonal_naive",
    # (1) next-oldest driver evidence (r2 rows), registry order
    "safe_int_cast", "tri_state_boolean",
    "interval_validity_filter", "open_interval_gate", "temporal_overlap",
    "fk_validation", "delete_detection", "merge_counts_scale",
    "explode_bridge",
    # (2) r3/r4 rows + the review-touched WKT write and simhash paths
    "stream_interval_left_outer", "wkt_file_scan", "wkt_write_roundtrip",
    "dedup_simhash_fingerprints",
    "collated_dedup_groups", "recursive_cte_chain",
    "listagg_order_sequences",
    # (3) operator-module review-fix re-verification (FORCE_REVERIFY
    # entries not already staged above)
    "asof_tolerance_cogroup", "salted_heavy_hitters",
    "salted_join_revenue", "ann_lsh_topk", "semdedup_autok_kernel",
    "multimodal_metadata", "multimodal_decode_stats",
    "multimodal_frame_sample", "multimodal_features",
    "multimodal_wav_decode",
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


_apply_front_block(ROUND9_FRONT, ROUND10_QUEUE)
