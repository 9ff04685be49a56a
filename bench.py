"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative slice of the engine (scan/agg, multi-join,
windows, sessionization, merge, dedup, JSON) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed via the noop sink (forces materialization
of every partition without driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dso_import_spark.queries import spark_queries  # noqa: E402
from dso_import_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_nation_revenue",
    "q06_forecast_revenue",
    "distinct_agg",
    "window_topk_per_group",
    "sessionize_events",
    "tumbling_hour_window",
    "temporal_overlap",
    "merge_insert_update",
    "fk_validation",
    "explode_bridge",
    "dedup_prefix_groups",
    "dedup_ngram_jaccard",
    "text_token_stats",
    "json_extract_events",
    "q04_order_priority",
    "q08_market_share",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "text_tfidf_top_terms",
    "doc_chunking",
    "salted_join_revenue",
    "ann_brute_force_topk",
    "multimodal_decode_stats",
    "decontam_ngram_overlap",
    "seq_packing_bins",
    "merge_counts_scale",
    "scd2_point_in_time",
    "corpus_pipeline_stats",
    "ann_lsh_topk",
    "pii_redaction_stats",
    "repetition_quality_flags",
    "incremental_corpus_dedup",
    "table_profile",
    "dedup_substring_spans",
    "asof_tolerance_cogroup",
    "ivf_kmeans_train",
    # the scale-safe SemDeDup form (k ~ n/500, kernel assignment above
    # k=64) — replaced fixed-k semdedup_prune in round 5: the fixed-k
    # entry stays registered as the small-k oracle-parity pin but its
    # pair join is the measured n²/k blowup (SCALING.md), so the
    # headline tracks the form a 100 TB corpus would run
    "semdedup_prune_autok",
    "lm_bigram_quality",
    "sparse_tfidf_topk",
    "funnel_conversion",
    "cohort_retention",
    "bloom_join_prune",
    "drift_psi_periods",
    "ewma_fixed_lags",
    "incremental_agg_refresh",
    "record_linkage_fuzzy",
]

# Rotating extra slot (VERDICT r5 item 4): ~5-7 queries that never had
# a driver-recorded wall time, timed the same way but reported under
# separate keys so headline_total stays round-over-round comparable.
# Rotate the picks each round toward whatever is newest/least-timed.
BENCH_EXTRA = [
    # round 12: the four queries whose shape changed this round — the
    # funnel (volume-gated pair tier), the two water-filling
    # allocations (floor-scaled rounding + NULLS-LAST tiebreak;
    # stratified sample also bucket-offset re-ranked), and the PQ
    # composition (NULL hygiene + persisted-index split, whose
    # build/query receipt is timed separately below). The r10
    # retrieval compositions rotate out with two datapoints on record.
    "corpus_curation_pipeline",
    "stratified_sample_exact",
    "budget_water_filling",
    "ann_ivf_pq_topk",
]


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("dso_import_spark_bench")
    queries = spark_queries()
    # warm up the JVM/scan path once so per-query numbers measure the
    # engine, not first-touch classloading
    queries["q06_forecast_revenue"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()

    # best-of-3 per query: later runs reuse compiled plans and a warm
    # page cache, so min() measures the engine rather than transient
    # machine load / first-touch classloading. Two repeats left ~12%
    # same-code spread on the total between driver sessions (round-4
    # adjudication); three brings back-to-back totals within ~5%.
    timings: dict[str, float] = {}
    # per-repeat readings (VERDICT r11 #7): today's slot oscillation is
    # ±25%, so the artifact carries the BAND, not just the best point —
    # readings[i] = the headline total if only repeat i had run
    reads = [0.0, 0.0, 0.0]
    for name in HEADLINE:
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            reads[i] += dt
            best = min(best, dt)
        timings[name] = round(best, 3)

    extra: dict[str, float] = {}
    for name in BENCH_EXTRA:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        extra[name] = round(best, 3)

    # round 12: the PQ index build/query split (VERDICT r11 #3) — the
    # one-time Lloyd train + corpus encode lands as parquet (a
    # production index build), then the query-only path replays
    # against it; the two numbers land under separate extra keys so
    # the amortized query cost is visible next to ann_ivf_pq_topk's
    # inline (build-included) time
    import shutil
    import tempfile

    from pyspark.sql import functions as F  # noqa: N812

    from dso_import_spark.operators.ann_kernel import (
        ivf_pq_topk_arrow,
        pq_index_write,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qdf = emb.filter(F.col("vec_id") % 101 == 0)
    idx = tempfile.mkdtemp(prefix="pq_index_")
    try:
        # round 13 (guide §1, and stated here per the driver contract):
        # pq_index_build_sec was the ONLY single-shot measurement in
        # this harness — one cold reading carried the full machine
        # variance (r13 baseline read 15.8 s where settled re-runs sit
        # 3-4 s). Keep the key's first-build semantics unchanged for
        # round-over-round continuity and ADD a best-of-3 alongside,
        # measured like every other key.
        builds = []
        for _ in range(3):
            t0 = time.perf_counter()
            pq_index_write(emb, idx)
            builds.append(time.perf_counter() - t0)
        extra["pq_index_build_sec"] = round(builds[0], 3)
        extra["pq_index_build_best3_sec"] = round(min(builds), 3)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ivf_pq_topk_arrow(
                qdf, emb.limit(0), topk=5, index_path=idx
            ).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        extra["ann_ivf_pq_query_only"] = round(best, 3)
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # key order matters operationally: the driver records a bounded
    # TAIL of stdout, and BENCH_r07's capture clipped the leading
    # '{"metric"... "value"' off the front. The big per-query dicts
    # therefore come FIRST and the scalar summary (value/unit/sf)
    # LAST, so however deep the clip cuts, the headline number always
    # survives in the tail. JSON key order is semantically irrelevant
    # to any parser.
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "queries": timings,
                "extra_queries": extra,
                # the best3 build key re-measures the same build that
                # pq_index_build_sec already counts — exclude it from
                # the total so extra_total_sec stays round-comparable
                "extra_total_sec": round(
                    sum(
                        v
                        for k, v in extra.items()
                        if k != "pq_index_build_best3_sec"
                    ),
                    3,
                ),
                "readings": [round(r, 3) for r in reads],
                "sf": _sf_from_dir(SF_DIR),
                "unit": "sec",
                "value": total,
            }
        )
    )


if __name__ == "__main__":
    main()
