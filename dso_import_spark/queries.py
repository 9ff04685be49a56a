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


# Importing the modules below populates REGISTRY via the decorator.
# ORDER MATTERS for the external differential harness, which verifies
# registry entries front-to-back with a per-round budget: modules whose
# queries still lack a green correctness row are imported FIRST so they
# get driver evidence this round (round 1 verified the first 50 —
# cleaning/core/dedup/extras/layout/llm_pipeline/modern_sql — so those
# rotate to the back; tpch_rest/wkt_scan rotate forward next round).
#
# ROUND 3 ROTATION PLAN (apply at the start of round 3): round 2's
# front-50 was ref_semantics(12)+windows(11)+similarity(6)+text(6)+
# multimodal(4)+scale(5)+streaming_queries(first 6). Still never
# driver-verified: tpch_rest(15), wkt_scan(1), advanced(22), the two
# round-2 modern_sql additions (recursive_cte_chain,
# listagg_order_sequences), stream_interval_left_outer (7th streaming
# entry), the two llm_pipeline additions (dsir_importance_scores,
# diversity_distinct_ngrams), and the round-2 extras tail
# (cms_frequency_estimate onward). That is 43+ entries — more than
# fits alongside anything else in a 50-query budget, so round 3's
# import order should be exactly: tpch_rest, wkt_scan, advanced,
# modern_sql (new entries only fit if the module file is reordered
# to put them first), then the rest; the remaining unverified tail
# (extras additions, llm_pipeline additions, streaming 7th) rotates
# forward in round 4.
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
)
