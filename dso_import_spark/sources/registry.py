"""Fixture-table registry: parquet scans for the driver star schema.

Plain ``spark.read.parquet`` — schema comes from the parquet footer,
so Catalyst gets column pruning and predicate pushdown for free
(``PushedFilters`` / ``ReadSchema`` visible in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; read nanos as long and truncate to a microsecond
    timestamp with integer division — the same truncation DuckDB applies
    when it loads nanos into its microsecond timestamps, so oracle
    comparisons stay exact.
    """
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {FIXTURE_TABLES}")
    if name == "events":
        # only the events table may carry TIMESTAMP(NANOS); the legacy
        # conf changes how EVERY parquet read in the session surfaces
        # nanos columns, so set it just for this read and restore —
        # flipping it session-wide on every load_table call was an
        # invisible side effect on unrelated reads (round-8 review)
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several fixture tables at once (all if no names given)."""
    names = names or FIXTURE_TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql paths."""
    for n in FIXTURE_TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
