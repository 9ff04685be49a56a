"""Shared helpers for registry queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dso_import_spark.ship import ensure_shipped
from dso_import_spark.sources.registry import load_table


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load fixture tables, pinning session TZ to UTC first.

    Parquet timestamps are naive instants; Spark renders TIMESTAMP_LTZ
    in the session timezone while the DuckDB oracle is timezone-naive.
    Pinning UTC per-query makes extraction (hour/date_trunc/format)
    agree regardless of how the calling session was built.

    Also ships the package zip to Python workers (--py-files analog)
    so pandas-UDF queries work from any driver cwd.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ensure_shipped(spark)
    return tuple(load_table(spark, sf_dir, n) for n in names)
