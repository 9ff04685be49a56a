"""GOB CSV source (SURVEY.md §2.1 S1/S3).

The reference streams semicolon-delimited, utf-8-sig, header-first CSV
as all-string dicts and parses field-by-field
(/root/reference/src/dso_import/batch/csv.py:42,64-85). Spark-first
equivalent: ``spark.read.csv`` with no schema (everything StringType),
``nullValue=''`` handling the pervasive ``value or None`` coalescing,
then explicit per-column cast expressions (functions.parsers) — never
inferSchema, mirroring the reference's read-as-strings discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_gob_csv(
    spark: SparkSession,
    path: str,
    max_rows: int | None = None,
) -> DataFrame:
    """S1: semicolon CSV → all-string DataFrame.

    ``max_rows`` mirrors process_csv's row limit (batch/csv.py:79-81).
    The utf-8-sig BOM, if present, is stripped from the first header.

    Malformed lines are DROPPED, never null-padded (round-8 review):
    plain PERMISSIVE mode silently pads a ragged line with NULLs, and
    a truncated row that still carries the leading key columns would
    sail through the null-key gate and merge fabricated all-NULL
    attributes into history — the reference's row loop raises on such
    rows (batch/csv.py:46-61, the logged-offending-row wrapper), and
    this repo's formats.py readers route them to a rejected channel.
    DROPMALFORMED matches the never-commit-garbage posture while
    keeping the load running; a caller needing the reference's strict
    abort can diff input line count against df.count().
    """
    df = (
        spark.read.option("sep", ";")
        .option("header", True)
        .option("quote", '"')
        .option("encoding", "UTF-8")
        .option("nullValue", "")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    first = df.columns[0]
    if first.startswith("﻿"):
        df = df.withColumnRenamed(first, first.lstrip("﻿"))
    if max_rows is not None:
        df = df.limit(max_rows)
    return df


def read_wkt_file(spark: SparkSession, path: str) -> DataFrame:
    """S3: pipe-delimited (id, wkt) rows (batch/geo.py:20-32)."""
    return (
        spark.read.option("sep", "|")
        .option("header", False)
        .csv(path)
        .toDF("id", "wkt")
    )
