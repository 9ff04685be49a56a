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

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


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
    keeping the load running; ``read_gob_csv_audited`` adds the
    reference's error ACCOUNTING on top (dropped-row count + abort
    threshold) — prefer it anywhere silent shrinkage matters.
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


def read_gob_csv_audited(
    spark: SparkSession,
    path: str,
    max_rows: int | None = None,
    max_dropped_fraction: float = 0.0,
) -> DataFrame:
    """S1 with the reference's error accounting (ADVICE r8).

    ``read_gob_csv``'s DROPMALFORMED keeps a load running past ragged
    lines, but silently: a feed gone 10% ragged would load "green"
    with 10% of its rows missing, where the reference's row loop
    raises on the first such line (batch/csv.py:46-61). PERMISSIVE +
    columnNameOfCorruptRecord can't expose them either — Spark's CSV
    parser pads/truncates token-count mismatches instead of flagging
    them — so this variant counts: nonempty physical lines (minus one
    header per file, both from ONE distributed text-scan aggregate)
    vs the parsed row count. Any dropped fraction above
    ``max_dropped_fraction`` aborts the load (default 0.0 = the
    reference's strict posture); below it, the count is logged so
    shrinkage is never invisible.

    Assumes record-per-line CSV (no quoted embedded newlines) — the
    GOB dialect the reference also reads line-by-line.
    """
    df = read_gob_csv(spark, path)
    # a bare .count() lets column pruning hand the CSV parser an EMPTY
    # required schema, so ragged lines are never detected and the
    # count includes them (documented Spark CSV behavior) — reference
    # every column in the aggregate to force a full parse
    parsed = df.agg(
        F.count(F.lit(1)).alias("n"),
        # backtick-escape: GOB headers contain dots
        # ("ligtIn:GBD.WIJK.identificatie") that a bare name — even
        # via df[c] — resolves as a nested-field path
        *[F.count(F.col("`" + c.replace("`", "``") + "`")) for c in df.columns],
    ).collect()[0]["n"]
    stats = (
        spark.read.text(path)
        .select(F.input_file_name().alias("f"), "value")
        .where(F.length(F.trim(F.col("value"))) > 0)
        .agg(
            F.count(F.lit(1)).alias("lines"),
            F.count_distinct(F.col("f")).alias("files"),
        )
        .collect()[0]
    )
    expected = stats["lines"] - stats["files"]
    dropped = expected - parsed
    if dropped > 0:
        frac = dropped / expected if expected else 0.0
        if frac > max_dropped_fraction:
            raise ValueError(
                f"{path}: {dropped}/{expected} malformed CSV rows "
                f"dropped ({frac:.2%} > limit {max_dropped_fraction:.2%})"
            )
        log.warning(
            "%s: dropped %d/%d malformed CSV rows (%.2f%%)",
            path, dropped, expected, 100.0 * frac,
        )
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
