"""Additional exchange formats: JSON-lines and ORC.

The reference ingests only semicolon CSV (`src/dso_import/batch/csv.py`);
an engine users can *switch to* also has to accept the other common
landing formats. Both readers follow the same production discipline as
the CSV source (sources/csv.py): **explicit schema, never inference**
(schema inference re-scans the input and silently drifts as data
changes), plus a rejected-row side channel mirroring the reference's
error-tolerant row callback (P13, `batch/csv.py:46-61`).

Scale notes: JSONL and ORC are both splittable (ORC natively; JSONL by
newline), so reads parallelize per HDFS-block. ORC carries column
statistics and supports predicate pushdown like parquet; JSONL does
not — at 100 TB, land JSONL, convert to parquet/ORC once, query the
columnar copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON with an explicit schema.

    Returns (valid_rows, rejected_rows): malformed lines don't abort
    the read (PERMISSIVE) and don't silently vanish either — they come
    back as a one-column DataFrame of raw lines for quarantine, the
    Spark-native form of the reference's log-offending-row wrapper.
    """
    with_corrupt = StructType(
        schema.fields + [StructField(CORRUPT_COL, StringType())]
    )
    raw = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires materializing before referencing the corrupt
    # column alone (the lazy scan would otherwise prune away the
    # parse-failure evidence). localCheckpoint instead of cache():
    # cache() pinned the whole raw input in executor storage memory
    # for the session's lifetime with no release path; the checkpoint
    # is dropped with the DataFrame's lineage when callers let go.
    raw = raw.localCheckpoint(eager=True)
    valid = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejected = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return valid, rejected


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar, statistics-bearing, pushdown-capable.

    Schema comes from the ORC footer (self-describing, like parquet),
    so no inference pass happens.
    """
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType,
    row_tag: str = "row",
) -> tuple[DataFrame, DataFrame]:
    """Read XML (Spark 4 native source) with an explicit schema.

    Same discipline as ``read_jsonl``: no inference (XML inference is
    an extra full scan), PERMISSIVE parse, and malformed records come
    back on a rejected-row side channel instead of aborting or
    vanishing. XML is record-splittable on the row tag, so reads
    parallelize; like JSONL it carries no column statistics — at
    100 TB land XML, convert to parquet once, query the columnar copy.
    """
    with_corrupt = StructType(
        schema.fields + [StructField(CORRUPT_COL, StringType())]
    )
    raw = (
        spark.read.format("xml")
        .schema(with_corrupt)
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )
    # localCheckpoint, not cache() — see read_jsonl
    raw = raw.localCheckpoint(eager=True)
    valid = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejected = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return valid, rejected


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    df.write.mode("overwrite").format("xml").option("rootTag", "rows").option(
        "rowTag", row_tag
    ).save(path)
