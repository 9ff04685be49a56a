"""WKT file scan through the Python DataSource (SURVEY.md §2.1 S3).

``wkt_file_scan`` synthesizes a deterministic pipe-delimited ``id|WKT``
file from the ``part`` table (written once per sf_dir, cache keyed by
the source parquet's mtime+size), reads it back through the registered
``wkt`` format with byte-range splits (sources/wkt_source.py), then
runs the G1 coercion over the scanned text. The DuckDB oracle
recomputes the same rows straight from ``part`` — so the differential
check covers the datasource's split-planning and line-ownership logic
end-to-end: a lost or double-read line at any slice boundary changes
the row multiset and fails the hash.

Reference: /root/reference/src/dso_import/batch/geo.py:20-32
(process_wkt) feeding get_geotype (:52-78).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from dso_import_spark.functions.geometry import coerce_wkt, wkt_geometry_type
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables
from dso_import_spark.sources.wkt_source import register_wkt_source

# three deterministic cases by p_partkey % 3:
#   0: POINT(<p_size> <p_partkey % 97>)       — rejected under multipolygon
#   1: POLYGON((0 0,<s> 0,<s> <s>,0 0))       — wrapped to MULTIPOLYGON
#   2: POLYGON((0 0,1 1                       — malformed, rejected


def _wkt_file_path(sf_dir: str) -> str:
    from dso_import_spark.queries_pkg.layout import stamped_cache_path

    return stamped_cache_path(sf_dir, "part", "wkt", "parts.wkt")


def _ensure_wkt_file(spark, sf_dir: str) -> str:
    """Write the id|WKT file once; single local file by design (the
    fixture is small — a production extract would already exist on
    shared storage, written by its producer)."""
    path = _wkt_file_path(sf_dir)
    if os.path.exists(path):
        return path
    (part,) = tables(spark, sf_dir, "part")
    rows = (
        part.select("p_partkey", "p_size")
        .orderBy("p_partkey")
        .collect()
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for r in rows:
            k, s = r["p_partkey"], r["p_size"]
            case = k % 3
            if case == 0:
                wkt = f"POINT({s} {k % 97})"
            elif case == 1:
                wkt = f"POLYGON((0 0,{s} 0,{s} {s},0 0))"
            else:
                wkt = "POLYGON((0 0,1 1"
            f.write(f"{k}|{wkt}\n")
    os.replace(tmp, path)
    return path


@query(
    "wkt_file_scan",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) AS id,
           CASE p_partkey % 3 WHEN 0 THEN 'POINT'
                              ELSE 'POLYGON' END AS gtype,
           CASE p_partkey % 3 WHEN 1 THEN
             'MULTIPOLYGON(((0 0,' || p_size || ' 0,' || p_size || ' '
               || p_size || ',0 0)))'
           END AS geom_multipolygon,
           CASE p_partkey % 3 WHEN 0 THEN
             'POINT(' || p_size || ' ' || (p_partkey % 97) || ')'
           END AS geom_point
    FROM part
    """,
    doc="S3 pipe-delimited WKT scan via the Spark 4 Python DataSource "
    "with byte-range splits, feeding G1 coercion; oracle recomputes "
    "from part, so slice-boundary bugs fail the row-multiset hash.",
)
def wkt_file_scan(spark, sf_dir):
    path = _ensure_wkt_file(spark, sf_dir)
    register_wkt_source(spark)
    scanned = (
        spark.read.format("wkt").option("numPartitions", 6).load(path)
    )
    return scanned.select(
        "id",
        wkt_geometry_type("wkt").alias("gtype"),
        coerce_wkt("wkt", "multipolygon").alias("geom_multipolygon"),
        coerce_wkt("wkt", "point").alias("geom_point"),
    )


def _wkt_write_dir(sf_dir: str) -> str:
    from dso_import_spark.queries_pkg.layout import stamped_cache_path

    return stamped_cache_path(sf_dir, "part", "wkt", "roundtrip")


@query(
    "wkt_write_roundtrip",
    oracle="""
    WITH w AS (SELECT p_partkey AS k,
        CASE p_partkey % 3
          WHEN 0 THEN 'POINT(' || p_size || ' ' || (p_partkey % 97) || ')'
          WHEN 1 THEN 'POLYGON((0 0,' || p_size || ' 0,' || p_size
                        || ' ' || p_size || ',0 0))'
          ELSE 'POLYGON((0 0,1 1' END AS wkt
      FROM part)
    SELECT k % 3 AS wkt_case,
           count(*)::BIGINT AS n,
           sum(length(wkt))::BIGINT AS total_chars
    FROM w GROUP BY k % 3 ORDER BY wkt_case
    """,
    doc="Custom Python DataSource WRITE path (Spark 4) certified by a "
    "full round-trip: WKT rows built from part are written through "
    "the two-phase-commit wkt sink (per-task invisible temp files, "
    "driver-side rename + _SUCCESS manifest publish — "
    "sources/wkt_source.py WktDataSourceWriter), read back through "
    "the byte-range-split reader, and aggregated; the oracle "
    "recomputes the expected multiset straight from part, so a lost "
    "task, double-published temp, partial line, or slice-boundary "
    "bug anywhere in the write+read pipeline changes the "
    "(case, count, total_chars) rows and fails the hash. Write "
    "fans out over 5 tasks, read re-splits each part file.",
)
def wkt_write_roundtrip(spark, sf_dir):
    register_wkt_source(spark)
    (part,) = tables(spark, sf_dir, "part")
    k = F.col("p_partkey")
    s_ = F.col("p_size").cast("string")
    wkt = (
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit("POINT("), s_, F.lit(" "), (k % 97).cast("string"),
                F.lit(")"),
            ),
        )
        .when(
            k % 3 == 1,
            F.concat(
                F.lit("POLYGON((0 0,"), s_, F.lit(" 0,"), s_, F.lit(" "),
                s_, F.lit(",0 0))"),
            ),
        )
        .otherwise(F.lit("POLYGON((0 0,1 1"))
    )
    rows = part.select(k.cast("string").alias("id"), wkt.alias("wkt"))
    out = _wkt_write_dir(sf_dir)
    rows.repartition(5).write.format("wkt").mode("overwrite").save(out)
    back = spark.read.format("wkt").option("numPartitions", 4).load(out)
    return (
        back.groupBy((F.col("id").cast("long") % 3).alias("wkt_case"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("wkt")).alias("total_chars"),
        )
        .orderBy("wkt_case")
    )
