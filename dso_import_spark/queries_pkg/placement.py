"""Data-placement discipline: multi-dimensional layout and leakage-free
splits.

Two operators a 100 TB pipeline applies at WRITE time, where they are
cheap, so every later read benefits:

- ``zorder_layout_stats``: Z-order (Morton) interleaving of two filter
  dimensions vs. single-dimension and insertion-order layouts,
  measured by the per-file (bucket) min/max footer spans that drive
  parquet data skipping. The z-value is pure integer bit arithmetic —
  whole-stage-codegen Column expressions, identically computable by
  the DuckDB oracle.
- ``cluster_aware_split``: train/val/test assignment hashed at the
  near-dup CLUSTER level (connected components over exact-Jaccard
  pairs), so near-duplicates can never straddle a split boundary and
  leak evaluation data into training. The leak invariant is part of
  the query output, not a side assertion.

Both compose existing operators (`operators/dedup.py`) with arithmetic
only — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

_BITS = 16  # normalized grid resolution per dimension; z fits in 32 bits
_TILE_SHIFT = 24  # bucket = z >> 24: a 16x16 tile grid (<=256 buckets)
_LINEAR_SHIFT = 8  # 1-D layouts: 256 buckets of consecutive value ranges
_EPOCH = "1995-01-01"  # fixture orderdate minimum
_PROBE_CUSTKEY = 42  # equality-predicate probe (present at every SF)
_PROBE_D1, _PROBE_D2 = 516, 545  # 1996-06-01 .. 1996-06-30 as epoch days


def _zvalue(x, y):
    """Morton-interleave two _BITS-bit integer Columns (JVM-side)."""
    z = F.lit(0).cast("long")
    for i in range(_BITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def _zvalue_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _norm_sql(v: str, lo: str, hi: str) -> str:
    """Min/max-normalize to the fixed 16-bit grid (floor of an IEEE
    double product/quotient — bit-identical across engines)."""
    return (
        f"CAST(floor((({v}) - {lo}) * 65535.0 /"
        f" greatest(({hi}) - ({lo}), 1)) AS BIGINT)"
    )


def _layout_stats_sql(layout: str, bucket_expr: str) -> str:
    return f"""
    SELECT '{layout}' AS layout,
           count(*)::BIGINT AS n_buckets,
           round(avg(n_rows), 2) AS avg_rows,
           round(avg(max_x - min_x), 2) AS avg_custkey_span,
           round(avg(max_y - min_y), 2) AS avg_date_span,
           sum(CASE WHEN min_x <= {_PROBE_CUSTKEY}
                     AND {_PROBE_CUSTKEY} <= max_x THEN 1 ELSE 0 END)::BIGINT
             AS key_hit_buckets,
           sum(CASE WHEN max_y >= {_PROBE_D1}
                     AND min_y <= {_PROBE_D2} THEN 1 ELSE 0 END)::BIGINT
             AS range_hit_buckets
    FROM (
      SELECT {bucket_expr} AS bucket, count(*) AS n_rows,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM grid GROUP BY 1)
    """


_ZORDER_ORACLE = f"""
    WITH raw AS (
      SELECT o_orderkey AS k, o_custkey AS x,
             date_diff('day', DATE '{_EPOCH}',
                       CAST(o_orderdate AS DATE)) AS y
      FROM orders),
    bounds AS (
      SELECT min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y,
             min(k) AS min_k, max(k) AS max_k
      FROM raw),
    grid AS (
      SELECT x, y,
             {_norm_sql("x", "min_x", "max_x")} AS xn,
             {_norm_sql("y", "min_y", "max_y")} AS yn,
             {_norm_sql("k", "min_k", "max_k")} AS kn,
             {_zvalue_sql(_norm_sql("x", "min_x", "max_x"),
                          _norm_sql("y", "min_y", "max_y"))} AS z
      FROM raw CROSS JOIN bounds)
    {_layout_stats_sql("zorder", f"(z >> {_TILE_SHIFT})")}
    UNION ALL
    {_layout_stats_sql("insertion", f"(kn >> {_LINEAR_SHIFT})")}
    UNION ALL
    {_layout_stats_sql("date_sorted", f"(yn >> {_LINEAR_SHIFT})")}
"""


@query(
    "zorder_layout_stats",
    oracle=_ZORDER_ORACLE,
    doc="Z-order (Morton) layout vs insertion-order and single-dim "
    "date-sorted layouts, judged by what parquet footer pruning sees: "
    "per-bucket min/max spans of BOTH filter dimensions and the "
    "bucket-hit counts for a custkey equality probe and a 30-day date "
    "range. Z-order bounds both spans at once, so both probes prune; "
    "insertion order bounds neither; date-sort bounds one. Both "
    "dimensions (and the 1-D layouts' sort keys) are min/max-"
    "normalized onto a fixed 16-bit grid first — a 1-row bounds "
    "aggregate broadcast back — so every layout produces <=256 "
    "buckets and identical curve geometry at any scale factor. The "
    "z-value is 32 interleaved-bit terms of shiftleft/shiftright/AND "
    "Column arithmetic (whole-stage codegen, no UDF); at 100 TB the "
    "layout step is `repartitionByRange(z).write`, paid once at "
    "ingest, and every selective read after it skips most files.",
)
def zorder_layout_stats(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    raw = orders.select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_custkey").cast("long").alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(_EPOCH).cast("date")
        ).cast("long").alias("y"),
    )
    bounds = raw.agg(
        F.min("x").alias("min_x"), F.max("x").alias("max_x"),
        F.min("y").alias("min_y"), F.max("y").alias("max_y"),
        F.min("k").alias("min_k"), F.max("k").alias("max_k"),
    )

    def norm(v, lo, hi):
        return F.floor(
            (F.col(v) - F.col(lo)) * F.lit(65535.0)
            / F.greatest(F.col(hi) - F.col(lo), F.lit(1))
        ).cast("long")

    xn, yn = norm("x", "min_x", "max_x"), norm("y", "min_y", "max_y")
    grid = raw.crossJoin(F.broadcast(bounds)).select(
        "x",
        "y",
        xn.alias("xn"),
        yn.alias("yn"),
        norm("k", "min_k", "max_k").alias("kn"),
        _zvalue(xn, yn).alias("z"),
    )

    def stats(layout: str, bucket):
        per_bucket = grid.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        key_hit = (F.col("min_x") <= _PROBE_CUSTKEY) & (
            F.col("max_x") >= _PROBE_CUSTKEY
        )
        range_hit = (F.col("max_y") >= _PROBE_D1) & (F.col("min_y") <= _PROBE_D2)
        return per_bucket.agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.round(F.avg("n_rows"), 2).alias("avg_rows"),
            F.round(F.avg(F.col("max_x") - F.col("min_x")), 2).alias(
                "avg_custkey_span"
            ),
            F.round(F.avg(F.col("max_y") - F.col("min_y")), 2).alias(
                "avg_date_span"
            ),
            F.sum(key_hit.cast("long")).cast("long").alias("key_hit_buckets"),
            F.sum(range_hit.cast("long")).cast("long").alias("range_hit_buckets"),
        ).select(
            F.lit(layout).alias("layout"),
            "n_buckets",
            "avg_rows",
            "avg_custkey_span",
            "avg_date_span",
            "key_hit_buckets",
            "range_hit_buckets",
        )

    return (
        stats("zorder", F.shiftright(F.col("z"), _TILE_SHIFT))
        .unionByName(
            stats("insertion", F.shiftright(F.col("kn"), _LINEAR_SHIFT))
        )
        .unionByName(stats("date_sorted", F.shiftright(F.col("yn"), _LINEAR_SHIFT)))
    )


# ---------------------------------------------------------------------------
# Cluster-aware (leakage-free) split
# ---------------------------------------------------------------------------

# Knuth multiplicative hash, taking HIGH bits (>> 13) before the mod:
# the sampled ids are all ≡ 0 (mod 20), so the product's low decimal
# digit is constant and a bare % 10 would send every cluster to one
# split. Identical integer arithmetic in Spark and DuckDB (no engine
# hash function is shared between the two). The cluster id is reduced
# mod 2^31 BEFORE the multiply: (2^31 − 1) · _MIX ≈ 5.7e18 fits signed
# 64 bits, so the hash never overflows (ANSI Spark and DuckDB both
# raise on overflow) for any doc_id — a 100 TB corpus id domain.
_MIX = 2654435761
_HASH_SHIFT = 13
_MASK_MOD = 1 << 31


def _split_bucket(cluster):
    """0..9 split bucket of a non-negative cluster-id Column; overflow-
    free for the full signed-64 id domain (see _MASK_MOD note above)."""
    from pyspark.sql import functions as F

    return F.shiftright((cluster % _MASK_MOD) * F.lit(_MIX), _HASH_SHIFT) % 10


@query(
    "cluster_aware_split",
    oracle=r"""
    WITH RECURSIVE
    sample_docs AS (
      SELECT doc_id, lang, n_chars, text FROM documents WHERE doc_id % 20 = 0),
    toks AS (
      SELECT doc_id, lang, list_distinct(regexp_split_to_array(text, '\s+')) AS t
      FROM sample_docs),
    words AS (
      SELECT doc_id, lang, len(t)::BIGINT AS n_toks, unnest(t) AS word FROM toks),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_toks AS n_a, b.n_toks AS n_b, count(*) AS n_shared
      FROM words a JOIN words b
        ON a.word = b.word AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    pairs AS (
      SELECT id_a, id_b FROM shared
      WHERE round(n_shared / (n_a + n_b - n_shared), 4) >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(id, lbl) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
    comp AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id),
    labeled AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             CASE WHEN (((coalesce(c.cluster_id, d.doc_id) % 2147483648) * 2654435761) >> 13) % 10 < 8
                  THEN 'train'
                  WHEN (((coalesce(c.cluster_id, d.doc_id) % 2147483648) * 2654435761) >> 13) % 10 = 8
                  THEN 'val' ELSE 'test' END AS split
      FROM sample_docs d LEFT JOIN comp c USING (doc_id)),
    leaks AS (
      SELECT count(*)::BIGINT AS leaky_clusters FROM (
        SELECT cluster_id FROM labeled
        GROUP BY cluster_id HAVING count(DISTINCT split) > 1))
    SELECT split,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT cluster_id)::BIGINT AS n_clusters,
           sum(n_chars)::BIGINT AS total_chars,
           (SELECT leaky_clusters FROM leaks) AS leaky_clusters
    FROM labeled GROUP BY split
    """,
    doc="Leakage-free train/val/test split: near-dup pairs (exact "
    "word-set Jaccard, lang-blocked) → connected components → the "
    "split is hashed from the CLUSTER id (Knuth multiplicative mod "
    "10 → 80/10/10), so near-duplicate documents land in the same "
    "split by construction and eval data cannot leak into training. "
    "`leaky_clusters` (clusters straddling a split boundary) is a "
    "column of the output and must be 0. At 100 TB the split column "
    "is computed once at ingest and written as a partition column; "
    "the only shuffles are the component rounds and one doc→cluster "
    "join.",
)
def cluster_aware_split(spark, sf_dir):
    from dso_import_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") % 20 == 0)
    pairs = ngram_jaccard_pairs(
        sample, "text", "doc_id", block_cols=["lang"], threshold=0.5
    ).select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    cluster = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    bucket = _split_bucket(cluster)
    labeled = (
        sample.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            cluster.alias("cluster_id"),
            F.when(bucket < 8, F.lit("train"))
            .when(bucket == 8, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )
    leaks = (
        labeled.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("leaky_clusters"))
    )
    per_split = labeled.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    return per_split.crossJoin(F.broadcast(leaks))
