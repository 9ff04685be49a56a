"""Table-maintenance operators: small-files compaction and
schema-evolution reads.

Neither has a reference analog (Postgres hides physical layout;
`bagh_create.sql` fixes schemas forever) — but a parquet warehouse at
100 TB lives or dies by them:

- every micro-batch / task append creates files; thousands of KB-sized
  files turn listing and scan startup into the bottleneck (each file
  is a task + a footer read). ``compact`` rewrites a directory to
  ~``target_bytes`` files with the same two-phase-swap discipline as
  the BAGH sink, so readers never see a half-compacted table.
- landed data drifts: new extract versions add columns. ``read_evolved``
  reads a union of parquet directories with ``mergeSchema``, yielding
  the superset schema with NULLs for pre-drift files — the batch
  equivalent of the schema-registry-driven models the reference builds
  at job start (SURVEY.md §1.1).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet directory."""
    n, b = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") or (
                f.startswith("part-") and not f.endswith(".crc")
            ):
                n += 1
                b += os.path.getsize(os.path.join(root, f))
    return n, b


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~target_bytes files.

    Returns the new file count. Uses the measured on-disk size (not row
    count) so the heuristic holds for wide and narrow tables alike.

    Unpartitioned: ``coalesce`` (not ``repartition``) keeps the rewrite
    shuffle-free — it only merges read-splits, which is exactly what
    compaction wants. Hive-partitioned directories MUST pass
    ``partition_by`` (the partition columns): the rewrite then
    ``repartition``\\ s on them (one shuffle) so each partition
    directory collapses to one file — without it the partition layout
    would silently flatten.

    Two-phase: write to ``<path>.compacting``, then rename-swap. The
    new data is complete before the swap begins, and a recovery
    preamble repairs the two crash windows the double rename leaves:
    a crash before the swap orphans only ``.compacting`` (removed on
    the next run); a crash between the two renames leaves the table
    at ``<path>.old`` with ``path`` briefly absent (rolled back on
    the next run). POSIX has no atomic directory swap, so a reader
    racing exactly inside the two-rename window can still observe a
    missing directory — on object storage, swap via a manifest
    instead (the WKT sink's commit protocol).
    """
    old_dir = path.rstrip("/") + ".old"
    tmp = path.rstrip("/") + ".compacting"
    if os.path.isdir(old_dir) and not os.path.isdir(path):
        os.rename(old_dir, path)  # crashed between the two renames
    if os.path.isdir(old_dir):
        shutil.rmtree(old_dir)  # crashed before the old cleanup
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)  # crashed mid-write: tmp is untrusted
    n_files, total = dir_stats(path)
    df = spark.read.parquet(path)
    if partition_by:
        rewritten = df.repartition(*partition_by)
        writer = rewritten.write.mode("overwrite").partitionBy(*partition_by)
    else:
        n_target = max(1, math.ceil(total / target_bytes))
        if n_target >= n_files:
            return n_files  # already compact enough; don't rewrite
        writer = df.coalesce(n_target).write.mode("overwrite")
    writer.parquet(tmp)
    os.rename(path, old_dir)
    os.rename(tmp, path)
    shutil.rmtree(old_dir)
    return dir_stats(path)[0]


def cluster_write(
    df: DataFrame,
    path: str,
    col: str,
    n_files: int = 8,
) -> None:
    """Range-clustered parquet write — the plain-parquet analog of
    Z-ordering on one key (SURVEY.md §1.2: "partitioning/Z-order if
    Delta").

    ``repartitionByRange`` gives each output file a disjoint key range;
    ``sortWithinPartitions`` orders rows inside, so every parquet
    row group carries tight min/max statistics on ``col``. Point and
    range predicates then skip whole row groups (and effectively whole
    files) at scan time — data skipping without any table format.
    ``tests/test_maintenance.py`` asserts the written files' footer
    stats are actually disjoint.
    """
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 6,
) -> None:
    """Z-order (bit-interleaved) clustered parquet write — multi-column
    data skipping, where ``cluster_write`` handles only one key.

    Each column is mapped to an equi-depth bucket id (quantile
    boundaries from ``approxQuantile`` — the same sampling trade
    ``repartitionByRange`` makes internally, and skew-robust where
    uniform ``width_bucket`` is not); the bucket ids' bits are
    interleaved into a single Z-value, and files are range-partitioned
    and sorted by it. Every output file then covers a small hyper-cube
    of the key space, so parquet min/max footer stats prune files for
    predicates on ANY clustered column — the plain-parquet analog of
    Delta/Iceberg ``OPTIMIZE ZORDER BY``. A single-key sort gives
    perfect skipping on that key and none on the rest; Z-order trades a
    little per-key resolution for skipping on all of them.

    All per-row math is JVM-side Column expressions (an ``aggregate``
    fold over the literal boundary array counts boundaries <= value =
    bucket id; shift/AND/OR interleave the bits) — no UDF, no extra
    shuffle beyond the range partitioning any clustered write needs.
    NULLs bucket to 0. The stats pass costs one ``approxQuantile`` scan
    per column; at 100 TB run it on a sample or reuse table statistics.
    """
    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bucket_exprs = []
    for c in cols:
        dcol = F.col(c).cast("double")
        qs = df.select(dcol.alias("v")).approxQuantile("v", probs, 0.001)
        bounds = sorted(set(qs))
        v = F.coalesce(dcol, F.lit(float("-inf")))
        bucket_exprs.append(
            F.aggregate(
                F.array(*[F.lit(float(b)) for b in bounds]),
                F.lit(0),
                lambda acc, bound: acc
                + F.when(v >= bound, F.lit(1)).otherwise(F.lit(0)),
            )
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_exprs):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    (
        df.withColumn("__zorder", z)
        .repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet directories written under drifting schemas.

    ``mergeSchema`` unions the footers: columns absent in older files
    come back NULL, same-named columns must be castable. Explicitly
    opt-in (it reads every footer) — at 100 TB, evolve once and rewrite
    rather than paying merge on every read.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, "Column"],  # noqa: F821 — pyspark.sql.Column
    mode: str = "overwrite",
) -> dict:
    """Write parquet and collect aggregate metrics in the SAME pass.

    ``df.observe`` attaches named aggregate expressions to the plan;
    the write action evaluates them as it streams rows to the sink, so
    row counts / null rates / sums cost zero extra scans — the Spark
    answer to the reference's per-batch progress counters
    (`batch/batch.py:60-75` reports rows/sec from its write loop) and
    to this repo's own quality-gate counting, which otherwise pays one
    cached-subtree job per metric. At 100 TB an extra full-table pass
    per metric is hours; observed metrics are free.

    Metrics must be aggregate Column expressions (count/sum/min/...).
    Returns the metric dict observed during the write.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode(mode).parquet(path)
    return obs.get


def merge_agg_partials(
    base_agg: DataFrame,
    delta: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
) -> DataFrame:
    """Incremental aggregate maintenance: fold a delta batch into a
    materialized aggregate WITHOUT recomputing over history.

    ``base_agg`` is the stored aggregate table (one row per key group);
    ``delta`` is the new raw rows. ``metrics`` maps each output column
    to ``(source_column, kind)`` with kind in {sum, count, count_star,
    min, max} — the algebraic aggregates whose partials combine
    losslessly (sum+=sum, count+=count, min=min(min), max=max(max)).
    ``count`` is SQL count(col): NON-NULL values of the source column
    only; ``count_star`` is count(*): rows regardless of NULLs (the
    source column is ignored) — a NULL-bearing delta diverges between
    the two, pick the one your recompute contract uses. avg is
    maintained as sum/count by the caller; non-algebraic aggregates
    (distinct, median) need sketches (see approx_distinct_sketch) or a
    recompute.

    Shape at 100 TB: aggregate the DELTA (one map-side-combined
    shuffle over new rows only), union with the key-cardinality-sized
    base table, and re-combine — cost scales with |delta| + |keys|,
    never with |history|. This is the batch form of what the streaming
    path does continuously (streaming/events.py keyed state): the
    materialized-view-maintenance loop a warehouse runs nightly.

    Returns the refreshed aggregate with the same schema as base_agg.
    """
    delta_agg = delta.groupBy(*keys).agg(
        *[
            {
                "sum": F.sum,
                "count": F.count,
                "count_star": lambda _src: F.count(F.lit(1)),
                "min": F.min,
                "max": F.max,
            }[kind](src).alias(out)
            for out, (src, kind) in metrics.items()
        ]
    )
    combine = {
        "sum": F.sum,
        "count": F.sum,  # counts combine by summing partial counts
        "count_star": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return (
        base_agg.unionByName(delta_agg)
        .groupBy(*keys)
        .agg(
            *[
                combine[kind](out).alias(out)
                for out, (_src, kind) in metrics.items()
            ]
        )
    )
