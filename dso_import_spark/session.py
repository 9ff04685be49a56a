"""SparkSession factory tuned for the test/bench environment.

Local mode (``local[N]``) is one JVM with N executor threads; the same
configs carry to a real cluster where they matter far more:

- AQE on: runtime coalescing of small shuffle partitions and skew-join
  splitting — essential at 100 TB where static partition counts are
  always wrong for some stage.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescing makes the initial number mostly a ceiling.
- Arrow enabled so any Pandas-UDF path is batch-transferred, never
  pickled row-at-a-time.
- Session timezone pinned to UTC so timestamp semantics are stable and
  comparable with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Deployment profiles (round 14, guide §2.2/§6): scan-split and shuffle
# advisory sizing belong to the DEPLOYMENT, not the engine — the local
# bench wants Spark's defaults (tiny fixtures; bigger splits would just
# collapse scan parallelism and skew the driver's core-count scaling
# measurement), a real cluster wants large sequential splits and
# 100 MB-1 GB post-AQE partitions. Select with SPARK_GRAFT_PROFILE;
# explicit user conf (extra_conf) still overrides profile values.
#
# "cluster" values and rationale: 512m scan splits cut the map-task
# count feeding every shuffle ~4x vs the 128m default (guide §2.2 —
# M*R shuffle-block growth is quadratic, fewer/larger blocks fetch
# better), 256m advisory partitions put post-coalesce reduce work in
# the guide §9 recommended band instead of the 64m default, and zstd
# shuffle compression trades a little CPU for a markedly better ratio
# on 10-100 Gbit networks (guide §2.3 — measure both on your fabric).
_PROFILES: dict[str, dict[str, str]] = {
    "local": {},
    "cluster": {
        "spark.sql.files.maxPartitionBytes": "512m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
        "spark.io.compression.codec": "zstd",
    },
}


def get_spark(
    app_name: str = "dso_import_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the SparkSession with engine defaults."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate turns every explode(computed_array)
        # into `size(arr) > 0 AND isnotnull(arr)` — predicate pushdown
        # then INLINES the array expression into the filter and sinks
        # it below any repartition, so a tokenize/shingle pipeline is
        # (a) evaluated 3× per row (size check, null check, the real
        # projection) and (b) serialized into the scan stage's split
        # count (measured: shingle_containment 14.1 s single-task vs
        # 2.1 s without the rule at sf0.1; same total CPU at any SF —
        # the inferred prune only pays off when most arrays are empty,
        # never true for tokenized text). Hot operators also avoid the
        # shape per-site (explode_outer, no filter on computed arrays)
        # so plans stay sane under a default session too.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    profile = os.environ.get("SPARK_GRAFT_PROFILE", "local")
    if profile not in _PROFILES:
        raise ValueError(
            f"unknown SPARK_GRAFT_PROFILE {profile!r}; "
            f"expected one of {sorted(_PROFILES)}"
        )
    for k, v in _PROFILES[profile].items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from dso_import_spark.ship import ensure_shipped

    ensure_shipped(spark)
    return spark
