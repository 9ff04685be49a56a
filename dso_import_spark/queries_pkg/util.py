"""Shared helpers for registry queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dso_import_spark.ship import ensure_shipped
from dso_import_spark.sources.registry import load_table


def tune_session(spark: SparkSession) -> None:
    """Size shuffle parallelism to the machine when the caller left the
    Spark default in place.

    A plain ``SparkSession.builder.getOrCreate()`` session carries
    ``spark.sql.shuffle.partitions=200`` — on a laptop-scale run that
    is 200 near-empty tasks per exchange, and for STATEFUL streaming
    (which keys its state store by shuffle partition and cannot be
    AQE-coalesced) it multiplies every micro-batch by ~6×. Only the
    value "200" is overridden — an explicit setting of any OTHER value
    is always respected; an explicit 200 is indistinguishable from the
    default and gets resized too (callers that truly need 200, e.g. to
    match a pre-existing stateful checkpoint, should set it after
    calling into the engine). Partition count never changes results —
    only task granularity (asserted engine-wide by the differential
    suite, which runs at both 32 and the default).
    """
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            n = spark.sparkContext.defaultParallelism
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(max(8, min(2 * n, 64)))
            )
    except Exception:  # pragma: no cover - conf API unavailable
        pass
    # InferFiltersFromGenerate triple-evaluates every explode'd
    # computed array inside a pushed-down filter (measured 8-21× at
    # ×100 docs, SCALING.md round-6). excludedRules is a RUNTIME conf,
    # so a foreign session (the driver's own harness, a user's plain
    # getOrCreate()) gets the sane plans too. Only the unset default
    # is overridden — a caller's explicit exclusion list is respected.
    try:
        key = "spark.sql.optimizer.excludedRules"
        if not spark.conf.get(key, None):
            spark.conf.set(
                key,
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate",
            )
    except Exception:  # pragma: no cover - conf API unavailable
        pass


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load fixture tables, pinning session TZ to UTC first.

    Parquet timestamps are naive instants; Spark renders TIMESTAMP_LTZ
    in the session timezone while the DuckDB oracle is timezone-naive.
    Pinning UTC per-query makes extraction (hour/date_trunc/format)
    agree regardless of how the calling session was built.

    Also ships the package zip to Python workers (--py-files analog)
    so pandas-UDF queries work from any driver cwd, and right-sizes
    shuffle parallelism if the session still has the Spark default.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tune_session(spark)
    ensure_shipped(spark)
    return tuple(load_table(spark, sf_dir, n) for n in names)


# One shuffle partition's worth of post-explode volume: below this the
# repartition exchange plus full-width task scheduling cost more than
# the single-task explode they avoid (measured grid in SCALING.md
# "lm_bigram checkpoint/spread grid").
_SPREAD_MIN_POST_EXPLODE_BYTES = 64 << 20


def spread_for_explode(
    df: DataFrame, *key_cols: str, amplification: int = 100
) -> DataFrame:
    """Hash-repartition a relation ahead of a high-amplification
    explode (shingles, token pairs, n-grams) — but only when the
    estimated post-explode volume justifies the exchange.

    Input-split sizing is the wrong parallelism unit for explode-heavy
    plans: `files.maxPartitionBytes` bounds *bytes read*, but a 300×
    amplification turns a single modest split into one task holding
    hundreds of millions of generated rows (measured: the ×100
    documents fixture reads as ONE split and lm_bigram_quality ran
    18.4 s single-threaded vs 7.4 s spread). Below that volume the
    exchange is pure overhead: the same query measured 0.82 s
    un-spread vs 1.55 s spread at sf0.1, and 2.3 s vs 5.0 s at ×10
    (full grid in SCALING.md). So the repartition is gated on
    Catalyst's size estimate for the input relation times the
    caller-declared `amplification` factor (output:input byte ratio of
    the explode — ~100 for token/char-level, ~500 for n-gram shingle
    strings, ~1000 for per-character pair mining). On a real cluster
    large inputs arrive in many splits and the gate simply stays open;
    it exists so the plan degrades gracefully when splits ≪ cores. No
    effect on results: repartitioning never changes aggregation
    semantics (asserted engine-wide by the differential suite).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # estimate unavailable — spread (safe at scale)
        est = None
    if est is not None and est * amplification < _SPREAD_MIN_POST_EXPLODE_BYTES:
        return df
    return df.repartition(max(8, n), *key_cols) if key_cols else df.repartition(max(8, n))
