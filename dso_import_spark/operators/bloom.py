"""Bloom-filter join pruning: shrink the probe side of a join BEFORE
any shuffle using a compact, distributively-built bitmap of the build
side's key set.

At 100 TB the dominant join cost is shuffling the big (probe) side.
When the join is selective — most probe rows have no match — a Bloom
filter of the build side's keys lets the probe scan drop non-matching
rows at map time, before any exchange. Spark does this internally
(``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects a runtime
``BloomFilterMightContain`` under AQE); this module is the *explicit,
engine-portable* formulation for when the pruning must be guaranteed
and testable rather than left to the optimizer's cost model.

Shape — every stage bounded or narrow:

- ``bloom_build``: map each build key to k bit positions (independent
  seeded ``xxhash64`` mod m), reduce to an m-bit bitmap packed as
  m/64 longs. Two aggregations whose state is bounded by the filter
  geometry (≤ m distinct positions, then exactly m/64 words) — the
  build side is never collected to the driver, and map-side partial
  aggregation means the exchange carries at most m rows per task.
- ``bloom_prune``: broadcast the single-row bitmap to every probe
  partition (BroadcastNestedLoopJoin of a 1-row side — a map-side
  append, not a shuffle) and keep rows where ALL k positions have
  their bit set: ``element_at(words, pos/64) >> (pos%64) & 1``.
  O(k) JVM-side bit arithmetic per row, whole-stage-codegen'd; the
  probe side is NEVER exploded, regrouped, or shuffled.

No false negatives (every true match's bits are set by construction),
so ``join(bloom_prune(probe), build) == join(probe, build)``
row-for-row — which is what makes the operator differentially testable
against a plain-join oracle. False positives only cost wasted shuffle
rows, tuned by m and k: FPR ≈ (1 - e^{-kn/m})^k.

Contrast with ``operators/quality.py:validate_fk_array``'s rejected
collect-the-reference-set shape: here the broadcast state is bounded
by the filter geometry (m bits), not by the build side's cardinality —
that bound is the entire point of a Bloom filter.

The reference has no analog (Postgres joins are node-local); this is
pure scale surface. Composes with ``operators/skew.py`` salting when
the surviving keys are hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

#: default geometry: m bits / k hashes. m=4096 → 64 longs ≈ 512 bytes
#: of broadcast state no matter the build cardinality.
DEFAULT_M = 4096
DEFAULT_K = 3


def _positions(col, m: int, k: int):
    """k bit positions for a key: xxhash64(key, seed) mod m per seed.

    Seeds 0..k-1 give k independent hash functions; the +m %m dance
    keeps positions non-negative (xxhash64 is signed).
    """
    return [(F.xxhash64(col, F.lit(i)) % m + m) % m for i in range(k)]


def bloom_build(
    build: DataFrame, key: str, m: int = DEFAULT_M, k: int = DEFAULT_K
) -> DataFrame:
    """Build the m-bit filter: 1 row, column ``__bloom_words`` =
    array of m/64 longs (word w holds bits 64w .. 64w+63).

    Stage 1 dedups positions (bounded ≤ m by geometry), stage 2 ORs
    them into per-word masks, stage 3 densifies the sparse word map
    into the fixed-length array (missing words → 0). All aggregation
    state is O(m); nothing scales with the build side.
    """
    n_words = (m + 63) // 64
    positions = (
        build.where(F.col(key).isNotNull())
        .select(F.explode(F.array(*_positions(F.col(key), m, k))).alias("__pos"))
        .distinct()
    )
    # F.shiftleft only takes a literal bit count; call_function routes
    # the SQL shiftleft, which accepts a column expression.
    bit = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
    )
    words = positions.groupBy(
        (F.col("__pos") / 64).cast("int").alias("__w")
    ).agg(F.bit_or(bit).alias("__mask"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("__w", "__mask"))).alias("__wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            # __wm is a MAP keyed by the 0-based word index (unlike the
            # 1-based array lookup in bloom_prune).
            lambda i: F.coalesce(F.element_at("__wm", i), F.lit(0).cast("long")),
        ).alias("__bloom_words")
    )


def bloom_prune(
    probe: DataFrame,
    bloom: DataFrame,
    key: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Probe rows whose key MIGHT be in the build side (all k bits
    set). NULL keys are dropped (a NULL key never equi-joins).

    The 1-row bitmap rides in on a broadcast nested-loop append; the
    bit tests are pure Column arithmetic — no UDF, no shuffle, no
    change to probe partitioning. The probe schema must not already
    contain ``__bloom_words`` (reserved working column).
    """
    if "__bloom_words" in probe.columns:
        raise ValueError(
            "probe already has a __bloom_words column (reserved)"
        )
    checks = [
        (
            F.call_function(
                "shiftright",
                F.element_at(F.col("__bloom_words"), (pos / 64).cast("int") + 1),
                (pos % 64).cast("int"),
            ).bitwiseAND(F.lit(1).cast("long"))
            == 1
        )
        for pos in _positions(F.col(key), m, k)
    ]
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return (
        probe.where(F.col(key).isNotNull())
        .crossJoin(broadcast(bloom))
        .where(cond)
        .drop("__bloom_words")
    )


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Inner equi-join with the probe side Bloom-pruned first.

    Same matched pairs as ``probe.join(build, probe.probe_key ==
    build.build_key)`` — the filter has no false negatives — but the
    probe side entering the join exchange carries only might-match
    rows. Like that expression join, the result retains BOTH key
    columns (``probe_key`` and ``build_key``); select/drop one if the
    coalesced single-key shape is wanted.
    """
    pt = dict(probe.dtypes)[probe_key]
    bt = dict(build.dtypes)[build_key]
    if pt != bt:
        # xxhash64 is TYPE-sensitive: hashing int 7 and bigint 7 sets
        # different bits, so a type mismatch silently prunes TRUE
        # matches (the plain join would implicitly cast) — fail loudly
        raise ValueError(
            f"bloom key type mismatch: probe {probe_key} is {pt}, "
            f"build {build_key} is {bt} — cast one side first"
        )
    bloom = bloom_build(build, build_key, m, k)
    pruned = bloom_prune(probe, bloom, probe_key, m, k)
    return pruned.join(build, pruned[probe_key] == build[build_key], "inner")
