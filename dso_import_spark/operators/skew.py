"""Skew-mitigation operators: salting for hot keys.

At 100 TB a handful of hot keys (a viral document, a default user id)
can make one shuffle partition hold most of the data. AQE's skew-join
splitting (enabled in session.py) covers sort-merge joins at runtime;
these operators cover the two patterns AQE does not:

- ``salted_agg``: two-phase aggregation — partial aggregate on
  (key, salt) spreads a hot key over N partitions, then a final
  aggregate on key combines the N partials. Only algebraic aggregates
  (sum/count/min/max) compose this way; result is identical to a
  direct groupBy, so it is differentially testable.
- ``salted_join``: replicate the small side N× (one copy per salt
  value) and join on (key, salt) — spreads a hot probe key over N
  tasks. Used when the small side is too big to broadcast outright
  but the key distribution is heavily skewed.

The reference never hits this (Postgres handles its ≤500k rows), but
its FK-validation joins (SURVEY.md §2.4 J1-J3) are exactly the shape
that skews at scale: millions of children referencing one parent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Add a uniform deterministic salt derived from the whole row.

    Deterministic (xxhash64 of all columns, not rand()) so retries and
    speculative tasks produce identical partitioning.
    """
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), n_salts)
    )


_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(c),
    "min": F.min,
    "max": F.max,
}
# how partials of each kind combine in the final phase
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation over algebraic aggregates.

    ``aggs`` maps output name → (kind, input column) with kind in
    {sum, count, min, max}: partial aggregate on (keys, salt), then
    the matching combiner on keys. Result is identical to a direct
    ``df.groupBy(keys).agg(...)``.
    """
    partial = with_salt(df, n_salts).groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[kind](col).alias(f"__p_{name}")
            for name, (kind, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[kind](F.col(f"__p_{name}")).alias(name)
            for name, (kind, _col) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    big gets a deterministic salt per row; small is exploded to one
    copy per salt value so every (key, salt) bucket finds its match.
    Shuffle volume for the small side grows n_salts×, but the hot key's
    probe rows spread over n_salts tasks instead of one.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi",
                   "left_semi", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join(how={how!r}): joins preserving the REPLICATED "
            "small side would emit each unmatched small row n_salts "
            "times — use inner/left-family joins, or salt the other way"
        )
    salted_big = with_salt(big, n_salts)
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_big.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
