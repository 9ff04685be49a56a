"""SCD2-style incremental merge engine (SURVEY.md §2.4 J4-J6, §2.1 S10).

The reference merges a staged temp table into the target with three SQL
statements inside one transaction (bagh/batch.py:97-132):

- J4 delete-detection: history must never lose rows — any existing id
  absent from staging aborts the load (``:97-110``).
- J5 insert-new: staged ids absent from existing are appended
  (``:112-120``).
- J6 update-changed: rows whose *whole tuple* differs (NULL-safe,
  Postgres ``t IS DISTINCT FROM e``) get every non-PK column updated
  (``:121-130``).

Spark-first re-expression: one full-outer-shaped plan built from
anti/inner joins on ``id`` producing (inserted, updated, unchanged)
plus a MergeResult of counts, then an atomic overwrite of the target.
NULL-safe whole-row comparison uses ``eqNullSafe`` over structs of the
non-key columns — array columns included (struct equality recurses).

Scale notes: both sides shuffle on ``id`` once; the three outputs are
derived from the same joined relation so Catalyst reuses the exchange.
At 100 TB the target would be a partitioned/bucketed table on ``id``
so the merge join is co-located; with Delta available this whole module
becomes ``MERGE INTO`` — the gate semantics (J4 as a pre-check) stay.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MergePlan:
    """Lazy merge outputs; nothing is executed until an action runs."""

    inserted: DataFrame  # staged rows with no existing id (J5)
    updated: DataFrame  # staged rows whose tuple differs from existing (J6)
    unchanged: DataFrame  # existing rows identical in staging
    deleted: DataFrame  # existing ids missing from staging (J4) — must be empty
    merged: DataFrame  # the post-merge table contents
    # 1-row (n_inserted, n_updated, n_deleted, n_merged) derived from
    # ONE pass over the classification join (round 14): counting via
    # the four wide outputs costs one full classify-join subtree EACH
    # (Catalyst reuses exchanges inside one plan but still plans and
    # runs the join per branch — merge_insert_update measured 15 jobs
    # / 3 SortMergeJoin subtrees). Counts equal the wide outputs'
    # counts whenever keys are unique on both sides (the precondition
    # merge_counts_narrow already documents); in fingerprint mode the
    # changed/unchanged split shares that mode's 2^-64 collision bound.
    counts: DataFrame | None = None


# non-key column count at/above which plan_merge's "auto" compare
# switches to the narrow fingerprint path (the shuffle is width-bound:
# SCALING.md measured the full-row compare at 28× for 100× data)
NARROW_WIDTH = 4


def plan_merge(
    existing: DataFrame,
    staged: DataFrame,
    key: str = "id",
    compare: str = "auto",
) -> MergePlan:
    """Build the insert-new / update-changed / never-delete merge plan.

    Column sets of both sides must match (enforced). The merged output
    is existing-unchanged ∪ staged-changed ∪ staged-new — i.e. exactly
    what Postgres holds after the reference's transaction.

    ``compare`` picks the change-detection plan:

    - ``"exact"`` — full-width join on ``key``, NULL-safe whole-tuple
      struct compare (Postgres ``IS DISTINCT FROM``). The shuffle
      carries full row width on both sides.
    - ``"fingerprint"`` — the 100 TB path: both sides first project to
      ``(key, 64-bit NULL-safe fingerprint)``, one NARROW full-outer
      join classifies every key as new/changed/unchanged/deleted, and
      the wide outputs come from key semi-joins back into the original
      relations (Catalyst prunes those to the key column when a
      consumer only counts). The changed/unchanged split can miscount
      with probability 2^-64 per matched pair (fingerprint collision);
      ``merged`` content is exact regardless — every key's surviving
      row is the staged row, and fp-equal rows are content-equal up to
      that same bound, so ``merged`` IS the staged relation.
    - ``"auto"`` (default) — ``fingerprint`` when the table has >=
      ``NARROW_WIDTH`` non-key columns, else ``exact``.

    In exact mode the ``unchanged`` output carries the EXISTING rows,
    in fingerprint mode the staged rows — content-equal by definition
    of unchanged.

    The staged side is renamed (``__s_`` prefix) before joining, so the
    plan stays unambiguous even when ``staged`` is derived from
    ``existing`` itself (a self-join lineage Spark otherwise rejects).
    """
    if set(existing.columns) != set(staged.columns):
        raise ValueError(
            f"column mismatch: existing={sorted(existing.columns)} "
            f"staged={sorted(staged.columns)}"
        )
    # types must match too: xxhash64 is TYPE-sensitive, so an int vs
    # bigint column silently marks every content-equal matched row as
    # changed in fingerprint mode (and exact mode fails with an opaque
    # struct-compare AnalysisException) — fail loudly instead
    et, st_ = dict(existing.dtypes), dict(staged.dtypes)
    mismatched = {c: (et[c], st_[c]) for c in et if et[c] != st_[c]}
    if mismatched:
        raise ValueError(
            f"dtype mismatch between existing and staged: {mismatched}"
            " — cast one side to the other's schema first"
        )
    cols = existing.columns
    non_key = [c for c in cols if c != key]
    if compare not in ("auto", "exact", "fingerprint"):
        raise ValueError(f"unknown compare mode: {compare!r}")
    if compare == "auto":
        compare = "fingerprint" if len(non_key) >= NARROW_WIDTH else "exact"
    if compare == "fingerprint":
        return _plan_merge_narrow(existing, staged, key, cols, non_key)
    s = staged.select([F.col(c).alias(f"__s_{c}") for c in cols])
    skey = F.col(f"__s_{key}")

    inserted = s.join(existing, skey == existing[key], "left_anti").select(
        [F.col(f"__s_{c}").alias(c) for c in cols]
    )
    deleted = existing.join(s, existing[key] == skey, "left_anti")

    matched = s.join(existing, skey == existing[key], "inner")
    # NULL-safe whole-tuple compare — Postgres `t IS DISTINCT FROM e`
    # (bagh/batch.py:127); struct eqNullSafe recurses into arrays.
    changed = ~F.struct(*[F.col(f"__s_{c}") for c in non_key]).eqNullSafe(
        F.struct(*[F.col(c) for c in non_key])
    )
    updated = matched.filter(changed).select(
        [F.col(f"__s_{c}").alias(c) for c in cols]
    )
    unchanged = matched.filter(~changed).select(cols)

    merged = unchanged.unionByName(updated).unionByName(inserted)
    # one full-outer pass classifies every key for the counts — the
    # same IS DISTINCT FROM compare the wide outputs apply. The
    # existing side is renamed (__e_ prefix) like the staged side:
    # post-join references into an un-renamed side trip Spark's
    # ambiguous-self-join detection when staged derives from existing
    e2 = existing.select([F.col(c).alias(f"__e_{c}") for c in cols])
    ekey = F.col(f"__e_{key}")
    full = s.join(e2, skey == ekey, "full_outer")
    changed_full = ~F.struct(
        *[F.col(f"__s_{c}") for c in non_key]
    ).eqNullSafe(F.struct(*[F.col(f"__e_{c}") for c in non_key]))
    counts = full.agg(
        F.count(F.when(ekey.isNull(), 1)).alias("n_inserted"),
        F.count(
            F.when(skey.isNotNull() & ekey.isNotNull() & changed_full, 1)
        ).alias("n_updated"),
        F.count(F.when(skey.isNull(), 1)).alias("n_deleted"),
        F.count(F.when(skey.isNotNull(), 1)).alias("n_merged"),
    )
    return MergePlan(
        inserted=inserted,
        updated=updated,
        unchanged=unchanged,
        deleted=deleted,
        merged=merged,
        counts=counts,
    )


def _plan_merge_narrow(
    existing: DataFrame,
    staged: DataFrame,
    key: str,
    cols: list[str],
    non_key: list[str],
) -> MergePlan:
    """Fingerprint-mode plan body (see plan_merge): narrow classify,
    then key semi-joins back into the wide relations."""
    # both narrow sides rename the key: existing/staged often share
    # lineage (staged derived from existing), and distinct names keep
    # every later join free of ambiguous-self-join resolution
    e = existing.select(
        F.col(key).alias("__ke"), row_fingerprint(non_key).alias("__fp_e")
    )
    s = staged.select(
        F.col(key).alias("__ks"), row_fingerprint(non_key).alias("__fp_s")
    )
    cls = s.join(e, F.col("__ks") == F.col("__ke"), "full_outer").select(
        F.coalesce(F.col("__ks"), F.col("__ke")).alias("__k"),
        F.col("__fp_e").isNull().alias("__is_new"),
        F.col("__fp_s").isNull().alias("__is_del"),
        (
            F.col("__fp_e").isNotNull()
            & F.col("__fp_s").isNotNull()
            & (F.col("__fp_e") != F.col("__fp_s"))
        ).alias("__is_chg"),
    )

    def back(wide: DataFrame, flag) -> DataFrame:
        keys = cls.filter(flag).select("__k")
        return wide.join(
            keys, F.col(key) == F.col("__k"), "left_semi"
        ).select(cols)

    new, chg, dele = F.col("__is_new"), F.col("__is_chg"), F.col("__is_del")
    counts = cls.agg(
        F.count(F.when(new, 1)).alias("n_inserted"),
        F.count(F.when(chg, 1)).alias("n_updated"),
        F.count(F.when(dele, 1)).alias("n_deleted"),
        F.count(F.when(~dele, 1)).alias("n_merged"),
    )
    return MergePlan(
        inserted=back(staged, new),
        updated=back(staged, chg),
        unchanged=back(staged, ~new & ~dele & ~chg),
        deleted=back(existing, dele),
        merged=staged.select(cols),  # content-exact: see plan_merge doc
        counts=counts,
    )


@dataclass
class MergeResult:
    inserted: int
    updated: int
    deleted: int


def row_fingerprint(cols: list[str]) -> F.Column:
    """64-bit NULL-safe fingerprint of the named columns.

    Interleaves each value with its ``isNull()`` indicator before
    hashing: Spark's hash functions fold NULL fields as a no-op, so
    ``('x', NULL)`` and ``(NULL, 'x')`` would otherwise collide
    structurally. The indicators (never NULL themselves) segment the
    fold, leaving only the generic 2^-64 collision bound per pair.
    """
    if not cols:
        # key-only table (membership SCD): every matched pair is
        # content-equal by definition — a constant fingerprint says so
        # (xxhash64 with zero args is an analysis error)
        return F.lit(0).cast("bigint")
    parts: list[F.Column] = []
    for c in cols:
        parts.append(F.col(c))
        parts.append(F.col(c).isNull())
    return F.xxhash64(*parts)


def merge_counts_narrow(
    existing: DataFrame, staged: DataFrame, key: str = "id"
) -> DataFrame:
    """Counts-only merge plan with narrow shuffles — the 100 TB path.

    ``plan_merge``'s merged output is contentwise identical to
    ``staged`` whenever keys are unique (unchanged rows are, by
    definition of the whole-tuple compare, equal on both sides; updated
    and inserted take the staged side) — so at scale nothing needs the
    full-width join: the table write is ``staged`` itself and only the
    J4/J5/J6 *counts* join. This plan projects both sides to
    ``(key, fingerprint)`` before shuffling, so the exchange carries
    ~16 bytes/row instead of the full row width (measured at ×100
    fixture scale, 6M-row orders both sides: 49.5 s exact plan →
    7.2 s narrow, same session; SCALING.md).

    Trade-off vs ``plan_merge``: the update-changed compare is a 64-bit
    fingerprint equality, not ``eqNullSafe`` — a colliding changed row
    is miscounted as unchanged with probability 2^-64 per matched pair.
    Counts only; the persisted data is exact either way.

    Returns a 1-row DataFrame (n_inserted, n_updated, n_deleted,
    n_merged).
    """
    non_key = [c for c in existing.columns if c != key]
    e = existing.select(F.col(key), row_fingerprint(non_key).alias("__fp_e"))
    s = staged.select(F.col(key), row_fingerprint(non_key).alias("__fp_s"))
    joined = s.join(e, key, "full_outer")
    return joined.agg(
        F.count(F.when(F.col("__fp_e").isNull(), 1)).alias("n_inserted"),
        F.count(
            F.when(
                F.col("__fp_e").isNotNull()
                & F.col("__fp_s").isNotNull()
                & (F.col("__fp_e") != F.col("__fp_s")),
                1,
            )
        ).alias("n_updated"),
        F.count(F.when(F.col("__fp_s").isNull(), 1)).alias("n_deleted"),
        F.count(F.when(F.col("__fp_s").isNotNull(), 1)).alias("n_merged"),
    )


def execute_merge(
    existing: DataFrame,
    staged: DataFrame,
    key: str = "id",
    allow_delete: bool = False,
) -> tuple[DataFrame, MergeResult]:
    """Run the merge; raise on the never-delete invariant like the reference.

    Returns (merged DataFrame, counts). The caller owns persisting
    ``merged`` — when the target is also an input (overwrite-in-place),
    write to a fresh location or checkpoint first (SURVEY.md §7 hard
    part (c)): Spark reads lazily, so overwriting the files you are
    reading corrupts the plan.
    """
    plan = plan_merge(existing, staged, key)
    # ONE classification pass for all three counts (round 14): the
    # previous union of the three wide outputs ran inside one job but
    # still planned and executed the classify join once per branch
    row = plan.counts.collect()[0]
    n_deleted = int(row["n_deleted"])
    if n_deleted and not allow_delete:
        raise ValueError(
            f"gate Q4 failed: {n_deleted} existing rows missing from staging "
            "(history table must never lose rows; bagh/batch.py:97-110)"
        )
    result = MergeResult(
        inserted=int(row["n_inserted"]),
        updated=int(row["n_updated"]),
        deleted=n_deleted,
    )
    return plan.merged, result


def replace_table(staged: DataFrame) -> DataFrame:
    """S10 truncate-replace semantics (M:N bridge, bagh/batch.py:390-392).

    In Spark the "transaction" is the atomic ``mode('overwrite')`` write
    the caller performs; the operator itself is the identity over the
    staged relation.
    """
    return staged


def bridge_rows(
    vbo: DataFrame,
    id_col: str = "id",
    array_col: str = "pand_ids",
) -> DataFrame:
    """X1: explode an id-array into M:N bridge rows (bagh/batch.py:396-431).

    Output schema mirrors bagh_verblijfsobjectpandrelatie
    (bagh_create.sql:325-333): surrogate ``id = {vbo_id}_{pand_id}``.
    The reference buffers rows in a driver-side defaultdict and flushes
    50k batches; here it is a narrow explode — no shuffle at all.
    """
    return vbo.select(
        F.col(id_col).alias("verblijfsobject_id"),
        F.explode(F.col(array_col)).alias("pand_id"),
    ).select(
        F.concat_ws("_", "verblijfsobject_id", "pand_id").alias("id"),
        "verblijfsobject_id",
        "pand_id",
    )
