"""Data-quality gates — the reference's runtime "query suite" (SURVEY.md §2.6).

Each gate is a lazy DataFrame transform returning the *violations*;
callers decide fail/warn/drop. No collects inside the operators — the
single ``count()``/``isEmpty()`` action happens at the gate check, and
the violation sets are tiny by construction (they're error rows).

Reference parity:
- Q1 duplicate open intervals   bagh/batch.py:242-257  (abort table)
- Q2 overlapping intervals      bagh/batch.py:260-273  (warn only)
- Q3 begin<=eind per row        bagh/batch.py:160-164  (drop row)
- Q4 no deleted rows            bagh/batch.py:97-110   (abort table)
- Q5 FK resolution              bagh/batch.py:226-238  (drop row)
- Q7 PK uniqueness              bagh/batch.py:87       (abort)

Scale notes: Q1/Q7 are hash aggregations with map-side partial
aggregation (one shuffle on the key). Q2 re-expresses the reference's
O(n²)-per-key theta self-join as a window ``lag`` scan — one shuffle +
sort per key instead of a join, which is the formulation that survives
100× scale. Q4/Q5 are anti/semi joins; the FK build side is a
deduplicated id projection, broadcast when small.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Q7: key groups appearing more than once → (keys, cnt).

    Replaces the reference's staging PRIMARY KEY build (bagh/batch.py:87)
    with an explicit uniqueness assertion.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def duplicate_open_intervals(
    df: DataFrame,
    natural_key: str = "identificatie",
    end_col: str = "eind_geldigheid",
) -> DataFrame:
    """Q1: >1 open validity interval per natural key (bagh/batch.py:242-257)."""
    return (
        df.filter(F.col(end_col).isNull())
        .groupBy(natural_key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def overlapping_intervals(
    df: DataFrame,
    natural_key: str = "identificatie",
    version_col: str = "volgnummer",
    begin_col: str = "begin_geldigheid",
    end_col: str = "eind_geldigheid",
) -> DataFrame:
    """Q2: versions whose validity intervals overlap, per natural key.

    The reference runs a theta self-join (bagh/batch.py:260-273):
    ``w1.begin > w2.begin AND (w1.begin < w2.eind OR w2.eind IS NULL)``
    — O(n²) per key. Scale formulation: a row overlaps some
    earlier-beginning version iff the *maximum* effective end over all
    strictly-smaller begins exceeds its begin (NULL end = open =
    +infinity). That running max is a groupBy(begin) + ordered window —
    one shuffle+sort per key instead of a self-join, and exactly the
    reference's predicate including equal-begin ties (which the strict
    ``>`` excludes). Returns the *later* row of each overlapping pair.
    """
    rows = df.select(natural_key, version_col, begin_col, end_col).filter(
        F.col(begin_col).isNotNull()
    )
    # effective end as an orderable struct: (open-flag, end); open beats any date
    eff_end = F.struct(
        F.when(F.col(end_col).isNull(), F.lit(1)).otherwise(F.lit(0)).alias("open"),
        F.col(end_col).alias("e"),
    )
    per_begin = rows.groupBy(natural_key, begin_col).agg(F.max(eff_end).alias("_m"))
    w = (
        Window.partitionBy(natural_key)
        .orderBy(begin_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    strict_prev = per_begin.withColumn("_pm", F.max("_m").over(w)).drop("_m")
    overlapped = (
        F.col("_pm").isNotNull()
        & ((F.col("_pm.open") == 1) | (F.col("_pm.e") > F.col(begin_col)))
    )
    return (
        rows.join(strict_prev, [natural_key, begin_col])
        .filter(overlapped)
        .drop("_pm")
        .select(natural_key, version_col, begin_col, end_col)
    )


def split_valid_date_range(
    df: DataFrame,
    begin_col: str = "begin_geldigheid",
    end_col: str = "eind_geldigheid",
) -> tuple[DataFrame, DataFrame]:
    """Q3: (kept, rejected) by the begin<=end predicate (drop-row gate).

    Delegates to parsers.valid_date_range — the canonical Q3 predicate
    with the reference citation — so NULL-begin/end semantics cannot
    drift between the gate and the registered query."""
    from dso_import_spark.functions.parsers import valid_date_range

    ok = valid_date_range(begin_col, end_col)
    return df.filter(ok), df.filter(~ok)


def validate_fk(
    df: DataFrame,
    ref_ids: DataFrame,
    fk_col: str,
    ref_id_col: str = "id",
    broadcast: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Q5 / J1: (valid, rejected) rows by FK resolution.

    The reference builds a Python set of referenced ids on the driver
    and probes per row (bagh/batch.py:77-82,226-238) — the anti-pattern
    that dies past driver memory. Spark-first: broadcast left_semi join
    keeps valid rows, left_anti counts rejects; NULL FK passes through
    unchecked (reference: ``id_rel is None`` skips the check, :231).
    """
    ids = ref_ids.select(F.col(ref_id_col).alias("__ref_id")).dropDuplicates()
    if broadcast:
        ids = F.broadcast(ids)
    null_fk = df.filter(F.col(fk_col).isNull())
    non_null = df.filter(F.col(fk_col).isNotNull())
    valid = non_null.join(ids, non_null[fk_col] == ids["__ref_id"], "left_semi")
    rejected = non_null.join(ids, non_null[fk_col] == ids["__ref_id"], "left_anti")
    return valid.unionByName(null_fk), rejected


def validate_fk_array(
    df: DataFrame,
    ref_ids: DataFrame,
    fk_array_col: str,
    ref_id_col: str = "id",
    broadcast: bool = True,
) -> DataFrame:
    """J3: element-level FK check on an array column.

    Keeps every row but replaces the array with only its resolving
    elements (the reference logs+drops invalid pand ids while keeping
    the row, bagh/batch.py:374-378,408-431). Scale-safe shape:
    posexplode the array, join each element against the deduplicated
    reference-id projection (broadcast when small, shuffled hash join
    otherwise), and regroup on a per-row tag. The reference-id set is
    never collected into a single driver-side row, so the build side
    may be arbitrarily large with ``broadcast=False``. Cost: one
    shuffle (the regroup); element order and duplicate elements are
    preserved via the explode position.
    """
    ids = (
        ref_ids.select(F.col(ref_id_col).alias("__ref_id"))
        .dropDuplicates()
        .withColumn("__ok", F.lit(True))
    )
    if broadcast:
        ids = F.broadcast(ids)
    tagged = df.withColumn("__rid", F.monotonically_increasing_id())
    ex = tagged.select(
        "__rid",
        F.struct(*df.columns).alias("__row"),
        F.posexplode_outer(F.col(fk_array_col)).alias("__pos", "__elem"),
    )
    flagged = ex.join(ids, ex["__elem"] == ids["__ref_id"], "left")
    regrouped = flagged.groupBy("__rid").agg(
        F.first("__row").alias("__row"),
        F.array_sort(
            F.collect_list(F.when(F.col("__ok"), F.struct("__pos", "__elem")))
        ).alias("__pe"),
    )
    # NULL array stays NULL; empty / all-invalid arrays become empty
    kept_arr = F.when(
        F.col("__row")[fk_array_col].isNull(), F.lit(None)
    ).otherwise(F.transform("__pe", lambda s: s["__elem"]))
    return regrouped.select(
        *[
            (kept_arr if c == fk_array_col else F.col("__row")[c]).alias(c)
            for c in df.columns
        ]
    )


def deleted_rows(existing: DataFrame, staged: DataFrame, key: str = "id") -> DataFrame:
    """Q4 / J4: rows in existing absent from staged (never-delete check).

    ``existing LEFT JOIN staged ON id WHERE staged.id IS NULL``
    (bagh/batch.py:97-110); any result ⇒ abort the table load.
    """
    return existing.join(staged.select(key), key, "left_anti")


@dataclass
class GateResult:
    """Outcome of running the gate suite over a staged table."""

    passed: DataFrame
    rejected_bad_range: DataFrame
    duplicate_ids: DataFrame
    duplicate_open: DataFrame
    overlaps: DataFrame

    def check(self) -> None:
        """Raise on abort-level violations (Q1, Q7); Q2 is warn-only."""
        dup = self.duplicate_ids.limit(1).count()
        if dup:
            raise ValueError("gate Q7 failed: duplicate primary keys in staging")
        open_dup = self.duplicate_open.limit(1).count()
        if open_dup:
            raise ValueError("gate Q1 failed: multiple open validity intervals")


def run_gates(
    staged: DataFrame,
    id_col: str = "id",
    natural_key: str = "identificatie",
    version_col: str = "volgnummer",
    begin_col: str = "begin_geldigheid",
    end_col: str = "eind_geldigheid",
) -> GateResult:
    """Run Q1/Q2/Q3/Q7 over a staged DataFrame (Q4/Q5 need ref tables)."""
    kept, rejected = split_valid_date_range(staged, begin_col, end_col)
    return GateResult(
        passed=kept,
        rejected_bad_range=rejected,
        duplicate_ids=duplicate_keys(kept, [id_col]),
        duplicate_open=duplicate_open_intervals(kept, natural_key, end_col),
        overlaps=overlapping_intervals(kept, natural_key, version_col, begin_col, end_col),
    )
