"""The BAGH import job: 15 tables, FK-dependency-ordered, SCD2 merge.

Spark re-expression of the reference's job/task lifecycle
(/root/reference/src/dso_import/batch/batch.py:10-72,
bagh/batch.py:42-137,459-592):

per table:  read CSV as strings → column-expression transforms
            (parsers/geometry) → FK semi-join validation →
            staged DataFrame → gates (Q1 abort / Q2 warn / Q3 drop /
            Q7 abort) → Q4 never-delete check → insert-new /
            update-changed merge → atomic table swap.

The reference's Python-set FK probe (bagh/batch.py:77-82) becomes a
broadcast semi/anti join; its staging temp table becomes a lazy
DataFrame; its transactional INSERT+UPDATE becomes plan_merge + a
two-phase parquet directory swap. Task order is the only sequential
part — each table's FK build side reads previously *written* tables,
which is also what makes ``--start <table>`` resume work
(run_import.py:31-51, batch/batch.py:19-30).

Scale notes: staged tables write partitioned by a stable hash bucket
of ``identificatie`` so reruns shuffle-merge on a co-located key; FK
id projections are tiny and broadcast; nothing ever collects rows to
the driver (reject flows are counted, optionally sampled for logs).
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dso_import_spark.functions.geometry import coerce_wkt
from dso_import_spark.functions.parsers import (
    create_id,
    parse_date,
    parse_date_time,
    parse_yesno_boolean,
)
from dso_import_spark.operators.merge import execute_merge
from dso_import_spark.operators.quality import (
    duplicate_keys,
    duplicate_open_intervals,
    overlapping_intervals,
    split_valid_date_range,
    validate_fk,
)
from dso_import_spark.schemas.bagh import (
    BAGH_SCHEMAS,
    MODEL_FIELD_MAP,
    TABLE_CONFIGS,
    TABLE_ORDER,
    TableConfig,
)

log = logging.getLogger(__name__)

# optional scalar columns copied when present in the CSV
# (bagh/batch.py:191-208)
_OPTIONAL_PLAIN = ("naam", "code", "status", "type")
_GEMEENTE_ROW = ("0363", 1, "1900-01-01 00:00:00+00", "1900-01-01", None, "Amsterdam", True)


class Warehouse:
    """Parquet-directory table store with atomic two-phase swap.

    Spark reads lazily, so overwriting the files of a table that is an
    input of the running plan corrupts it (SURVEY.md §7 hard part (c)).
    Writes land in ``<table>.__tmp`` and are renamed over the live
    directory only after the job for that table fully materialized.
    """

    def __init__(
        self,
        root: str,
        n_buckets: int = 16,
        schemas: dict | None = None,
    ):
        self.root = root
        self.n_buckets = n_buckets
        # table registry: defaults to the declared StructTypes; a JSON
        # dataset document (schemas/loader.py) may override — the
        # runtime-schema path mirroring the reference's create_models()
        # (bagh/batch.py:451-454)
        self.schemas = schemas if schemas is not None else BAGH_SCHEMAS
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        from pyspark.errors.exceptions.captured import AnalysisException

        try:
            return spark.read.parquet(self.path(name))
        except AnalysisException:
            # only a genuinely EMPTY table directory (created by
            # create_tables, no data files yet) may read as empty. A
            # directory that HAS data files but still fails analysis is
            # damaged (lost footers, partial copy) — reading it as
            # empty would bypass the Q4 never-delete gate (zero
            # existing rows → nothing can be 'deleted') and the next
            # write() would replace what remains of the real history
            # with a fresh load (round-8 review). Fail loudly instead.
            p = self.path(name)
            data_files = [
                fn
                for fn in (os.listdir(p) if os.path.isdir(p) else [])
                if not fn.startswith(("_", "."))
            ]
            if data_files:
                raise
            return spark.createDataFrame([], self.schemas[name])

    def read_or_empty(self, spark: SparkSession, name: str) -> DataFrame:
        if self.exists(name):
            return self.read(spark, name)
        return spark.createDataFrame([], self.schemas[name])

    def write(self, df: DataFrame, name: str) -> None:
        """Two-phase: materialize fully, then swap directories."""
        tmp = self.path(f"{name}.__tmp")
        # partition by a stable identificatie hash bucket: reruns of the
        # merge join co-locate on the same key space, and point lookups
        # by natural key prune to one bucket
        if "identificatie" in df.columns:
            df = df.withColumn(
                "bucket", F.pmod(F.xxhash64("identificatie"), self.n_buckets)
            )
            df.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        else:
            df.write.mode("overwrite").parquet(tmp)
        live = self.path(name)
        old = self.path(f"{name}.__old")
        # double-rename swap, never rmtree-then-replace: a crash inside
        # the old window left NO live table, and the next run's
        # read_or_empty would silently restart history from empty
        # (the Q4 never-delete gate can't fire against an empty table).
        # Recovery: roll a stranded .__old back before swapping.
        if os.path.isdir(old) and not os.path.isdir(live):
            os.rename(old, live)
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(live):
            os.rename(live, old)
        os.replace(tmp, live)
        if os.path.isdir(old):
            shutil.rmtree(old)

    def create_tables(self, spark: SparkSession) -> None:
        """S6 DDL analog: (re)create all 15 tables empty from the
        StructType registry (CreateBagHTables, bagh/batch.py:276-287)."""
        for name, schema in self.schemas.items():
            self.write(spark.createDataFrame([], schema), name)


@dataclass
class StagedTable:
    staged: DataFrame
    rejected_bad_range: DataFrame  # Q3 drops
    rejected_geometry: DataFrame  # Q6 drops
    rejected_fk: dict[str, DataFrame] = field(default_factory=dict)  # Q5 drops
    # the cached post-projection DF every split/count/merge reads from,
    # so the CSV is scanned and transformed exactly once per table;
    # callers unpersist it when the table's lifecycle completes
    source: DataFrame | None = None


def _raw_col(raw: DataFrame, name: str):
    """Raw GOB headers contain ':' and '.' — always exact-name lookup."""
    return raw[f"`{name}`"]


def stage_table(
    cfg: TableConfig,
    raw: DataFrame,
    ref_ids: dict[str, DataFrame],
    schema=None,
) -> StagedTable:
    """process_row_common (bagh/batch.py:154-240) as one lazy DAG.

    Every reference row-loop decision becomes a Column expression or a
    join, so the whole transform is a single scan-project stage plus
    one broadcast semi-join per FK reference.
    """
    cols = set(raw.columns)
    schema = schema if schema is not None else BAGH_SCHEMAS[cfg.name]
    target_fields = {f.name: f for f in schema.fields}

    df = raw
    # temporal core (bagh/batch.py:154-173)
    exprs: dict[str, object] = {
        "identificatie": df["identificatie"],
        "volgnummer": df["volgnummer"].cast("short"),
        "id": create_id(df["identificatie"], df["volgnummer"]),
        "begin_geldigheid": parse_date(df["beginGeldigheid"]),
        "eind_geldigheid": parse_date(df["eindGeldigheid"]),
        "registratiedatum": parse_date_time(df["registratiedatum"]),
    }
    if "geometrie" in cols and "geometrie" in target_fields:
        exprs["geometrie"] = coerce_wkt(df["geometrie"], cfg.geotype)
        exprs["__geo_raw"] = df["geometrie"]
    for c in _OPTIONAL_PLAIN:
        if c in cols and c in target_fields:
            exprs[c] = df[c]
    if "documentdatum" in cols and "documentdatum" in target_fields:
        exprs["documentdatum"] = parse_date(df["documentdatum"])
        exprs["documentnummer"] = df["documentnummer"]
    if "aanduidingInOnderzoek" in cols and "aanduiding_in_onderzoek" in target_fields:
        exprs["aanduiding_in_onderzoek"] = parse_yesno_boolean(
            df["aanduidingInOnderzoek"]
        )
    if "geconstateerd" in cols and "geconstateerd" in target_fields:
        exprs["geconstateerd"] = parse_yesno_boolean(df["geconstateerd"])
    for name, fn in cfg.extra_fields.items():
        exprs[name] = fn(df)
    # FK surrogate ids (bagh/batch.py:226-238); missing volgnummer → "1"
    for ref in cfg.references:
        fname = MODEL_FIELD_MAP[ref]
        ident = _raw_col(df, f"{fname}.identificatie")
        volg = F.coalesce(_raw_col(df, f"{fname}.volgnummer"), F.lit("1"))
        exprs[f"{ref}_id"] = create_id(ident, volg)

    projected = df.select([c.alias(n) if hasattr(c, "alias") else F.lit(c).alias(n) for n, c in exprs.items()])
    # cache the projection: the Q3/Q6 splits, every FK semi/anti join,
    # the reject counts, and the staged materialization below all share
    # this subtree — without the cache each reject count re-reads and
    # re-transforms the CSV (one scan per count instead of one total)
    projected = projected.cache()

    # NULL surrogate key → drop row. The reference fails fast here
    # (int('') raises before any row is written, bagh/batch.py:20-21 /
    # csv row parse); a lazily-validated port must not be SOFTER: a
    # committed NULL-id row never matches itself in the next run's
    # merge join, so plan_merge would see it as a deletion and the Q4
    # never-delete gate would abort every subsequent run. Reject the
    # row into the bad-range channel (counted, quarantined) instead.
    null_key = projected.filter(F.col("id").isNull())
    projected_keyed = projected.filter(F.col("id").isNotNull())

    # Q3: invalid validity range → drop row (bagh/batch.py:160-164)
    kept, rejected_range = split_valid_date_range(projected_keyed)
    rejected_range = rejected_range.unionByName(null_key)

    # Q6: non-empty WKT that failed parse/coercion → drop row
    # (empty stays NULL and is allowed; bagh/batch.py:175-189)
    if "__geo_raw" in kept.columns:
        bad_geo = kept.filter(
            F.col("__geo_raw").isNotNull() & F.col("geometrie").isNull()
        ).drop("__geo_raw")
        kept = kept.filter(
            F.col("__geo_raw").isNull() | F.col("geometrie").isNotNull()
        ).drop("__geo_raw")
        rejected_range = rejected_range.drop("__geo_raw")
    else:
        bad_geo = kept.limit(0)

    # Q5: every FK with a non-NULL id must resolve, else drop the row;
    # NULL FK passes (bagh/batch.py:231). Build sides are id
    # projections of already-written tables → broadcast semi-joins.
    rejected_fk: dict[str, DataFrame] = {}
    for ref in cfg.references:
        kept, rejected_fk[ref] = validate_fk(
            kept, ref_ids[ref], f"{ref}_id"
        )

    # conform to the target schema: add missing columns as typed NULLs,
    # cast, and order
    out_cols = []
    for f_ in schema.fields:
        if f_.name in kept.columns:
            out_cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
        else:
            out_cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
    return StagedTable(
        staged=kept.select(out_cols),
        rejected_bad_range=rejected_range,
        rejected_geometry=bad_geo,
        rejected_fk=rejected_fk,
        source=projected,
    )


def gemeente_literal(spark: SparkSession, schema=None) -> DataFrame:
    """S5 literal source: hardcoded gemeente Amsterdam
    (bagh/batch.py:290-317)."""
    r = _GEMEENTE_ROW
    row = {
        "id": f"{r[0]}_{r[1]:03}",
        "identificatie": r[0],
        "volgnummer": r[1],
        "registratiedatum": r[2],
        "begin_geldigheid": r[3],
        "eind_geldigheid": r[4],
        "naam": r[5],
        "verzorgingsgebied": r[6],
    }
    df = spark.createDataFrame(
        [tuple(row.values())],
        "id string, identificatie string, volgnummer int, registratiedatum string,"
        " begin_geldigheid string, eind_geldigheid string, naam string,"
        " verzorgingsgebied boolean",
    )
    schema = schema if schema is not None else BAGH_SCHEMAS["gemeente"]
    return df.select(
        [F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


@dataclass
class TableReport:
    table: str
    staged_rows: int
    inserted: int
    updated: int
    rejected_bad_range: int
    rejected_geometry: int
    rejected_fk: int
    overlap_warnings: int


def run_table(
    spark: SparkSession,
    warehouse: Warehouse,
    cfg: TableConfig,
    raw: DataFrame | None,
) -> TableReport:
    """One task lifecycle: stage → gates → merge → swap
    (before/process/after, batch/batch.py:47-65 + bagh/batch.py:66-137)."""
    name = cfg.name
    if name == "gemeente":
        st = StagedTable(
            staged=gemeente_literal(spark, warehouse.schemas["gemeente"]),
            rejected_bad_range=None,
            rejected_geometry=None,
        )
        n_range = n_geo = n_fk = 0
    else:
        assert raw is not None, f"no CSV for table {name}"
        ref_ids = {
            ref: warehouse.read_or_empty(spark, ref).select("id")
            for ref in cfg.references
        }
        st = stage_table(cfg, raw, ref_ids, warehouse.schemas[name])
        n_range = st.rejected_bad_range.count()
        n_geo = st.rejected_geometry.count()
        n_fk = sum(df.count() for df in st.rejected_fk.values())

    staged = st.staged.cache()
    try:
        staged_rows = staged.count()

        # Q7: staging PK uniqueness (bagh/batch.py:87)
        if duplicate_keys(staged, ["id"]).limit(1).count():
            raise ValueError(f"{name}: gate Q7 failed — duplicate ids in staging")
        # Q1: one open interval per natural key → abort (batch.py:242-257)
        if duplicate_open_intervals(staged).limit(1).count():
            raise ValueError(
                f"{name}: gate Q1 failed — multiple open eind_geldigheid"
            )
        # Q2: overlapping ranges → warn only (batch.py:260-273)
        n_overlap = overlapping_intervals(staged).count()
        if n_overlap:
            log.warning("%s: %d overlapping validity ranges", name, n_overlap)

        existing = warehouse.read_or_empty(spark, name).select(
            *[f.name for f in warehouse.schemas[name].fields]
        )
        # Q4 never-delete runs inside execute_merge (raises on violation)
        merged, res = execute_merge(existing, staged, key="id")
        warehouse.write(merged, name)
        return TableReport(
            table=name,
            staged_rows=staged_rows,
            inserted=res.inserted,
            updated=res.updated,
            rejected_bad_range=n_range,
            rejected_geometry=n_geo,
            rejected_fk=n_fk,
            overlap_warnings=n_overlap,
        )
    finally:
        staged.unpersist()
        if st.source is not None:
            st.source.unpersist()


def run_vbo_pandrelatie(
    spark: SparkSession,
    warehouse: Warehouse,
    raw_vbo: DataFrame,
) -> int:
    """X1/S10: rebuild the VBO↔pand bridge, full truncate-replace
    (bagh/batch.py:364-431, 386-394).

    Pipe-lists of pand ids explode to bridge rows; ids not resolving
    against pand are dropped element-wise (row kept) — J3. The bridge
    is fully replaced each run (README.md:29)."""
    vbo_ids = warehouse.read(spark, "verblijfsobject").select("id")
    pand_ids = F.broadcast(
        warehouse.read(spark, "pand").select(F.col("id").alias("pand_id"))
    )
    from dso_import_spark.functions.parsers import create_ids

    pairs = (
        raw_vbo.select(
            create_id(raw_vbo["identificatie"], raw_vbo["volgnummer"]).alias(
                "verblijfsobject_id"
            ),
            F.explode(
                create_ids(
                    raw_vbo["`ligtIn:BAG.PND.identificatie`"],
                    raw_vbo["`ligtIn:BAG.PND.volgnummer`"],
                )
            ).alias("pand_id"),
        )
        # only rows that survived staging (reference builds the bridge
        # from accepted rows only, batch.py:408-431)
        .join(vbo_ids, F.col("verblijfsobject_id") == vbo_ids["id"], "left_semi")
        .join(pand_ids, "pand_id", "left_semi")
    )
    bridge = pairs.select(
        F.concat_ws("_", "verblijfsobject_id", "pand_id").alias("id"),
        "pand_id",
        "verblijfsobject_id",
    )
    warehouse.write(bridge, "verblijfsobjectpandrelatie")
    # count the WRITTEN table: bridge.count() would re-execute the
    # whole explode + semi-join pipeline a second time just for the
    # return value
    return warehouse.read(spark, "verblijfsobjectpandrelatie").count()


class BagHJob:
    """O1-O4: ordered task list with resume-from (batch/batch.py:10-30)."""

    def __init__(
        self,
        spark: SparkSession,
        data_dir: str,
        warehouse_dir: str,
        schema_doc: str | None = None,
    ):
        self.spark = spark
        self.data_dir = data_dir
        schemas = None
        if schema_doc:
            # runtime schema registry: build the StructType registry from
            # a JSON dataset document at job start, exactly the
            # reference's create_models() moment (bagh/batch.py:451-454).
            # Fail FAST on a partial document — a missing table would
            # otherwise surface as a KeyError mid-job after partial work.
            from dso_import_spark.schemas.loader import load_dataset

            schemas = load_dataset(schema_doc)
            missing = [t for t in BAGH_SCHEMAS if t not in schemas]
            if missing:
                raise ValueError(
                    f"schema document {schema_doc!r} lacks configured "
                    f"tables: {missing}"
                )
        self.warehouse = Warehouse(warehouse_dir, schemas=schemas)

    def _raw(self, cfg: TableConfig) -> DataFrame | None:
        if cfg.name == "gemeente":
            return None
        from dso_import_spark.sources.csv import read_gob_csv_audited

        path = os.path.join(self.data_dir, cfg.filename)
        # strict dropped-row accounting (ADVICE r8): the reference's
        # row loop raises on the first ragged line (batch/csv.py:46-61)
        # — a silently shrunken feed must abort the task, not merge
        return read_gob_csv_audited(self.spark, path)

    def run(
        self,
        start: str | None = None,
        create: bool = False,
        tables: list[str] | None = None,
    ) -> list[TableReport]:
        if create:
            self.warehouse.create_tables(self.spark)
        order = [t for t in TABLE_ORDER if tables is None or t in tables]
        if start:
            if start not in order:
                raise ValueError(f"unknown start task {start!r}")
            order = order[order.index(start):]
        reports = []
        for name in order:
            cfg = TABLE_CONFIGS[name]
            raw = self._raw(cfg)
            report = run_table(self.spark, self.warehouse, cfg, raw)
            reports.append(report)
            log.info("%s: %s", name, report)
            if name == "verblijfsobject":
                run_vbo_pandrelatie(self.spark, self.warehouse, raw)
        return reports


def main() -> None:
    parser = argparse.ArgumentParser(description="Run the BAGH import job")
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--start", default=None, help="resume from this table")
    parser.add_argument("--create", action="store_true", help="recreate tables")
    parser.add_argument(
        "--tables", default=None, help="comma-separated subset of tables to load"
    )
    parser.add_argument(
        "--schema-doc",
        default=None,
        help="JSON dataset document to build the table registry from "
        "(defaults to the built-in declared StructTypes)",
    )
    args = parser.parse_args()

    from dso_import_spark.session import get_spark

    job = BagHJob(
        get_spark("bagh_import"), args.data_dir, args.warehouse,
        schema_doc=args.schema_doc,
    )
    tables = None
    if args.tables:
        # strip whitespace and validate like --start does: a typo or
        # an 'a, b'-style list must fail loudly, not silently skip a
        # table and exit 0 (round-8 review)
        tables = [t.strip() for t in args.tables.split(",") if t.strip()]
        unknown = [t for t in tables if t not in TABLE_ORDER]
        if unknown:
            raise ValueError(
                f"unknown --tables entries {unknown}; valid: {TABLE_ORDER}"
            )
    for r in job.run(start=args.start, create=args.create, tables=tables):
        print(r)


if __name__ == "__main__":
    main()
