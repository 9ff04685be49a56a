"""End-to-end tests of the BAGH import job against the synthetic GOB
fixture: gate behaviors Q1-Q7, geometry coercion, SCD2 merge replay,
never-delete abort, resume semantics, and the M:N bridge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dso_import_spark.plans.bagh_job import BagHJob
from tests.bagh_fixture import generate

TABLES = ["buurt", "pand", "verblijfsobject"]


@pytest.fixture(scope="module")
def job_v1(spark, tmp_path_factory):
    data = tmp_path_factory.mktemp("gob_v1")
    wh = tmp_path_factory.mktemp("warehouse")
    generate(str(data))
    job = BagHJob(spark, str(data), str(wh))
    reports = {r.table: r for r in job.run(create=True, tables=TABLES)}
    return job, reports


def test_staging_counts_and_gates(job_v1):
    job, reports = job_v1
    b = reports["buurt"]
    # 20 keys x 3 versions + BU0001 v4 + BU0004 v9 (empty geom kept);
    # BU0002 v9 dropped by Q3, BU0003 v9 dropped by Q6
    assert b.staged_rows == 62
    assert b.rejected_bad_range == 1
    assert b.rejected_geometry == 1
    assert b.overlap_warnings >= 1  # Q2 warn-only
    assert reports["pand"].staged_rows == 30
    v = reports["verblijfsobject"]
    assert v.staged_rows == 41  # 40 good + VB9998 (bad pand element kept)
    assert v.rejected_fk == 1  # VB9999 dangling buurt → dropped


def test_geometry_coercion(job_v1, spark):
    job, _ = job_v1
    buurt = job.warehouse.read(spark, "buurt")
    geoms = buurt.filter(F.col("geometrie").isNotNull())
    # all POLYGON inputs were wrapped: everything stored is MULTIPOLYGON
    assert geoms.filter(~F.col("geometrie").startswith("MULTIPOLYGON")).count() == 0
    # the empty-geometry row survived with NULL geometry
    null_geo = buurt.filter(
        (F.col("identificatie") == "BU0004") & (F.col("volgnummer") == 9)
    )
    assert null_geo.count() == 1
    assert null_geo.filter(F.col("geometrie").isNull()).count() == 1


def test_scalar_parsers_applied(job_v1, spark):
    job, _ = job_v1
    vbo = job.warehouse.read(spark, "verblijfsobject")
    # P4: junk 'abc' oppervlakte → NULL; negative '-1' → NULL (isdigit parity)
    assert vbo.filter(F.col("oppervlakte").isNull()).count() > 0
    assert vbo.filter(F.col("laagste_bouwlaag").isNotNull()).count() == 0
    # P7 tri-state: some NULL aanduiding_in_onderzoek (empty input), none False→NULL collapse
    flags = {
        r["aanduiding_in_onderzoek"]
        for r in vbo.select("aanduiding_in_onderzoek").distinct().collect()
    }
    assert None in flags and False in flags
    # P10: pipe-split arrays; '' → empty array not NULL
    assert vbo.filter(F.col("toegang").isNull()).count() == 0
    assert vbo.filter(F.size("gebruiksdoel") == 2).count() > 0
    # P2/P3: surrogate ids
    row = vbo.filter(F.col("identificatie") == "VB0006").head()
    assert row["id"] == "VB0006_001"
    assert row["heeftin_hoofdadres_id"] == "NA0006_001"
    assert row["heeftin_nevenadres_id"] == ["NA0006_001", "NB0006_002"]


def test_bridge_full_replace(job_v1, spark):
    job, _ = job_v1
    bridge = job.warehouse.read(spark, "verblijfsobjectpandrelatie")
    # 40 good VBOs x 2 pand ids + VB9998 with 1 surviving element
    assert bridge.count() == 81
    assert bridge.select("id").distinct().count() == 81
    one = bridge.filter(F.col("verblijfsobject_id") == "VB9998_001")
    assert [r["pand_id"] for r in one.collect()] == ["PD0001_001"]


def test_merge_replay_and_idempotence(job_v1, spark, tmp_path_factory):
    job, _ = job_v1
    # replay v1 unchanged → fully idempotent
    r2 = {r.table: r for r in job.run(tables=TABLES)}
    assert r2["buurt"].inserted == 0 and r2["buurt"].updated == 0
    assert r2["verblijfsobject"].inserted == 0 and r2["verblijfsobject"].updated == 0

    # v2: BU0005 renamed (update), BU0006 v3 closed (update) + v4 new (insert)
    data_v2 = tmp_path_factory.mktemp("gob_v2")
    generate(str(data_v2), v2=True)
    job_v2 = BagHJob(spark, str(data_v2), str(job.warehouse.root))
    r3 = {r.table: r for r in job_v2.run(tables=["buurt"])}
    assert r3["buurt"].inserted == 1
    assert r3["buurt"].updated == 2

    merged = job.warehouse.read(spark, "buurt")
    assert merged.filter(F.col("naam") == "Buurt 5 renamed").count() == 1
    assert merged.filter(F.col("id") == "BU0006_004").count() == 1
    # never-delete: all v1 rows still present
    assert merged.count() == 63  # 62 + BU0006_004


def test_never_delete_aborts(spark, tmp_path_factory):
    data = tmp_path_factory.mktemp("gob_del_v1")
    wh = tmp_path_factory.mktemp("warehouse_del")
    generate(str(data))
    job = BagHJob(spark, str(data), str(wh))
    job.run(create=True, tables=["buurt"])

    data2 = tmp_path_factory.mktemp("gob_del_v2")
    generate(str(data2), drop=("BU0010", 1))
    job2 = BagHJob(spark, str(data2), str(wh))
    with pytest.raises(ValueError, match="Q4"):
        job2.run(tables=["buurt"])
    # aborted table unchanged (two-phase write never swapped)
    assert job.warehouse.read(spark, "buurt").count() == 62


def test_q1_gate_aborts(spark, tmp_path_factory):
    # two open intervals for one key → abort before any write
    import csv as _csv

    from tests.bagh_fixture import BUURT_HEADERS, buurt_rows, write_csv

    data = tmp_path_factory.mktemp("gob_q1")
    wh = tmp_path_factory.mktemp("warehouse_q1")
    rows = buurt_rows()
    rows.append({**rows[2], "volgnummer": 8, "beginGeldigheid": "2019-01-01",
                 "eindGeldigheid": ""})  # second open interval for BU0001
    write_csv(str(data / "GBD_buurt_ActueelEnHistorie.csv"), BUURT_HEADERS, rows)
    job = BagHJob(spark, str(data), str(wh))
    with pytest.raises(ValueError, match="Q1"):
        job.run(create=True, tables=["buurt"])


def test_resume_from(job_v1, spark, tmp_path_factory):
    # resume = slice the task list; FK sides come from the warehouse
    job, _ = job_v1
    reports = job.run(tables=TABLES, start="verblijfsobject")
    assert [r.table for r in reports] == ["verblijfsobject"]
    assert reports[0].inserted == 0  # nothing changed


def test_null_surrogate_key_is_rejected(spark, tmp_path_factory):
    """A row with an empty identificatie must be quarantined at
    staging, never committed: a NULL-id row poisons the next run's
    merge (NULL keys match nothing, so the never-delete gate would
    abort every subsequent import)."""
    from dso_import_spark.plans.bagh_job import stage_table
    from dso_import_spark.schemas.bagh import TABLE_CONFIGS

    raw = spark.createDataFrame(
        [
            ("P1", "1", "2024-01-01", "", "2024-01-01"),
            ("", "1", "2024-01-01", "", "2024-01-01"),  # empty ident
        ],
        "identificatie string, volgnummer string, beginGeldigheid string,"
        " eindGeldigheid string, registratiedatum string",
    ).withColumn(
        "eindGeldigheid",
        F.when(F.col("eindGeldigheid") == "", None).otherwise(
            F.col("eindGeldigheid")
        ),
    ).withColumn(
        "identificatie",
        F.when(F.col("identificatie") == "", None).otherwise(
            F.col("identificatie")
        ),
    )
    st = stage_table(TABLE_CONFIGS["pand"], raw, {})
    staged = st.staged.collect()
    assert len(staged) == 1 and staged[0].identificatie == "P1"
    assert st.rejected_bad_range.filter(F.col("id").isNull()).count() == 1
    st.source.unpersist()
