"""Schema-registry parity: StructTypes built from a JSON dataset
document must equal the hand-declared registry (reference generates its
models at runtime from the Amsterdam Schema dataset definition,
bagh/batch.py:451-454)."""

from __future__ import annotations

import os

import pytest

from dso_import_spark.schemas.bagh import BAGH_SCHEMAS
from dso_import_spark.schemas.loader import (
    dataset_document,
    load_dataset,
    struct_from_table_schema,
    table_schema_from_struct,
)

DATASET_JSON = os.path.join(
    os.path.dirname(__file__), "..", "dso_import_spark", "schemas",
    "bagh_dataset.json",
)


def test_dataset_json_matches_declared_registry():
    loaded = load_dataset(DATASET_JSON)
    assert loaded.keys() == BAGH_SCHEMAS.keys()
    for t in loaded:
        assert loaded[t] == BAGH_SCHEMAS[t], t


def test_roundtrip_struct_to_doc_to_struct():
    for t, s in BAGH_SCHEMAS.items():
        assert struct_from_table_schema(table_schema_from_struct(s)) == s, t


def test_document_generation_is_stable():
    doc = dataset_document("bagh", BAGH_SCHEMAS)
    assert doc["id"] == "bagh"
    assert [t["id"] for t in doc["tables"]] == list(BAGH_SCHEMAS)


def test_loader_types():
    doc = {
        "type": "object",
        "required": ["a"],
        "properties": {
            "a": {"type": "string"},
            "b": {"type": "string", "format": "date"},
            "c": {"type": "string", "format": "date-time"},
            "d": {"type": "integer", "format": "int16"},
            "e": {"type": "integer"},
            "f": {"type": "number"},
            "g": {"type": "boolean"},
            "h": {"type": "array", "items": {"type": "string"}},
        },
    }
    s = struct_from_table_schema(doc)
    assert [f.name for f in s.fields] == list("abcdefgh")
    assert not s["a"].nullable and s["b"].nullable
    assert s["d"].dataType.typeName() == "short"
    assert s["h"].dataType.typeName() == "array"


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        struct_from_table_schema({"properties": {"x": {"type": "object"}}})


def test_bagh_job_runs_from_json_schema_document(spark, tmp_path):
    """End-to-end: the import job driven by the JSON dataset document
    (runtime schema registry) produces the same table schemas and row
    counts as the declared registry."""
    from tests.bagh_fixture import generate

    from dso_import_spark.plans.bagh_job import BagHJob

    data_dir = tmp_path / "data"
    generate(str(data_dir))
    job = BagHJob(
        spark, str(data_dir), str(tmp_path / "wh"), schema_doc=DATASET_JSON
    )
    tables = ["gemeente", "buurt", "pand", "verblijfsobject"]
    reports = {r.table: r for r in job.run(create=True, tables=tables)}
    assert reports["buurt"].staged_rows == 62
    got = job.warehouse.read(spark, "buurt")
    declared = BAGH_SCHEMAS["buurt"]
    assert {f.name: f.dataType for f in got.schema.fields if f.name != "bucket"} == {
        f.name: f.dataType for f in declared.fields
    }
