"""Runtime schema registry: build StructTypes from a JSON dataset document.

The reference never declares models in code — they are generated at job
start from the "Amsterdam Schema" dataset definition fetched from a
schema registry (`Dataset.objects.get(name="bagh").create_models()`,
reference bagh/batch.py:451-454; registry URLs settings.py:19-20). This
module is the Spark-native equivalent: a dataset document (JSON-Schema
-style table definitions) → ``dict[table, StructType]``, so a changed
upstream schema flows into the engine without a code edit.

Document shape (a faithful subset of the Amsterdam Schema layout):

    {"id": "bagh", "type": "dataset",
     "tables": [{"id": "gemeente", "type": "table",
                 "schema": {"type": "object",
                            "required": ["id", "identificatie"],
                            "properties": {
                                "id": {"type": "string"},
                                "volgnummer": {"type": "integer",
                                               "format": "int16"},
                                "begin_geldigheid": {"type": "string",
                                                     "format": "date"},
                                ...}}}]}

Type mapping (mirrors SURVEY.md §1.2):

    string                  → StringType
    string format=date      → DateType
    string format=date-time → TimestampType
    string format=geometry  → StringType (WKT; no native Spark geometry)
    integer                 → IntegerType (format int16/int64 → Short/Long)
    number                  → DoubleType
    boolean                 → BooleanType (tri-state, NULL preserved)
    array                   → ArrayType(items mapping)

``required`` members become non-nullable fields. Property order in the
document is the column order (dicts preserve insertion order in JSON
parsing, matching how the reference's DDL fixes column order).
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

_INT_FORMATS = {
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
}

_STRING_FORMATS = {
    "date": T.DateType(),
    "date-time": T.TimestampType(),
    "geometry": T.StringType(),  # WKT text; geotype checked by gates
}


def field_type(prop: dict) -> T.DataType:
    """One JSON-Schema property → Spark DataType."""
    t = prop.get("type")
    fmt = prop.get("format")
    if t == "string":
        return _STRING_FORMATS.get(fmt, T.StringType())
    if t == "integer":
        return _INT_FORMATS.get(fmt, T.IntegerType())
    if t == "number":
        return T.DoubleType()
    if t == "boolean":
        return T.BooleanType()
    if t == "array":
        return T.ArrayType(field_type(prop.get("items", {"type": "string"})))
    raise ValueError(f"unsupported JSON-schema type {t!r} (format={fmt!r})")


def struct_from_table_schema(schema_doc: dict) -> T.StructType:
    """A table's JSON-Schema object → StructType (order-preserving)."""
    required = set(schema_doc.get("required", []))
    fields = [
        T.StructField(name, field_type(prop), name not in required)
        for name, prop in schema_doc.get("properties", {}).items()
    ]
    return T.StructType(fields)


def load_dataset(doc: dict | str) -> dict[str, T.StructType]:
    """A dataset document (dict, JSON string, or file path) →
    ``{table_id: StructType}`` — the engine's table registry."""
    if isinstance(doc, str):
        if doc.lstrip().startswith("{"):
            doc = json.loads(doc)
        else:
            with open(doc, encoding="utf-8") as f:
                doc = json.load(f)
    return {
        t["id"]: struct_from_table_schema(t["schema"])
        for t in doc.get("tables", [])
    }


# ---- inverse direction: StructType → document ------------------------------

_REV_SIMPLE = {
    T.StringType(): {"type": "string"},
    T.DateType(): {"type": "string", "format": "date"},
    T.TimestampType(): {"type": "string", "format": "date-time"},
    T.ShortType(): {"type": "integer", "format": "int16"},
    T.IntegerType(): {"type": "integer", "format": "int32"},
    T.LongType(): {"type": "integer", "format": "int64"},
    T.DoubleType(): {"type": "number"},
    T.BooleanType(): {"type": "boolean"},
}


def _prop_from_type(dt: T.DataType) -> dict:
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _prop_from_type(dt.elementType)}
    try:
        return dict(_REV_SIMPLE[dt])
    except KeyError:
        raise ValueError(f"no JSON-schema mapping for Spark type {dt}") from None


def table_schema_from_struct(struct: T.StructType) -> dict:
    """StructType → JSON-Schema table object (round-trips through
    ``struct_from_table_schema`` modulo the WKT-geometry annotation,
    which is engine metadata, not a Spark type)."""
    return {
        "type": "object",
        "required": [f.name for f in struct.fields if not f.nullable],
        "properties": {f.name: _prop_from_type(f.dataType) for f in struct.fields},
    }


def dataset_document(name: str, schemas: dict[str, T.StructType]) -> dict:
    """Full dataset document for a table registry (used to generate
    ``bagh_dataset.json`` from the hand-declared schemas once; from then
    on either side is authoritative and the pytest round-trip pins them
    equal)."""
    return {
        "id": name,
        "type": "dataset",
        "tables": [
            {"id": t, "type": "table", "schema": table_schema_from_struct(s)}
            for t, s in schemas.items()
        ],
    }
