"""Rotation-report tool: parses CORRECTNESS_r*.json correctly and
classifies the current registry against it."""

from __future__ import annotations

import json

from dso_import_spark.rotation import green_queries, rotation_report


def test_green_parsing(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "good": {"rows_match": True, "schema_match": True, "hash_match": True},
        "bad_hash": {"rows_match": True, "schema_match": True, "hash_match": False},
        "no_oracle": {"rows_match": None, "schema_match": None, "hash_match": None},
    }))
    assert green_queries(tmp_path) == {"good"}


def test_report_against_live_registry():
    r = rotation_report()
    from dso_import_spark.queries import REGISTRY

    assert r["total"] == len(REGISTRY)
    # round 1 verified 48 queries; all of them exist in the registry
    assert r["green"] >= 40
    # every never-verified name is a real registry entry
    assert set(r["never_verified"]) <= set(REGISTRY)
    # round 2's front-50 was chosen to contain no already-green rows
    assert r["front_wasted_on_green"] == []
