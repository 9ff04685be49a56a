"""Exported-operator execution-coverage audit (VERDICT r8 item #4).

The ``simhash_pairs`` lesson: an operator exported from ``operators/``
or ``functions/`` but reachable from no registry query can ship dead —
its only coverage was a guard-path test, and the happy path crashed at
plan build for multiple rounds. Two defenses here:

1. A static audit (``test_every_export_has_a_call_site``) that fails
   when any public top-level function/class in the engine packages
   (``AUDITED_PACKAGES``: operators, functions, sources, streaming,
   plans, schemas) is never USED: the corpus is parsed with ast and a
   use is a Name-in-Load-context or Attribute reference (a call, an
   argument like ``register_once(spark, TailDataSource)``, a dispatch
   table). A bare import binds a name but emits neither node, so it
   does not count — and comments, docstrings, and import continuation
   lines cannot satisfy the audit (they did under the earlier regex
   heuristic).
2. Executing tests (below the audit) for every export whose only
   call-sites are in this file, so rule 1 is never satisfied by a
   reference that doesn't actually run the operator.

Static call-site presence is a proxy for execution, so the convention
this file pins is: when the audit flags a new export, add a test HERE
that executes it against a real SparkSession, not just imports it.
"""

from __future__ import annotations

import ast
import datetime as dt
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "dso_import_spark"


AUDITED_PACKAGES = (
    "operators",
    "functions",
    "sources",
    "streaming",
    "plans",
    "schemas",
)


def _public_exports() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for sub in AUDITED_PACKAGES:
        for f in sorted((PKG / sub).glob("*.py")):
            if f.name == "__init__.py":
                continue
            tree = ast.parse(f.read_text())
            names = [
                node.name
                for node in tree.body
                if isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                )
                and not node.name.startswith("_")
            ]
            out[f"{sub}/{f.name}"] = names
    return out


def _referenced_names() -> set[str]:
    """Every identifier the corpus actually USES, from the AST: Name
    nodes in Load context (calls, arguments, comparisons, dispatch
    tables) and Attribute accesses. Import statements bind names but
    emit neither, so a bare ``from x import y`` does not count as a
    use — and comments/docstrings/continuation-line artifacts (the
    failure modes of the earlier regex heuristic, round-9 review)
    cannot match at all."""
    used: set[str] = set()
    files = [
        *PKG.rglob("*.py"),
        *(REPO / "tests").glob("*.py"),
        REPO / "__spark_entry__.py",
    ]
    for f in files:
        tree = ast.parse(f.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                used.add(node.attr)
    return used


def test_every_export_has_a_call_site():
    used = _referenced_names()
    missing = [
        f"{mod}:{name}"
        for mod, names in _public_exports().items()
        for name in names
        if name not in used
    ]
    assert not missing, (
        "exported operators with no use-site anywhere (dead-code risk — "
        "add an executing test in tests/test_export_coverage.py): "
        f"{missing}"
    )


# ---------------------------------------------------------------------------
# Executing tests for exports whose only call-sites live here. Each runs
# the operator end-to-end on a real session and checks values, not just
# that the plan builds.
# ---------------------------------------------------------------------------


def test_normalized_dedup_executes(spark):
    from dso_import_spark.operators.dedup import normalized_dedup

    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox"),
            ("b", "Fox quick THE brown"),  # same bag of words, case/order
            ("c", "an entirely different document"),
        ],
        "doc_id string, text string",
    )
    kept = normalized_dedup(df)
    # one (keeper_id, n_dups) row per bag-of-words fingerprint group;
    # min-id tie-break keeps "a" for the case/order-variant pair
    groups = {(r.keeper_id, r.n_dups) for r in kept.collect()}
    assert groups == {("a", 2), ("c", 1)}


def test_shingle_array_executes(spark):
    from pyspark.sql import functions as F

    from dso_import_spark.operators.dedup import shingle_array

    row = (
        spark.createDataFrame([("w x y z",)], "text string")
        .select(shingle_array("text", 3).alias("sh"))
        .head()
    )
    assert sorted(row.sh) == ["w x y", "x y z"]


def test_replace_table_executes(spark):
    from dso_import_spark.operators.merge import replace_table

    staged = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    out = replace_table(staged)
    # S10 truncate-replace: operator is the identity over the staged
    # relation (the atomicity lives in the caller's overwrite write)
    assert sorted((r.id, r.v) for r in out.collect()) == [(1, "a"), (2, "b")]


def test_run_gates_executes(spark):
    from dso_import_spark.operators.quality import run_gates

    d = dt.date
    staged = spark.createDataFrame(
        [
            # id, identificatie, volgnummer, begin, eind
            ("k1_1", "k1", 1, d(2020, 1, 1), d(2021, 1, 1)),
            ("k1_2", "k1", 2, d(2020, 6, 1), None),  # overlaps v1
            ("k2_1", "k2", 1, d(2020, 1, 1), None),
            ("k2_1", "k2", 1, d(2020, 1, 1), None),  # duplicate id
            ("k3_1", "k3", 1, d(2022, 1, 1), d(2021, 1, 1)),  # bad range
            ("k2_9", "k2", 9, d(2021, 1, 1), None),  # 2nd open for k2
        ],
        "id string, identificatie string, volgnummer int, "
        "begin_geldigheid date, eind_geldigheid date",
    )
    res = run_gates(staged)
    assert res.rejected_bad_range.count() == 1
    assert res.passed.count() == 5
    dup_ids = {r.id for r in res.duplicate_ids.collect()}
    assert dup_ids == {"k2_1"}
    dup_open = {r.identificatie for r in res.duplicate_open.collect()}
    assert "k2" in dup_open
    overl = {r.identificatie for r in res.overlaps.collect()}
    assert "k1" in overl


def test_avg_word_len_executes(spark):
    from dso_import_spark.functions.text import avg_word_len

    row = (
        spark.createDataFrame([("ab cdef g",)], "s string")
        .select(avg_word_len("s").alias("awl"))
        .head()
    )
    # token lengths 2, 4, 1 → mean 7/3
    assert abs(row.awl - 7 / 3) < 1e-9


def test_char_shingles_executes(spark):
    from dso_import_spark.functions.text import char_shingles

    rows = (
        spark.createDataFrame([("abcdef",), ("ab",)], "s string")
        .select(char_shingles("s", 5).alias("sh"))
        .collect()
    )
    assert sorted(rows[0].sh) == ["abcde", "bcdef"]
    # shorter-than-k strings yield the single truncated shingle
    assert rows[1].sh == ["ab"]


def test_load_tables_and_register_views_execute(spark, sf_dir):
    from dso_import_spark.sources.registry import load_tables, register_views

    got = load_tables(spark, sf_dir, "region", "nation")
    assert set(got) == {"region", "nation"}
    assert got["region"].count() == 5
    register_views(spark, sf_dir)
    # every fixture table queryable through plain spark.sql afterwards
    assert spark.sql("SELECT count(*) FROM region").head()[0] == 5
    assert spark.sql(
        "SELECT count(*) FROM nation JOIN region "
        "ON n_regionkey = r_regionkey"
    ).head()[0] == 25
