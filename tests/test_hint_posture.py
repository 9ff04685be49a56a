"""Registry-wide broadcast-hint posture guard.

Round 4 removed every forced ``F.broadcast`` on relations that grow
with the scale factor (supplier/part/customer/orders/lineitem and the
documents/embeddings/events corpus tables): at 100 TB a forced
broadcast of a growing table OOMs the driver/executors instead of
letting statistics+AQE flip the join to shuffle/sort-merge (the q05
×100 row in SCALING.md measures that flip at 7.6 s). This test pins
the posture for EVERY registered batch query by walking the analyzed
logical plan: a ResolvedHint subtree may only reach an SF-scaling
parquet relation through a bounding node (Aggregate / Limit / Sample /
LocalRelation / Range — the "small by construction" shapes: scalar
aggregates, k-bounded centroid tables, sampled query sets, literal
band edges). Constant-size nation/region hints stay allowed.

Complements tests/test_plans.py (per-query physical pins) — this one
is about what must NOT appear, anywhere, including queries added
later.
"""

from __future__ import annotations

import re

import pytest

from dso_import_spark.queries import REGISTRY

# Fixture tables whose row count scales with SF (TPC-H facts + the
# corpus tables). nation/region are constant-size and broadcastable
# forever.
SCALING_RELATION = re.compile(
    r"(supplier|part|customer|orders|lineitem|documents|embeddings|events)\.parquet"
)

# Logical nodes that bound the cardinality of a hinted subtree
# regardless of what they read: the hint then ships an aggregate /
# sample / literal, not the base relation.
BOUNDING_NODE = re.compile(
    r"^(Aggregate|GlobalLimit|LocalLimit|Sample|LocalRelation|"
    r"OneRowRelation|Range|Deduplicate|Distinct)\b"
)

# Stream-running or side-effecting queries: building the DataFrame
# executes a streaming job or a write, which belongs to their own
# tests (test_streaming*, test_layout, test_wkt_write), not a
# plan-shape sweep.
SKIP_MODULES = {"streaming_queries"}
SKIP_QUERIES = {
    "stream_tail_ingest",
    "stream_session_dynamic_gap",
    "wkt_write_roundtrip",
    "partition_overwrite_merge",
    "schema_evolution_scan",
    "cdc_apply_changes",
}

_PREFIX = re.compile(r"^[\s:+|-]*")


def _depth(line: str) -> int:
    return _PREFIX.match(line).end()


def _node(line: str) -> str:
    return _PREFIX.sub("", line)


def _hint_subtrees(tree: str) -> list[tuple[str, list[str]]]:
    lines = tree.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        d = _depth(line)
        sub = []
        for nxt in lines[i + 1 :]:
            if nxt.strip() and _depth(nxt) <= d:
                break
            sub.append(nxt)
        out.append((line, sub))
    return out


def _batch_queries():
    for name, spec in REGISTRY.items():
        mod = spec.spark.__module__.rsplit(".", 1)[-1]
        if mod in SKIP_MODULES or name in SKIP_QUERIES:
            continue
        yield name, spec


def test_no_hint_broadcasts_an_unbounded_scaling_relation(spark, sf_dir):
    violations = []
    build_failures = []
    n_hints = 0
    for name, spec in _batch_queries():
        try:
            df = spec.spark(spark, sf_dir)
        except Exception as exc:  # build failure is its own finding
            build_failures.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        tree = df._jdf.queryExecution().analyzed().treeString()
        for hint_line, subtree in _hint_subtrees(tree):
            n_hints += 1
            bounded = any(BOUNDING_NODE.match(_node(s)) for s in subtree)
            big = [s for s in subtree if SCALING_RELATION.search(s)]
            if big and not bounded:
                violations.append(
                    f"{name}: {hint_line.strip()[:100]} reaches "
                    f"{SCALING_RELATION.search(big[0]).group(0)} unbounded"
                )
    assert not build_failures, "\n".join(build_failures)
    assert not violations, (
        "forced broadcast of an SF-scaling relation (OOM at scale):\n"
        + "\n".join(violations)
    )
    # the sweep must actually see the allowed hints — if this drops to
    # zero the parser regressed, not the code
    assert n_hints >= 20, f"hint parser found only {n_hints} hints"
