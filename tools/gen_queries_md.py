"""Regenerate QUERIES.md from the live REGISTRY (run from repo root:
``python tools/gen_queries_md.py``)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dso_import_spark.queries import REGISTRY

HEADER = """# QUERIES — registered query index

Auto-generated from `dso_import_spark/queries.py` REGISTRY (regenerate with `python tools/gen_queries_md.py`). Every entry is a (Spark callable, DuckDB oracle) pair differentially checked at sf=0.01; `tests/test_queries_vs_duckdb.py` runs all of them, the external driver verifies front-to-back within its per-round budget — positions 1-50 are the round-13 rotation (ROUND13_FRONT: zero never-verified rows remain since round 10's 286/286 milestone, so the whole front keeps draining the dep-aware stale backlog oldest-driver-evidence-first; queries born this round take the head slots), positions 51+ the pre-staged ROUND14_QUEUE (the rest of the stale backlog, oldest driver evidence first).

Total: {n} queries, all with SQL oracles.

| # | query | module | what it checks |
|---|---|---|---|
"""


def main() -> None:
    rows = []
    for i, (name, spec) in enumerate(REGISTRY.items(), 1):
        mod = spec.spark.__module__.rsplit(".", 1)[-1]
        doc = re.sub(r"\s+", " ", spec.doc or "").strip()
        if len(doc) > 220:
            doc = doc[:220] + "..."
        rows.append(f"| {i} | `{name}` | {mod} | {doc} |")
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    assert n_oracle == len(REGISTRY), "rows-only queries exist; update header"
    Path("QUERIES.md").write_text(
        HEADER.format(n=len(REGISTRY)) + "\n".join(rows) + "\n"
    )
    print(f"wrote QUERIES.md: {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
