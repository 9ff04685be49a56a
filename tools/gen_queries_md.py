"""Regenerate QUERIES.md from the live REGISTRY (run from repo root:
``python tools/gen_queries_md.py``)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dso_import_spark.queries import REGISTRY

HEADER = """# QUERIES — registered query index

Auto-generated from `dso_import_spark/queries.py` REGISTRY (regenerate with `python tools/gen_queries_md.py`). Every entry is a (Spark callable, DuckDB oracle) pair differentially checked at sf=0.01; `tests/test_queries_vs_duckdb.py` runs all of them, the external driver verifies front-to-back within its per-round budget — positions 1-50 are the round-10 rotation (ROUND10_FRONT: the 13 never-verified round-9 mlops5/tsops queries first, then stream_tail_ingest — the round-9 staleness leak — then the staged r2/r3/r4 and operator-module re-verifications, then 10 oldest dep-stale r4 rows), positions 51+ the pre-staged ROUND11_QUEUE (the dep-stale backlog, oldest driver evidence first — stale_green is dep-aware since round 10).

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
