"""Registry-rotation report: which queries still lack a green driver
correctness row, and what the next round's front block should be.

The external driver verifies registry entries front-to-back within a
per-round budget (~50) and records results in CORRECTNESS_r{N}.json at
the repo root. Run this module (``python -m dso_import_spark.rotation``)
at the start of a round to get:

- every query with a green row (hash_match true) in ANY recorded round,
- the never-verified remainder IN REGISTRY ORDER (the candidates to
  front-load), grouped by module so the import-reorder in queries.py
  is mechanical,
- a warning if the current front-50 wastes slots on already-green
  queries.

tests/test_registry_order.py pins the chosen front block; update both
in the same commit when rotating.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def green_queries(repo: Path = REPO) -> set[str]:
    """Names with a fully-green row in any CORRECTNESS_r*.json."""
    green: set[str] = set()
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


def rotation_report(budget: int = 50, repo: Path = REPO) -> dict:
    from dso_import_spark.queries import REGISTRY

    names = list(REGISTRY)
    green = green_queries(repo) & set(names)
    never = [n for n in names if n not in green]
    front = names[:budget]
    wasted = [n for n in front if n in green]

    by_module: dict[str, list[str]] = {}
    for n in never:
        mod = REGISTRY[n].spark.__module__.rsplit(".", 1)[-1]
        by_module.setdefault(mod, []).append(n)

    return {
        "total": len(names),
        "green": len(green),
        "never_verified": never,
        "never_by_module": by_module,
        "front_budget": budget,
        "front_wasted_on_green": wasted,
    }


def main() -> None:  # pragma: no cover - convenience CLI
    r = rotation_report()
    print(f"registry: {r['total']} queries; driver-green: {r['green']}")
    print(f"never verified: {len(r['never_verified'])}")
    for mod, names in r["never_by_module"].items():
        print(f"  {mod} ({len(names)}): {', '.join(names[:6])}"
              + (" ..." if len(names) > 6 else ""))
    if r["front_wasted_on_green"]:
        print(
            f"WARNING: {len(r['front_wasted_on_green'])} of the front-"
            f"{r['front_budget']} already have green rows — rotate: "
            + ", ".join(r["front_wasted_on_green"][:8])
        )
    else:
        print(f"front-{r['front_budget']} contains no already-green queries — rotation is optimal")


if __name__ == "__main__":
    main()
