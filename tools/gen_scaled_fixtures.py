"""Regenerate the key-shifted scaled replica fixtures used by the
SCALING.md at-birth measurements (each round starts on a fresh machine,
so the /tmp fixtures from prior rounds are gone — this pins the exact
methodology instead of a snippet buried in git history).

Key-shifted replication of /root/testdata/sf0.1: every replica r gets
ids shifted by r * (domain_max + 1), so keys stay unique, join
fan-outs stay realistic, and distributions per replica are identical
to the base fixture. Two deliberate NON-shifts (round-9 review — both
were bugs when shifted):

- keys of SYMLINKED-unscaled dimensions (o_custkey, l_partkey,
  l_suppkey) stay put, so dim joins keep matching — each customer
  gets factor× orders and the co-purchase graph gets denser, the way
  a real workload grows. Shifting o_custkey orphaned every replica
  order and quietly measured ×1 join work on a "×100" run.
- a key that spans TWO tables (orderkey in orders and lineitem) gets
  ONE shift computed over the domain max of both — per-table maxes
  only align if the global max order happens to have lineitems.

Usage: python tools/gen_scaled_fixtures.py [factor] [out_dir] [tables]
       (defaults: 100 /tmp/sfx100 events,orders,lineitem,documents,embeddings)

The round-over-round ×100 HEADLINE comparison uses facts-only scaling
(the round-3 convention — events/documents/embeddings unscaled):
    python tools/gen_scaled_fixtures.py 100 /tmp/sfx100bench orders,lineitem
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

SCALED = {
    # table -> columns shifted by r * (domain max + 1); all other
    # columns (incl. unscaled-dimension FKs) pass through
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# columns sharing one key domain get one shift over the max of all
DOMAINS = {
    "o_orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "l_orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    # embeddings.vec_id references documents.doc_id (the retrieval
    # composition queries join them): one shift over both keeps each
    # replica's vectors pointing at ITS OWN replica's documents —
    # independent per-table shifts (5000 vs 2000 at sf0.1) would remap
    # every replica vector onto replica 0's documents
    "doc_id": [("documents", "doc_id"), ("embeddings", "vec_id")],
    "vec_id": [("documents", "doc_id"), ("embeddings", "vec_id")],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

# FK edges asserted after generation: (child table, child col,
# parent table, parent col). Covers both scaled-to-scaled domains and
# scaled-fact-to-symlinked-dim edges — the two orphaning bug classes
# rounds 8/9 hit. The receipts in SCALING.md cite this output.
FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("embeddings", "vec_id", "documents", "doc_id"),
]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfx{factor}"
    scaled = dict(SCALED)
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        unknown = keep - set(SCALED)
        if unknown:
            raise SystemExit(f"unknown scalable tables: {sorted(unknown)}")
        # tables sharing a key domain scale together or not at all:
        # scaling lineitem without orders would shift l_orderkey into
        # a range with no matching order — every replica lineitem
        # silently orphaned, join work measured at x1 (r9 advice; the
        # exact bug class the module header documents)
        for col, members in DOMAINS.items():
            group = {t for t, _ in members}
            picked = group & keep
            if picked and picked != group:
                raise SystemExit(
                    f"tables {sorted(group)} share the {col} key domain "
                    f"— select all of them or none (got {sorted(picked)})"
                )
        scaled = {t: c for t, c in SCALED.items() if t in keep}
    if os.path.isdir(out) and os.listdir(out):
        # refuse to mix table selections in one directory: a leftover
        # SCALED parquet would shadow the expected unscaled symlink
        # (and a COPY through a leftover symlink would write INTO the
        # read-only base fixture) — round-9 review
        raise SystemExit(
            f"{out} exists and is not empty — remove it first "
            "(fixture dirs are single-generation)"
        )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in set(SCALED) - set(scaled):  # unscaled non-dim tables
        link = f"{out}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)
    def domain_shift(table: str, col: str) -> int:
        members = DOMAINS.get(col, [(table, col)])
        return 1 + max(
            con.sql(
                f"SELECT max({c}) FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
            for t, c in members
        )

    for table, shift_cols in scaled.items():
        src = f"{SRC}/{table}.parquet"
        shifts = {c: domain_shift(table, c) for c in shift_cols}
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"({c} + r * {shifts[c]})::BIGINT AS {c}" if c in shifts else c
            for c in cols
        )
        dst = f"{out}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}') "
            f"CROSS JOIN range({factor}) t(r)) TO '{dst}' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: x{factor} -> {n} rows")
    for d in DIMS:
        link = f"{out}/{d}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{d}.parquet", link)
    # FK integrity gate (r9 verdict #4): a generator regression that
    # orphans replica keys devalues every x100 receipt built on the
    # fixture — assert 0 orphans HERE, in the same run, and print the
    # line the SCALING.md at-birth tables cite.
    checked = 0
    for child, ccol, parent, pcol in FK_EDGES:
        cp, pp = f"{out}/{child}.parquet", f"{out}/{parent}.parquet"
        if not (os.path.exists(cp) and os.path.exists(pp)):
            continue
        orphans = con.sql(
            f"SELECT count(*) FROM read_parquet('{cp}') c "
            f"LEFT JOIN read_parquet('{pp}') p ON c.{ccol} = p.{pcol} "
            f"WHERE p.{pcol} IS NULL"
        ).fetchone()[0]
        if orphans:
            raise SystemExit(
                f"FK integrity FAILED: {orphans} orphaned "
                f"{child}.{ccol} -> {parent}.{pcol} rows in {out}"
            )
        checked += 1
    print(f"FK integrity: 0 orphans across {checked} edges in {out}")
    print(f"fixtures ready in {out}")


if __name__ == "__main__":
    main()
