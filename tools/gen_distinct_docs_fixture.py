"""Non-replica-dense scaled documents fixture (round 12).

The key-shifted replicas from ``gen_scaled_fixtures.py`` copy each
document's TEXT verbatim, so the curation funnel's exact md5 tier
collapses a x100 corpus 100x before anything quadratic runs — which is
exactly the regime the round-11 verdict flagged as untested: "on a
NON-replica-dense corpus reps ~ corpus and the funnel inherits the
exact self-join wall".

This generator replicates documents with the usual doc_id domain shift
(over max(documents.doc_id, embeddings.vec_id), embeddings staying
symlinked-unscaled so replica 0 keeps its vectors), and makes every
replica's text DISTINCT by CIPHERING its vocabulary: replica r > 0
maps each word w (except the Gopher-gate stopwords 'the'/'a') to the
same-length md5(w || '#' || r) hex prefix, in place, order preserved.
Properties the funnel receipt relies on:

- every replica text is distinct (the exact tier collapses nothing,
  reps == corpus);
- the Gopher gate statistics are preserved exactly per replica: word
  COUNT and ORDER are untouched, word LENGTHS are preserved (hex
  prefix of the same length; words over 32 chars cap at 32), the
  stopwords survive verbatim, and word frequencies are preserved
  because the cipher is per-word deterministic (rare short-hash
  collisions can merge two words — negligible);
- WITHIN a replica, the base corpus's near-dup structure is preserved
  EXACTLY: near-twin docs cipher to near-twin docs (same per-word
  map), so true-pair volume scales linearly with the factor;
- ACROSS replicas, no two replicas share any non-stopword shingle
  (different cipher per r), so the same doc's replicas are NOT
  near-dups of each other — the honest non-replica-dense shape,
  where a quadratic exact pair tier dies and the banded tier holds.

An earlier draft hash-SORTED each replica's words instead: that gave
every doc in a replica a subsequence of one global vocabulary order,
manufacturing corpus-wide shingle overlap that DNF'd even the banded
tier — the cipher keeps original word order precisely to avoid
cross-doc structure the base corpus does not have.

With a third argument ``boilerplate``, every replica doc additionally
gets the same UNciphered 4-word tail (" the story ends here") — two
viral shingles whose document frequency equals the corpus size. That
is the exact tier's Σ df² cliff (df² pairs through two hot keys) while
the banded tier barely notices: a hot shingle enters a band bucket
only when it is a doc's MINIMUM under BOTH of the band's hashes, so
bucket volume stays bounded by true similarity.

Usage: python tools/gen_distinct_docs_fixture.py [factor] [out_dir]
           [boilerplate]
       (defaults: 100 /tmp/sfx100docs_distinct, no boilerplate)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OTHER = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfx{factor}docs_distinct"
    salt = " the story ends here" if len(sys.argv) > 3 else ""
    if os.path.isdir(out) and os.listdir(out):
        raise SystemExit(f"{out} exists and is not empty — remove it first")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in OTHER:
        os.symlink(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    # one shift over the shared doc_id/vec_id domain (the
    # gen_scaled_fixtures.py DOMAINS rule)
    shift = 1 + con.sql(
        f"SELECT greatest(max(d.doc_id), max(e.vec_id)) FROM "
        f"read_parquet('{SRC}/documents.parquet') d, "
        f"read_parquet('{SRC}/embeddings.parquet') e"
    ).fetchone()[0]
    # r13 (r12 advisory): replica 0's n_chars is PRESERVED from the
    # source (+ salt length when boilerplate is on) rather than
    # recomputed as length(text) — the two only agree when the base
    # fixture keeps n_chars == length(text), so assert that contract
    # on the source before relying on it for r > 0 rows too
    bad_nchars = con.sql(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet') "
        f"WHERE text IS NOT NULL AND n_chars <> length(text)"
    ).fetchone()[0]
    if bad_nchars:
        raise SystemExit(
            f"base fixture breaks n_chars == length(text) on "
            f"{bad_nchars} rows — replica n_chars would not be "
            "comparable; fix the source fixture first"
        )
    con.execute(
        rf"""
        COPY (
          WITH reps AS (
            SELECT d.*, t.r
            FROM read_parquet('{SRC}/documents.parquet') d
            CROSS JOIN range({factor}) t(r)),
          perm AS (
            SELECT doc_id, r,
                   array_to_string(
                     [CASE WHEN t[i] IN ('the', 'a') THEN t[i]
                           ELSE substr(md5(t[i] || '#' || r), 1,
                                       length(t[i])) END
                      for i in range(1, len(t) + 1)], ' ') AS ptext
            FROM (SELECT doc_id, r,
                         string_split_regex(text, '\s+') AS t
                  FROM reps WHERE r > 0 AND text IS NOT NULL))
          SELECT (reps.doc_id + reps.r * {shift})::BIGINT AS doc_id,
                 (CASE WHEN reps.r = 0 THEN reps.text ELSE perm.ptext END
                  || '{salt}') AS text,
                 reps.lang, reps.source,
                 -- replica 0 preserves the SOURCE n_chars (+ salt
                 -- length); asserted equal to length(text) above, so
                 -- no-salt runs leave replica 0 bit-identical to the
                 -- base corpus (r12 advisory)
                 (CASE WHEN reps.r = 0
                       THEN reps.n_chars + length('{salt}')
                       ELSE length(perm.ptext || '{salt}') END)::BIGINT
                   AS n_chars
          FROM reps LEFT JOIN perm
            ON perm.doc_id = reps.doc_id AND perm.r = reps.r
        ) TO '{out}/documents.parquet' (FORMAT parquet)
        """
    )
    n, nd = con.sql(
        f"SELECT count(*), count(DISTINCT text) "
        f"FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()
    print(f"documents: x{factor} -> {n} rows, {nd} distinct texts")
    base_distinct = con.sql(
        f"SELECT count(DISTINCT text) "
        f"FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    # every replica text distinct: the only collisions allowed are the
    # base corpus's own exact dups, replayed once per replica
    if nd < factor * base_distinct * 0.98:
        raise SystemExit(
            f"distinctness FAILED: {nd} distinct texts for {n} rows "
            f"(base has {base_distinct})"
        )
    orphans = con.sql(
        f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet') e "
        f"LEFT JOIN read_parquet('{out}/documents.parquet') d "
        f"ON e.vec_id = d.doc_id WHERE d.doc_id IS NULL"
    ).fetchone()[0]
    if orphans:
        raise SystemExit(f"FK integrity FAILED: {orphans} orphaned vec_ids")
    print(f"FK integrity: 0 orphaned embeddings.vec_id in {out}")
    print(f"fixtures ready in {out}")


if __name__ == "__main__":
    main()
