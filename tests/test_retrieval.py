"""Retrieval-composition tests: the Arrow IVF kernel against an
independent numpy brute force, plus engineered re-rank semantics.
Cross-engine value agreement is pinned by the DuckDB differentials in
test_queries_vs_duckdb.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dso_import_spark.operators.ann_kernel import ivf_topk_arrow, quantize_vec
from dso_import_spark.queries import REGISTRY


def _load_emb(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    labels = np.array([r.label for r in rows], dtype=np.int64)
    return ids, mat, labels


def test_kernel_matches_numpy_brute_force(spark, sf_dir):
    # independent reimplementation: double-precision centroid routing,
    # quantized-integer rerank, (cos desc, id asc) top-k — must agree
    # with the operator EXACTLY (ids, ranks, bit-equal scores)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    got = ivf_topk_arrow(queries, emb, k=5).collect()

    ids, mat, labels = _load_emb(spark, sf_dir)
    qi = np.floor(mat * 1000 + 0.5).astype(np.int64)
    cents = {
        lab: mat[labels == lab].mean(axis=0) for lab in np.unique(labels)
    }
    expected = {}
    for qpos in np.nonzero(ids % 101 == 0)[0]:
        qv = mat[qpos]
        best = min(
            (
                (
                    -float(
                        qv @ c / (np.sqrt(qv @ qv) * np.sqrt(c @ c))
                    ),
                    lab,
                )
                for lab, c in cents.items()
            ),
        )[1]
        cell = np.nonzero((labels == best) & (ids != ids[qpos]))[0]
        qq = qi[qpos]
        dots = (qi[cell] @ qq).astype(np.float64)
        norms = np.sqrt((qi[cell] * qi[cell]).sum(axis=1).astype(np.float64))
        cos = dots / (norms * np.sqrt(float(qq @ qq)))
        order = np.lexsort((ids[cell], -cos))[:5]
        expected[int(ids[qpos])] = [
            (int(ids[cell][j]), float(cos[j])) for j in order
        ]
    assert got, "no queries sampled from fixture?"
    for r in got:
        exp_n, exp_s = expected[r.query_id][r.rank - 1]
        assert r.neighbor_id == exp_n, (r, expected[r.query_id])
        assert r.cos_raw == exp_s  # bit-exact: integer dots commute


def test_kernel_excludes_self_and_ranks_contiguously(spark, sf_dir):
    for name in ("retrieval_hybrid_topk", "rerank_hashed_crossencoder"):
        rows = REGISTRY[name].spark(spark, sf_dir).collect()
        assert rows
        by_q = {}
        for r in rows:
            assert r.neighbor_id != r.query_id
            by_q.setdefault(r.query_id, []).append(r)
        rank_col = "rank" if name == "retrieval_hybrid_topk" else "rerank"
        for q, rs in by_q.items():
            ranks = sorted(getattr(r, rank_col) for r in rs)
            assert ranks == list(range(1, len(ranks) + 1)), (name, q)


def test_hybrid_identical_text_wins(spark, tmp_path):
    # doc 0 (the query) and doc 7 share IDENTICAL text -> lex_jaccard
    # 1.0; same embedding cluster -> doc 7 must rank first
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "en", "s", 22),
            (3, "zeta eta theta iota", "en", "s", 19),
            (7, "alpha beta gamma delta", "en", "s", 22),
            (9, "alpha misc other words", "en", "s", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.1], 0),
            (3, [0.9, 0.1, 0.0], 0),
            (7, [0.8, 0.05, 0.1], 0),
            (9, [0.85, 0.0, 0.05], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    emb.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    rows = sorted(
        REGISTRY["retrieval_hybrid_topk"].spark(spark, str(tmp_path)).collect(),
        key=lambda r: r.rank,
    )
    assert rows[0].query_id == 0
    assert rows[0].neighbor_id == 7
    assert rows[0].lex_jaccard == 1.0


def test_rerank_zero_shared_terms_scores_half(spark, tmp_path):
    # no shared vocabulary at all -> logit 0 -> sigmoid exactly 0.5,
    # and the re-rank falls back to the cosine tiebreak
    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "en", "s", 10),
            (2, "gamma delta", "en", "s", 11),
            (5, "epsilon zeta", "en", "s", 12),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (5, [0.5, 0.5], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    emb.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    rows = sorted(
        REGISTRY["rerank_hashed_crossencoder"]
        .spark(spark, str(tmp_path))
        .collect(),
        key=lambda r: r.rerank,
    )
    assert [r.ce_score for r in rows] == [0.5, 0.5]
    assert [r.n_shared for r in rows] == [0, 0]
    # cosine tiebreak: doc 2 is closer to the query than doc 5
    assert [r.neighbor_id for r in rows] == [2, 5]


def test_retrieval_plans_have_no_cartesian(spark, sf_dir):
    # NOTE the registered queries localCheckpoint the candidate
    # relation, which truncates lineage — their explain output shows
    # only the post-checkpoint fragment (a red herring caught in
    # review pass 2). The kernel-shape guard must therefore inspect
    # the PRE-checkpoint operator DataFrame, and the no-cartesian
    # guard covers both that and the post-checkpoint fusion plan.
    import contextlib
    import io

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kdf = ivf_topk_arrow(emb.filter(F.col("vec_id") % 101 == 0), emb, k=5)
    kplan = plan_of(kdf)
    # the rerank path must be the Arrow kernel, not a label join
    # (routing runs EAGERLY at build time — the routed.collect() —
    # so the returned plan is scan -> MapInPandas -> window only)
    assert "MapInPandas" in kplan
    assert "CartesianProduct" not in kplan
    assert "SortMergeJoin" not in kplan
    for name in ("retrieval_hybrid_topk", "rerank_hashed_crossencoder"):
        plan = plan_of(REGISTRY[name].spark(spark, sf_dir))
        assert "CartesianProduct" not in plan, name


def test_second_call_idempotent(spark, sf_dir):
    a = sorted(
        map(tuple, REGISTRY["retrieval_hybrid_topk"].spark(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, REGISTRY["retrieval_hybrid_topk"].spark(spark, sf_dir).collect())
    )
    assert a == b


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    # recall@5 vs exact quantized brute force: probing 2 cells must
    # recover at least as many true neighbors as probing 1
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 101 == 0)

    ids, mat, labels = _load_emb(spark, sf_dir)
    qi = np.floor(mat * 1000 + 0.5).astype(np.int64)
    norms = np.sqrt((qi * qi).sum(axis=1).astype(np.float64))
    truth = {}
    for qpos in np.nonzero(ids % 101 == 0)[0]:
        cos = (qi @ qi[qpos]).astype(np.float64) / (norms * norms[qpos])
        mask = ids != ids[qpos]
        order = np.lexsort((ids[mask], -cos[mask]))[:5]
        truth[int(ids[qpos])] = set(int(x) for x in ids[mask][order])

    def recall(n_probe):
        rows = ivf_topk_arrow(queries, emb, k=5, n_probe=n_probe).collect()
        got = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        return hits / total

    r1, r2 = recall(1), recall(2)
    assert 0 < r1 <= r2 <= 1.0, (r1, r2)


def test_kernel_survives_null_and_ragged_embeddings(spark, tmp_path):
    # hostile corpus: NULL vector, empty vector, NULL label, ragged
    # dims — none may crash the kernel or appear as a neighbor (the
    # JL-cert round-9 lesson applied to the ANN path)
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (3, [0.9, 0.1], 0),
            (5, None, 0),
            (6, [], 0),
            (7, [0.5, 0.5], None),
            (8, [0.1, 0.2, 0.3], 0),  # ragged: 3 dims in a 2-dim cell
            (9, [0.8, 0.2], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = ivf_topk_arrow(
        emb.filter(F.col("vec_id") == 0), emb, k=10
    ).collect()
    assert {r.neighbor_id for r in rows} == {3, 9}


def test_crosssource_excludes_same_source_and_null_keys(spark, tmp_path):
    # query doc 0 (source sA): doc 3 shares its source (excluded even
    # though nearest), doc 5 has NULL source (excluded per SQL <>),
    # doc 9 (sB) is the only legal neighbor. Doc 101 is ALSO a query
    # (101 % 101 == 0) with a NULL source: the query-side NULL-key
    # guard must give it zero pairs (third review pass: the first
    # version used doc 5, which never qualifies as a query — the
    # assertion was vacuous)
    docs = spark.createDataFrame(
        [
            (0, "t", "en", "sA", 1),
            (3, "t", "en", "sA", 1),
            (5, "t", "en", None, 1),
            (9, "t", "en", "sB", 1),
            (101, "t", "en", None, 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (3, [0.99, 0.01], 0),
            (5, [0.98, 0.02], 0),
            (9, [0.5, 0.5], 0),
            (101, [0.7, 0.3], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    emb.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    rows = REGISTRY["ann_crosssource_topk"].spark(spark, str(tmp_path)).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert by_q[0] == [9]
    # the NULL-source doc as a QUERY gets no pairs at all — and it IS
    # a query here (101 % 101 == 0), so the guard is exercised
    assert 101 not in by_q
    assert 5 not in by_q  # (never a query: 5 % 101 != 0)


def test_hostile_corpus_cross_engine_agreement(spark, tmp_path):
    # third review pass: the oracle's centroid CTE kept a NULL-label
    # group the kernel never builds — pin kernel/oracle agreement on
    # a corpus WITH NULL labels, NULL/empty vectors, and a NULL-key
    # query doc, for all three embedding-only ANN queries.
    # Deliberately NO ragged-dim rows: ragged input is out-of-contract
    # for the differential (the kernel drops ragged rows per cell,
    # DuckDB's list_dot_product raises on unequal lengths — see
    # operators/ann_kernel.py kernel note); the kernel-side ragged
    # behavior is pinned separately by
    # test_kernel_survives_null_and_ragged_embeddings above.
    import duckdb

    docs = spark.createDataFrame(
        [(i, f"w{i} common", "en", None if i == 5 else f"s{i % 2}", 8)
         for i in [0, 3, 5, 7, 9, 101, 202]],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # 64-dim vectors: the PQ oracle's subspace CTEs slice dims 1..32 /
    # 33..64 and DuckDB's zip-unnest pads short vectors with NULLs
    # (list_dot_product then raises) — 64 dims is the fixture contract
    def v64(a, b):
        return [a, b] + [round(0.01 * (i % 7), 2) for i in range(62)]

    emb = spark.createDataFrame(
        [
            (0, v64(1.0, 0.0), 0),
            (3, v64(0.9, 0.1), 0),
            (5, v64(0.8, 0.2), None),   # NULL label
            (7, None, 0),               # NULL vector
            (9, [], 0),                 # empty vector
            (101, v64(0.6, 0.4), 1),
            (202, v64(0.5, 0.5), 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    emb.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    for name in ("ann_multiprobe_topk", "ann_crosssource_topk",
                 "retrieval_hybrid_topk", "rerank_hashed_crossencoder",
                 # round-12: the PQ kernel gained the same hygiene
                 # filter — without it this corpus crashed the |Q|-row
                 # collect on list(None) (round-11 advisory)
                 "ann_ivf_pq_topk"):
        spec = REGISTRY[name]
        srows = sorted(
            tuple(str(x) for x in r)
            for r in spec.spark(spark, str(tmp_path)).collect()
        )
        drows = sorted(
            tuple(str(x) for x in r) for r in con.sql(spec.oracle).fetchall()
        )
        assert srows == drows, (name, srows, drows)


# --- property layer: the kernel vs a plain-numpy model over random
# corpora (hypothesis) — ties, empty cells, multi-probe, exclusion,
# and NULL keys beyond what the hand-built fixtures cover. Few
# examples, one small Spark job each (the test_properties.py budget).

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _corpus(draw):
    n = draw(st.integers(min_value=4, max_value=14))
    dims = draw(st.integers(min_value=2, max_value=4))
    rows = []
    for i in range(n):
        vec = draw(
            st.lists(
                st.integers(min_value=-3, max_value=3).map(
                    lambda x: x / 2.0
                ),
                min_size=dims,
                max_size=dims,
            )
        )
        label = draw(st.integers(min_value=0, max_value=2))
        key = draw(st.sampled_from(["a", "b", None]))
        rows.append((i * 101, vec, label, key))  # every row a query
    return rows


def _model(rows, k, n_probe, exclude):
    # independent numpy model of route -> quantize -> mask -> top-k
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows], dtype=np.int64)
    keys = [r[3] for r in rows]
    qi = np.floor(mat * 1000 + 0.5).astype(np.int64)
    norms = np.sqrt((qi * qi).sum(axis=1).astype(np.float64))
    cents = {
        int(lab): mat[labels == lab].mean(axis=0)
        for lab in np.unique(labels)
    }
    out = {}
    for qp in range(len(ids)):
        if norms[qp] == 0:
            continue
        qv = mat[qp]
        qn = np.sqrt(qv @ qv)

        def cellkey(L):
            c = cents[L]
            cn2 = c @ c
            if cn2 == 0 or qn == 0:
                # a zero-norm centroid's routing cosine is NULL on
                # BOTH engines (the kernel routes via try_divide,
                # 0/0 -> NULL; DuckDB's 0.0/0.0 is NULL too) and both
                # sort NULL LAST in a desc ordering — so the
                # zero-centroid cell routes LAST (label tiebreak)
                return (np.inf, L)
            return (-(qv @ c) / (qn * np.sqrt(cn2)), L)

        ranked = sorted(cents, key=cellkey)
        cand = []
        for lab in ranked[:n_probe]:
            for cp in np.nonzero(labels == lab)[0]:
                if ids[cp] == ids[qp] or norms[cp] == 0:
                    continue
                if exclude and (
                    keys[qp] is None
                    or keys[cp] is None
                    or keys[cp] == keys[qp]
                ):
                    continue
                cos = float(qi[cp] @ qi[qp]) / (norms[cp] * norms[qp])
                cand.append((cos, int(ids[cp])))
        cand.sort(key=lambda t: (-t[0], t[1]))
        if cand:
            out[int(ids[qp])] = [(nid, c) for c, nid in cand[:k]]
    return out


# --- LSH-bucketed Arrow kernel (round 11: ann_lsh_topk's 100 TB
# shape) — differential against the HOF-form operator pin and against
# the unchanged DuckDB oracle on a hostile corpus.


def test_lsh_kernel_matches_hof_pin(spark, sf_dir):
    # the HOF-form lsh_topk stays the operator-level correctness pin:
    # the kernel must reproduce its (query_id, rank, neighbor_id,
    # cos_sim) rows EXACTLY — same buckets (shared lsh_bucket Column),
    # same round-6 double cosine (sequential fold both sides), same
    # (cos desc, id) order. NOTE: exact equality holds because no
    # fixture cosine sits on a .5e-6 display boundary — there Spark's
    # decimal-HALF_UP F.round and the kernel's DuckDB-mirror float
    # round can differ by one display ulp (the kernel deliberately
    # sides with DuckDB, the driver contract; see lsh_topk_arrow
    # docstring)
    from dso_import_spark.operators.ann_kernel import lsh_topk_arrow
    from dso_import_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    hof = sorted(map(tuple, lsh_topk(queries, emb, k=5, n_bits=6).collect()))
    ker = sorted(
        map(tuple, lsh_topk_arrow(queries, emb, k=5, n_bits=6).collect())
    )
    assert len(ker) > 0
    assert ker == hof


def test_lsh_kernel_matches_hof_pin_random_corpus(spark):
    # seeded random float32 corpus, every row a query — exercises
    # multi-row buckets, ties, and rounding boundaries beyond the
    # fixture's reach
    rng = np.random.default_rng(1131)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8).astype("float32")])
        for i in range(120)
    ]
    from dso_import_spark.operators.ann_kernel import lsh_topk_arrow
    from dso_import_spark.operators.similarity import lsh_topk

    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    hof = sorted(map(tuple, lsh_topk(emb, emb, k=3, n_bits=4).collect()))
    ker = sorted(map(tuple, lsh_topk_arrow(emb, emb, k=3, n_bits=4).collect()))
    assert len(ker) > 0
    assert ker == hof


def test_lsh_kernel_hostile_corpus_vs_oracle(spark, tmp_path):
    # NULL vector and empty vector are dropped by BOTH engines (the
    # oracle's bits CTE drops them via generate_series over len);
    # zero-norm vectors are KEPT with a NULL round-6 cosine (0/0 ->
    # NULL both engines, NULLS LAST in both desc orders) — vec 101 is
    # a zero-norm QUERY (101 % 101 == 0) whose every pair is NULL
    import duckdb

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (3, [0.9, 0.1]),
            (5, None),
            (6, []),
            (7, [0.0, 0.0]),
            (9, [0.8, 0.2]),
            (101, [0.0, 0.0]),
            (202, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    emb.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    spec = REGISTRY["ann_lsh_topk"]
    srows = sorted(
        tuple(str(x) for x in r)
        for r in spec.spark(spark, str(tmp_path)).collect()
    )
    drows = sorted(
        tuple(str(x) for x in r) for r in con.sql(spec.oracle).fetchall()
    )
    assert srows == drows
    # the zero-norm query must actually exercise the NULL-score path
    assert any(r[0] == "101" and r[3] == "None" for r in srows)


def test_zero_norm_centroid_routes_last(spark):
    # explicit regression corpus for the round-10 hypothesis
    # falsifier: label 1's centroid is exactly zero (opposite members
    # cancel) and label 2 is a singleton all-zero vector. Both engines
    # compute a NULL routing cosine for a zero-norm centroid and rank
    # NULL LAST in the desc routing order, so with n_probe=1 every
    # query routes to a REAL cell and gets neighbors; the old
    # NaN-routes-first model returned {} for the label-0 queries here.
    rows = [
        (0, [1.0, 0.5], 0, "a"),
        (101, [0.5, 1.0], 0, "b"),
        (202, [1.0, 0.0], 1, "a"),
        (303, [-1.0, 0.0], 1, "b"),
        (404, [0.0, 0.0], 2, "a"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int, src string"
    )
    got_rows = ivf_topk_arrow(emb, emb, k=2, n_probe=1).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.cos_raw))
    want = _model(rows, 2, 1, False)
    assert want.get(0) and want.get(101), "zero-centroid cells must not win routing"
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=_corpus(),
    k=st.integers(min_value=1, max_value=4),
    n_probe=st.integers(min_value=1, max_value=2),
    exclude=st.booleans(),
)
def test_kernel_property_vs_numpy_model(spark, rows, k, n_probe, exclude):
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int, src string"
    )
    got_rows = ivf_topk_arrow(
        emb,
        emb,
        k=k,
        n_probe=n_probe,
        exclude_key="src" if exclude else None,
    ).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.cos_raw))
    want = _model(rows, k, n_probe, exclude)
    # routing can legitimately differ when centroid cosines tie or a
    # query's double-norm routing is ambiguous only on zero-centroid
    # cells — but the fixture values (halves) make exact double ties
    # across DIFFERENT mean vectors improbable; compare exactly and
    # let hypothesis shrink any disagreement
    assert got == want


def test_ragged_contract_kernel_drops_oracle_raises(spark, tmp_path):
    # round 12 (VERDICT r11 #6): the ragged-input contract pinned in
    # the SUITE instead of docstring-only (operators/ann_kernel.py
    # "Ragged rows carry no comparable geometry — drop"): on a corpus
    # with a ragged-dim row, the kernel DROPS it (never a neighbor,
    # no crash) while the DuckDB oracle RAISES (list_dot_product
    # rejects unequal list lengths) — a deliberate, documented
    # divergence, so differential fixtures must omit ragged rows.
    import duckdb
    import pytest

    docs = spark.createDataFrame(
        [(i, f"w{i} common", "en", f"s{i % 2}", 8) for i in [0, 3, 9, 101]],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (3, [0.9, 0.1], 0),
            (9, [0.1, 0.2, 0.3], 0),  # ragged: 3 dims in a 2-dim cell
            (101, [0.6, 0.4], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    emb.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    spec = REGISTRY["ann_multiprobe_topk"]
    rows = spec.spark(spark, str(tmp_path)).collect()
    assert rows, "kernel produced nothing on the ragged corpus"
    assert all(r.neighbor_id != 9 for r in rows), rows
    assert all(r.query_id != 9 for r in rows), rows
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    with pytest.raises(duckdb.Error, match="(?i)length|NULL"):
        con.sql(spec.oracle).fetchall()
