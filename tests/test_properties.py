"""Property-based differential tests (hypothesis).

Two layers:
- scalar parsers: the engine's Column expressions vs a plain-Python
  model of the reference's semantics (`src/dso_import/bagh/batch.py:20-39`,
  `src/dso_import/batch/csv.py:12-34`), over generated inputs — the
  hand-picked edge cases in test_parsers.py can't cover the input space.
- merge algebra: partition/completeness/idempotence invariants of
  plan_merge over random (existing, staged) table pairs.

Each hypothesis example runs one small Spark job; max_examples is kept
low because the point is input diversity, not iteration count.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dso_import_spark.functions.parsers import (
    create_id,
    int_or_none,
    parse_date,
    parse_yesno_boolean,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12
)


def _eval(spark, col, data, schema):
    df = spark.createDataFrame(data, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@settings(**SETTINGS)
@given(st.lists(ascii_text, min_size=1, max_size=30))
def test_int_or_none_matches_isdigit_model(spark, values):
    """Reference: int(v) if v.isdigit() else None (bagh/batch.py:35-39);
    ASCII inputs (the unicode-digit divergence is documented in the
    parser's docstring)."""
    got = _eval(spark, int_or_none("v"), [(v,) for v in values], "v string")
    want = [int(v) if v.isdigit() else None for v in values]
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.just(""),
            st.dates(
                min_value=datetime.date(1, 1, 1),
                max_value=datetime.date(9999, 12, 31),
            ).map(lambda d: d.isoformat()),
            st.datetimes(
                min_value=datetime.datetime(1, 1, 1),
                max_value=datetime.datetime(9999, 12, 31, 23, 59, 59),
            ).map(lambda d: d.isoformat()),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_parse_date_matches_truncate_model(spark, values):
    """Reference: '' → None, else date.fromisoformat(s[:10])
    (batch/csv.py:21-26)."""
    got = _eval(spark, parse_date("v"), [(v,) for v in values], "v string")
    want = [
        None if v == "" else datetime.date.fromisoformat(v[:10]) for v in values
    ]
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(st.sampled_from(["J", "Y", "N", "", "j", "n", "X"]), ascii_text),
        min_size=1,
        max_size=30,
    )
)
def test_yesno_matches_tristate_model(spark, values):
    """Reference: 'J'/'Y' → True, 'N' → False, else None — case
    sensitive, never collapsing None to False (batch/csv.py:29-30)."""
    got = _eval(
        spark, parse_yesno_boolean("v"), [(v,) for v in values], "v string"
    )
    want = [True if v in ("J", "Y") else False if v == "N" else None for v in values]
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(alphabet="0123456789AB", max_size=8)),
            st.integers(min_value=0, max_value=9999),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_create_id_matches_format_model(spark, pairs):
    """Reference: f"{ident}_{volg:03}" if identificatie else None
    (bagh/batch.py:20-21) — Python TRUTHINESS, so the empty string
    also maps to None, not a fabricated '_NNN' key."""
    got = _eval(
        spark,
        create_id("i", "v"),
        [(i, v) for i, v in pairs],
        "i string, v int",
    )
    want = [None if not i else f"{i}_{v:03d}" for i, v in pairs]
    assert got == want


rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # key (small space → overlap)
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
        st.one_of(st.none(), st.sampled_from(["a", "b"])),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


@settings(max_examples=6, deadline=None)
@given(existing=rows, staged=rows)
def test_merge_partition_and_idempotence(spark, existing, staged):
    """plan_merge invariants for any (existing, staged) pair:
    - inserted/updated/unchanged partition the staged side exactly;
    - deleted = existing keys absent from staging;
    - merged = staged contentwise (keys unique);
    - re-merging merged into itself changes nothing (idempotence)."""
    from dso_import_spark.operators.merge import plan_merge

    schema = "id int, x int, y string"
    e = spark.createDataFrame(existing, schema)
    s = spark.createDataFrame(staged, schema)
    # both compare modes must satisfy every invariant identically —
    # the narrow fingerprint plan is a drop-in for the exact plan
    # (NULL-bearing tuples included: row_fingerprint is NULL-safe)
    for mode in ("exact", "fingerprint"):
        plan = plan_merge(e, s, key="id", compare=mode)

        e_keys = {r[0] for r in existing}
        s_keys = {r[0] for r in staged}
        n_ins = plan.inserted.count()
        n_upd = plan.updated.count()
        n_unch = plan.unchanged.count()
        assert n_ins == len(s_keys - e_keys)
        assert n_ins + n_upd + n_unch == len(s_keys)
        assert plan.deleted.count() == len(e_keys - s_keys)
        assert sorted(map(tuple, plan.merged.collect())) == sorted(staged)

        replay = plan_merge(plan.merged, plan.merged, key="id", compare=mode)
        assert replay.inserted.count() == 0
        assert replay.updated.count() == 0
        assert replay.deleted.count() == 0


# --- WAV codec properties (pure Python, no Spark job per example) ---

import math
import struct

from dso_import_spark.operators.multimodal import decode_wav


def _ref_wav(body: bytes, rate: int = 16000) -> bytes:
    return (
        b"RIFF" + struct.pack("<I", len(body) + 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data" + struct.pack("<I", len(body)) + body
    )


@settings(max_examples=50, deadline=None)
@given(
    st.binary(min_size=1, max_size=500),
    st.integers(min_value=1, max_value=192000),
)
def test_wav_decode_round_trips_any_body(body, rate):
    """decode_wav recovers rate, sample count, duration and the exact
    integer-sum RMS for every possible 8-bit PCM body."""
    got = decode_wav(_ref_wav(body, rate))
    assert got is not None
    r, n, dur, rms = got
    assert r == rate and n == len(body)
    assert dur == len(body) / rate
    ss = sum((x - 128) ** 2 for x in body)
    assert rms == math.sqrt(ss / len(body))


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=200), st.integers(0, 43))
def test_wav_decode_rejects_any_truncation(body, cut):
    """A file cut anywhere inside the 44-byte header (or losing data
    bytes) must never parse as valid."""
    full = _ref_wav(body)
    assert decode_wav(full[:cut]) is None
    if len(body) > 1:
        assert decode_wav(full[:-1]) is None


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=120))
def test_wav_decode_never_crashes_on_garbage(data):
    """Arbitrary bytes: parse or reject, never raise."""
    decode_wav(data)
    decode_wav(b"RIFF" + data)


# ---------------------------------------------------------------------------
# Distributed-rank algebra vs plain-Python brute force (round-9 shapes)
# ---------------------------------------------------------------------------


def _midrank(values):
    """Average-rank (midrank) of each value in `values`, 1-based."""
    s = sorted(values)
    first = {}
    for i, v in enumerate(s):
        first.setdefault(v, i)
    return [first[v] + 1 + (s.count(v) - 1) / 2 for v in values]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500000),  # price cents/100
            st.integers(min_value=1, max_value=7),  # basket size
        ),
        min_size=3,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_spearman_bucket_offset_matches_brute_force_midranks(spark, rows):
    # the bucket-offset + contingency-weighted moments must equal the
    # textbook midrank Pearson computed row-by-row in Python
    from dso_import_spark.queries import REGISTRY

    import math
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        orders = spark.createDataFrame(
            [(k, cents / 100.0) for k, (cents, _) in enumerate(rows)],
            "o_orderkey long, o_totalprice double",
        )
        li = spark.createDataFrame(
            [(k, i) for k, (_, n) in enumerate(rows) for i in range(n)],
            "l_orderkey long, l_linenumber long",
        )
        orders.write.parquet(f"{d}/orders.parquet")
        li.write.parquet(f"{d}/lineitem.parquet")
        got = REGISTRY["spearman_rank_correlation"].spark(spark, d).head()

    xs = [cents for cents, _ in rows]
    ys = [n for _, n in rows]
    rx, ry = _midrank(xs), _midrank(ys)
    n = len(rows)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    assert got.n_orders == n
    if den <= 0:  # constant x or y: rho undefined -> engine emits NULL
        assert got.rho_spearman is None
        return
    want = (n * sxy - sx * sy) / math.sqrt(den)
    assert abs(got.rho_spearman - want) < 1e-5


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=300000),  # price cents/100
            st.integers(min_value=1, max_value=9),  # weight
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_weighted_median_matches_brute_force(spark, rows):
    # lower weighted median: smallest value whose cumulative weight
    # reaches half the total — replayed by expanding each row into
    # `weight` copies and picking the element at ceil(W/2)
    from dso_import_spark.queries import REGISTRY

    import math
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        li = spark.createDataFrame(
            [("A", cents / 100.0, float(wt)) for cents, wt in rows],
            "l_returnflag string, l_extendedprice double, l_quantity double",
        )
        li.write.parquet(f"{d}/lineitem.parquet")
        got = REGISTRY["weighted_median_groups"].spark(spark, d).head()

    expanded = sorted(
        cents for cents, wt in rows for _ in range(wt)
    )
    total = len(expanded)
    want_cents = expanded[math.ceil(total / 2) - 1]
    assert got.total_weight == total
    assert abs(got.weighted_median_price - want_cents / 100.0) < 1e-9
