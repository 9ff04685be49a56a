"""As-of (nearest-prior-event) joins with tolerance.

The reference has no as-of join (SURVEY.md §2.4: "no as-of"); this is
north-star surface. Two Spark-native formulations exist in this engine:

1. window ``last(..., ignorenulls)`` over a union — one shuffle, pure
   JVM; used by ``asof_join_last_signup`` (queries_pkg/windows.py).
   Right choice when both sides share one event stream.
2. THIS module: ``cogroup().applyInPandas`` + ``pandas.merge_asof`` —
   the general two-table form with a staleness *tolerance*, matching
   pandas/kdb asof semantics exactly. Right choice when the two sides
   are separate tables and the match must expire (e.g. attribute a
   purchase to a click only if the click is < 30 min old).

Scale notes: cogroup shuffles BOTH sides once on the join key and
streams each key's pair of Arrow batches through the Python worker —
state never exceeds one group. At 100 TB you'd pre-bucket both tables
on the key (storage-bucketed join, see tests/test_bucketing.py) so the
cogroup reuses the layout and the shuffle disappears. Per-group pandas
sort is O(g log g) on group size, not table size; skewed keys are the
risk — cap or salt pathological users upstream.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "left_id long, user_id long, ts timestamp, "
    "right_id long, secs_since long"
)


def asof_tolerance_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    tolerance_secs: int = 1800,
    n_buckets: int | None = None,
) -> DataFrame:
    """For each left row, the latest right row of the same ``key`` with
    ``right.ts <= left.ts`` and ``left.ts - right.ts <= tolerance``;
    unmatched left rows survive with NULLs (left-asof semantics).

    Right side is first reduced to one row per (key, ts) — max id wins —
    so the as-of pick is deterministic under timestamp ties.

    The cogroup key is a hash BUCKET of ``key``, not the key itself:
    one Arrow round-trip + one ``pandas.merge_asof(by=key)`` per bucket
    instead of per user. Per-group Python overhead (Arrow conversion,
    frame construction, merge setup) dominates when groups are small —
    bucketing amortizes it over ~|events|/n_buckets rows while
    ``by=key`` preserves exact per-key as-of semantics inside the
    bucket. Same one-shuffle-per-side plan shape; at 100 TB, pre-bucket
    both tables on the key so the shuffle disappears entirely.

    ``n_buckets`` defaults to INPUT VOLUME over ~1 MiB of Catalyst-
    estimated bytes per bucket (round 14, guide §4 batch sizing; was
    4× default parallelism). Sizing buckets by core count anti-scaled:
    the r13 driver artifact ran this query 2.7× FASTER on 8 cores than
    32 because 128 tiny buckets pay 128 fixed Arrow/pandas round-trips
    (~8 ms each, measured). The bucket-count sweep on this data: sf0.1
    (40k rows, 1.6 MB est) optimum 4-8 buckets [0.44-0.46 s vs 1.77 s
    at 128]; ×100 (4M rows, 90 MB est) optimum 32-128 [1.6-1.9 s vs
    3.9 s at 8, 4.5 s at 2048] — both optima sit at ~0.25-3 MB per
    bucket, so 1 MiB tracks the basin at every measured scale and
    grows task count linearly with data, not cluster width. When the
    size estimate is unavailable the old wide default is the safe
    posture. The bucket count never changes the result, only the work
    granularity.
    """
    if n_buckets is None:
        from dso_import_spark.operators.similarity import _est_bytes

        est = _est_bytes(
            left.select(id_col, key, ts_col)
        ) + _est_bytes(right.select(id_col, key, ts_col))
        if est >= 1 << 61:  # estimate unavailable — size unknown
            n_buckets = 4 * left.sparkSession.sparkContext.defaultParallelism
        else:
            n_buckets = max(1, -(-est // (1 << 20)))
    # xxhash64 is TYPE-sensitive (xxhash64(7 as int) != xxhash64(7 as
    # bigint)): if the two key columns differ in type, the same user
    # lands in different buckets and matches are silently lost — fail
    # loudly instead and let the caller cast
    lt = dict(left.dtypes)[key]
    rt = dict(right.dtypes)[key]
    if lt != rt:
        raise ValueError(
            f"asof key type mismatch: left {key} is {lt}, right is {rt}"
            " — cast one side; bucketing hashes would diverge silently"
        )
    # the Arrow output schema (and the typed empty frames inside merge)
    # are hardwired to bigint keys/ids and timestamp ts: a string key
    # would pass the left-vs-right match above and then fail every task
    # deep in Arrow conversion (round-8 review) — validate loudly here
    supported_ts = ("timestamp", "timestamp_ntz")
    for side, df_ in (("left", left), ("right", right)):
        dts = dict(df_.dtypes)
        if dts[key] != "bigint" or dts[id_col] != "bigint":
            raise ValueError(
                f"asof_tolerance_join supports bigint key/id columns; "
                f"{side} has {key}={dts[key]}, {id_col}={dts[id_col]} — "
                "cast first (the Arrow output schema is fixed)"
            )
        if dts[ts_col] not in supported_ts:
            raise ValueError(
                f"asof_tolerance_join needs a timestamp {ts_col}; "
                f"{side} has {dts[ts_col]}"
            )
    bucket = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(n_buckets))  # noqa: E731
    lhs = left.select(
        F.col(id_col).alias("left_id"), F.col(key).alias("user_id"),
        F.col(ts_col).alias("ts"),
    ).withColumn("__b", bucket("user_id"))
    rhs = right.select(
        F.col(key).alias("user_id"), F.col(ts_col).alias("rts"),
        F.col(id_col).alias("right_id"),
    ).withColumn("__b", bucket("user_id"))
    tol = pd.Timedelta(seconds=tolerance_secs)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            # typed empty frame so Arrow conversion keeps the schema
            return pd.DataFrame(
                {
                    "left_id": pd.array([], dtype="Int64"),
                    "user_id": pd.array([], dtype="Int64"),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "right_id": pd.array([], dtype="Int64"),
                    "secs_since": pd.array([], dtype="Int64"),
                }
            )
        # NULL timestamps crash pandas merge_asof (ValueError on NaT
        # merge keys): a left row without a time can never match —
        # route it straight to the unmatched output; a right row
        # without a time can never BE matched — drop it
        null_left = lpdf[lpdf["ts"].isna()]
        lpdf = lpdf[lpdf["ts"].notna()]
        rpdf = rpdf[rpdf["rts"].notna()]
        if len(null_left):
            null_out = null_left[["left_id", "user_id", "ts"]].copy()
            null_out["right_id"] = pd.array(
                [None] * len(null_out), dtype="Int64"
            )
            null_out["secs_since"] = pd.array(
                [None] * len(null_out), dtype="Int64"
            )
        else:
            null_out = None
        if lpdf.empty and null_out is not None:
            return null_out
        lpdf = lpdf.sort_values("ts", kind="mergesort")
        if rpdf.empty:
            out = lpdf[["left_id", "user_id", "ts"]].copy()
            out["right_id"] = pd.array([None] * len(out), dtype="Int64")
            out["secs_since"] = pd.array([None] * len(out), dtype="Int64")
            if null_out is not None:
                out = pd.concat([out, null_out], ignore_index=True)
            return out
        # (user, ts) tie-dedup: max right_id wins, then re-sort by rts
        # alone (merge_asof requires global sort on the 'on' column)
        rpdf = (
            rpdf.sort_values(["rts", "right_id"], kind="mergesort")
            .drop_duplicates(["user_id", "rts"], keep="last")
            [["user_id", "rts", "right_id"]]
        )
        m = pd.merge_asof(
            lpdf[["left_id", "user_id", "ts"]], rpdf,
            left_on="ts", right_on="rts", by="user_id",
            direction="backward", tolerance=tol,
        )
        # integer floor of the staleness in whole seconds — exact
        # timedelta floordiv, no float rounding at the boundary
        secs = m["ts"].sub(m["rts"]).floordiv(pd.Timedelta(seconds=1))
        m["right_id"] = m["right_id"].astype("Int64")
        m["secs_since"] = pd.array(
            [None if pd.isna(s) else int(s) for s in secs], dtype="Int64"
        )
        m = m[["left_id", "user_id", "ts", "right_id", "secs_since"]]
        if null_out is not None:
            m = pd.concat([m, null_out], ignore_index=True)
        return m

    return (
        lhs.groupBy("__b")
        .cogroup(rhs.groupBy("__b"))
        .applyInPandas(lambda lp, rp: merge(lp, rp), _OUT_SCHEMA)
    )
