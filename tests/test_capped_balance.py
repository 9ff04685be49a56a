"""capped_running_balance re-expresses the non-associative recursion
b_t = max(0, b_{t-1} + x_t) as two stacked associative window scans
(b_t = S_t - min(0, running_min(S))). Pin the identity itself against
the direct per-user recursion, so the re-expression can't silently
drift from the semantics it claims.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from dso_import_spark.queries import REGISTRY
from dso_import_spark.queries_pkg.util import tables


def test_window_identity_matches_direct_recursion(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    rows = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.when(F.col("event_type") == "purchase", -F.col("value"))
            .otherwise(F.col("value"))
            .alias("dx"),
        )
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    expect = {}
    bal = defaultdict(float)
    for r in rows:
        bal[r["user_id"]] = max(0.0, bal[r["user_id"]] + r["dx"])
        expect[r["event_id"]] = round(bal[r["user_id"]], 4)

    got = {
        r["event_id"]: r["balance"]
        for r in REGISTRY["capped_running_balance"].spark(spark, sf_dir).collect()
    }
    assert got, "sampled output should be non-empty"
    for eid, b in got.items():
        assert abs(b - expect[eid]) < 1e-6, (eid, b, expect[eid])
