"""Count Spark jobs + executed exchanges per query (guide §1: measure
first). Usage: python tools/jobcount.py name1 name2 ...

For each query: runs it once via the noop sink and reports how many
Spark jobs the whole invocation (construction + execution) launched,
plus wall seconds. Driver-side collects during DataFrame CONSTRUCTION
(k-means trains, volume-gate probes) show up here and in no plan file,
so this is the honest fixed-overhead census.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dso_import_spark.queries import spark_queries  # noqa: E402
from dso_import_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("dso_import_spark_jobcount")
    sc = spark.sparkContext
    tracker = sc._jsc.sc().statusTracker()
    qs = spark_queries()
    qs["q06_forecast_revenue"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    out = {}
    for name in names:
        before = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        after = len(tracker.getJobIdsForGroup(None))
        out[name] = {"jobs": after - before, "sec": round(dt, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
