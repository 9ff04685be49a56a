"""Targeted per-query timing for A/B runs during optimization.

Usage: python tools/minibench.py name1 name2 ... [--repeats N]

Same methodology as bench.py (noop sink, best-of-N, warm-up query
first) but over an explicit query list, so an A/B pair of runs takes
minutes, not the full headline sweep. Prints one JSON line.
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
    args = sys.argv[1:]
    repeats = 3
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    spark = get_spark("dso_import_spark_minibench")
    qs = spark_queries()
    # warm-up: same query bench.py uses
    qs["q06_forecast_revenue"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    out: dict[str, float] = {}
    allruns: dict[str, list[float]] = {}
    for name in args:
        best = float("inf")
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
        out[name] = round(best, 3)
        allruns[name] = runs
    print(json.dumps({"best": out, "runs": allruns, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
