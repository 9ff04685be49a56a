"""Capture .explain("formatted") for named queries to plans/<dir>/.

Usage: python tools/capture_plans.py <outdir> <tag> name1 name2 ...
e.g.   python tools/capture_plans.py plans/r13 before q05_nation_revenue

Writes plans/r13/<name>_<tag>.txt. Uses the same session factory as
bench.py (get_spark) so the captured plan is the benched plan. Note
some query builders run driver-side jobs (k-means trainer collects)
while CONSTRUCTING the DataFrame; capture is therefore not free, but
plans are captured without executing the final query.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dso_import_spark.queries import spark_queries  # noqa: E402
from dso_import_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, tag, *names = sys.argv[1:]
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dso_import_spark_plans")
    qs = spark_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {out / f'{name}_{tag}.txt'} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
