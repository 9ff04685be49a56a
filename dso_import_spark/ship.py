"""Ship the package to Python workers (local --py-files analog).

UDF closures reference module-level helpers, which cloudpickle
serializes *by reference* (module + qualname). Workers then need to
``import dso_import_spark`` themselves — true on a real cluster only
when the package is submitted via ``spark-submit --py-files``. This
module reproduces that contract for any driver (the harness imports
``__spark_entry__`` from an arbitrary cwd): zip the package once per
process and ``sc.addPyFile`` it, so every executor can import it no
matter where the driver ran from.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently add a zip of this package to the SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"dso_import_spark-pyfiles-{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for dirpath, _dirnames, filenames in os.walk(pkg_root):
                for fn in filenames:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(dirpath, fn)
                    rel = os.path.join(
                        "dso_import_spark", os.path.relpath(full, pkg_root)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
