"""tune_session contract: the shared query path fixes only UNSET
session defaults and never clobbers an explicit caller setting."""

from __future__ import annotations

from dso_import_spark.queries_pkg.util import tune_session

_RULE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)
_KEY = "spark.sql.optimizer.excludedRules"


def test_exclusion_applied_when_unset(spark):
    before = spark.conf.get(_KEY, None)
    try:
        spark.conf.unset(_KEY)
        tune_session(spark)
        assert spark.conf.get(_KEY) == _RULE
    finally:
        if before is not None:
            spark.conf.set(_KEY, before)


def test_explicit_exclusion_list_is_respected(spark):
    before = spark.conf.get(_KEY, None)
    try:
        mine = "org.apache.spark.sql.catalyst.optimizer.SomeOtherRule"
        spark.conf.set(_KEY, mine)
        tune_session(spark)
        assert spark.conf.get(_KEY) == mine
    finally:
        if before is not None:
            spark.conf.set(_KEY, before)
        else:
            spark.conf.unset(_KEY)


def test_explicit_shuffle_partitions_respected(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "48")
        tune_session(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "48"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
