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


def test_deployment_profile_local_defaults_untouched(spark):
    # round 14: the "local" profile (the default) must add NOTHING —
    # the driver's bench session keeps Spark's own scan-split and
    # advisory sizes so core-count scaling stays measurable
    from dso_import_spark.session import _PROFILES

    assert _PROFILES["local"] == {}
    # the live test session (built with the default profile) runs on
    # Spark's defaults for the profile-owned keys
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") in (
        "134217728b",
        str(128 * 1024 * 1024),
    )
    # core conf untouched: nothing set the shuffle codec in the
    # default profile (Spark falls back to its own built-in default)
    assert (
        spark.sparkContext.getConf().get("spark.io.compression.codec", None)
        is None
    )


def test_deployment_profile_cluster_values_and_unknown_rejected():
    from dso_import_spark.session import _PROFILES
    import dso_import_spark.session as sess
    import os
    import pytest

    c = _PROFILES["cluster"]
    assert c["spark.sql.files.maxPartitionBytes"] == "512m"
    assert c["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == "256m"
    assert c["spark.io.compression.codec"] == "zstd"
    os.environ["SPARK_GRAFT_PROFILE"] = "typo"
    try:
        with pytest.raises(ValueError, match="unknown SPARK_GRAFT_PROFILE"):
            sess.get_spark("profile_typo_test")
    finally:
        del os.environ["SPARK_GRAFT_PROFILE"]
