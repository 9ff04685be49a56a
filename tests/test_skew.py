"""Salting operators must be result-identical to the plain formulation
on a deliberately skewed key distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dso_import_spark.operators.skew import salted_agg, salted_join, with_salt


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
        ).alias("key"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.col("id"),
    )
    return df.cache()


def test_salt_is_deterministic_and_spread(skewed):
    a = with_salt(skewed).groupBy("__salt").count().collect()
    b = with_salt(skewed).groupBy("__salt").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # the hot key's rows actually spread over many salt buckets
    hot = (
        with_salt(skewed)
        .filter("key = 'hot'")
        .select("__salt")
        .distinct()
        .count()
    )
    assert hot >= 12  # of 16 buckets


def test_salted_agg_equals_plain(skewed):
    plain = skewed.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    salted = salted_agg(
        skewed,
        ["key"],
        {
            "n": ("count", "*"),
            "s": ("sum", "v"),
            "mn": ("min", "v"),
            "mx": ("max", "v"),
        },
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k42", "K42")], ["key", "label"]
    )
    plain = skewed.join(dim, "key").select("key", "id", "label")
    salted = salted_join(skewed, dim, on="key").select("key", "id", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    # left join keeps unmatched big-side rows exactly once
    plain_l = skewed.join(dim, "key", "left").select("key", "id", "label")
    salted_l = salted_join(skewed, dim, on="key", how="left").select(
        "key", "id", "label"
    )
    assert sorted(map(tuple, plain_l.collect())) == sorted(
        map(tuple, salted_l.collect())
    )
