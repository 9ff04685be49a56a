"""Prefix filtering (queries_pkg/advanced.py:dedup_prefix_filter_pairs):
the PPJoin guarantee is COMPLETENESS — every pair with Jaccard >= t
must survive candidate generation. The differential oracle already
pins the exact output; this test pins the guarantee itself against a
brute-force all-pairs Jaccard, so a future prefix-length or ordering
bug cannot pass by coincidentally matching a buggy oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.queries import REGISTRY
from dso_import_spark.queries_pkg.util import tables


def _brute_force_pairs(spark, sf_dir, t=0.6):
    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.where(F.col("doc_id") % 10 == 0)
    toks = sample.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("t")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.t"), F.col("b.t")))
    union = (
        F.size(F.col("a.t")) + F.size(F.col("b.t")) - inter
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(inter / union >= t)
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )


def test_prefix_filter_finds_every_pair_above_threshold(spark, sf_dir):
    got = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["dedup_prefix_filter_pairs"].spark(spark, sf_dir).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in _brute_force_pairs(spark, sf_dir).collect()
    }
    # completeness AND exactness: the verify step prunes candidates to
    # exactly the true pair set
    assert got == want
    assert want, "fixture should contain at least one near-dup pair"
