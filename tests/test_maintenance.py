"""Compaction and schema-evolution maintenance operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.operators.maintenance import (
    compact,
    dir_stats,
    read_evolved,
)
from dso_import_spark.sources.registry import load_table


def test_compact_reduces_files_preserves_content(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    p = str(tmp_path / "fragmented")
    orders.repartition(40).write.parquet(p)  # simulate append fragmentation
    n_before, total = dir_stats(p)
    assert n_before == 40

    n_after = compact(spark, p, target_bytes=max(total // 3, 1))
    assert n_after < n_before
    back = spark.read.parquet(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))


def test_compact_noop_when_already_compact(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    p = str(tmp_path / "tight")
    orders.coalesce(1).write.parquet(p)
    assert compact(spark, p, target_bytes=128 * 1024 * 1024) == 1


def test_read_evolved_merges_drifted_schemas(spark, tmp_path):
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id int, name string, score double"
    )
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    v1.write.parquet(p1)
    v2.write.parquet(p2)
    merged = read_evolved(spark, p1, p2)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {tuple(r) for r in merged.collect()}
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", 9.5)}
    # pre-drift rows surface NULL score; filters on the new column work
    assert merged.filter(F.col("score").isNotNull()).count() == 1


def test_cluster_write_yields_disjoint_ranges(spark, sf_dir, tmp_path):
    """Range clustering must put disjoint o_orderkey ranges in each
    file, with tight row-group min/max stats — that's what lets the
    parquet reader skip row groups on point/range predicates."""
    import os

    import pyarrow.parquet as pq

    from dso_import_spark.operators.maintenance import cluster_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    p = str(tmp_path / "clustered")
    cluster_write(orders, p, "o_orderkey", n_files=4)

    spans = []
    for f in os.listdir(p):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(p, f)).metadata
        lo = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) == 4
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next  # disjoint: skipping can eliminate files

    # content survives clustering
    back = spark.read.parquet(p)
    assert back.count() == orders.count()
    # and a point predicate is pushed to the scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("o_orderkey") == 7).explain("formatted")
    assert "PushedFilters" in buf.getvalue()


def test_compact_partitioned_preserves_layout(spark, sf_dir, tmp_path):
    """Partition-aware compaction: each dt= directory collapses toward
    one file, the hive layout and content survive."""
    import os

    from dso_import_spark.operators.maintenance import compact

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("dt")
    )
    p = str(tmp_path / "part_frag")
    ev.repartition(8).write.partitionBy("dt").parquet(p)  # 8 files per day
    n_before, _ = dir_stats(p)
    days_before = {d for d in os.listdir(p) if d.startswith("dt=")}

    n_after = compact(spark, p, partition_by=["dt"])
    assert n_after < n_before
    days_after = {d for d in os.listdir(p) if d.startswith("dt=")}
    assert days_after == days_before  # layout preserved
    back = spark.read.parquet(p)
    assert back.count() == ev.count()
    assert dict(back.dtypes)["dt"] == "date"


def test_zorder_write_skips_files_on_both_dims(spark, sf_dir, tmp_path):
    """Z-order clustering: footer min/max stats must prune files for
    point predicates on EITHER clustered column, where single-key
    clustering prunes only its own key."""
    import os

    import pyarrow.parquet as pq

    from dso_import_spark.operators.maintenance import cluster_write, zorder_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zp = str(tmp_path / "zordered")
    kp = str(tmp_path / "keyed")
    zorder_write(orders, zp, ["o_custkey", "o_totalprice"], n_files=8)
    cluster_write(orders, kp, "o_custkey", n_files=8)

    def file_spans(path, colname):
        spans = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = next(
                j
                for j in range(md.row_group(0).num_columns)
                if md.row_group(0).column(j).path_in_schema == colname
            )
            lo = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append((lo, hi))
        return spans

    probe = orders.select(
        F.expr("percentile_approx(o_custkey, 0.5)").alias("ck"),
        F.expr("percentile_approx(o_totalprice, 0.5)").alias("tp"),
    ).first()

    def n_overlapping(spans, v):
        return sum(1 for lo, hi in spans if lo <= v <= hi)

    z_ck = file_spans(zp, "o_custkey")
    z_tp = file_spans(zp, "o_totalprice")
    assert len(z_ck) == 8
    # point predicates on EACH dimension eliminate files
    assert n_overlapping(z_ck, probe.ck) < len(z_ck)
    assert n_overlapping(z_tp, probe.tp) < len(z_tp)

    # single-key clustering: perfect on its key, useless on the other
    k_ck = file_spans(kp, "o_custkey")
    k_tp = file_spans(kp, "o_totalprice")
    assert n_overlapping(k_ck, probe.ck) <= 2
    assert n_overlapping(k_tp, probe.tp) == len(k_tp)

    # content is lossless
    back = spark.read.parquet(zp)
    assert back.count() == orders.count()
    assert (
        back.agg(F.sum("o_orderkey").alias("s")).first().s
        == orders.agg(F.sum("o_orderkey").alias("s")).first().s
    )


def test_write_observed_collects_metrics_in_the_write_pass(spark, tmp_path):
    from pyspark.sql import functions as F

    from dso_import_spark.operators.maintenance import write_observed

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    out = str(tmp_path / "observed")
    got = write_observed(
        df,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.count(F.when(F.col("v").isNull(), 1)),
            "sum_id": F.sum("id"),
        },
    )
    assert got == {"n_rows": 1000, "n_null_v": 100, "sum_id": 499500}
    # and the write actually landed, row-complete
    assert spark.read.parquet(out).count() == 1000


def test_merge_agg_partials_equals_recompute(spark, sf_dir):
    """Incremental refresh (base partials + delta) must equal the
    full recompute exactly — the algebraic-combine contract."""
    from dso_import_spark.operators.maintenance import merge_agg_partials
    from dso_import_spark.queries_pkg.util import tables

    (events,) = tables(spark, sf_dir, "events")
    metrics = {
        "n": ("value", "count"),
        "s": ("value", "sum"),
        "lo": ("value", "min"),
        "hi": ("value", "max"),
    }
    base = (
        events.where(F.col("event_id") % 4 != 0)
        .groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
    delta = events.where(F.col("event_id") % 4 == 0)
    refreshed = merge_agg_partials(base, delta, ["user_id"], metrics)
    full = events.groupBy("user_id").agg(
        F.count("value").alias("n"),
        F.sum("value").alias("s"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    norm = lambda df: sorted(
        (r["user_id"], r["n"], round(r["s"], 6), round(r["lo"], 6), round(r["hi"], 6))
        for r in df.collect()
    )
    assert norm(refreshed) == norm(full)


def test_merge_agg_partials_new_and_untouched_keys(spark):
    """Delta introducing a brand-new key and leaving another key
    untouched: new key appears, untouched key's row is unchanged."""
    from dso_import_spark.operators.maintenance import merge_agg_partials

    base = spark.createDataFrame(
        [("a", 2, 10.0), ("b", 1, 5.0)], "k string, n long, s double"
    )
    delta = spark.createDataFrame(
        [("a", 7.0), ("c", 1.0)], "k string, v double"
    )
    out = merge_agg_partials(
        base, delta, ["k"], {"n": ("v", "count"), "s": ("v", "sum")}
    )
    got = {r["k"]: (r["n"], r["s"]) for r in out.collect()}
    assert got == {"a": (3, 17.0), "b": (1, 5.0), "c": (1, 1.0)}


def test_merge_agg_count_vs_count_star_null_delta(spark):
    # 'count' = non-null source values; 'count_star' = rows. A
    # NULL-bearing delta must diverge between the two exactly as
    # count(col) vs count(*) do in SQL.
    from pyspark.sql import functions as F

    from dso_import_spark.operators.maintenance import merge_agg_partials

    base = spark.createDataFrame(
        [("a", 2, 2)], "k string, n_vals long, n_rows long"
    )
    delta = spark.createDataFrame(
        [("a", None), ("a", 5.0)], "k string, v double"
    )
    out = merge_agg_partials(
        base,
        delta,
        ["k"],
        {"n_vals": ("v", "count"), "n_rows": ("v", "count_star")},
    ).collect()[0]
    assert out.n_vals == 3   # 2 + one non-null
    assert out.n_rows == 4   # 2 + two rows
