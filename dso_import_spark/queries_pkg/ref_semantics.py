"""Reference-parity queries: the dso-import semantics on TPC-H fixtures.

Each query exercises one operator row from SURVEY.md §2 using the
engine's operator/function modules, with a DuckDB oracle encoding the
same semantics independently. The BAGH-shaped end-to-end pipeline is
tested separately (tests/test_bagh_job.py); these make every operator
individually checkable by the driver harness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.functions.parsers import (
    create_id,
    create_ids,
    int_or_none,
    parse_yesno_boolean,
    valid_date_range,
)
from dso_import_spark.operators.merge import (
    bridge_rows,
    merge_counts_narrow,
    plan_merge,
)
from dso_import_spark.operators.quality import (
    deleted_rows,
    duplicate_open_intervals,
    overlapping_intervals,
    validate_fk,
)
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables


@query(
    "surrogate_key",
    oracle="""
    SELECT n_nationkey,
           printf('%s_%03d', n_name, n_nationkey) AS sid,
           CASE WHEN n_regionkey IS NOT NULL
                THEN printf('%s_%03d', n_name, n_regionkey) END AS sid_region
    FROM nation
    """,
    doc="P2 create_id: '{identificatie}_{volgnummer:03d}' surrogate keys "
    "(reference bagh/batch.py:20-21).",
)
def surrogate_key(spark, sf_dir):
    (nation,) = tables(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        create_id(F.col("n_name"), F.col("n_nationkey")).alias("sid"),
        create_id(F.col("n_name"), F.col("n_regionkey")).alias("sid_region"),
    )


@query(
    "multi_id_zip",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           unnest([printf('%s_%03d', l_orderkey::VARCHAR, l_linenumber),
                   printf('%s_%03d', l_partkey::VARCHAR, l_suppkey % 1000)]) AS sid
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="P3 create_ids: pipe-list zip → surrogate-key array → explode "
    "(reference bagh/batch.py:24-32).",
)
def multi_id_zip(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    ids = F.concat_ws("|", F.col("l_orderkey"), F.col("l_partkey"))
    volgs = F.concat_ws("|", F.col("l_linenumber"), F.col("l_suppkey") % 1000)
    return (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.explode(create_ids(ids, volgs)).alias("sid"),
        )
    )


@query(
    "safe_int_cast",
    oracle="""
    SELECT o_orderpriority,
           max(CASE WHEN regexp_matches(split_part(o_orderpriority, '-', 1), '^[0-9]+$')
                    THEN split_part(o_orderpriority, '-', 1)::INT END) AS prio_num,
           sum(CASE WHEN regexp_matches(o_orderpriority, '^[0-9]+$')
                    THEN 1 ELSE 0 END)::BIGINT AS n_full_numeric,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="P4 int_or_none: digits-only safe cast, junk → NULL "
    "(reference bagh/batch.py:35-39).",
)
def safe_int_cast(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    first_tok = F.split(F.col("o_orderpriority"), "-").getItem(0)
    return orders.groupBy("o_orderpriority").agg(
        F.max(int_or_none(first_tok)).alias("prio_num"),
        F.sum(
            F.when(int_or_none(F.col("o_orderpriority")).isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_full_numeric"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tri_state_boolean",
    oracle="""
    SELECT CASE WHEN raw IN ('J', 'Y') THEN true
                WHEN raw = 'N' THEN false END AS flag,
           count(*) AS n
    FROM (SELECT CASE o_orderkey % 4 WHEN 0 THEN 'J' WHEN 1 THEN 'Y'
                                     WHEN 2 THEN 'N' ELSE '' END AS raw
          FROM orders)
    GROUP BY 1
    """,
    doc="P7 tri-state yes/no boolean — NULL must stay NULL "
    "(reference batch/csv.py:29-30).",
)
def tri_state_boolean(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, "J")
        .when(F.col("o_orderkey") % 4 == 1, "Y")
        .when(F.col("o_orderkey") % 4 == 2, "N")
        .otherwise("")
    )
    return (
        orders.select(parse_yesno_boolean(raw).alias("flag"))
        .groupBy("flag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "interval_validity_filter",
    oracle="""
    WITH iv AS (
      SELECT o_orderstatus,
             CAST(o_orderdate AS DATE) AS begin_d,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE CAST(o_orderdate AS DATE) + (o_orderkey % 7 - 1)::INT END AS end_d
      FROM orders)
    SELECT o_orderstatus,
           sum(CASE WHEN end_d IS NULL OR begin_d <= end_d THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN NOT (end_d IS NULL OR begin_d <= end_d) THEN 1 ELSE 0 END)::BIGINT AS n_dropped
    FROM iv GROUP BY o_orderstatus
    """,
    doc="P8/Q3 interval-validity row filter: drop rows with end < begin "
    "(reference batch/csv.py:33-34, bagh/batch.py:160-164).",
)
def interval_validity_filter(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    begin_d = F.col("o_orderdate").cast("date")
    end_d = F.when(
        F.col("o_orderkey") % 13 != 0,
        F.date_add(begin_d, (F.col("o_orderkey") % 7 - 1).cast("int")),
    )
    iv = orders.select(
        "o_orderstatus", begin_d.alias("begin_d"), end_d.alias("end_d")
    )
    ok = valid_date_range("begin_d", "end_d")
    return iv.groupBy("o_orderstatus").agg(
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(~ok, 1).otherwise(0)).cast("long").alias("n_dropped"),
    )


@query(
    "open_interval_gate",
    oracle="""
    SELECT o_custkey AS identificatie, count(*)::BIGINT AS cnt
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_custkey HAVING count(*) > 1
    """,
    doc="A1/Q1 duplicate-open-interval gate: group-by-having over open rows "
    "(reference bagh/batch.py:242-257).",
)
def open_interval_gate(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    staged = orders.select(
        F.col("o_custkey").alias("identificatie"),
        F.when(F.col("o_orderstatus") != "O", F.col("o_orderdate")).alias(
            "eind_geldigheid"
        ),
    )
    return duplicate_open_intervals(staged)


@query(
    "temporal_overlap",
    oracle="""
    WITH t AS (
      SELECT l_orderkey AS identificatie,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_shipdate, l_linenumber, l_partkey,
                                         l_suppkey)::INT AS volgnummer,
             CAST(l_shipdate AS DATE) AS begin_d,
             CASE WHEN l_partkey % 3 = 0 THEN NULL
                  ELSE CAST(l_shipdate AS DATE) + (l_suppkey % 40)::INT END AS end_d
      FROM lineitem WHERE l_orderkey % 20 = 0)
    SELECT DISTINCT w1.identificatie, w1.volgnummer, w1.begin_d, w1.end_d
    FROM t w1 JOIN t w2
      ON w1.identificatie = w2.identificatie
     AND w1.volgnummer <> w2.volgnummer
     AND w1.begin_d > w2.begin_d
     AND (w1.begin_d < w2.end_d OR w2.end_d IS NULL)
    """,
    doc="J7/Q2 temporal-overlap detection (reference bagh/batch.py:260-273) "
    "re-expressed as a strict-cummax window scan instead of a theta self-join.",
)
def temporal_overlap(spark, sf_dir):
    from pyspark.sql.window import Window

    (li,) = tables(spark, sf_dir, "lineitem")
    vw = Window.partitionBy("l_orderkey").orderBy(
        "l_shipdate", "l_linenumber", "l_partkey", "l_suppkey"
    )
    t = li.filter(F.col("l_orderkey") % 20 == 0).select(
        F.col("l_orderkey").alias("identificatie"),
        F.row_number().over(vw).alias("volgnummer"),
        F.col("l_shipdate").cast("date").alias("begin_d"),
        F.when(
            F.col("l_partkey") % 3 != 0,
            F.date_add(
                F.col("l_shipdate").cast("date"), (F.col("l_suppkey") % 40).cast("int")
            ),
        ).alias("end_d"),
    )
    return overlapping_intervals(
        t, "identificatie", "volgnummer", "begin_d", "end_d"
    ).dropDuplicates()


@query(
    "fk_validation",
    oracle="""
    WITH probe AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END AS fk
      FROM orders),
    refs AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
    SELECT o_orderstatus,
           sum(CASE WHEN fk IS NULL OR fk IN (SELECT c_custkey FROM refs)
                    THEN 1 ELSE 0 END)::BIGINT AS n_valid,
           sum(CASE WHEN fk IS NOT NULL AND fk NOT IN (SELECT c_custkey FROM refs)
                    THEN 1 ELSE 0 END)::BIGINT AS n_rejected
    FROM probe GROUP BY o_orderstatus
    """,
    doc="J1/Q5 FK validation via broadcast semi/anti join; NULL FK passes "
    "(reference bagh/batch.py:77-82,226-238).",
)
def fk_validation(spark, sf_dir):
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    probe = orders.select(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 11 != 0, F.col("o_custkey")).alias("fk"),
    )
    refs = cust.filter(F.col("c_custkey") % 2 == 0).select("c_custkey")
    valid, rejected = validate_fk(probe, refs, "fk", "c_custkey")
    v = valid.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_valid"))
    r = rejected.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_rejected"))
    return (
        v.join(r, "o_orderstatus", "full_outer")
        .select(
            "o_orderstatus",
            F.coalesce("n_valid", F.lit(0)).alias("n_valid"),
            F.coalesce("n_rejected", F.lit(0)).alias("n_rejected"),
        )
    )


@query(
    "delete_detection",
    oracle="""
    SELECT e.o_orderstatus, count(*) AS n_deleted
    FROM orders e
    WHERE e.o_orderkey % 97 = 0
    GROUP BY e.o_orderstatus
    """,
    doc="J4/Q4 never-delete gate: existing LEFT ANTI staged "
    "(reference bagh/batch.py:97-110).",
)
def delete_detection(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    staged = orders.filter(F.col("o_orderkey") % 97 != 0)
    deleted = deleted_rows(orders, staged, "o_orderkey")
    return deleted.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_deleted"))


@query(
    "merge_insert_update",
    oracle="""
    WITH existing AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
    staged AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'P' THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate,
             CASE WHEN o_orderkey % 101 = 0 THEN 'X-NEW' ELSE o_orderpriority END
               AS o_orderpriority
      FROM orders)
    SELECT
      (SELECT count(*) FROM staged s
       WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.o_orderkey = s.o_orderkey))
        AS n_inserted,
      (SELECT count(*) FROM staged s JOIN existing e USING (o_orderkey)
       WHERE (s.o_custkey       IS DISTINCT FROM e.o_custkey)
          OR (s.o_orderstatus   IS DISTINCT FROM e.o_orderstatus)
          OR (s.o_totalprice    IS DISTINCT FROM e.o_totalprice)
          OR (s.o_orderdate     IS DISTINCT FROM e.o_orderdate)
          OR (s.o_orderpriority IS DISTINCT FROM e.o_orderpriority))
        AS n_updated,
      (SELECT count(*) FROM staged) AS n_merged
    """,
    doc="J5+J6 merge: insert-new anti-join + NULL-safe whole-row "
    "update-changed (reference bagh/batch.py:112-130).",
)
def merge_insert_update(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 97 != 0)
    staged = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderstatus") == "P", F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        F.when(F.col("o_orderkey") % 101 == 0, "X-NEW")
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    plan = plan_merge(existing, staged, "o_orderkey")
    # counts from MergePlan's ONE classification pass (round 14): the
    # previous crossJoin of three per-output aggregates planned the
    # classify join once per branch — 15 jobs / 3 SortMergeJoin
    # subtrees for three numbers (guide §2.4). Values identical:
    # o_orderkey is unique on both sides, so per-output row counts
    # equal per-key classification counts, and merged IS staged in
    # fingerprint mode. The J5+J6 pin is unchanged in scope — the row
    # still demonstrates plan_merge's insert-new/update-changed
    # classification against the exact IS DISTINCT FROM oracle.
    return plan.counts.select("n_inserted", "n_updated", "n_merged")


@query(
    "merge_counts_scale",
    oracle="""
    WITH existing AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
    staged AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'P' THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate,
             CASE WHEN o_orderkey % 101 = 0 THEN 'X-NEW' ELSE o_orderpriority END
               AS o_orderpriority
      FROM orders)
    SELECT
      (SELECT count(*) FROM staged s
       WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.o_orderkey = s.o_orderkey))
        AS n_inserted,
      (SELECT count(*) FROM staged s JOIN existing e USING (o_orderkey)
       WHERE (s.o_custkey       IS DISTINCT FROM e.o_custkey)
          OR (s.o_orderstatus   IS DISTINCT FROM e.o_orderstatus)
          OR (s.o_totalprice    IS DISTINCT FROM e.o_totalprice)
          OR (s.o_orderdate     IS DISTINCT FROM e.o_orderdate)
          OR (s.o_orderpriority IS DISTINCT FROM e.o_orderpriority))
        AS n_updated,
      (SELECT count(*) FROM existing e
       WHERE NOT EXISTS (SELECT 1 FROM staged s WHERE s.o_orderkey = e.o_orderkey))
        AS n_deleted,
      (SELECT count(*) FROM staged) AS n_merged
    """,
    doc="Narrow-shuffle merge counts (merge_counts_narrow): both sides "
    "project to (key, 64-bit NULL-safe fingerprint) before the shuffle, "
    "so the exchange carries ~16 bytes/row instead of full width. The "
    "oracle is the exact IS DISTINCT FROM formulation — fingerprint "
    "counts must agree with the exact compare.",
)
def merge_counts_scale(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 97 != 0)
    staged = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderstatus") == "P", F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        F.when(F.col("o_orderkey") % 101 == 0, "X-NEW")
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return merge_counts_narrow(existing, staged, "o_orderkey")


@query(
    "explode_bridge",
    oracle="""
    SELECT l_orderkey::VARCHAR || '_' || pand_id::VARCHAR AS id,
           l_orderkey AS verblijfsobject_id, pand_id
    FROM (SELECT l_orderkey, unnest(list_sort(list(DISTINCT l_partkey))) AS pand_id
          FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY l_orderkey)
    """,
    doc="X1 M:N bridge explode with concat surrogate id "
    "(reference bagh/batch.py:396-431).",
)
def explode_bridge(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    vbo = (
        li.filter(F.col("l_orderkey") % 50 == 0)
        .groupBy(F.col("l_orderkey").alias("id"))
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("pand_ids"))
    )
    return bridge_rows(vbo, "id", "pand_ids")
