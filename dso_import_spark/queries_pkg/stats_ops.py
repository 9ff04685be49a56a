"""Optimizer-grade statistics and classic OLAP operators.

Five operators rounding out the relational breadth a warehouse engine
is expected to carry (each a named operator in published engines —
ANALYZE histograms, compaction planners, PIVOT, skyline queries,
Theil–Sen robust regression):

- ``equi_depth_histogram``: ANALYZE-style column statistics — exact
  equi-depth (equal-height) histogram of a numeric column, the
  structure cost-based optimizers use for selectivity estimation.
  Boundaries come from one exact-percentile aggregate (a 1-row,
  16-value bounds relation broadcast back); bin assignment is a pure
  Column lambda over the boundary array.
- ``compaction_bin_packing``: small-file compaction planner — greedy
  consecutive bin-packing of per-hour file sizes into target-sized
  output files, planned independently inside every day partition
  (window partitioned by day; compaction never crosses a partition
  boundary, exactly like table-format OPTIMIZE jobs).
- ``pivot_event_matrix``: relational PIVOT — events long→wide with an
  explicit pivot-value list (never the implicit distinct scan, which
  costs an extra job and an unstable column order).
- ``skyline_pareto_frontier``: the classic skyline operator (maximize
  p_size, minimize p_retailprice) via the distributed block-partition
  algorithm: equi-width price blocks prune across blocks with a
  64-row block-max relation; full dominance is only tested inside a
  block. The DuckDB oracle is the textbook NOT EXISTS definition — an
  independent formulation, so the differential check certifies the
  decomposition, not a mirror image of it.
- ``theil_sen_trend``: robust per-group trend — the Theil–Sen
  estimator (median of pairwise slopes) per user over event values,
  insensitive to outliers that wreck OLS. Pairs come from a
  user-co-partitioned self-join, so the quadratic term is bounded by
  the per-group event count, never by the table.

No UDFs anywhere — every expression is JVM-side Column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# ---------------------------------------------------------------------------
# Equi-depth histogram (ANALYZE-style column stats)
# ---------------------------------------------------------------------------

_N_BINS = 16
# interior boundary fractions k/16, k=1..15 — exact binary fractions,
# so the literals are bit-identical in Spark and DuckDB
_FRACTIONS = [k / _N_BINS for k in range(1, _N_BINS)]


@query(
    "equi_depth_histogram",
    oracle=f"""
    WITH bounds AS (
      SELECT quantile_cont(o_totalprice, {_FRACTIONS}) AS bs FROM orders)
    SELECT bin,
           count(*)::BIGINT AS n_rows,
           round(min(o_totalprice), 2) AS lo_price,
           round(max(o_totalprice), 2) AS hi_price,
           round(sum(o_totalprice), 2) AS sum_price
    FROM (
      SELECT o_totalprice,
             1 + len(list_filter(bs, b -> o_totalprice > b)) AS bin
      FROM orders CROSS JOIN bounds)
    GROUP BY bin
    """,
    doc="Exact equi-depth (equal-height) histogram of o_totalprice — "
    "the ANALYZE-style column statistic selectivity estimators read. "
    "The 15 interior boundaries are ONE exact-percentile aggregate "
    "(fractions k/16 are exact binary, so Spark's percentile and "
    "DuckDB's quantile_cont interpolate bit-identically); the 1-row "
    "boundary array broadcasts back and each row's bin is "
    "1 + size(filter(bounds, b -> price > b)) — a whole-stage-codegen "
    "array lambda, no UDF and no sort. At 100 TB the exact percentile "
    "combine swaps for approx_percentile (t-digest partials, "
    "map-side-combinable) with everything downstream unchanged; the "
    "per-bin aggregate itself is an ordinary partial+final hash agg.",
)
def equi_depth_histogram(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    price = orders.select(F.col("o_totalprice").alias("p"))
    bounds = price.agg(
        F.percentile("p", F.array(*[F.lit(f) for f in _FRACTIONS])).alias("bs")
    )
    binned = price.crossJoin(F.broadcast(bounds)).select(
        "p",
        (
            F.lit(1)
            + F.size(F.filter("bs", lambda b: F.col("p") > b))
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.min("p"), 2).alias("lo_price"),
        F.round(F.max("p"), 2).alias("hi_price"),
        F.round(F.sum("p"), 2).alias("sum_price"),
    )


# The 100 TB swap-in promised by equi_depth_histogram's docstring,
# registered and differentially tested rather than narrated: boundaries
# come from approx_percentile (Greenwald–Khanna sketch — map-side
# combinable partials, no global sort, bounded executor memory) with
# accuracy 1/_APPROX_ACC relative-rank error. The oracle cannot replay
# the sketch, so this is a TOLERANCE certification: the Spark side
# measures the REAL rank error of every approx boundary against the
# real table and asserts it inside the published bound; the compared
# columns are quantized (share to 2dp) far coarser than the sketch
# error, plus the exact table min/max, so both engines agree exactly.
_APPROX_ACC = 10_000
_RANK_TOL = 0.005  # 50× the sketch's 1/accuracy guarantee


@query(
    "equi_depth_histogram_approx",
    oracle=f"""
    WITH bounds AS (
      SELECT quantile_cont(o_totalprice, {_FRACTIONS}) AS bs FROM orders),
    binned AS (
      SELECT o_totalprice AS p,
             1 + len(list_filter(bs, b -> o_totalprice > b)) AS bin
      FROM orders CROSS JOIN bounds),
    per_bin AS (
      SELECT bin, count(*)::BIGINT AS n FROM binned GROUP BY bin),
    tot AS (
      SELECT (SELECT sum(n) FROM per_bin) AS n_total,
             (SELECT round(min(p), 2) FROM binned) AS table_lo,
             (SELECT round(max(p), 2) FROM binned) AS table_hi),
    ranks AS (
      SELECT bin, n,
             sum(n) OVER (ORDER BY bin) AS cum
      FROM per_bin),
    cert AS (
      SELECT max(abs(cum / (SELECT n_total FROM tot)
                     - bin / {_N_BINS}.0)) <= {_RANK_TOL} AS rank_err_ok
      FROM ranks WHERE bin < {_N_BINS})
    SELECT r.bin, round(r.n / t.n_total, 2) AS share,
           t.table_lo, t.table_hi, c.rank_err_ok
    FROM ranks r, tot t, cert c
    """,
    doc="approx-percentile equi-depth histogram — the documented "
    "100 TB form of equi_depth_histogram: boundaries from the "
    "Greenwald–Khanna sketch (approx_percentile, accuracy "
    f"{_APPROX_ACC}) whose partials are map-side combinable, so no "
    "global sort and executor memory stays bounded; bin assignment "
    "and the per-bin aggregate are unchanged. Tolerance-style "
    "differential: the Spark side measures the true rank error of "
    "every approx boundary against the table (cumulative bin counts) "
    f"and certifies max error <= {_RANK_TOL} (50x the sketch bound); "
    "compared values are the per-bin SHARE quantized to 2dp — two "
    "orders of magnitude coarser than the sketch error — plus the "
    "exact table min/max, which no approximation touches. The oracle "
    "replays the contract with exact quantiles (rank error 0).",
)
def equi_depth_histogram_approx(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    price = orders.select(F.col("o_totalprice").alias("p"))
    bounds = price.agg(
        F.approx_percentile(
            "p",
            F.array(*[F.lit(f) for f in _FRACTIONS]),
            F.lit(_APPROX_ACC),
        ).alias("bs")
    )
    binned = price.crossJoin(F.broadcast(bounds)).select(
        "p",
        (F.lit(1) + F.size(F.filter("bs", lambda b: F.col("p") > b))).alias(
            "bin"
        ),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("p").alias("lo"),
        F.max("p").alias("hi"),
    )
    tot = per_bin.agg(
        F.sum("n").alias("n_total"),
        F.round(F.min("lo"), 2).alias("table_lo"),
        F.round(F.max("hi"), 2).alias("table_hi"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    ranks = per_bin.select("bin", "n", F.sum("n").over(w).alias("cum"))
    cert = ranks.crossJoin(F.broadcast(tot)).filter(
        F.col("bin") < _N_BINS
    ).agg(
        (
            F.max(
                F.abs(
                    F.col("cum") / F.col("n_total")
                    - F.col("bin") / F.lit(float(_N_BINS))
                )
            )
            <= _RANK_TOL
        ).alias("rank_err_ok")
    )
    return (
        ranks.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(cert))
        .select(
            "bin",
            F.round(F.col("n") / F.col("n_total"), 2).alias("share"),
            "table_lo",
            "table_hi",
            "rank_err_ok",
        )
    )


# ---------------------------------------------------------------------------
# Small-file compaction planner
# ---------------------------------------------------------------------------

_ROW_BYTES = 48  # modeled on-disk bytes per event row
_TARGET_BYTES = 8192  # compaction target output size


@query(
    "compaction_bin_packing",
    oracle=f"""
    WITH manifest AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             extract(hour FROM ts)::BIGINT AS hr,
             count(*)::BIGINT * {_ROW_BYTES} AS size_bytes
      FROM events GROUP BY 1, 2),
    planned AS (
      SELECT day, hr, size_bytes,
             CAST(floor(coalesce(sum(size_bytes) OVER (
                    PARTITION BY day ORDER BY hr
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  / {_TARGET_BYTES}) AS BIGINT) AS out_file
      FROM manifest)
    SELECT day, out_file,
           count(*)::BIGINT AS n_inputs,
           sum(size_bytes)::BIGINT AS total_bytes,
           (sum(size_bytes) > {_TARGET_BYTES}) AS overflow
    FROM planned GROUP BY day, out_file
    """,
    doc="Small-file compaction planner, the write-amplification fix "
    "every streaming ingest needs: per-(day, hour) file sizes from the "
    "manifest, then greedy consecutive bin-packing — output file id = "
    "floor(running-size-before / target) — planned with a window "
    "PARTITIONED BY DAY, because compaction (like table-format "
    "OPTIMIZE) never merges across a partition boundary. The plan "
    "stays fully distributed: one hash agg builds the manifest, one "
    "day-partitioned window assigns outputs, one hash agg summarizes; "
    "at 100 TB the manifest is metadata (file counts, not data) and "
    "each day's packing is an independent task. `overflow` marks "
    "outputs a single oversized input pushed past the target — those "
    "files are left as-is by a real compactor, not split.",
)
def compaction_bin_packing(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    manifest = (
        events.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg((F.count(F.lit(1)) * _ROW_BYTES).cast("long").alias("size_bytes"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = manifest.withColumn(
        "out_file",
        F.floor(
            F.coalesce(F.sum("size_bytes").over(w), F.lit(0)) / _TARGET_BYTES
        ).cast("long"),
    )
    return planned.groupBy("day", "out_file").agg(
        F.count(F.lit(1)).cast("long").alias("n_inputs"),
        F.sum("size_bytes").cast("long").alias("total_bytes"),
        (F.sum("size_bytes") > _TARGET_BYTES).alias("overflow"),
    )


# ---------------------------------------------------------------------------
# PIVOT (long -> wide)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_oracle() -> str:
    cols = []
    for t in _EVENT_TYPES:
        cols.append(
            f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT"
            f" AS {t}_n"
        )
        cols.append(
            f"round(coalesce(sum(CASE WHEN event_type = '{t}'"
            f" THEN value END), 0), 2) AS {t}_val"
        )
    return (
        "SELECT user_id % 100 AS cohort, "
        + ", ".join(cols)
        + " FROM events GROUP BY 1"
    )


@query(
    "pivot_event_matrix",
    oracle=_pivot_oracle(),
    doc="Relational PIVOT: the per-cohort event matrix, long→wide, "
    "with an EXPLICIT pivot-value list — `.pivot(col, values)` with "
    "the values given skips the extra distinct-scan job Spark "
    "otherwise runs AND pins a deterministic column order (an "
    "implicit pivot's column set changes whenever a new event type "
    "appears, silently breaking downstream schemas). Two aggregates "
    "per pivot value (count + summed value) compile to one "
    "partial+final hash agg pair over `cohort` — a pivot is just a "
    "conditional aggregation, which is exactly how the DuckDB oracle "
    "states it. Scales as any single groupBy on a 100-key dimension. "
    "Cells whose (cohort, type) group has NO rows come back NULL from "
    "a pivot (the coalesce inside the agg never sees them) while the "
    "oracle's CASE aggregation yields 0 — na.fill pins both to 0/0.0 "
    "so the contract holds even when a cohort lacks an event type.",
)
def pivot_event_matrix(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    return _pivot_wide(events)


def _pivot_wide(events):
    """The pivot body, factored out so tests can drive it with a
    crafted frame where a cohort LACKS an event type (the fixture
    never does) and pin the absent-cell → 0/0.0 fill."""
    wide = (
        events.groupBy((F.col("user_id") % 100).alias("cohort"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("val"),
        )
    )
    fill: dict[str, float | int] = {f"{t}_n": 0 for t in _EVENT_TYPES}
    fill.update({f"{t}_val": 0.0 for t in _EVENT_TYPES})
    return wide.na.fill(fill)


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier)
# ---------------------------------------------------------------------------

_SKY_BLOCKS = 64


@query(
    "skyline_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT p_retailprice AS price, p_size::BIGINT AS psize FROM part)
    SELECT price, psize, count(*)::BIGINT AS n_parts
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price <= p.price AND q.psize >= p.psize
        AND (q.price < p.price OR q.psize > p.psize))
    GROUP BY price, psize
    """,
    doc="Skyline (Pareto frontier) over part: minimize p_retailprice, "
    "maximize p_size — the classic skyline operator, via the "
    "distributed block-partition algorithm. Points hash into 64 "
    "equi-width price blocks (floor((price-lo)*64/span), monotone in "
    "price); a point is dominated either by a strictly-cheaper block "
    "— tested against the 64-row running block-max-size relation, "
    "broadcast back — or within its own block, tested with a "
    "block-partitioned window over the per-distinct-price max-size "
    "aggregate. The full O(n²) dominance test never runs: cross-block "
    "pruning is 64 rows of state, within-block work is "
    "partition-local. The oracle is deliberately the textbook NOT "
    "EXISTS anti-join definition — an independent formulation, so "
    "agreement certifies the decomposition itself.",
)
def skyline_pareto_frontier(spark, sf_dir):
    (part,) = tables(spark, sf_dir, "part")
    pts = part.select(
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("psize"),
    )
    bounds = pts.agg(
        F.min("price").alias("lo"), F.max("price").alias("hi")
    )
    blocked = pts.crossJoin(F.broadcast(bounds)).select(
        "price",
        "psize",
        F.least(
            F.floor(
                (F.col("price") - F.col("lo"))
                * _SKY_BLOCKS
                / F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-12))
            ),
            F.lit(_SKY_BLOCKS - 1),
        ).cast("long").alias("blk"),
    )
    # per-(block, price) max size: within a price, only the max-size
    # points can survive (same price, strictly larger size dominates)
    per_price = blocked.groupBy("blk", "price").agg(
        F.max("psize").alias("price_max"),
    )
    # within-block dominance: max size over strictly-lower distinct
    # prices (ROWS frame over the per-distinct-price aggregate)
    w_lower = (
        Window.partitionBy("blk")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_price = per_price.withColumn(
        "lower_max", F.max("price_max").over(w_lower)
    )
    # cross-block dominance: running max size over strictly-lower
    # blocks (64-row relation; every point there is strictly cheaper)
    blk_stats = per_price.groupBy("blk").agg(
        F.max("price_max").alias("blk_max")
    )
    w_blk = (
        Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    )
    blk_prev = blk_stats.select(
        "blk", F.max("blk_max").over(w_blk).alias("prev_blk_max")
    )
    survivors = (
        per_price.join(F.broadcast(blk_prev), "blk")
        .filter(
            (F.col("lower_max").isNull() | (F.col("price_max") > F.col("lower_max")))
            & (
                F.col("prev_blk_max").isNull()
                | (F.col("price_max") > F.col("prev_blk_max"))
            )
        )
        .select("blk", "price", F.col("price_max").alias("psize"))
    )
    return (
        blocked.join(survivors, ["blk", "price", "psize"])
        .groupBy("price", "psize")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend
# ---------------------------------------------------------------------------


@query(
    "theil_sen_trend",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, epoch_us(ts) AS us, value
      FROM events WHERE user_id % 5 = 0),
    pairs AS (
      SELECT a.user_id,
             (b.value - a.value) * 1000000.0 / (b.us - a.us) AS slope
      FROM ev a JOIN ev b
        ON a.user_id = b.user_id AND a.ts < b.ts),
    per_user AS (
      SELECT user_id, count(*)::BIGINT AS n_pairs,
             round(median(slope), 6) + 0.0 AS sen_slope
      FROM pairs GROUP BY user_id),
    counts AS (
      SELECT user_id, count(*)::BIGINT AS n_events FROM ev GROUP BY user_id)
    SELECT c.user_id, c.n_events, p.n_pairs, p.sen_slope
    FROM counts c JOIN per_user p ON c.user_id = p.user_id
    """,
    doc="Theil–Sen robust trend per user: the median of all pairwise "
    "slopes of (value over time) — the estimator of choice when "
    "outliers wreck OLS (breakdown point 29% vs 0%). Pairs come from "
    "a self-join CO-PARTITIONED ON user_id (one shuffle each side, "
    "then partition-local pair generation), so the estimator's "
    "inherent quadratic term is bounded by the per-user event count, "
    "never the table; slopes use exact integer microsecond deltas "
    "(unix_micros / epoch_us agree exactly) and one IEEE multiply-"
    "divide, identical in both engines. Exact `median` is a per-user "
    "combine — group-bounded memory; at 100 TB with hot users, cap "
    "pairs per user (sample events per user first) as published "
    "Theil–Sen-at-scale implementations do.",
)
def theil_sen_trend(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    ev = events.filter(F.col("user_id") % 5 == 0).select(
        "user_id",
        "ts",
        # fixture ts is TIMESTAMP_NTZ; the session TZ is pinned UTC by
        # tables(), so the cast is the identity wall-clock mapping and
        # unix_micros agrees exactly with DuckDB's epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    a = ev.alias("a")
    b = ev.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.ts") < F.col("b.ts")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        (
            (F.col("b.value") - F.col("a.value"))
            * F.lit(1000000.0)
            / (F.col("b.us") - F.col("a.us"))
        ).alias("slope"),
    )
    per_user = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        # +0.0 collapses IEEE -0.0: the two engines can land on opposite
        # zero signs for an exactly-zero median (house rule, `4b36c90`)
        (F.round(F.median("slope"), 6) + F.lit(0.0)).alias("sen_slope"),
    )
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    return counts.join(per_user, "user_id").select(
        "user_id", "n_events", "n_pairs", "sen_slope"
    )
