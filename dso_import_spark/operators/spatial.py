"""Distributed spatial join via grid-cell blocking.

The reference stores PostGIS geometries and relies on GiST indexes for
spatial predicates (SURVEY.md §2.7; `bagh_create.sql` GiST indexes).
Spark has no spatial index, and a naive containment join is a cartesian
product — the classic fix (used by Sedona and every distributed spatial
engine) is *grid blocking*:

1. overlay a uniform grid of ``cell_size`` over the plane;
2. assign every rectangle to each cell its bbox overlaps (≤4 cells when
   ``cell_size`` ≥ the largest rectangle extent) and every point to its
   single containing cell;
3. equi-join on the cell id — a plain shuffle/broadcast hash join that
   Catalyst partitions and AQE balances like any other join;
4. post-filter the exact containment predicate inside each cell.

The result is identical to the theta join by construction (a containing
rectangle's bbox always overlaps the point's cell), but the join is
hash-partitionable: at 100 TB both sides shuffle by cell id instead of
pairing everything with everything. ``cell_size`` is the scale lever —
smaller cells mean fewer candidates per cell but more rectangle
replicas (≤4 here); skewed cells (cities) are split further by AQE's
skew-join handling since this is an ordinary equi-join.

Coordinates are kept as integers end-to-end so cell assignment is
exact and engine-portable (no float grid boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grid_bbox_join(
    points: DataFrame,
    rects: DataFrame,
    cell_size: int,
) -> DataFrame:
    """Join points ``(point_id, px, py)`` to rectangles
    ``(rect_id, xmin, ymin, xmax, ymax)`` on exact containment
    (``xmin <= px <= xmax AND ymin <= py <= ymax``), executed as a
    grid-blocked equi-join.

    Requires non-negative integer coordinates (shift first if needed)
    so ``floor(v / cell_size)`` is the same integer in every engine.
    """
    cs = F.lit(cell_size)
    p = points.select(
        "point_id",
        "px",
        "py",
        (F.col("px") / cs).cast("long").alias("cx"),
        (F.col("py") / cs).cast("long").alias("cy"),
    )
    # each rect lands in every cell its bbox overlaps: explode the
    # (small, bounded) cell range per axis
    r = rects.select(
        "rect_id",
        "xmin",
        "ymin",
        "xmax",
        "ymax",
        F.explode(
            F.sequence(
                (F.col("xmin") / cs).cast("long"),
                (F.col("xmax") / cs).cast("long"),
            )
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                (F.col("ymin") / cs).cast("long"),
                (F.col("ymax") / cs).cast("long"),
            )
        ).alias("cy"),
    )
    return (
        p.join(r, ["cx", "cy"])  # hash-partitionable equi-join on cell id
        .filter(
            (F.col("px") >= F.col("xmin"))
            & (F.col("px") <= F.col("xmax"))
            & (F.col("py") >= F.col("ymin"))
            & (F.col("py") <= F.col("ymax"))
        )
        .select("rect_id", "point_id", "px", "py")
    )


def grid_knn_within_radius(
    queries: DataFrame,
    corpus: DataFrame,
    radius: float,
    k: int = 3,
    query_id: str = "query_id",
    corpus_id: str = "point_id",
    exclude_same_id: bool = True,
) -> DataFrame:
    """k nearest corpus points within ``radius`` of each query point,
    via grid blocking with cell_size = radius.

    Choosing the cell edge equal to the search radius makes the 3x3
    neighborhood provably COMPLETE: any point within ``radius`` of a
    query lies in the query's cell or one of its 8 neighbors, so
    replicating each query to those 9 cells (a bounded x9 explode of
    the small query side only — the corpus hashes to exactly one cell)
    turns the distance join into a plain equi-join on the cell key.
    Unbounded exact KNN needs iterative ring expansion; bounding the
    radius is what keeps the operator one-pass, and is also the honest
    production contract ("nearest within 5 km", not "nearest
    anywhere"). Squared distances keep the INPUT's numeric type
    (integer coordinates stay exact integers — no sqrt, no float
    ties) and the radius bound compares against the exact float
    radius**2, so non-integer radii and float coordinates are both
    handled faithfully.

    ``exclude_same_id`` (default True) drops corpus points whose id
    equals the query's id — correct when queries are drawn FROM the
    corpus (the self-match is meaningless); pass False when the two
    sides are unrelated tables whose id spaces may collide.

    Expects columns (id, px, py) on both inputs; returns
    (query_id, rank, point_id, dist_sq) with dist_sq in the
    coordinates' arithmetic type.
    """
    cell = float(radius)
    # the query id is renamed internally (like qx/qy): with
    # query_id == corpus_id — the natural call when queries are drawn
    # FROM the corpus, which is exactly what exclude_same_id exists
    # for — the join would otherwise produce two same-named columns
    # and every later reference fails with AMBIGUOUS_REFERENCE
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col("px").alias("qx"),
        F.col("py").alias("qy"),
        F.floor(F.col("px") / cell).cast("long").alias("cx"),
        F.floor(F.col("py") / cell).cast("long").alias("cy"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1,1), dx -> "
        "transform(sequence(-1,1), dy -> struct(dx, dy)))))"
    )
    q9 = q.select(
        "__qid", "qx", "qy", "cx", "cy", offsets.alias("o")
    ).select(
        "__qid",
        "qx",
        "qy",
        (F.col("cx") + F.col("o.dx")).alias("gx"),
        (F.col("cy") + F.col("o.dy")).alias("gy"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col("px"),
        F.col("py"),
        F.floor(F.col("px") / cell).cast("long").alias("gx"),
        F.floor(F.col("py") / cell).cast("long").alias("gy"),
    )
    # explicit multiplication (not **, which promotes to double) keeps
    # integer coordinates exactly integral; the radius bound uses the
    # exact float radius**2, so a radius of 5.5 means 30.25, never a
    # truncated 25
    dx = F.col("qx") - F.col("px")
    dy = F.col("qy") - F.col("py")
    d2 = dx * dx + dy * dy
    pairs = q9.join(c, ["gx", "gy"])
    if exclude_same_id:
        pairs = pairs.where(F.col("__qid") != F.col(corpus_id))
    pairs = pairs.select(
        "__qid", corpus_id, d2.alias("dist_sq")
    ).where(F.col("dist_sq") <= float(radius) ** 2)
    w = Window.partitionBy("__qid").orderBy("dist_sq", corpus_id)
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id), "rank", corpus_id, "dist_sq"
        )
    )
