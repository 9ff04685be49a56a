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

from pyspark.sql import DataFrame
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
