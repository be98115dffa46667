"""Grid-bucketed spatial neighbor join.

The cell-bucketing pattern every distributed spatial engine uses
(GeoSpark/Sedona partitioning, Uber's H3 bucketing): points land in
integer grid cells of side >= the query radius, one side fans out to
its 3x3 cell neighborhood, and candidates meet through a plain equi-
join on the cell key — never an all-pairs BroadcastNestedLoop, which is
what a naive `dist(l, r) < radius` join plans. The exact distance
predicate then filters candidates, so each qualifying pair is emitted
exactly once (the fan-out is on one side only).

At 100 TB: shuffle volume is rows + 9x the smaller side, and the
equi-join hash-partitions by cell, so skew maps to spatial hot spots —
saltable like any hot key. Integer coordinates keep the distance test
(a 64-bit squared sum) bit-exact on any engine, which is what lets the
DuckDB oracle state the same join naively.

Reference analog: no spatial surface in drune (src/drune/engines/spark
has only relational steps); this is a net-new operator family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_join(
    left: DataFrame,
    right: DataFrame,
    cell: int,
    radius: int,
    coords: tuple[str, str] = ("x", "y"),
) -> DataFrame:
    """Pairs (left row, right row) with squared Euclidean distance
    <= radius^2, via a 3x3 neighbor-cell equi-join. ``cell`` must be
    >= ``radius`` so the neighborhood is sufficient. Coordinates must
    be non-negative integers (floor-div cell math).

    Left columns are kept as-is; right columns must be disjoint. The
    smaller (right) side takes the 9x fan-out. Returns the joined
    pairs plus an exact integer ``dist2``.
    """
    if cell < radius:
        raise ValueError("cell must be >= radius for 3x3 sufficiency")
    xc, yc = coords
    lx, ly = F.col(f"l_{xc}"), F.col(f"l_{yc}")
    rx, ry = F.col(f"r_{xc}"), F.col(f"r_{yc}")

    lt = left.withColumnRenamed(xc, f"l_{xc}").withColumnRenamed(yc, f"l_{yc}")
    rt = right.withColumnRenamed(xc, f"r_{xc}").withColumnRenamed(yc, f"r_{yc}")

    lt = lt.withColumn(
        "__cx", F.expr(f"l_{xc} div {cell}")
    ).withColumn("__cy", F.expr(f"l_{yc} div {cell}"))
    rt = (
        rt.withColumn("__dx", F.explode(F.expr("sequence(-1, 1)")))
        .withColumn("__dy", F.explode(F.expr("sequence(-1, 1)")))
        .withColumn("__cx", F.expr(f"r_{xc} div {cell}") + F.col("__dx"))
        .withColumn("__cy", F.expr(f"r_{yc} div {cell}") + F.col("__dy"))
        .drop("__dx", "__dy")
    )
    dist2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
    return (
        lt.join(rt, ["__cx", "__cy"])
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= F.lit(int(radius) * int(radius)))
        .drop("__cx", "__cy")
    )
