"""Skyline (Pareto-frontier) operator.

The classic OLAP skyline query (Börzsönyi et al., "The Skyline
Operator", ICDE 2001): return the points not dominated by any other —
here 2-D minimize/minimize. p dominates q iff p.x <= q.x AND
p.y <= q.y with at least one strict inequality; exact ties on both
dimensions survive together.

Spark-first shape (the part that matters at 100 TB): a naive skyline is
an all-pairs NOT EXISTS (quadratic, BroadcastNestedLoop). Instead the
2-D frontier is computed on *cells*: group rows by x and keep only
min(y) per x (one map-side-partial hash agg — anything above its
x-cell minimum is dominated within the cell), then run the running-min
frontier scan over the distinct-x cell frame, which is bounded by the
x-domain cardinality, not the row count. Original rows never sort
globally and never self-join; survivors are recovered with a broadcast
semi-join of the (x, y) frontier cells back onto the scan. The
single-partition window is over cells only — for an unbounded x-domain
the same merge applies hierarchically (skyline of a union is a subset
of the union of skylines), so per-partition local frontiers would feed
the same cell scan.

Reference analog: no counterpart in drune (its aggregate surface is
GROUP BY only — src/drune/engines/spark/steps/aggregate.py); this is
the multi-objective top-k the reference's sort/limit step cannot
express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows of ``df`` on the minimize-``x_col`` / minimize-``y_col``
    Pareto frontier (both columns must be numeric; ties on both dims
    all survive). Returns the original rows, filtered."""
    cells = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.min(y_col).alias("__y")
    )
    # Frontier scan over distinct-x cells (bounded by x-domain size):
    # min y over strictly smaller x. Cells are distinct in x, so a ROWS
    # frame ending one row back is exactly "strictly smaller x" for any
    # numeric x type.
    w = (
        Window.orderBy(F.col("__x").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        cells.withColumn("__min_y_smaller", F.min("__y").over(w))
        .filter(
            F.col("__min_y_smaller").isNull()
            | (F.col("__min_y_smaller") > F.col("__y"))
        )
        .select("__x", "__y")
    )
    return df.join(
        F.broadcast(frontier),
        (F.col(x_col) == F.col("__x")) & (F.col(y_col) == F.col("__y")),
        "inner",
    ).drop("__x", "__y")
