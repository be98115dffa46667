"""Hypertable-style time-hierarchy rollups (driver extension).

The continuous-aggregate pattern of time-series stores (hour/day
materialized rollups over an event hypertable), Spark-first: one
``rollup()`` pass produces every grain level (NULL grain columns mark
the coarser levels, standard ROLLUP semantics), and a deployment
materializes each level partitioned by day so incremental refresh is a
partition overwrite (see sinks/writers.py replaceWhere, W3) — late data
re-rolls only the affected day partitions.

Determinism: DOUBLE measures are rounded to integer milli-units BEFORE
aggregation (floor(x*1000 + 0.5)) — integer sums are exact and
order-independent, where a double sum would depend on partition order.

No counterpart in /root/reference; driver-mandated extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hypertable_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    dim_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Multi-grain rollup over (dims…, day, hour): per finest cell plus
    every ROLLUP prefix level (day totals, dim totals, grand total).
    Returns (dims…, day, hr, n_events, value_milli_total)."""
    dims = dim_cols or []
    base = df.select(
        *dims,
        F.date_format(ts_col, "yyyy-MM-dd").alias("day"),
        F.hour(ts_col).cast("int").alias("hr"),
        F.floor(F.col(value_col) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("__vmilli"),
    )
    return base.rollup(*dims, "day", "hr").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__vmilli").alias("value_milli_total"),
    )
