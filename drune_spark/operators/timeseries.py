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

def day_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    dim_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Finest-grain continuous-aggregate cells: (dims..., day) with
    exact integer milli sums. This is the materialized table the
    incremental refresh maintains (coarser grains derive from it)."""
    dims = dim_cols or []
    base = df.select(
        *dims,
        F.date_format(ts_col, "yyyy-MM-dd").alias("day"),
        F.floor(F.col(value_col) * 1000 + F.lit(0.5))
        .cast("long")
        .alias("__vmilli"),
    )
    return base.groupBy(*dims, "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__vmilli").alias("value_milli_total"),
    )


def materialize_day_rollup(
    spark,
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    dim_cols: list[str] | None = None,
    value_col: str = "value",
) -> None:
    """Initial materialization: day cells written partitioned by day, so
    a refresh later replaces whole day directories and reads prune to
    the days they ask for."""
    from drune_spark.config.models import SchemaSpec, TargetSpec
    from drune_spark.sinks.writers import write_target

    cells = day_rollup(df, ts_col, dim_cols, value_col)
    write_target(spark, cells, TargetSpec(
        name="rollup", type="file", format="parquet", path=path,
        mode="overwrite", schema=SchemaSpec(partition_by=["day"]),
    ))


def refresh_day_rollup(
    spark,
    raw_df: DataFrame,
    late_df: DataFrame,
    path: str,
    ts_col: str = "ts",
    dim_cols: list[str] | None = None,
    value_col: str = "value",
) -> list[str]:
    """Incremental continuous-aggregate refresh (the TimescaleDB
    invalidation-log pattern): only day partitions touched by late rows
    are recomputed — from ``raw_df``, which must already contain the
    late rows — and swapped in via partition overwrite. Untouched days
    are never read or rewritten.

    The distinct-day collect is partition METADATA (bounded by the
    calendar, not the data): exactly the invalidation set a refresh
    scheduler holds; it parameterizes partition pruning on the raw scan
    and the replaceWhere condition. Returns the refreshed days.
    """
    from drune_spark.config.models import SchemaSpec, TargetSpec
    from drune_spark.sinks.writers import write_target

    days = sorted(
        r.day
        for r in late_df.select(
            F.date_format(ts_col, "yyyy-MM-dd").alias("day")
        ).distinct().collect()
    )
    if not days:
        return []
    affected = raw_df.filter(
        F.date_format(ts_col, "yyyy-MM-dd").isin(days)
    )
    cells = day_rollup(affected, ts_col, dim_cols, value_col)
    in_list = ", ".join("'" + d + "'" for d in days)
    write_target(spark, cells, TargetSpec(
        name="rollup", type="file", format="parquet", path=path,
        mode="overwrite_partition",
        overwrite_condition=f"day IN ({in_list})",
        schema=SchemaSpec(partition_by=["day"]),
    ))
    return days
