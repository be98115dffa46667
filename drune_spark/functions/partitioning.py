"""Partitioning helpers for CPU-bound narrow operators.

A small parquet table often arrives as ONE input split (file size <
``spark.sql.files.maxPartitionBytes``), so expression-heavy per-row work
(shingling, 64-perm MinHash, SimHash bit votes, per-row md5 chains) runs
on a single core no matter how many executors exist. At 100 TB inputs
this never happens (thousands of splits); at dimension/document scale it
is the difference between 1× and 32× CPU. ``fan_out`` round-robins rows
across the session's default parallelism before such operators — the
shuffle moves only the small input, never the expanded intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # getNumPartitions on the logical plan is cheap (no job); only
    # repartition when the scan is narrower than the target.
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        current = 1
    if current >= target:
        return df
    return df.repartition(target)
