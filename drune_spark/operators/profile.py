"""Table profiling — per-column statistics and value histograms, the
"describe my table" operator every analytics engine ships.

``profile_table`` computes per-column: row count, null count, distinct
count, and typed min/max (numeric columns as double, timestamps as
epoch-µs, strings as binary collation min/max). The agg row then fans
out to one output row per column with trivial driver-free selects — a
union over a 1-row frame, not over scans.

Scale note: the default ``distinct="approx"`` profiles in ONE
Expand-free pass (approx_count_distinct keeps HLL registers per column)
— what a wide-table user should get. ``distinct="exact"`` splits into
two cheap passes: (a) distinct counts alone over the C-way Expand —
with only long-typed count buffers the whole agg stays HashAggregate —
and (b) a keyless single-pass agg for counts/min/max. Fusing them (as
the first version did) drags every min/max/count column through the
Expand, and the string min/max buffers demote the entire aggregate to
SortAggregate: a full Sort of C× the input (measured 2.4-5.2s vs 0.8s
split, orders @ sf0.1; at 100 TB the sort of 7× the data dwarfs a
second column-pruned scan). The gate query uses exact so the DuckDB
oracle can match it bit-for-bit.

``numeric_histogram`` buckets a numeric column into ``n_buckets``
equal-width bins with the bounds taken from the same frame (broadcast
agg join, no collect): bucket = min(nb-1, floor((v-mn)/(mx-mn)*nb)) —
a fixed FP op sequence both engines reproduce on identical doubles.

No counterpart in /root/reference (its quality module validates rules,
it does not profile); driver-mandated analytics extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal"
)


def _kind(dtype: str) -> str:
    if dtype.startswith(_NUMERIC_PREFIXES):
        return "num"
    if dtype.startswith("timestamp"):
        return "ts"
    if dtype == "string":
        return "str"
    return "other"


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    distinct: str = "approx",
) -> DataFrame:
    """Long-format profile: one row per column with
    (col, n, n_null, n_distinct, min_num, max_num, min_str, max_str).
    min/max land in the *_num columns for numeric and timestamp
    (epoch-µs) columns, in *_str for strings, NULL otherwise."""
    cols = columns or df.columns
    kinds = {c: _kind(t) for c, t in df.dtypes}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if distinct != "exact":
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        k = kinds[c]
        if k == "num":
            aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
        elif k == "ts":
            us = F.unix_micros(F.col(c).cast("timestamp"))
            aggs.append(F.min(us).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(us).cast("double").alias(f"__mx_{c}"))
        elif k == "str":
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
    row = df.agg(*aggs)
    if distinct == "exact":
        # Distinct counts in their OWN agg: the multi-distinct rewrite
        # Expands the scan C ways, and with nothing but long count
        # buffers aboard it stays HashAggregate end-to-end. Riding the
        # min/max/count payload on the same agg (string buffers →
        # SortAggregate) forces a full Sort of the expanded input.
        dist_row = df.agg(
            *[F.countDistinct(c).alias(f"__nd_{c}") for c in cols]
        )
        row = row.crossJoin(dist_row)

    # ONE agg row fanned out with explode(array(struct...)) — a union
    # of per-column selects would make Catalyst re-plan (and re-scan)
    # the aggregation once per branch, column-pruned per column: C
    # scans instead of 1. The explode keeps it a single pass.
    structs = []
    for c in cols:
        k = kinds[c]
        num = k in ("num", "ts")
        structs.append(
            F.struct(
                F.lit(c).alias("col"),
                F.col("__n").alias("n"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"__mn_{c}") if num else F.lit(None).cast("double"))
                .alias("min_num"),
                (F.col(f"__mx_{c}") if num else F.lit(None).cast("double"))
                .alias("max_num"),
                (F.col(f"__mn_{c}") if k == "str"
                 else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"__mx_{c}") if k == "str"
                 else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("__p")).select(
        "__p.*"
    )


def numeric_histogram(
    df: DataFrame, col: str, n_buckets: int = 10
) -> DataFrame:
    """Equal-width histogram (bucket, n) over a numeric column; bounds
    from a broadcast min/max agg of the same frame. NULLs are dropped;
    a constant column lands entirely in bucket 0."""
    bounds = df.agg(
        F.min(col).cast("double").alias("__mn"),
        F.max(col).cast("double").alias("__mx"),
    )
    v = F.col(col).cast("double")
    bucket = F.when(F.col("__mx") <= F.col("__mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (v - F.col("__mn"))
                / (F.col("__mx") - F.col("__mn"))
                * F.lit(float(n_buckets))
            ),
        )
    )
    return (
        df.filter(F.col(col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
