"""Z-order (Morton space-filling curve) data layout for multi-column
pruning — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` pattern, built from
plain DataFrame ops.

Why it matters at 100 TB: parquet prunes row groups from column
min/max statistics. Sorting by one column makes those stats selective
for that column only; interleaving the bits of several rank-normalized
columns into one Morton key and range-partitioning + sorting by it
gives every file a narrow min/max window in EVERY participating
dimension, so predicates on any subset of the z-columns skip most
files. The layout cost is one range shuffle at write time; every
subsequent scan benefits.

Portability: normalization is exact integer arithmetic
(``(x - min) * (2^bits - 1) div (max - min)``, nonnegative operands so
floor == truncate in every engine) and the interleave is an unrolled
sum of shift/mask terms — the gate oracle replays both in SQL
bit-for-bit. Min/max ranges come from a broadcast aggregate join, not
a driver collect, so the whole thing stays one declarative plan.

No counterpart in /root/reference; driver-mandated scale extension
(data-layout half of the pruning story pinned in tests/test_plans.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _interleave(norms: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each normalized column:
    bit j of dimension k lands at position j*d + k. Pure shift/mask
    codegen — 2*bits*d integer ops per row."""
    d = len(norms)
    terms = []
    for j in range(bits):
        for k, nc in enumerate(norms):
            terms.append(
                F.shiftleft(
                    F.shiftright(nc, j).bitwiseAND(F.lit(1)), j * d + k
                )
            )
    return reduce(lambda a, b: a + b, terms)


def zorder_column(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zval",
) -> DataFrame:
    """Append a Morton z-value over integer-valued ``cols`` (each
    min-max normalized to [0, 2^bits) with exact integer arithmetic).
    Constant columns normalize to 0. bits * len(cols) must fit a
    signed 64-bit value."""
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(c).cast("long").alias(f"__mn{i}"))
        aggs.append(F.max(c).cast("long").alias(f"__mx{i}"))
    rng = df.agg(*aggs)
    scale = (1 << bits) - 1
    joined = df.crossJoin(F.broadcast(rng))
    norms = []
    for i, c in enumerate(cols):
        span = F.col(f"__mx{i}") - F.col(f"__mn{i}")
        norms.append(
            F.when(span <= 0, F.lit(0).cast("long")).otherwise(
                F.expr(f"(({c} - __mn{i}) * {scale}) div (__mx{i} - __mn{i})")
            )
        )
    return joined.select(*df.columns, _interleave(norms, bits).alias(out_col))


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` parquet clustered on the z-curve: range-partition
    into ``n_files`` z-contiguous files, each internally sorted by z so
    parquet row-group stats are tight in every z-dimension."""
    z = zorder_column(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, F.col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_spans(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Layout audit: per output file, row count and min/max of each
    column — the windows parquet row-group pruning actually sees. Used
    to verify a clustered layout delivers narrow per-file spans."""
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("__file").agg(*aggs)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite ``src_path`` into
    ``ceil(rows / target_rows_per_file)`` files at ``dst_path``.
    Returns the output file count.

    With ``sort_cols`` the rewrite range-partitions + sorts on them —
    compaction and re-clustering in one shuffle (parquet stats become
    selective again, see ``file_spans``). Without, it coalesces
    round-robin. The row count is one metadata-cheap pass; everything
    else is the single write shuffle. The 100 TB version of this runs
    per partition directory, not whole-table."""
    import math

    df = spark.read.parquet(src_path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    if sort_cols:
        out = df.repartitionByRange(
            n_files, *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    written = spark.read.parquet(dst_path)
    files = written.select(
        F.input_file_name().alias("f")
    ).distinct().count()
    return files


def hilbert_xy2d(x, y, bits: int):
    """Vectorized Hilbert curve index (numpy): map normalized integer
    (x, y) in [0, 2^bits)² to the distance d along the order-``bits``
    Hilbert curve — the standard per-bit quadrant/rotate recurrence
    (Wikipedia xy2d), run bottom-up from the top bit. Pure int64 ops;
    the SQL oracle unrolls the identical ``bits`` stages."""
    import numpy as np

    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = ry == 0
        swap_flip = flip & (rx == 1)
        xf = np.where(swap_flip, s - 1 - x, x)
        yf = np.where(swap_flip, s - 1 - y, y)
        x, y = np.where(flip, yf, xf), np.where(flip, xf, yf)
        s >>= 1
    return d


def hilbert_column(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "hval",
) -> DataFrame:
    """Append an order-``bits`` Hilbert curve value over two
    integer-valued columns — the locality-preserving upgrade to
    zorder_column (Hilbert has no Morton "seams": consecutive curve
    positions are always grid-adjacent, which is why Delta's liquid
    clustering moved from Z-order to Hilbert). Same exact-integer
    min-max normalization as zorder_column (broadcast range join, no
    collect); the curve recurrence itself is inherently per-bit
    stateful, so it runs as an Arrow-batched pandas_udf over the two
    normalized columns (row-local, no shuffle — the scan stage absorbs
    it), NOT a row-at-a-time Python UDF.

    Layout use is identical to zorder_write: range-partition + sort by
    ``out_col`` at write time, prune on min/max stats at read time.
    """
    if len(cols) != 2:
        raise ValueError("hilbert_column is defined for exactly 2 columns")
    from pyspark.sql.functions import pandas_udf

    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(c).cast("long").alias(f"__mn{i}"))
        aggs.append(F.max(c).cast("long").alias(f"__mx{i}"))
    rng = df.agg(*aggs)
    scale = (1 << bits) - 1
    joined = df.crossJoin(F.broadcast(rng))
    norms = []
    for i, c in enumerate(cols):
        span = F.col(f"__mx{i}") - F.col(f"__mn{i}")
        norms.append(
            F.when(span <= 0, F.lit(0).cast("long")).otherwise(
                F.expr(f"(({c} - __mn{i}) * {scale}) div (__mx{i} - __mn{i})")
            )
        )

    @pandas_udf("long")
    def _h(xs, ys):
        import pandas as pd

        return pd.Series(hilbert_xy2d(xs.to_numpy(), ys.to_numpy(), bits))

    return joined.select(
        *df.columns, _h(norms[0], norms[1]).alias(out_col)
    )


def zonemap_skip_audit(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_rows: int = 64,
    lo: int | None = None,
    hi: int | None = None,
) -> DataFrame:
    """Zone-map (row-group min/max) skipping effectiveness audit: for
    a range predicate ``value BETWEEN lo AND hi``, how many simulated
    row-groups a reader could SKIP under (a) the natural ``order_col``
    layout vs (b) a layout clustered on ``value_col`` — the
    quantified before/after for a zorder_write/compact decision
    (zorder_layout builds the clustering key; this measures what the
    clustering buys on a given predicate). A group is skippable iff
    its [min, max] misses [lo, hi] entirely — exactly the parquet
    row-group-stats pruning rule.

    Simulation note: groups are ``row_number() div group_rows`` under
    each layout's total order (ties broken by ``order_col``), i.e. a
    global-sort window — fine at audit scale, and at production scale
    this operator is unnecessary: the real row-group stats come free
    from the parquet footers (file_spans reads them); the audit's
    value is choosing layouts BEFORE paying for the rewrite.

    Returns one row per layout: (layout, n_groups, groups_skipped,
    rows_scanned) — rows_scanned = rows inside non-skippable groups.
    """
    if lo is None or hi is None:
        # A NULL bound would make the skip predicate NULL for every
        # group (groups_skipped = NULL, rows_scanned = all rows) —
        # fail fast instead (ADVICE r7).
        raise ValueError("zonemap_skip_audit requires both lo and hi bounds")
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")

    def audit(order_cols, name: str) -> DataFrame:
        # order_cols refer to the projected names: "o" (natural) / "v"
        w = Window.orderBy(*order_cols)
        g = (
            df.select(v.alias("v"), F.col(order_col).alias("o"))
            .withColumn("__rn", F.row_number().over(w) - 1)
            .withColumn(
                "grp", F.expr(f"__rn div {int(group_rows)}")
            )
            .groupBy("grp")
            .agg(
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        skip = (F.col("mx") < F.lit(lo)) | (F.col("mn") > F.lit(hi))
        return g.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(skip.cast("long")).alias("groups_skipped"),
            F.sum(F.when(skip, F.lit(0)).otherwise(F.col("n")))
            .alias("rows_scanned"),
        )

    natural = audit([F.col("o")], "natural")
    clustered = audit([F.col("v"), F.col("o")], "clustered")
    return natural.unionAll(clustered).orderBy("layout")
