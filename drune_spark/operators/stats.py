"""Grouped order statistics — exact and approximate percentiles.

``grouped_percentiles`` uses Spark's exact ``percentile`` aggregate
(full sort per group — fine for bounded group counts / audit use;
verified to produce bit-identical linear interpolation to DuckDB's
``quantile_cont``, so the oracle gate hash-matches it). At 100 TB use
``mode="approx"``: ``percentile_approx`` (t-digest-style sketch,
mergeable, map-side partial, no per-group sort) with a tunable
``accuracy`` — the right tail-latency/percentile tradeoff for
monitoring-scale data.

No counterpart in /root/reference; driver-mandated analytics
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_percentiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    percentiles: list[float],
    mode: str = "exact",
    accuracy: int = 10000,
    round_to: int | None = 6,
) -> DataFrame:
    """(group..., p, value) — one output row per group per requested
    percentile, plus the group row count."""
    ps = ", ".join(repr(float(p)) for p in percentiles)
    if mode == "exact":
        agg = F.expr(f"percentile({value_col}, array({ps}))")
    else:
        agg = F.expr(
            f"percentile_approx({value_col}, array({ps}), {accuracy})"
        )
    g = df.groupBy(*group_cols).agg(
        agg.alias("__ps"), F.count(value_col).alias("n")
    )
    out = g.select(
        *group_cols,
        "n",
        F.posexplode("__ps").alias("__i", "value"),
    )
    p_arr = F.array(*[F.lit(float(p)) for p in percentiles])
    out = out.select(
        *group_cols,
        F.element_at(p_arr, F.col("__i") + 1).alias("p"),
        F.col("n"),
        (
            F.round("value", round_to) if round_to is not None
            else F.col("value")
        ).alias("value"),
    )
    return out


def equidepth_bins(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_bins: int = 10,
    mode: str = "exact",
) -> DataFrame:
    """Equi-depth (quantile) binning per group: boundaries are the
    interior percentile cut points (i/n_bins), broadcast back onto the
    rows, and each row's bin is the count of boundaries strictly below
    its value — a whole-stage-codegen array fold, no per-row UDF.

    This is the scale-correct form of NTILE: a global/grouped ntile
    needs a full sort per group, while boundaries-then-assign is one
    percentile aggregate (t-digest ``mode="approx"`` keeps it
    map-side partial at 100 TB) plus a broadcast join and a narrow
    scan. Exact mode's boundaries bit-match DuckDB quantile_cont, so
    bin populations are oracle-checkable.

    Returns (group_cols..., bin, n) — the per-bin population (≈ equal
    by construction, shifted only by ties)."""
    ps = ", ".join(
        repr(i / n_bins) for i in range(1, n_bins)
    )
    if mode == "exact":
        agg = F.expr(f"percentile({value_col}, array({ps}))")
    else:
        agg = F.expr(f"percentile_approx({value_col}, array({ps}), 10000)")
    bounds = df.groupBy(*group_cols).agg(agg.alias("__bounds"))
    joined = df.filter(F.col(value_col).isNotNull()).join(
        F.broadcast(bounds), on=group_cols
    )
    bin_expr = F.expr(
        f"CAST(size(filter(__bounds, b -> {value_col} > b)) AS INTEGER)"
    )
    return (
        joined.select(*group_cols, bin_expr.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
