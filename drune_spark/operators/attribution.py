"""Multi-touch marketing attribution with exact integer credit.

Linear attribution: each conversion distributes one unit of credit
equally across the touches that preceded it (same user, within a
lookback window); the LAST touch absorbs the integer-division
remainder so per-conversion credit sums to exactly 1e6 ppm — credit
totals are integers and parallelism-invariant.

Shape: the forward-looking "next conversion at-or-after this touch" is
resolved with the asof.py union-window trick (one Exchange+Sort per
user over touches+conversions together), NOT a touch x conversion
range join — per-user cost is (touches + conversions) log, with no
pair fan-out. Touch counting and remainder assignment are two more
windows over the SAME (user, conversion) partitioning, so the whole
operator is one shuffle family. At 100 TB: per-user rows are bounded
by activity, hot users split by AQE like any skewed window key.

Reference analog: none in drune; this is the ad-analytics operator a
funnel (FUNNEL_BODY) feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def linear_attribution(
    events: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    lookback_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per touch-type totals: (touch_type, n_touches, n_attributed,
    credit_ppm). ``n_touches`` counts all touches of the type;
    ``n_attributed`` those credited to some conversion; ``credit_ppm``
    is the exact integer ppm credit total (1e6 per conversion split
    linearly, remainder to the last touch)."""
    base = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(order_tiebreak).alias("tb"),
        F.col(type_col).alias("etype"),
    )
    touches = base.filter(F.col("etype").isin(touch_types)).withColumn(
        "side", F.lit(0)
    )
    convs = (
        base.filter(F.col("etype") == conversion_type)
        .withColumn("side", F.lit(1))
    )
    unioned = touches.unionByName(convs)
    # Touches sort BEFORE same-timestamp conversions (side asc), so a
    # same-instant touch IS in scope of that conversion — the forward
    # scan finds each touch's next at-or-after conversion (the >= rule
    # conversion_lag also uses).
    w_next = (
        Window.partitionBy("k")
        .orderBy(F.col("ts_us").asc(), F.col("side").asc(),
                 F.col("tb").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = unioned.select(
        "*",
        F.first(
            F.when(F.col("side") == 1, F.col("ts_us")),
            ignorenulls=True,
        ).over(w_next).alias("conv_us"),
    )
    credited = (
        nxt.filter(F.col("side") == 0)
        .withColumn(
            "conv_us",
            F.when(
                F.col("conv_us") - F.col("ts_us") <= F.lit(lookback_us),
                F.col("conv_us"),
            ),
        )
    )
    w_conv = Window.partitionBy("k", "conv_us")
    w_rank = w_conv.orderBy(F.col("ts_us").desc(), F.col("tb").desc())
    scored = (
        credited.withColumn(
            "n_in_conv",
            F.when(
                F.col("conv_us").isNotNull(),
                F.count(F.lit(1)).over(w_conv),
            ),
        )
        .withColumn(
            "is_last",
            F.when(
                F.col("conv_us").isNotNull(),
                F.row_number().over(w_rank) == 1,
            ).otherwise(F.lit(False)),
        )
        .withColumn(
            "credit",
            F.when(F.col("conv_us").isNull(), F.lit(0)).otherwise(
                F.when(
                    F.col("is_last"),
                    F.lit(PPM)
                    - (F.col("n_in_conv") - 1)
                    * F.expr(f"{PPM} div n_in_conv"),
                ).otherwise(F.expr(f"{PPM} div n_in_conv"))
            ),
        )
    )
    return scored.groupBy(F.col("etype").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.count_if(F.col("conv_us").isNotNull()).alias("n_attributed"),
        F.sum("credit").alias("credit_ppm"),
    )
