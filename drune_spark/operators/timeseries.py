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

from pyspark.sql import DataFrame, Window
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


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, and
    per (cohort_week, weeks-since-first) the count of distinct users
    still active — the product-analytics companion to the funnel
    operator.

    Two shuffles, both on ``key_col``: the first-seen MIN aggregate and
    the distinct (user, week) activity set reuse the same hash
    partitioning, and the final (cohort, offset) cell aggregate carries
    cells, not users. All-integer (µs-day arithmetic), so results are
    parallelism-invariant. At 100 TB the cell count is calendar-bounded
    (weeks²), no matter the row count.

    Returns (cohort_week, offset_weeks, n_users).
    """
    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    ev = df.select(F.col(key_col).alias("k"), day.alias("d"))
    first = ev.groupBy("k").agg(F.min("d").alias("d0"))
    active = ev.distinct()
    return (
        active.join(first, "k")
        .select(
            "k",
            F.expr("d0 div 7").alias("cohort_week"),
            F.expr("(d - d0) div 7").alias("offset_weeks"),
        )
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.countDistinct("k").alias("n_users"))
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-key time-weighted average (the TimescaleDB ``time_weight``
    / LOCF-integral pattern): each observation holds its value until
    the next one, so the mean is Σ(value·Δt)/ΣΔt over consecutive
    pairs. The trailing observation has no interval and drops out —
    standard left-closed TWAP.

    One Exchange+Sort per key (the same window family as
    window_analytics); weights are integer µs and values DECIMAL(18,3),
    so the accumulated integral is exact at any parallelism. The final
    division is the one FP step; the integral exceeds 2^53 scaled
    units, so its DECIMAL→DOUBLE conversion may differ by 1 ulp across
    engines — the quotient is rounded to 6 decimals, the same
    discipline as the bm25/cosine scores.

    Returns (key, total_us, twap) for keys with ≥2 observations.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col("__ts_us").asc(), F.col(order_tiebreak).asc()
    )
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col),
            F.col(order_tiebreak),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(value_col).cast("decimal(18,3)").alias("__v_dec"),
        )
        .withColumn("__dt", F.lead("__ts_us").over(w) - F.col("__ts_us"))
        .filter(F.col("__dt").isNotNull())
    )
    agged = rows.groupBy(key_col).agg(
        F.sum("__dt").alias("total_us"),
        F.sum(
            F.col("__v_dec") * F.col("__dt").cast("decimal(18,0)")
        ).alias("__integral_dec"),
    )
    return agged.select(
        key_col,
        "total_us",
        F.round(
            F.col("__integral_dec").cast("double")
            / F.col("total_us").cast("double"),
            6,
        ).alias("twap"),
    )


def gap_fill_locf(
    df: DataFrame,
    dim_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Daily gap-fill with last-observation-carried-forward: one row
    per (dim, day) for EVERY day in the dim's observed span, carrying
    the last observed value on gap days — the interpolation step that
    turns an irregular event stream into a dense daily series.

    Per (dim, day) the representative is the LAST event by (ts,
    tiebreak) via the rank-limit-pushdown window; the calendar frame is
    explode(sequence(min_day, max_day)) — generated, never scanned —
    and the fill is one last(ignorenulls) pass ordered by day. Work is
    calendar-bounded: after the per-day top-1, everything downstream is
    (dims × days) cells regardless of input row count.

    Returns (dim, day, value, filled).
    """
    from pyspark.sql import Window

    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    ev = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(dim_col).alias("dim"),
            day.alias("day"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(order_tiebreak).alias("__tb"),
            F.col(value_col).alias("value"),
        )
    )
    w = Window.partitionBy("dim", "day").orderBy(
        F.col("__ts_us").desc(), F.col("__tb").desc()
    )
    daily = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("dim", "day", "value")
    )
    frame = (
        daily.groupBy("dim")
        .agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
        .select(
            "dim",
            F.explode(F.expr("sequence(__d0, __d1)")).alias("day"),
        )
    )
    wf = (
        Window.partitionBy("dim")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = frame.join(daily, ["dim", "day"], "left")
    return joined.select(
        "dim",
        "day",
        F.last("value", ignorenulls=True).over(wf).alias("value"),
        F.col("value").isNull().alias("filled"),
    )


def activity_streaks(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands: per key, the consecutive-active-day streak
    structure — total active days, number of streaks (islands), the
    longest streak and the day it started (earliest such streak on
    ties).

    The classic island trick: over the distinct (key, day) set,
    ``day - row_number()`` is constant within a run of consecutive
    days, so one grouped window plus two cell aggregates recover every
    island. Exactly TWO shuffles: the (key, day) distinct and the
    per-key window; the island aggregate and the final per-key
    aggregate both reuse the window's hash partitioning (their keys
    are supersets of key_col), and the longest-streak argmax is an
    integer-encoded MAX — ``len*1e7 + (1e7-1-start_day)`` — instead of
    a len==longest self-join, which would re-execute the whole subtree
    per branch (measured: 4 exchanges + doubled work). All-integer
    µs-day arithmetic — parallelism-invariant; per-key cost is bounded
    by the calendar (≤ days in retention), never by event volume.
    Encoding bounds: streak length < 1e5 days and epoch day < 1e7, so
    the code stays far inside int64.

    Reference analog: drune exposes windowed uniqueness (A4) but no
    run-length analytics; this is the standard product-analytics
    extension of that surface.

    Returns (key, n_active_days, n_streaks, longest, longest_start_day).
    """
    from pyspark.sql import Window

    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    d = df.select(F.col(key_col).alias("k"), day.alias("day")).distinct()
    w = Window.partitionBy("k").orderBy(F.col("day").asc())
    isl = d.withColumn("isl", F.col("day") - F.row_number().over(w))
    runs = isl.groupBy("k", "isl").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
    )
    enc = F.col("len") * F.lit(10_000_000) + (
        F.lit(9_999_999) - F.col("start_day")
    )
    return runs.groupBy("k").agg(
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest"),
        F.max(enc).alias("__code"),
    ).select(
        F.col("k").alias(key_col),
        "n_active_days", "n_streaks", "longest",
        (F.lit(9_999_999) - F.col("__code") % F.lit(10_000_000))
        .alias("longest_start_day"),
    )


def sequence_pattern_counts(
    df: DataFrame,
    pattern: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: encode each key's event history as a
    one-char-per-event string (upper-cased first letter of the type,
    ordered by time with a unique tiebreak) and count non-overlapping
    regex matches — the funnel operator's free-form sibling for
    arbitrary sequence motifs.

    One shuffle on ``key_col``; the per-key sequence is built with
    collect_list + array_sort (deterministic: the sort key is the
    struct (ts_us, tiebreak, code)), so per-key memory is bounded by
    events/key — same envelope as any grouped window over the key.
    Keep patterns to constructs with identical leftmost-first
    semantics in Java regex and RE2 (literals, classes, ``*``/``+``)
    so the oracle is bit-portable.

    Returns (key, n_events INT, n_matches INT).
    """
    base = df.select(
        F.col(key_col),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(order_tiebreak).alias("tb"),
            F.upper(F.substring(F.col(type_col), 1, 1)).alias("code"),
        ).alias("s"),
    )
    seq = base.groupBy(key_col).agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(s)),"
            " x -> x.code), '')"
        ).alias("seq")
    )
    return seq.select(
        key_col,
        F.length("seq").cast("int").alias("n_events"),
        F.size(F.expr(f"regexp_extract_all(seq, '{pattern}', 0)"))
        .cast("int").alias("n_matches"),
    )


def cumulative_distinct(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Running COUNT(DISTINCT key) by day — the growth curve every
    analytics store special-cases, computed with the first-seen
    transform: a key contributes to the cumulative count exactly from
    its first active day, so min-per-key + a day-cell cumulative sum
    replaces a distinct-over-expanding-window (which would rescan every
    prior day per day). One shuffle on the key for the MIN, then all
    window work happens on day CELLS (calendar-bounded) — the same
    cells-not-rows discipline as cohort_retention above.

    Returns (day, n_new, cum_keys), all integers (µs-epoch days).
    """
    from pyspark.sql import Window

    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    first = (
        df.select(F.col(key_col).alias("k"), day.alias("d"))
        .groupBy("k").agg(F.min("d").alias("day"))
    )
    cells = first.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    w = (
        Window.orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.withColumn("cum_keys", F.sum("n_new").over(w))


def date_dimension(df: DataFrame, date_col: str) -> DataFrame:
    """Calendar-dimension generator spanning [min, max] of ``date_col``:
    one row per day with engine-portable attributes. The span comes
    from a single agg row whose sequence() explodes into the frame —
    rows are GENERATED, never scanned, so the cost is the one min/max
    pass regardless of input size (the gap_fill calendar pattern).

    Weekday is computed from the integer epoch day ((d + 3) % 7 + 1,
    1=Monday — 1970-01-01 was a Thursday) rather than engine dayofweek
    builtins, whose numbering conventions differ; year/month/month-end
    use Gregorian builtins both engines agree on.

    Returns (day_str, epoch_day, y, m, d, dow_iso, is_month_end).
    """
    span = df.agg(
        F.min(F.to_date(date_col)).alias("d0"),
        F.max(F.to_date(date_col)).alias("d1"),
    )
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    epoch_day = F.datediff(F.col("day"), F.lit("1970-01-01"))
    return days.select(
        F.date_format("day", "yyyy-MM-dd").alias("day_str"),
        epoch_day.cast("int").alias("epoch_day"),
        F.year("day").cast("int").alias("y"),
        F.month("day").cast("int").alias("m"),
        F.dayofmonth("day").cast("int").alias("d"),
        # pmod, not %: 1970-01-01 was a Thursday, so (epoch_day+3) mod 7
        # maps Monday→0 … Sunday→6; plain % goes negative for pre-1970
        # days and would break the documented 1=Monday contract there
        # (the oracle mirrors the same pmod form).
        (F.pmod(epoch_day + 3, F.lit(7)) + 1).cast("int").alias("dow_iso"),
        (F.col("day") == F.last_day("day")).alias("is_month_end"),
    )


def interval_union(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Per-key union length of (possibly overlapping) intervals: merge
    overlaps, then report how many merged intervals remain and the
    total covered span — the second classic gaps-and-islands form
    (activity_streaks merges consecutive DAYS; this merges arbitrary
    numeric intervals).

    The cummax island trick: order a key's intervals by start; a new
    island begins exactly where the start exceeds the running max of
    previous ends. One Exchange+Sort on the key (the window_analytics
    partitioning family) + an island-cell aggregate. Integer bounds →
    exact at any parallelism; per-key cost ∝ intervals/key.

    Returns (key, n_intervals, covered).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new_isl",
        F.when(
            prev_max_end.isNull()
            | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "__isl",
        F.sum("__new_isl").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = flagged.groupBy(key_col, "__isl").agg(
        F.min(start_col).alias("__s"), F.max(end_col).alias("__e")
    )
    return islands.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("__e") - F.col("__s")).alias("covered"),
    )


def ohlc_resample(
    df: DataFrame,
    bucket_us: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """OHLC (open/high/low/close) downsampling to fixed time buckets —
    the candlestick resample every time-series store ships. Values are
    rounded to integer milli-units BEFORE aggregation (the hypertable
    rollup discipline above), so every output is exact and
    parallelism-invariant.

    One Exchange+Sort on (key, bucket) computes a row_number and the
    bucket size, then a single hash agg turns first/last rows into
    open/close via conditional max — no second descending sort, no
    min_by/max_by engine-divergence on struct ordering. Per-bucket
    cost ∝ rows in the bucket.

    Returns (key, bucket, open/high/low/close milli ints, n).
    """
    from pyspark.sql import Window

    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(order_tiebreak).alias("tb"),
        F.expr(
            f"CAST(floor({value_col} * 1000 + 0.5) AS BIGINT)"
        ).alias("vmilli"),
    ).withColumn("bucket", F.expr(f"ts_us div {int(bucket_us)}"))
    w = Window.partitionBy("k", "bucket").orderBy(
        F.col("ts_us").asc(), F.col("tb").asc()
    )
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(
            Window.partitionBy("k", "bucket")
        )
    )
    return ranked.groupBy("k", "bucket").agg(
        F.max(F.when(F.col("rn") == 1, F.col("vmilli"))).alias("open"),
        F.max("vmilli").alias("high"),
        F.min("vmilli").alias("low"),
        F.max(
            F.when(F.col("rn") == F.col("cnt"), F.col("vmilli"))
        ).alias("close"),
        F.count(F.lit(1)).alias("n"),
    ).withColumnRenamed("k", key_col)


def period_over_period(
    df: DataFrame,
    period_us: int,
    dim_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Period-over-period deltas: per (dim, period-bucket) row counts
    with the previous CALENDAR period's count, the delta, and an
    integer-ppm change ratio. A missing previous period (gap or series
    start) yields NULLs — the lag is matched on bucket-1 via
    self-join-free window over dense cells is WRONG under gaps, so
    the window checks the lagged bucket id explicitly.

    One raw-scan agg to (dim, bucket) cells, then all window work on
    cells (calendar-bounded). All-integer.

    The ratio is emitted as n/prev in ppm (always non-negative) rather
    than a signed pct-change: signed integer division truncates toward
    zero in Spark but floors in DuckDB, so a negative-delta ppm would
    diverge by 1 between engines (the CLAUDE.md `div` trap); the
    signed delta itself is exact.

    Returns (dim, bucket, n, prev_n, delta, ratio_ppm).
    """
    from pyspark.sql import Window

    bucket = F.expr(f"unix_micros({ts_col}) div {int(period_us)}")
    cells = (
        df.select(F.col(dim_col).alias("dim"), bucket.alias("bucket"))
        .groupBy("dim", "bucket").agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dim").orderBy(F.col("bucket").asc())
    lagged = cells.select(
        "dim", "bucket", "n",
        F.lag("bucket").over(w).alias("__pb"),
        F.lag("n").over(w).alias("__pn"),
    )
    prev_n = F.when(F.col("__pb") == F.col("bucket") - 1, F.col("__pn"))
    return lagged.select(
        "dim", "bucket", "n",
        prev_n.alias("prev_n"),
        (F.col("n") - prev_n).alias("delta"),
        F.expr(
            "CASE WHEN __pb = bucket - 1 THEN "
            "n * 1000000 div __pn END"
        ).alias("ratio_ppm"),
    )


def concurrency_peak(
    df: DataFrame,
    dim_col: str = "event_type",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Peak simultaneous intervals per dimension — the staffing/load
    question ("max concurrent sessions"), solved with the sweep-line:
    each interval contributes (+1 at start, -1 at end), one sorted
    window per dim accumulates the running load, and the max is the
    peak. End events sort BEFORE same-timestamp starts (half-open
    [s, e) intervals: touching endpoints do not overlap).

    One Exchange+Sort per dim over 2× the interval count — the same
    envelope as any grouped window; the final agg carries one row per
    dim. Integer bounds → exact.

    Returns (dim, n_intervals, peak).
    """
    from pyspark.sql import Window

    starts = df.select(
        F.col(dim_col).alias("dim"),
        F.col(start_col).alias("t"),
        F.lit(1).alias("d"),
    )
    ends = df.select(
        F.col(dim_col).alias("dim"),
        F.col(end_col).alias("t"),
        F.lit(-1).alias("d"),
    )
    sweep = starts.unionByName(ends)
    w = (
        Window.partitionBy("dim")
        .orderBy(F.col("t").asc(), F.col("d").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    load = sweep.withColumn("load", F.sum("d").over(w))
    return load.groupBy("dim").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        F.max("load").alias("peak"),
    )


def ewma_monitor(
    df: DataFrame,
    group_col: str = "event_type",
    day_col: str = "day",
    value_col: str = "n",
) -> DataFrame:
    """EWMA anomaly monitor over per-group daily series — the classic
    exponentially-weighted control chart (level + mean-absolute-
    deviation band, breach = |x − level| > 3·dev), run as an exact
    integer recurrence (α = 1/4 via shift-free ``(x·1000 + 3·prev) div
    4`` milli-units, all operands nonnegative so engine division rules
    can't diverge):

        level_t = (x_t·1000 + 3·level_{t-1}) div 4
        dev_t   = (|x_t·1000 − level_{t-1}| + 3·dev_{t-1}) div 4
        breach  = [dev_{t-1} > 0 and |x_t·1000 − level_{t-1}| > 3·dev_{t-1}]

    An EWMA is a sequential recurrence — not associative, so no window
    aggregate expresses it. This is the mandate's "custom operator via
    applyInPandas" tier used where it genuinely belongs: one Arrow batch
    per group, a bounded python-int loop over that group's days (series
    length = calendar days, not corpus size), state never leaves the
    executor. The DuckDB oracle replays the identical recurrence as a
    recursive CTE over the day index. Gaps in the calendar advance the
    recurrence by observation (compose with gap_fill upstream for
    strict-calendar semantics).

    Scale notes: input is the (group, day) count-cell table — one
    corpus-sized aggregate upstream; the recurrence runs over cells
    only, partitioned by group (thousands of independent series
    parallelize across executors; a single series is one task, which is
    the problem's inherent critical path).

    Returns (group_col, day_col, value_col, level_milli, dev_milli,
    breach).
    """
    import pandas as pd

    out_schema = (
        f"{group_col} string, {day_col} bigint, {value_col} bigint, "
        "level_milli bigint, dev_milli bigint, breach int"
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(day_col)
        xs = [int(v) * 1000 for v in pdf[value_col]]
        levels, devs, breaches = [], [], []
        level = dev = 0
        for t, x in enumerate(xs):
            if t == 0:
                level, dev, breach = x, 0, 0
            else:
                delta = abs(x - level)
                breach = 1 if dev > 0 and delta > 3 * dev else 0
                level = (x + 3 * level) // 4
                dev = (delta + 3 * dev) // 4
            levels.append(level)
            devs.append(dev)
            breaches.append(breach)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].to_numpy(),
                day_col: pdf[day_col].to_numpy(),
                value_col: pdf[value_col].to_numpy(),
                "level_milli": levels,
                "dev_milli": devs,
                "breach": breaches,
            }
        )

    return df.groupBy(group_col).applyInPandas(_run, schema=out_schema)


def cusum_monitor(
    df: DataFrame,
    group_col: str = "event_type",
    day_col: str = "day",
    value_col: str = "n",
    k_div: int = 8,
    h_mul: int = 2,
) -> DataFrame:
    """Two-sided tabular CUSUM change-point monitor over per-group
    daily series (Page 1954) — the drift-detection complement to the
    EWMA control chart above: EWMA flags spikes, CUSUM accumulates
    small persistent shifts until they cross a decision interval.

    Exact integer milli recurrence (nonnegative state; only +, −, max
    and comparisons — no division inside the loop, so engine rounding
    can't diverge). Per group: target μ = the series mean
    (sum·1000 div count), allowance k = μ div ``k_div``, decision
    h = ``h_mul``·μ:

        s_hi_t = max(0, s_hi_{t-1} + x_t·1000 − μ − k)
        s_lo_t = max(0, s_lo_{t-1} + μ − k − x_t·1000)
        alarm  = [s_hi_t > h or s_lo_t > h]   (then both sums reset)

    Like the EWMA, a CUSUM is a sequential recurrence no window
    aggregate expresses — applyInPandas over (group, day) CELLS, one
    bounded python-int loop per series, state never leaves the
    executor; the DuckDB oracle replays the identical recurrence as a
    recursive CTE. Scale notes as ewma_monitor: input is a calendar-
    sized cell table, groups parallelize, one series = one task (the
    problem's inherent critical path).

    Returns (group_col, day_col, value_col, mu_milli, s_hi_milli,
    s_lo_milli, alarm).
    """
    import pandas as pd

    out_schema = (
        f"{group_col} string, {day_col} bigint, {value_col} bigint, "
        "mu_milli bigint, s_hi_milli bigint, s_lo_milli bigint, "
        "alarm int"
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(day_col)
        xs = [int(v) * 1000 for v in pdf[value_col]]
        mu = sum(xs) // len(xs)
        k = mu // k_div
        h = h_mul * mu
        s_hi = s_lo = 0
        his, los, alarms = [], [], []
        for x in xs:
            s_hi = max(0, s_hi + x - mu - k)
            s_lo = max(0, s_lo + mu - k - x)
            alarm = 1 if (s_hi > h or s_lo > h) else 0
            his.append(s_hi)
            los.append(s_lo)
            alarms.append(alarm)
            if alarm:
                s_hi = s_lo = 0
        return pd.DataFrame(
            {
                group_col: pdf[group_col].to_numpy(),
                day_col: pdf[day_col].to_numpy(),
                value_col: pdf[value_col].to_numpy(),
                "mu_milli": [mu] * len(xs),
                "s_hi_milli": his,
                "s_lo_milli": los,
                "alarm": alarms,
            }
        )

    return df.groupBy(group_col).applyInPandas(_run, schema=out_schema)


def seasonal_decompose(
    df: DataFrame,
    day_col: str = "day",
    value_col: str = "n",
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of a daily series —
    trend (centered ``period``-day moving average), seasonal (per
    weekday-slot mean of the detrended values), residual — the
    moving-average core of STL without its loess refinements, in exact
    integer milli-units (one ``div`` per component; summation is
    integer so parallelism can't reorder anything).

    Endpoint rule: days without a full centered window carry NULL trend
    (and NULL seasonal/residual) rather than a half-window estimate —
    the honest classical convention, and exactly mirrorable in SQL
    (AVG-over-frame would silently shrink the window at the ends).

    Scale notes: the series is a day-cell table (one upstream corpus
    aggregate); the centered MA is ONE unpartitioned window over those
    cells — fine for a single series of calendar length, and the
    per-entity variant partitions the same window by entity. The
    seasonal means are a ``period``-row aggregate broadcast back.

    Returns (day_col, value_col, trend_milli, seasonal_milli,
    resid_milli).
    """
    if period % 2 == 0:
        # An even period would make the centered window span
        # 2*(period//2)+1 rows, so n_win == period never holds and
        # every trend silently comes out NULL; classical decomposition
        # uses a 2xMA there, which this implementation doesn't provide.
        raise ValueError(
            f"period must be odd (got {period}); even periods need the "
            "2xMA variant"
        )
    half = period // 2
    w = Window.orderBy(day_col).rowsBetween(-half, half)
    cells = df.select(
        F.col(day_col), F.col(value_col).cast("long").alias("v")
    )
    with_trend = cells.withColumn(
        "n_win", F.count(F.lit(1)).over(w)
    ).withColumn(
        "trend_milli",
        F.when(
            F.col("n_win") == period,
            F.expr(f"sum(v * 1000) OVER (ORDER BY {day_col} "
                   f"ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)"
                   f" div {period}"),
        ),
    ).withColumn("slot", F.pmod(F.col(day_col), F.lit(period)))
    detr = with_trend.withColumn(
        "detr", F.col("v") * 1000 - F.col("trend_milli")
    )
    # Floor-division of a possibly NEGATIVE sum: Spark `div` truncates
    # toward zero while DuckDB `//` floors, so they disagree on negative
    # non-exact quotients. (sum + C·n) div n − C with C large enough to
    # make the numerator nonnegative computes floor(sum/n) exactly in
    # BOTH conventions (truncation == floor once nonnegative).
    C = 1 << 40
    seasonal = detr.filter(F.col("detr").isNotNull()).groupBy(
        "slot"
    ).agg(
        F.expr(
            f"(sum(detr) + {C} * count(1)) div count(1) - {C}"
        ).alias("seasonal_milli")
    )
    return (
        detr.join(F.broadcast(seasonal), "slot", "left")
        .select(
            day_col,
            F.col("v").alias(value_col),
            "trend_milli",
            F.when(
                F.col("trend_milli").isNotNull(), F.col("seasonal_milli")
            ).alias("seasonal_milli"),
            (
                F.col("v") * 1000
                - F.col("trend_milli")
                - F.col("seasonal_milli")
            ).alias("resid_milli"),
        )
    )


def theil_sen_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Theil–Sen robust trend estimator (Theil 1950 / Sen 1968): the
    per-group MEDIAN of all pairwise slopes (y_j - y_i)/(x_j - x_i)
    over x_i < x_j, plus the Siegel-style intercept = median of
    (y_i - slope * x_i). Breakdown point ~29% — the standard robust
    alternative to OLS when a daily series carries outlier days
    (traffic spikes, backfills) that would drag a least-squares fit.

    Determinism: slopes are exact IEEE double quotients of integer
    deltas — identical in any engine; the median is Spark
    ``percentile`` == DuckDB ``quantile_cont`` (verified bit-for-bit
    across rounds, including the even-count interpolation); outputs
    floor to integer milli AFTER the median so nothing order-dependent
    survives.

    Plan shape at 100 TB: the input must already be CELL-sized (e.g. a
    per-(dim, day) rollup — days² pairs per group, not rows²); the
    pairwise build is a within-group self-join on the group key (one
    shuffle, AQE-broadcast when the cell table is small) and the two
    medians are cell-count aggregates. Never call this on raw events.

    Returns (group_cols…, n_points, n_pairs, slope_milli, icept_milli).
    """
    gcols = list(group_cols or [])
    cells = df.select(
        *gcols,
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = F.col("a.__x") < F.col("b.__x")
    for g in gcols:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    pairs = a.join(b, cond).select(
        *[F.col(f"a.{g}").alias(g) for g in gcols],
        (
            (F.col("b.__y") - F.col("a.__y")).cast("double")
            / (F.col("b.__x") - F.col("a.__x")).cast("double")
        ).alias("slope"),
    )
    slope = pairs.groupBy(*gcols).agg(
        F.expr("percentile(slope, 0.5)").alias("__slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    with_slope = cells.join(
        F.broadcast(slope) if not gcols else slope, on=gcols or None, how="inner"
    ) if gcols else cells.crossJoin(F.broadcast(slope))
    icept = with_slope.groupBy(*gcols).agg(
        F.expr(
            "percentile(cast(__y as double) - __slope * cast(__x as double),"
            " 0.5)"
        ).alias("__icept"),
        F.count(F.lit(1)).alias("n_points"),
        F.first("__slope").alias("__s"),
        F.first("n_pairs").alias("n_pairs"),
    )
    return icept.select(
        *gcols,
        F.col("n_points").cast("long").alias("n_points"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.expr("cast(floor(__s * 1000) as bigint)").alias("slope_milli"),
        F.expr("cast(floor(__icept * 1000) as bigint)").alias("icept_milli"),
    )


def mann_kendall(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mann–Kendall monotone-trend test (Mann 1945 / Kendall 1975) —
    Theil–Sen's standard companion: S = Σ_{i<j} sign(y_j − y_i) over
    the x-ordered series, with the tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 and the
    continuity-corrected z = (S ∓ 1)/sqrt(Var). All-integer S and
    18·Var; the single sqrt is IEEE-exact, and z is floored to milli
    AFTER the division, so nothing order-dependent survives. The
    distribution-free "is this series trending at all" screen that
    gates whether the Theil–Sen slope is worth reading.

    Plan shape at 100 TB: same contract as theil_sen_trend — input
    must be CELL-sized (per-group daily rollups); the pair stage is a
    within-group self-join over day cells (O(d²·groups), calendar-
    bounded) plus one tie histogram per group.

    Returns (group_cols…, n_points, s_stat, var18, z_milli).
    """
    gcols = list(group_cols or [])
    cells = df.select(
        *gcols,
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    cond = F.col("a.__x") < F.col("b.__x")
    for g in gcols:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    s = a.join(b, cond).groupBy(
        *[F.col(f"a.{g}").alias(g) for g in gcols]
    ).agg(
        F.sum(F.signum(F.col("b.__y") - F.col("a.__y")))
        .cast("long")
        .alias("s_stat"),
    )
    n = cells.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n"))
    ties = (
        cells.groupBy(*gcols, "__y")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy(*gcols)
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
            .cast("long")
            .alias("tie_term"),
        )
    )
    out = n.join(s, gcols) if gcols else n.crossJoin(s)
    # ties can be EMPTY (no duplicated y) — left join, not cross
    out = (
        out.join(ties, gcols, "left")
        if gcols
        else out.join(ties, F.lit(True), "left")
    )
    return out.select(
        *gcols,
        F.col("n").cast("long").alias("n_points"),
        "s_stat",
        (
            F.expr("n * (n - 1) * (2 * n + 5)")
            - F.coalesce(F.col("tie_term"), F.lit(0))
        ).cast("long").alias("var18"),
        F.expr(
            "CASE WHEN s_stat = 0 OR n < 2 THEN 0 ELSE "
            "CAST(floor(1000.0 * (s_stat - CASE WHEN s_stat > 0 THEN 1 "
            "ELSE -1 END) / sqrt((n * (n - 1) * (2 * n + 5) "
            "- coalesce(tie_term, 0)) / 18.0)) AS BIGINT) END"
        ).alias("z_milli"),
    )


def pettitt_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pettitt changepoint test (Pettitt 1979) — the nonparametric
    sibling of cusum_monitor: U_t = Σ_{i ≤ t < j} sign(y_j − y_i) over
    the x-ordered series, K = max_t |U_t|, changepoint t* = the
    earliest t attaining K. Rank-based, so outlier days cannot fake or
    hide a shift the way they bias a parametric CUSUM mean. ALL
    integer: sign pairs, straddle sums, the max — parallelism- and
    engine-invariant with no FP anywhere.

    Each (i, j) pair contributes its sign to every split t in
    [i, j): materialized as an explode over the straddle range —
    O(d³) rows for d points, which is why the input must be CELL-sized
    (daily rollups: 30 days → ≤ 9k cells/group; the theil_sen
    contract). The argmax is the integer-encoded min over
    (−|U|, t) so no per-group sort survives.

    Returns (group_cols…, n_points, k_stat, u_at_k, t_star) where
    t_star is the x value of the earliest maximizing split (the last
    point of the pre-change segment).
    """
    gcols = list(group_cols or [])
    cells = df.select(
        *gcols,
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    ranked = cells.select(
        *gcols,
        F.row_number().over(w.orderBy("__x")).alias("__r"),
        "__x",
        "__y",
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cond = F.col("a.__r") < F.col("b.__r")
    for g in gcols:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    straddle = a.join(b, cond).select(
        *[F.col(f"a.{g}").alias(g) for g in gcols],
        F.signum(F.col("b.__y") - F.col("a.__y")).cast("long").alias("s"),
        F.explode(
            F.sequence(F.col("a.__r"), F.col("b.__r") - 1)
        ).alias("t"),
    )
    u = straddle.groupBy(*gcols, "t").agg(
        F.sum("s").cast("long").alias("u_t")
    )
    # integer-encoded argmax of |U| with earliest-t tie-break:
    # min over (-|U| * 2^20 + t); t < 2^20 by the cell contract
    enc = u.select(
        *gcols,
        F.expr(f"(-abs(u_t)) * {1 << 20} + t").alias("e"),
        "u_t",
        "t",
    )
    best = enc.groupBy(*gcols).agg(F.min("e").alias("me"))
    n = cells.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n"))
    hit = enc.join(best, gcols) if gcols else enc.crossJoin(best)
    hit = hit.filter(F.col("e") == F.col("me")).select(
        *gcols, "u_t", "t"
    )
    xs = ranked.select(*gcols, F.col("__r").alias("t"), F.col("__x"))
    out = hit.join(xs, gcols + ["t"] if gcols else ["t"])
    res = out.join(n, gcols) if gcols else out.crossJoin(n)
    return res.select(
        *gcols,
        F.col("n").cast("long").alias("n_points"),
        F.abs(F.col("u_t")).cast("long").alias("k_stat"),
        F.col("u_t").cast("long").alias("u_at_k"),
        F.col("__x").cast("long").alias("t_star"),
    )
