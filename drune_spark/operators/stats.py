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


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float = 0.05,
    hi: float = 0.95,
    mode: str = "exact",
) -> DataFrame:
    """Per-group winsorized (outlier-clipped) summary: values below the
    ``lo`` quantile or above the ``hi`` quantile are clamped to the
    boundary before aggregation — the robust-mean primitive for
    feature pipelines where a handful of corrupt rows would otherwise
    dominate a plain mean.

    Plan shape: ONE percentile aggregate per group (t-digest partial
    in ``mode="approx"`` — the 100 TB path), boundaries broadcast back,
    then a narrow clamp + second grouped aggregate. Rows never shuffle
    twice: the clamp scan reuses the first shuffle's partitioning only
    for cells, and the second aggregate is map-side partial.

    Determinism: exact percentile bit-matches DuckDB quantile_cont.
    The winsorized sum is interior-DECIMAL-sum + n_lo·p_lo + n_hi·p_hi
    in a fixed-order double expression — clipped rows contribute via
    one count×boundary product instead of per-row casts of the
    boundary double (whose →DECIMAL rounding is the one spot Spark's
    BigDecimal conversion and DuckDB's float-multiply rounding can
    disagree by 1 ulp-of-scale).

    Returns (group..., n, n_lo, n_hi, p_lo, p_hi, winsorized_sum).
    """
    if mode == "exact":
        agg_lo = F.expr(f"percentile({value_col}, {lo!r})")
        agg_hi = F.expr(f"percentile({value_col}, {hi!r})")
    else:
        agg_lo = F.expr(f"percentile_approx({value_col}, {lo!r}, 10000)")
        agg_hi = F.expr(f"percentile_approx({value_col}, {hi!r}, 10000)")
    bounds = df.groupBy(*group_cols).agg(
        agg_lo.alias("p_lo"), agg_hi.alias("p_hi")
    )
    rows = df.filter(F.col(value_col).isNotNull()).join(
        F.broadcast(bounds), on=group_cols
    )
    interior = F.when(
        (F.col(value_col) >= F.col("p_lo"))
        & (F.col(value_col) <= F.col("p_hi")),
        F.col(value_col),
    )
    agged = rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col(value_col) < F.col("p_lo"), 1).otherwise(0)
        ).cast("long").alias("n_lo"),
        F.sum(
            F.when(F.col(value_col) > F.col("p_hi"), 1).otherwise(0)
        ).cast("long").alias("n_hi"),
        F.first("p_lo").alias("p_lo"),
        F.first("p_hi").alias("p_hi"),
        F.sum(interior.cast("decimal(18,3)")).alias("__interior_dec"),
    )
    return agged.select(
        *group_cols,
        "n",
        "n_lo",
        "n_hi",
        "p_lo",
        "p_hi",
        F.expr(
            "(CAST(__interior_dec AS DOUBLE)"
            " + CAST(n_lo AS DOUBLE) * p_lo)"
            " + CAST(n_hi AS DOUBLE) * p_hi"
        ).alias("winsorized_sum"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
    mode: str = "exact",
) -> DataFrame:
    """Robust per-group outlier summary via median/MAD — the
    skew-immune alternative to mean/stddev z-scores (one corrupt 1e12
    row moves a mean arbitrarily; it moves a median not at all).

    Two percentile aggregates (median, then median absolute
    deviation), each broadcast back; the outlier test
    |x − med| > k·MAD runs in the final map-side-partial count pass.
    ``mode="approx"`` swaps both percentiles for t-digest partials —
    the 100 TB monitoring path. All compared doubles derive from the
    bit-portable percentile (== DuckDB quantile_cont) and identical
    op sequences, so the flag set is engine-identical.

    Returns (group..., n, med, mad, n_outliers).
    """
    fn = "percentile" if mode == "exact" else "percentile_approx"
    suffix = "" if mode == "exact" else ", 10000"
    rows = df.filter(F.col(value_col).isNotNull())
    med = rows.groupBy(*group_cols).agg(
        F.expr(f"{fn}({value_col}, 0.5{suffix})").alias("med")
    )
    with_dev = rows.join(F.broadcast(med), on=group_cols).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = with_dev.groupBy(*group_cols).agg(
        F.expr(f"{fn}(__dev, 0.5{suffix})").alias("mad")
    )
    flagged = with_dev.join(F.broadcast(mad), on=group_cols)
    return flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("med").alias("med"),
        F.first("mad").alias("mad"),
        F.sum(
            F.when(
                F.col("__dev") > F.lit(float(k)) * F.col("mad"), 1
            ).otherwise(0)
        ).cast("long").alias("n_outliers"),
    )


def grouped_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    scale_x: int = 1000,
    scale_y: int = 1000,
) -> DataFrame:
    """Per-group simple linear regression (y = intercept + slope·x in
    QUANTIZED units) from the same long-exact mergeable sufficient
    statistics as ``grouped_moments`` — the distributed closed-form OLS:
    one map-side-partial aggregate per group, no iteration, no solver.

    slope  = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    r²     = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))

    Every double derives from exact longs through ONE written operation
    order (mirrored verbatim in the DuckDB oracle), so slope/intercept/
    r² are bit-identical across engines without rounding. At 100 TB
    this is a single shuffle of 6 longs per group; the per-key
    regression pattern (price elasticity per SKU, drift slope per
    sensor) that MLlib's global LinearRegression can't express without
    a per-group fit loop.

    Returns (group..., n, slope, intercept, r2) — slope/intercept in
    quantized units (documented; callers rescale by scale_y/scale_x).
    """
    qx = F.floor(F.col(x_col) * scale_x + F.lit(0.5)).cast("long")
    qy = F.floor(F.col(y_col) * scale_y + F.lit(0.5)).cast("long")
    rows = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(*group_cols, qx.alias("__x"), qy.alias("__y"))
    )
    agged = rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sx2"),
        F.sum(F.col("__y") * F.col("__y")).alias("sy2"),
    )
    return agged.select(*group_cols, "n", *ols_output_exprs())


def ols_output_exprs() -> list:
    """The shared-op-order slope/intercept/r² expression family over
    (n, sx, sy, sxy, sx2, sy2) longs — built from the SAME SQL text the
    oracle embeds (``ols_sql_exprs``); that textual identity IS the
    determinism proof."""
    slope, intercept, r2 = ols_sql_exprs()
    return [
        F.expr(slope).alias("slope"),
        F.expr(intercept).alias("intercept"),
        F.expr(r2).alias("r2"),
    ]


def ols_sql_exprs() -> tuple[str, str, str]:
    """(slope, intercept, r2) SQL texts — identical to the Spark side."""
    num = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    denx = (
        "(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    deny = (
        "(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    slope = f"({num} / {denx})"
    intercept = (
        f"((CAST(sy AS DOUBLE) - {slope} * CAST(sx AS DOUBLE))"
        " / CAST(n AS DOUBLE))"
    )
    r2 = f"(({num} * {num}) / ({denx} * {deny}))"
    return slope, intercept, r2


def sqrt_moment_sql(n: str, sq: str, sm: str) -> str:
    """``floor(sqrt(n·Σx² − (Σx)²))`` as BIGINT — the ONE cross-engine
    integer-exact N·S primitive (CLAUDE.md r7 fact 9): exact integer
    moments (Spark DECIMAL(38,0) ≡ DuckDB HUGEINT) cast to a
    correctly-rounded double, one IEEE sqrt, floored to unit — both
    engines agree bit-for-bit. Shared by sampling.neyman_allocation
    (×1000 milli-scaled) and preference.group_advantage (unit σ
    denominator); extend THIS helper, never re-inline the text."""
    return (
        f"CAST(floor(sqrt(CAST(CAST({n} AS DECIMAL(38,0)) * {sq}"
        f" - {sm} * {sm} AS DOUBLE))) AS BIGINT)"
    )


def grouped_moments(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    scale_x: int = 1000,
    scale_y: int = 1000,
) -> DataFrame:
    """Per-group second-moment sufficient statistics + covariance +
    Pearson correlation, engine-exact.

    Inputs are quantized to LONGs (floor(v·scale + 0.5) — the
    ``hypertable_rollup`` discipline), so every sufficient statistic
    (n, Σx, Σy, Σxy, Σx², Σy²) is an exact integer at any parallelism
    and the frames are MERGEABLE — combine per-slice statistics by
    summing, the distributed-moments pattern. Covariance/correlation
    derive from those longs via IEEE double arithmetic in one written
    op order (long→double conversion is correctly-rounded and
    identical across engines, unlike wide-DECIMAL→double), so cov and
    corr are bit-identical without any output rounding.

    Size the scales to the column magnitudes: the caller must keep
    n·(v·scale)² under 2^63 (e.g. prices to 1e5 at 10⁸ rows → scale_y
    ≤ 10). The quantization grain is the documented precision trade;
    overflow-free by construction once the bound holds.

    Returns (group..., n, sx, sy, sxy, sx2, sy2, cov_pop, corr).
    """
    qx = F.floor(F.col(x_col) * scale_x + F.lit(0.5)).cast("long")
    qy = F.floor(F.col(y_col) * scale_y + F.lit(0.5)).cast("long")
    rows = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            *group_cols, qx.alias("__x"), qy.alias("__y")
        )
    )
    agged = rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sx2"),
        F.sum(F.col("__y") * F.col("__y")).alias("sy2"),
    )
    # one shared-op-order double expression family (mirrored in SQL)
    nd = "CAST(n AS DOUBLE)"
    cov = (
        f"(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
        f" / {nd}) / {nd}"
    )
    vx = (
        f"(CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
        f" / {nd}) / {nd}"
    )
    vy = (
        f"(CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
        f" / {nd}) / {nd}"
    )
    return agged.select(
        *group_cols,
        "n", "sx", "sy", "sxy", "sx2", "sy2",
        F.expr(cov).alias("cov_pop"),
        F.expr(f"({cov}) / sqrt(({vx}) * ({vy}))").alias("corr"),
    )


def weighted_percentile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    q_ppm: list[int],
) -> DataFrame:
    """Exact weighted percentiles (lower-bound rule): per group, the
    smallest value whose cumulative weight reaches ceil(q * W) — the
    inventory/latency quantile where each row counts ``weight`` times,
    which Spark's percentile/approx_percentile cannot express with
    non-integral repetition semantics kept exact.

    All-integer: (group, value) cells carry summed weights (one
    map-side-partial agg), a per-group cumulative window runs over
    CELLS (bounded by the value domain), and each requested quantile
    is a filtered MIN — parallelism-invariant, no interpolation-order
    FP. Returns group_cols + (q_ppm, wpct_value).
    """
    from pyspark.sql import Window

    cells = df.groupBy(*group_cols, value_col).agg(
        F.sum(weight_col).alias("__w")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    cum = cells.select(
        *group_cols, value_col,
        F.sum("__w").over(w).alias("__cw"),
        F.sum("__w").over(tot).alias("__W"),
    )
    outs = []
    for q in q_ppm:
        thresh = F.expr(f"CAST(ceil(__W * {int(q)} / 1000000.0) AS BIGINT)")
        outs.append(
            cum.filter(F.col("__cw") >= thresh)
            .groupBy(*group_cols)
            .agg(F.min(value_col).alias("wpct_value"))
            .withColumn("q_ppm", F.lit(int(q)))
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result.select(*group_cols, "q_ppm", "wpct_value")


def grouped_mode(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    value_bound: int = 1 << 20,
) -> DataFrame:
    """Deterministic per-group mode (most frequent value, smallest
    value on ties) via the integer-encoded argmax — one cell aggregate
    plus one group aggregate, no join back, no window (the
    activity_streaks argmax pattern). ``value_col`` must be integral,
    non-negative, and < value_bound.

    Returns group_cols + (mode_value, mode_count).
    """
    enc = F.col("__cnt") * F.lit(int(value_bound)) + (
        F.lit(int(value_bound) - 1) - F.col(value_col)
    )
    cells = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    return cells.groupBy(*group_cols).agg(
        F.max(enc).alias("__code")
    ).select(
        *group_cols,
        (F.lit(int(value_bound) - 1)
         - F.col("__code") % F.lit(int(value_bound))).alias("mode_value"),
        F.expr(f"__code div {int(value_bound)}L").alias("mode_count"),
    )


def rank_sum_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between two groups, exact on
    integer values: the nonparametric "did the distribution shift"
    test, computed entirely on VALUE CELLS — per distinct value the two
    group counts, midrank from the running total, rank sums by
    cell-weighted midranks. Ranks are kept at 2x scale so tie midranks
    ((2·cum_before + cnt + 1)/2) stay integer: u2 = 2·U exactly, at
    any parallelism, with full tie handling.

    Cost: one cell aggregate (map-side partial) + a window over the
    value-domain cells — rows never sort. Returns one row:
    (n_a, n_b, r2_a [2x rank-sum], u2_a [2x U], u2_b).
    """
    from pyspark.sql import Window

    cells = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(value_col)
        .agg(
            F.count_if(F.col(group_col) == group_a).alias("ca"),
            F.count_if(F.col(group_col) == group_b).alias("cb"),
        )
        .withColumn("cnt", F.col("ca") + F.col("cb"))
    )
    w = (
        Window.orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = cells.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).withColumn(
        "midrank2", 2 * F.col("cum_before") + F.col("cnt") + 1
    )
    return ranked.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(F.col("ca") * F.col("midrank2")).alias("r2_a"),
    ).select(
        "n_a", "n_b", "r2_a",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .alias("u2_a"),
        (
            2 * F.col("n_a") * F.col("n_b")
            - (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        ).alias("u2_b"),
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic on integer values,
    exact: D = max |F_a(v) − F_b(v)| computed as the integer
    cross-product max |cum_a·n_b − cum_b·n_a| (no per-row division) —
    same cells-only economics as rank_sum_u. Returns one row
    (n_a, n_b, d_num [max |cum_a·n_b − cum_b·n_a|], d_ppm
    [d_num·1e6 div (n_a·n_b)])."""
    from pyspark.sql import Window

    cells = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(value_col)
        .agg(
            F.count_if(F.col(group_col) == group_a).alias("ca"),
            F.count_if(F.col(group_col) == group_b).alias("cb"),
        )
    )
    w = (
        Window.orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = cells.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n_a", "n_b",
            F.abs(
                F.col("cum_a") * F.col("n_b")
                - F.col("cum_b") * F.col("n_a")
            ).alias("diff"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("diff").alias("d_num"))
        .select(
            "n_a", "n_b", "d_num",
            F.expr("d_num * 1000000 div (n_a * n_b)").alias("d_ppm"),
        )
    )


BENFORD_PPM = [
    # floor(log10(1 + 1/d) * 1e6) for d = 1..9 — computed once, embedded
    # identically in the oracle SQL (shared-constant pattern)
    301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757,
]


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit Benford's-law audit (Benford 1938;
    Nigrini's fraud-screen usage): compare the observed leading-digit
    distribution of a positive numeric column against the log10(1+1/d)
    law — the cheap anomaly screen for fabricated or truncated numeric
    data. Digits come from the decimal string of floor(value) (exact
    for any value ≥ 1, engine-identical); expected frequencies are the
    BENFORD_PPM integer constants, so observed/expected/deviation are
    all exact integers.

    One corpus scan into a 9-row digit aggregate (map-side partial);
    the total for the ppm share is a 9-row window, not a second pass.

    Returns (digit, n, observed_ppm, expected_ppm, dev_ppm) for
    digits 1-9.
    """
    from pyspark.sql import Window

    digits = df.filter(F.col(value_col) >= 1).select(
        F.substring(
            F.floor(F.col(value_col)).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    expected = F.create_map(
        *[
            part
            for d, ppm in enumerate(BENFORD_PPM, start=1)
            for part in (F.lit(d), F.lit(ppm))
        ]
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        counts.withColumn("n_total", F.sum("n").over(w))
        .select(
            "digit",
            "n",
            F.expr("n * 1000000 div n_total").alias("observed_ppm"),
            expected[F.col("digit")].cast("long").alias("expected_ppm"),
        )
        .withColumn(
            "dev_ppm",
            F.abs(F.col("observed_ppm") - F.col("expected_ppm")),
        )
    )


# Per-source contribution to the corpus-wide chi-squared independence
# statistic over the (source, lang) contingency table — the categorical
# drift screen for multi-crawl corpora (WHICH snapshot's language mix
# moved). ONE ANSI text runs verbatim on Spark and DuckDB (shared-text
# determinism): every term is the exact-integer cross-multiplied
# numerator (O·N − n_s·C_l, a BIGINT) squared in DOUBLE, divided once,
# floored to integer milli — integer sums after the floor, so no
# FP-order dependence survives. Zero-count cells enter via the
# sources × langs grid (chi² needs them). Scale: everything after the
# first GROUP BY is cell-sized (sources × langs); the two CROSS JOINs
# are bounded broadcast sides (grand total is 1 row).
CHI2_DRIFT_SQL = """
    WITH cl AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY source, lang
    ),
    s AS (
        SELECT source, CAST(SUM(o) AS BIGINT) AS ns FROM cl GROUP BY source
    ),
    l AS (
        SELECT lang, CAST(SUM(o) AS BIGINT) AS cnt_l FROM cl GROUP BY lang
    ),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cl),
    grid AS (
        SELECT s.source, l.lang, s.ns, l.cnt_l, t.n,
               COALESCE(c.o, CAST(0 AS BIGINT)) AS o
        FROM s CROSS JOIN l CROSS JOIN t
        LEFT JOIN cl c ON c.source = s.source AND c.lang = l.lang
    ),
    terms AS (
        SELECT source, ns,
               CAST(floor(
                   1000.0
                   * CAST(o * n - ns * cnt_l AS DOUBLE)
                   * CAST(o * n - ns * cnt_l AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(ns AS DOUBLE)
                      * CAST(cnt_l AS DOUBLE))
               ) AS BIGINT) AS term_milli
        FROM grid
    )
    SELECT source, CAST(MIN(ns) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(SUM(term_milli) AS BIGINT) AS chi2_contrib_milli
    FROM terms GROUP BY source
"""


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    trim_ppm: int = 100_000,
    scale: int = 100,
) -> DataFrame:
    """Per-group symmetric trimmed mean (drop the lowest and highest
    ``trim_ppm``·n/10⁶ values, average the middle) — the robust
    location estimate that DISCARDS tails where ``winsorize`` clamps
    them; the standard aggregate for noisy per-group metrics (latency,
    spend) whose outliers would drag a plain mean.

    Exact integer discipline: values scale to integers by ``scale``
    (e.g. 100 for 2-decimal money), the per-group cut count is
    ``n·trim_ppm div 10⁶`` (floor), membership comes from a
    row_number over (value, id) — the id tiebreak makes the kept SET
    deterministic, and because any boundary tie shares one value the
    kept MULTISET is order-invariant anyway — and the mean is an
    integer floor division of nonnegative-shifted sums, so every
    engine agrees digit-for-digit.

    One shuffle (the per-group sort window); the aggregate itself is
    map-side partial. Returns (group, n, kept, trimmed_mean_scaled).
    """
    from pyspark.sql import Window

    # double money columns must round-trip through DECIMAL before
    # scaling: (double*100)->long truncates 12344.999..., while DuckDB's
    # double->BIGINT cast rounds — the 1-cent mismatch family. A
    # DECIMAL(18,6) cast recovers the exact stored decimal in both
    # engines (the CAST(... AS DECIMAL(18,2)) oracle idiom).
    v = (
        F.col(value_col).cast("decimal(18,6)") * F.lit(scale)
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy(
        F.col("__v"), F.col(id_col)
    )
    ranked = (
        df.select(F.col(group_col), F.col(id_col), v.alias("__v"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
        )
    )
    cut = F.expr(f"(n * {trim_ppm}) div 1000000")
    kept = ranked.filter(
        (F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut)
    )
    return (
        kept.groupBy(group_col)
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).alias("kept"),
            F.sum("__v").alias("__s"),
        )
        .select(
            group_col,
            "n",
            "kept",
            (
                F.expr(
                    "(__s + 1000000000 * kept) div kept"
                )
                - F.lit(1_000_000_000)
            ).cast("long").alias("trimmed_mean_scaled"),
        )
        .orderBy(group_col)
    )


def reliability_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    max_score: int = 1_000_000,
) -> DataFrame:
    """Reliability-diagram binning for a classifier/heuristic score
    against a binary label — the calibration audit behind any
    quality-score gate: bucket the integer score (0..``max_score``,
    e.g. ppm) into ``n_bins`` equal-width bins and report, per bin,
    volume, positives, the observed positive rate and the mean score
    (both integer ppm) — a well-calibrated score has pos_rate ≈
    mean_score per bin; a flat pos_rate says the score carries no
    signal at that margin.

    One cell aggregate (map-side partial) over (bin) — never a
    per-row sort; all-integer floor divisions on nonnegative operands
    so engines agree digit-for-digit. Returns (bin, n, positives,
    pos_rate_ppm, mean_score_ppm) ordered by bin.
    """
    width = max_score // n_bins
    b = F.least(
        F.expr(f"CAST({score_col} AS BIGINT) div {width}"),
        F.lit(n_bins - 1),
    ).cast("int")
    cells = df.select(
        b.alias("bin"),
        F.col(score_col).cast("long").alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    )
    return (
        cells.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("positives"),
            F.sum("__s").alias("__ss"),
        )
        .select(
            "bin",
            "n",
            "positives",
            F.expr("(positives * 1000000) div n").alias("pos_rate_ppm"),
            F.expr("__ss div n").alias("mean_score_ppm"),
        )
        .orderBy("bin")
    )


def conformal_coverage(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    id_col: str,
    alpha_pct: int = 10,
    salt: str = "cf1",
    cal_pct: int = 50,
) -> DataFrame:
    """Split-conformal prediction audit (Vovk et al. 2005; the
    distribution-free coverage guarantee): a deterministic hash split
    sends ``cal_pct``% of rows to calibration, the conformal quantile
    q = the ceil((n_cal+1)·(1−α))-th smallest calibration
    nonconformity |label − pred| is the interval half-width, and the
    HELD-OUT rows report empirical coverage — the audit that tells you
    whether ±q actually contains (1−α) of reality before you ship the
    interval (calibration_bins grades probability estimates; this
    grades interval widths).

    Exact-integer discipline: nonconformities are integer absolute
    errors; the order statistic comes from (value, count) cells +
    cumulative sum (the weighted_percentile idiom — no global sort,
    no single-partition window; cells = distinct error values), rank
    k = (9·(n_cal+1) + 9) div 10 at α = 10%; coverage in milli via
    nonnegative integer division. The oracle replays split, rank and
    threshold exactly.

    Returns ONE row: (n_cal, k_rank, threshold, n_test, n_covered,
    coverage_milli).
    """
    from pyspark.sql import Window

    from drune_spark.functions.hashes import md5_u32

    is_cal = (
        F.pmod(
            md5_u32(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            F.lit(100),
        )
        < cal_pct
    )
    nc = F.abs(
        F.col(label_col).cast("long") - F.col(pred_col).cast("long")
    )
    base = df.select(is_cal.alias("cal"), nc.alias("nc"))
    cal_cells = (
        base.filter("cal").groupBy("nc")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = Window.orderBy("nc")
    wall = Window.partitionBy()
    keep = 100 - alpha_pct
    ranked = cal_cells.select(
        "nc",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(wall).alias("n_cal"),
    ).withColumn(
        # ceil(keep·(n_cal+1)/100) on nonnegative operands
        "k_rank",
        F.expr(f"({keep} * (n_cal + 1) + 99) div 100"),
    )
    thr = (
        ranked.filter(F.col("cum") >= F.col("k_rank"))
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.max("k_rank").alias("k_rank"),
            F.min("nc").alias("threshold"),
        )
    )
    test = base.filter(~F.col("cal")).crossJoin(F.broadcast(thr))
    return test.agg(
        F.max("n_cal").cast("long").alias("n_cal"),
        F.max("k_rank").cast("long").alias("k_rank"),
        F.max("threshold").cast("long").alias("threshold"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(
            (F.col("nc") <= F.col("threshold")).cast("long")
        ).alias("n_covered"),
    ).withColumn(
        # Guard the degenerate empty-held-out split (tiny input or
        # cal_pct=100): report NULL coverage instead of an ANSI
        # divide-by-zero (ADVICE r7).
        "coverage_milli",
        F.expr("CASE WHEN n_test > 0 THEN n_covered * 1000 div n_test END"),
    )


# Truncated inverse-CDF of Poisson(1) in ppm — the per-row replicate
# weight of the distributed (Poisson) bootstrap. P(k) = e⁻¹/k!
# cumulated and floored to ppm; k is capped at 6 (tail mass < 1 ppm).
_POISSON1_CUM_PPM = (367879, 735759, 919699, 981012, 996340, 999406)


def _poisson1_weight(u_ppm):  # u_ppm: Column in [0, 1e6)
    w = F.lit(6)
    for k in range(len(_POISSON1_CUM_PPM) - 1, -1, -1):
        w = F.when(u_ppm < _POISSON1_CUM_PPM[k], F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_micro_col: str,
    id_col: str,
    n_boot: int = 32,
    salt: str = "bs1",
) -> DataFrame:
    """Grouped-mean confidence interval by the DISTRIBUTED bootstrap:
    each row enters replicate b with a deterministic Poisson(1) weight
    (the standard Poisson approximation to multinomial resampling —
    exact multinomial needs coordinated draws across rows, which is
    precisely what a shuffle-free 100 TB resample cannot do), drawn as
    the truncated inverse-CDF of ``md5_u32(salt‖b‖':'‖id) % 10⁶``. The
    CI is the EXACT order-statistic band of the replicate means (2nd
    smallest / 2nd largest of B=32 ≈ a 94% interval) — the conformal
    discipline: no float quantile interpolation, ties broken by
    replicate id.

    One pass: rows explode into B+1 replicates (b = −1 is the point
    estimate with weight 1), one (group, b) aggregate, one group-sized
    window. Means are integer micro via ``Σ w·x div Σ w`` — order-
    independent, so the oracle replays every replicate bit-for-bit.

    Returns (group, n_rows, mean_micro, ci_lo_micro, ci_hi_micro).
    """
    from pyspark.sql import Window

    from drune_spark.functions.hashes import md5_u32

    b = F.explode(F.sequence(F.lit(-1), F.lit(n_boot - 1))).alias("b")
    rows = df.select(
        F.col(group_col).alias("g"),
        F.col(value_micro_col).alias("x"),
        F.col(id_col).alias("i"),
        b,
    )
    u = md5_u32(F.concat(F.lit(salt), F.col("b").cast("string"),
                         F.lit(":"), F.col("i").cast("string"))) % 1_000_000
    w = F.when(F.col("b") == -1, F.lit(1)).otherwise(_poisson1_weight(u))
    reps = (
        rows.withColumn("w", w)
        .groupBy("g", "b")
        .agg(
            F.sum(F.col("w") * F.col("x")).alias("wx"),
            F.sum("w").alias("ws"),
            F.sum(F.when(F.col("b") == -1, 1).otherwise(0)).alias("n"),
        )
        .select(
            "g", "b", "n",
            F.expr("CASE WHEN ws > 0 THEN wx div ws END").alias("m"),
        )
    )
    # Two consumers below (point row + rank window) — persist the
    # group×(B+1)-row replicate frame so the 5M-row explode+aggregate
    # runs once, not per branch (lazy marks suffice at 2 branches).
    reps = reps.persist()
    asc = Window.partitionBy("g").orderBy(F.col("m").asc(),
                                          F.col("b").asc())
    desc = Window.partitionBy("g").orderBy(F.col("m").desc(),
                                           F.col("b").desc())
    # Replicates whose Poisson draw selected zero total weight have a
    # NULL mean — excluded from the band on BOTH engines (Spark sorts
    # NULLS FIRST ascending, DuckDB NULLS LAST: without the filter the
    # order-statistic band diverges for tiny groups).
    ranked = reps.filter("b >= 0 AND m IS NOT NULL").select(
        "g", "m",
        F.row_number().over(asc).alias("r_lo"),
        F.row_number().over(desc).alias("r_hi"),
    )
    point = reps.filter("b = -1").select(
        "g", F.col("n").alias("n_rows"), F.col("m").alias("mean_micro")
    )
    band = ranked.groupBy("g").agg(
        F.max(F.when(F.col("r_lo") == 2, F.col("m"))).alias("ci_lo_micro"),
        F.max(F.when(F.col("r_hi") == 2, F.col("m"))).alias("ci_hi_micro"),
    )
    return point.join(band, "g").select(
        F.col("g").alias(group_col), "n_rows", "mean_micro",
        "ci_lo_micro", "ci_hi_micro",
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization across groups (the batch-effect
    correction standard, Bolstad et al. 2003): every group's value
    distribution is mapped onto the POOLED distribution, so two
    sources whose quality/length scores drift apart (different
    crawlers, different epochs) become rank-comparable — the
    cross-source score alignment a mixing policy needs before
    thresholding one global cutoff.

    Exact integer rule: row with within-group rank r of n (ties on
    the id) maps to the pooled value at rank ⌈r·N/n⌉ under the
    lower-bound rule — the smallest value whose pooled cumulative
    count reaches the target rank (the ``weighted_percentile``
    discipline; no interpolation FP). ``value_col`` must be integral
    (the cast to long TRUNCATES doubles in Spark where a naive oracle
    CAST rounds — the round-6 money trap; route fractional scores
    through an explicit DECIMAL quantization first). NULL values are
    dropped (rank windows order NULLS FIRST in Spark but LAST in
    DuckDB — the NULL-parity rule for oracle-twinned windows).

    Scale shape: within-group ranks are per-group windows (bounded by
    group size); the pooled distribution lives as VALUE CELLS
    (distinct value → [prev_cum, cum] interval — bounded by the value
    domain, never row count), and the rank inversion is an INTERVAL
    join on the broadcast cell table (prev_cum < k <= cum matches
    exactly one cell per row — no re-aggregation after the join).
    Returns (id_col, group_col, value, mapped_value).
    """
    from pyspark.sql import Window

    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col).cast("long").alias("value"),
    ).persist()  # read by ranks, cells AND totals — one scan, not 3
    wg = Window.partitionBy(group_col).orderBy("value", id_col)
    ranked = vals.select(
        id_col,
        group_col,
        "value",
        F.row_number().over(wg).alias("__r"),
        F.count(F.lit(1)).over(
            Window.partitionBy(group_col)
        ).alias("__n"),
    )
    wc = Window.orderBy("__cv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cells = (
        vals.groupBy("value")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(F.col("value").alias("__cv"), "__c")
        .select("__cv", F.sum("__c").over(wc).alias("__cum"))
        .select(
            "__cv",
            "__cum",
            F.coalesce(
                F.lag("__cum").over(Window.orderBy("__cv")), F.lit(0)
            ).alias("__prev"),
        )
    )
    total = vals.agg(F.count(F.lit(1)).alias("__tot"))
    tgt = ranked.crossJoin(F.broadcast(total)).select(
        id_col,
        group_col,
        "value",
        F.expr("(__r * __tot + __n - 1) div __n").alias("__k"),
    )
    return tgt.join(
        F.broadcast(cells),
        (F.col("__prev") < F.col("__k")) & (F.col("__k") <= F.col("__cum")),
    ).select(
        id_col,
        group_col,
        "value",
        F.col("__cv").cast("long").alias("mapped_value"),
    )
