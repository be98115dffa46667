"""Privacy / data-governance audit operators (driver extension).

``redaction.py`` removes PII from free text; this module audits the
*structured* side: k-anonymity (Sweeney 2002) and l-diversity
(Machanavelli et al. 2007) over quasi-identifier combinations — the
re-identification screens a dataset must pass before leaving a
governed zone.

Everything is one groupBy over quasi-identifier cells: the shuffle
carries (qid..., count, distinct-sensitive) aggregates, never rows, so
the audit costs a single pass at any scale (and the violating-class
report is at most |QID-combination| rows, typically tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l_diversity: int = 2,
) -> DataFrame:
    """Equivalence classes (rows sharing all quasi-identifier values)
    that violate k-anonymity (class smaller than ``k`` — the class's
    members are re-identifiable to within fewer than k candidates) or
    l-diversity (fewer than ``l_diversity`` distinct sensitive values —
    the class leaks its members' sensitive attribute even at size ≥ k).

    Returns quasi_cols + (class_size, n_sensitive, k_violation,
    l_violation) for violating classes only; an empty result is the
    release condition.
    """
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
    )
    return (
        groups.withColumn(
            "k_violation", (F.col("class_size") < k).cast("int")
        )
        .withColumn(
            "l_violation", (F.col("n_sensitive") < l_diversity).cast("int")
        )
        .filter((F.col("k_violation") == 1) | (F.col("l_violation") == 1))
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_band_col: str,
    t_ppm: int = 200_000,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) over
    an ORDERED sensitive attribute: per equivalence class, the Earth
    Mover's Distance between the class's sensitive-value distribution
    and the global one, with the ordered-attribute ground distance
    (EMD = Σ|cumulative difference| / (m−1)). k-anonymity bounds class
    size and l-diversity bounds variety; t-closeness is the screen
    that catches a class whose values are varied but all *skewed* the
    same way.

    EXACT integer arithmetic by cross-multiplication — no per-class
    probability rounding: with class counts c_j (size N_c) and global
    counts g_j (size N_g),

        cumdiff_i = Σ_{j≤i} (c_j·N_g − g_j·N_c)          (integer)
        emd_ppm   = 10⁶ · Σ_i |cumdiff_i| div ((m−1)·N_c·N_g)

    Every class is scored over the FULL band domain (a class missing a
    band still accumulates the global mass it lacks), via a broadcast
    cross of class cells × the m-row band table. Shuffle carries
    (class, band) cells only; the per-class cumulative is a window
    over m rows.

    Scale notes: all frames after the first groupBy are cell-sized.
    The cross-multiplied integers need N_c·N_g·10⁶ < 2⁶³ — fine up to
    ~10⁸ rows per side; beyond that, switch the two distributions to
    ppm-rounded form first (loses exactness, keeps the audit).

    Returns quasi_cols + (class_size, emd_ppm, t_violation) for ALL
    classes (the release report), t_violation = [emd_ppm > t_ppm].
    """
    qid = [F.col(c) for c in quasi_cols]
    bands = df.select(F.col(sensitive_band_col).alias("band")).distinct()
    classes = df.groupBy(*qid).agg(F.count(F.lit(1)).alias("n_c"))
    cells = df.groupBy(
        *qid, F.col(sensitive_band_col).alias("band")
    ).agg(F.count(F.lit(1)).alias("c"))
    global_ = df.groupBy(
        F.col(sensitive_band_col).alias("band")
    ).agg(F.count(F.lit(1)).alias("g"))
    totals = df.agg(
        F.count(F.lit(1)).alias("n_g"),
        F.count_distinct(F.col(sensitive_band_col)).alias("m"),
    )

    full = (
        classes.join(F.broadcast(bands))  # bounded cross: m band rows
        .join(cells, [*quasi_cols, "band"], "left")
        .fillna(0, subset=["c"])
        .join(F.broadcast(global_), "band")
        .join(F.broadcast(totals))
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = full.withColumn(
        "cumdiff",
        F.sum(
            F.col("c") * F.col("n_g") - F.col("g") * F.col("n_c")
        ).over(w),
    )
    return (
        cum.groupBy(*quasi_cols)
        .agg(
            F.first("n_c").alias("class_size"),
            F.expr(
                "sum(abs(cumdiff)) * 1000000 "
                "div (greatest(first(m) - 1, 1) * first(n_c) * first(n_g))"
            ).alias("emd_ppm"),
        )
        .withColumn(
            "t_violation", (F.col("emd_ppm") > t_ppm).cast("int")
        )
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    salt: str = "dp1",
) -> DataFrame:
    """Release counts with reproducible geometric-mechanism-shaped
    noise (Ghosh, Roughgarden & Sundararajan 2009 — the discrete
    Laplace): each group count is perturbed by ``noise = G₁ − G₂``
    where G₁, G₂ are Geometric(1/2) draws, the two-sided geometric
    distribution with α = 1/2. This matches the ε = ln 2 geometric
    mechanism's distribution, but the draws are a DETERMINISTIC
    function of (salt, group key) — the release is formally
    differentially private only if the salt is secret and used for a
    single release; with a known or reused salt there is no DP
    guarantee (ADVICE r5). Each geometric draw also truncates at 31
    (the u = 2³²−1 edge of the 32-bit word), mirrored exactly in the
    oracle. Released counts clamp at 0 (post-processing).

    Exactness contract: a Geometric(1/2) draw is the LEADING-ONES
    count of a uniform 32-bit word — each further leading 1 halves the
    probability — and the uniform words come from the portable md5_u32
    hash of (salt || key), so the whole mechanism is integer-only and
    engine-exact: no exp/ln, no float inverse-CDF. Leading-ones is
    computed as ``32 − bitlength(2³²−1 − u)`` with bitlength as the
    base-2 digit count (conv/printf parity, verified digit-exact).
    Seeded-hash noise makes the release REPRODUCIBLE (same salt → same
    noise), which real pipelines want for idempotent re-runs; rotate
    the salt per release epoch for fresh draws.

    Plan shape: one cell-sized groupBy; noise is row-local column
    arithmetic on the cells. Returns (group_cols..., n, noise,
    noisy_n) with noisy_n = max(0, n + noise).
    """
    from drune_spark.functions.hashes import md5_u32

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])

    def _lead_ones(u: F.Column) -> F.Column:
        comp = (F.lit(4294967295).cast("long") - u).cast("string")
        return F.lit(32) - F.length(F.conv(comp, 10, 2))

    g1 = _lead_ones(md5_u32(F.concat(F.lit(salt + "a"), key)))
    g2 = _lead_ones(md5_u32(F.concat(F.lit(salt + "b"), key)))
    cells = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    return cells.select(
        *group_cols,
        "n",
        (g1 - g2).cast("long").alias("noise"),
        F.greatest(F.lit(0).cast("long"), F.col("n") + (g1 - g2)).alias(
            "noisy_n"
        ),
    )


def dp_median_band(
    df: DataFrame,
    value_col: str,
    band_width: int = 10,
    salt: str = "dpm1",
) -> DataFrame:
    """Private median selection via report-noisy-max — the SELECTION
    side of differential privacy (dp_noisy_counts perturbs released
    VALUES; exponential-mechanism-style selection privately picks an
    ELEMENT): values bucket into ``band_width``-wide bands, each band
    scores utility u_b = −|2·cum_b − total| (maximal at the median
    band, sensitivity ≤ 2 per added/removed row), gets
    mechanism-shaped noise 2·(G₁ − G₂) from the seeded Geometric(1/2)
    leading-ones draws (the dp_noisy_counts machinery — same honesty
    caveat: formally DP only with a secret, single-use salt), and the
    noisy argmax (score DESC, band ASC — the integer-encoded max
    idiom) is the released median band.

    All-integer end to end: cumulative counts are window sums over
    the band cells, utilities and noise are int64 arithmetic, no
    exp/ln sampling — the DuckDB oracle replays every draw and the
    argmax exactly.

    One groupBy to band cells; windows run on the |bands|-row frame.
    Returns (band, n, cum_count, utility, noise, score, chosen)
    ordered by band, with exactly one chosen = 1 row.
    """
    from pyspark.sql import Window

    from drune_spark.functions.hashes import md5_u32

    band = F.expr(f"CAST({value_col} AS BIGINT) div {int(band_width)}")
    cells = (
        df.select(band.alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def _lead_ones(u):
        comp = (F.lit(4294967295).cast("long") - u).cast("string")
        return F.lit(32) - F.length(F.conv(comp, 10, 2))

    key = F.col("band").cast("string")
    g1 = _lead_ones(md5_u32(F.concat(F.lit(salt + "a"), key)))
    g2 = _lead_ones(md5_u32(F.concat(F.lit(salt + "b"), key)))
    w_cum = Window.orderBy("band")
    w_all = Window.partitionBy()
    scored = cells.select(
        "band",
        "n",
        F.sum("n").over(w_cum).alias("cum_count"),
        F.sum("n").over(w_all).alias("total"),
        (F.lit(2) * (g1 - g2)).cast("long").alias("noise"),
    ).select(
        "band",
        "n",
        "cum_count",
        (-F.abs(F.lit(2) * F.col("cum_count") - F.col("total")))
        .cast("long").alias("utility"),
        "noise",
    ).withColumn("score", F.col("utility") + F.col("noise"))
    rk = F.row_number().over(
        Window.orderBy(F.col("score").desc(), F.col("band").asc())
    )
    return (
        scored.withColumn("chosen", (rk == 1).cast("int"))
        .select("band", "n", "cum_count", "utility", "noise",
                "score", "chosen")
        .orderBy("band")
    )


def randomized_response(
    df: DataFrame,
    sensitive: Column,
    group_col: str,
    id_col: str,
    salt: str = "rr1",
    flip_denom: int = 4,
) -> DataFrame:
    """Warner-1965 randomized response — the local-DP sibling of the
    central-DP ``dp_noisy_counts``: each record reports its sensitive
    bit FLIPPED with probability p = 1/``flip_denom`` (deterministic
    md5 draw on the id — reproducible, engine-portable), and the
    per-group prevalence is debiased from reported counts alone:

        E[reported] = true·(1−p) + (n−true)·p
        ⇒ true = (reported − n·p) / (1 − 2p)
        ⇒ est  = (flip_denom·reported − n) · scale
                 div (flip_denom − 2)            (exact integers)

    The aggregator never needs the raw bit — the audit columns
    (true_count, abs_err_milli) exist because this is the calibration
    gate proving the estimator's algebra, not a production leak.

    Engine parity on negative estimates: Spark ``div`` truncates,
    DuckDB ``//`` floors — they agree only when the division is EXACT,
    so keep the milli scale (1000) divisible by ``flip_denom − 2``
    (true for the defaults; the gate pins flip_denom = 4 → ÷2).

    One groupBy shuffle carrying four longs per group. Returns
    (group_col, n, n_reported, est_milli, true_count, abs_err_milli);
    est_milli = debiased count ×1000.
    """
    if flip_denom < 3:
        raise ValueError("randomized_response needs flip_denom >= 3")
    if 1000 % (int(flip_denom) - 2) != 0:
        # inexact negative division diverges between Spark div (trunc)
        # and DuckDB // (floor) — enforce the documented precondition
        # instead of silently drifting on low-prevalence groups
        raise ValueError(
            "randomized_response needs 1000 % (flip_denom - 2) == 0 "
            "for engine-exact estimates"
        )
    from drune_spark.functions.hashes import md5_u32

    flip = (
        md5_u32(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
        % F.lit(int(flip_denom))
        == 0
    )
    truth = sensitive.cast("boolean")
    # NULL sensitive bits would count in n but silently drop from the
    # sums (NULL-parity finding) — fail loudly in-codegen instead
    null_guard = F.coalesce(
        F.assert_true(
            truth.isNotNull(),
            F.lit("randomized_response: NULL sensitive bit"),
        ).cast("long"),
        F.lit(0),
    )
    reported = truth != flip  # XOR
    # The guard rides the COUNT term (sum of 1 + guard): a NULL truth
    # makes the reported/true sum inputs NULL and Spark's Sum skips
    # null inputs BEFORE evaluating them (verified — a guard attached
    # there never fires), but this term is never NULL so the
    # assert_true always evaluates per row.
    agg = df.groupBy(group_col).agg(
        F.sum(F.lit(1).cast("long") + null_guard)
        .cast("long").alias("n"),
        F.sum(reported.cast("long")).cast("long").alias("n_reported"),
        F.sum(truth.cast("long")).cast("long").alias("true_count"),
    )
    fd = int(flip_denom)
    est = F.expr(
        f"({fd} * n_reported - n) * 1000 div ({fd} - 2)"
    )
    return agg.select(
        group_col,
        "n",
        "n_reported",
        est.alias("est_milli"),
        "true_count",
        F.abs(est - F.col("true_count") * 1000).alias("abs_err_milli"),
    )
