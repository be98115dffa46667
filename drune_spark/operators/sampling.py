"""Deterministic, engine-portable sampling (driver extension).

Training-data pipelines need samples that are REPRODUCIBLE across reruns,
cluster sizes, and even engines (the sample drawn by the Spark pipeline
must be re-derivable by an auditing query elsewhere). ``df.sample()``
fails all three (seeded per partition-split). Instead:

    keep row ⟺ substring(md5(key), 1, 4) < threshold_hex

md5 is identical everywhere; fixed-width lowercase hex compares like the
number it encodes, so a string comparison implements the numeric
threshold without any engine-specific hex-to-int conversion. The
fraction granularity is 1/65536 per hex digit pair — 4 digits gives
0.0015% steps, plenty for corpus subsampling.

Also: salt the key to draw independent samples from the same data
(different ``salt`` → statistically independent membership).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fraction_to_hex_threshold(fraction: float, digits: int = 4) -> str:
    """Hex string such that P(md5 prefix < threshold) ≈ fraction.

    Thresholds are compared LEXICOGRAPHICALLY against fixed-width hex
    buckets, so fraction 1.0 must stay single-width: 'g' sorts above
    every hex digit and therefore admits all buckets ('ffff' < 'g'; the
    naive '10000' would sort BELOW 'ffff' and admit almost nothing).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    space = 16 ** digits
    value = int(round(fraction * space))
    if value >= space:
        return "g"
    return format(value, f"0{digits}x")


def hash_bucket(key: Column, salt: str = "", digits: int = 4) -> Column:
    """The row's md5-prefix string (lowercase hex, fixed width)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, digits)


def sample_by_hash(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
    digits: int = 4,
) -> DataFrame:
    """Keep ≈``fraction`` of rows, deterministically by ``key_col``.

    Same keys are kept on every rerun, at any parallelism, and by any
    engine that can compute md5 — the property plain ``df.sample``
    cannot give. Rows with equal keys are kept or dropped together
    (stable dedup-aware sampling).
    """
    threshold = fraction_to_hex_threshold(fraction, digits)
    return df.filter(hash_bucket(F.col(key_col), salt, digits) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
    digits: int = 4,
) -> DataFrame:
    """Per-stratum deterministic sampling: each group keeps ≈ its own
    fraction, by the same md5-prefix threshold as ``sample_by_hash`` —
    so membership is reproducible at any parallelism and re-derivable
    by any engine. The per-group threshold is a CASE expression over
    the (small, config-sized) fractions dict: pure codegen, no join, no
    shuffle — the corpus-rebalancing primitive (upweight rare
    languages/sources, cap dominant ones) when an exact per-group quota
    is not required (quotas need a per-group rank = one shuffle;
    thresholds are free)."""
    threshold = F.lit(fraction_to_hex_threshold(default_fraction, digits))
    for name, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(group_col) == F.lit(name),
            F.lit(fraction_to_hex_threshold(frac, digits)),
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), salt, digits) < threshold)


def split_by_hash(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
    digits: int = 4,
) -> dict[str, DataFrame]:
    """Disjoint train/val/test-style splits: consecutive hash ranges, so
    membership is deterministic and the splits are exactly disjoint."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    out: dict[str, DataFrame] = {}
    lo = 0.0
    for name, frac in fractions.items():
        lo_hex = fraction_to_hex_threshold(lo, digits)
        hi_hex = fraction_to_hex_threshold(lo + frac, digits)
        bucket = hash_bucket(F.col(key_col), salt, digits)
        out[name] = df.filter((bucket >= F.lit(lo_hex)) & (bucket < F.lit(hi_hex)))
        lo += frac
    return out


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement for integer
    weights — the lottery-ticket scheme: a row of weight w holds w
    tickets, ticket i hashes to md5_u32("salt:key:i"), the row's draw
    key is its MINIMUM ticket, and the global n smallest draw keys win.
    Selection probability rises with weight (P(min of w uniform hashes
    beats the field) ≈ w× a unit row's for n ≪ N), membership is
    reproducible at any parallelism / engine (pure md5 integer math —
    no ``rand()``, no pow/ln doubles whose libm rounding differs
    across engines), and disjoint salts draw independent samples.

    Plan shape at 100 TB: the ticket fold is a NARROW
    array_min(transform(sequence(1, w), …)) — no explode, no shuffle —
    and the global top-n is orderBy+limit = TakeOrderedAndProject:
    every map task ships at most n (draw_key, row) candidates, never a
    full sort. Weights must be small integers (tickets are materialized
    per row inside the fold; cap ~10⁴) — the corpus-mixing upsample
    convention (``corpus_mix`` uses the same integer-weight contract).

    Returns the winning rows + (weight, ticket), ticket ascending.
    """
    from drune_spark.functions.partitioning import fan_out

    key = f"CAST({key_col} AS STRING)"
    ticket_hash = (
        f"CAST(conv(substring(md5(concat('{salt}:', {key}, ':', "
        f"CAST(i AS STRING))), 1, 8), 16, 10) AS LONG)"
    )
    draw = (
        f"array_min(transform(sequence(1, CAST({weight_col} AS INT)), "
        f"i -> {ticket_hash}))"
    )
    # fan_out (r10): the ticket fold is an INTERPRETED HOF paying up to
    # `weight` md5 evaluations per row, and sf-scale inputs arrive as a
    # single parquet split — without the width the whole fold runs on
    # one core (r8 matryoshka lesson). The shuffle carries only the
    # pre-ticket columns; ticket values are per-row md5 functions and
    # TakeOrdered is a global order, so placement cannot change the
    # result. No-op when the input is already at core-count width.
    return (
        fan_out(df.filter(F.col(weight_col) >= 1))
        .withColumn("ticket", F.expr(draw))
        .orderBy("ticket", key_col)
        .limit(n)
    )


def corpus_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "",
    digits: int = 4,
) -> DataFrame:
    """Per-source mixture resampling with repetition (LLM corpus mixing).

    Each source is resampled to ``weight`` expected epochs: weight 2.5
    keeps every row twice (copy_id 0, 1) plus a deterministic 50%
    hash-sample as a partial third epoch; weight 0.25 keeps a 25%
    sample. The partial-epoch draw hashes (salt, copy_id, key) so
    different epochs are independent, and — like everything in this
    module — membership is reproducible across reruns, parallelism, and
    engines.

    Plan shape: one ``explode(sequence(...))`` (narrow, fan-out factor
    ceil(weight) per row) + a filter — no shuffle, no RNG. Output =
    input columns + ``copy_id``. At 100 TB the explode multiplies only
    sources that are genuinely upsampled; downsampled sources are
    filtered at the scan stage.
    """
    floor_w = F.lit(int(default_weight))
    thresh = F.lit(
        fraction_to_hex_threshold(default_weight - int(default_weight), digits)
    )
    for src, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {src}")
        cond = F.col(source_col) == src
        floor_w = F.when(cond, F.lit(int(w))).otherwise(floor_w)
        thresh = F.when(
            cond, F.lit(fraction_to_hex_threshold(w - int(w), digits))
        ).otherwise(thresh)
    exploded = df.withColumn(
        "copy_id", F.explode(F.sequence(F.lit(0), floor_w))
    )
    bucket = F.substring(
        F.md5(
            F.concat(
                F.lit(salt),
                F.lit("e"),
                F.col("copy_id").cast("string"),
                F.lit(":"),
                F.col(key_col).cast("string"),
            )
        ),
        1,
        digits,
    )
    return exploded.filter((F.col("copy_id") < floor_w) | (bucket < thresh))


def stratified_quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
) -> DataFrame:
    """Exact per-group quotas (complement of the fraction-based
    ``stratified_sample``): EXACTLY ``min(quota, group size)`` rows per
    group, chosen deterministically by md5(key) order — the
    fixed-budget eval-set / per-source-cap pattern where "83 rows ± a
    few" isn't acceptable.

    Cost model vs the fraction sampler: fractions are a shuffle-free
    CASE filter, but quotas need a per-group rank — ONE hash shuffle on
    the group key with the WindowGroupLimit partial below the Exchange,
    so map tasks already ship ≤ quota rows per group, never the group.
    The md5 orders rows uniformly and portably (engine-identical), with
    the raw key as total-order tie-break.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def negative_pairs(
    df: DataFrame,
    id_col: str,
    n_neg: int = 3,
    n_buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Deterministic contrastive-negative mining: for each anchor row,
    ``n_neg`` pseudo-random negative partners — without RNG, a
    cartesian, or a global index.

    Scheme: every doc hashes into one of ``n_buckets`` buckets whose
    REPRESENTATIVE is its minimum doc id (one cells-sized aggregate);
    occupied buckets are then densely ranked 0..R−1, and draw j for an
    anchor takes representative md5_u32(salt:n:anchor:j) mod R — the
    dense rank guarantees every draw lands on an occupied slot, so each
    anchor gets exactly ``n_neg`` negatives minus rare self-matches.
    Membership is pure md5 integer math — reproducible at any
    parallelism and re-derivable by an auditing engine.

    Plan at 100 TB: the representative table is ≤B rows (dense-ranked
    with one bounded single-partition window, then broadcast — B is a
    constant, not data-sized) and a broadcast 1-row count; the anchor
    side is a narrow explode(sequence) — the corpus never shuffles.
    Raise ``n_buckets`` for diversity; it only grows the broadcast.

    Returns (anchor_id, j, neg_id).
    """
    from pyspark.sql import Window

    from drune_spark.functions.hashes import md5_u32

    ids = df.select(F.col(id_col).alias("did"))
    reps = (
        ids.withColumn(
            "bucket",
            md5_u32(F.concat(F.lit(f"{salt}:b:"), F.col("did").cast("string")))
            % n_buckets,
        )
        .groupBy("bucket")
        .agg(F.min("did").alias("neg_id"))
        .select(
            (F.row_number().over(Window.orderBy("bucket")) - 1).alias("idx"),
            "neg_id",
        )
    )
    n_reps = reps.agg(F.count(F.lit(1)).alias("n_reps"))
    probes = (
        ids.select(F.col("did").alias("anchor_id"))
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(n_neg))))
        .crossJoin(F.broadcast(n_reps))
        .withColumn(
            "idx",
            md5_u32(F.concat(
                F.lit(f"{salt}:n:"),
                F.col("anchor_id").cast("string"),
                F.lit(":"),
                F.col("j").cast("string"),
            )) % F.col("n_reps"),
        )
    )
    return (
        probes.join(F.broadcast(reps), "idx")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "j", "neg_id")
    )


def unimax_alloc(
    df: DataFrame,
    group_cols: list[str],
    token_count_col,
    budget_num: int = 1,
    budget_den: int = 2,
    epoch_cap: int = 1,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    waterfill a token budget across corpus domains so every domain gets
    an equal share of the budget, except that no domain repeats more
    than ``epoch_cap`` epochs — the mixing rule that beats temperature
    sampling for multi-domain corpora. ``corpus_mix`` above *applies* a
    chosen epoch allocation; this computes the allocation itself.

    Exact integer waterfilling: domains sorted by cap ascending; domain
    r is capped iff ``cap_r · (n − r + 1) + prefix_caps_before_r ≤ B``
    (the "is this cap below the water level" test, evaluated in exact
    int64 — no FP). Uncapped domains split the remaining budget evenly;
    the integer remainder goes to the first ``R mod m`` uncapped domains
    in the same total order, so the allocation sums exactly to the
    budget and both engines agree bit-for-bit. The budget itself is
    ``total_tokens · budget_num div budget_den`` (derived from the
    corpus, so the gate needs no external constant).

    Scale notes: the corpus is touched once (the per-domain token-count
    aggregate); everything after runs on the s-row domain table — the
    unpartitioned waterfilling window sorts s rows, not the corpus, and
    the two 1-row scalar frames (totals, threshold index) are broadcast
    crossJoins (the percent_of_total totals pattern).

    Returns group_cols + (n_tokens, cap, allocation, epochs_ppm).
    """
    gcols = [F.col(c) for c in group_cols]
    counts = df.groupBy(*gcols).agg(
        F.sum(token_count_col).cast("long").alias("n_tokens")
    )
    caps = counts.withColumn(
        "cap", F.col("n_tokens") * F.lit(int(epoch_cap))
    )
    order = [F.col("cap").asc()] + [F.col(c).asc() for c in group_cols]
    w = Window.orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = caps.select(
        *group_cols,
        "n_tokens",
        "cap",
        F.row_number().over(w).alias("rn"),
        (F.sum("cap").over(wsum) - F.col("cap")).alias("pre"),
    )
    totals = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            f"sum(n_tokens) * {int(budget_num)} div {int(budget_den)}"
        ).alias("budget"),
    )
    flagged = ranked.crossJoin(F.broadcast(totals)).withColumn(
        "capped",
        (
            F.col("cap") * (F.col("n") - F.col("rn") + 1) + F.col("pre")
            <= F.col("budget")
        ).cast("int"),
    )
    kframe = flagged.agg(
        F.max(
            F.when(F.col("capped") == 1, F.col("rn")).otherwise(F.lit(0))
        ).alias("k"),
        F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("cap"))), F.lit(0)
        ).alias("capped_sum"),
    )
    alloc = (
        flagged.crossJoin(F.broadcast(kframe))
        .withColumn("rest", F.col("budget") - F.col("capped_sum"))
        .withColumn("m", F.greatest(F.col("n") - F.col("k"), F.lit(1)))
        .withColumn(
            "allocation",
            F.when(F.col("rn") <= F.col("k"), F.col("cap")).otherwise(
                F.expr("rest div m")
                + F.when(
                    F.col("rn") - F.col("k") <= F.expr("rest % m"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ),
        )
    )
    return alloc.select(
        *group_cols,
        "n_tokens",
        "cap",
        F.col("allocation").cast("long").alias("allocation"),
        F.expr("allocation * 1000000 div n_tokens").alias("epochs_ppm"),
    )


def curriculum_order(
    df: DataFrame,
    length_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    band_edges: tuple[int, int] = (150, 300),
) -> DataFrame:
    """Deterministic curriculum ordering with source interleave — the
    data-ordering step of curriculum learning (Bengio et al. 2009)
    applied the way large pretraining runs schedule corpora: documents
    are banded easy→hard (here short→long via fixed length thresholds,
    the classic length curriculum), and WITHIN each band sources are
    interleaved round-robin so no contiguous run of training batches
    comes from a single source (the shuffling guarantee data loaders
    need without a global random shuffle).

    The total order is (band, rr, source, id): rr is the per-
    (band, source) round-robin index — a window partitioned by
    band × source, never global, so the heaviest shuffle key is a
    band-source cell and the op scales with partition count. A
    consumer streams the order via ORDER BY on those columns (top-k
    reads are TakeOrdered — no global sort materializes at any scale);
    fixed band edges (not quantiles) keep the banding one scan.

    Returns (band, rr, source, id_col, length) — the sort-key columns
    plus identity, one row per document.
    """
    lo, hi = band_edges
    banded = df.select(
        F.when(F.col(length_col) < lo, 0)
        .when(F.col(length_col) < hi, 1)
        .otherwise(2)
        .alias("band"),
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.col(length_col).alias("length"),
    )
    w = Window.partitionBy("band", "source").orderBy(F.col(id_col).asc())
    return banded.withColumn("rr", F.row_number().over(w)).select(
        "band", "rr", "source", id_col, "length"
    )


def kcenter_coreset(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
) -> DataFrame:
    """Greedy k-center coreset selection (Sener & Savarese, ICLR 2018 —
    the active-learning/data-selection coreset): seed with the smallest
    id, then ``k`` farthest-first rounds — each picks the candidate
    whose MAXIMUM cosine to the already-chosen set is SMALLEST (the
    least-covered point), ties to the smallest id. The greedy is a
    2-approximation of the k-center cover, and the selected set is the
    classic diversity-maximizing subsample for labeling budgets /
    eval-set construction over an embedded corpus.

    Determinism: every per-pair cosine is the bit-deterministic
    zip_with/aggregate double fold, floored to integer micro BEFORE the
    coverage ``greatest`` (floor is monotone, so integer coverage ==
    floored double coverage); selection is a (cov_micro asc, id asc)
    TakeOrdered — no doubles survive a comparison.

    Plan shape at 100 TB (kmeans control-loop contract): each round is
    ONE corpus scan against the newest center as a broadcast 1-row
    literal (no join, no shuffle — the coverage update is a narrow
    projection); only the 1-row argmin crosses to the driver per
    round. Coverage lineage is re-folded from the persisted base per
    round (k small); a production k in the thousands would checkpoint
    coverage every few hundred rounds instead.

    Returns (sel_no INT, id, cov_micro BIGINT — NULL for the seed).
    """
    from drune_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )

    base = df.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("__v")
    ).persist()
    try:
        seed = base.orderBy(id_col).limit(1).collect()[0]
        chosen = [(0, seed[id_col], None)]
        center = seed["__v"]
        cands = base.filter(F.col(id_col) != seed[id_col]).withColumn(
            "__cov", F.lit(-(10 ** 6) - 1).cast("bigint")
        )
        prev = None
        for rnd in range(1, k + 1):
            # ONE py4j call — the per-element form (and F.lit(list),
            # which pyspark expands to the same loop) was 64
            # round-trips of driver time per round.
            from drune_spark.functions.vectors import lit_double_array
            lit_center = lit_double_array(center)
            # Persist each round's coverage: the per-round collect is
            # already an action, so the persist costs no extra barrier
            # and stops round j from re-folding rounds 1..j-1's
            # cosines through the lineage (O(k) scans total, not
            # O(k²)); the previous round's frame is evicted eagerly.
            cands = cands.withColumn(
                "__cov",
                F.greatest(
                    F.col("__cov"),
                    F.floor(
                        F.lit(1000000.0)
                        * cosine_similarity(F.col("__v"), lit_center)
                    ).cast("bigint"),
                ),
            ).persist()
            pick = (
                cands.orderBy(F.col("__cov").asc(), F.col(id_col).asc())
                .limit(1)
                .collect()[0]
            )
            if prev is not None:
                prev.unpersist()
            prev = cands
            chosen.append((rnd, pick[id_col], pick["__cov"]))
            center = pick["__v"]
            cands = cands.filter(F.col(id_col) != pick[id_col])
        if prev is not None:
            prev.unpersist()
        spark = df.sparkSession
        from drune_spark.functions.partitioning import local_frame
        out = local_frame(
            spark,
            [(int(s), int(v), c if c is None else int(c))
             for s, v, c in chosen],
            "sel_no int, vec_id long, cov_micro long",
        )
        if id_col != "vec_id":
            out = out.withColumnRenamed("vec_id", id_col)
        return out
    finally:
        base.unpersist()


# Temperature-based source sampling quotas (the mT5/multilingual
# recipe, Xue et al. 2021: p_i ∝ n_i^α with α = 1/2) with EXACT
# largest-remainder rounding so the quotas sum to the budget precisely.
# ONE ANSI text runs verbatim on Spark and DuckDB: sqrt is IEEE
# correctly-rounded (bit-identical across engines), floored to integer
# milli BEFORE the order-sensitive sum, shares are exact-integer
# products with one double division per source (inputs < 2^53, so the
# quotient is the same IEEE double everywhere), and the leftover goes
# to the largest remainders (rem DESC, source ASC — deterministic).
# UniMax (unimax_alloc) is the waterfilling alternative; temperature
# sampling is the fixed-exponent one. Everything after the first
# GROUP BY is source-cell-sized; the totals rows are bounded broadcast
# crosses (the chi2_drift margins pattern).
TEMPERATURE_MIX_SQL = """
    WITH s AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000)
                    AS BIGINT) AS s_milli
        FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(s_milli) AS BIGINT) AS s_tot FROM s),
    q AS (
        SELECT source, n_docs, s_milli,
               CAST(floor((1000.0 * s_milli) / s_tot) AS BIGINT)
                   AS q_base,
               1000 * s_milli
                   - CAST(floor((1000.0 * s_milli) / s_tot) AS BIGINT)
                     * s_tot AS rem
        FROM s CROSS JOIN t
    ),
    l AS (SELECT CAST(1000 - SUM(q_base) AS BIGINT) AS leftover FROM q),
    r AS (
        SELECT source, n_docs, s_milli, q_base, rem,
               row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
        FROM q
    )
    SELECT source, n_docs, s_milli,
           CAST(q_base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM r CROSS JOIN l
"""


def _sqrt_moment_milli():
    """floor(sqrt(n·Σx² − (Σx)²)) · 1000 over the (n_rows, sq, sm)
    moment columns — the shared stats.sqrt_moment_sql primitive,
    milli-scaled AFTER the integer floor (no milli-edge double
    products)."""
    from drune_spark.operators.stats import sqrt_moment_sql

    return F.expr(f"{sqrt_moment_sql('n_rows', 'sq', 'sm')} * 1000")


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    cents_col: str,
    budget: int = 1000,
) -> DataFrame:
    """Neyman (variance-optimal) stratified-sample allocation (Neyman
    1934): split a sampling ``budget`` across strata ∝ N_h·S_h — the
    minimum-variance design for a fixed budget, and the principled
    upgrade over proportional quotas when strata differ in spread
    (the temperature/UniMax family covers size-based quotas; this is
    the variance-based one).

    Exact-integer discipline: with population variance,
    N_h·S_h = sqrt(N_h·Σx² − (Σx)²), so the weight is ONE IEEE sqrt
    of an exactly-computed integer. The inner moment arithmetic runs
    in DECIMAL(38,0) (Σx² at 100 TB overflows int64; the DuckDB twin
    uses HUGEINT — both are exact integers, and the final
    integer→double cast is correctly rounded in both engines, so the
    sqrt inputs are bit-identical). The weight floors to milli before
    any ratio (the mann_kendall/temperature discipline), and the
    budget splits by exact largest-remainder rounding (rem DESC,
    stratum ASC — quotas sum to ``budget`` precisely; the
    TEMPERATURE_MIX_SQL machinery).

    One stratum-cell aggregate + window math on a |strata|-row frame:
    nothing after the GROUP BY scales with rows.

    Returns (stratum, n_rows, w_milli, alloc) ordered by stratum.
    """
    from pyspark.sql import Window

    x = F.col(cents_col).cast("long")
    s = (
        df.select(
            F.col(stratum_col).alias("stratum"),
            x.alias("x"),
            (x * x).alias("xx"),
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sm"),
            F.sum(F.col("xx").cast("decimal(38,0)")).alias("sq"),
        )
        .select(
            "stratum",
            "n_rows",
            _sqrt_moment_milli().alias("w_milli"),
        )
    )
    # floor(sqrt(m2)) * 1000: the sqrt of an exact integer, floored to
    # UNIT first (both engines agree bit-for-bit on integer floors of
    # IEEE sqrt), then scaled — avoids milli-edge double products.
    wall = Window.partitionBy()
    tot = F.sum("w_milli").over(wall)
    withq = s.select(
        "stratum",
        "n_rows",
        "w_milli",
        F.expr(
            f"CAST(floor(({budget}.0 * w_milli) / "
            f"(SUM(w_milli) OVER ())) AS BIGINT)"
        ).alias("q_base"),
        (F.lit(budget) * F.col("w_milli")).alias("bw"),
        tot.alias("w_tot"),
    ).withColumn("rem", F.col("bw") - F.col("q_base") * F.col("w_tot"))
    leftover = F.lit(budget) - F.sum("q_base").over(wall)
    rk = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("stratum").asc())
    )
    return (
        withq.withColumn("leftover", leftover)
        .withColumn("rk", rk)
        .select(
            "stratum",
            "n_rows",
            "w_milli",
            (
                F.col("q_base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
        .orderBy("stratum")
    )


def rejection_match(
    df: DataFrame,
    group_col: str,
    strata_col: str,
    id_col: str,
    salt: str = "rm1",
) -> DataFrame:
    """Distribution matching by deterministic rejection sampling: thin
    each group (e.g. source) so its strata distribution (e.g. length
    bands) matches the corpus-wide target — the rebalancing step before
    mixing heterogeneous sources into one training corpus (a FineWeb-
    style "match the reference length/quality profile" pass).

    Accept probability per (group g, stratum b) =
    ``min(1, (t_b/t_total) / (a_gb/a_g))`` — strata a group
    over-represents are thinned to the target share, under-represented
    strata keep everything (rejection can only remove). The draw is
    deterministic: accept iff ``md5_u32(salt || id) % 10⁶ < p_ppm``,
    with p_ppm computed in DECIMAL(38,0) (counts at 100 TB are ~10¹²;
    the t_b·a_g·10⁶ product would overflow BIGINT).

    Cost: two group-cell aggregates + one stratum aggregate + one 1-row
    total, all broadcast back onto the row stream (the percent_of_total
    totals pattern) — rows never shuffle.

    Returns per-row (id, group, stratum, p_ppm, accepted 0/1).
    """
    from drune_spark.functions.hashes import md5_u32

    base = df.select(id_col, group_col, strata_col)
    a_cell = base.groupBy(group_col, strata_col).agg(
        F.count(F.lit(1)).alias("a_gb")
    )
    a_tot = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("a_g")
    )
    t_cell = base.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("t_b")
    )
    t_tot = base.agg(F.count(F.lit(1)).alias("t_total"))
    p_ppm = F.expr(
        "least(CAST(1000000 AS BIGINT), CAST("
        "(CAST(t_b AS DECIMAL(38,0)) * CAST(a_g AS DECIMAL(38,0))"
        " * 1000000) DIV "
        "(CAST(t_total AS DECIMAL(38,0)) * CAST(a_gb AS DECIMAL(38,0)))"
        " AS BIGINT))"
    )
    draw = md5_u32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        base
        .join(F.broadcast(a_cell), [group_col, strata_col])
        .join(F.broadcast(a_tot), [group_col])
        .join(F.broadcast(t_cell), [strata_col])
        .crossJoin(F.broadcast(t_tot))
        .select(
            id_col,
            group_col,
            strata_col,
            p_ppm.alias("p_ppm"),
            (draw % 1_000_000 < p_ppm).cast("int").alias("accepted"),
        )
    )


def walkforward_folds(
    df: DataFrame,
    ts_us_col: str,
    n_folds: int = 3,
    test_us: int = 5 * 86_400_000_000,
    embargo_us: int = 12 * 3_600_000_000,
) -> DataFrame:
    """Purged walk-forward cross-validation audit for time-ordered
    data (the split discipline financial/forecasting ML uses instead
    of hash splits, which leak future information backwards): fold f's
    cut sits at ``min + f·(span div (n_folds+1))``; rows strictly
    before ``cut − embargo`` train, rows inside the embargo window are
    PURGED (near-boundary rows whose labels/windows straddle the cut —
    the leakage hash splits can't see), the next ``test_us`` test, and
    the rest are future. Everything is integer-µs arithmetic off one
    broadcast (min, max) row — ONE scan fans out to all folds via a
    broadcast fold frame.

    Returns (fold, cut_us, n_train, n_purged, n_test, n_future).
    """
    spark = df.sparkSession
    b = df.agg(
        F.min(ts_us_col).alias("mn"), F.max(ts_us_col).alias("mx")
    )
    folds = spark.range(1, n_folds + 1).select(
        F.col("id").cast("int").alias("fold")
    )
    cut = (F.col("mn")
           + F.col("fold") * F.expr(f"(mx - mn) div {n_folds + 1}"))
    tagged = (
        df.select(F.col(ts_us_col).alias("t"))
        .crossJoin(F.broadcast(folds))
        .crossJoin(F.broadcast(b))
        .select(
            "fold",
            cut.alias("cut_us"),
            F.when(F.col("t") < cut - F.lit(int(embargo_us)), "train")
            .when(F.col("t") < cut, "purged")
            .when(F.col("t") < cut + F.lit(int(test_us)), "test")
            .otherwise("future").alias("part"),
        )
    )
    return tagged.groupBy("fold", "cut_us").agg(
        F.count_if(F.col("part") == "train").alias("n_train"),
        F.count_if(F.col("part") == "purged").alias("n_purged"),
        F.count_if(F.col("part") == "test").alias("n_test"),
        F.count_if(F.col("part") == "future").alias("n_future"),
    )


def doremi_reweight(
    docs: DataFrame,
    rounds: int = 3,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_bits: int = 16,
    eta_denom: int = 4096,
    scale: int = 1_000_000,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023,
    arXiv:2305.10429) in exact integer arithmetic: per round, hash-
    sample each domain at a rate proportional to its current weight,
    measure the sampled domains' mean loss, and grow every domain's
    weight multiplicatively by its EXCESS loss over the best domain —
    the multiplicative-weights play that upweights hard domains so the
    next mix spends tokens where the model is worst.

    Loss proxy = the corpus-trained unigram floor-log2 surprisal of
    text_analysis.unigram_surprisal (integer milli-bits/token, no
    libm), computed ONCE and persisted; each round then reads only the
    doc-sized (id, source, loss) frame — the iterative persist rule.

    Integer contract (the perceptron/HITS driver-loop family): weights
    are ppm BIGINTs; the round-t sample keeps a doc iff
    ``md5_u32('t:' || id) % 2^rate_bits < w_d * 2^rate_bits div
    max(w)`` (the heaviest domain keeps everything); the update is
    ``w ← w·(eta_denom + excess_millibits) div eta_denom`` followed by
    a Σ=scale renormalization by shifted div. Per round: one
    doc-frame aggregate + a ≤|domains|-row control fetch (weights ride
    back as Python ints) — data rows never reach the driver. Domains
    absent from a round's sample carry excess 0. An unrolled-CTE
    DuckDB oracle replays every round digit-for-digit.

    Returns the full trajectory: one row per (round, source) with
    n_sampled, mean_loss (milli-bits/token, -1 when unsampled) and
    weight_ppm AFTER that round's update+renorm. Domains whose docs
    are ALL empty/whitespace have no surprisal rows and are absent
    from the output entirely (the renormalization spans token-bearing
    domains only).

    No counterpart in /root/reference (2.8k-LoC native engine, no mix
    optimizer); driver-mandated training-data extension.
    """
    from drune_spark.functions.hashes import md5_u32
    from drune_spark.operators.text_analysis import doc_surprisal

    spark = docs.sparkSession
    per_doc = doc_surprisal(docs, text_col=text_col, id_col=id_col).select(
        id_col, F.col("mean_millibits").alias("loss")
    )
    # Inner join: domains whose docs are ALL empty/whitespace have no
    # surprisal rows and therefore no weight row in the output — the
    # renormalization spans token-bearing domains only.
    scored = (
        docs.select(id_col, F.col(source_col).alias("src"))
        .join(per_doc, id_col)
        .persist()
    )
    sources = [
        r["src"]
        for r in scored.select("src").distinct().orderBy("src").collect()
    ]  # bounded control fetch: one row per domain
    n_dom = len(sources)
    if n_dom == 0:
        scored.unpersist()
        return spark.createDataFrame(
            [],
            "round int, source string, n_sampled bigint, "
            "mean_loss bigint, weight_ppm bigint",
        )
    w = {s: scale // n_dom for s in sources}
    rate_mod = 1 << rate_bits
    out_rows = []
    for t in range(1, rounds + 1):
        max_w = max(w.values())
        rate = F.coalesce(
            *(
                [
                    F.when(
                        F.col("src") == F.lit(s),
                        F.lit(int(w[s] * rate_mod // max_w)),
                    )
                    for s in sources
                ]
                + [F.lit(0)]
            )
        )
        kept = scored.filter(
            md5_u32(
                F.concat(F.lit(f"{t}:"), F.col(id_col).cast("string"))
            )
            % rate_mod
            < rate
        )
        stats = {
            r["src"]: (int(r["n"]), int(r["sl"]))
            for r in kept.groupBy("src")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("loss").cast("long").alias("sl"),
            )
            .collect()  # ≤ n_dom-row control fetch
        }
        mean_loss = {
            s: (stats[s][1] // stats[s][0]) if s in stats else None
            for s in sources
        }
        sampled = [v for v in mean_loss.values() if v is not None]
        mn = min(sampled) if sampled else 0
        w = {
            s: w[s]
            * (eta_denom + ((mean_loss[s] - mn) if mean_loss[s] is not None else 0))
            // eta_denom
            for s in sources
        }
        tot = sum(w.values())
        w = {s: w[s] * scale // tot for s in sources}
        for s in sources:
            out_rows.append(
                (
                    t,
                    s,
                    stats[s][0] if s in stats else 0,
                    mean_loss[s] if mean_loss[s] is not None else -1,
                    w[s],
                )
            )
    scored.unpersist()
    from drune_spark.functions.partitioning import local_frame
    return local_frame(
        spark,
        out_rows,
        "round int, source string, n_sampled bigint, "
        "mean_loss bigint, weight_ppm bigint",
    )


def shuffle_quality_audit(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_shards: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """Training-order shuffle audit: given the hash-shuffled, sharded
    reading order a dataloader would consume (shard = hash(id) mod
    n_shards, order within shard by an independent position hash),
    measure per shard how well domains are interleaved — the
    Wald-Wolfowitz runs diagnostic. A badly shuffled shard feeds the
    trainer long single-domain runs (gradient correlation); this is
    the audit that catches it BEFORE a training run does.

    Per shard (all integer): n_docs, adjacent same-domain pairs
    (lag-1), observed runs = n − adj_same, the permutation-null
    same-pair probability ``p_same_ppm = Σ n_d(n_d−1)·scale div
    (n(n−1))`` and the null-expected runs scaled by ``scale``:
    ``expected_runs_e6 = scale + (n−1)·(scale − p_same_ppm)``.
    Observed ≈ expected/scale ⇒ the order is indistinguishable from a
    uniform random permutation; observed ≪ expected ⇒ clumping.

    Plan shape at 100 TB: ONE window pass partitioned BY SHARD (never
    a global sort — each shard's order is independent, exactly like
    the real dataloader), one (shard, domain) aggregate, one
    shard-sized join. Zero-denominator shards (n=1) are guarded with
    greatest(·,1) on both engines.

    No counterpart in /root/reference; driver-mandated training-data
    extension (dataset ordering QA).
    """
    from drune_spark.functions.hashes import md5_u32

    base = df.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("g")
    ).select(
        "id",
        "g",
        (
            md5_u32(F.concat(F.lit("sh:"), F.col("id").cast("string")))
            % F.lit(int(n_shards))
        ).alias("shard"),
        F.md5(F.concat(F.lit("po:"), F.col("id").cast("string"))).alias(
            "pos"
        ),
    )
    wnd = Window.partitionBy("shard").orderBy("pos", "id")
    adj = base.select(
        "shard", "g", F.lead("g").over(wnd).alias("nxt")
    )
    per_shard = adj.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("nxt") == F.col("g")).alias("adj_same"),
    )
    comp = (
        base.groupBy("shard", "g")
        .agg(F.count(F.lit(1)).alias("n_d"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.expr("n_d * (n_d - 1)")).cast("long").alias("s_same"),
        )
    )
    return (
        per_shard.join(comp, "shard")
        .select(
            "shard",
            "n_docs",
            "n_groups",
            "adj_same",
            F.expr("n_docs - adj_same").alias("observed_runs"),
            # DECIMAL(38,0) intermediate: s_same <= n_docs^2 per
            # shard, so a BIGINT product s_same*scale overflows past
            # ~3M docs/shard (ANSI raises). DECIMAL matches DuckDB's
            # HUGEINT widening; `div` still returns BIGINT.
            F.expr(
                f"CAST(s_same AS DECIMAL(38,0)) * {int(scale)} div "
                "greatest(n_docs * (n_docs - 1), 1)"
            ).alias("p_same_ppm"),
        )
        .select(
            "*",
            F.expr(
                f"{int(scale)} + (n_docs - 1) * ({int(scale)} - p_same_ppm)"
            ).alias("expected_runs_e6"),
        )
    )


def recency_weights(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    base: int = 64,
    buckets: int = 6,
) -> DataFrame:
    """Time-decay sampling weights — the freshness bias of a
    continual-pretraining corpus refresh: the draw weight HALVES per
    age bucket (``weight = max(base >> bucket, 1)``, bucket = age div
    (span div buckets), capped at ``buckets``), so feeding the output
    to ``weighted_sample`` yields a deterministic recency-weighted
    draw with an exact, engine-portable decay curve (integer shifts —
    no exp(), no libm rounding to disagree on).

    Span endpoints come from ONE broadcast 1-row aggregate (the totals
    pattern — no collect); NULL timestamps are dropped. Returns
    (id_col, age_bucket, weight).
    """
    if base < 1 or buckets < 1:
        raise ValueError("recency_weights needs base >= 1, buckets >= 1")
    if buckets > 30:
        # Spark shiftright wraps the shift mod the operand width
        # SILENTLY where DuckDB >> just underflows to 0 — any
        # bit-shift operator must guard its own bound (the bq_rerank
        # dim<=64 precedent). Past base=2^30 the curve is flat at 1
        # anyway.
        raise ValueError("recency_weights needs buckets <= 30")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # NULL ids would fold to a NULL lottery ticket downstream, and
    # rank/order NULLS FIRST-vs-LAST diverges across engines — drop
    # them with the NULL timestamps.
    e = df.filter(
        F.col(ts_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(id_col), us.alias("__us"))
    bounds = e.agg(
        F.min("__us").alias("__mn"), F.max("__us").alias("__mx")
    )
    return (
        e.crossJoin(F.broadcast(bounds))
        .select(
            id_col,
            F.expr(
                f"least((__mx - __us) div "
                f"greatest((__mx - __mn) div {int(buckets)}, 1), "
                f"{int(buckets)})"
            ).cast("long").alias("age_bucket"),
        )
        .withColumn(
            "weight",
            F.expr(
                f"greatest(shiftright({int(base)}, "
                f"cast(age_bucket as int)), 1)"
            ).cast("long"),
        )
    )


def successive_halving(
    df: DataFrame,
    reward_col: str,
    arm_col: str,
    id_col: str,
    base_budget: int = 2,
    n_rounds: int = 3,
) -> DataFrame:
    """Successive-halving source selection (Karnin et al. 2013; the
    fixed-budget bandit behind Hyperband): every round doubles the
    per-arm evaluation budget and keeps the better half — how a data
    team picks which sources deserve deeper quality evaluation without
    paying full-corpus evaluation for every candidate. Unlike DoReMi's
    gradient-style reweighting this is pure order statistics: fully
    DECLARATIVE (no driver loop, no collect — the rounds unroll into
    one lazy plan of window ranks over arm-count-sized frames).

    Deterministic integer semantics: arm evaluations are its docs in
    ``id_col`` order (rank j); round r (1-based) adds the next
    ``base_budget·2^(r−1)`` evaluations per surviving arm (cumulative
    ``cum_r``); an arm's score is mean reward over its first
    ``min(cum_r, available)`` evals in integer ppm (sum·10⁶ div n);
    survivors = rank ≤ ⌈alive/2⌉ by (mean desc, arm asc). Arms with
    fewer docs than the budget are scored on what they have (never
    dropped for scarcity alone).

    Returns one row per (round, arm alive at round start):
    ``(round, arm_col, n_evals, mean_reward_micro, survived)`` —
    mean_reward_micro = mean reward × 10⁶ (micro-units of whatever
    the caller's reward is — NOT rescaled to a 0..10⁶ ppm range);
    20 arms → 20+10+5 rows at the defaults.
    """
    from pyspark.sql import Window

    if base_budget < 1 or n_rounds < 1:
        raise ValueError(
            "successive_halving needs base_budget >= 1, n_rounds >= 1"
        )
    if n_rounds > 6:
        # each round doubles the alive-chain references into the plan;
        # past ~6 unrolled rounds the lazy-plan growth needs the
        # localCheckpoint treatment (r5 CC lesson) — guard instead of
        # silently degrading
        raise ValueError("successive_halving needs n_rounds <= 6")
    rewards = df.select(
        F.col(arm_col).alias("arm"),
        F.col(reward_col).cast("long").alias("rw"),
        F.row_number().over(
            Window.partitionBy(arm_col).orderBy(F.col(id_col))
        ).alias("j"),
    ).persist()
    # EAGER materialization: every round's scored frame AND the alive
    # chain read this — 6+ branches of one job race a lazy cache and
    # each recomputes (CLAUDE.md r5-s3 lesson 2)
    rewards.count()
    alive = rewards.select("arm").distinct()
    out_frames = []
    cum = 0
    for r in range(1, n_rounds + 1):
        cum += base_budget * (1 << (r - 1))
        scored = (
            rewards.filter(F.col("j") <= cum)
            .join(alive, "arm")
            .groupBy("arm")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_evals"),
                F.sum("rw").cast("long").alias("__s"),
            )
            .select(
                "arm",
                "n_evals",
                F.expr("__s * 1000000 div n_evals").alias(
                    "mean_reward_micro"
                ),
            )
        )
        wr = Window.orderBy(
            F.col("mean_reward_micro").desc(), F.col("arm").asc()
        )
        ranked = scored.select(
            "arm",
            "n_evals",
            "mean_reward_micro",
            F.row_number().over(wr).alias("__rk"),
            F.count(F.lit(1)).over(
                Window.partitionBy(F.lit(1))
            ).alias("__alive"),
        )
        marked = ranked.select(
            F.lit(r).cast("int").alias("round"),
            F.col("arm"),
            "n_evals",
            "mean_reward_micro",
            F.expr("cast(__rk <= (__alive + 1) div 2 as int)")
            .alias("survived"),
        )
        out_frames.append(marked)
        alive = marked.filter(F.col("survived") == 1).select("arm")
    out = out_frames[0]
    for f in out_frames[1:]:
        out = out.unionByName(f)
    return out.select(
        "round", F.col("arm").alias(arm_col), "n_evals",
        "mean_reward_micro", "survived",
    )
