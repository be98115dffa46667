"""Mergeable distinct-count sketches (HyperLogLog) as DataFrame state.

``approx_count_distinct`` gives a one-shot estimate but not a *stored,
mergeable* sketch. A 100 TB pipeline wants per-slice register tables
(e.g. per event-type per day) persisted once and re-aggregated into any
coarser grouping later — the Druid / ClickHouse / Theta-sketch pattern:
merging takes a max over 2^p small integers per group instead of
rescanning raw data.

Formulation (Flajolet, Fusy, Gandouet, Meunier 2007): with p index bits
and m = 2^p registers, register j keeps max(rho) over the values hashing
to j, where rho = (leading-zero count of the remaining w hash bits) + 1.
Raw estimate = alpha_m * m^2 / sum_j 2^(-M_j).

Engine-portable determinism (the oracle gate hash-compares doubles):

- the value hash is md5-based (``functions/hashes.py::md5_u32``) — same
  integer in any engine with md5;
- rho uses integer bit-length (``length(bin(x))``), never ``log``;
- the harmonic denominator is accumulated as the EXACT integer
  ``sum_j 2^(w+1-M_j)`` (absent registers contribute 2^(w+1)), so the
  only floating-point operation is one final division by a driver-side
  constant. Identical double in Spark and DuckDB.

Reference parity: the reference engine has no sketch support (its
distinct counts are exact scans); this module exists for the LLM-data /
hypertable mandate where re-aggregatable cardinality state is standard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drune_spark.functions.hashes import md5_u32

DEFAULT_P = 9  # m = 512 registers → ~1.04/sqrt(512) ≈ 4.6% rel. std. err.


def hll_alpha(p: int) -> float:
    """Bias-correction constant for m = 2^p registers (HLL paper §4)."""
    m = 1 << p
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p: int = DEFAULT_P,
) -> DataFrame:
    """Build per-group HLL register frames: (group_cols..., idx, rho).

    This IS the sketch — at most m rows per group, each a (small int,
    small int) pair. One groupBy shuffle carrying (group, idx, rho)
    triples; the raw values never shuffle. Persist the result per
    partition/slice and never rescan the slice again.
    """
    w = 32 - p
    h = md5_u32(F.col(value_col).cast("string"))
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rest))
    )
    return (
        df.select(
            *group_cols,
            F.shiftrightunsigned(h, w).alias("idx"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches into a coarser grouping: max per register index.

    Lossless (max is associative/commutative/idempotent): merging daily
    sketches equals sketching the union of the days. The shuffle carries
    at most m rows per input group.
    """
    return registers.groupBy(*group_cols, "idx").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = DEFAULT_P,
) -> DataFrame:
    """Raw HLL estimate per group from a register frame.

    Exact-integer numerator: a register with value rho contributes
    2^(w+1-rho) and each of the (m - n) absent registers contributes
    2^(w+1); all fit comfortably in BIGINT (m * 2^(w+1) < 2^34 for
    p=9). estimate = alpha*m^2*2^(w+1) / numerator — the numerator is
    exact, the scale is one driver-side double constant, so the single
    division is bit-identical across engines.

    Emits the raw (uncorrected) estimate plus ``zero_registers`` so
    callers can apply the linear-counting small-range correction
    (m * ln(m/zeros)) where they tolerate engine-specific ``ln``.
    """
    m = 1 << p
    w = 32 - p
    scale = hll_alpha(p) * m * m * float(1 << (w + 1))
    # shiftleft with a column-valued amount needs the SQL form (the
    # PySpark wrapper only takes a literal int shift).
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1L, {w + 1} - rho)")).alias("present_sum"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    numerator = (
        F.col("present_sum")
        + (F.lit(m) - F.col("n_regs")) * F.lit(1 << (w + 1))
    )
    return agg.select(
        *group_cols,
        (F.lit(m) - F.col("n_regs")).cast("long").alias("zero_registers"),
        (F.lit(scale) / numerator.cast("double")).alias("hll_estimate"),
    )


def hll_count_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p: int = DEFAULT_P,
) -> DataFrame:
    """Convenience one-shot: sketch + estimate in a single plan."""
    return hll_estimate(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / "theta") sketches — SET OPERATIONS on sketches.
#
# HLL answers "how many distinct"; it cannot intersect. The KMV sketch
# (Beyer, Haas, Reinwald, Sismanis, Gemulla, SIGMOD 2007; the basis of
# Apache DataSketches' theta sketch) keeps the k smallest distinct hash
# values of a set. It is mergeable (k smallest of a union of per-slice
# k-smallest = global k smallest) and supports union / intersection /
# difference / Jaccard estimates — the Druid "audience overlap" pattern.
#
# Determinism for the oracle gate: hashes are md5_u32 (portable), ties
# are impossible (hashes are distinct within a group), estimates are a
# single division of exact BIGINTs (numerator ≤ 2^49, denominator ≤
# 2^41 — both exact as doubles), so estimates are bit-identical across
# engines. Exact-small regime: a sketch with < k rows IS the complete
# hash set, so estimates degrade to exact counts (both engines apply
# the same CASE).

KMV_DEFAULT_K = 256  # rel. std. err. ≈ 1/sqrt(k-2) ≈ 6.3%
_KMV_RANGE = 1 << 32  # md5_u32 values are uniform on [0, 2^32)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = KMV_DEFAULT_K,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct md5_u32 hashes of
    ``value_col`` as rows (group_cols..., h).

    One partial-aggregated distinct on (group, h) — raw values never
    shuffle, only 4-byte hashes — then a per-group k-smallest via a
    row_number window, which Spark's WindowGroupLimit rewrites into a
    Partial limit BELOW the exchange: each map task forwards at most k
    hashes per group, so the shuffle is sketch-sized, not data-sized
    (same plan property pinned for ANN top-k in tests/test_plans.py).
    """
    from pyspark.sql.window import Window

    hashed = (
        df.select(
            *group_cols,
            md5_u32(F.col(value_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = KMV_DEFAULT_K,
) -> DataFrame:
    """Merge sketches into a coarser grouping (e.g. per-day → per-type):
    distinct hashes, re-truncated to the k smallest per output group.
    Lossless: the global k smallest all survive their slice's local
    top-k, so merge(per-slice sketches) ≡ sketch(union of slices)."""
    from pyspark.sql.window import Window

    deduped = sketches.select(*group_cols, "h").distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        deduped.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _kmv_est(n_col, kth_col, k: int):
    """Distinct estimate from (sketch size, k-th smallest hash): exact n
    below k, else (k-1)*2^32/h_k — one division of exact integers."""
    c = float((k - 1) * _KMV_RANGE)
    return F.when(n_col < k, n_col.cast("double")).otherwise(
        F.lit(c) / kth_col.cast("double")
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    k: int = KMV_DEFAULT_K,
) -> DataFrame:
    """Per-group distinct-count estimate from a sketch frame."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("kth"),
    )
    return agg.select(
        *group_cols,
        F.col("n_sketch").cast("long").alias("n_sketch"),
        _kmv_est(F.col("n_sketch"), F.col("kth"), k).alias("kmv_estimate"),
    )


def kmv_set_ops(
    sketch: DataFrame,
    label_col: str,
    k: int = KMV_DEFAULT_K,
) -> DataFrame:
    """All pairwise set-operation estimates between the labelled sets of
    a sketch frame (rows: label, h; ≤ k per label).

    For each label pair (a < b): take the k smallest hashes of the union
    of the two sketches (theta = the k-th); every such hash's membership
    in A and B is decided correctly by its presence in the respective
    sketch, because theta_union ≤ min(theta_a, theta_b). Estimates
    (Beyer et al. 2007):

        |A∪B| ≈ (k-1)·2^32 / theta       |A∩B| ≈ (K∩/k)·|A∪B|
        J(A,B) = K∩ / k_union            |A\\B| ≈ (K_a_only/k)·|A∪B|

    spelled as single divisions of exact integers. When the union
    sketch holds < k hashes both input sets were captured completely
    and every output is exact. Everything after the sketches is
    sketch-sized: the pairs frame is |labels|², each sketch row fans
    out to ≤ |labels|-1 pairs — broadcast joins, no data-sized shuffle.
    """
    from pyspark.sql.window import Window

    labels = sketch.select(F.col(label_col).alias("__l")).distinct()
    pairs = (
        labels.alias("la")
        .join(labels.alias("lb"), F.col("la.__l") < F.col("lb.__l"))
        .select(
            F.col("la.__l").alias("label_a"), F.col("lb.__l").alias("label_b")
        )
    )
    # Per-label sketch stats for the standalone estimates of A and B.
    per_label = sketch.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n_l"), F.max("h").alias("kth_l")
    ).select(
        F.col(label_col).alias("__l"),
        _kmv_est(F.col("n_l"), F.col("kth_l"), k).alias("est_l"),
    )

    # Fan each sketch row out to the pairs its label participates in,
    # collapse duplicate hashes per pair while tagging membership.
    tagged = (
        sketch.join(
            F.broadcast(pairs),
            (F.col(label_col) == F.col("label_a"))
            | (F.col(label_col) == F.col("label_b")),
        )
        .groupBy("label_a", "label_b", "h")
        .agg(
            F.max(F.col(label_col) == F.col("label_a")).alias("in_a"),
            F.max(F.col(label_col) == F.col("label_b")).alias("in_b"),
        )
    )
    w = Window.partitionBy("label_a", "label_b").orderBy("h")
    union_k = tagged.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = union_k.groupBy("label_a", "label_b").agg(
        F.count(F.lit(1)).alias("k_union"),
        F.max("h").alias("theta"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("k_inter"),
        F.sum((F.col("in_a") & ~F.col("in_b")).cast("long")).alias("k_a_only"),
    )
    c = (k - 1) * _KMV_RANGE
    exact = F.col("k_union") < k

    def _op(count_col):
        # (count/k) · (k-1)·2^32/theta == exact-integer numerator over
        # exact-integer denominator: one portable division.
        return F.when(exact, count_col.cast("double")).otherwise(
            (count_col * F.lit(c)).cast("double")
            / (F.lit(k) * F.col("theta")).cast("double")
        )

    out = agg.select(
        "label_a",
        "label_b",
        F.col("k_union").cast("long").alias("k_union"),
        F.col("k_inter").cast("long").alias("k_inter"),
        _kmv_est(F.col("k_union"), F.col("theta"), k).alias("est_union"),
        _op(F.col("k_inter")).alias("est_intersection"),
        _op(F.col("k_a_only")).alias("est_difference_a"),
        (
            F.col("k_inter").cast("double") / F.col("k_union").cast("double")
        ).alias("jaccard"),
    )
    return (
        out.join(
            F.broadcast(per_label).withColumnRenamed("est_l", "est_a"),
            out.label_a == F.col("__l"),
        )
        .drop("__l")
        .join(
            F.broadcast(per_label).withColumnRenamed("est_l", "est_b"),
            F.col("label_b") == F.col("__l"),
        )
        .drop("__l")
    )


def hll_sliding_estimate(
    df: DataFrame,
    value_col: str,
    group_col: str,
    day_col: str,
    window_days: int = 7,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Sliding-window distinct counts from MERGED daily sketches — the
    "7-day active users per day" query answered without ever rescanning
    7 days of raw data.

    The mergeability that justifies sketches operationally: daily
    register frames are built ONCE (at ingest); every window-end day's
    sketch is the max-merge of the trailing ``window_days`` daily
    frames. A naive windowed COUNT(DISTINCT) recomputes each day over
    W days of raw rows (W× scan amplification); here raw rows are
    touched once ever, and the windowed merge moves only register
    triples — each daily register row fans out to the ≤W window ends
    it serves (explode(sequence), narrow), then one (group, end_day,
    idx) max-agg. Window ends are restricted to observed (group, day)
    pairs by an equi-join with the distinct-day set (no range join,
    no nested loop).

    Returns (group, end_day, zero_registers, hll_estimate) — same
    integer-exact-numerator estimate discipline as ``hll_estimate``.
    """
    daily = hll_registers(df, value_col, [group_col, day_col], p)
    fan = daily.select(
        group_col,
        "idx",
        "rho",
        F.explode(
            F.expr(f"sequence({day_col}, {day_col} + {window_days - 1})")
        ).alias("end_day"),
    )
    ends = (
        df.select(group_col, F.col(day_col).alias("end_day")).distinct()
    )
    merged = (
        fan.join(ends, [group_col, "end_day"])
        .groupBy(group_col, "end_day", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_estimate(merged, [group_col, "end_day"], p)


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) of the
    frequency distribution of ``value_col`` — the third leg of the
    sketch family here: HLL answers distinct counts, KMV answers set
    overlaps, CMS answers "how often does key X occur" in d×w integer
    cells instead of a full frequency table.

    Each row increments one cell per hash row j (bucket =
    md5_u32(j:value) mod width — the portable hash discipline of
    ``minhash``/``hll``). The sketch is (j, bucket, n) triples: at most
    d·w rows forever, mergeable by cell-wise SUM across any slicing
    (days, partitions, clusters) — integer-exact, so per-slice sketches
    roll up bit-identically at any parallelism.

    One groupBy shuffle carrying d rows per input row; at 100 TB build
    per-slice sketches map-side (the d×w cell grid fits any executor)
    and merge the tiny frames.
    """
    from drune_spark.functions.hashes import md5_u32

    j = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("j")
    cells = df.select(
        F.col(value_col).cast("string").alias("__v")
    ).select(
        "__v", j
    ).select(
        "j",
        F.pmod(
            md5_u32(F.concat_ws(":", F.col("j"), F.col("__v"))),
            F.lit(width),
        ).alias("bucket"),
    )
    return cells.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from a count-min sketch:
    est(k) = min over hash rows j of cell(j, h_j(k)) — an upper bound
    on the true count (collisions only ever inflate). The sketch is
    broadcast (d·w cells); keys never shuffle.

    Returns (key, cms_count).
    """
    from drune_spark.functions.hashes import md5_u32

    j = F.explode(
        F.array(*[F.lit(i) for i in range(depth)])
    ).alias("j")
    probes = keys.select(
        F.col(key_col), F.col(key_col).cast("string").alias("__v")
    ).select(
        key_col, "__v", j
    ).select(
        key_col,
        "j",
        F.pmod(
            md5_u32(F.concat_ws(":", F.col("j"), F.col("__v"))),
            F.lit(width),
        ).alias("bucket"),
    )
    joined = probes.join(F.broadcast(cms), ["j", "bucket"], "left").select(
        key_col, F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    return joined.groupBy(key_col).agg(
        F.min("n").alias("cms_count")
    )
