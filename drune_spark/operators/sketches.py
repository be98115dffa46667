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
