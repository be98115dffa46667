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

from pyspark.sql import DataFrame
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
