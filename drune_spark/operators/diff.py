"""Table reconciliation — diff two table versions into added / removed /
changed keys (the validation primitive for migrations, backfills, CDC
mirrors, and engine swaps: "prove the new table equals the old one,
and if not, show exactly where").

Spark-first shape: each side reduces to (key, fingerprint) BEFORE the
join — md5 over the null-tagged canonical string of the compare columns
— so the full-outer join shuffles two slim columns per side, never the
payload rows. Wide tables diff at the cost of a scan plus a (key, 32B)
shuffle; at 100 TB that is the difference between feasible and not.
Equal rows are dropped in the join output filter (the common case
produces no rows at all downstream of the join).

No counterpart in /root/reference (its golden-test mode
(core/pipeline.py:371) asserts frame equality but reports only
pass/fail, not per-key drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(cols: list[str]):
    """Order-fixed, null-tagged md5 over the compare columns. The null
    tag keeps (NULL, 'x') distinct from ('x', NULL); the unit separator
    keeps ('a','b') distinct from ('ab','')."""
    tagged = [
        F.when(F.col(c).isNull(), F.lit("\x00null"))
        .otherwise(F.col(c).cast("string"))
        for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *tagged))


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key drift between ``left`` (old) and ``right`` (new):
    (key_cols..., change_type) with change_type ∈ added (key only in
    right), removed (only in left), changed (both, differing compare
    fingerprint). Identical keys produce no output row. Keys must be
    unique per side (dedupe or pre-aggregate first — this is a keyed
    reconciliation, not a multiset diff)."""
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in key_cols]
    lf = left.select(
        *key_cols, _fingerprint(compare_cols).alias("__lfp")
    )
    rf = right.select(
        *key_cols, _fingerprint(compare_cols).alias("__rfp")
    )
    joined = lf.join(rf, on=key_cols, how="full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("__lfp").isNull(), F.lit("added"))
            .when(F.col("__rfp").isNull(), F.lit("removed"))
            .when(F.col("__lfp") != F.col("__rfp"), F.lit("changed")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )
