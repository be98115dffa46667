"""Referential-integrity audit across foreign-key relations.

Extends the single-table constraint surface (quality/rules.py — drune's
not_null/unique/isin checks, reference
src/drune/core/quality/rules.py) to CROSS-table contracts: for each
declared child.fk -> parent.pk relation, count child rows and orphans
(fk values with no parent). One LEFT JOIN + conditional count per
relation; parents are dimension-sized and broadcast, so each audit is
a single scan of the child with a map-side count — no shuffle of fact
rows. The result is one row per relation, so the union is cells, not
data (each branch aggregates its own source — not the shared-agg
union-replan trap, which only bites when branches re-select one
aggregate row).

NULL fk values are not orphans (SQL FK semantics: NULL opts out of the
constraint); they are reported separately as n_null_fk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """``relations``: (name, child_df, fk_col, parent_df, pk_col) per
    relation. Returns (relation, n_rows, n_null_fk, n_orphans)."""
    outs = []
    for name, child, fk, parent, pk in relations:
        keys = parent.select(F.col(pk).alias("__pk")).distinct()
        joined = child.select(F.col(fk).alias("__fk")).join(
            F.broadcast(keys),
            F.col("__fk") == F.col("__pk"),
            "left",
        )
        outs.append(
            joined.agg(
                F.lit(name).alias("relation"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count_if(F.col("__fk").isNull()).alias("n_null_fk"),
                F.count_if(
                    F.col("__fk").isNotNull() & F.col("__pk").isNull()
                ).alias("n_orphans"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result.select("relation", "n_rows", "n_null_fk", "n_orphans")
