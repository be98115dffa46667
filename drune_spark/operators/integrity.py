"""Referential-integrity audit across foreign-key relations.

Extends the single-table constraint surface (quality/rules.py — drune's
not_null/unique/isin checks, reference
src/drune/core/quality/rules.py) to CROSS-table contracts: for each
declared child.fk -> parent.pk relation, count child rows and orphans
(fk values with no parent). Parents are dimension-sized and broadcast.

Relations sharing the SAME child DataFrame object are audited in ONE
scan: all their parent key sets broadcast-join onto one pass over the
child, a single aggregate row collects every relation's counts, and an
explode(array(struct(...))) fans that row out to one row per relation
— the profile.py pattern that dodges the union-of-selects agg-replan
trap (a union re-plans the aggregate per branch, re-scanning the
child per relation).

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
    groups: dict[int, list[tuple[str, DataFrame, str, DataFrame, str]]]
    groups = {}
    order: list[int] = []
    for rel in relations:
        key = id(rel[1])
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(rel)

    outs = []
    for key in order:
        rels = groups[key]
        child = rels[0][1]
        joined = child.select(*[
            F.col(fk).alias(f"__fk{i}")
            for i, (_, _, fk, _, _) in enumerate(rels)
        ])
        for i, (_, _, _, parent, pk) in enumerate(rels):
            keys = parent.select(
                F.col(pk).alias(f"__pk{i}")
            ).distinct()
            joined = joined.join(
                F.broadcast(keys),
                F.col(f"__fk{i}") == F.col(f"__pk{i}"),
                "left",
            )
        agg_cols = [F.count(F.lit(1)).alias("__n")]
        for i, _ in enumerate(rels):
            agg_cols.append(
                F.count_if(F.col(f"__fk{i}").isNull()).alias(f"__nn{i}")
            )
            agg_cols.append(
                F.count_if(
                    F.col(f"__fk{i}").isNotNull()
                    & F.col(f"__pk{i}").isNull()
                ).alias(f"__no{i}")
            )
        one = joined.agg(*agg_cols)
        fan = one.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(name).alias("relation"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nn{i}").alias("n_null_fk"),
                        F.col(f"__no{i}").alias("n_orphans"),
                    )
                    for i, (name, _, _, _, _) in enumerate(rels)
                ])
            ).alias("r")
        ).select("r.relation", "r.n_rows", "r.n_null_fk", "r.n_orphans")
        outs.append(fan)
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
