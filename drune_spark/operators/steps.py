"""Core relational steps: filter, join, sql (chain), pivot, aggregate, dropDuplicates.

Reference semantics (SURVEY §2.2-2.4, §2.9):
- filter (P5): ``params.where`` Spark-SQL predicate → ``df.filter``
  (reference: engines/duckdb/steps.py:31-40). Declarative, so Catalyst
  pushes it into the scan.
- join (J1): ``sources: [a, b, ...]``, left-fold pairwise joins on
  ``on`` / per-pair conditions, ``join_type`` default inner
  (engines/pandas/steps.py:79-116, engines/duckdb/steps.py:42-74).
  Catalyst picks broadcast vs shuffle join; small dims auto-broadcast
  below the threshold, or force with ``broadcast: [name]``.
- sql (Q1-Q3): register inputs as temp views, execute an ordered chain of
  SQL statements, each result registered as a view named after its step
  for the next statement (spark_engine.py:232-255). Pure Catalyst: the
  whole chain folds into one logical plan.
- pivot (A2): index/columns/values/aggfunc (engines/pandas/steps.py:
  144-171). Passing explicit ``pivot_values`` skips Spark's extra
  distinct-scan job — at 100 TB always pass them.
- aggregate (A1): group_by + named agg expressions; Spark's partial
  (map-side) aggregation means the shuffle carries #groups, not #rows.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drune_spark.operators.registry import Step, StepRegistry


@StepRegistry.register("filter")
class FilterStep(Step):
    def execute(self, inputs, current, *, where: str,
                source: Optional[str] = None, **_: Any) -> DataFrame:
        return self.pick_input(inputs, current, source).filter(where)


@StepRegistry.register("join")
class JoinStep(Step):
    def execute(
        self,
        inputs,
        current,
        *,
        sources: list[str],
        on: Any = None,
        join_type: str = "inner",
        broadcast: Optional[list[str]] = None,
        select: Optional[list[str]] = None,
        **_: Any,
    ) -> DataFrame:
        if not sources or len(sources) < 2:
            raise ValueError("join step needs >= 2 source names")
        broadcast = broadcast or []

        def pick(name: str) -> DataFrame:
            df = inputs[name]
            return F.broadcast(df) if name in broadcast else df

        n_pairs = len(sources) - 1
        # `on` disambiguation: for a SINGLE pair, a flat list of column
        # names is a COMPOSITE key (['k1','k2'] must not truncate to
        # 'k1'); for multiple pairs a list is per-pair conditions, where
        # each element may itself be a list (composite) or a condition
        # string.
        if not isinstance(on, list):
            per_pair: list = [on] * n_pairs
        elif n_pairs == 1 and all(
            isinstance(e, str) and not any(op in e for op in ("=", "<", ">"))
            for e in on
        ):
            per_pair = [on]
        else:
            per_pair = on

        out = pick(sources[0])
        for i, name in enumerate(sources[1:]):
            cond = per_pair[i] if i < len(per_pair) else None
            if cond is None:
                raise ValueError(f"join step missing 'on' for pair {i}")
            right = pick(name)
            if isinstance(cond, str) and any(op in cond for op in ("=", "<", ">")):
                out = out.join(right, F.expr(cond), join_type)
            else:
                out = out.join(right, cond, join_type)
        return out.select(*select) if select else out


@StepRegistry.register("sql")
class SqlStep(Step):
    """SQL chain: each statement's result becomes a temp view for the next."""

    def execute(
        self,
        inputs,
        current,
        *,
        statements: Optional[list[dict[str, str]]] = None,
        query: Optional[str] = None,
        **_: Any,
    ) -> DataFrame:
        for name, df in inputs.items():
            df.createOrReplaceTempView(name)
        if current is not None:
            current.createOrReplaceTempView("target")
        if query is not None:
            statements = [{"name": self.name, "sql": query}]
        if not statements:
            raise ValueError("sql step needs 'query' or 'statements'")
        result: Optional[DataFrame] = None
        for stmt in statements:
            result = self.spark.sql(stmt["sql"])
            result.createOrReplaceTempView(stmt["name"])
        assert result is not None
        return result


@StepRegistry.register("pivot")
class PivotStep(Step):
    def execute(
        self,
        inputs,
        current,
        *,
        index: list[str],
        columns: str,
        values: str,
        aggfunc: str = "avg",
        pivot_values: Optional[list[str]] = None,
        source: Optional[str] = None,
        **_: Any,
    ) -> DataFrame:
        df = self.pick_input(inputs, current, source)
        grouped = df.groupBy(*index)
        pivoted = grouped.pivot(columns, pivot_values) if pivot_values \
            else grouped.pivot(columns)
        return pivoted.agg(F.expr(f"{aggfunc}(`{values}`)"))


@StepRegistry.register("aggregate")
class AggregateStep(Step):
    def execute(
        self,
        inputs,
        current,
        *,
        group_by: list[str],
        aggs: dict[str, str],
        source: Optional[str] = None,
        **_: Any,
    ) -> DataFrame:
        df = self.pick_input(inputs, current, source)
        exprs = [F.expr(expr).alias(name) for name, expr in aggs.items()]
        return df.groupBy(*group_by).agg(*exprs)


@StepRegistry.register("select")
class SelectStep(Step):
    """Projection step: ``columns`` are SQL expressions with optional
    ``AS`` aliases — narrow, fuses into codegen."""

    def execute(self, inputs, current, *, columns: list[str],
                source: Optional[str] = None, **_: Any) -> DataFrame:
        df = self.pick_input(inputs, current, source)
        return df.selectExpr(*columns)


@StepRegistry.register("union")
class UnionStep(Step):
    """Union named inputs by column name (reference idiom: unionByName
    with allowMissingColumns for failure-set consolidation,
    engines/spark/steps/validator.py:112-121, writer.py:73)."""

    def execute(
        self,
        inputs,
        current,
        *,
        sources: list[str],
        allow_missing_columns: bool = False,
        distinct: bool = False,
        **_: Any,
    ) -> DataFrame:
        if not sources:
            raise ValueError("union step needs source names")
        out = inputs[sources[0]]
        for name in sources[1:]:
            out = out.unionByName(
                inputs[name], allowMissingColumns=allow_missing_columns
            )
        return out.distinct() if distinct else out


@StepRegistry.register("drop_duplicates")
class DropDuplicatesStep(Step):
    """Exact dedup. With ``keep_by`` (an ORDER BY clause) the survivor per
    key group is deterministic via row_number; without it, Spark's
    dropDuplicates keeps an arbitrary row (first seen per partition)."""

    def execute(
        self,
        inputs,
        current,
        *,
        subset: Optional[list[str]] = None,
        keep_by: Optional[str] = None,
        source: Optional[str] = None,
        **_: Any,
    ) -> DataFrame:
        df = self.pick_input(inputs, current, source)
        if not subset:
            return df.dropDuplicates()
        if keep_by is None:
            return df.dropDuplicates(subset)
        from pyspark.sql import Window

        from drune_spark.config.parsers import _split_top_level
        # keep_by is an ORDER BY clause ("version DESC, ts ASC") — F.expr
        # can't parse sort direction, so split it out per term. Top-level-
        # aware split: commas inside function calls ("coalesce(v, 0) DESC")
        # must not tear the expression apart.
        order_cols = []
        for term in _split_top_level(keep_by, ","):
            parts = term.strip().rsplit(None, 1)
            if len(parts) == 2 and parts[1].upper() in ("ASC", "DESC"):
                expr = F.expr(parts[0])
                order_cols.append(expr.desc() if parts[1].upper() == "DESC"
                                  else expr.asc())
            else:
                order_cols.append(F.expr(term.strip()))
        w = Window.partitionBy(*subset).orderBy(*order_cols)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
