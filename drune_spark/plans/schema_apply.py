"""Schema-apply projection (operator P1-P4 in SURVEY §2.2).

The reference applies column specs one at a time per engine
(reference: engines/duckdb/duckdb_engine.py:60-112, engines/spark/steps/
transformer.py:24-77). Here the whole schema lands in ONE ``df.select``
so Catalyst sees a single narrow projection: no shuffle, full
whole-stage-codegen, column pruning reaches the scan. At 100 TB this is
the difference between N passes and one fused map stage.

Semantics reproduced:
- rename ``from`` → ``name``
- cast/try_cast to the declared type (string DDL type, so decimal/array
  come free); ``date``/``datetime`` honor ``format`` patterns
- ``expression`` with ``{col}`` placeholder replaced by the *cast* source
  column expression (duckdb_engine.py:98-102)
- derived columns (no ``from``) may reference already-renamed columns, so
  they are resolved in a second select (declared order preserved —
  reference applies specs sequentially, model.yml:59-61)
- optional missing columns materialise as typed NULL (transformer.py:32-35)
- ``column_rename_pattern: snake_case`` (transformer.py:8-11)
- control columns: ``hash_key`` = sha2-256 of ``||``-joined PK columns
  (transformer.py:46-62), ``updated_at``/``created_at`` timestamps
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from drune_spark.config.models import ColumnSpec, SchemaSpec, to_snake_case


class SchemaApplyError(ValueError):
    pass


def _cast_expr(source_sql: str, spec: ColumnSpec) -> str:
    """Build the SQL expression string for one column spec."""
    ty = spec.type.lower()
    ty = {"str": "string", "int": "bigint", "long": "bigint", "float": "double",
          "datetime": "timestamp", "bool": "boolean"}.get(ty, ty)
    if ty == "date" and spec.format:
        # try_to_date: malformed input -> NULL (plain to_date throws
        # under Spark 4's default ANSI mode).
        fn = "try_to_date" if spec.try_cast else "to_date"
        cast = f"{fn}({source_sql}, '{spec.format}')"
    elif ty == "timestamp" and spec.format:
        fn = "try_to_timestamp" if spec.try_cast else "to_timestamp"
        cast = f"{fn}({source_sql}, '{spec.format}')"
    elif spec.try_cast:
        cast = f"try_cast({source_sql} AS {ty})"
    else:
        cast = f"cast({source_sql} AS {ty})"
    if spec.expression:
        if "{col}" in spec.expression:
            # {col} placeholder receives the already-cast source expression.
            return spec.expression.replace("{col}", cast)
        if "{raw}" in spec.expression:
            # {raw} receives the UNCAST source — for type-changing
            # expressions (e.g. string → array<int>) where casting first
            # is impossible; the result is cast to the declared type.
            fn = "try_cast" if spec.try_cast else "cast"
            return f"{fn}(({spec.expression.replace('{raw}', source_sql)}) AS {ty})"
        # Free expression (derived / multi-column): cast the result instead.
        fn = "try_cast" if spec.try_cast else "cast"
        return f"{fn}(({spec.expression}) AS {ty})"
    return cast


def apply_schema(df: DataFrame, schema: SchemaSpec) -> DataFrame:
    """Project ``df`` onto the declared schema in a single select pass."""
    if schema.column_rename_pattern == "snake_case":
        df = df.toDF(*[to_snake_case(c) for c in df.columns])

    available = set(df.columns)
    first_pass: list[Column] = []
    derived: list[ColumnSpec] = []
    for spec in schema.columns:
        src = spec.source_name
        if spec.expression is not None and spec.from_ is None and src not in available:
            # No source column of this name: a derived column, resolved in
            # the second pass so it can reference final (renamed) names.
            derived.append(spec)
            continue
        if src not in available:
            if spec.optional:
                # Typed NULL keeps the target schema stable (Gen-1 Spark behavior).
                first_pass.append(F.expr(_cast_expr("NULL", spec)).alias(spec.name))
                continue
            raise SchemaApplyError(
                f"required source column '{src}' missing for '{spec.name}'"
            )
        first_pass.append(F.expr(_cast_expr(f"`{src}`", spec)).alias(spec.name))
    out = df.select(*first_pass)
    # Derived columns may reference final (renamed) columns, in declared order.
    for spec in derived:
        out = out.withColumn(spec.name, F.expr(_cast_expr(spec.expression or "NULL", spec)))
    return out


def add_hash_key(df: DataFrame, primary_key: list[str]) -> DataFrame:
    """``hash_key`` = sha2-256 over sorted PK columns joined by ``||``
    (transformer.py:46-56). Narrow op — no shuffle."""
    if not primary_key:
        return df
    cols = [F.col(c).cast("string") for c in sorted(primary_key)]
    return df.withColumn("hash_key", F.sha2(F.concat_ws("||", *cols), 256))


def add_data_hash(df: DataFrame, track_columns: list[str]) -> DataFrame:
    """SCD2 change-detection hash over tracked columns (transformer.py:57-62)."""
    cols = [F.col(c).cast("string") for c in sorted(track_columns)]
    return df.withColumn("data_hash", F.sha2(F.concat_ws("||", *cols), 256))


def add_audit_columns(df: DataFrame, created: bool = True) -> DataFrame:
    out = df.withColumn("updated_at", F.current_timestamp())
    if created:
        out = out.withColumn("created_at", F.current_timestamp())
    return out
