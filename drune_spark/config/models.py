"""Pydantic config models — the declarative surface of the engine.

Re-expresses the union of the reference's two config generations under one
model set (reference: src/drune/core/models/pipeline_model.py:10-212,
project_model.py:22-84). Key semantics reproduced:

- ``ColumnSpec``: final ``name`` (reserved names rejected: ``id`` and
  ``_``-prefixed — pipeline_model.py:10,45-62), source ``from``/``old_name``,
  string ``type`` resolved via Spark DDL parsing, ``expression`` with
  ``{col}`` placeholder, ``try_cast``, ``optional`` (missing source column
  materialises as typed NULL — the Gen-1 Spark behavior,
  engines/spark/steps/transformer.py:32-35), per-column ``constraints``.
- ``TargetSpec`` write modes append/overwrite/merge/overwrite_partition/
  overwrite_where + SCD2 config (pipeline_model.py:105-128).
- Type defaults folded into columns of that type (pipeline_model.py:147-157).
- Target schema inheritance from a source with include/exclude lists
  (pipeline_model.py:91-95,159-187).
- Project profiles deep-merged over defaults (project_model.py:46-84).
"""

from __future__ import annotations

import re
from typing import Any, Literal, Optional

from pydantic import BaseModel, Field, field_validator, model_validator

RESERVED_COLUMN_NAMES = {"id"}
CONTROL_COLUMNS = {
    "hash_key",
    "data_hash",
    "updated_at",
    "created_at",
    "is_current",
    "start_date",
    "end_date",
}
VOLATILE_COLUMNS = ["updated_at", "created_at", "start_date", "end_date", "log_timestamp"]


class ConstraintSpec(BaseModel):
    """One data-quality constraint on a column.

    ``rule`` uses the mini-grammar (``"isbetween:[0,100]"``); ``on_fail``
    default is ``fail`` (pipeline_model.py:20-23). ``set_null`` is declared
    in the reference model but implemented nowhere — we implement it.
    """

    rule: str
    on_fail: Literal["fail", "drop", "warn", "set_null"] = "fail"


class ColumnSpec(BaseModel):
    name: str
    from_: Optional[str] = Field(default=None, alias="from")
    type: str = "string"
    optional: bool = False
    expression: Optional[str] = None
    constraints: list[ConstraintSpec] = Field(default_factory=list)
    format: Optional[str] = None
    try_cast: bool = False
    pk: bool = False
    comment: Optional[str] = None

    model_config = {"populate_by_name": True}

    @field_validator("name")
    @classmethod
    def _reserved(cls, v: str) -> str:
        if v in RESERVED_COLUMN_NAMES:
            raise ValueError(f"column name '{v}' is reserved for the framework")
        if v.startswith("_"):
            raise ValueError(f"column name '{v}' must not start with '_'")
        return v

    @property
    def source_name(self) -> str:
        return self.from_ or self.name


class SourceSpec(BaseModel):
    name: str
    type: Literal["file", "table", "sql"] = "file"
    format: str = "parquet"
    path: Optional[str] = None
    table_name: Optional[str] = None
    query: Optional[str] = None
    options: dict[str, Any] = Field(default_factory=dict)
    expected_columns: Optional[int] = None
    schema_: Optional[SchemaSpec] = Field(default=None, alias="schema")

    model_config = {"populate_by_name": True}


class SchemaSpec(BaseModel):
    primary_key: list[str] = Field(default_factory=list)
    partition_by: list[str] = Field(default_factory=list)
    bucket_by: list[str] = Field(default_factory=list)
    num_buckets: int = 0
    inherits: Optional[InheritSpec] = None
    columns: list[ColumnSpec] = Field(default_factory=list)
    column_rename_pattern: Optional[Literal["snake_case"]] = None


class InheritSpec(BaseModel):
    source: str
    columns: list[str] = Field(default_factory=list)  # include-list; empty = all
    exclude: list[str] = Field(default_factory=list)


class SCDConfig(BaseModel):
    type: int = 2
    track_columns: list[str] = Field(default_factory=list)  # empty = all non-control


class TargetSpec(BaseModel):
    name: str = "target"
    type: Literal["file", "table"] = "file"
    format: str = "parquet"
    path: Optional[str] = None
    table_name: Optional[str] = None
    mode: Literal[
        "append", "overwrite", "merge", "overwrite_partition", "overwrite_where"
    ] = "overwrite"
    overwrite_condition: Optional[str] = None
    scd: Optional[SCDConfig] = None
    options: dict[str, Any] = Field(default_factory=dict)
    schema_: Optional[SchemaSpec] = Field(default=None, alias="schema")

    model_config = {"populate_by_name": True}


class StepConfig(BaseModel):
    name: str
    type: str
    params: dict[str, Any] = Field(default_factory=dict)


class TypeDefault(BaseModel):
    expression: Optional[str] = None
    format: Optional[str] = None
    try_cast: Optional[bool] = None


class PipelineDefaults(BaseModel):
    types: dict[str, TypeDefault] = Field(default_factory=dict)
    sources: dict[str, dict[str, Any]] = Field(default_factory=dict)
    targets: dict[str, dict[str, Any]] = Field(default_factory=dict)


class TestBlock(BaseModel):
    """Golden test mode (engines/spark/steps/tester.py:10-45)."""

    source_data: dict[str, str] = Field(default_factory=dict)
    expected: Optional[str] = None  # path or table of expected results


class PipelineModel(BaseModel):
    pipeline_name: str
    defaults: PipelineDefaults = Field(default_factory=PipelineDefaults)
    sources: list[SourceSpec] = Field(default_factory=list)
    target: Optional[TargetSpec] = None
    steps: list[StepConfig] = Field(default_factory=list)
    validation_log_table: Optional[str] = None
    test: Optional[TestBlock] = None

    @model_validator(mode="after")
    def _fold_type_defaults(self) -> "PipelineModel":
        """Inject defaults.types.<type> into every matching column unless set."""
        for holder in [s.schema_ for s in self.sources] + (
            [self.target.schema_] if self.target else []
        ):
            if holder is None:
                continue
            for col in holder.columns:
                td = self.defaults.types.get(col.type)
                if td is None:
                    continue
                if col.expression is None and td.expression is not None:
                    col.expression = td.expression
                if col.format is None and td.format is not None:
                    col.format = td.format
                if td.try_cast is not None and "try_cast" not in col.model_fields_set:
                    col.try_cast = td.try_cast
        return self

    @model_validator(mode="after")
    def _resolve_inheritance(self) -> "PipelineModel":
        """Target inherits source columns; explicit target columns win."""
        if not self.target or not self.target.schema_ or not self.target.schema_.inherits:
            return self
        inh = self.target.schema_.inherits
        src = next((s for s in self.sources if s.name == inh.source), None)
        if src is None or src.schema_ is None:
            raise ValueError(f"inherits.source '{inh.source}' not found or has no schema")
        explicit = {c.name for c in self.target.schema_.columns}
        inherited = []
        for col in src.schema_.columns:
            if col.name in explicit or col.name in inh.exclude:
                continue
            if inh.columns and col.name not in inh.columns:
                continue
            # The source-level rename/expression/constraints were already
            # applied during read; at the target the inherited column is a
            # typed passthrough under its FINAL name (re-casting only, per
            # the reference's gold post-cast, transformer.py:79-95).
            inherited.append(col.model_copy(deep=True, update={
                "from_": None, "expression": None, "format": None,
                "try_cast": False, "constraints": [],
            }))
        self.target.schema_.columns = inherited + self.target.schema_.columns
        return self


# --- project level -----------------------------------------------------------


class LoggingConfig(BaseModel):
    failed_records_path: Optional[str] = None
    level: str = "INFO"


class EngineDefaults(BaseModel):
    name: str = "spark"
    options: dict[str, Any] = Field(default_factory=dict)


class ProjectDefaults(BaseModel):
    engine: EngineDefaults = Field(default_factory=EngineDefaults)
    vars: dict[str, Any] = Field(default_factory=dict)
    paths: dict[str, str] = Field(default_factory=dict)
    types: dict[str, TypeDefault] = Field(default_factory=dict)
    sources: dict[str, dict[str, Any]] = Field(default_factory=dict)
    targets: dict[str, dict[str, Any]] = Field(default_factory=dict)


def deep_merge(base: dict, overlay: dict) -> dict:
    """Recursive dict merge; overlay wins (project_model.py:46-84)."""
    out = dict(base)
    for key, value in overlay.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = deep_merge(out[key], value)
        else:
            out[key] = value
    return out


class ProjectModel(BaseModel):
    name: str
    logging: LoggingConfig = Field(default_factory=LoggingConfig)
    defaults: ProjectDefaults = Field(default_factory=ProjectDefaults)
    profiles: dict[str, dict[str, Any]] = Field(default_factory=dict)

    def merge_defaults(self, profile: Optional[str]) -> ProjectDefaults:
        if not profile:
            return self.defaults
        if profile not in self.profiles:
            raise ValueError(f"unknown profile '{profile}'")
        merged = deep_merge(self.defaults.model_dump(), self.profiles[profile])
        return ProjectDefaults.model_validate(merged)


_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def to_snake_case(name: str) -> str:
    """camelCase / PascalCase → snake_case (transformer.py:8-11)."""
    return _CAMEL_RE.sub("_", name).lower()


def interpolate_vars(text: str, vars_: dict[str, Any]) -> str:
    """``{var}`` substitution in YAML strings (declared-but-unused in the
    reference, project_model.py:22; implemented here consciously).
    Unknown placeholders are left untouched (they may be ``{col}`` templates).
    """

    def _sub(match: re.Match[str]) -> str:
        key = match.group(1)
        return str(vars_[key]) if key in vars_ else match.group(0)

    return re.sub(r"\{(\w+)\}", _sub, text)


SourceSpec.model_rebuild()
TargetSpec.model_rebuild()
SchemaSpec.model_rebuild()
