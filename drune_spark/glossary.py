"""Glossary / semantic layer (reference: examples/glossary/example.yml:1-76).

The reference declares business concepts, metrics (with formulas), and
segments in YAML, consumed by an empty ``ai/`` module. Here the glossary
is functional: metrics and segments compile into Spark SQL over a base
concept table, so a business user's ``metrics: [total_revenue]`` +
``segment: active`` becomes a runnable query. (The NL→SQL layer the
reference stubs via vanna/chromadb is out of scope — this is the
deterministic compilation underneath it.)

YAML shape::

    concepts:
      orders:
        table: orders_view          # registered view/table
        description: customer orders
        metrics:
          total_revenue: "SUM(CAST(o_totalprice AS DECIMAL(18,2)))"
          n_orders: "COUNT(*)"
        segments:
          open: "o_orderstatus = 'O'"
        dimensions: [o_orderpriority]
"""

from __future__ import annotations

from typing import Optional

import yaml
from pydantic import BaseModel, Field
from pyspark.sql import DataFrame, SparkSession


class ConceptModel(BaseModel):
    table: str
    description: Optional[str] = None
    metrics: dict[str, str] = Field(default_factory=dict)
    segments: dict[str, str] = Field(default_factory=dict)
    dimensions: list[str] = Field(default_factory=list)


class GlossaryModel(BaseModel):
    concepts: dict[str, ConceptModel] = Field(default_factory=dict)


class Glossary:
    def __init__(self, model: GlossaryModel):
        self.model = model

    @classmethod
    def from_yaml(cls, path: str) -> "Glossary":
        with open(path) as fh:
            return cls(GlossaryModel.model_validate(yaml.safe_load(fh)))

    def compile_sql(
        self,
        concept: str,
        metrics: list[str],
        segment: Optional[str] = None,
        group_by: Optional[list[str]] = None,
    ) -> str:
        c = self.model.concepts[concept]
        unknown = [m for m in metrics if m not in c.metrics]
        if unknown:
            raise KeyError(f"unknown metrics {unknown} for concept '{concept}' "
                           f"(known: {sorted(c.metrics)})")
        group_by = group_by or []
        bad_dims = [d for d in group_by if d not in c.dimensions]
        if bad_dims:
            raise KeyError(f"dimensions {bad_dims} not declared for '{concept}'")
        select = group_by + [f"{c.metrics[m]} AS {m}" for m in metrics]
        sql = f"SELECT {', '.join(select)} FROM {c.table}"
        if segment:
            if segment not in c.segments:
                raise KeyError(f"unknown segment '{segment}'")
            sql += f" WHERE {c.segments[segment]}"
        if group_by:
            sql += f" GROUP BY {', '.join(group_by)}"
        return sql

    def query(
        self,
        spark: SparkSession,
        concept: str,
        metrics: list[str],
        segment: Optional[str] = None,
        group_by: Optional[list[str]] = None,
    ) -> DataFrame:
        return spark.sql(self.compile_sql(concept, metrics, segment, group_by))
