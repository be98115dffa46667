"""The reference's CLI integration corpus, re-expressed (FIXTURES.md §A).

Each fixture is a CSV + pipeline config pair; these are the reference's
real behavioral spec (reference: tests/cli/test_files/*,
tests/cli/test_cli_integration_advanced.py:7-46). One test per fixture,
same expected outcome.
"""

import pytest
from pydantic import ValidationError

from drune_spark.config.models import PipelineModel
from drune_spark.pipeline import Pipeline
from drune_spark.quality.manager import ConstraintError
from drune_spark.plans.schema_apply import SchemaApplyError


def run_pipeline(spark, tmp_path, csv_text: str, model_dict: dict):
    src = tmp_path / "input.csv"
    src.write_text(csv_text)
    model_dict.setdefault("pipeline_name", "fixture")
    model_dict["sources"][0]["path"] = str(src)
    model_dict["sources"][0].setdefault("format", "csv")
    model_dict["sources"][0].setdefault("options", {"header": "true"})
    pipe = Pipeline(spark, PipelineModel.model_validate(model_dict))
    pipe.read()
    return pipe.run() if pipe.model.steps else pipe.target_df


class TestReferenceFixtures:
    def test_a1_basic_passthrough(self, spark, tmp_path):
        out = run_pipeline(spark, tmp_path, "col1,col2\n1,a\n2,b\n3,c\n", {
            "sources": [{"name": "s", "type": "file", "schema": {"columns": [
                {"name": "col1", "type": "int"},
                {"name": "col2", "type": "str"},
            ]}}],
        })
        assert out.columns == ["col1", "col2"] and out.count() == 3

    def test_a2_rename_pk_rules_transform(self, spark, tmp_path):
        csv = ("id_cliente,code,amount,date,desc,flag\n"
               "1,A100,10.5,2025-08-01,Compra,True\n"
               "2,B200,20.0,2025-08-02,Venda,False\n"
               "3,C300,5.25,2025-08-03,Troca,True\n")
        out = run_pipeline(spark, tmp_path, csv, {
            "sources": [{"name": "s", "type": "file", "schema": {
                "primary_key": ["id_cliente", "codigo"],
                "columns": [
                    {"name": "id_cliente", "type": "int"},
                    {"name": "codigo", "from": "code", "type": "str",
                     "constraints": [{"rule": "not_null"}]},
                    {"name": "valor", "from": "amount", "type": "float",
                     "constraints": [{"rule": "not_null"},
                                     {"rule": "greater_than:0"}]},
                    {"name": "data_compra", "from": "date", "type": "str"},
                    {"name": "descricao", "from": "desc", "type": "str",
                     "optional": True},
                    {"name": "ativo", "from": "flag", "type": "bool"},
                ]}}],
            "steps": [{"name": "double", "type": "sql", "params": {
                "query": "SELECT id_cliente, codigo, valor * 2 AS valor, "
                         "data_compra, descricao, ativo FROM s"}}],
        })
        rows = {r.codigo: r.valor for r in out.collect()}
        assert rows == {"A100": 21.0, "B200": 40.0, "C300": 10.5}
        assert set(out.columns) >= {"codigo", "valor", "data_compra",
                                    "descricao", "ativo"}

    def test_a3_composite_pk_duplicate_row_succeeds(self, spark, tmp_path):
        csv = ("id_cliente,code,amount\n1,A,1.0\n1,A,1.0\n2,B,2.0\n")
        out = run_pipeline(spark, tmp_path, csv, {
            "sources": [{"name": "s", "type": "file", "schema": {
                "primary_key": ["id_cliente", "codigo"],
                "columns": [
                    {"name": "id_cliente", "type": "int"},
                    {"name": "codigo", "from": "code", "type": "str"},
                    {"name": "valor", "from": "amount", "type": "float"},
                ]}}],
        })
        # no unique rule declared -> duplicates pass through (3 rows)
        assert out.count() == 3

    def test_a4_not_null_violation_fails_pipeline(self, spark, tmp_path):
        csv = "col1,col2\n1,\n2,B\n,C\n"
        with pytest.raises(ConstraintError):
            run_pipeline(spark, tmp_path, csv, {
                "sources": [{"name": "s", "type": "file", "schema": {"columns": [
                    {"name": "col1", "type": "int",
                     "constraints": [{"rule": "not_null"}]},  # default fail
                    {"name": "col2", "type": "str"},
                ]}}],
            })

    def test_a5_bad_cast_strict_vs_try(self, spark, tmp_path):
        csv = "col1,col2\n1,a\n2,b\nx,c\n"
        strict = {
            "sources": [{"name": "s", "type": "file",
                         "options": {"header": "true", "inferSchema": "false"},
                         "schema": {"columns": [
                             {"name": "col1", "type": "int"},
                             {"name": "col2", "type": "str"}]}}],
        }
        with pytest.raises(Exception):  # ANSI cast error surfaces on action
            run_pipeline(spark, tmp_path, csv, strict).collect()
        lax = {
            "sources": [{"name": "s", "type": "file",
                         "options": {"header": "true", "inferSchema": "false"},
                         "schema": {"columns": [
                             {"name": "col1", "type": "int", "try_cast": True},
                             {"name": "col2", "type": "str"}]}}],
        }
        out = run_pipeline(spark, tmp_path, csv, lax)
        assert [r.col1 for r in out.orderBy("col2").collect()] == [1, 2, None]

    def test_a6_isin_all_valid(self, spark, tmp_path):
        csv = "col1,col2\n1,A\n2,B\n3,C\n"
        out = run_pipeline(spark, tmp_path, csv, {
            "sources": [{"name": "s", "type": "file", "schema": {"columns": [
                {"name": "col1", "type": "int",
                 "constraints": [{"rule": "not_null"}]},
                {"name": "col2", "type": "str",
                 "constraints": [{"rule": "isin:['A','B','C']"}]},
            ]}}],
        })
        assert out.count() == 3

    def test_a7_expression_transform(self, spark, tmp_path):
        csv = "col1,col2,col3\n1,a,10\n2,b,20\n3,c,30\n"
        out = run_pipeline(spark, tmp_path, csv, {
            "sources": [{"name": "s", "type": "file", "schema": {"columns": [
                {"name": "col1", "type": "int"},
                {"name": "col2", "type": "str"},
                {"name": "col3", "type": "int"},
            ]}}],
            "steps": [{"name": "t", "type": "sql", "params": {
                "query": "SELECT col1, col2, col3 + 100 AS col3 FROM s"}}],
        })
        assert sorted(r.col3 for r in out.collect()) == [110, 120, 130]

    def test_a8_missing_required_column(self, spark, tmp_path):
        csv = "col1\n1\n2\n"
        with pytest.raises(SchemaApplyError):
            run_pipeline(spark, tmp_path, csv, {
                "sources": [{"name": "s", "type": "file", "schema": {"columns": [
                    {"name": "col1", "type": "int"},
                    {"name": "col2", "type": "str"},
                ]}}],
            })

    def test_a9_reserved_column_name_rejected(self):
        with pytest.raises(ValidationError):
            PipelineModel.model_validate({
                "pipeline_name": "p",
                "sources": [{"name": "s", "type": "file", "path": "/x",
                             "schema": {"columns": [{"name": "id",
                                                     "type": "int"}]}}],
            })
