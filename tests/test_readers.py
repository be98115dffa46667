"""Source-reader tests: table/sql dispatch, the expected_columns width
guard (S7), dynamic directory paths (S8), nanos-safe parquet."""

import pytest

from drune_spark.config.models import ColumnSpec, SchemaSpec, SourceSpec
from drune_spark.plans.schema_apply import apply_schema
from drune_spark.sources.readers import (
    ReadError,
    read_parquet_nanos_safe,
    read_source,
    resolve_dynamic_path,
)


class TestReadSource:
    def test_table_source(self, spark):
        spark.range(5).write.mode("overwrite").saveAsTable("rs_table")
        df = read_source(spark, SourceSpec(name="t", type="table",
                                           table_name="rs_table"))
        assert df.count() == 5
        spark.sql("DROP TABLE rs_table")

    def test_sql_source(self, spark):
        df = read_source(spark, SourceSpec(
            name="q", type="sql", query="SELECT 1 AS one UNION ALL SELECT 2"))
        assert sorted(r.one for r in df.collect()) == [1, 2]

    def test_expected_columns_guard(self, spark, tmp_path):
        p = tmp_path / "w.csv"
        p.write_text("a,b,c\n1,2,3\n")
        spec = SourceSpec(name="s", type="file", format="csv", path=str(p),
                          options={"header": "true"}, expected_columns=2)
        with pytest.raises(ReadError, match="expected 2 columns, got 3"):
            read_source(spark, spec)
        spec.expected_columns = 3
        assert read_source(spark, spec).count() == 1

    def test_missing_required_fields(self, spark):
        with pytest.raises(ReadError):
            read_source(spark, SourceSpec(name="x", type="file", path=None))
        with pytest.raises(ReadError):
            read_source(spark, SourceSpec(name="x", type="table"))
        with pytest.raises(ReadError):
            read_source(spark, SourceSpec(name="x", type="sql"))

    def test_dynamic_path_directory_source(self, tmp_path):
        spec = SourceSpec(name="d", type="file", path=str(tmp_path))
        # relative runtime file resolves under the directory source
        assert resolve_dynamic_path(spec, "part.csv") == \
            str(tmp_path / "part.csv")
        # no runtime path -> declared path
        assert resolve_dynamic_path(spec, None) == str(tmp_path)

    def test_nanos_safe_read_plain_file(self, spark, tmp_path):
        # No nanos columns -> plain read path (no conf flip needed).
        p = str(tmp_path / "plain.parquet")
        spark.range(3).write.parquet(p)
        assert read_parquet_nanos_safe(spark, p).count() == 3

    def test_nanos_events_roundtrip(self, spark):
        df = read_parquet_nanos_safe(
            spark, "/root/testdata/sf0.001/events.parquet")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() == 1000


class TestTryCastDates:
    def test_try_cast_formatted_date_nulls_malformed(self, spark):
        df = spark.createDataFrame([("2024-01-02",), ("garbage",)], ["d"])
        out = apply_schema(df, SchemaSpec(columns=[
            ColumnSpec(name="data", **{"from": "d"}, type="date",
                       format="yyyy-MM-dd", try_cast=True),
        ]))
        vals = sorted([r.data for r in out.collect()],
                      key=lambda v: (v is None, str(v)))
        assert str(vals[0]) == "2024-01-02" and vals[1] is None

    def test_strict_formatted_date_raises(self, spark):
        df = spark.createDataFrame([("garbage",)], ["d"])
        out = apply_schema(df, SchemaSpec(columns=[
            ColumnSpec(name="data", **{"from": "d"}, type="date",
                       format="yyyy-MM-dd"),
        ]))
        with pytest.raises(Exception):
            out.collect()
