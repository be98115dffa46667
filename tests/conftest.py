import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from drune_spark.session import get_spark

    spark = get_spark("drune_spark_tests", master="local[4]",
                      options={"spark.sql.shuffle.partitions": "4"})
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def assert_df_equal(actual, expected, sort_by=None):
    """chispa-style DataFrame equality: same columns (order-insensitive),
    same rows (order-insensitive unless sort_by given)."""
    acols, ecols = sorted(actual.columns), sorted(expected.columns)
    assert acols == ecols, f"columns differ: {acols} vs {ecols}"
    a = [tuple(r) for r in actual.select(*acols).collect()]
    e = [tuple(r) for r in expected.select(*acols).collect()]
    assert sorted(map(repr, a)) == sorted(map(repr, e)), \
        f"rows differ:\n  actual={sorted(map(repr, a))[:5]}\n  expected={sorted(map(repr, e))[:5]}"
