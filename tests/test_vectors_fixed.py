"""Bit-parity proof for the codegen vector primitives (r10 optimization).

``dot_fixed_sql``/``cosine_fixed`` replace the interpreted
``aggregate``/``zip_with`` HOF folds in pair-join hot paths. The oracle
contract needs BIT equality (downstream floors/rounds hash-compare), so
these tests compare raw IEEE bit patterns, not approximate values, over
real embeddings plus adversarial rows (NULL, short, zero, negative,
signed-zero elements).
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from drune_spark.functions.vectors import (
    cosine_fixed,
    cosine_similarity,
    dot,
    dot_fixed_sql,
    to_double_array,
)

DIM = 8


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


@pytest.fixture(scope="module")
def pair_df(spark):
    rows = [
        # (id, a, b) — plain values
        (1, [1.0, 2.0, -3.5, 0.25, 4.0, -1.0, 0.5, 2.5],
            [0.5, -1.5, 2.0, 8.0, -0.125, 3.0, 1.0, -2.0]),
        # tiny magnitudes (rounding-sensitive sums)
        (2, [1e-300, 2e-300, 3e-300, -1e-300, 1e-305, 2e-17, 1.0, -1.0],
            [1e3, -1e3, 1e-5, 1e300, 1e-300, 1.0, 1e-17, 1e-17]),
        # signed zeros
        (4, [-0.0, 0.0, -0.0, 1.0, -1.0, -0.0, 0.0, 2.0],
            [0.0, -0.0, 5.0, -0.0, -0.0, 3.0, -7.0, 0.5]),
        # NULL array side
        (5, None, [1.0] * DIM),
        # short array (fold NULL-pads -> NULL result)
        (6, [1.0, 2.0], [1.0] * DIM),
        # irrational-ish accumulations (order-sensitive)
        (7, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8],
            [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2]),
    ]
    return spark.createDataFrame(
        rows, "id int, a array<double>, b array<double>"
    )


def test_dot_fixed_bitwise_parity(pair_df):
    out = pair_df.select(
        "id",
        dot(F.col("a"), F.col("b")).alias("fold"),
        F.expr(dot_fixed_sql("a", "b", DIM)).alias("fixed"),
    ).collect()
    for r in out:
        assert _bits(r["fold"]) == _bits(r["fixed"]), r


def test_cosine_fixed_bitwise_parity(pair_df):
    out = pair_df.select(
        "id",
        cosine_similarity(F.col("a"), F.col("b")).alias("fold"),
        cosine_fixed("a", "b", DIM).alias("fixed"),
    ).collect()
    for r in out:
        assert _bits(r["fold"]) == _bits(r["fixed"]), r


def test_cosine_zero_vector_raises_in_both_forms(spark):
    """Under ANSI both forms throw DIVIDE_BY_ZERO on a zero vector —
    identical behavior (real embeddings are never zero)."""
    df = spark.createDataFrame(
        [(1, [0.0] * DIM, [1.0] * DIM)],
        "id int, a array<double>, b array<double>",
    )
    for col in (
        cosine_similarity(F.col("a"), F.col("b")),
        cosine_fixed("a", "b", DIM),
    ):
        with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
            df.select(col.alias("c")).collect()


def test_cosine_fixed_parity_on_embeddings(spark):
    """Cross pairs of the sf0.001 embeddings — the actual data the
    similarity operators score — compared at raw IEEE bit level."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        F.col("vec_id"), to_double_array(F.col("embedding")).alias("v")
    )
    a = emb.select(F.col("vec_id").alias("ai"), F.col("v").alias("av"))
    b = emb.select(F.col("vec_id").alias("bi"), F.col("v").alias("bv"))
    pairs = a.join(b, F.col("ai") < F.col("bi")).limit(2000)
    out = pairs.select(
        cosine_similarity(F.col("av"), F.col("bv")).alias("fold"),
        cosine_fixed("av", "bv", 64).alias("fixed"),
    ).collect()
    assert len(out) > 0
    for r in out:
        assert _bits(r["fold"]) == _bits(r["fixed"])


def test_to_double_array_is_exact_widening(spark):
    df = spark.createDataFrame(
        [(1, [1.5, -2.25, 0.1, 3.4028235e38]), (2, None)],
        "id int, v array<float>",
    )
    out = df.select(
        to_double_array(F.col("v")).alias("cast_form"),
        F.transform(F.col("v"), lambda x: x.cast("double")).alias("hof"),
    ).collect()
    for r in out:
        if r["cast_form"] is None:
            assert r["hof"] is None
            continue
        assert [_bits(x) for x in r["cast_form"]] == [
            _bits(x) for x in r["hof"]
        ]
