"""Embedding storage/transport operators (driver extension).

Symmetric int8 quantization for embedding columns — the standard 4×
storage/bandwidth reduction before ANN indexing. Pure JVM array
arithmetic (zip-free: transform + array_max), narrow, zero shuffle.

Rounding is spelled out as ``floor(x / scale + 0.5)`` (round half
toward +inf) instead of an engine ``round()`` builtin, so the exact
same FP op sequence runs in any engine — the DuckDB oracle reproduces
every quantized value bit-for-bit.

No counterpart in /root/reference; driver-mandated LLM-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drune_spark.functions.vectors import to_double_array


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric quantization to ``bits``-bit signed ints:
    scale = max(|x|) / qmax, q_i = floor(x_i / scale + 0.5). Returns
    (id, scale, qvec). Dequantize with q_i * scale; all-zero vectors get
    scale 0 and zero codes."""
    qmax = (1 << (bits - 1)) - 1
    v = to_double_array(F.col(vec_col))
    # Stage scale as a materialized column: referencing the array_max
    # subtree inside the transform lambda would re-evaluate it per
    # element (interpreted-HOF trap — see functions/text.py header).
    staged = df.select(
        F.col(id_col),
        v.alias("__v"),
        (
            F.array_max(F.transform(v, lambda x: F.abs(x)))
            / F.lit(float(qmax))
        ).alias("scale"),
    )
    s = F.col("scale")
    qvec = F.when(
        s > 0,
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x / s + F.lit(0.5)).cast("int"),
        ),
    ).otherwise(F.transform(F.col("__v"), lambda x: F.lit(0)))
    return staged.select(F.col(id_col), s, qvec.alias("qvec"))
