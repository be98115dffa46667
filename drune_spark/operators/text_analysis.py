"""Text-analysis operators over a documents table (driver extension).

Thin DataFrame builders over drune_spark.functions.text — everything is
JVM-side column arithmetic (no UDFs), so these fuse into the scan stage
and cost one pass at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drune_spark.functions.hashes import fingerprint_md5, rolling_min_fingerprint
from drune_spark.functions.text import (
    avg_token_length,
    lang_id,
    punct_ratio,
    quality_score,
    regex_token_count,
    stopword_ratio,
    token_count,
)


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality metrics: token counts, ratios, composite score."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        token_count(t).alias("n_tokens"),
        regex_token_count(t).alias("n_regex_tokens"),
        F.round(avg_token_length(t), 6).alias("avg_token_len"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(quality_score(t), 6).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic marker-word language ID: (id, predicted_lang)."""
    return df.select(F.col(id_col), lang_id(F.col(text_col)).alias("predicted_lang"))


def fingerprints(df: DataFrame, text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """Content fingerprints: md5 of normalized text + winnowing-style
    min-hash of char k-grams (near-dup resistant). Per-row md5 chains are
    CPU-bound → fan the input across cores first."""
    from drune_spark.functions.partitioning import fan_out
    df = fan_out(df)
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        fingerprint_md5(t).alias("fingerprint"),
        rolling_min_fingerprint(t, k).alias("rolling_fingerprint"),
    )
