"""Feature engineering for ML training pipelines (driver extension).

``feature_hash`` is the hashing trick (Weinberger et al., ICML'09 —
sklearn ``HashingVectorizer`` semantics): token → fixed bucket by hash,
signed count per (doc, bucket). The vectorizer needs NO vocabulary pass,
no fitted state, and a fixed output dimensionality — which is why it is
the standard text featurizer at corpus scale: any executor can vectorize
any shard independently, and two corpora vectorize into the same space
without coordinating a vocabulary.

No counterpart in /root/reference (native engine has no ML-prep surface);
driver-mandated LLM-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drune_spark.functions.hashes import md5_u32
from drune_spark.functions.text import tokens


def feature_hash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 256,
    signed: bool = True,
) -> DataFrame:
    """Sparse hashed bag-of-words: (doc, bucket, value) triples.

    bucket = md5_u32(token) % n_buckets; the sign bit comes from the
    NEXT bit of the same hash (1 − 2·((h div n_buckets) mod 2)), the
    standard collision-debiasing trick — colliding tokens cancel in
    expectation instead of inflating the bucket. ``signed=False`` gives
    plain counts. All-integer md5 math → engine-portable bit-for-bit.

    Plan shape at 100 TB: one narrow explode + one aggregate keyed on
    (doc, bucket) with map-side partial combine; the output is ≤
    min(tokens, n_buckets) rows per doc. No vocabulary broadcast, no
    fitted model, no Python — whole-stage codegen end to end.
    """
    tok = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    h = md5_u32(F.col("token"))
    withb = tok.select(
        "doc",
        (h % n_buckets).cast("int").alias("bucket"),
        (
            F.expr(f"1 - 2 * (({md5_u32_sql('token')} div {n_buckets}) % 2)")
            if signed else F.lit(1)
        ).cast("long").alias("sign"),
    )
    return (
        withb.groupBy("doc", "bucket")
        .agg(F.sum("sign").alias("value"))
    )


def hash_udf_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Arrow-vectorized SCALAR pandas_udf demonstration with an exact
    oracle: md5 hex + utf-8 byte length computed in Python over Arrow
    batches. md5 of the utf-8 bytes is engine-universal, so this is the
    one Python-UDF shape a SQL oracle can verify bit-for-bit — proving
    the Arrow transfer itself is lossless for string columns.

    This is the SLOW-PATH escape hatch pattern (the fast path for these
    exact functions is F.md5/F.octet_length — see the plan note in
    PERF.md): when a transform genuinely needs Python (tokenizers,
    codecs), a scalar ``@pandas_udf`` processes whole Arrow batches —
    ~10-100× the throughput of a row-at-a-time Python UDF — and chains
    inside the surrounding codegen stage without extra shuffles.
    """
    import hashlib

    from pyspark.sql.functions import pandas_udf

    # NB: no parameter annotations — ``from __future__ import
    # annotations`` stringifies them and pandas_udf's hint inference
    # rejects string hints; the explicit return type is authoritative.
    @pandas_udf("string")
    def md5_py(s):
        return s.map(
            lambda x: hashlib.md5(x.encode("utf-8")).hexdigest()
        )

    @pandas_udf("long")
    def byte_len_py(s):
        return s.map(lambda x: len(x.encode("utf-8")))

    return df.select(
        F.col(id_col),
        md5_py(F.col(text_col)).alias("h"),
        byte_len_py(F.col(text_col)).alias("n_bytes"),
    )


def md5_u32_sql(col: str) -> str:
    """SQL text of ``md5_u32`` (Spark dialect) — kept here so the sign
    expression and any oracle mirror derive from one definition."""
    return f"CAST(conv(substring(md5({col}), 1, 8), 16, 10) AS LONG)"


def label_encode(df: DataFrame, col: str) -> DataFrame:
    """Frequency-ordered dense integer codes for a categorical column —
    the StringIndexer contract (most frequent category = code 1), made
    deterministic by breaking count ties on the value itself.

    One hash aggregate reduces rows to (value, count) cells, then a
    single-partition row_number window assigns codes over the CELLS
    only — bounded by category cardinality, never row count (the same
    cells-not-rows discipline as skew_keys/label vocabularies). Apply
    the mapping back to rows via a broadcast join on the value.

    Returns (value_col, n, code); code is 1-based INT.
    """
    from pyspark.sql import Window

    cells = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col(col).asc())
    return cells.withColumn(
        "code", F.row_number().over(w).cast("int")
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_int_col: str,
    id_cols: list[str],
) -> DataFrame:
    """Leave-one-out target encoding with exact integer arithmetic —
    the ML feature transform where each row gets its category's mean
    target EXCLUDING itself (the standard leakage guard), as an
    integer division of pre-scaled units.

    One hash agg builds (category, sum, count) cells — map-side
    partial, mergeable — which broadcast back onto the scan, so rows
    never shuffle: loo = (sum_g - x) div (n_g - 1). Groups of one have
    no leave-one-out mean → NULL (caller imputes the global prior).
    Integer sums and floor division are parallelism-invariant, unlike
    the float mean every naive implementation uses.

    Returns id_cols + (cat_col, n_cat, loo_enc).
    """
    cells = df.groupBy(cat_col).agg(
        F.sum(target_int_col).alias("__sum_g"),
        F.count(F.lit(1)).alias("n_cat"),
    )
    return df.join(F.broadcast(cells), cat_col).select(
        *id_cols, cat_col, "n_cat",
        F.when(
            F.col("n_cat") > 1,
            F.expr(f"(__sum_g - {target_int_col}) div (n_cat - 1)"),
        ).alias("loo_enc"),
    )


def woe_encode(
    df: DataFrame,
    category_col: str,
    label_col: str,
) -> DataFrame:
    """Weight-of-evidence encoding of a categorical feature against a
    binary label (the credit-scoring / feature-engineering standard):

        woe_c = ln( P(c | pos) / P(c | neg) )

    with half-count Laplace smoothing so empty cells stay finite.
    Exact cross-engine arithmetic: the smoothed odds ratio is formed
    from INTEGER counts doubled to absorb the +0.5 smoothing —
    num = (2·pos_c+1)·(2·NEG+1), den = (2·neg_c+1)·(2·POS+1) — and the
    only float work is ONE shared-op-order chain ln(num/den) floored
    to integer micro units (ln is libm-bit-identical across engines;
    the zipf_fit precedent).

    One category-cell aggregate + a broadcast 1-row totals frame; rows
    never shuffle twice. Returns (category_col, n_pos, n_neg,
    woe_micro).
    """
    y = F.col(label_col).cast("int")
    cells = df.groupBy(category_col).agg(
        F.sum(y).cast("long").alias("n_pos"),
        F.sum(1 - y).cast("long").alias("n_neg"),
    )
    totals = df.agg(
        F.sum(y).cast("long").alias("t_pos"),
        F.sum(1 - y).cast("long").alias("t_neg"),
    )
    return cells.join(F.broadcast(totals)).select(
        category_col,
        "n_pos",
        "n_neg",
        F.floor(
            F.log(
                ((2 * F.col("n_pos") + 1) * (2 * F.col("t_neg") + 1))
                .cast("double")
                / ((2 * F.col("n_neg") + 1) * (2 * F.col("t_pos") + 1))
                .cast("double")
            )
            * 1000000.0
        ).cast("long").alias("woe_micro"),
    )
