"""Learned linear quality/language filters — the trainable complement
to the heuristic text screens (text_analysis.py): a batch perceptron
trained ON the cluster in exact integer arithmetic.

Real LLM-data pipelines graduate from hand-tuned heuristics to a
trained linear filter (the fastText-style quality classifier of the
CCNet/GPT-3 lineage). The distributed shape of that training is
full-batch updates: each round is ONE corpus aggregate (map-side
partial) that sums feature vectors of currently-misclassified rows,
plus a 1-row driver fetch for the updated weights (the kmeans/bpe
bounded-control-fetch discipline) — rows never shuffle, the model
rides as literals.

The batch perceptron update w += Σ_{y·(w·x) ≤ 0} y·x is ALL-INTEGER
(no learning rate, no sigmoid, no division), so every engine replays
it digit-for-digit: the DuckDB oracle unrolls one CTE per round. That
determinism is the point — a float logistic loss would make the
trained weights parallelism-dependent.

Overflow envelope: with milli-scaled features (|x| ≤ 1000, d+1 of
them) and n rows, |w| ≤ rounds·n·1000 and |w·x| ≤
(d+1)·rounds·n·10⁶ — under 2⁶³ through n ≈ 10¹¹; beyond that, train
on a hash sample (sampling.py) or rescale features to centi.

No counterpart in /root/reference; driver-mandated training-data
extension (learned quality filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def batch_perceptron(
    spark: SparkSession,
    feats: DataFrame,
    x_cols: list[str],
    y_col: str,
    rounds: int = 3,
) -> DataFrame:
    """Train a batch perceptron on integer features: per round, sum
    y·x over rows the current weights misclassify (y·(w·x) ≤ 0) and
    add the sum to w. ``y_col`` must be ±1; weights start at 0 (round
    1 therefore updates on every row — the classic initialization).

    Returns one row per round: (round, err_n, w_<feature>...) with the
    weights AFTER that round's update — the full training trajectory,
    so convergence (err_n falling) is itself part of the checked
    output. The feature frame is persisted once (iterative-operator
    persist rule); each round is one aggregate + a 1-row fetch.
    """
    f = feats.select(*x_cols, F.col(y_col).alias("__y")).persist()
    w = [0] * len(x_cols)
    out_rows = []
    for r in range(1, rounds + 1):
        margin = sum(
            F.col(c) * F.lit(int(w[i])) for i, c in enumerate(x_cols)
        )
        mis = f.filter((F.col("__y") * margin) <= 0)
        row = mis.agg(
            F.count(F.lit(1)).alias("err"),
            *[
                F.coalesce(F.sum(F.col("__y") * F.col(c)), F.lit(0))
                .alias(f"g{i}")
                for i, c in enumerate(x_cols)
            ],
        ).collect()[0]  # 1-row control fetch (kmeans.py shape)
        w = [w[i] + int(row[f"g{i}"]) for i in range(len(x_cols))]
        out_rows.append((r, int(row["err"]), *w))
    f.unpersist()
    schema = "round int, err_n bigint, " + ", ".join(
        f"w_{c} bigint" for c in x_cols
    )
    from drune_spark.functions.partitioning import local_frame
    return local_frame(spark, out_rows, schema)
