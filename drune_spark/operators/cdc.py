"""CDC / changelog application — reduce an ordered change stream to
final state (the ingestion primitive behind MERGE-based mirrors,
Debezium-style pipelines, and idempotent replays).

``cdc_latest`` keeps, per key, the payload of the LAST change by a
total order (event time + a unique tie-breaker), then drops keys whose
last operation is a delete/tombstone. Spark-first shape: one shuffle on
the key, ``row_number() == 1`` over a descending window — which Catalyst
rewrites to WindowGroupLimit with a PARTIAL limit below the Exchange, so
every map task forwards at most one candidate row per key instead of the
key's full history (pinned in tests/test_plans.py). At 100 TB the
changelog never sorts globally and the shuffle carries one row per
(partition, key).

Related reference surface: the writers' merge upsert
(/root/reference/src/drune/engines/spark/steps/writer.py:37-70) applies
a PRE-reduced batch; this operator is the missing reduction step for
multi-change batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_latest(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str | None = None,
    delete_ops: tuple[str, ...] = ("delete",),
) -> DataFrame:
    """Final state per key: the last row in ``order_cols`` order
    (descending, later wins; include a unique column last for a total
    order), minus keys whose last op is a tombstone."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        latest = latest.filter(~F.col(op_col).isin(*delete_ops))
    return latest
