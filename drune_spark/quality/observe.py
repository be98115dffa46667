"""Single-pass pipeline observability via ``Dataset.observe``.

``observe`` attaches accumulator-backed metrics (CollectMetricsExec) to
a frame so ONE action yields both the pipeline result and its audit
numbers — the zero-extra-scan alternative to re-aggregating the input
for a validation log (sinks/writers.py W7), and the only way to get
exact counts out of a STREAMING pass (per micro-batch via
StreamingQueryListener) where a second batch aggregation would race
the source. At 100 TB the metrics ride the existing scan as partial
aggregates; no shuffle, no second job.

Restrictions (Spark contract): metric expressions must be aggregates
over the observed frame, no DISTINCT, no window. Reference parity:
the reference's validator re-aggregates the validated frame for its
log (/root/reference/src/drune/engines/spark/steps/validator.py);
observe is the Spark-first upgrade — same numbers, zero extra scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession


def observed_pass(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach ``metrics`` to ``df`` under ``name``. The returned frame
    is the SAME rows; the Observation resolves after the first action
    on it (``Observation.get`` blocks until then)."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def metrics_frame(spark: SparkSession, obs: Observation) -> DataFrame:
    """The resolved metrics as a 1-row frame (column order = metric
    declaration order) — joinable/unionable into audit sinks."""
    got = obs.get
    return spark.createDataFrame([tuple(got[k] for k in got)], list(got))
