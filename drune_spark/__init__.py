"""drune_spark — a PySpark-native declarative data-pipeline engine.

Re-expresses the semantics of samps-felipe/drune (declarative YAML ETL
with schema application, data-quality constraints, steps, SCD2 writes)
on idiomatic Spark DataFrame plans, plus large-scale LLM-data operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"

from drune_spark.pipeline import Pipeline, Project  # noqa: F401
from drune_spark.session import get_spark, tune_session  # noqa: F401
