"""NL→SQL over the glossary semantic layer.

The reference declares an ``ai/`` module plus vanna + chromadb
dependencies but ships it EMPTY (reference: src/drune/ai/__init__.py,
pyproject.toml:27,50-52). This package implements the consumer the
reference gestures at, deterministically and dependency-free:

- :class:`drune_spark.ai.nl2sql.NLQueryEngine` — resolves a natural-
  language question against the glossary (concept retrieval by lexical
  overlap, metric/segment/dimension matching, top-k parsing) and
  compiles it to Spark SQL through :class:`drune_spark.glossary.Glossary`.
- An optional ``llm_fn`` hook accepts a callable for deployments that
  want a real model in the loop; everything here works without one.
"""

from drune_spark.ai.nl2sql import NLQueryEngine, NLQueryError, ParsedQuestion

__all__ = ["NLQueryEngine", "NLQueryError", "ParsedQuestion"]
