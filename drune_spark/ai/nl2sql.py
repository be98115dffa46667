"""Deterministic NL→SQL engine over the glossary semantic layer.

Pipeline (all lexical, no RNG, no network — results are reproducible
and auditable, which matters more than linguistic coverage for a data
platform):

1. **Concept retrieval** — score each glossary concept by weighted token
   overlap between the question and the concept's name, description,
   metric/segment/dimension vocabulary (the stand-in for the reference's
   vanna+chromadb embedding retrieval; same contract, no dependencies).
2. **Metric matching** — metric names match by their word forms
   (``total_revenue`` ⇔ "total revenue"); aggregate intents map to
   formula shapes ("how many"/"number of" → a COUNT metric).
3. **Segment matching** — segment names appearing as words.
4. **Dimension matching** — "by/per/for each <dimension>" phrases
   against declared dimensions (word-form match).
5. **Top-k** — "top/best/largest N" → ORDER BY first metric DESC,
   LIMIT N (ties broken by the dimension for determinism).

The composed query funnels through ``Glossary.compile_sql`` so every
metric formula / segment predicate stays governed by the glossary —
the engine never fabricates SQL fragments. An optional ``llm_fn``
callable (question, schema_hint) -> sql lets deployments plug a model
in; its output is validated to reference only glossary tables.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from drune_spark.glossary import Glossary

_STOPWORDS = {
    "the", "a", "an", "of", "for", "in", "on", "at", "to", "and", "or",
    "is", "are", "was", "were", "what", "which", "show", "me", "give",
    "list", "with", "their", "each", "all",
}
_COUNT_HINTS = {"count", "many", "number"}
_TOPK_RE = re.compile(r"\b(?:top|best|largest|highest)\s+(\d+)\b")


class NLQueryError(ValueError):
    """Question could not be resolved against the glossary. The message
    lists what WAS understood — the caller can show it to the user."""


@dataclass
class ParsedQuestion:
    concept: str
    metrics: list[str]
    segment: Optional[str] = None
    group_by: list[str] = field(default_factory=list)
    limit: Optional[int] = None
    sql: str = ""


def _stem(w: str) -> str:
    """Crude plural folding — enough for 'orders'/'priorities' to match
    their glossary identifiers; anything smarter belongs in llm_fn."""
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("s") and not w.endswith("ss") and len(w) > 3:
        return w[:-1]
    return w


def _words(text: str) -> list[str]:
    return [_stem(w) for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _word_form(identifier: str) -> list[str]:
    """total_revenue -> ['total', 'revenue']; o_orderpriority ->
    ['o', 'orderpriority']."""
    return _words(identifier.replace("_", " "))


def _phrase_in(words: list[str], phrase: list[str]) -> bool:
    if not phrase:
        return False
    n = len(phrase)
    return any(words[i:i + n] == phrase for i in range(len(words) - n + 1))


class NLQueryEngine:
    def __init__(self, glossary: Glossary,
                 llm_fn: Optional[Callable[[str, str], str]] = None):
        self.glossary = glossary
        self.llm_fn = llm_fn

    # -- concept retrieval ------------------------------------------------
    def _score_concept(self, words: list[str], name: str) -> float:
        c = self.glossary.model.concepts[name]
        vocab: dict[str, float] = {}
        for w in _word_form(name):
            vocab[w] = max(vocab.get(w, 0.0), 3.0)      # the name itself
        for w in _words(c.description or ""):
            if w not in _STOPWORDS:
                vocab[w] = max(vocab.get(w, 0.0), 2.0)
        for ident in list(c.metrics) + list(c.segments) + c.dimensions:
            for w in _word_form(ident):
                vocab[w] = max(vocab.get(w, 0.0), 1.0)
        return sum(vocab.get(w, 0.0) for w in set(words))

    def resolve_concept(self, question: str) -> str:
        words = _words(question)
        scored = sorted(
            ((self._score_concept(words, name), name)
             for name in self.glossary.model.concepts),
            key=lambda t: (-t[0], t[1]),
        )
        if not scored or scored[0][0] <= 0:
            raise NLQueryError(
                f"no glossary concept matches the question; known concepts: "
                f"{sorted(self.glossary.model.concepts)}"
            )
        return scored[0][1]

    # -- question parsing -------------------------------------------------
    def parse(self, question: str) -> ParsedQuestion:
        concept = self.resolve_concept(question)
        c = self.glossary.model.concepts[concept]
        words = _words(question)

        metrics = [m for m in c.metrics if _phrase_in(words, _word_form(m))]
        if not metrics and (set(words) & _COUNT_HINTS):
            counts = [m for m, f in c.metrics.items()
                      if f.strip().upper().startswith("COUNT")]
            metrics = counts[:1]
        if not metrics:
            raise NLQueryError(
                f"no metric of '{concept}' matches; known metrics: "
                f"{sorted(c.metrics)}"
            )

        segment = next(
            (s for s in sorted(c.segments) if _phrase_in(words, _word_form(s))),
            None,
        )

        group_by: list[str] = []
        for dim in c.dimensions:
            # Column names like o_orderpriority also answer to their
            # last word and to "order <suffix>" ("by order priority",
            # "per priority").
            forms = [_word_form(dim)]
            tail = _word_form(dim)[-1]
            if tail.startswith("order") and len(tail) > 5:
                forms.append(["order", tail[5:]])
                forms.append([tail[5:]])
            else:
                forms.append([tail])
            if any(_phrase_in(words, f) for f in forms):
                group_by.append(dim)

        m = _TOPK_RE.search(question.lower())
        limit = int(m.group(1)) if m else None
        if limit is not None and not group_by:
            raise NLQueryError(
                f"'top {limit}' needs a dimension; declared dimensions of "
                f"'{concept}': {c.dimensions}"
            )

        sql = self.glossary.compile_sql(concept, metrics, segment,
                                        group_by or None)
        if limit is not None:
            order_cols = [f"{metrics[0]} DESC"] + group_by
            sql += f" ORDER BY {', '.join(order_cols)} LIMIT {limit}"
        return ParsedQuestion(concept=concept, metrics=metrics,
                              segment=segment, group_by=group_by,
                              limit=limit, sql=sql)

    # -- execution --------------------------------------------------------
    def to_sql(self, question: str) -> str:
        if self.llm_fn is not None:
            tables = {c.table for c in self.glossary.model.concepts.values()}
            hint = "; ".join(
                f"{n}: table {c.table}, metrics {sorted(c.metrics)}"
                for n, c in sorted(self.glossary.model.concepts.items())
            )
            sql = self.llm_fn(question, hint)
            used = set(re.findall(r"\bFROM\s+([\w.]+)", sql, re.IGNORECASE))
            if not used or not used <= tables:
                raise NLQueryError(
                    f"llm_fn produced SQL over undeclared tables {used - tables}"
                )
            return sql
        return self.parse(question).sql

    def ask(self, spark: SparkSession, question: str) -> DataFrame:
        return spark.sql(self.to_sql(question))
