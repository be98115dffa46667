"""Single-pass data-quality engine.

The reference evaluates each rule with two ``df.filter`` + eager
``.count()`` calls per rule per action — recomputing the source lineage
once per rule (reference: engines/spark/steps/validator.py:30-124,
core/quality/quality_manager.py:72-115). At 100 TB that is N full scans.

This engine instead:
1. builds ONE projection that appends every constraint as a boolean flag
   column (narrow; fused into whole-stage codegen),
2. persists the flagged frame once,
3. computes ALL failure counts in a single ``agg`` pass,
4. derives warn/drop/fail/set_null behavior from the flags:
   order warn → drop → fail (quality_manager.py:95-113); ``set_null``
   (declared-but-unimplemented in the reference) nulls the offending
   value instead of dropping the row,
5. writes one consolidated failure log in the reference's fixed schema
   ``(pipeline_name, validation_rule, failed_column, failed_value,
   log_timestamp, hash_key)`` (validator.py:47-61).

One scan, one shuffle-free flag pass, one aggregate — independent of the
number of rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drune_spark.config.models import ColumnSpec, SchemaSpec
from drune_spark.config.parsers import parse_rules
from drune_spark.quality.rules import RuleRegistry


class ConstraintError(Exception):
    """Raised when any on_fail='fail' constraint has failing rows.

    Carries ``failures`` (the consolidated failure-log DataFrame) and
    ``flagged`` (the persisted flag frame, or None) so the caller can
    write the audit trail BEFORE the pipeline aborts — the reference
    logs failures prior to raising — and then release the cache."""

    failures: Optional[DataFrame] = None
    flagged: Optional[DataFrame] = None


@dataclass
class FlaggedConstraint:
    column: str
    rule_name: str
    rule_string: str
    on_fail: str
    flag_col: str
    params: dict = field(default_factory=dict)


@dataclass
class QualityResult:
    passed: DataFrame              # rows surviving drop/fail rules, set_null applied
    failures: Optional[DataFrame]  # consolidated failure log (reference schema)
    counts: dict[str, int] = field(default_factory=dict)  # flag_col -> failed rows
    _flagged: Optional[DataFrame] = None  # persisted intermediate

    def failed_total(self) -> int:
        return sum(self.counts.values())

    def unpersist(self) -> None:
        """Release the persisted flag frame once passed/failures have been
        materialized (written or collected). Re-using them afterwards
        recomputes from source — correct, just not cached."""
        if self._flagged is not None:
            self._flagged.unpersist()


def _flags_for_schema(schema: SchemaSpec) -> list[FlaggedConstraint]:
    flags: list[FlaggedConstraint] = []
    for col in schema.columns:
        for i, cons in enumerate(col.constraints):
            for j, parsed in enumerate(parse_rules(cons.rule)):
                flags.append(FlaggedConstraint(
                    column=col.name,
                    rule_name=parsed["function"],
                    rule_string=cons.rule,
                    on_fail=cons.on_fail,
                    flag_col=f"__dq_{col.name}_{i}_{j}_{parsed['function']}",
                    # Carry the parsed params directly: re-parsing by
                    # function name would return the FIRST occurrence's
                    # params for a rule chain reusing the same function.
                    params=parsed["params"],
                ))
    return flags


def apply_constraints(
    df: DataFrame,
    schema: SchemaSpec,
    pipeline_name: str = "pipeline",
    collect_counts: bool = True,
) -> QualityResult:
    flags = _flags_for_schema(schema)
    if not flags:
        return QualityResult(passed=df, failures=None)

    flagged = df
    for fc in flags:
        rule_fn = RuleRegistry.get(fc.rule_name)
        # NULL-safe: a rule evaluating to NULL (NULL input to a
        # comparison/isin/pattern) is a FAILURE, not a silent drop — it
        # must be counted, logged, and honored by on_fail just like an
        # explicit False. (not_null itself never yields NULL.)
        flagged = flagged.withColumn(
            fc.flag_col,
            F.coalesce(rule_fn(fc.column, fc.params), F.lit(False)),
        )

    # The flagged frame is read 2-3 times (counts, failures, output) —
    # persist once so the scan+flag work is not recomputed. Streaming
    # frames can't persist (each micro-batch is its own plan).
    if not flagged.isStreaming:
        flagged = flagged.persist()

    counts: dict[str, int] = {}
    if collect_counts:
        row = flagged.agg(*[
            F.sum(F.when(~F.col(fc.flag_col), 1).otherwise(0)).alias(fc.flag_col)
            for fc in flags
        ]).collect()[0]
        counts = {fc.flag_col: int(row[fc.flag_col] or 0) for fc in flags}

    # Consolidated failure log in the reference's fixed schema.
    has_hash = "hash_key" in df.columns
    failure_frames = []
    for fc in flags:
        failure_frames.append(
            flagged.filter(~F.col(fc.flag_col)).select(
                F.lit(pipeline_name).alias("pipeline_name"),
                F.lit(fc.rule_string).alias("validation_rule"),
                F.lit(fc.column).alias("failed_column"),
                F.col(fc.column).cast("string").alias("failed_value"),
                F.current_timestamp().alias("log_timestamp"),
                (F.col("hash_key") if has_hash else F.lit(None).cast("string")
                 ).alias("hash_key"),
            )
        )
    failures = failure_frames[0]
    for frame in failure_frames[1:]:
        failures = failures.unionByName(frame)

    # set_null: null the offending value, keep the row.
    out = flagged
    for fc in flags:
        if fc.on_fail == "set_null":
            out = out.withColumn(
                fc.column,
                F.when(F.col(fc.flag_col), F.col(fc.column)).otherwise(F.lit(None)),
            )
    # drop + fail rules remove failing rows from the output...
    removing = [fc for fc in flags if fc.on_fail in ("drop", "fail")]
    for fc in removing:
        out = out.filter(F.col(fc.flag_col))
    out = out.drop(*[fc.flag_col for fc in flags])

    # ...and fail rules abort the pipeline if anything failed. The
    # failure frame and persisted flag frame ride on the exception so
    # the caller can write the audit log first, then unpersist.
    if collect_counts:
        for fc in flags:
            if fc.on_fail == "fail" and counts.get(fc.flag_col, 0) > 0:
                err = ConstraintError(
                    f"constraint '{fc.rule_string}' on '{fc.column}' failed "
                    f"for {counts[fc.flag_col]} rows"
                )
                err.failures = failures
                err.flagged = flagged if not df.isStreaming else None
                raise err

    return QualityResult(passed=out, failures=failures, counts=counts,
                         _flagged=flagged)
