"""Step registry + sequential runner.

Reproduces the reference's StepManager semantics (reference:
src/drune/core/steps/step_manager.py:14-99): steps registered by
``(engine, step_type)`` — here the engine axis is always ``spark`` so the
key is just the type — run in declared order, each receiving the named
input DataFrames plus the current target DataFrame and returning the
next target. ``stop_at`` supports breakpoint-style debugging with
re-entry; ``reset`` clears progress (core/pipeline.py:52-73).

Everything between steps is one lazy Catalyst plan: the runner never
triggers an action, so N steps still compile to a single optimized job.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession


class StepRegistry:
    _steps: dict[str, type["Step"]] = {}

    @classmethod
    def register(cls, step_type: str):
        def deco(klass: type["Step"]) -> type["Step"]:
            cls._steps[step_type] = klass
            return klass
        return deco

    @classmethod
    def get(cls, step_type: str) -> type["Step"]:
        if step_type not in cls._steps:
            raise KeyError(
                f"unknown step type '{step_type}' (known: {sorted(cls._steps)})"
            )
        return cls._steps[step_type]

    @classmethod
    def known(cls) -> list[str]:
        return sorted(cls._steps)


class Step:
    """Base step: subclass and implement ``execute(inputs, current, **params)``.

    ``inputs`` is the dict of named source DataFrames; ``current`` is the
    running target (output of the previous step, or None before the first).
    """

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name

    def execute(
        self,
        inputs: dict[str, DataFrame],
        current: Optional[DataFrame],
        **params: Any,
    ) -> DataFrame:
        raise NotImplementedError

    def pick_input(
        self,
        inputs: dict[str, DataFrame],
        current: Optional[DataFrame],
        source: Optional[str],
    ) -> DataFrame:
        df = inputs[source] if source else current
        if df is None:
            raise ValueError(
                f"step '{self.name}' has no input (no prior step output and "
                f"no 'source' param)"
            )
        return df


class StepRunner:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._position = 0

    def reset(self) -> None:
        self._position = 0

    def run(
        self,
        steps: list,  # list[StepConfig]
        inputs: dict[str, DataFrame],
        current: Optional[DataFrame],
        stop_at: Optional[str] = None,
    ) -> Optional[DataFrame]:
        for i in range(self._position, len(steps)):
            cfg = steps[i]
            step = StepRegistry.get(cfg.type)(self.spark, cfg.name)
            current = step.execute(inputs, current, **cfg.params)
            self._position = i + 1
            if stop_at is not None and cfg.name == stop_at:
                break
        return current
