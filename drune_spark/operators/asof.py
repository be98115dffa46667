"""As-of (point-in-time) join — driver extension.

Spark has no built-in as-of join (pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` semantics): for each left row, attach the latest right row
with ``right.ts <= left.ts`` (backward direction) sharing the key.

Spark-first formulation — the union-window trick, not a range join:
tag both sides, union, and run ONE window per key ordered by
(ts, is_left) taking ``last(right_value, ignorenulls=true)``; right rows
sort before left rows at equal ts, so ties are inclusive. Cost = one
shuffle on the key + one per-key sort — the same cost as any grouped
window, with none of the O(n·m) blowup of an inequality-join fallback
(Spark would plan ``l.ts >= r.ts`` as BroadcastNestedLoop). At 100 TB
this shuffles each row once; skewed keys can salt the usual way.

Determinism: exact timestamp ordering; right side must be unique per
(key, ts) — pre-aggregate if not (the ASOF tie otherwise depends on
physical order in any engine).

No counterpart in /root/reference; mirrors DuckDB ``ASOF LEFT JOIN``
for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] = "user_id",
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join. Returns every left row plus, for each right
    value column c, ``c<suffix>`` from the latest right row at-or-before
    the left row's ``on`` time (same ``by`` key), and ``<on><suffix>``
    (the matched right timestamp). Unmatched → nulls. ``tolerance_us``
    null-outs matches further than that many microseconds back."""
    by_cols = [by] if isinstance(by, str) else list(by)
    rvals = [c for c in right.columns if c not in by_cols + [on]]
    overlap = set(rvals) & set(left.columns)
    if overlap:
        raise ValueError(f"right value columns collide with left: {overlap}")

    rtypes = dict(right.dtypes)
    ltype = dict(left.dtypes)[on]
    l2 = left.select(
        "*",
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(ltype).alias(f"__r_{on}"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in rvals],
    )
    r2 = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias("__is_left"),
        F.col(on).alias(f"__r_{on}"),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    for c in left.columns:
        if c not in by_cols + [on]:
            r2 = r2.withColumn(c, F.lit(None).cast(ltype if c == on else
                                                   dict(left.dtypes)[c]))
    unioned = l2.unionByName(r2.select(l2.columns))
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in [on] + rvals
        ],
    ).filter(F.col("__is_left") == 1)
    in_tol = F.lit(True)
    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"__m_{on}"))
        ) <= F.lit(tolerance_us)
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(
        F.when(in_tol, F.col(f"__m_{on}")).alias(f"{on}{suffix}")
    )
    out_cols += [
        F.when(in_tol, F.col(f"__m_{c}")).alias(f"{c}{suffix}")
        for c in rvals
    ]
    return filled.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval-containment join (left.ts ∈ [right.start, right.end])
    via time bucketing — the scale-safe plan for a predicate Spark would
    otherwise execute as BroadcastNestedLoopJoin.

    Each left row lands in exactly ONE bucket; each right interval
    explodes into the buckets it overlaps (⌈duration/bucket⌉ + 1 rows).
    An equi-join on the bucket then a residual containment filter gives
    exactly one output row per qualifying pair — no dedup needed,
    because a left row's single bucket meets a given interval at most
    once. Pick ``bucket_us`` near the typical interval length: shuffle
    volume is rows + intervals × avg_buckets, never |L|×|R|.
    """
    lb = left.withColumn(
        "__bucket",
        F.floor(F.unix_micros(F.col(left_ts)) / F.lit(bucket_us)),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(right_start)) / F.lit(bucket_us)),
                F.floor(F.unix_micros(F.col(right_end)) / F.lit(bucket_us)),
            )
        ),
    )
    return (
        lb.join(rb, "__bucket")
        .filter(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) <= F.col(right_end))
        )
        .drop("__bucket")
    )
