"""Incremental view maintenance (IVM) for JOIN views.

Completes the IVM family next to the aggregate path
(timeseries.py day_rollup / refresh_day_rollup — the invalidation-log
continuous-aggregate pattern): a materialized equi-join view absorbs a
batch of late/new rows on EITHER side without recomputing the join.

The delta algebra (classic counting-free insert-only IVM — Blakeley,
Larson & Tompa 1986, "Efficiently updating materialized views"):

    (L ∪ ΔL) ⋈ (R ∪ ΔR)
        = L ⋈ R                      -- the materialized base view
        ∪ ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR   -- the refresh delta

Inner equi-join over disjoint base/delta splits is an exact bag
partition — no row is produced twice, no dedup step is needed.

Scale shape: the three delta terms each have one Δ-sized side, so a
refresh shuffles O(|Δ|) rows (and broadcasts Δ outright when it fits),
never |L| or |R| — refresh cost tracks ingest size, not view size, the
same contract refresh_day_rollup makes for rollups. In production the
base view is a materialized table (the W5 merge / W3
partition-overwrite sinks) and only the delta union runs per batch;
`incremental_join_refresh` recomputes the base here so correctness
gates stay self-contained (full-recompute oracle == base ∪ delta IS
the IVM claim).

No counterpart in /root/reference (native engine has no incremental
materialization surface); driver-mandated large-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_refresh_delta(
    base_left: DataFrame,
    base_right: DataFrame,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """The rows an insert batch (delta_left, delta_right) ADDS to the
    materialized inner equi-join of (base_left ⋈ base_right). Exact:
    appending these to the base view equals the full recompute over
    the unioned inputs (disjoint splits assumed, bag semantics)."""
    on = [on] if isinstance(on, str) else list(on)
    return (
        delta_left.join(base_right, on)
        .unionByName(base_left.join(delta_right, on))
        .unionByName(delta_left.join(delta_right, on))
    )


def incremental_join_refresh(
    base_left: DataFrame,
    base_right: DataFrame,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Base view ∪ refresh delta — the state of the materialized join
    view AFTER absorbing the batch. Equals the full recompute
    (L∪ΔL) ⋈ (R∪ΔR) exactly; the gate's oracle is that recompute."""
    on_l = [on] if isinstance(on, str) else list(on)
    base = base_left.join(base_right, on_l)
    return base.unionByName(
        join_refresh_delta(base_left, base_right, delta_left, delta_right, on_l)
    )


def apply_agg_delta(
    view: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str = "n",
    sum_col: str = "total",
    sign_col: str = "sign",
    val_col: str = "val",
) -> DataFrame:
    """Retraction-aware aggregate view maintenance — the third IVM
    member (rollup_refresh rewrites invalidated partitions on INSERTS;
    incremental_join_refresh appends join deltas; this absorbs a
    signed changelog with DELETES and UPDATES, the CDC shape): the
    delta is (keys..., sign ∈ {+1,−1}, val); an update is a (−old,
    +new) pair. The maintained view is the count/sum pair per key —
    both are ABELIAN-GROUP aggregates (invertible), which is exactly
    the class retraction IVM covers without re-reading base data
    (MIN/MAX are not invertible: a retracted minimum forces a
    per-group rescan — the documented boundary of this operator).

        n'   = n + Σ sign        (group drops when n' = 0)
        sum' = sum + Σ sign·val

    One delta aggregate + one outer merge on the group keys — refresh
    cost is O(|Δ| + touched groups), never view size. Exact integers
    throughout; the gate's oracle recomputes the view from the final
    base state with no knowledge of the changelog.
    """
    d = delta.groupBy(*keys).agg(
        F.sum(F.col(sign_col)).cast("long").alias("__dn"),
        F.sum(F.col(sign_col) * F.col(val_col)).cast("long").alias("__dv"),
    )
    merged = view.join(d, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).cast("long").alias(count_col),
        (
            F.coalesce(F.col(sum_col), F.lit(0))
            + F.coalesce(F.col("__dv"), F.lit(0))
        ).cast("long").alias(sum_col),
    )
    return merged.filter(F.col(count_col) > 0)
