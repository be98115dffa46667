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
