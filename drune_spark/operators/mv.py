"""Incremental materialized-view maintenance for additive join+agg
views.

The continuous-aggregate refresh in ``timeseries.py`` is keyed by
calendar partitions; this is the general form for ADDITIVE measures
(SUM/COUNT): a view `V = agg(fact ⋈ dims)` absorbs a batch of new fact
rows by aggregating ONLY the delta and merging per-key partial sums —
`V' = merge(V, agg(delta ⋈ dims))` — instead of recomputing over the
full fact history. Work ∝ delta size + touched keys; the fact table is
never rescanned.

Correctness rests on the measures forming a commutative monoid
(DECIMAL/long sums and counts here: exact, order-free). Non-additive
measures need mergeable summaries instead — COUNT(DISTINCT) via the
HLL/KMV register frames in ``sketches.py`` (max-merge / re-truncation),
percentiles via t-digest — same merge discipline, approximate values.
MIN/MAX are insert-only-additive (merge = MIN/MAX) but cannot absorb
deletes; deletes for SUM/COUNT arrive as negative-measure delta rows
(the CDC convention of ``cdc.py``).

At 100 TB: the delta aggregate is map-side partial; the merge shuffles
only (key, partial-sum) cells from the delta plus the touched MV keys.
Persist the MV partitioned by its key family and the merge becomes a
key-pruned MERGE (sinks/writers.py W5).

No counterpart in /root/reference; driver-mandated extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mv_merge(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Merge a delta aggregate into an additive MV: per-key sums of
    partial sums. Columns must align by name; both inputs carry
    (keys..., sum_cols...)."""
    return (
        mv.select(*keys, *sum_cols)
        .unionByName(delta.select(*keys, *sum_cols))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
