"""Market-basket association rules (pairwise A-priori).

Support / confidence / lift over item pairs co-occurring in a basket —
the retail sibling of the text collocation miner
(text_analysis.py::collocations): same pair-fanout economics, but with
the full rule statistics (directional confidence) instead of symmetric
lift only.

Scale shape: baskets reduce to distinct (basket, item) before the
self-join, so pair fan-out is k^2 per basket with k = DISTINCT items
per basket (bounded by the item-domain size, here brands), never raw
line count. Item-frequency tables are item-domain-sized and broadcast
back onto the pair frame. All statistics are integers (counts and
ppm-scaled integer-division ratios), so ranking is exact and
parallelism-invariant on any engine.

Reference analog: none in drune (aggregate step is plain GROUP BY);
this is the classic data-mining operator a feature-engineering
pipeline expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
) -> DataFrame:
    """Directional association rules a -> b over item pairs (a < b kept
    once; both directions' confidences emitted as conf_ab/conf_ba).

    Returns (item_a, item_b, n_ab, n_a, n_b, conf_ab_ppm, conf_ba_ppm,
    lift_ppm) — all integers; *_ppm are floor(1e6 * ratio).
    """
    # The distinct item set feeds FOUR consumers (totals, frequencies,
    # both sides of the pair self-join); without persist each branch
    # re-runs the scan+distinct (measured: 10 exchanges). One
    # materialization, four InMemoryTableScans. The cache outlives the
    # caller's action by design (unpersisting first would re-trigger
    # the self-referencing-DAG recompute); MEMORY_AND_DISK blocks are
    # LRU-evicted, the intended backstop for long-lived sessions.
    items = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct().persist()
    # Scalar total as a broadcast 1-row frame — no driver action, the
    # whole rule table stays one lazy plan (same pattern as zorder's
    # min/max normalization join).
    totals = items.agg(F.countDistinct("b").alias("n_baskets"))

    freq = items.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    a, c = items.alias("a"), items.alias("c")
    pairs = (
        a.join(c, "b")
        .filter(F.col("a.i") < F.col("c.i"))
        .groupBy(
            F.col("a.i").alias("item_a"), F.col("c.i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_support)
    )
    fa = freq.select(F.col("i").alias("item_a"), F.col("n_i").alias("n_a"))
    fb = freq.select(F.col("i").alias("item_b"), F.col("n_i").alias("n_b"))
    return (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a", "item_b", "n_ab", "n_a", "n_b",
            F.expr("n_ab * 1000000 div n_a").alias("conf_ab_ppm"),
            F.expr("n_ab * 1000000 div n_b").alias("conf_ba_ppm"),
            F.expr(
                "n_ab * n_baskets * 1000000 div (n_a * n_b)"
            ).alias("lift_ppm"),
        )
    )
