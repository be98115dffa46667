"""Graph operators: weighted transition graphs and integer-exact
PageRank.

``transition_edges`` builds a weighted directed graph from an event
log: one edge (src → dst, weight = occurrences) per consecutive pair
within a key's (order_cols)-sorted sequence — one window pass, shuffle
keyed on the sequence key.

``pagerank_int`` is Lloyd-style iterative PageRank in EXACT INTEGER
arithmetic so every engine agrees bit-for-bit: ranks are scaled by
``scale`` (default 10^6); a node's contribution along an edge is
``(rank * w) div W_out`` (integer floor division, nonnegative), and
the damped update is ``new = (100-d)*scale div 100 + d*Σcontrib div
100``. Integer sums are order-independent, so there is no FP
accumulation-order hazard at any parallelism — the property that makes
the result oracle-checkable after any number of distributed rounds.
Dangling-node mass is dropped (the standard simplification); nodes
with no in-edges settle at the teleport base.

Each round is one (ranks ⋈ edges on src) join + one dst-keyed sum —
both shuffles on the node key, so a real deployment co-partitions
ranks and edges once and every round reuses the partitioning
(plus a persist per round to cut lineage; at 5 nodes here the frames
are trivially broadcast).

No counterpart in /root/reference; driver-mandated analytics
extension (iterative graph algorithm beyond connected_components'
label propagation — dedup.py:212).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_edges(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    node_col: str,
) -> DataFrame:
    """(src, dst, w): consecutive ``node_col`` transitions within each
    key's ordered sequence, weighted by occurrence count."""
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    pairs = df.select(
        F.col(node_col).alias("src"),
        F.lead(node_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("w")
    )


def pagerank_int(
    edges: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """(node, rank_int) after ``n_iters`` integer-exact damped rounds
    from a uniform start of ``scale`` per node."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    e = edges.join(out_w, "src")
    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.select(
        "node", F.lit(int(scale)).cast("long").alias("rank_int")
    )
    for _ in range(n_iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_int * w) div w_out").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c_sum"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_pct} * coalesce(c_sum, 0)) div 100"
                )
            ).cast("long").alias("rank_int"),
        )
    return ranks
