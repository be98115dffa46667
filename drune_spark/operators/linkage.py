"""Blocked fuzzy record linkage — approximate string matching at join
scale.

A naive fuzzy join is |L|×|R| edit-distance evaluations; no engine
survives that at 100 TB. The standard decomposition (Fellegi-Sunter /
blocking literature) is:

1. **Blocking**: generate cheap candidate keys per record (here:
   character bigrams, like the n-gram shingle blocking used by
   ``dedup.py``) and equi-join on them — candidates shrink from
   |L|×|R| to pairs sharing at least one *uncommon* bigram.
2. **Hot-block cap**: a bigram occurring in more than ``max_block_df``
   right-side records ("00" in zero-padded ids, "th" in English) is
   dropped from blocking — same m² bound as ``dedup.max_shingle_df``;
   matches whose shared bigrams are all hot are a documented recall
   trade, not a correctness bug (real deployments add a second
   blocking key family, e.g. phonetic codes).
3. **Residual verify**: exact ``levenshtein`` on the candidate pairs
   only, keep pairs within ``max_dist``.
4. **Best-match pick**: per left record, the (distance, right-id)
   minimum via the rank-limit-pushdown window (WindowGroupLimit keeps
   the per-left top-1 partial below the shuffle).

Shuffles carry (bigram, id, name) triples and candidate pairs — never
full records. Both the blocking construction and the distance are
engine-portable (DuckDB: range + substr + levenshtein), so the DuckDB
oracle replays the algorithm verbatim.

No counterpart in /root/reference; driver-mandated entity-resolution
extension over the synthetic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bigrams(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """Distinct (id, name, bigram) rows; bigram i = substr(name, i, 2)
    for i in 1..len-1 (expressed as explode(sequence) so the identical
    construction runs as DuckDB range+substr)."""
    return (
        df.select(
            F.col(id_col),
            F.col(name_col),
            F.explode(
                F.expr(f"sequence(1, length({name_col}) - 1)")
            ).alias("__i"),
        )
        .select(
            id_col,
            name_col,
            F.expr(f"substring({name_col}, __i, 2)").alias("bigram"),
        )
        .distinct()
    )


def fuzzy_link(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_name: str,
    right_id: str,
    right_name: str,
    max_dist: int = 2,
    max_block_df: int = 64,
) -> DataFrame:
    """Link each left record to its best fuzzy match on the right.

    Returns (left_id, right_id, dist) — one row per left record that
    found a candidate within ``max_dist``, best = (min dist, min
    right_id) for a deterministic pick under ties.
    """
    lb = _bigrams(left, left_id, left_name)
    rb = _bigrams(right, right_id, right_name)
    cold = (
        rb.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_block_df)
        .select("bigram")
    )
    rb_cold = rb.join(cold, "bigram")
    cand = (
        lb.join(rb_cold, "bigram")
        .select(left_id, left_name, right_id, right_name)
        .distinct()
    )
    scored = cand.select(
        left_id,
        right_id,
        F.levenshtein(F.col(left_name), F.col(right_name)).alias("dist"),
    ).filter(F.col("dist") <= max_dist)
    w = Window.partitionBy(left_id).orderBy(
        F.col("dist").asc(), F.col(right_id).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
