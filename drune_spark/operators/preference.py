"""Preference-data construction operators (driver extension).

RLHF / DPO / GRPO pipelines consume (prompt group, candidate, score)
tables; this module provides the two standard constructions:

- ``preference_pairs`` — per prompt group, the (chosen, rejected) pair
  by score argmax/argmin with deterministic id tie-breaks and the
  score margin: the DPO/RLHF pair-mining step.
- ``group_advantage`` — GRPO-style group-relative advantage
  (Shao et al. 2024, arXiv:2402.03300): per candidate,
  (r − mean_group) / σ_group in integer milli, with exact integer
  moments (DECIMAL(38,0) ≡ DuckDB HUGEINT) and ONE IEEE sqrt — the
  neyman_allocation cross-engine primitive.

Both are one groupBy over (group, id, score) cells — candidate text
never shuffles; group sizes are the generation fan-out (4-64), so
skew is bounded by construction.

No counterpart in /root/reference; driver-mandated LLM-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENC = 1 << 33  # id domain bound for the integer-encoded argmax/argmin


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Per prompt group: chosen = (max score, ties → LOWEST id),
    rejected = (min score, ties → HIGHEST id) — opposite tie
    directions so an all-tied group still yields a distinct pair —
    plus the score margin. Groups with fewer than two candidates are
    dropped (no pair to mine). Scores must be nonnegative integers
    and ids in [0, 2³³) — the integer-encoded argmax contract
    (``score·2³³ ± id`` stays under 2⁶³).

    Returns (group_col, n_candidates, chosen_id, chosen_score,
    rejected_id, rejected_score, margin).
    """
    g = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).cast("long").alias("__id"),
        F.col(score_col).cast("long").alias("__s"),
    )
    # The encoding is only an argmax/argmin for in-domain inputs —
    # a negative score flips the trunc-mod decode and '%'/'div' on
    # negatives diverge across engines — so violations fail LOUDLY:
    # assert_true throws per offending row; on the pass path it is
    # NULL, coalesced to a 0 term (zero cost, stays in codegen).
    guard = F.coalesce(
        F.assert_true(
            (F.col("__s") >= 0)
            & (F.col("__id") >= 0)
            & (F.col("__id") < ENC),
            F.lit(
                "preference_pairs needs score >= 0 and id in [0, 2^33)"
            ),
        ).cast("long"),
        F.lit(0),
    )
    # ONE encoding serves both ends: max → (max score, lowest id);
    # min → (min score, HIGHEST id) — opposite tie directions for free.
    enc = (
        guard
        + F.col("__s") * F.lit(ENC)
        + (F.lit(ENC - 1) - F.col("__id"))
    )
    agg = (
        g.groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.max(enc).alias("__emax"),
            F.min(enc).alias("__emin"),
        )
        .filter(F.col("n_candidates") >= 2)
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_candidates",
        (F.lit(ENC - 1) - F.col("__emax") % ENC).alias("chosen_id"),
        F.expr(f"__emax div {ENC}").alias("chosen_score"),
        (F.lit(ENC - 1) - F.col("__emin") % ENC).alias("rejected_id"),
        F.expr(f"__emin div {ENC}").alias("rejected_score"),
        F.expr(f"__emax div {ENC} - __emin div {ENC}").alias("margin"),
    )


def group_advantage(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """GRPO group-relative advantage in integer milli:
    ``adv = (r − mean) / σ = (r·n − S) / sqrt(n·Q − S²)`` per group
    (population σ; the n cancels). Exact integer moments via
    DECIMAL(38,0) (DuckDB HUGEINT twin), ONE IEEE sqrt floored to
    unit, and the division runs sign-split —
    ``sign(num) · (|num|·1000 div den)`` — because trunc-vs-floor
    integer division diverges across engines on negative operands.
    Zero-variance groups (den = 0) report adv_milli = 0.

    Returns (group_col, id_col, score, adv_milli).
    """
    g = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        F.col(score_col).cast("long").alias("__s"),
    )
    mom = g.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__s").cast("decimal(38,0)")).alias("__sm"),
        F.sum((F.col("__s") * F.col("__s")).cast("decimal(38,0)"))
         .alias("__sq"),
    )
    from drune_spark.operators.stats import sqrt_moment_sql

    den = F.expr(sqrt_moment_sql("__n", "__sq", "__sm"))
    # DECIMAL before the product: a BIGINT r·n overflows once
    # score·group_size passes 2⁶³ (ANSI raises), moments already don't.
    num = F.expr("CAST(__s AS DECIMAL(38,0)) * __n - __sm")
    return (
        g.join(F.broadcast(mom), "__g")
        .select(
            F.col("__g").alias(group_col),
            F.col("__id").alias(id_col),
            F.col("__s").alias("score"),
            den.alias("__den"),
            num.alias("__num"),
        )
        .select(
            group_col,
            id_col,
            "score",
            F.expr(
                "CASE WHEN __den = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(CASE WHEN __num < 0 THEN -1 ELSE 1 END"
                "      * (CAST(abs(__num) AS DECIMAL(38,0)) * 1000"
                "         div __den) AS BIGINT) END"
            ).alias("adv_milli"),
        )
    )


def bradley_terry(
    matches: DataFrame,
    n_rounds: int = 6,
    winner_col: str = "winner",
    loser_col: str = "loser",
    scale: int = 1_000_000,
) -> DataFrame:
    """Bradley-Terry strength fit from pairwise outcomes (Bradley &
    Terry 1952; the rating model behind Chatbot-Arena-style LLM evals
    and RLHF reward-model sanity checks): items i get strengths wᵢ
    with P(i beats j) = wᵢ/(wᵢ+wⱼ), fit by ``n_rounds`` of the classic
    MM update  wᵢ ← Wᵢ / Σⱼ nᵢⱼ/(wᵢ+wⱼ)  (Hunter 2004), renormalized
    to Σw = k·scale each round.

    All-integer: strengths live at ``scale``; the MM update is
    denomᵢ = Σⱼ floor(nᵢⱼ·scale² / (wᵢ+wⱼ)),
    wᵢ' = floor(Wᵢ·scale² / max(denomᵢ, 1)) — every intermediate
    < 2⁶³ for any corpus with < ~9·10⁶ matches (guarded). Spark does
    ONE aggregation pass (wins per item + symmetric pair counts, the
    only shuffles); the k-item iteration is driver-side python over
    the two collected control frames (the perceptron/power-iteration
    family — k is the item domain, e.g. 8 model variants, never the
    corpus) and the result returns via createDataFrame. The oracle
    replays the identical floor arithmetic in unrolled CTEs generated
    from the same constants.

    Returns (item, rating, n_wins, n_matches) — rating at ``scale``,
    Σ ratings = k·scale; deterministic (items sorted, integer math).
    """
    spark = matches.sparkSession
    # ONE aggregation job: the ordered-pair counts carry everything —
    # n_ij, wins and losses all fold from them in the driver (three
    # separate collects would re-run the matches-producing lineage
    # three times).
    ordered = (
        matches.groupBy(
            F.col(winner_col).alias("wi"), F.col(loser_col).alias("lo")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_ij: dict[tuple[int, int], int] = {}
    w_i: dict[int, int] = {}
    l_i: dict[int, int] = {}
    for r in ordered:
        wi, lo, n = int(r["wi"]), int(r["lo"]), int(r["n"])
        key = (min(wi, lo), max(wi, lo))
        n_ij[key] = n_ij.get(key, 0) + n
        w_i[wi] = w_i.get(wi, 0) + n
        l_i[lo] = l_i.get(lo, 0) + n
    items = sorted(set(w_i) | set(l_i))
    k = len(items)
    total = sum(n_ij.values())
    if total >= (1 << 63) // (scale * scale):
        raise ValueError("bradley_terry: match volume overflows int64")
    S2 = scale * scale
    w = {i: scale for i in items}
    for _ in range(int(n_rounds)):
        nxt = {}
        for i in items:
            denom = 0
            for (a, b), n in n_ij.items():
                # guard: a dominated pair can floor BOTH ratings to 0
                # after renormalization (review finding: //0 crash)
                if i == a or i == b:
                    denom += n * S2 // max(w[a] + w[b], 1)
            nxt[i] = w_i.get(i, 0) * S2 // max(denom, 1)
        tot = sum(nxt.values())
        w = {i: nxt[i] * k * scale // max(tot, 1) for i in items}
    rows = [
        (
            int(i),
            int(w[i]),
            int(w_i.get(i, 0)),
            int(w_i.get(i, 0) + l_i.get(i, 0)),
        )
        for i in items
    ]
    from drune_spark.functions.partitioning import local_frame
    return local_frame(
        spark, rows, "item long, rating long, n_wins long, n_matches long"
    )
