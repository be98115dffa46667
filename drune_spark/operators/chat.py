"""Conversation-shaped data operators (driver extension).

Instruction-tuning / chat corpora are (conversation, turn) tables, not
flat documents, and every chat-data pipeline runs two structural
passes this module provides:

- ``chat_lint`` — the schema validator: role alternation, boundary
  roles (user opens, assistant closes), empty turns. Conversations
  failing it are malformed exports, not training data.
- ``chat_truncate`` — the context-window trim: keep the longest
  suffix of WHOLE turns whose token sum fits the budget (truncating
  mid-turn teaches the model half-sentences; dropping the oldest
  turns first is the standard recency-keeps semantics).

``chat_turns_from_events`` synthesizes a deterministic turn table from
the events stream (conversation = user, turns ordered by event time)
so the gates are oracle-replayable; a real chat export drops in with
the same (conv, turn_idx, role, n_tokens) shape.

All-integer / window math — one shuffle keyed on the conversation id
for each pass, turn text never moves. At 100 TB conversations are
bounded (10²-10³ turns), so per-key window state is tiny and skew is
capped by construction.

No counterpart in /root/reference; driver-mandated LLM-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

USER_EVENT_TYPES = ("click", "view", "signup")
TURN_TOKEN_MOD = 37  # token cost = id % 37 ∈ [0, 36] — zeros occur, so
# the lint's n_empty branch has real cross-engine signal.


def chat_turns_from_events(
    events: DataFrame,
    conv_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Deterministic (conv_id, turn_idx, role, n_tokens) turn table
    from the events stream: conversation = user, turns ordered by
    (event-time µs, event id — a total order), role from the event
    type (USER_EVENT_TYPES speak as 'user', the rest as 'assistant' —
    deliberately imperfect alternation so the lint has real signal),
    token cost id % TURN_TOKEN_MOD. NULL-timestamp rows are dropped
    BEFORE the rank window (Spark ASC = NULLS FIRST vs DuckDB = NULLS
    LAST — the r8 rank-window rule). The DuckDB mirror is GENERATED
    from the same constants by ``chat_turns_oracle_cte``."""
    base = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(conv_col).alias("conv_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        F.col(id_col).alias("__eid"),
        F.when(
            F.col(type_col).isin(*USER_EVENT_TYPES), F.lit("user")
        ).otherwise(F.lit("assistant")).alias("role"),
        (F.col(id_col) % TURN_TOKEN_MOD).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("conv_id").orderBy("__us", "__eid")
    return base.select(
        "conv_id",
        (F.row_number().over(w) - 1).alias("turn_idx"),
        "role",
        "n_tokens",
    )


def chat_turns_oracle_cte() -> str:
    """DuckDB CTE body mirroring ``chat_turns_from_events`` — GENERATED
    from USER_EVENT_TYPES / TURN_TOKEN_MOD so the two sides cannot
    drift (the _token_screen_cte convention)."""
    in_list = ", ".join(f"'{t}'" for t in USER_EVENT_TYPES)
    return f"""ct AS (
            SELECT user_id AS conv_id,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) - 1 AS turn_idx,
                   CASE WHEN event_type IN ({in_list})
                        THEN 'user' ELSE 'assistant' END AS role,
                   CAST(event_id % {TURN_TOKEN_MOD} AS BIGINT)
                       AS n_tokens
            FROM events WHERE ts IS NOT NULL
        )"""


def chat_lint(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tok_col: str = "n_tokens",
) -> DataFrame:
    """Per-conversation structural lint — the chat-export validator:

    - ``n_role_repeats``: adjacent turns with the same role (broken
      alternation — merged or dropped turns upstream);
    - ``starts_user`` / ``ends_assistant``: boundary-role contract
      (a trailing user turn has no target to train on);
    - ``n_empty``: zero-token turns;
    - ``ok``: all of the above clean.

    One lag window + one conversation aggregate; carries only
    (conv, idx, role, tokens) cells.

    Returns (conv_id, n_turns, n_user, n_assistant, n_role_repeats,
    starts_user, ends_assistant, n_empty, ok).
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    lagged = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.col(tok_col).alias("n_tokens"),
        F.lag(role_col).over(w).alias("__prev"),
    )
    return lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.expr("count_if(role = 'user')").alias("n_user"),
        F.expr("count_if(role = 'assistant')").alias("n_assistant"),
        F.expr("count_if(__prev = role)").alias("n_role_repeats"),
        F.expr("count_if(turn_idx = 0 AND role = 'user') > 0")
         .alias("starts_user"),
        F.expr("max_by(role, turn_idx) = 'assistant'")
         .alias("ends_assistant"),
        F.expr("count_if(n_tokens = 0)").alias("n_empty"),
        F.expr(
            "count_if(turn_idx = 0 AND role = 'user') > 0"
            " AND max_by(role, turn_idx) = 'assistant'"
            " AND count_if(__prev = role) = 0"
            " AND count_if(n_tokens = 0) = 0"
        ).alias("ok"),
    )


def chat_loss_mask(
    turns: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tok_col: str = "n_tokens",
    trainable_role: str = "assistant",
) -> DataFrame:
    """Trainable-token accounting for the per-turn loss mask: SFT
    masks the loss on non-``trainable_role`` turns, so the tokens that
    actually teach are only the assistant's — the budget a curation
    pass balances (a conversation that is 95% user context buys almost
    no gradient per sequence slot). One conversation aggregate over
    (conv, role, tokens) cells.

    Returns (conv_id, n_turns, context_tokens, trainable_tokens,
    total_tokens, trainable_ppm) with trainable_ppm =
    trainable·10⁶ div max(total, 1).
    """
    g = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(role_col).alias("__role"),
        F.col(tok_col).cast("long").alias("__tok"),
    )
    return g.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(
            F.when(F.col("__role") != trainable_role, F.col("__tok"))
            .otherwise(F.lit(0))
        ).cast("long").alias("context_tokens"),
        F.sum(
            F.when(F.col("__role") == trainable_role, F.col("__tok"))
            .otherwise(F.lit(0))
        ).cast("long").alias("trainable_tokens"),
        F.sum("__tok").cast("long").alias("total_tokens"),
    ).withColumn(
        "trainable_ppm",
        F.expr(
            "trainable_tokens * 1000000 div greatest(total_tokens, 1)"
        ),
    )


def chat_truncate(
    turns: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tok_col: str = "n_tokens",
) -> DataFrame:
    """Context-window trim: per conversation, keep the longest SUFFIX
    of whole turns whose token sum fits ``budget`` — oldest turns drop
    first, no turn is ever split. A turn survives iff the running sum
    from the newest turn back to it stays within budget (one DESC
    window, ROWS-explicit); a conversation whose newest turn alone
    exceeds the budget yields no rows — correct, and the lint's
    n_empty/token stats are where that is caught upstream.

    Precondition: ``tok_col >= 0`` for every turn — a negative count
    (bad upstream tokenizer delta) makes the DESC running sum
    non-monotone, so the kept set could have mid-conversation holes
    instead of being one contiguous suffix. Run ``chat_lint`` (or an
    equivalent token-count screen) first; this operator does not scan
    the data to re-validate it.

    Returns surviving (conv_id, turn_idx, role, n_tokens,
    suffix_tokens) — suffix_tokens is the running total the budget
    test used, so the output is self-auditing.
    """
    if budget < 1:
        raise ValueError("chat_truncate needs budget >= 1")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        turns.select(
            F.col(conv_col).alias("conv_id"),
            F.col(idx_col).alias("turn_idx"),
            F.col(role_col).alias("role"),
            F.col(tok_col).alias("n_tokens"),
            F.sum(tok_col).over(w).cast("long").alias("suffix_tokens"),
        )
        .filter(F.col("suffix_tokens") <= budget)
    )
