"""Conversation-transcript curation operators.

The engine's payload is multi-turn conversation / agent transcripts
(``conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp`` — the CDC feed's target shape, see datax_spark.cdc.generator).
After a 10^10-event CDC replay the table's *per-conversation* structure is
what downstream training pipelines consume, so these operators audit and
reshape it:

- :func:`validate_transcripts` — per-conversation integrity audit (turn-index
  contiguity, duplicate turns, role-alternation breaks, empty turns,
  timestamp regressions). The post-replay sanity check: a CDC bug that drops
  or duplicates a turn shows up here before it poisons a training run.
- :func:`sft_pairs` — explode conversations into (context, response)
  supervised-fine-tuning pairs, context = the previous ``k`` turns rendered
  as ``role: text`` lines.
- :func:`tool_stats` — per-conversation tool-use profile (call counts,
  distinct tools, first call position) for agent-trajectory filtering.
- :func:`conversation_text` — assemble one text blob per conversation in
  turn order, so the corpus-level dedup/ANN ops (ops.dedup, ops.similarity)
  apply at conversation granularity (near-duplicate *conversations*, not
  just near-duplicate turns).

All three are pure Catalyst (whole-stage codegen, no Python) and are written
so DuckDB can replicate them bit-for-bit for the correctness oracle: one
window pass ordered by ``turn_idx`` plus one aggregation, both partitioned by
``conv_id``.

Scale notes: everything here shuffles ONCE on ``conv_id`` (window + groupBy
share the partitioning, so Catalyst reuses the exchange). Conversations are
naturally bounded (10^2-10^4 turns), so per-key state stays small at 100 TB;
a pathological million-turn conversation degrades only its own partition.

Reference analog: the dx_* transformers (SURVEY.md §2.2) rewrite single
columns per record; these are their conversation-level siblings, the same
way ops/curation.py holds the corpus-level ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def validate_transcripts(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation integrity audit.

    Returns one row per conversation:

    - ``n_turns`` — turn count;
    - ``dup_turns`` — turns sharing a ``turn_idx`` with another turn;
    - ``contiguous`` — 1 iff turn indexes are exactly 0..n_turns-1;
    - ``role_breaks`` — adjacent turn pairs (in ``turn_idx`` order) with the
      same role (a broken user/assistant alternation);
    - ``empty_turns`` — turns whose text is NULL or whitespace-only;
    - ``ts_regressions`` — adjacent pairs where the timestamp goes backwards;
    - ``valid`` — 1 iff all of the above are clean.

    One window pass + one aggregation, both partitioned by ``conv_col``.

    Window order is ``(turn_idx, ts, role, text)`` with NULLS LAST — a
    deterministic total order even when dirty data repeats a ``turn_idx``,
    so ``role_breaks``/``ts_regressions`` can't drift between engines (the
    DuckDB oracle orders identically).
    """
    w = Window.partitionBy(conv_col).orderBy(
        F.col(turn_col).asc_nulls_last(),
        F.col(ts_col).asc_nulls_last(),
        F.col(role_col).asc_nulls_last(),
        F.col(text_col).asc_nulls_last(),
    )
    prev_role = F.lag(F.col(role_col)).over(w)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    ann = df.select(
        F.col(conv_col),
        F.col(turn_col),
        F.when(prev_role.isNotNull() & (prev_role == F.col(role_col)), 1)
        .otherwise(0).alias("_role_break"),
        F.when(prev_ts.isNotNull() & (F.col(ts_col) < prev_ts), 1)
        .otherwise(0).alias("_ts_regress"),
        F.when(
            F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""), 1
        ).otherwise(0).alias("_empty"),
    )
    agg = ann.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        (F.count("*") - F.count_distinct(F.col(turn_col))).alias("dup_turns"),
        F.min(turn_col).alias("_min_t"),
        F.max(turn_col).alias("_max_t"),
        F.sum("_role_break").alias("role_breaks"),
        F.sum("_empty").alias("empty_turns"),
        F.sum("_ts_regress").alias("ts_regressions"),
    )
    contiguous = (
        (F.col("_min_t") == 0)
        & (F.col("_max_t") == F.col("n_turns") - 1)
        & (F.col("dup_turns") == 0)
    )
    valid = (
        contiguous
        & (F.col("role_breaks") == 0)
        & (F.col("empty_turns") == 0)
        & (F.col("ts_regressions") == 0)
    )
    return agg.select(
        conv_col,
        "n_turns",
        "dup_turns",
        F.when(contiguous, 1).otherwise(0).alias("contiguous"),
        "role_breaks",
        "empty_turns",
        "ts_regressions",
        F.when(valid, 1).otherwise(0).alias("valid"),
    )


def sft_pairs(
    df: DataFrame,
    k: int = 3,
    response_role: str = "assistant",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str | None = "ts",
) -> DataFrame:
    """Explode transcripts into supervised-fine-tuning (context, response)
    pairs: one row per ``response_role`` turn that has at least one earlier
    turn, with ``context`` = up to ``k`` preceding turns rendered as
    ``role: text`` joined by newlines, in turn order.

    The frame is ROWS-based over the conversation's *present* turns, so gaps
    in ``turn_idx`` don't shrink the context below ``k`` available turns —
    what you want when pairing after a lossy filter stage.

    Window order is ``(turn_idx[, ts], role, text)`` NULLS LAST (``ts_col``
    participates only when present in ``df``): a deterministic total order
    under duplicate turn indexes, matching the DuckDB oracle exactly.
    """
    order = [F.col(turn_col).asc_nulls_last()]
    if ts_col and ts_col in df.columns:
        order.append(F.col(ts_col).asc_nulls_last())
    order += [F.col(role_col).asc_nulls_last(),
              F.col(text_col).asc_nulls_last()]
    w = Window.partitionBy(conv_col).orderBy(*order)
    line = F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
    ctx = F.concat_ws(
        "\n",
        F.collect_list(line).over(w.rowsBetween(-k, -1)),
    )
    pos = F.row_number().over(w)
    return (
        df.select(
            F.col(conv_col),
            F.col(turn_col),
            F.col(role_col),
            F.col(text_col),
            ctx.alias("context"),
            pos.alias("_pos"),
        )
        .filter((F.col(role_col) == response_role) & (F.col("_pos") >= 2))
        .select(
            conv_col, turn_col, F.col("context"),
            F.col(text_col).alias("response"),
        )
    )


def conversation_text(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Assemble one text blob per conversation, in turn order — the input
    shape for applying the corpus-level dedup/similarity ops (ops.dedup,
    ops.similarity) at *conversation* granularity instead of per turn.

    Returns ``(conv_col, text, n_turns)``. ONE shuffle on ``conv_col``:
    turn order is restored inside the aggregation via ``array_sort`` over
    (turn_idx, text) structs, so no separate window pass (and no second
    exchange) is needed. Per-group state is one conversation's turns —
    naturally bounded, so the agg buffer stays small at 100 TB.
    """
    s = F.array_sort(
        F.collect_list(
            F.struct(F.col(turn_col).alias("t"), F.col(text_col).alias("x"))
        )
    )
    return df.groupBy(conv_col).agg(
        F.array_join(F.transform(s, lambda r: r["x"]), sep).alias("text"),
        F.count("*").alias("n_turns"),
    )


def tool_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation tool-use profile: total turns, tool-call turns,
    distinct tools, and the first turn index that called a tool (-1 if the
    conversation never calls one). One map-side-combined aggregation."""
    tool = F.col(tool_col)
    return df.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.sum(F.when(tool.isNotNull(), 1).otherwise(0)).alias("n_tool_calls"),
        F.count_distinct(tool).alias("n_distinct_tools"),
        F.coalesce(
            F.min(F.when(tool.isNotNull(), F.col(turn_col))), F.lit(-1)
        ).alias("first_tool_turn"),
    )
