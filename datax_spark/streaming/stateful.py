"""Custom stateful streaming operator: live per-conversation session state.

The reference has no stateful stream operator (its streams are stateless
record pipes, otsstreamreader → writer); this is the Spark-native extension
point the CDC engine's streaming front-end composes with: an
``applyInPandasWithState`` operator that tracks each conversation's running
shape (turns seen, max turn_idx, event counts by op, tool usage, first/last
activity) across micro-batches and emits

- an ``update`` row per conversation per batch it appears in (live
  dashboards / lag monitoring), and
- optionally a final ``closed=true`` row when the conversation has been idle
  past ``idle_timeout_ms`` (processing-time timeout) — the streaming
  sessionize analog of the batch ``events_sessionize`` query.

``idle_timeout_ms=None`` (default) runs with NoTimeout: required for
``Trigger.AvailableNow`` drains, where a processing-time timeout would keep
the micro-batch engine scheduling batches forever to service pending timers
(observed: an availableNow query that never terminates). Pass a timeout only
for the long-running ``processingTime`` tail deployment.

State is a single fixed-width row per conversation (a few dozen bytes), so
state storage is O(live conversations), partitioned by the same conv_id hash
as every other stage — no skew beyond the feed's own, no driver involvement.
The per-group function is Arrow-batched pandas (vectorized sums/maxes), never
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_events", LongType()),
        StructField("n_turns", LongType()),
        StructField("max_turn_idx", LongType()),
        StructField("n_deletes", LongType()),
        StructField("n_tool_events", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("closed", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("max_turn_idx", LongType()),
        StructField("n_deletes", LongType()),
        StructField("n_tool_events", LongType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
        # distinct turn_idx values seen, CSV-encoded (bounded: turns per conv)
        StructField("turns_csv", StringType()),
    ]
)


def make_session_tracker(idle_timeout_ms: int | None = None):
    """Build the per-group state function (self-contained worker closure:
    pandas/stdlib only — workers cannot import this repo)."""

    def track(key, pdfs, state):
        import pandas as pd

        (conv_id,) = key
        if state.hasTimedOut:
            (n_events, max_turn, n_del, n_tool, first_us, last_us, turns_csv) = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "n_events": n_events,
                        "n_turns": len(turns_csv.split(",")) if turns_csv else 0,
                        "max_turn_idx": max_turn,
                        "n_deletes": n_del,
                        "n_tool_events": n_tool,
                        "first_ts": pd.Timestamp(first_us, unit="us"),
                        "last_ts": pd.Timestamp(last_us, unit="us"),
                        "closed": True,
                    }
                ]
            )
            return

        if state.exists:
            (n_events, max_turn, n_del, n_tool, first_us, last_us, turns_csv) = state.get
            turns = set(int(t) for t in turns_csv.split(",")) if turns_csv else set()
        else:
            n_events = max_turn = n_del = n_tool = 0
            first_us, last_us = None, None
            turns = set()

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_events += len(pdf)
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            n_del += int((pdf["op"] == "D").sum())
            if "tool" in pdf.columns:
                n_tool += int(pdf["tool"].notna().sum())
            ts_us = pdf["ts"].astype("int64") // 1000  # ns → us
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
            turns.update(int(t) for t in pdf["turn_idx"].unique())

        state.update(
            (
                n_events,
                max_turn,
                n_del,
                n_tool,
                first_us,
                last_us,
                ",".join(str(t) for t in sorted(turns)),
            )
        )
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "n_events": n_events,
                    "n_turns": len(turns),
                    "max_turn_idx": max_turn,
                    "n_deletes": n_del,
                    "n_tool_events": n_tool,
                    "first_ts": pd.Timestamp(first_us, unit="us"),
                    "last_ts": pd.Timestamp(last_us, unit="us"),
                    "closed": False,
                }
            ]
        )

    return track


def conversation_sessions(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """events (streaming, change-event schema) → live session-state stream.

    Input must carry ``conv_id``, ``turn_idx``, ``op``, ``ts`` and optionally
    ``tool``. Output follows SESSION_OUTPUT_SCHEMA; rows with ``closed=false``
    are running updates; with an ``idle_timeout_ms``, ``closed=true`` marks an
    idle-timeout session close (state dropped; a late event reopens the
    conversation as a new session — standard sessionization semantics).
    """
    has_tool = "tool" in events.columns
    cols = ["conv_id", "turn_idx", "op", "ts"] + (["tool"] if has_tool else [])
    return (
        events.select(*cols)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_session_tracker(idle_timeout_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                "ProcessingTimeTimeout" if idle_timeout_ms is not None else "NoTimeout"
            ),
        )
    )
