"""Streaming feed dedup: drop redelivered change events with
watermark-bounded state (``dropDuplicatesWithinWatermark``).

At-least-once transports (the reference's failover model re-runs a whole
task on error — ``core/.../TaskGroupContainer.java`` restarts failed
writers, so downstream sees the same records again) make duplicate
delivery the NORMAL case at 10^10 events. The CDC engine's batch path
dedupes by (key, seq) inside each epoch fold; this module is the
streaming-native front-end stage: exact first-wins dedup on the event id
with state that the watermark evicts, so state size is

    O(events inside the watermark horizon)   — not O(all events ever)

Pick ``delay`` = the transport's maximum redelivery window (e.g. a broker's
retention or the task-retry timeout), not the event-time skew: a duplicate
arriving within ``delay`` of the first copy is guaranteed dropped; one
arriving later can slip through (state already evicted) and is then caught
by the engine's keyed (key, seq) fold downstream — the same two-tier
design Kafka-to-lake pipelines use (cheap bounded-state dedup in the
stream, authoritative idempotence at the sink).

The dedup key should be the feed's delivery id (event_id / LSN / offset),
NOT the row key: two legitimate updates to one conv_id must both pass.

State-store sizing: one entry per delivery id inside the horizon. At real
horizons (tens of millions of in-flight ids and up) run the query with the
RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStore
Provider``) — the default in-JVM map provider holds the whole id set on
heap and falls over long before RocksDB notices (measured in
``jobs/stream_bench.py``: 20M ids OOMed an 8 GB heap on the default
provider; RocksDB handles it in stride).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    sdf: DataFrame,
    id_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """First-wins dedup of a streaming DataFrame on ``id_cols``, with dedup
    state evicted once the event-time watermark passes an entry's horizon.
    Works within and across micro-batches; the kept row is the first
    delivered copy (including its metadata columns)."""
    return sdf.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(id_cols))
