"""Event-time windowed aggregation with watermark-governed late-data
handling over the lake changelog stream.

This is the Structured Streaming "windowed aggregates + watermarks for late
data" layer of the CDC engine's streaming front end: finalized per-window
rollups (append output mode — each window is emitted exactly once, when the
watermark passes its end) over the change feed, with deterministically
bounded state. The reference has no event-time operator at all — its
streams are stateless record pipes (``otsstreamreader/.../
OTSStreamReaderSlaveProxy.java:41-109`` cursor loops); this module is the
Spark-native capability that replaces the external batch re-aggregation a
reference user would schedule on top.

Watermark semantics (pinned empirically on Spark 4.x — see
``tests/test_windowed_stream.py::test_two_watermark_contract``):

- Spark keeps **two watermark values per micro-batch** (the Spark 3.4+
  contract): late-event *filtering* uses the previous batch's watermark,
  ``wm_late(b) = wm_evict(b-1)``, while state *eviction/emission* uses the
  current one, ``wm_evict(b) = max(event time over batches < b,
  ms-floored) - delay``.
- Both comparisons are **non-strict**: an input row is dropped iff its
  window end ``<= wm_late``; a window is finalized (emitted once, state
  evicted) iff its end ``<= wm_evict``.
- Event-time stats are collected *before* the late filter, but a dropped
  row can never advance the watermark: being dropped means its window end
  is at or below a watermark derived from the running max, so its ts is
  strictly below that max already.
- On checkpoint **restart**, Spark restores a single watermark value, so
  for the first post-restart batch the late filter does NOT lag:
  ``wm_late == wm_evict == checkpointed wm``. Restarts can therefore drop
  *more* late rows than a continuous run — never fewer, and never a
  duplicate window emission (``tests/test_windowed_stream.py::
  test_restart_is_exactly_once``).

Consequently, with the changelog source's version-window offsets and
``maxVersionsPerTrigger=1``, the entire late-data outcome is a **pure
function of (commit contents, delay)** — one commit per micro-batch, in
version order, every time, including across checkpoint restarts. The
``cdc_stream_windowed`` entry query's DuckDB oracle replays exactly this
model in SQL (per-version max event time → 2-lagged running-max watermark →
non-strict window-end filter).

Scale: state is O(open windows × distinct keys) — windows between the
watermark and the max seen event time — independent of total stream
length; it lives in the executor-side state store partitioned by the
grouping key hash (same shuffle as any keyed agg, AQE-coalesced), and the
append-mode sink receives each window once, so downstream writes are
O(finalized windows). Nothing is driver-resident.
"""

from __future__ import annotations

import tempfile
import uuid
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_rollup(
    sdf: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "30 minutes",
    keys: Sequence[str] = (),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Attach a watermark and a tumbling event-time window aggregation to a
    streaming DataFrame. Returns a streaming DF with columns
    ``window_start, window_end, *keys, *aggs`` ready for append-mode output
    (finalized windows only, each emitted exactly once)."""
    if aggs is None:
        aggs = {"n": F.count(F.lit(1))}
    agg_cols = [c.alias(name) for name, c in aggs.items()]
    return (
        sdf.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *[F.col(k) for k in keys])
        .agg(*agg_cols)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(k) for k in keys],
            *[F.col(name) for name in aggs],
        )
    )


def session_rollup(
    sdf: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    delay: str = "30 minutes",
    keys: Sequence[str] = (),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Watermarked SESSION windows (``F.session_window``): per-key activity
    sessions that merge while events arrive within ``gap`` of each other,
    closing once the event-time watermark passes ``last event + gap`` — the
    declarative sibling of the imperative applyInPandasWithState tracker in
    ``streaming/stateful.py`` (use this when "session" means an event-time
    gap; use the tracker when closing needs custom logic or per-session
    derived state). Returns a streaming DF with
    ``session_start, session_end, *keys, *aggs`` for append-mode output:
    each closed session is emitted exactly once, with
    ``session_end = last event ts + gap``. A late event that lands inside
    an already-closed session's span is watermark-dropped, so closed
    sessions never reopen or overlap (pinned in
    ``tests/test_windowed_stream.py::test_session_windows``)."""
    if aggs is None:
        aggs = {"n": F.count(F.lit(1))}
    agg_cols = [c.alias(name) for name, c in aggs.items()]
    return (
        sdf.withWatermark(ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                 *[F.col(k) for k in keys])
        .agg(*agg_cols)
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *[F.col(k) for k in keys],
            *[F.col(name) for name in aggs],
        )
    )


def start_windowed_rollup(
    spark: SparkSession,
    root: str,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "30 minutes",
    keys: Sequence[str] = (),
    aggs: Mapping[str, Column] | None = None,
    starting_version: int | None = None,
    max_versions_per_trigger: int | None = 1,
    checkpoint_dir: str | None = None,
    query_name: str | None = None,
    fs_factory: str | None = None,
):
    """Open the changelog stream on ``root`` and start the windowed rollup
    into a memory sink. Returns ``(query, table_name)`` — callers drive the
    query (``processAllAvailable`` / stop / restart from the same
    checkpoint) and read finalized windows from ``spark.table(table_name)``.

    ``max_versions_per_trigger=1`` (default) makes batch boundaries ≡ commit
    boundaries, which is what makes the watermark sequence — and therefore
    the exact set of dropped-late rows — deterministic and replayable."""
    from datax_spark.streaming.changelog import read_changelog_stream

    sdf = read_changelog_stream(
        spark,
        root,
        starting_version=starting_version,
        max_versions_per_trigger=max_versions_per_trigger,
        fs_factory=fs_factory,
    )
    out = windowed_rollup(sdf, ts_col=ts_col, window=window, delay=delay,
                          keys=keys, aggs=aggs)
    name = query_name or f"dsx_wnd_{uuid.uuid4().hex[:10]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix="dsx-wndck-"),
        )
        .start()
    )
    return q, name


def run_windowed_rollup(spark: SparkSession, root: str, **kw) -> DataFrame:
    """Drain the changelog stream through the windowed rollup and return the
    finalized windows as a batch DataFrame. Windows whose end is still above
    the final watermark remain open (unemitted) — commit a max-ts sentinel
    row first if the caller needs every real window flushed."""
    from datax_spark.streaming.util import drain_query

    q, name = start_windowed_rollup(spark, root, **kw)
    drain_query(q)
    return spark.table(name)
