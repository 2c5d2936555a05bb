"""Structured Streaming front-end: tail the change feed → MERGE per micro-batch.

This is the Spark-native replacement for the reference's change-stream tailing
(otsstreamreader: shard iterators + status-table checkpoints + time-range
bounds, OTSStreamReaderSlaveProxy.java:41-109) and its rate governance
(Channel.statPush byte/record clamping, Channel.java:176-239):

- shard/iterator checkpoints  → the file source's offset log in
  ``checkpointLocation`` (which files each batch consumed);
- rate limiting               → ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
  trigger pacing;
- per-batch apply             → ``foreachBatch`` → CdcEngine.apply_batch (the
  same validated, quarantined, lineage-manifested, exactly-once MERGE used by
  the batch epoch loop — streaming batch ids key the commit manifests, so a
  batch replayed after a crash is a no-op);
- metrics                     → StreamingQueryListener progress (rows/sec,
  batch duration) appended to ``<ckpt>/streaming-progress.jsonl``.

Late/out-of-order events need no watermark: MERGE-on-key with latest-wins seq
is order-insensitive across batches by construction (SURVEY.md §2.3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from datax_spark.cdc.engine import CdcEngine, EngineConfig


class _ProgressWriter(StreamingQueryListener):
    def __init__(self, path: str):
        self.path = path

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        rec = {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass


class StreamingCdcEngine:
    """readStream(feed) → foreachBatch(apply_batch) with checkpointed offsets."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: EngineConfig,
        max_files_per_trigger: int | None = None,
        max_bytes_per_trigger: str | None = None,
        fs=None,
    ):
        """``fs``: optional LakeFS for the table's metadata, forwarded to
        the inner CdcEngine (same seam as the batch entry point)."""
        self.spark = spark
        self.cfg = cfg
        self.engine = CdcEngine(spark, cfg, fs=fs)
        self.max_files_per_trigger = max_files_per_trigger
        self.max_bytes_per_trigger = max_bytes_per_trigger
        self.offsets_dir = os.path.join(cfg.checkpoint_dir, "stream-offsets")
        self.progress_path = os.path.join(cfg.checkpoint_dir, "streaming-progress.jsonl")

    def _feed_schema(self):
        # one batch inference over the feed (mergeSchema: pre-evolution files
        # lack the evolved columns and will stream as NULL)
        return (
            self.spark.read.option("mergeSchema", "true")
            .parquet(self.cfg.feed_dir)
            .schema
        )

    def _start(self, trigger: dict):
        os.makedirs(self.cfg.checkpoint_dir, exist_ok=True)
        listener = _ProgressWriter(self.progress_path)
        self.spark.streams.addListener(listener)
        reader = (
            self.spark.readStream.schema(self._feed_schema())
            .option("basePath", self.cfg.feed_dir)
        )
        if self.max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        if self.max_bytes_per_trigger is not None:
            reader = reader.option("maxBytesPerTrigger", self.max_bytes_per_trigger)
        stream = reader.parquet(self.cfg.feed_dir)

        applied: list[int] = []

        def _apply(bdf, bid: int):
            cols = [c for c in bdf.columns if c not in ("epoch", "shard")]
            self.engine.apply_batch(bdf.select(*cols), int(bid))
            applied.append(int(bid))

        query = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", self.offsets_dir)
            .trigger(**trigger)
            .start()
        )
        return query, listener, applied

    def run_available_now(self) -> dict:
        """Process everything currently in the feed, then stop (resumable:
        the offset log skips files already consumed by earlier runs)."""
        query, listener, applied = self._start({"availableNow": True})
        try:
            query.awaitTermination()
        finally:
            self.spark.streams.removeListener(listener)
        return {
            "batches": applied,
            "table_version": self.engine.table.current_version(),
        }

    def run_continuous(self, interval: str = "10 seconds",
                       timeout_s: float | None = None) -> dict:
        """Long-running tail: micro-batch every ``interval`` as new shard
        files land (the deployment mode — the reference's change-stream tail
        loop, otsstreamreader RecordProcessor.process). Blocks until
        ``timeout_s`` (None = forever / external stop), then stops the query
        gracefully; restart resumes from the offset log."""
        query, listener, applied = self._start({"processingTime": interval})
        try:
            if timeout_s is None:
                query.awaitTermination()
            else:
                query.awaitTermination(timeout_s)
                query.stop()
                query.awaitTermination(30)
        finally:
            self.spark.streams.removeListener(listener)
        return {
            "batches": applied,
            "table_version": self.engine.table.current_version(),
        }
