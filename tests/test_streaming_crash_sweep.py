"""Crash sweep for the Structured Streaming ingest path.

tests/test_crash_sweep.py proves every metadata-write crash point recovers
on the batch epoch loop; this sweep proves the same for the STREAMING
front-end (streaming/feed.py: readStream(feed) → foreachBatch →
CdcEngine.apply_batch). The failure model differs in two ways that make it
worth its own sweep:

- the crash surfaces as a failed micro-batch → StreamingQueryException →
  query termination, and recovery is a RESTARTED QUERY whose file-source
  offset log replays the failed batch id with the same file set;
- batch boundaries (and so commit-manifest keys and quarantine epochs)
  are trigger-paced, not feed-epoch-aligned, so exactly-once must hold
  per streaming batch id, not per feed epoch.

After each injected crash a fresh StreamingCdcEngine (clean FS) drains the
feed with availableNow and the final table must equal the fold oracle;
quarantined dirty events must be globally unique by seq and sum to the
committed manifests' dirty counts.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.errors.exceptions.captured import StreamingQueryException

from datax_spark.cdc import engine as engine_mod
from datax_spark.cdc.engine import EngineConfig
from datax_spark.cdc.oracle import fold_feed
from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.fs import LocalFS
from datax_spark.lake.table import LakeTable
from datax_spark.streaming.feed import StreamingCdcEngine

from tests.test_crash_sweep import CrashFS, InjectedCrash, _feed


def _stream_once(spark, feed, root, ckpt, fs, monkeypatch):
    orig = engine_mod._atomic_write_json

    def ticked(path, payload):
        fs._tick("ckpt", path)
        orig(path, payload)

    monkeypatch.setattr(engine_mod, "_atomic_write_json", ticked)
    try:
        if not os.path.isdir(os.path.join(root, "_meta")):
            LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, "conv_id",
                             n_buckets=8, fs=LocalFS())
        seng = StreamingCdcEngine(
            spark,
            EngineConfig(table_root=root, feed_dir=feed,
                         checkpoint_dir=ckpt),
            max_files_per_trigger=6,  # several micro-batches per drain
            fs=fs,
        )
        return seng.run_available_now()
    finally:
        monkeypatch.setattr(engine_mod, "_atomic_write_json", orig)


def _assert_streamed_exactly_once(spark, feed, root, ckpt, monkeypatch):
    """Restart with a clean FS, drain, compare to the fold oracle."""
    _stream_once(spark, feed, root, ckpt, CrashFS(budget=None), monkeypatch)

    table = LakeTable(spark, root, fs=LocalFS())
    got = {
        (r["conv_id"], r["turn_idx"]):
            (r["role"], r["text"], r["tool"], r["ts"].replace(tzinfo=None))
        for r in table.read().collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]):
            (r["role"], r["text"], r["tool"], r["ts"].replace(tzinfo=None))
        for r in fold_feed(feed)
    }
    assert got == want

    # dirty events exactly-once across ALL streaming batches: globally
    # unique seq, total matching the committed manifests
    commits_dir = os.path.join(ckpt, "commits")
    manifest_dirty = sum(
        json.load(open(os.path.join(commits_dir, n)))["dirty"]
        for n in os.listdir(commits_dir))
    qroot = os.path.join(ckpt, "quarantine")
    q_files = [os.path.join(d, f) for d, _s, fns in os.walk(qroot)
               for f in fns if f.endswith(".parquet")] \
        if os.path.isdir(qroot) else []
    n_q = n_unique = 0
    if q_files:
        q = spark.read.parquet(*q_files)
        n_q = q.count()
        n_unique = q.select("seq").distinct().count()
    assert n_q == n_unique, "duplicated quarantine rows across batches"
    assert n_q == manifest_dirty, (n_q, manifest_dirty)


def test_streaming_crash_sweep(spark, tmp_path, monkeypatch):
    feed = _feed(spark, tmp_path, shards=8)

    # dry run sizes the sweep
    dry = CrashFS(budget=None)
    root0, ckpt0 = str(tmp_path / "dry-table"), str(tmp_path / "dry-ckpt")
    _stream_once(spark, feed, root0, ckpt0, dry, monkeypatch)
    total = dry.mutations
    assert total > 10, f"only {total} mutations"
    _assert_streamed_exactly_once(spark, feed, root0, ckpt0, monkeypatch)

    failures = []
    points = list(range(1, total + 1, 4))
    for budget in points:
        root = str(tmp_path / f"s{budget}-table")
        ckpt = str(tmp_path / f"s{budget}-ckpt")
        try:
            _stream_once(spark, feed, root, ckpt, CrashFS(budget=budget),
                         monkeypatch)
        except (InjectedCrash, StreamingQueryException):
            pass  # failed micro-batch terminates the query — expected
        try:
            _assert_streamed_exactly_once(spark, feed, root, ckpt,
                                          monkeypatch)
        except AssertionError as e:
            failures.append(f"crash@{budget}: {e}")
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    assert not failures, (
        f"{len(failures)}/{len(points)} streaming crash points broke "
        "exactly-once:\n" + "\n".join(failures[:10]))
