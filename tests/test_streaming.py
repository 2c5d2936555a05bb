"""Structured Streaming replay: correctness, rate limiting, resume-from-offset-log."""

from __future__ import annotations

import json
import os

from datax_spark.cdc.engine import EngineConfig
from datax_spark.cdc.generator import ChangeFeedSpec, generate_change_feed
from datax_spark.cdc.oracle import fold_feed
from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import LakeTable
from datax_spark.streaming.feed import StreamingCdcEngine


def _setup(spark, tmp_path, spec, **kw):
    feed = str(tmp_path / "feed")
    generate_change_feed(spark, feed, spec)
    LakeTable.create(spark, str(tmp_path / "table"), TRANSCRIPTS_SCHEMA_V1, "conv_id", n_buckets=8)
    cfg = EngineConfig(
        table_root=str(tmp_path / "table"), feed_dir=feed, checkpoint_dir=str(tmp_path / "ckpt")
    )
    return StreamingCdcEngine(spark, cfg, **kw)


def _state(eng):
    return [
        (r.conv_id, r.turn_idx, r.text, getattr(r, "tool", None))
        for r in eng.engine.table.read().orderBy("conv_id", "turn_idx", "ts").collect()
    ]


def _want(feed):
    return [(r["conv_id"], r["turn_idx"], r["text"], r["tool"]) for r in fold_feed(feed)]


def test_streaming_replay_matches_oracle(spark, tmp_path):
    spec = ChangeFeedSpec(seed=42, n_convs=150, n_epochs=4, evolve_frac=0.5)
    eng = _setup(spark, tmp_path, spec)
    res = eng.run_available_now()
    assert res["batches"], "at least one micro-batch"
    assert _state(eng) == _want(eng.cfg.feed_dir)
    # progress metrics emitted
    lines = open(eng.progress_path).read().strip().splitlines()
    assert any(json.loads(ln)["numInputRows"] > 0 for ln in lines)


def test_streaming_rate_limit_multiple_batches(spark, tmp_path):
    spec = ChangeFeedSpec(seed=7, n_convs=100, n_epochs=4)
    eng = _setup(spark, tmp_path, spec, max_files_per_trigger=1)
    res = eng.run_available_now()
    assert len(res["batches"]) >= 4  # trigger pacing split the feed
    assert _state(eng) == _want(eng.cfg.feed_dir)
    # commit manifests keyed by streaming batch id with lineage
    for bid in res["batches"]:
        p = os.path.join(eng.engine.commits_dir, f"epoch-{bid}.json")
        assert os.path.exists(p)


def test_streaming_continuous_trigger_tail(spark, tmp_path):
    """processingTime trigger: batches fire on an interval; late-arriving
    shard files are picked up; graceful stop; state matches the fold."""
    import shutil as _sh
    import threading
    import time as _t

    # generate one 3-epoch feed; start the tail with epochs 0-1 and drip
    # epoch 2 in while the query runs
    full = str(tmp_path / "full")
    generate_change_feed(spark, full, ChangeFeedSpec(seed=13, n_convs=80, n_epochs=3))
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    _sh.copy(os.path.join(full, "_dsx_feed.json"), feed)
    for e in (0, 1):
        _sh.copytree(os.path.join(full, f"epoch={e}"), os.path.join(feed, f"epoch={e}"))
    LakeTable.create(spark, str(tmp_path / "table"), TRANSCRIPTS_SCHEMA_V1,
                     "conv_id", n_buckets=8)
    cfg = EngineConfig(table_root=str(tmp_path / "table"), feed_dir=feed,
                       checkpoint_dir=str(tmp_path / "ckpt"))
    eng = StreamingCdcEngine(spark, cfg)

    def drip():
        _t.sleep(3)
        _sh.copytree(os.path.join(full, "epoch=2"), os.path.join(feed, "epoch=2"))

    t = threading.Thread(target=drip)
    t.start()
    res = eng.run_continuous(interval="1 seconds", timeout_s=20)
    t.join()
    assert len(res["batches"]) >= 2  # initial feed + the late epoch
    assert _state(eng) == _want(eng.cfg.feed_dir)


def test_streaming_resume_only_new_files(spark, tmp_path):
    spec = ChangeFeedSpec(seed=9, n_convs=100, n_epochs=3)
    eng = _setup(spark, tmp_path, spec)
    r1 = eng.run_available_now()
    v1 = eng.engine.table.current_version()

    # feed grows: regenerate a bigger feed into the same dir layout by adding
    # epochs from a second spec written as new epoch dirs
    spec2 = ChangeFeedSpec(seed=9, n_convs=100, n_epochs=3)
    extra = str(tmp_path / "extra")
    generate_change_feed(spark, extra, spec2)
    # shift: copy epoch dirs as new epochs 3..5
    import shutil

    for e in range(3):
        shutil.copytree(os.path.join(extra, f"epoch={e}"), os.path.join(eng.cfg.feed_dir, f"epoch={e + 3}"))

    eng2 = StreamingCdcEngine(spark, eng.cfg)
    r2 = eng2.run_available_now()
    assert eng2.engine.table.current_version() > v1
    assert [b for b in r2["batches"] if b in r1["batches"]] == []  # only new batch ids
    # replaying identical events (same seq) is idempotent: state unchanged vs fold
    assert _state(eng2) == _want(eng.cfg.feed_dir)


def test_stateful_conversation_sessions(spark, tmp_path):
    """applyInPandasWithState session tracker: final update rows per conv
    match a batch recomputation of the same aggregates."""
    from pyspark.sql import functions as F

    from datax_spark.streaming.stateful import conversation_sessions

    feed = str(tmp_path / "feed")
    spec = ChangeFeedSpec(seed=77, n_convs=40, n_epochs=2, shards_per_epoch=4)
    generate_change_feed(spark, feed, spec)
    schema = spark.read.option("mergeSchema", "true").parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("basePath", feed)
        .option("maxFilesPerTrigger", "3")  # force multiple micro-batches
        .parquet(feed)
    )
    # NoTimeout: availableNow + processing-time timers never terminates
    out = conversation_sessions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last update row per conversation == batch aggregate over the whole feed
    got = {
        r.conv_id: r
        for r in spark.sql(
            "SELECT * FROM sessions ORDER BY n_events"  # later rows overwrite
        ).collect()
    }
    batch = spark.read.option("mergeSchema", "true").parquet(feed)
    exp = {
        r.conv_id: r
        for r in batch.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("turn_idx").alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(got) == set(exp) and len(got) >= 40
    for cid, e in exp.items():
        g = got[cid]
        assert g.n_events == e.n_events, cid
        assert g.n_turns == e.n_turns, cid
        assert g.max_turn_idx == e.max_turn_idx, cid
        assert g.n_deletes == e.n_deletes, cid
        assert g.first_ts == e.first_ts and g.last_ts == e.last_ts, cid
        assert g.closed is False


def test_session_tracker_timeout_branch():
    """Unit-drive the idle-timeout close: a timed-out group emits one
    closed=true row and drops its state (no Spark query needed)."""
    import pandas as pd

    from datax_spark.streaming.stateful import make_session_tracker

    class FakeState:
        def __init__(self, tup, timed_out):
            self._t, self.hasTimedOut = tup, timed_out
            self.removed = False
            self.updated = None
            self.timeout_set = None

        @property
        def exists(self):
            return self._t is not None

        @property
        def get(self):
            return self._t

        def remove(self):
            self.removed = True

        def update(self, t):
            self.updated = t

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    track = make_session_tracker(idle_timeout_ms=5000)
    # 1) events arrive: state updated, timer armed, update row emitted
    pdf = pd.DataFrame({
        "turn_idx": [0, 1, 1],
        "op": ["I", "I", "D"],
        "ts": pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:00:01",
                              "2026-01-01 00:00:02"]),
    })
    st = FakeState(None, timed_out=False)
    [out] = list(track(("c1",), [pdf], st))
    assert st.timeout_set == 5000 and not st.removed
    assert st.updated[0] == 3 and st.updated[1] == 1  # n_events, max_turn
    r = out.iloc[0]
    assert (r.n_events, r.n_turns, r.n_deletes, bool(r.closed)) == (3, 2, 1, False)
    # 2) timer fires: closed row from stored state, state removed
    st2 = FakeState(st.updated, timed_out=True)
    [fin] = list(track(("c1",), iter([]), st2))
    assert st2.removed
    f = fin.iloc[0]
    assert bool(f.closed) and f.n_events == 3 and f.n_turns == 2
    assert f.last_ts == pd.Timestamp("2026-01-01 00:00:02")
