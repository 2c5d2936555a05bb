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
