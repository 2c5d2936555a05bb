"""Bucket-count evolution (LakeTable.rebucket): the growth path for tables
that outlive their initial layout — 64 buckets sized for 10^8 rows overflow
per-task memory at 10^10, so the layout must be able to scale with the table
without breaking readers, the changelog, or a mid-replay CDC engine."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from datax_spark.cdc.engine import CdcEngine, EngineConfig
from datax_spark.cdc.generator import ChangeFeedSpec, generate_change_feed
from datax_spark.cdc.oracle import fold_feed
from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import LakeTable

TS = dt.datetime(2025, 1, 1)


def _state(df):
    return sorted(
        (d["conv_id"], d["turn_idx"], d["role"], d["text"], d.get("tool"))
        for d in (r.asDict() for r in df.collect())
    )


def _run_engine(spark, tmp_path, n_buckets=8, n_epochs=4, seed=31, **eng_kw):
    feed = str(tmp_path / "feed")
    spec = ChangeFeedSpec(seed=seed, n_convs=120, n_epochs=n_epochs,
                          update_rate=0.7, delete_prob=0.1, shards_per_epoch=8)
    generate_change_feed(spark, feed, spec)
    root = str(tmp_path / "table")
    LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1,
                     bucket_key="conv_id", n_buckets=n_buckets)
    return CdcEngine(spark, EngineConfig(
        table_root=root, feed_dir=feed,
        checkpoint_dir=str(tmp_path / "ckpt"),
        write_mode="mor", compact_threshold=100, **eng_kw,
    ))


def test_rebucket_preserves_state_and_folds_deltas(spark, tmp_path):
    eng = _run_engine(spark, tmp_path)
    eng.run()
    t = eng.table
    before = _state(t.read())
    assert t.snapshot().has_deltas()  # threshold=100: deltas accumulated
    v = t.current_version()

    snap = t.rebucket(16)
    assert snap.n_buckets == 16
    assert snap.version == v + 1
    assert not snap.has_deltas()  # rebucket is also a full compaction
    assert _state(t.read()) == before
    # every bucket id now within the new modulus and properly steered
    assert all(0 <= int(b) < 16 for b in snap.files)
    # bucket pruning still finds each conv in exactly one bucket
    some_conv = before[0][0]
    hits = [
        b for b in snap.files
        if t.read(buckets=[int(b)]).filter(f"conv_id = '{some_conv}'").count() > 0
    ]
    assert len(hits) == 1


def test_merge_continues_after_rebucket(spark, tmp_path):
    eng = _run_engine(spark, tmp_path, n_epochs=2)
    eng.run()
    t = eng.table
    t.rebucket(3)
    src_schema = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields) + [T.StructField("op", T.StringType())]
    )
    conv = t.read().select("conv_id").first()[0]
    t.merge(
        spark.createDataFrame([(conv, 0, "user", "post-rebucket", TS, "U")], src_schema),
        key_cols=["conv_id", "turn_idx"],
    )
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in t.read().filter(f"conv_id = '{conv}'").collect()
    }
    assert got[(conv, 0)] == "post-rebucket"


def test_rebucket_is_changelog_noop(spark, tmp_path):
    eng = _run_engine(spark, tmp_path, n_epochs=2)
    eng.run()
    t = eng.table
    v = t.current_version()
    t.rebucket(16)
    assert t.read_changes(v).count() == 0  # no live-row change emitted


def test_engine_resumes_generic_path_after_rebucket(spark, tmp_path):
    """Feed sharded for the old modulus must still apply correctly after a
    mid-replay rebucket (engine re-checks alignment per epoch and falls back
    to the generic shuffle apply)."""
    eng = _run_engine(spark, tmp_path, n_epochs=4, seed=47)
    eng.run(through_epoch=1)
    eng.table.rebucket(5)  # feed shards (8) no longer match buckets (5)

    eng2 = CdcEngine(spark, eng.cfg)
    eng2.run()
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r.get("tool"))
        for r in fold_feed(eng.cfg.feed_dir)
    )
    assert _state(eng2.table.read()) == want
    assert eng2.table.snapshot().n_buckets == 5
