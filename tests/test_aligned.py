"""Zero-shuffle aligned apply: feed shards == table buckets (same key hash).

When the feed's _dsx_feed.json declares conv_id-hash sharding with modulus
equal to the table's bucket count, the engine merges each bucket's shard files
directly in one steered task set — no scan job, no exchange, no JVM→Python
transfer of the epoch (the storage-partitioned-join pattern applied to MERGE).
Arrow-side validation must mirror the Catalyst dirty rules exactly."""

from __future__ import annotations

import json
import os

import pytest

from datax_spark.cdc.engine import CdcEngine, DirtyLimitExceeded, EngineConfig
from datax_spark.cdc.generator import ChangeFeedSpec, generate_change_feed
from datax_spark.cdc.oracle import fold_feed
from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import LakeTable


def _state(df):
    return sorted(
        (d["conv_id"], d["turn_idx"], d["role"], d["text"], d.get("tool"))
        for d in (r.asDict() for r in df.collect())
    )


def _oracle_state(feed_dir):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r.get("tool"))
        for r in fold_feed(feed_dir)
    )


def _setup(spark, tmp_path, n_buckets, shards, tag="a", **spec_kw):
    feed = str(tmp_path / f"feed-{tag}")
    spec = ChangeFeedSpec(seed=31, n_convs=150, n_epochs=4, update_rate=0.7,
                          delete_prob=0.12, shards_per_epoch=shards, **spec_kw)
    generate_change_feed(spark, feed, spec)
    root = str(tmp_path / f"table-{tag}")
    LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, bucket_key="conv_id",
                     n_buckets=n_buckets)
    return CdcEngine(spark, EngineConfig(
        table_root=root, feed_dir=feed,
        checkpoint_dir=str(tmp_path / f"ckpt-{tag}"),
    ))


def _modes(eng):
    out = []
    for n in sorted(os.listdir(eng.commits_dir)):
        with open(os.path.join(eng.commits_dir, n)) as f:
            out.append(json.load(f).get("mode"))
    return out


def test_aligned_path_used_and_matches_oracle(spark, tmp_path):
    eng = _setup(spark, tmp_path, n_buckets=16, shards=16)
    eng.run()
    assert set(_modes(eng)) == {"aligned"}
    assert _state(eng.table.read()) == _oracle_state(eng.cfg.feed_dir)


def test_misaligned_falls_back_to_fused(spark, tmp_path):
    eng = _setup(spark, tmp_path, n_buckets=8, shards=16, tag="b")
    eng.run()
    assert set(_modes(eng)) == {"fused"}
    assert _state(eng.table.read()) == _oracle_state(eng.cfg.feed_dir)


def test_aligned_equals_fused_final_state(spark, tmp_path):
    a = _setup(spark, tmp_path, n_buckets=16, shards=16, tag="c")
    a.run()
    f = _setup(spark, tmp_path, n_buckets=16, shards=16, tag="d")
    f.cfg.aligned_feed = False
    f.run()
    assert set(_modes(f)) == {"fused"}
    assert _state(a.table.read()) == _state(f.table.read())


def test_aligned_dirty_quarantine_including_null_keys(spark, tmp_path):
    eng = _setup(spark, tmp_path, n_buckets=16, shards=16, tag="e",
                 dirty_frac=0.06)
    eng.run()
    assert set(_modes(eng)) == {"aligned"}
    assert _state(eng.table.read()) == _oracle_state(eng.cfg.feed_dir)
    q = spark.read.parquet(str(tmp_path / "ckpt-e" / "quarantine"))
    reasons = {r["_dirty_reason"] for r in q.select("_dirty_reason").distinct().collect()}
    assert "null_key" in reasons  # NULL conv_id rows (hive default shard dir)
    assert reasons <= {"null_key", "bad_turn_idx", "bad_op", "null_payload"}
    # quarantined exactly what the manifests counted
    total = sum(
        json.load(open(os.path.join(eng.commits_dir, n)))["dirty"]
        for n in os.listdir(eng.commits_dir)
    )
    assert q.count() == total > 0


def test_aligned_error_limit_aborts_without_commit(spark, tmp_path):
    eng = _setup(spark, tmp_path, n_buckets=16, shards=16, tag="g",
                 dirty_frac=0.25)
    eng.cfg.error_limit_count = 3
    v0 = eng.table.current_version()
    with pytest.raises(DirtyLimitExceeded):
        eng.run()
    assert eng.table.current_version() == v0  # no snapshot landed


def test_aligned_resume_is_noop(spark, tmp_path):
    eng = _setup(spark, tmp_path, n_buckets=16, shards=16, tag="h")
    eng.run()
    v = eng.table.current_version()
    s2 = eng.run()
    assert s2["epochs_applied"] == 0 and eng.table.current_version() == v
