"""Merge-on-read write mode: delta layers, compaction, merged reads.

The engine's default write path mirrors the Iceberg v2 equality-delete design
(Flink CDC → Iceberg): each epoch lands as per-bucket delta files holding the
latest-per-key upserts+deletes, readers resolve newest-gen-wins at scan time,
and buckets compact into a fresh base once they accumulate compact_threshold
layers — per-epoch write cost is O(epoch events), not O(table)."""

from __future__ import annotations

import pytest

from datax_spark.cdc.engine import CdcEngine, EngineConfig
from datax_spark.cdc.generator import ChangeFeedSpec, generate_change_feed
from datax_spark.cdc.oracle import fold_feed
from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import LakeTable


def _state(df):
    return sorted(
        (d["conv_id"], d["turn_idx"], d["role"], d["text"], d.get("tool"))
        for d in (r.asDict() for r in df.collect())
    )


def _oracle_state(feed_dir, max_epoch=None):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r.get("tool"))
        for r in fold_feed(feed_dir, max_epoch=max_epoch)
    )


def _run(spark, tmp_path, mode, threshold, n_epochs=6, seed=77):
    feed = str(tmp_path / f"feed-{seed}")
    spec = ChangeFeedSpec(seed=seed, n_convs=120, n_epochs=n_epochs,
                          update_rate=0.8, delete_prob=0.15)
    generate_change_feed(spark, feed, spec)
    root = str(tmp_path / f"table-{mode}-{threshold}")
    LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, bucket_key="conv_id", n_buckets=8)
    eng = CdcEngine(spark, EngineConfig(
        table_root=root, feed_dir=feed,
        checkpoint_dir=str(tmp_path / f"ckpt-{mode}-{threshold}"),
        write_mode=mode, compact_threshold=threshold,
    ))
    eng.run()
    return eng


def test_mor_matches_oracle_and_accumulates_deltas(spark, tmp_path):
    eng = _run(spark, tmp_path, "mor", threshold=100)  # never compacts
    snap = eng.table.snapshot()
    kinds = {f.get("kind") for fl in snap.files.values() for f in fl}
    assert kinds == {"delta"}  # every epoch stayed a delta layer
    assert _state(eng.table.read()) == _oracle_state(eng.cfg.feed_dir)


def test_mor_compaction_mid_replay_matches_oracle(spark, tmp_path):
    eng = _run(spark, tmp_path, "mor", threshold=3)  # compacts repeatedly
    snap = eng.table.snapshot()
    kinds = {f.get("kind") for fl in snap.files.values() for f in fl}
    assert "base" in kinds  # compaction happened
    assert _state(eng.table.read()) == _oracle_state(eng.cfg.feed_dir)
    # compacted buckets hold fewer layers than epochs applied
    max_layers = max(len(fl) for fl in snap.files.values())
    assert max_layers < 6


def test_mor_equals_cow_final_state(spark, tmp_path):
    mor = _run(spark, tmp_path, "mor", threshold=4, seed=88)
    cow = _run(spark, tmp_path, "cow", threshold=4, seed=88)
    assert _state(mor.table.read()) == _state(cow.table.read())


def test_mor_time_travel_reads_delta_snapshots(spark, tmp_path):
    eng = _run(spark, tmp_path, "mor", threshold=100, seed=99)
    # version after the 2nd epoch commit: create@1 (+1 evolve snapshot at the
    # evolution epoch) — resolve by walking manifests instead of guessing
    import json, os

    commits = sorted(os.listdir(os.path.join(eng.cfg.checkpoint_dir, "commits")))
    with open(os.path.join(eng.cfg.checkpoint_dir, "commits", commits[1])) as f:
        v2 = json.load(f)["snapshot_version"]
    got = _state(eng.table.read(version=v2))
    want = _oracle_state(eng.cfg.feed_dir, max_epoch=1)
    assert got == want


def test_explicit_compact_maintenance(spark, tmp_path):
    """LakeTable.compact(): fold all delta layers into fresh bases off the
    ingest path (rewrite_data_files parity); state preserved, fast reads back."""
    eng = _run(spark, tmp_path, "mor", threshold=100, seed=66)  # all deltas
    want = _state(eng.table.read())
    snap = eng.table.compact()
    kinds = {f.get("kind") for fl in snap.files.values() for f in fl}
    assert kinds == {"base"}
    assert all(len(fl) <= 1 for fl in snap.files.values())
    assert not snap.has_deltas()
    assert _state(eng.table.read()) == want == _oracle_state(eng.cfg.feed_dir)
    # idempotent no-op when nothing to compact
    assert eng.table.compact().version == snap.version


def test_mor_read_column_pruning(spark, tmp_path):
    """read(columns=...) pushes projection into the per-file parquet reads of
    the merge-on-read scan; key columns are still available for the cascade."""
    eng = _run(spark, tmp_path, "mor", threshold=100, seed=33)
    pruned = eng.table.read(columns=["conv_id", "turn_idx", "role"])
    assert pruned.columns == ["conv_id", "turn_idx", "role"]
    full = eng.table.read()
    assert sorted((r["conv_id"], r["turn_idx"], r["role"]) for r in pruned.collect()) == \
        sorted((r["conv_id"], r["turn_idx"], r["role"]) for r in full.collect())
    # projection not containing all keys still works
    texts = eng.table.read(columns=["text"])
    assert texts.columns == ["text"] and texts.count() == full.count()


def test_engine_auto_vacuum_bounds_snapshots(spark, tmp_path):
    """vacuum_keep_last expires old snapshots after each commit — disk stays
    bounded on long replays; final state unaffected."""
    import os

    feed = str(tmp_path / "feed-v")
    spec = ChangeFeedSpec(seed=44, n_convs=100, n_epochs=5, update_rate=0.6)
    generate_change_feed(spark, feed, spec)
    root = str(tmp_path / "table-v")
    LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, bucket_key="conv_id", n_buckets=8)
    eng = CdcEngine(spark, EngineConfig(
        table_root=root, feed_dir=feed, checkpoint_dir=str(tmp_path / "ckpt-v"),
        vacuum_keep_last=2,
    ))
    eng.run()
    metas = [n for n in os.listdir(os.path.join(root, "_meta")) if n.endswith(".json")]
    assert len(metas) <= 2
    assert _state(eng.table.read()) == _oracle_state(feed)


def test_mor_read_bucket_pruning(spark, tmp_path):
    eng = _run(spark, tmp_path, "mor", threshold=3, seed=55)
    full = eng.table.read()
    some = eng.table.read(buckets=[0, 3])
    assert 0 < some.count() < full.count()
    # pruned read equals the full read filtered to those buckets
    from pyspark.sql import functions as F

    snap = eng.table.snapshot()
    b = F.pmod(F.xxhash64(F.col("conv_id").cast("string")), F.lit(snap.n_buckets))
    want = full.withColumn("_b", b).filter(F.col("_b").isin(0, 3)).drop("_b")
    assert _state(some) == _state(want)
