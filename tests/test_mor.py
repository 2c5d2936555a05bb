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
    # bounded metadata: keep_last snapshot JSONs (+ at most one retained
    # manifest-list BASE version), and only manifests the kept snapshots
    # reference — vacuum swept everything else
    vfiles = [n for n in metas if n.startswith("v")]
    assert len(vfiles) <= 3  # 2 kept + <=1 delta base
    live = set()
    for n in vfiles:
        s = eng.table.snapshot(int(n[1:-5]))
        if s.manifest_refs is not None:
            live |= {r["path"] for r in s.manifest_refs.values()}
    mfiles = {n for n in metas if n.startswith("m-")}
    assert mfiles <= live
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


def test_mor_nested_payload_roundtrip(spark, tmp_path):
    """MoR delta layers with struct/array/map payload columns: write, merged
    read, and compaction must all survive nested types (round 1 raised
    TypeError in _arrow_schema_for, leaving the table unreadable)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("doc", T.StructType([
            T.StructField("a", T.IntegerType()),
            T.StructField("b", T.StringType()),
        ])),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ])
    root = str(tmp_path / "nested")
    t = LakeTable.create(spark, root, schema, bucket_key="k", n_buckets=4)

    def src(rows):
        return spark.createDataFrame(
            rows, "k string, doc struct<a:int,b:string>, tags array<string>, "
                  "attrs map<string,string>, seq long, op string")

    t.apply_cdc_stats(
        src([("x", (1, "one"), ["t1"], {"m": "1"}, 1, "I"),
             ("y", (2, "two"), ["t2"], {"m": "2"}, 2, "I")]),
        key_cols=["k"], write_mode="mor", compact_threshold=100)
    snap, _ = t.apply_cdc_stats(
        src([("x", (3, "three"), ["t3", "t4"], {"m": "3"}, 3, "U"),
             ("y", None, None, None, 4, "D")]),
        key_cols=["k"], write_mode="mor", compact_threshold=100)
    assert snap.has_deltas()
    rows = {r["k"]: r for r in t.read().collect()}
    assert set(rows) == {"x"}
    assert rows["x"]["doc"]["a"] == 3 and rows["x"]["tags"] == ["t3", "t4"]
    assert rows["x"]["attrs"] == {"m": "3"}
    t.compact()
    assert not t.snapshot().has_deltas()
    rows2 = {r["k"]: r for r in t.read().collect()}
    assert rows2["x"]["doc"]["b"] == "three" and rows2["x"]["attrs"] == {"m": "3"}


def test_append_on_mor_snapshot_rejected(spark, tmp_path):
    eng = _run(spark, tmp_path, "mor", threshold=100, n_epochs=2, seed=91)
    assert eng.table.snapshot().has_deltas()
    extra = spark.createDataFrame(
        [("zzz", 0, "user", "hi", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    with pytest.raises(ValueError, match="compact"):
        eng.table.append(extra)
    eng.table.compact()
    eng.table.append(extra)  # fine on a delta-free snapshot
    assert ("zzz", 0, "user", "hi", None) in _state(eng.table.read())


def test_live_row_count_vs_physical(spark, tmp_path):
    eng = _run(spark, tmp_path, "mor", threshold=100, n_epochs=4, seed=92)
    snap = eng.table.snapshot()
    live = eng.table.live_row_count()
    assert live == eng.table.read().count()
    # physical rows include superseded versions + delete markers on MoR
    assert snap.total_rows() > live


def test_empty_read_projection(spark, tmp_path):
    from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1 as S

    root = str(tmp_path / "empty-proj")
    t = LakeTable.create(spark, root, S, bucket_key="conv_id", n_buckets=4)
    df = t.read(columns=["conv_id", "text"])
    assert df.columns == ["conv_id", "text"] and df.count() == 0


def test_null_shard_quarantined_without_validator(spark, tmp_path):
    """NULL-key shard files must be quarantined (counted) even when no
    arrow_validator is installed — never silently dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1 as S

    root = str(tmp_path / "nullshard")
    t = LakeTable.create(spark, root, S, bucket_key="conv_id", n_buckets=4)
    nf = str(tmp_path / "null-shard.parquet")
    pq.write_table(pa.table({
        "conv_id": pa.array([None, None], pa.string()),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", "user"]),
        "text": pa.array(["a", "b"]),
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([None, None], pa.timestamp("us", tz="UTC")),
        "seq": pa.array([1, 2], pa.int64()),
        "op": pa.array(["I", "I"]),
    }), nf)
    snap, stats = t.apply_cdc_files(
        {None: [nf]}, key_cols=["conv_id", "turn_idx"],
        arrow_validator=None, quarantine_dir=str(tmp_path / "q"),
    )
    assert stats["dirty"] == {"null_key": 2}
    assert t.read().count() == 0


def test_generator_null_conv_id_lands_in_default_partition(spark, tmp_path):
    import os

    feed = str(tmp_path / "feed-null")
    spec = ChangeFeedSpec(seed=13, n_convs=80, n_epochs=2, dirty_frac=0.2)
    generate_change_feed(spark, feed, spec)
    shard_dirs = {
        d for e in os.listdir(feed) if e.startswith("epoch=")
        for d in os.listdir(os.path.join(feed, e)) if d.startswith("shard=")
    }
    assert "shard=__HIVE_DEFAULT_PARTITION__" in shard_dirs
