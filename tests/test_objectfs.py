"""Object-store LakeFS backend: the full lake lifecycle through ObjectFS.

The reference reaches remote bytes through per-plugin transports
(ftpreader/FtpReader.java, ossreader/OssReader.java); a shared lake table
instead needs its METADATA on an object store with conditional-PUT publish.
These tests run LakeTable end-to-end over ObjectFS(LocalEmulatedObjectStore)
— which only exposes object semantics (whole-object PUT, create-if-absent,
prefix LIST; no mkdir/rename) — and prove the commit protocol survives
injected publish races.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.objectstore import LocalEmulatedObjectStore, ObjectFS
from datax_spark.lake.table import CommitConflict, LakeTable

TS = dt.datetime(2025, 1, 1)


def _mk(spark, tmp_path, **kw):
    fs = ObjectFS(LocalEmulatedObjectStore())
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA_V1,
        bucket_key="conv_id", n_buckets=kw.pop("n_buckets", 8), fs=fs, **kw,
    )
    return t, fs


def _rows(spark, items):
    return spark.createDataFrame(items, TRANSCRIPTS_SCHEMA_V1)


def test_lifecycle_through_object_store(spark, tmp_path):
    """create → append → merge (upsert+delete) → compact → rebucket →
    read_changes → vacuum, all metadata via object semantics only."""
    t, fs = _mk(spark, tmp_path)
    t.append(_rows(spark, [(f"c{i}", 0, "user", f"m{i}", TS) for i in range(40)]))
    assert LakeTable.exists(t.root, fs=fs)
    assert not LakeTable.exists(str(tmp_path / "nope"), fs=fs)

    src_schema = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields) + [T.StructField("op", T.StringType())]
    )
    t.merge(
        spark.createDataFrame(
            [("c0", 0, "user", "patched", TS, "U"), ("c1", 0, "user", None, TS, "D")],
            src_schema,
        ),
        key_cols=["conv_id", "turn_idx"],
    )
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got["c0"] == "patched" and "c1" not in got and len(got) == 39

    t.compact()
    assert not t.snapshot().has_deltas()
    t.rebucket(4)
    assert t.lookup(["c0"]).collect()[0].text == "patched"

    ch = t.read_changes(0)
    assert ch.where(F.col("_change_type") == "delete").count() >= 1

    # vacuum drops orphaned staging files through the store API
    removed = t.vacuum(keep_last=1)
    assert t.read().count() == 39
    assert isinstance(removed, (int, list))


def test_reads_equal_localfs(spark, tmp_path):
    """Same operations over LocalFS and ObjectFS yield identical tables."""
    t_obj, _ = _mk(spark, tmp_path)
    t_loc = LakeTable.create(
        spark, str(tmp_path / "loc"), TRANSCRIPTS_SCHEMA_V1,
        bucket_key="conv_id", n_buckets=8,
    )
    rows = [(f"c{i}", i % 3, "user", f"m{i}", TS) for i in range(60)]
    for t in (t_obj, t_loc):
        t.append(_rows(spark, rows))
    a = sorted(map(tuple, t_obj.read().drop("ts").collect()))
    b = sorted(map(tuple, t_loc.read().drop("ts").collect()))
    assert a == b


def test_conditional_put_loses_injected_race(spark, tmp_path):
    """A publish that loses the race window (competing object created between
    decision and PUT) must surface CommitConflict — never overwrite."""
    t, fs = _mk(spark, tmp_path)
    t.append(_rows(spark, [("c1", 0, "user", "x", TS)]))

    store: LocalEmulatedObjectStore = fs.store
    winner = ObjectFS(LocalEmulatedObjectStore())

    def inject(key):
        store.race_hook = None  # fire once
        snap = t.snapshot()  # current = v1; loser is publishing v2
        winner.publish_atomic(key, json.dumps(dict(
            t.snapshot().to_json(), version=snap.version + 1)))

    store.race_hook = inject
    with pytest.raises(CommitConflict):
        # non-commutative commit: rebase after the injected conflict sees the
        # winner's (identical-files) snapshot — bucket untouched, so the FIRST
        # publish_atomic collision is what must raise, then the rebase retries
        # v3 and succeeds; force a pure conflict by exhausting retries
        t._rebase_commit(
            t.snapshot(), {"0": ("replace", [])}, operation="apply_cdc",
            max_retries=0,
        )
    assert store.race_hook is None  # the injected competing publish happened


def test_store_enforces_create_if_absent(tmp_path):
    s = LocalEmulatedObjectStore()
    key = str(tmp_path / "obj" / "a.json")
    s.put_object(key, b"one", if_none_match=True)
    with pytest.raises(FileExistsError):
        s.put_object(key, b"two", if_none_match=True)
    assert s.get_object(key) == b"one"  # loser never corrupted the object
    s.put_object(key, b"three")  # unconditional PUT overwrites
    assert s.get_object(key) == b"three"
    assert s.head_object(key) == 5
    s.delete_object(key)
    assert s.list_objects(str(tmp_path / "obj")) == []


def test_objectfs_prefix_semantics(tmp_path):
    fs = ObjectFS(LocalEmulatedObjectStore())
    root = str(tmp_path / "pfx")
    assert not fs.isdir(root)  # no objects → prefix does not exist
    fs.makedirs(root)  # no-op: still no objects
    assert not fs.isdir(root)
    fs.publish_atomic(os.path.join(root, "meta", "v0.json"), "{}")
    fs.publish_atomic(os.path.join(root, "meta", "v1.json"), "{}")
    fs.publish_atomic(os.path.join(root, "data", "f.parquet"), "bytes")
    assert fs.isdir(root) and fs.isdir(os.path.join(root, "meta"))
    assert fs.listdir(root) == ["data", "meta"]  # immediate children only
    assert fs.listdir(os.path.join(root, "meta")) == ["v0.json", "v1.json"]
    assert sorted(fs.walk_files(root)) == [
        os.path.join(root, "data", "f.parquet"),
        os.path.join(root, "meta", "v0.json"),
        os.path.join(root, "meta", "v1.json"),
    ]
    assert fs.read_text(os.path.join(root, "meta", "v0.json")) == "{}"


def test_cdc_engine_runs_on_object_store(spark, tmp_path):
    """The CDC apply path (delta layers, quarantine, lineage) works when the
    table's metadata FS is an object store."""
    from datax_spark.cdc import CdcEngine, ChangeFeedSpec, EngineConfig, generate_change_feed
    from datax_spark.cdc.oracle import fold_feed

    feed = str(tmp_path / "feed")
    generate_change_feed(
        spark, feed, ChangeFeedSpec(seed=7, n_convs=120, n_epochs=3, shards_per_epoch=8)
    )
    fs = ObjectFS(LocalEmulatedObjectStore())
    root = str(tmp_path / "t2")
    LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, "conv_id", n_buckets=8, fs=fs)
    eng = CdcEngine(
        spark,
        EngineConfig(table_root=root, feed_dir=feed,
                     checkpoint_dir=str(tmp_path / "ckpt")),
        fs=fs,
    )
    eng.run()
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in LakeTable(spark, root, fs=fs).read().collect()}
    want = {(r["conv_id"], r["turn_idx"]): r["text"] for r in fold_feed(feed)}
    assert got == want
