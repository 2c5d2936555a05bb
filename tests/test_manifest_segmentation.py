"""Per-bucket manifest segmentation (Iceberg manifest-list analog).

Round-3 verdict item: one monolithic snapshot JSON per commit was the first
thing to break at 100 TB — every commit rewrote the full file inventory and
every snapshot load parsed it. Now the snapshot JSON holds only a manifest
LIST (per-bucket refs + summaries); each bucket's file list lives in its own
immutable manifest file, reused by ref across snapshots. These tests pin the
load-bearing properties: commit payload is O(touched buckets), summaries
answer metadata questions without parsing manifests, vacuum collects orphan
manifests, and legacy monolithic snapshots still load.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable, Snapshot, _snapshot_name

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.LongType()),
])


def _mk(spark, tmp_path, n_buckets=16):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k",
                            n_buckets=n_buckets)


def _events(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, seq long, op string")


def _meta_files(t):
    meta = os.path.join(t.root, "_meta")
    return sorted(os.listdir(meta))


def test_commit_writes_only_touched_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # seed every bucket
    t.apply_cdc_stats(
        _events(spark, [(f"k{i}", i, 1, "I") for i in range(200)]),
        key_cols=["k"], op_col="op", seq_col="seq",
    )
    parent = t.snapshot()
    before = set(_meta_files(t))

    # apply touching ONE key → one bucket
    t.apply_cdc_stats(_events(spark, [("k0", 99, 2, "U")]),
                      key_cols=["k"], op_col="op", seq_col="seq")
    cur = t.snapshot()
    new_meta = set(_meta_files(t)) - before
    new_manifests = [n for n in new_meta if n.startswith("m-")]
    new_snapshots = [n for n in new_meta if n.startswith("v")]
    assert len(new_snapshots) == 1
    assert len(new_manifests) == 1, (
        f"a 1-bucket apply must write exactly 1 manifest, got {new_manifests}")

    # every untouched bucket's ref is IDENTICAL (reused by path)
    changed = [b for b in cur.manifest_refs
               if cur.manifest_refs[b]["path"]
               != (parent.manifest_refs.get(b) or {}).get("path")]
    assert len(changed) == 1


def test_snapshot_json_holds_no_file_lists(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.apply_cdc_stats(
        _events(spark, [(f"k{i}", i, 1, "I") for i in range(100)]),
        key_cols=["k"], op_col="op", seq_col="seq",
    )
    v = t.current_version()
    d = json.loads(open(os.path.join(t.root, "_meta", _snapshot_name(v))).read())
    assert "files" not in d
    # either the full manifest list or the delta-vs-base form; refs are
    # compact arrays [uuid-hex, files, rows, deltas01]
    enc = d.get("manifests") or d["manifests_delta"]
    ref = next(e for e in enc.values() if e is not None)
    assert isinstance(ref, list) and len(ref) == 4
    snap = t.snapshot()  # merged view decodes back to dict refs
    r = next(iter(snap.manifest_refs.values()))
    assert set(r) == {"path", "files", "rows", "deltas"}


def test_summaries_answer_metadata_without_manifest_loads(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.apply_cdc_stats(
        _events(spark, [(f"k{i}", i, 1, "I") for i in range(100)]),
        key_cols=["k"], op_col="op", seq_col="seq", write_mode="mor",
    )
    snap = t.snapshot()

    class Boom:
        def __getattr__(self, name):
            raise AssertionError("manifest loaded for a summary-only question")

    # sabotage the loader: summaries must not touch it
    frozen = Snapshot(snap.version, snap.schema, snap.bucket_key,
                      snap.n_buckets, Boom(), snap.properties,
                      manifest_refs=snap.manifest_refs)
    assert frozen.total_rows() == 100
    assert frozen.has_deltas() is True
    # history() must also come from summaries (no manifest parse)
    h = t.history()
    assert h[-1]["rows"] == 100 and h[-1]["files"] >= 1


def test_lazy_load_is_per_bucket(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=8)
    t.apply_cdc_stats(
        _events(spark, [(f"k{i}", i, 1, "I") for i in range(200)]),
        key_cols=["k"], op_col="op", seq_col="seq",
    )
    snap = t.snapshot()
    some_bucket = next(iter(snap.manifest_refs))
    fl = snap.files[some_bucket]
    assert fl and all("path" in f for f in fl)
    # only the requested bucket was cached
    assert set(snap.files._cache) == {some_bucket}


def test_metadata_only_commits_write_zero_manifests(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.apply_cdc_stats(
        _events(spark, [(f"k{i}", i, 1, "I") for i in range(50)]),
        key_cols=["k"], op_col="op", seq_col="seq",
    )
    before = set(_meta_files(t))
    t.add_columns([T.StructField("extra", T.StringType())])
    new = set(_meta_files(t)) - before
    assert all(n.startswith("v") for n in new), f"manifests written: {new}"
    assert t.read().columns == ["k", "v", "extra"]


def test_vacuum_collects_orphan_manifests(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=4)
    for i in range(4):
        t.apply_cdc_stats(_events(spark, [(f"k{i}", i, i + 1, "I")]),
                          key_cols=["k"], op_col="op", seq_col="seq")
    t.compact()
    t.vacuum(keep_last=1)
    snap = t.snapshot()
    live = {r["path"] for r in snap.manifest_refs.values()}
    on_disk = {n for n in _meta_files(t) if n.startswith("m-")}
    assert on_disk == live, f"orphans survived vacuum: {on_disk - live}"
    assert {r["k"] for r in t.read().collect()} == {"k0", "k1", "k2", "k3"}


def test_legacy_monolithic_snapshot_still_loads(spark, tmp_path):
    """A v1-format snapshot (inline "files") in the chain — written by an
    older build or an external tool — loads, reads, and the NEXT commit
    migrates it to segmented refs."""
    t = _mk(spark, tmp_path, n_buckets=4)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    snap = t.snapshot()
    # rewrite the current snapshot file in the legacy monolithic form
    path = os.path.join(t.root, "_meta", _snapshot_name(snap.version))
    os.remove(path)
    with open(path, "w") as f:
        json.dump(snap.to_json(), f)

    t2 = LakeTable(spark, t.root)
    legacy = t2.snapshot()
    assert legacy.manifest_refs is None
    assert {r["k"] for r in t2.read().collect()} == {"a", "b"}

    t2.append(spark.createDataFrame([("c", 3)], SCHEMA))
    migrated = t2.snapshot()
    assert migrated.manifest_refs is not None
    assert {r["k"] for r in t2.read().collect()} == {"a", "b", "c"}


def test_classify_commit_fast_path_matches_generic(spark, tmp_path):
    """Changelog classification through identical-ref skipping must equal
    the generic full comparison (the batch/stream changelog depends on it)."""
    from datax_spark.lake.table import classify_commit

    t = _mk(spark, tmp_path, n_buckets=8)
    t.apply_cdc_stats(
        _events(spark, [(f"k{i}", i, 1, "I") for i in range(64)]),
        key_cols=["k"], op_col="op", seq_col="seq", write_mode="mor",
    )
    t.apply_cdc_stats(_events(spark, [("k1", 100, 2, "U"), ("k2", -1, 3, "D")]),
                      key_cols=["k"], op_col="op", seq_col="seq",
                      write_mode="mor")
    parent, cur = t.snapshot(t.current_version() - 1), t.snapshot()
    fast = classify_commit(parent, cur)

    # strip refs → generic path over the same data
    p2 = Snapshot(parent.version, parent.schema, parent.bucket_key,
                  parent.n_buckets, dict(parent.files), parent.properties)
    c2 = Snapshot(cur.version, cur.schema, cur.bucket_key,
                  cur.n_buckets, dict(cur.files), cur.properties)
    generic = classify_commit(p2, c2)
    assert fast == generic
    assert fast["delta_buckets"]  # non-vacuous


def test_delta_manifest_list_rewrites_full_at_threshold(spark, tmp_path):
    """Small commits store a cumulative DELTA against the nearest full
    manifest list; when the delta outgrows max(64, n_buckets/4) entries the
    full list is rewritten — the chain never exceeds depth 1 (every load is
    at most two JSON parses)."""
    t = _mk(spark, tmp_path, n_buckets=8)
    t.apply_cdc_stats(
        _events(spark, [(f"k{i}", i, 1, "I") for i in range(64)]),
        key_cols=["k"], op_col="op", seq_col="seq",
    )
    s = t.snapshot()
    # 8 buckets <= threshold 64 → delta form based on v0
    assert s.manifest_base == 0 and len(s.manifest_delta) == 8
    for i in range(3):
        t.apply_cdc_stats(_events(spark, [(f"k{i}", 100 + i, 10 + i, "U")]),
                          key_cols=["k"], op_col="op", seq_col="seq")
    s2 = t.snapshot()
    assert s2.manifest_base == 0  # still the v0 base, delta stays bounded
    assert len(s2.manifest_delta) == 8
    assert t.read().count() == 64  # merged view correct through the chain


def test_vacuum_keeps_delta_base_snapshot_json(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=4)
    for i in range(5):
        t.apply_cdc_stats(_events(spark, [(f"k{i}", i, i + 1, "I")]),
                          key_cols=["k"], op_col="op", seq_col="seq")
    cur = t.snapshot()
    assert cur.manifest_base is not None and cur.manifest_base < cur.version
    t.vacuum(keep_last=1)
    # the base's manifest LIST survives vacuum (the delta resolves through
    # it) — but under the b*.json side name, so the live v*.json sequence
    # stays contiguous for the version-hint probe-forward heal
    assert not os.path.exists(
        os.path.join(t.root, "_meta", _snapshot_name(cur.manifest_base)))
    assert os.path.exists(
        os.path.join(t.root, "_meta", f"b{cur.manifest_base:012d}.json"))
    from datax_spark.lake import table as tb
    tb._BASE_REFS_CACHE.clear()  # force base re-resolution from disk
    t2 = LakeTable(spark, t.root)
    assert t2.read().count() == 5
    # and the table still commits + reads after expiry
    t2.apply_cdc_stats(_events(spark, [("k9", 9, 99, "I")]),
                       key_cols=["k"], op_col="op", seq_col="seq")
    assert t2.read().count() == 6
