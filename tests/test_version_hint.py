"""Version-hint fast path for latest-snapshot discovery.

At scale the ``_meta`` dir holds every per-bucket manifest file (buckets x
generations of ``m-*.json``), so discovering the latest version by LISTING
it — as every snapshot load and every streaming trigger did — pays a
paginated object-store LIST over tens of thousands of keys. The advisory
``LATEST`` hint (Iceberg's version-hint.text analog) makes discovery O(1)
object reads: read the hint, probe FORWARD one HEAD per missed commit, and
fall back to the listing only for legacy/corrupt/below-vacuum hints.
Correctness never depends on the hint; these tests pin that.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from datax_spark.lake.objectstore import LocalEmulatedObjectStore, ObjectFS
from datax_spark.lake.table import LakeTable, _snapshot_name

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.LongType()),
])


def _mk(spark, tmp_path, n_buckets=8):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k",
                            n_buckets=n_buckets)


def _events(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, seq long, op string")


def _apply(t, spark, rows):
    t.apply_cdc_stats(_events(spark, rows),
                      key_cols=["k"], op_col="op", seq_col="seq")


def _hint_path(t):
    return os.path.join(t.root, "_meta", "LATEST")


class _NoListFS:
    """Delegating fs proxy that fails the test if listdir is ever called —
    proves the hint fast path never LISTs the meta dir."""

    def __init__(self, inner):
        self._inner = inner

    def __getattr__(self, name):
        if name == "listdir":
            raise AssertionError("listdir called on the hint fast path")
        return getattr(self._inner, name)


def test_hint_written_and_no_listing_needed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, [("a", 1, 1, "I")])
    _apply(t, spark, [("a", 2, 2, "U")])
    v = t.snapshot().version
    with open(_hint_path(t)) as f:
        assert int(f.read().strip()) == v
    t.fs = _NoListFS(t.fs)
    assert t.current_version() == v
    assert t.snapshot().version == v  # full load path, still no listing


def test_stale_hint_probes_forward(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, [("a", 1, 1, "I")])
    _apply(t, spark, [("b", 2, 2, "I")])
    _apply(t, spark, [("c", 3, 3, "I")])
    latest = t.snapshot().version
    with open(_hint_path(t), "w") as f:  # slower committer overwrote newer
        f.write(str(latest - 2))
    t.fs = _NoListFS(t.fs)  # probe-forward must heal WITHOUT a listing
    assert t.current_version() == latest


def test_corrupt_and_missing_hint_fall_back(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, spark, [("a", 1, 1, "I")])
    latest = t.snapshot().version
    with open(_hint_path(t), "w") as f:
        f.write("not-a-version")
    assert t.current_version() == latest
    os.unlink(_hint_path(t))  # legacy table: no hint at all
    assert t.current_version() == latest
    # and the next commit restores it
    _apply(t, spark, [("b", 2, 2, "I")])
    with open(_hint_path(t)) as f:
        assert int(f.read().strip()) == latest + 1


def test_vacuum_keeps_and_refreshes_hint(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for i in range(5):
        _apply(t, spark, [(f"k{i}", i, i + 1, "I")])
    latest = t.snapshot().version
    with open(_hint_path(t), "w") as f:
        f.write("0")  # below the vacuum keep window AND about to be expired
    t.vacuum(keep_last=2)
    with open(_hint_path(t)) as f:
        assert int(f.read().strip()) == latest
    assert t.current_version() == latest
    # v0 is the kept snapshots' manifest-list BASE: its full list survives,
    # but under the b*.json side name — the v*.json sequence has no hole
    assert not t.fs.isfile(
        os.path.join(t.root, "_meta", _snapshot_name(0)))
    assert t.fs.isfile(os.path.join(t.root, "_meta", "b000000000000.json"))
    # the kept delta snapshots still resolve through the relocated base
    # (clear the process-wide decoded-base cache so resolution re-reads disk)
    from datax_spark.lake import table as tb
    tb._BASE_REFS_CACHE.clear()
    assert t.snapshot(latest).total_rows() == 5


def test_stale_hint_at_retained_base_does_not_time_travel(spark, tmp_path):
    """Regression: vacuum used to keep a delta base at its ORIGINAL v*.json
    name, leaving a hole (v0 kept, v1..v3 gone, v4..v5 kept). A stale hint
    pointing at v0 then probe-forwarded to the hole and silently returned
    version 0 as latest — time travel. With the base relocated to b*.json,
    the hint's target no longer exists and discovery falls back to the
    listing."""
    t = _mk(spark, tmp_path)
    for i in range(5):
        _apply(t, spark, [(f"k{i}", i, i + 1, "I")])
    latest = t.snapshot().version
    t.vacuum(keep_last=2)
    with open(_hint_path(t), "w") as f:
        f.write("0")  # stale hint at the retained (relocated) base version
    assert t.current_version() == latest
    from datax_spark.streaming import changelog as cl
    assert cl._current_version(t.root) == latest


def test_streaming_current_version_uses_hint(spark, tmp_path):
    from datax_spark.streaming import changelog as cl

    t = _mk(spark, tmp_path)
    _apply(t, spark, [("a", 1, 1, "I")])
    _apply(t, spark, [("b", 2, 2, "I")])
    latest = t.snapshot().version
    assert cl._current_version(t.root) == latest
    with open(_hint_path(t), "w") as f:
        f.write(str(latest - 1))  # stale → probe forward
    assert cl._current_version(t.root) == latest
    os.unlink(_hint_path(t))  # legacy → listing fallback
    assert cl._current_version(t.root) == latest


def test_objectfs_write_text_and_isfile(tmp_path):
    fs = ObjectFS(LocalEmulatedObjectStore())
    p = str(tmp_path / "obj" / "LATEST")
    assert not fs.isfile(p)
    fs.write_text(p, "7")
    assert fs.isfile(p)
    assert fs.read_text(p) == "7"
    fs.write_text(p, "8")  # unconditional overwrite (plain PUT)
    assert fs.read_text(p) == "8"


def test_objectfs_lifecycle_writes_hint(spark, tmp_path):
    fs = ObjectFS(LocalEmulatedObjectStore())
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, "k", n_buckets=4, fs=fs)
    _apply(t, spark, [("a", 1, 1, "I")])
    v = t.snapshot().version
    assert fs.read_text(os.path.join(root, "_meta", "LATEST")) == str(v)
    t.fs = _NoListFS(fs)
    assert t.current_version() == v
