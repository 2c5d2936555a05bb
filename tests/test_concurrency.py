"""Optimistic-concurrency commits: concurrent writers on one LakeTable.

The reference (DataX) assumes each job owns its sink exclusively; a lake table
shared by ingest + maintenance jobs cannot. These tests pin the
Iceberg-style commit-retry semantics of LakeTable._rebase_commit:

- commutative appends rebase across a lost race (all writers land),
- derived commits (apply_cdc / compact) rebase only when their touched
  buckets are untouched by the winner, else raise CommitConflict,
- a rebase never drops the concurrent winner's files.
"""

from __future__ import annotations

import datetime as dt
import threading

import pytest
from pyspark.sql import types as T

from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import CommitConflict, LakeTable

TS = dt.datetime(2025, 1, 1)


def _mk(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA_V1,
        bucket_key="conv_id", n_buckets=n_buckets,
    )


def _rows(spark, items):
    return spark.createDataFrame(items, TRANSCRIPTS_SCHEMA_V1)


def test_concurrent_appends_all_land(spark, tmp_path):
    """N threads append disjoint row sets; the retry loop absorbs every lost
    race and the final table holds the union (appends commute)."""
    t = _mk(spark, tmp_path)
    n_writers, rows_each = 6, 5
    errs: list[Exception] = []
    barrier = threading.Barrier(n_writers)

    def work(i: int) -> None:
        df = _rows(
            spark,
            [(f"w{i}-c{j}", 0, "user", f"msg {i}/{j}", TS) for j in range(rows_each)],
        )
        barrier.wait()
        try:
            LakeTable(spark, t.root).append(df)
        except Exception as e:  # noqa: BLE001 - collected for assertion
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    assert t.read().count() == n_writers * rows_each
    assert t.current_version() == n_writers  # one commit per writer


def test_rebase_preserves_winners_files_disjoint_buckets(spark, tmp_path):
    """A stale-parent replace commit on bucket set A rebases over a winner
    that touched other buckets, keeping both writers' files."""
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [(f"c{i}", 0, "user", "x", TS) for i in range(40)]))
    stale = t.snapshot()

    # winner: another writer updates conv c0 (some bucket set W)
    src_schema = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields) + [T.StructField("op", T.StringType())]
    )
    winner_src = spark.createDataFrame([("c0", 0, "user", "winner", TS, "U")], src_schema)
    LakeTable(spark, t.root).merge(winner_src, key_cols=["conv_id", "turn_idx"])
    winner_snap = t.snapshot()
    winner_buckets = {
        b for b in winner_snap.files
        if winner_snap.files[b] != stale.files.get(b, [])
    }
    # loser: rebases a replace on a bucket the winner did NOT touch
    loser_bucket = next(
        b for b in stale.files if b not in winner_buckets and stale.files[b]
    )
    new = t._rebase_commit(
        stale, {loser_bucket: ("replace", [])}, operation="apply_cdc"
    )
    assert new.version == winner_snap.version + 1
    # loser's change applied: the emptied bucket drops out of the manifest
    # list entirely (segmented metadata stores no ref for an empty bucket)
    assert new.files.get(loser_bucket, []) == []
    for b in winner_buckets:  # winner's files survived the rebase
        assert new.files[b] == winner_snap.files[b]


def test_rebase_conflicts_on_same_bucket(spark, tmp_path):
    """A derived (non-commutative) commit whose bucket the winner also
    changed must raise CommitConflict, not silently drop the winner."""
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [(f"c{i}", 0, "user", "x", TS) for i in range(40)]))
    stale = t.snapshot()

    src_schema = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields) + [T.StructField("op", T.StringType())]
    )
    LakeTable(spark, t.root).merge(
        spark.createDataFrame([("c0", 0, "user", "winner", TS, "U")], src_schema),
        key_cols=["conv_id", "turn_idx"],
    )
    winner_snap = t.snapshot()
    touched = next(
        b for b in winner_snap.files
        if winner_snap.files[b] != stale.files.get(b, [])
    )
    with pytest.raises(CommitConflict, match="re-plan"):
        t._rebase_commit(stale, {touched: ("replace", [])}, operation="apply_cdc")
    # table state is the winner's, untouched by the failed commit
    assert t.current_version() == winner_snap.version


def test_append_rebase_refuses_when_deltas_appear(spark, tmp_path):
    """Public append() that loses a race to a MoR delta writer must raise
    CommitConflict (its gen-ordering assumption broke), mirroring the
    serial-path ValueError."""
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [("c1", 0, "user", "x", TS)]))
    stale = t.snapshot()

    # winner commits a MoR delta layer after `stale` was read
    t._rebase_commit(
        stale,
        {"0": ("extend", [{"path": "data/fake-delta.parquet", "rows": 1,
                           "kind": "delta", "gen": 99}])},
        {"merge_keys": "conv_id,turn_idx"},
        operation="apply_cdc",
    )

    # loser: append() whose initial snapshot read happened before the winner —
    # feed it the stale snapshot once, then let the retry loop see reality
    real_snapshot = t.snapshot
    calls = {"n": 0}

    def stale_once(version=None):
        calls["n"] += 1
        return stale if calls["n"] == 1 and version is None else real_snapshot(version)

    t.snapshot = stale_once  # type: ignore[method-assign]
    try:
        with pytest.raises(CommitConflict, match="delta"):
            t.append(_rows(spark, [("c9", 0, "user", "late", TS)]))
    finally:
        del t.snapshot


def test_append_conflicts_when_racing_rebucket(spark, tmp_path):
    """ADVICE r2: an append that loses a commit race to rebucket() must raise
    CommitConflict — its files are hashed with the OLD bucket modulus, so a
    silent rebase would commit them under the new layout and bucket-pruned
    reads (lookup, colocated merges) would miss the rows."""
    t = _mk(spark, tmp_path, n_buckets=4)
    t.append(_rows(spark, [(f"c{i}", 0, "user", "x", TS) for i in range(16)]))
    stale = t.snapshot()
    t.rebucket(8)  # winner changes the layout

    # loser: append() whose snapshot read happened before the rebucket
    real_snapshot = t.snapshot
    calls = {"n": 0}

    def stale_once(version=None):
        calls["n"] += 1
        return stale if calls["n"] == 1 and version is None else real_snapshot(version)

    t.snapshot = stale_once  # type: ignore[method-assign]
    try:
        with pytest.raises(CommitConflict, match="layout"):
            t.append(_rows(spark, [("z1", 0, "user", "late", TS)]))
    finally:
        del t.snapshot
    # retry from fresh state succeeds and the row is bucket-findable
    t.append(_rows(spark, [("z1", 0, "user", "late", TS)]))
    assert t.lookup(["z1"]).count() == 1


def test_overwrite_conflicts_when_racing_rebucket(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=4)
    t.append(_rows(spark, [(f"c{i}", 0, "user", "x", TS) for i in range(16)]))
    stale = t.snapshot()
    t.rebucket(8)

    real_snapshot = t.snapshot
    calls = {"n": 0}

    def stale_once(version=None):
        calls["n"] += 1
        return stale if calls["n"] == 1 and version is None else real_snapshot(version)

    t.snapshot = stale_once  # type: ignore[method-assign]
    try:
        with pytest.raises(CommitConflict, match="layout"):
            t.overwrite(_rows(spark, [("z1", 0, "user", "ow", TS)]))
    finally:
        del t.snapshot


def test_concurrent_merge_and_compact_distinct_buckets(spark, tmp_path):
    """apply_cdc (merge) and compact racing on disjoint buckets both land."""
    t = _mk(spark, tmp_path, n_buckets=8)
    t.append(_rows(spark, [(f"c{i}", 0, "user", "x", TS) for i in range(64)]))
    src_schema = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields) + [T.StructField("op", T.StringType())]
    )

    errs: list[Exception] = []
    barrier = threading.Barrier(2)

    def do_merge() -> None:
        barrier.wait()
        try:
            LakeTable(spark, t.root).merge(
                spark.createDataFrame(
                    [(f"c{i}", 0, "user", "merged", TS, "U") for i in range(8)],
                    src_schema,
                ),
                key_cols=["conv_id", "turn_idx"],
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def do_append() -> None:
        barrier.wait()
        try:
            LakeTable(spark, t.root).append(
                _rows(spark, [(f"n{i}", 0, "user", "fresh", TS) for i in range(8)])
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    th = [threading.Thread(target=do_merge), threading.Thread(target=do_append)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    # the merge may legitimately conflict if the append landed first in one of
    # its buckets — but only with CommitConflict, never silent loss
    assert all(isinstance(e, CommitConflict) for e in errs)
    if not errs:
        out = {r.conv_id: r.text for r in t.read().collect()}
        assert out.get("c0") == "merged" and out.get("n0") == "fresh"
        assert t.read().count() == 72
