"""Incremental lake→DB sync (cdc/sync.py): changelog-driven mirror of a
LakeTable into a real sqlite3 target, with watermark resume and idempotent
re-apply (at-least-once delivery × idempotent keyed effects = exactly-once
final state)."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import types as T

from datax_spark.cdc.sync import IncrementalSync, SyncTarget
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("turn", T.IntegerType()),
    T.StructField("val", T.StringType()),
])


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "k string, turn int, val string, seq long, op string"
    )


def _apply(table, rows, spark):
    table.apply_cdc_stats(
        _events(spark, rows), key_cols=["k"], op_col="op", seq_col="seq",
        write_mode="mor", compact_threshold=1000,
    )


def _mk_sink(path):
    with sqlite3.connect(path) as c:
        c.execute("CREATE TABLE mirror (k TEXT PRIMARY KEY, turn INTEGER, val TEXT)")


def _sink_state(path):
    with sqlite3.connect(path) as c:
        return sorted(c.execute("SELECT k, turn, val FROM mirror").fetchall())


def _lake_state(table):
    return sorted((r["k"], r["turn"], r["val"]) for r in table.read().collect())


@pytest.fixture
def setup(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "lake"), SCHEMA, "k", n_buckets=4)
    db = str(tmp_path / "mirror.db")
    _mk_sink(db)
    sync = IncrementalSync(
        t, SyncTarget(driver="sqlite3", database=db, table="mirror",
                      key_cols=["k"], max_tasks=1),
        state_path=str(tmp_path / "sync-state.json"),
    )
    return t, db, sync


def test_initial_and_incremental_sync(spark, setup):
    t, db, sync = setup
    _apply(t, [("a", 1, "a1", 1, "I"), ("b", 1, "b1", 2, "I")], spark)
    s1 = sync.run_once()
    assert (s1["upserts"], s1["deletes"]) == (2, 0)
    assert _sink_state(db) == _lake_state(t)

    _apply(t, [("a", 2, "a2", 10, "U"), ("b", 1, "b1", 11, "D"),
               ("c", 1, "c1", 12, "I")], spark)
    s2 = sync.run_once()
    assert (s2["upserts"], s2["deletes"]) == (2, 1)
    assert s2["synced_from"] == 1 and s2["synced_to"] == 2
    assert _sink_state(db) == _lake_state(t) == [("a", 2, "a2"), ("c", 1, "c1")]


def test_noop_when_up_to_date(spark, setup):
    t, db, sync = setup
    _apply(t, [("a", 1, "a1", 1, "I")], spark)
    sync.run_once()
    again = sync.run_once()
    assert again["skipped"] is True
    assert _sink_state(db) == _lake_state(t)


def test_crash_replay_is_idempotent(spark, setup):
    t, db, sync = setup
    _apply(t, [("a", 1, "a1", 1, "I"), ("b", 1, "b1", 2, "I")], spark)
    sync.run_once()
    _apply(t, [("a", 2, "a2", 10, "U"), ("b", 1, "b1", 11, "D")], spark)
    sync.run_once()
    # simulate a crash that lost the watermark advance: rewind and re-apply
    sync._advance(1, {})
    replay = sync.run_once()
    assert replay["skipped"] is False
    assert _sink_state(db) == _lake_state(t) == [("a", 2, "a2")]


def test_window_folds_to_terminal_effect_per_key(spark, setup):
    t, db, sync = setup
    _apply(t, [("a", 1, "a1", 1, "I")], spark)
    _apply(t, [("a", 2, "a2", 10, "U")], spark)
    _apply(t, [("a", 2, "a2", 20, "D")], spark)
    _apply(t, [("z", 1, "z1", 30, "I")], spark)
    s = sync.run_once()
    # four commits, but one terminal effect per key: delete(a), upsert(z)
    assert (s["upserts"], s["deletes"]) == (1, 1)
    assert _sink_state(db) == _lake_state(t) == [("z", 1, "z1")]


def test_sync_across_compaction(spark, setup):
    t, db, sync = setup
    _apply(t, [("a", 1, "a1", 1, "I"), ("b", 1, "b1", 2, "I")], spark)
    sync.run_once()
    _apply(t, [("a", 2, "a2", 10, "U")], spark)
    t.compact()
    s = sync.run_once()
    assert (s["upserts"], s["deletes"]) == (1, 0)
    assert _sink_state(db) == _lake_state(t)
