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


def test_changelog_follower_generic_sink(spark, tmp_path):
    """ChangelogFollower: at-least-once windows into an arbitrary idempotent
    sink; watermark advances only after apply; crash-window replay converges."""
    import datetime as dt

    from pyspark.sql import types as T

    from datax_spark.cdc.sync import ChangelogFollower
    from datax_spark.lake.table import LakeTable

    ts = dt.datetime(2025, 1, 1)
    sch = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), sch, "conv_id", n_buckets=4)
    src_schema = T.StructType(list(sch.fields) + [
        T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())])

    def merge(rows):
        t.apply_cdc_stats(spark.createDataFrame(rows, src_schema),
                          key_cols=["conv_id", "turn_idx"], op_col="op",
                          seq_col="seq", write_mode="mor", compact_threshold=100)

    sink: dict = {}  # keyed upsert/delete sink — idempotent by construction

    def apply(df, start, end):
        for r in df.collect():
            k = (r.conv_id, r.turn_idx)
            if r._change_type == "delete":
                sink.pop(k, None)
            else:
                sink[k] = r.text

    f = ChangelogFollower(t, str(tmp_path / "wm.json"))
    merge([("c1", 0, "a", "U", 1), ("c2", 0, "b", "U", 2)])
    assert f.run_once(apply)["skipped"] is False
    assert sink == {("c1", 0): "a", ("c2", 0): "b"}
    assert f.run_once(apply)["skipped"] is True  # nothing new

    # two commits in one window; fold ships only the terminal effect per key
    merge([("c1", 0, "mid", "U", 3)])
    merge([("c1", 0, None, "D", 4), ("c3", 1, "c", "U", 5)])
    seen_counts = []

    def apply_counting(df, start, end):
        rows = df.collect()
        seen_counts.append(len(rows))
        apply(df, start, end)

    f.run_once(apply_counting)
    assert sink == {("c2", 0): "b", ("c3", 1): "c"}
    assert seen_counts == [2]  # c1 folded to its terminal delete, c3 upsert

    # crash between apply and watermark advance: replay converges (idempotent)
    merge([("c2", 0, "b2", "U", 6)])
    class Boom(Exception):
        pass

    def apply_then_crash(df, start, end):
        apply(df, start, end)
        raise Boom()

    import pytest as _pytest
    with _pytest.raises(Boom):
        f.run_once(apply_then_crash)
    assert sink[("c2", 0)] == "b2"            # effect landed
    assert f.run_once(apply)["skipped"] is False  # window replayed
    assert sink[("c2", 0)] == "b2"            # idempotent re-apply
    assert f.run_once(apply)["skipped"] is True

    # follow() catches up in bounded cycles
    merge([("c4", 0, "d", "U", 7)])
    assert f.follow(apply, poll_s=0.01, max_cycles=3) == 1
    assert sink[("c4", 0)] == "d"
