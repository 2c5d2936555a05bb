"""Incremental changelog reads (``LakeTable.read_changes``) — the "CDC-out"
half of the engine: downstream consumers re-derive the folded change stream
from snapshots (Iceberg changelog scan / Delta CDF parity) instead of
re-tailing the source feed.

Invariant tested throughout: replaying read_changes(v0, vN) in commit order
onto the state at v0 reproduces the state at vN exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("turn", T.IntegerType()),
    T.StructField("val", T.StringType()),
])


def _events(spark, rows):
    """rows: (k, turn, val, seq, op)"""
    return spark.createDataFrame(
        rows, "k string, turn int, val string, seq long, op string"
    )


def _mor_apply(table, df, threshold=100):
    snap, _ = table.apply_cdc_stats(
        df, key_cols=["k"], op_col="op", seq_col="seq",
        write_mode="mor", compact_threshold=threshold,
    )
    return snap


def _changes(table, a, b=None):
    return sorted(
        (r["k"], r["turn"], r["val"], r["_change_type"], r["_commit_version"], r["_seq"])
        for r in table.read_changes(a, b).collect()
    )


def _state(df):
    return sorted((r["k"], r["turn"], r["val"]) for r in df.collect())


def _replay(changes_rows, base_state):
    """Fold changelog rows (dicts) onto base per-key state, commit by commit,
    within a commit last-seq-wins (fast-path rows carry seq; diff rows are
    already one-per-key)."""
    state = {r[0]: r for r in base_state}  # key -> (k, turn, val)
    by_commit: dict[int, list] = {}
    for r in changes_rows:
        by_commit.setdefault(r["_commit_version"], []).append(r)
    for v in sorted(by_commit):
        per_key = {}
        for r in sorted(by_commit[v], key=lambda r: (r["_seq"] is not None, r["_seq"] or 0)):
            per_key[r["k"]] = r
        for k, r in per_key.items():
            if r["_change_type"] == "delete":
                state.pop(k, None)
            else:
                state[k] = (r["k"], r["turn"], r["val"])
    return sorted(state.values())


def test_mor_delta_fast_path_is_the_folded_epoch(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t1"), SCHEMA, "k", n_buckets=4)
    _mor_apply(t, _events(spark, [
        ("a", 1, "a1", 1, "I"), ("b", 1, "b1", 2, "I"), ("c", 1, "c1", 3, "I"),
    ]))
    _mor_apply(t, _events(spark, [
        ("a", 2, "a2", 10, "U"),        # update
        ("a", 3, "a3", 11, "U"),        # superseded within the epoch by seq 11? no — wins
        ("b", 1, "b1", 12, "D"),        # delete
        ("d", 1, "d1", 13, "I"),        # insert
        ("z", 1, "z1", 14, "D"),        # delete marker for a never-live key
    ]))
    got = _changes(t, 1, 2)
    assert got == sorted([
        ("a", 3, "a3", "upsert", 2, 11),  # latest-per-key within the epoch
        ("b", 1, "b1", "delete", 2, 12),
        ("d", 1, "d1", "upsert", 2, 13),
        ("z", 1, "z1", "delete", 2, 14),
    ])
    # no delta file is opened twice: range (0,2] = epoch1 inserts + epoch2
    assert len(_changes(t, 0, 2)) == 3 + 4


def test_replay_reproduces_state_mor(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA, "k", n_buckets=4)
    import random
    rng = random.Random(7)
    seq = 0
    for _ in range(5):
        rows = []
        for _ in range(40):
            seq += 1
            k = f"k{rng.randrange(25)}"
            op = rng.choice(["I", "U", "U", "D"])
            rows.append((k, seq % 10, f"v{seq}", seq, op))
        _mor_apply(t, _events(spark, rows), threshold=3)  # forces mixed delta+compact commits
    ch = [r.asDict() for r in t.read_changes(0).collect()]
    assert _replay(ch, []) == _state(t.read())


def test_compaction_commit_emits_no_changes(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t3"), SCHEMA, "k", n_buckets=4)
    _mor_apply(t, _events(spark, [("a", 1, "a1", 1, "I"), ("b", 1, "b1", 2, "I")]))
    _mor_apply(t, _events(spark, [("a", 2, "a2", 3, "U")]))
    v_before = t.current_version()
    t.compact()
    assert t.current_version() == v_before + 1
    assert t.read_changes(v_before).count() == 0
    # and a range spanning the compaction still yields the apply's changes
    assert _changes(t, 1) == [("a", 2, "a2", "upsert", 2, 3)]


def test_append_commit_is_pure_inserts(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t4"), SCHEMA, "k", n_buckets=4)
    t.append(spark.createDataFrame([("a", 1, "a1"), ("b", 1, "b1")], SCHEMA))
    got = _changes(t, 0, 1)
    assert got == sorted([
        ("a", 1, "a1", "upsert", 1, None),
        ("b", 1, "b1", "upsert", 1, None),
    ])


def test_cow_rewrite_takes_diff_path(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t5"), SCHEMA, "k", n_buckets=2)
    t.apply_cdc(_events(spark, [
        ("a", 1, "a1", 1, "I"), ("b", 1, "b1", 2, "I"), ("c", 1, "c1", 3, "I"),
    ]), key_cols=["k"], seq_col="seq")
    t.apply_cdc(_events(spark, [
        ("a", 2, "a2", 10, "U"),   # update -> upsert
        ("b", 1, "b1", 11, "D"),   # delete -> delete w/ pre-image
        ("d", 1, "d1", 12, "I"),   # insert -> upsert
    ]), key_cols=["k"], seq_col="seq")
    got = _changes(t, 1, 2)
    assert got == sorted([
        ("a", 2, "a2", "upsert", 2, None),
        ("b", 1, "b1", "delete", 2, None),
        ("d", 1, "d1", "upsert", 2, None),
    ])
    # unchanged key "c" must NOT appear even though its bucket was rewritten
    assert all(r[0] != "c" for r in got)


def test_schema_evolution_aligns_old_commits_with_nulls(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t6"), SCHEMA, "k", n_buckets=2)
    _mor_apply(t, _events(spark, [("a", 1, "a1", 1, "I")]))
    t.add_columns([T.StructField("tool", T.StringType())])
    src = spark.createDataFrame(
        [("b", 1, "b1", "search", 2, "I")],
        "k string, turn int, val string, tool string, seq long, op string",
    )
    _mor_apply(t, src)
    rows = {r["k"]: r.asDict() for r in t.read_changes(0).collect()}
    assert rows["a"]["tool"] is None and rows["a"]["_commit_version"] == 1
    assert rows["b"]["tool"] == "search" and rows["b"]["_commit_version"] == 3
    # the add_columns commit itself contributes nothing
    assert t.read_changes(1, 2).count() == 0


def test_vacuumed_range_raises(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t7"), SCHEMA, "k", n_buckets=2)
    for i in range(4):
        _mor_apply(t, _events(spark, [("a", i, f"a{i}", i + 1, "U")]))
    t.vacuum(keep_last=2)
    with pytest.raises(ValueError, match="expired"):
        t.read_changes(0).collect()
    # the surviving tail of the range still works
    assert t.read_changes(3, 4).count() == 1


def test_overwrite_emits_effective_diff(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t8"), SCHEMA, "k", n_buckets=2)
    t.append(spark.createDataFrame([("a", 1, "a1"), ("b", 1, "b1")], SCHEMA))
    t.overwrite(spark.createDataFrame([("a", 1, "a1"), ("c", 1, "c1")], SCHEMA))
    got = _changes(t, 1, 2)
    assert got == sorted([
        ("b", 1, "b1", "delete", 2, None),
        ("c", 1, "c1", "upsert", 2, None),
    ])
