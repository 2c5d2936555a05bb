"""Delta-CDF-style pre-image changelog reads and continuous-aggregate
maintenance.

Invariants tested:
- ``read_changes(include_preimages=True)`` emits ``insert`` /
  ``update_preimage`` / ``update_postimage`` / ``delete`` rows such that the
  signed sum of any measure equals the aggregate state diff between the two
  versions (the property aggregate maintenance relies on).
- ``ContinuousAggregate.refresh()`` keeps the rollup table bit-equal to a
  full recompute of the base, across inserts / updates / deletes / group
  migrations / multi-commit windows, and is exactly-once under replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.rollup import AggSpec, ContinuousAggregate
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("grp", T.StringType()),
    T.StructField("x", T.IntegerType()),
])


def _events(spark, rows):
    """rows: (k, grp, x, seq, op)"""
    return spark.createDataFrame(
        rows, "k string, grp string, x int, seq long, op string"
    )


def _mor_apply(table, df, threshold=100):
    snap, _ = table.apply_cdc_stats(
        df, key_cols=["k"], op_col="op", seq_col="seq",
        write_mode="mor", compact_threshold=threshold,
    )
    return snap


def _cow_apply(table, df):
    return table.apply_cdc(df, key_cols=["k"], op_col="op", seq_col="seq")


def _cdf(table, a, b=None):
    return sorted(
        (r["k"], r["grp"], r["x"], r["_change_type"], r["_commit_version"])
        for r in table.read_changes(a, b, include_preimages=True).collect()
    )


def _state(table, version=None):
    return {r["k"]: (r["grp"], r["x"]) for r in table.read(version).collect()}


@pytest.fixture(params=["mor", "cow"])
def apply_fn(request):
    return _mor_apply if request.param == "mor" else _cow_apply


def test_preimages_classify_insert_update_delete(spark, tmp_path, apply_fn):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k", n_buckets=4)
    apply_fn(t, _events(spark, [
        ("a", "g1", 1, 1, "I"), ("b", "g1", 2, 2, "I"), ("c", "g2", 3, 3, "I"),
    ]))
    apply_fn(t, _events(spark, [
        ("a", "g2", 10, 10, "U"),   # update (group migration)
        ("b", "g1", 2, 11, "D"),    # delete
        ("d", "g2", 4, 12, "I"),    # insert
        ("zz", "g9", 0, 13, "D"),   # never-live delete marker -> dropped
    ]))
    got = _cdf(t, 1, 2)
    assert got == sorted([
        ("a", "g1", 1, "update_preimage", 2),
        ("a", "g2", 10, "update_postimage", 2),
        ("b", "g1", 2, "delete", 2),          # pre-image payload
        ("d", "g2", 4, "insert", 2),
    ])


def test_preimages_first_commit_all_inserts(spark, tmp_path, apply_fn):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k", n_buckets=4)
    apply_fn(t, _events(spark, [("a", "g1", 1, 1, "I"), ("b", "g2", 2, 2, "I")]))
    got = _cdf(t, 0, 1)
    assert [c for (_, _, _, c, _) in got] == ["insert", "insert"]


def test_preimages_append_path_shadowing(spark, tmp_path):
    """append() rows that shadow an existing key classify as an update pair,
    not a bare insert."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k", n_buckets=4)
    t.append(spark.createDataFrame([("a", "g1", 1), ("b", "g1", 2)], SCHEMA))
    t.append(spark.createDataFrame([("a", "g2", 9), ("c", "g2", 3)], SCHEMA))
    got = _cdf(t, 1, 2)
    assert got == sorted([
        ("a", "g1", 1, "update_preimage", 2),
        ("a", "g2", 9, "update_postimage", 2),
        ("c", "g2", 3, "insert", 2),
    ])


def test_preimages_diff_path_overwrite(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k", n_buckets=4)
    t.append(spark.createDataFrame([("a", "g1", 1), ("b", "g1", 2)], SCHEMA))
    t.overwrite(spark.createDataFrame([("a", "g1", 5), ("c", "g2", 3)], SCHEMA))
    got = _cdf(t, 1, 2)
    assert got == sorted([
        ("a", "g1", 1, "update_preimage", 2),
        ("a", "g1", 5, "update_postimage", 2),
        ("b", "g1", 2, "delete", 2),
        ("c", "g2", 3, "insert", 2),
    ])


def test_preimages_signed_sum_equals_state_diff(spark, tmp_path, apply_fn):
    """The maintenance invariant: sum(sign*x) over the CDF == sum(x) at vN
    minus sum(x) at v0, per group."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k", n_buckets=4)
    apply_fn(t, _events(spark, [
        (f"k{i}", f"g{i % 3}", i, i, "I") for i in range(30)
    ]))
    apply_fn(t, _events(spark, [
        ("k0", "g1", 100, 100, "U"), ("k1", "g1", 200, 101, "U"),
        ("k2", "g2", 2, 102, "D"), ("k3", "g0", 7, 103, "U"),
        ("new", "g0", 50, 104, "I"),
    ]))
    apply_fn(t, _events(spark, [
        ("new", "g0", 50, 110, "D"), ("k4", "g1", 40, 111, "U"),
    ]))
    ch = t.read_changes(1, 3, include_preimages=True)
    sign = (F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
            .otherwise(-1))
    got = {
        r["grp"]: r["d"]
        for r in ch.groupBy("grp").agg(F.sum(sign * F.col("x")).alias("d")).collect()
    }
    v1 = {r["grp"]: r["s"] for r in
          t.read(1).groupBy("grp").agg(F.sum("x").alias("s")).collect()}
    v3 = {r["grp"]: r["s"] for r in
          t.read(3).groupBy("grp").agg(F.sum("x").alias("s")).collect()}
    for g in set(v1) | set(v3) | set(got):
        assert got.get(g, 0) == (v3.get(g, 0) or 0) - (v1.get(g, 0) or 0), g


def test_preimages_default_mode_unchanged(spark, tmp_path):
    """include_preimages=False keeps the legacy upsert/delete vocabulary."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k", n_buckets=4)
    _mor_apply(t, _events(spark, [("a", "g1", 1, 1, "I")]))
    _mor_apply(t, _events(spark, [("a", "g1", 2, 2, "U"), ("a2", "g1", 0, 3, "D")]))
    kinds = {r["_change_type"] for r in t.read_changes(0).collect()}
    assert kinds <= {"upsert", "delete"}


# --------------------------------------------------------------- rollup

SPEC = AggSpec(
    group_by={"grp": "grp"},
    sums={"sum_x": "x"},
    count_col="n_rows",
)


def _recompute(base, spec):
    df = base.read()
    rows = (
        df.groupBy(*[F.expr(e).alias(c) for c, e in spec.group_by.items()])
        .agg(*[F.sum(F.coalesce(F.expr(e), F.lit(0))).cast("long").alias(c)
               for c, e in spec.sums.items()],
             F.count(F.lit(1)).alias(spec.count_col))
        .collect()
    )
    return sorted((tuple(r) for r in rows), key=repr)


def _agg_state(agg):
    return sorted((tuple(r) for r in agg.read().collect()), key=repr)


def test_rollup_tracks_recompute_through_lifecycle(spark, tmp_path, apply_fn):
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, "k", n_buckets=4)
    apply_fn(base, _events(spark, [
        (f"k{i}", f"g{i % 4}", i, i, "I") for i in range(40)
    ]))
    ca = ContinuousAggregate.create(base, str(tmp_path / "agg"), SPEC, n_buckets=4)
    assert _agg_state(ca.agg) == _recompute(base, SPEC)
    assert ca.consumed_version() == base.current_version()

    # window 1: updates + deletes + inserts + group migration
    apply_fn(base, _events(spark, [
        ("k0", "g1", 1000, 100, "U"),   # migrates g0 -> g1
        ("k1", "g1", 11, 101, "U"),
        ("k2", "g2", 0, 102, "D"),
        ("kx", "g4", 7, 103, "I"),      # brand-new group
    ]))
    r = ca.refresh()
    assert r["to"] == base.current_version() and r["groups_touched"] > 0
    assert _agg_state(ca.agg) == _recompute(base, SPEC)

    # window 2: several base commits folded in ONE refresh
    apply_fn(base, _events(spark, [("kx", "g4", 7, 110, "D")]))   # g4 -> empty
    apply_fn(base, _events(spark, [("ky", "g5", 1, 111, "I"),
                                   ("k3", "g3", 33, 112, "U")]))
    ca.refresh()
    state = _agg_state(ca.agg)
    assert state == _recompute(base, SPEC)
    assert not any(row[0] == "g4" for row in state)  # zero-count group removed


def test_rollup_refresh_is_noop_without_new_commits(spark, tmp_path):
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, "k", n_buckets=4)
    _mor_apply(base, _events(spark, [("a", "g1", 1, 1, "I")]))
    ca = ContinuousAggregate.create(base, str(tmp_path / "agg"), SPEC, n_buckets=2)
    v = ca.agg.current_version()
    r = ca.refresh()
    assert r["groups_touched"] == 0 and ca.agg.current_version() == v

    # replay safety: a second refresh after a successful one must not
    # double-count (the watermark advanced atomically with the merge commit)
    _mor_apply(base, _events(spark, [("a", "g1", 5, 2, "U")]))
    ca.refresh()
    before = _agg_state(ca.agg)
    ca.refresh()
    assert _agg_state(ca.agg) == before == _recompute(base, SPEC)


def test_rollup_multi_column_groups_and_null_keys(spark, tmp_path):
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, "k", n_buckets=4)
    spec = AggSpec(group_by={"grp": "grp", "parity": "pmod(x, 2)"},
                   sums={"sum_x": "x"}, count_col="n")
    _mor_apply(base, _events(spark, [
        ("a", "g1", 1, 1, "I"), ("b", None, 2, 2, "I"), ("c", "g1", 2, 3, "I"),
        ("d", None, None, 4, "I"),
    ]))
    ca = ContinuousAggregate.create(base, str(tmp_path / "agg"), spec, n_buckets=2)
    assert _agg_state(ca.agg) == _recompute(base, spec)
    _mor_apply(base, _events(spark, [
        ("b", None, 3, 10, "U"), ("a", "g1", 1, 11, "D"),
    ]))
    ca.refresh()
    assert _agg_state(ca.agg) == _recompute(base, spec)


def test_rollup_reattach_resumes_from_recorded_version(spark, tmp_path):
    """A fresh ContinuousAggregate handle over existing tables (new process)
    picks up the watermark from the rollup's commit lineage."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, "k", n_buckets=4)
    _mor_apply(base, _events(spark, [("a", "g1", 1, 1, "I")]))
    ca = ContinuousAggregate.create(base, str(tmp_path / "agg"), SPEC, n_buckets=2)
    _mor_apply(base, _events(spark, [("b", "g2", 2, 2, "I")]))

    ca2 = ContinuousAggregate(
        LakeTable(spark, str(tmp_path / "b")),
        LakeTable(spark, str(tmp_path / "agg")),
        SPEC,
    )
    assert ca2.consumed_version() == 1
    ca2.refresh()
    assert _agg_state(ca2.agg) == _recompute(base, SPEC)


def test_merge_null_key_values_survive_and_shadow(spark, tmp_path):
    """Regression: the Arrow merge kernel's LWW fold and newest-gen-wins
    cascade must treat NULL key values as ordinary, matchable key values —
    not drop the rows (NULL comparison masks) or fail to shadow them."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, "k", n_buckets=2)

    def apply(rows):
        t.apply_cdc(
            spark.createDataFrame(rows, "k string, grp string, x int, seq long, op string"),
            key_cols=["k", "grp"], op_col="op", seq_col="seq",
        )

    apply([
        ("a", None, 1, 1, "I"), ("a", "g", 2, 2, "I"), ("b", None, 3, 3, "I"),
    ])
    assert sorted(((r["k"], r["grp"], r["x"]) for r in t.read().collect()),
                  key=repr) == sorted([
        ("a", "g", 2), ("a", None, 1), ("b", None, 3),
    ], key=repr)
    # update + delete targeting NULL-key rows; two events for the same
    # NULL-key in one batch exercise the fold's adjacent-row comparison
    apply([
        ("a", None, 8, 10, "U"), ("a", None, 9, 11, "U"),
        ("b", None, 3, 12, "D"),
    ])
    assert sorted(((r["k"], r["grp"], r["x"]) for r in t.read().collect()),
                  key=repr) == sorted([
        ("a", "g", 2), ("a", None, 9),
    ], key=repr)


def test_follow_catches_up_in_bounded_cycles(spark, tmp_path):
    """follow(max_cycles=N) is a batch catch-up: each non-empty commit
    window folds exactly once; idle cycles fold nothing and don't corrupt
    the rollup state."""
    base = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, "k", n_buckets=2)
    _cow_apply(base, _events(spark, [("a", "g1", 1, 1, "I"), ("b", "g2", 2, 2, "I")]))
    ca = ContinuousAggregate.create(base, str(tmp_path / "agg"), SPEC, n_buckets=2)

    # two commits land, then follow() drains them in one bounded loop
    _cow_apply(base, _events(spark, [("a", "g1", 10, 10, "U")]))
    _cow_apply(base, _events(spark, [("c", "g3", 3, 11, "I"), ("b", "g2", 2, 12, "D")]))
    folded = ca.follow(poll_s=0.01, max_cycles=3)
    assert folded >= 1
    assert ca.consumed_version() == base.current_version()
    assert _agg_state(ca.agg) == _recompute(base, SPEC)

    # idle follow: no new commits -> nothing folds, state unchanged
    before = _agg_state(ca.agg)
    assert ca.follow(poll_s=0.01, max_cycles=2) == 0
    assert _agg_state(ca.agg) == before
