"""GroupedRecomputeIndex: changelog-maintained per-group recompute."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.audit import GroupedRecomputeIndex, transcript_audit_index
from datax_spark.lake.table import LakeTable
from datax_spark.ops.transcripts import validate_transcripts

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])


def _ts(m):
    return datetime.datetime(2026, 1, 1, 12, m)


def _turns(spark, rows):
    return spark.createDataFrame(
        [r + (None, _ts(r[1])) for r in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def _seed_rows():
    out = []
    for c in range(8):
        for t in range(4):
            out.append((f"c{c}", t, "user" if t % 2 == 0 else "assistant",
                        f"turn {c} {t}"))
    return out


def _ev(df, op, seq):
    return df.withColumn("op", F.lit(op)).withColumn(
        "seq", F.lit(seq).cast("long"))


@pytest.fixture()
def base(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "base"), SCHEMA,
                         bucket_key="conv_id", n_buckets=4)
    t.apply_cdc(_ev(_turns(spark, _seed_rows()), "I", 1),
                key_cols=["conv_id", "turn_idx"])
    return t


def _assert_matches_recompute(idx, base):
    got = {r["conv_id"]: r.asDict() for r in idx.read().collect()}
    want = {r["conv_id"]: r.asDict()
            for r in validate_transcripts(base.read()).collect()}
    assert got == want


def test_seed_matches_full_recompute(spark, base, tmp_path):
    idx = transcript_audit_index(base, str(tmp_path / "idx"))
    _assert_matches_recompute(idx, base)
    assert idx.consumed_version() == base.current_version()


def test_refresh_touched_groups_only(spark, base, tmp_path):
    idx = transcript_audit_index(base, str(tmp_path / "idx"))
    # mutate: c0 gets an empty turn, c1 loses turn 2 (gap), c2 is wiped,
    # c9 is brand new (contiguous but with a role break)
    upd = _turns(spark, [("c0", 1, "assistant", "  ")])
    gap = _turns(spark, [("c1", 2, "user", "x")])
    wipe = _turns(spark, [("c2", t, None, None) for t in range(4)])
    new = _turns(spark, [("c9", 0, "user", "a"), ("c9", 1, "user", "b")])
    base.apply_cdc(
        _ev(upd, "U", 2).unionByName(_ev(gap, "D", 2))
        .unionByName(_ev(wipe, "D", 2)).unionByName(_ev(new, "I", 2)),
        key_cols=["conv_id", "turn_idx"],
    )
    res = idx.refresh()
    assert res["fetch"] == "point"
    assert res["groups_touched"] == 4
    _assert_matches_recompute(idx, base)
    got = {r["conv_id"]: r.asDict() for r in idx.read().collect()}
    assert "c2" not in got                     # wiped conv left the index
    assert got["c0"]["empty_turns"] == 1 and got["c0"]["valid"] == 0
    assert got["c1"]["contiguous"] == 0
    assert got["c9"]["role_breaks"] == 1
    assert got["c3"]["valid"] == 1             # untouched conv intact


def test_noop_refresh_commits_nothing(spark, base, tmp_path):
    idx = transcript_audit_index(base, str(tmp_path / "idx"))
    v = idx.index.current_version()
    res = idx.refresh()
    assert res["groups_touched"] == 0 and res["fetch"] == "none"
    assert idx.index.current_version() == v


def test_scan_fallback_equals_point_path(spark, base, tmp_path):
    idx = transcript_audit_index(base, str(tmp_path / "idx"),
                                 max_point_keys=0)
    upd = _turns(spark, [("c0", 1, "assistant", "  "),
                         ("c4", 0, "assistant", "flip")])
    base.apply_cdc(_ev(upd, "U", 2), key_cols=["conv_id", "turn_idx"])
    res = idx.refresh()
    assert res["fetch"] == "scan" and res["groups_touched"] == 2
    _assert_matches_recompute(idx, base)


def test_open_reattaches_and_refreshes(spark, base, tmp_path):
    transcript_audit_index(base, str(tmp_path / "idx"))
    idx = GroupedRecomputeIndex.open(
        base, str(tmp_path / "idx"), lambda df: validate_transcripts(df))
    assert idx.group_col == "conv_id"
    base.apply_cdc(_ev(_turns(spark, [("c5", 4, "user", "late")]), "I", 2),
                   key_cols=["conv_id", "turn_idx"])
    res = idx.refresh()
    assert res["groups_touched"] == 1
    _assert_matches_recompute(idx, base)
    # second refresh from the recorded watermark is a no-op
    assert idx.refresh()["groups_touched"] == 0


def test_generic_derive_tool_stats(spark, base, tmp_path):
    """The index is derivation-agnostic: maintain tool_stats (count_distinct
    + conditional min — not signed-foldable) the same way."""
    from datax_spark.ops.transcripts import tool_stats

    idx = GroupedRecomputeIndex.create(
        base, str(tmp_path / "tools"), tool_stats, "conv_id")
    base.apply_cdc(
        _ev(_turns(spark, [("c0", 1, "assistant", "t")])
            .withColumn("tool", F.lit("search")), "U", 2),
        key_cols=["conv_id", "turn_idx"],
    )
    idx.refresh()
    got = {r["conv_id"]: r.asDict() for r in idx.read().collect()}
    want = {r["conv_id"]: r.asDict()
            for r in tool_stats(base.read()).collect()}
    assert got == want
    assert got["c0"]["n_tool_calls"] == 1 and got["c0"]["first_tool_turn"] == 1


def test_follow_bounded_cycles(spark, base, tmp_path):
    idx = transcript_audit_index(base, str(tmp_path / "idx"))
    base.apply_cdc(_ev(_turns(spark, [("c6", 4, "user", "x")]), "I", 2),
                   key_cols=["conv_id", "turn_idx"])
    assert idx.follow(poll_s=0.01, max_cycles=3) == 1
    _assert_matches_recompute(idx, base)


def test_maintenance_only_window_advances_watermark(spark, base, tmp_path):
    """rebucket() makes a new base version with no logical changes; refresh
    must still commit so the watermark passes the window (else follow()
    rescans it forever)."""
    idx = transcript_audit_index(base, str(tmp_path / "idx"))
    base.apply_cdc(_ev(_turns(spark, [("c7", 4, "user", "x")]), "I", 2),
                   key_cols=["conv_id", "turn_idx"])
    idx.refresh()
    v_before = base.current_version()
    base.rebucket(8)
    assert base.current_version() > v_before
    res = idx.refresh()
    assert res["groups_touched"] == 0 and res["to"] == base.current_version()
    assert idx.consumed_version() == base.current_version()
    assert idx.refresh()["fetch"] == "none"
    _assert_matches_recompute(idx, base)


def test_non_bucket_group_forces_scan(spark, base, tmp_path):
    """Point lookups key by the base's bucket key; a group column that
    isn't the bucket key must always take the semi-join scan path."""
    def per_role(df):
        return df.groupBy("role").agg(F.count("*").alias("n"))

    idx = GroupedRecomputeIndex.create(
        base, str(tmp_path / "roles"), per_role, "role")
    base.apply_cdc(_ev(_turns(spark, [("c0", 4, "tooluser", "x")]), "I", 2),
                   key_cols=["conv_id", "turn_idx"])
    res = idx.refresh()
    assert res["fetch"] == "scan"
    got = {r["role"]: r["n"] for r in idx.read().collect()}
    want = {r["role"]: r["n"] for r in per_role(base.read()).collect()}
    assert got == want and "tooluser" in got
    # a row MOVING between groups must re-derive the moved-FROM group too
    # (pre-image tracking): tooluser's only row becomes assistant
    base.apply_cdc(_ev(_turns(spark, [("c0", 4, "assistant", "x")]), "U", 3),
                   key_cols=["conv_id", "turn_idx"])
    idx.refresh()
    got = {r["role"]: r["n"] for r in idx.read().collect()}
    want = {r["role"]: r["n"] for r in per_role(base.read()).collect()}
    assert got == want and "tooluser" not in got


def test_derive_must_emit_group_col(spark, base, tmp_path):
    with pytest.raises(ValueError, match="group column"):
        GroupedRecomputeIndex.create(
            base, str(tmp_path / "bad"),
            lambda df: df.groupBy("conv_id").count().drop("conv_id"),
            "conv_id")
