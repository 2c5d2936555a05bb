from __future__ import annotations

import pytest

from datax_spark.cdc.engine import CdcEngine, DirtyLimitExceeded, EngineConfig
from datax_spark.cdc.generator import ChangeFeedSpec, generate_change_feed
from datax_spark.cdc.oracle import fold_feed
from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import LakeTable


def _setup(spark, tmp_path, spec: ChangeFeedSpec, n_buckets=8, **eng_kw):
    feed = str(tmp_path / "feed")
    stats = generate_change_feed(spark, feed, spec)
    LakeTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPTS_SCHEMA_V1, bucket_key="conv_id", n_buckets=n_buckets
    )
    cfg = EngineConfig(
        table_root=str(tmp_path / "table"),
        feed_dir=feed,
        checkpoint_dir=str(tmp_path / "ckpt"),
        **eng_kw,
    )
    return CdcEngine(spark, cfg), stats


def _engine_state(engine):
    rows = engine.table.read().orderBy("conv_id", "turn_idx", "ts").collect()
    return [
        (r.conv_id, r.turn_idx, r.role, r.text, getattr(r, "tool", None), r.ts)
        for r in rows
    ]


def _oracle_state(feed_dir, max_epoch=None):
    return [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"].replace(tzinfo=None))
        for r in fold_feed(feed_dir, max_epoch=max_epoch)
    ]


def test_t1_replay_matches_oracle(spark, tmp_path):
    """t1 smoke: full replay final state == independent Python fold, byte-exact."""
    spec = ChangeFeedSpec(seed=42, n_convs=200, n_epochs=6, evolve_frac=0.5)
    engine, stats = _setup(spark, tmp_path, spec)
    summary = engine.run()
    assert summary["epochs_applied"] == len(stats["epochs"])
    got = _engine_state(engine)
    want = _oracle_state(engine.cfg.feed_dir)
    assert len(got) == len(want)
    assert got == want  # per-turn text equality under stable (conv_id, turn_idx, ts) order


def test_generator_deterministic(spark, tmp_path):
    spec = ChangeFeedSpec(seed=7, n_convs=50, n_epochs=3)
    s1 = generate_change_feed(spark, str(tmp_path / "f1"), spec)
    s2 = generate_change_feed(spark, str(tmp_path / "f2"), spec)
    assert s1["total_events"] == s2["total_events"]
    df1 = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "f1")).orderBy("seq")
    df2 = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "f2")).orderBy("seq")
    assert df1.exceptAll(df2).count() == 0 and df2.exceptAll(df1).count() == 0
    # seq is dense, strictly increasing, starting at 0
    import pyspark.sql.functions as F

    agg = df1.agg(F.min("seq"), F.max("seq"), F.count("*")).first()
    assert agg[0] == 0 and agg[1] == agg[2] - 1


def test_feed_has_cdc_shape(spark, tmp_path):
    spec = ChangeFeedSpec(seed=42, n_convs=300, n_epochs=4)
    generate_change_feed(spark, str(tmp_path / "f"), spec)
    df = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "f"))
    ops = {r["op"]: r["cnt"] for r in df.groupBy("op").count().withColumnRenamed("count", "cnt").collect()}
    assert set(ops) == {"I", "U", "D"}
    assert ops["I"] > ops["D"]
    # schema evolution point: early epochs have no tool values, later do
    early = df.filter("epoch < 2").filter("tool is not null").count()
    late = df.filter("epoch >= 2").filter("tool is not null").count()
    assert early == 0 and late > 0


def test_dedupe_multiple_updates_one_epoch(spark, tmp_path):
    """Hot keys: many U events to one key inside one epoch → latest seq wins."""
    spec = ChangeFeedSpec(seed=11, n_convs=30, n_epochs=2, update_rate=2.0, hot_cap=50)
    engine, _ = _setup(spark, tmp_path, spec)
    engine.run()
    assert _engine_state(engine) == _oracle_state(engine.cfg.feed_dir)


def test_dirty_quarantine_and_limit(spark, tmp_path):
    spec = ChangeFeedSpec(seed=5, n_convs=100, n_epochs=2, dirty_frac=0.05)
    engine, _ = _setup(spark, tmp_path, spec, error_limit_fraction=0.5)
    engine.run()
    # dirty events quarantined, not applied; final state still matches oracle
    assert _engine_state(engine) == _oracle_state(engine.cfg.feed_dir)
    q = spark.read.parquet(str(tmp_path / "ckpt" / "quarantine"))
    assert q.count() > 0
    assert set(r["_dirty_reason"] for r in q.select("_dirty_reason").distinct().collect()) <= {
        "null_key", "bad_turn_idx", "bad_op", "null_payload"
    }


def test_error_limit_aborts(spark, tmp_path):
    spec = ChangeFeedSpec(seed=5, n_convs=100, n_epochs=2, dirty_frac=0.2)
    engine, _ = _setup(spark, tmp_path, spec, error_limit_count=3)
    with pytest.raises(DirtyLimitExceeded):
        engine.run()


def test_engine_scheduled_clustering(spark, tmp_path):
    """cluster_every=2: the engine runs a key-sorted clustering rewrite every
    2 applied epochs from inside the loop — final state still equals the
    oracle, cluster metrics are emitted, the post-cluster snapshot has no
    delta layers, and per-bucket files are key-sorted (the layout the keyed
    point-lookup pushdown exploits, BENCH_LOOKUP clustered = 0.40 s)."""
    spec = ChangeFeedSpec(seed=11, n_convs=300, n_epochs=4, evolve_frac=0.5)
    engine, stats = _setup(
        spark, tmp_path, spec,
        cluster_every=2, cluster_max_rows_per_file=500,
    )
    summary = engine.run()
    assert summary["epochs_applied"] == 4
    assert _engine_state(engine) == _oracle_state(engine.cfg.feed_dir)

    clusters = [m for m in engine.cfg.metrics if m.get("kind") == "cluster"]
    assert len(clusters) == 2                      # epochs 2 and 4
    assert clusters[0]["sort_by"] == ["conv_id", "turn_idx"]
    assert all(c["duration_s"] >= 0 for c in clusters)
    # run() ended on a cluster boundary -> fully compacted, clustered layout
    snap = engine.table.snapshot()
    assert not snap.has_deltas()

    # layout probe: the snapshot is marked clustered and, within each
    # bucket, file zone maps on conv_id are range-disjoint — the layout the
    # keyed point-lookup pushdown prunes against
    assert snap.properties["clustered_by"] == "conv_id,turn_idx"
    for _b, fl in snap.files.items():
        spans = sorted((f["stats"]["conv_id"][0], f["stats"]["conv_id"][1])
                       for f in fl if f.get("stats"))
        for (_lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2

    # resume after clustering stays idempotent
    assert engine.run()["epochs_applied"] == 0
