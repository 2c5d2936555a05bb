"""The two MERGE physical strategies (colocated Arrow merge vs Catalyst
union-LWW shuffle fold) must produce identical final tables."""

from pyspark.sql import functions as F

from datax_spark.cdc.engine import CdcEngine, EngineConfig
from datax_spark.cdc.generator import ChangeFeedSpec, generate_change_feed
from datax_spark.cdc.oracle import fold_feed
from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import LakeTable


def _replay(spark, tmp_path, feed, strategy):
    root = str(tmp_path / f"table-{strategy}")
    LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, bucket_key="conv_id", n_buckets=8)
    engine = CdcEngine(
        spark,
        EngineConfig(
            table_root=root,
            feed_dir=feed,
            checkpoint_dir=str(tmp_path / f"ckpt-{strategy}"),
            merge_strategy=strategy,
        ),
    )
    engine.run()
    return [
        tuple(r)
        for r in engine.table.read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]


def test_strategies_equivalent_and_match_oracle(spark, tmp_path):
    feed = str(tmp_path / "feed")
    spec = ChangeFeedSpec(seed=99, n_convs=150, n_epochs=3, update_rate=0.8,
                          delete_prob=0.15, resurrect_prob=0.4, dirty_frac=0.01)
    generate_change_feed(spark, feed, spec)

    colocated = _replay(spark, tmp_path, feed, "colocated")
    shuffle = _replay(spark, tmp_path, feed, "shuffle")
    assert colocated == shuffle
    assert len(colocated) > 0

    expect = fold_feed(feed)
    assert len(colocated) == len(expect)
    for got, exp in zip(colocated, expect):
        assert got[0] == exp["conv_id"] and got[1] == exp["turn_idx"]
        assert got[3] == exp["text"]
        assert got[4] == exp["tool"]


def test_colocated_delete_all_rows_in_bucket(spark, tmp_path):
    """A bucket whose keys are all deleted ends with no files."""
    root = str(tmp_path / "t2")
    t = LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, bucket_key="conv_id", n_buckets=2)
    base = spark.createDataFrame(
        [("a", 0, "user", "hi", None), ("b", 0, "user", "yo", None)],
        "conv_id string, turn_idx int, role string, text string, ts timestamp",
    )
    t.append(base)
    deletes = base.select(
        "conv_id", "turn_idx", "role", "text", "ts",
        F.lit("D").alias("op"), F.lit(1).cast("long").alias("seq"),
    )
    t.apply_cdc(deletes, key_cols=["conv_id", "turn_idx"], strategy="colocated")
    assert t.read().count() == 0
