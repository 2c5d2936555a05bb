"""Type-widening schema evolution: int->long / float->double promotion of
EXISTING columns without rewriting a single data file (Iceberg type
promotion; the reference's free scalar casts — ColumnCast.java:92-122 —
bounded to the lossless lattice a persistent table can honor).
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import LakeTable, is_type_widening

TS = dt.datetime(2025, 1, 1)


def _mk(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA_V1,
        bucket_key="conv_id", n_buckets=n_buckets,
    )


def _rows(spark, items):
    return spark.createDataFrame(items, TRANSCRIPTS_SCHEMA_V1)


def test_lattice():
    assert is_type_widening(T.IntegerType(), T.LongType())
    assert is_type_widening(T.ByteType(), T.IntegerType())
    assert is_type_widening(T.FloatType(), T.DoubleType())
    assert not is_type_widening(T.LongType(), T.IntegerType())      # narrowing
    assert not is_type_widening(T.IntegerType(), T.IntegerType())   # not strict
    assert not is_type_widening(T.IntegerType(), T.DoubleType())    # cross-family
    assert not is_type_widening(T.StringType(), T.LongType())


def test_widen_is_metadata_only_and_reads_widen(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [(f"c{i}", i, "user", f"m{i}", TS) for i in range(20)]))
    before = t.snapshot()
    t.widen_columns({"turn_idx": T.LongType()})
    after = t.snapshot()
    assert after.files == before.files  # no data file rewritten
    assert after.schema["turn_idx"].dataType == T.LongType()
    df = t.read()
    assert dict(df.dtypes)["turn_idx"] == "bigint"
    assert sorted((r.conv_id, r.turn_idx) for r in df.collect()) == \
        sorted((f"c{i}", i) for i in range(20))
    # bucket-pruned point reads still find rows written pre-widening
    assert t.lookup(["c7"]).collect()[0].turn_idx == 7
    # idempotent re-widen: no new commit
    assert t.widen_columns({"turn_idx": T.LongType()}).version == after.version


def test_widen_rejections(spark, tmp_path):
    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("n", T.LongType(), True),
        T.StructField("x", T.FloatType(), True),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, bucket_key="k", n_buckets=2)
    with pytest.raises(ValueError, match="unknown column"):
        t.widen_columns({"nope": T.LongType()})
    with pytest.raises(ValueError, match="not a lossless widening"):
        t.widen_columns({"n": T.IntegerType()})  # narrowing
    with pytest.raises(ValueError, match="not a lossless widening"):
        t.widen_columns({"k": T.LongType()})  # cross-family
    t.widen_columns({"x": T.DoubleType()})
    assert t.snapshot().schema["x"].dataType == T.DoubleType()


def test_widen_is_changelog_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [("c1", 0, "user", "a", TS)]))
    t.widen_columns({"turn_idx": T.LongType()})
    t.append(_rows(spark, [("c2", 0, "user", "b", TS)]))
    ch = t.read_changes(0)
    assert sorted(r.conv_id for r in ch.collect()) == ["c1", "c2"]
    versions = {r._commit_version for r in ch.collect()}
    assert versions == {1, 3}  # v2 (widen) emitted nothing


def test_source_type_guard_and_post_widen_merges(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_rows(spark, [(f"c{i}", i, "user", "x", TS) for i in range(8)]))
    wide_src = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.LongType(), False),  # wider than table
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ])
    events = spark.createDataFrame(
        [("c0", 0, "user", "patched", TS, "U", 10),
         ("c1", 1, "user", None, TS, "D", 11)], wide_src)
    with pytest.raises(ValueError, match="widen the\n?.*table first|widen_columns"):
        t.apply_cdc(events, key_cols=["conv_id", "turn_idx"])

    t.widen_columns({"turn_idx": T.LongType()})
    t.apply_cdc(events, key_cols=["conv_id", "turn_idx"])
    got = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert got[("c0", 0)] == "patched" and ("c1", 1) not in got
    assert len(got) == 7

    # a feed still emitting the OLD (narrower) width keeps working: cast up
    narrow = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
    ])
    t.apply_cdc(
        spark.createDataFrame([("c2", 2, "user", "narrow-up", TS, "U", 20)], narrow),
        key_cols=["conv_id", "turn_idx"],
    )
    assert t.lookup(["c2"]).collect()[0].text == "narrow-up"
    # compaction folds int32-era files with int64-era deltas
    t.compact()
    assert t.read().count() == 7


def _widen_feed_epochs(feed_dir: str, from_epoch: int) -> None:
    """Rewrite epochs >= from_epoch with turn_idx as int64 — the mid-replay
    width switch a real binlog makes at a source ALTER TABLE."""
    for d in sorted(os.listdir(feed_dir)):
        if not d.startswith("epoch="):
            continue
        if int(d.split("=", 1)[1]) < from_epoch:
            continue
        for p in glob.glob(os.path.join(feed_dir, d, "**", "*.parquet"),
                           recursive=True):
            tab = pq.read_table(p)
            i = tab.schema.get_field_index("turn_idx")
            tab = tab.set_column(
                i, pa.field("turn_idx", pa.int64()),
                tab.column(i).cast(pa.int64()),
            )
            for j, f in enumerate(tab.schema):
                # keep Spark's isAdjustedToUTC=true timestamp encoding — a
                # plain pyarrow rewrite would flip it to NTZ
                if pa.types.is_timestamp(f.type) and f.type.tz is None:
                    tab = tab.set_column(
                        j, pa.field(f.name, pa.timestamp("us", tz="UTC")),
                        tab.column(j).cast(pa.timestamp("us", tz="UTC")),
                    )
            pq.write_table(tab, p, compression="snappy")
            # the rewrite invalidates Hadoop's .crc sidecar from the original
            # Spark write; stale checksums fail the JVM read path
            crc = os.path.join(os.path.dirname(p), f".{os.path.basename(p)}.crc")
            if os.path.exists(crc):
                os.unlink(crc)


@pytest.mark.parametrize("n_buckets,shards", [(8, 8), (6, 8)])
def test_engine_mid_replay_widening(spark, tmp_path, n_buckets, shards):
    """The feed switches turn_idx int32 -> int64 mid-replay; the engine widens
    the table (DDL before DML) on BOTH the aligned (footer-evolve) and the
    generic (batch-evolve) apply paths, and the final state still equals the
    pure-Python oracle fold."""
    from datax_spark.cdc import CdcEngine, ChangeFeedSpec, EngineConfig, generate_change_feed
    from datax_spark.cdc.oracle import fold_feed

    feed = str(tmp_path / "feed")
    generate_change_feed(
        spark, feed,
        ChangeFeedSpec(seed=11, n_convs=150, n_epochs=4, shards_per_epoch=shards),
    )
    _widen_feed_epochs(feed, from_epoch=2)
    root = str(tmp_path / "t")
    LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, "conv_id", n_buckets=n_buckets)
    eng = CdcEngine(spark, EngineConfig(
        table_root=root, feed_dir=feed, checkpoint_dir=str(tmp_path / "ck"),
    ))
    eng.run()
    t = LakeTable(spark, root)
    assert t.snapshot().schema["turn_idx"].dataType == T.LongType()
    got = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
           for r in t.read().collect()}
    want = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
            for r in fold_feed(feed)}
    assert got == want


def test_widening_disabled_fails_epoch(spark, tmp_path):
    from datax_spark.cdc import CdcEngine, ChangeFeedSpec, EngineConfig, generate_change_feed

    feed = str(tmp_path / "feed")
    generate_change_feed(
        spark, feed, ChangeFeedSpec(seed=3, n_convs=40, n_epochs=2, shards_per_epoch=4),
    )
    _widen_feed_epochs(feed, from_epoch=1)
    root = str(tmp_path / "t")
    LakeTable.create(spark, root, TRANSCRIPTS_SCHEMA_V1, "conv_id", n_buckets=4)
    eng = CdcEngine(spark, EngineConfig(
        table_root=root, feed_dir=feed, checkpoint_dir=str(tmp_path / "ck"),
        type_widening=False,
    ))
    with pytest.raises(ValueError, match="type_widening"):
        eng.run()
