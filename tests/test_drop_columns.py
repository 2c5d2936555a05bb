"""drop_columns: metadata-only column removal (Iceberg drop-column parity)
with resurrection tombstones (name-based mapping's answer to field ids)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable

TS = dt.datetime(2025, 1, 1)

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("note", T.StringType()),
])


def _mk(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         bucket_key="conv_id", n_buckets=4)
    df = spark.createDataFrame(
        [(f"c{i}", 0, f"msg{i}", f"note{i}") for i in range(12)], SCHEMA
    )
    t.append(df)
    return t


def test_drop_is_metadata_only_and_projects(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before_files = {b: [f["path"] for f in fl] for b, fl in t.snapshot().files.items()}
    v = t.current_version()
    snap = t.drop_columns(["note"])
    assert snap.version == v + 1
    assert [f.name for f in snap.schema.fields] == ["conv_id", "turn_idx", "text"]
    # no data file rewritten
    assert {b: [f["path"] for f in fl] for b, fl in snap.files.items()} == before_files
    out = t.read()
    assert "note" not in out.columns
    assert out.count() == 12
    # dropped values invisible even though bytes remain in the files
    assert sorted(r.text for r in out.collect())[0] == "msg0"


def test_drop_then_merge_and_mor_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.drop_columns(["note"])
    src_schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
    ])
    src = spark.createDataFrame([("c1", 0, "updated", "U", 10)], src_schema)
    t.apply_cdc_stats(src, key_cols=["conv_id", "turn_idx"], op_col="op",
                      seq_col="seq", write_mode="mor", compact_threshold=100)
    assert t.snapshot().has_deltas()
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got["c1"] == "updated" and len(got) == 12
    assert "note" not in t.read().columns


def test_readd_refused_until_full_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.drop_columns(["note"])
    with pytest.raises(ValueError, match="tombstone"):
        t.add_columns([T.StructField("note", T.StringType())])
    t.rebucket(5)  # full rewrite physically removes the dropped bytes
    t.add_columns([T.StructField("note", T.StringType())])
    vals = {r.note for r in t.read().collect()}
    assert vals == {None}  # fresh column, no resurrected values


def test_drop_key_columns_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="key"):
        t.drop_columns(["conv_id"])
    src_schema = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])
    t.merge(spark.createDataFrame([("c1", 0, "x", "n", "U")], src_schema),
            key_cols=["conv_id", "turn_idx"])
    with pytest.raises(ValueError, match="key"):
        t.drop_columns(["turn_idx"])  # merge key recorded by the merge commit


def test_drop_is_changelog_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src_schema = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])
    t.merge(spark.createDataFrame([("c1", 0, "x", "n", "U")], src_schema),
            key_cols=["conv_id", "turn_idx"])
    v = t.current_version()
    t.drop_columns(["note"])
    assert t.read_changes(v).count() == 0
