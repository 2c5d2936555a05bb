"""kuduwriter analog: spec rules, tablet routing, write modes, flush framing.

Reference semantics under test (kuduwriter plugin):
- pk-prefix + type validation      Kudu11xHelper.getSchema / getPrimaryKeyIndexUntil
- blank-pk dirty rule              KuduWriterTask.startWriter:76-86
- string→type coercion + failures  KuduWriterTask:104-150
- insert vs upsert (update⇒upsert) KuduWriterTask:52,92-99
- hash / range tablet partitioning Kudu11xHelper.setTablePartition:255-293
- MANUAL_FLUSH 80%-batch framing   KuduWriterTask:168-173
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.sources.kudu import (
    kudu_normalize_spec,
    kudu_operations,
    kudu_read,
    kudu_tablet_expr,
    kudu_write,
)
from datax_spark.sources.writers import build_writer

COLS = [
    {"name": "k", "type": "long", "primaryKey": True},
    {"name": "name", "type": "string"},
    {"name": "bal", "type": "double"},
    {"name": "flag", "type": "boolean"},
]


def _base(spark, n=50):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.format_string("n%03d", F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("bal"),
        F.when(F.col("id") % 2 == 0, F.lit("true")).otherwise(F.lit("no"))
        .alias("flag"),
    )


# ---------------------------------------------------------------- spec rules

def test_pk_must_lead_spec():
    with pytest.raises(ValueError, match="leading"):
        kudu_normalize_spec({"column": [
            {"name": "a", "type": "string"},
            {"name": "k", "type": "long", "primaryKey": True}]})


def test_pk_required_and_types_validated():
    with pytest.raises(ValueError, match="primaryKey"):
        kudu_normalize_spec({"column": [{"name": "a", "type": "string"}]})
    with pytest.raises(ValueError, match="unsupported type"):
        kudu_normalize_spec({"column": [
            {"name": "k", "type": "decimal", "primaryKey": True}]})


def test_update_mode_maps_to_upsert():
    spec = kudu_normalize_spec(
        {"column": COLS, "insertMode": "update"})
    assert spec["is_upsert"] is True
    # unknown modes fall back to the default like validateParameter
    assert kudu_normalize_spec(
        {"column": COLS, "insertMode": "bogus"})["insert_mode"] == "upsert"


# ------------------------------------------------------------ tablet routing

def test_default_partition_hashes_first_column_x3(spark):
    spec = kudu_normalize_spec({"column": COLS})
    expr, n = kudu_tablet_expr(spec)
    assert n == 3
    got = _base(spark).select(expr.alias("t")).distinct().collect()
    assert {r.t for r in got} <= {0, 1, 2}
    # deterministic: same key → same tablet on a second evaluation
    a = _base(spark).select("k", expr.alias("t"))
    b = _base(spark).select("k", expr.alias("t2"))
    assert a.join(b, "k").filter("t <> t2").count() == 0


def test_range_partition_assigns_by_bounds_and_flags_uncovered(spark):
    spec = kudu_normalize_spec({
        "column": [{"name": "k", "type": "string", "primaryKey": True},
                   {"name": "v", "type": "int"}],
        "partition": {"range": {"k": [
            {"lower": "a", "upper": "g"},
            {"lower": "g", "upper": "n"}]}},
    })
    expr, n = kudu_tablet_expr(spec)
    assert n == 2
    df = spark.createDataFrame(
        [("apple", 1), ("grape", 2), ("zebra", 3)], "k string, v int")
    got = {r.k: r.t for r in df.select("k", expr.alias("t")).collect()}
    assert got == {"apple": 0, "grape": 1, "zebra": -1}


def test_multi_range_columns_rejected():
    with pytest.raises(ValueError, match="one range column"):
        kudu_normalize_spec({
            "column": [{"name": "k", "type": "string", "primaryKey": True}],
            "partition": {"range": {"k": [], "j": []}}})


# ------------------------------------------------------------- write modes

def test_upsert_roundtrip_supersedes_by_pk(spark, tmp_path):
    p = {"column": COLS, "path": str(tmp_path / "t"), "insertMode": "upsert"}
    base = _base(spark)
    r = kudu_write(spark, base, p)
    assert r["rows"] == 50 and r["dirty"] == 0
    upd = base.filter("k % 10 = 0").withColumn("name", F.lit("UPD")) \
              .withColumn("bal", F.col("bal") + 100.0)
    fresh = spark.createDataFrame(
        [(999, "fresh", 0.0, "true")],
        "k long, name string, bal double, flag string")
    kudu_write(spark, upd.unionByName(fresh), p)
    out = kudu_read(spark, p["path"], ["k", "name", "bal", "flag"])
    assert out.count() == 51
    assert out.filter("name = 'UPD'").count() == 5
    assert out.filter("k = 999").count() == 1
    # untouched rows kept their values
    assert out.filter("k = 1 and name = 'n001'").count() == 1


def test_insert_mode_conflicts_fail_or_go_dirty(spark, tmp_path):
    p = {"column": COLS, "path": str(tmp_path / "t"), "insertMode": "insert"}
    base = _base(spark, 20)
    kudu_write(spark, base, p)
    with pytest.raises(RuntimeError, match="already present"):
        kudu_write(spark, base.limit(5), p)
    r = kudu_write(spark, base.limit(5), {**p, "skipFail": True})
    assert r["dirty"] == 5
    assert kudu_read(spark, p["path"], ["k"]).count() == 20


def test_blank_pk_and_parse_failures_are_dirty_under_skipfail(spark, tmp_path):
    p = {"column": COLS, "path": str(tmp_path / "t"), "skipFail": True}
    bad = spark.createDataFrame(
        [(None, "nullpk", "1.0", "true"),
         ("  ", "blankpk", "1.0", "true"),
         ("7", "ok", "1.0", "true"),
         ("8", "badbal", "not-a-double", "true")],
        "k string, name string, bal string, flag string")
    r = kudu_write(spark, bad, p)
    assert r["dirty"] == 3 and r["rows"] == 1
    out = kudu_read(spark, p["path"], ["k", "name", "flag"]).collect()
    assert out[0].k == 7 and out[0].name == "ok" and out[0].flag is True
    # without skipFail the same feed is fatal (reference: DataXException)
    with pytest.raises(RuntimeError, match="skipFail"):
        kudu_write(spark, bad, {"column": COLS,
                                "path": str(tmp_path / "t2")})


def test_boolean_parses_like_java_parseboolean(spark, tmp_path):
    # Boolean.parseBoolean: only the literal "true" (any case) is true
    p = {"column": COLS, "path": str(tmp_path / "t")}
    out = kudu_write(spark, _base(spark, 10), p)
    assert out["rows"] == 10
    got = kudu_read(spark, p["path"], ["k", "flag"]).collect()
    by_k = {r.k: r.flag for r in got}
    assert by_k[0] is True and by_k[1] is False  # "no" → false, not NULL


def test_uncovered_range_rows_fatal_without_skipfail(spark, tmp_path):
    p = {"column": [{"name": "k", "type": "string", "primaryKey": True},
                    {"name": "v", "type": "int"}],
         "partition": {"range": {"k": [{"lower": "a", "upper": "m"}]}},
         "path": str(tmp_path / "t")}
    df = spark.createDataFrame([("apple", 1), ("zebra", 2)],
                               "k string, v int")
    with pytest.raises(RuntimeError, match="range partition"):
        kudu_write(spark, df, p)
    r = kudu_write(spark, df, {**p, "skipFail": True})
    assert r["dirty"] == 1 and r["rows"] == 1


# ------------------------------------------------------------ op stream

def test_operation_stream_flush_framing(spark):
    # batch 10 → flush groups of 8 ops per tablet task (80% of batch)
    ops = kudu_operations(_base(spark, 200),
                          {"column": COLS, "writeBatchSize": 10})
    rows = ops.collect()
    assert len(rows) == 200
    assert {r.op for r in rows} == {"UPSERT"}
    sizes = (ops.groupBy("tablet", "flush").count()
             .select("count").collect())
    assert max(r["count"] for r in sizes) <= 8
    # insert mode stamps INSERT ops
    ins = kudu_operations(_base(spark, 5),
                          {"column": COLS, "insertMode": "insert"})
    assert {r.op for r in ins.collect()} == {"INSERT"}


def test_tablet_layout_is_one_directory_per_tablet(spark, tmp_path):
    p = {"column": COLS, "path": str(tmp_path / "t")}
    kudu_write(spark, _base(spark, 100), p)
    import os
    parts = [d for d in os.listdir(p["path"]) if d.startswith("_tablet=")]
    assert 1 <= len(parts) <= 3


# ------------------------------------------------------------ registry

def test_registry_writer_with_operations_artifact(spark, tmp_path):
    p = {"column": COLS, "path": str(tmp_path / "t"),
         "operationsPath": str(tmp_path / "ops")}
    r = build_writer(_base(spark, 30), "kudu11xwriter", p)
    assert r["rows"] == 30
    arts = spark.read.json(str(tmp_path / "ops"))
    assert arts.count() == 30
    assert set(arts.columns) == {"tablet", "op", "flush", "row"}
