"""MongoDB extended-JSON (mongoexport) reader: typed decode of canonical +
relaxed exports, dotted paths, array splitter contract, _id range splits."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.sources.mongo_json import (  # noqa: E402
    decode_mongo_lines,
    mongo_export_read,
)

CANONICAL = [
    '{"_id":{"$oid":"65f1a2b3c4d5e6f7a8b9c0d1"},"user":{"name":"jo","age":{"$numberInt":"7"}},'
    '"ts":{"$date":{"$numberLong":"1700000000000"}},"tags":["a","b","c"],'
    '"score":{"$numberDouble":"1.5"},"big":{"$numberLong":"9007199254740993"},"ok":true}',
    '{"_id":{"$oid":"65f1a2b3c4d5e6f7a8b9c0d2"},"user":{"name":"ann","age":{"$numberInt":"9"}},'
    '"ts":{"$date":{"$numberLong":"1700000100000"}},"tags":[],'
    '"score":{"$numberDouble":"-0.25"},"big":{"$numberLong":"-3"},"ok":false}',
]
RELAXED = [
    '{"_id":{"$oid":"65f1a2b3c4d5e6f7a8b9c0d3"},"user":{"name":"bo","age":12},'
    '"ts":{"$date":"2024-01-15T10:30:00Z"},"tags":["x"],"score":2.75,"big":42,"ok":true}',
]
COLS = [
    {"name": "_id", "type": "objectid"},
    {"name": "user.name", "type": "string"},
    {"name": "user.age", "type": "long"},
    {"name": "ts", "type": "date"},
    {"name": "tags", "type": "array", "splitter": "|"},
    {"name": "score", "type": "double"},
    {"name": "big", "type": "long"},
    {"name": "ok", "type": "bool"},
]


def _decode(spark, lines):
    df = spark.createDataFrame([(x,) for x in lines], ["value"])
    return {r["_id"]: r for r in decode_mongo_lines(df, COLS).collect()}


def test_canonical_decode(spark):
    got = _decode(spark, CANONICAL)
    r = got["65f1a2b3c4d5e6f7a8b9c0d1"]
    assert r["user_name"] == "jo" and r["user_age"] == 7
    assert r["ts"] == dt.datetime(2023, 11, 14, 22, 13, 20)
    assert r["tags"] == "a|b|c"
    assert r["score"] == 1.5 and r["big"] == 9007199254740993
    assert r["ok"] is True
    r2 = got["65f1a2b3c4d5e6f7a8b9c0d2"]
    assert r2["tags"] == "" and r2["big"] == -3 and r2["ok"] is False


def test_relaxed_decode(spark):
    r = _decode(spark, RELAXED)["65f1a2b3c4d5e6f7a8b9c0d3"]
    assert r["user_age"] == 12 and r["score"] == 2.75 and r["big"] == 42
    assert r["ts"] == dt.datetime(2024, 1, 15, 10, 30)
    assert r["tags"] == "x"


def test_array_requires_splitter(spark):
    df = spark.createDataFrame([(CANONICAL[0],)], ["value"])
    with pytest.raises(ValueError, match="splitter"):
        decode_mongo_lines(df, [{"name": "tags", "type": "array"}])


def test_id_range_split_tiles_the_dump(spark, tmp_path):
    p = str(tmp_path / "dump.json")
    with open(p, "w") as f:
        f.write("\n".join(CANONICAL + RELAXED) + "\n")
    full = mongo_export_read(spark, p, COLS)
    assert full.count() == 3
    # half-open ranges tile: [min, d2) + [d2, max) == full
    lo = mongo_export_read(
        spark, p, COLS, id_bounds=(None, "65f1a2b3c4d5e6f7a8b9c0d2"))
    hi = mongo_export_read(
        spark, p, COLS, id_bounds=("65f1a2b3c4d5e6f7a8b9c0d2", None))
    ids = sorted(r["_id"] for r in lo.unionByName(hi).collect())
    assert ids == sorted(r["_id"] for r in full.collect())
    assert lo.count() == 1 and hi.count() == 2


def test_registry_jobspec_surface(spark, tmp_path):
    """mongodbreader drives through the reader registry with the reference's
    column meta + where/columns pushdown params."""
    from datax_spark.sources.readers import build_reader

    p = str(tmp_path / "dump.json")
    with open(p, "w") as f:
        f.write("\n".join(CANONICAL + RELAXED) + "\n")
    got = build_reader(spark, "mongodbreader", {
        "path": p, "column": COLS, "where": "user_age >= 9",
        "columns": ["_id", "user_age"],
    }).collect()
    assert sorted((r["_id"], r["user_age"]) for r in got) == [
        ("65f1a2b3c4d5e6f7a8b9c0d2", 9), ("65f1a2b3c4d5e6f7a8b9c0d3", 12)]


def test_decode_is_pure_catalyst(spark):
    """No Python in the row path: the plan must stay whole-stage-codegen /
    project over the text scan (no BatchEvalPython / ArrowEvalPython)."""
    df = spark.createDataFrame([(x,) for x in CANONICAL], ["value"])
    plan = decode_mongo_lines(df, COLS)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
