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


# --------------------------- writer (mongoimport) ---------------------------

WCOLS = [
    {"name": "_id", "type": "objectid", "source": "oid"},
    {"name": "user.name", "type": "string", "source": "name"},
    {"name": "user.age", "type": "long", "source": "age"},
    {"name": "ts", "type": "date", "source": "ts"},
    {"name": "tags", "type": "array", "splitter": "|", "source": "tags"},
    {"name": "score", "type": "double", "source": "score"},
    {"name": "ok", "type": "bool", "source": "ok"},
]
RCOLS = [
    {"name": "_id", "type": "objectid"},
    {"name": "user.name", "type": "string"},
    {"name": "user.age", "type": "long"},
    {"name": "ts", "type": "date"},
    {"name": "tags", "type": "array", "splitter": "|"},
    {"name": "score", "type": "double"},
    {"name": "ok", "type": "bool"},
]


def _wdf(spark, rows):
    return spark.createDataFrame(
        rows, "oid string, name string, age long, ts timestamp, "
              "tags string, score double, ok boolean")


def _read_back(spark, path):
    return {
        r["_id"]: r
        for r in mongo_export_read(spark, path, RCOLS).collect()
    }


def test_import_write_roundtrip(spark, tmp_path):
    """insert mode: typed encode → canonical extended JSON → typed decode is
    lossless, including nested dotted paths, arrays, dates and NULLs."""
    from datax_spark.sources.mongo_json import mongo_import_write

    t0 = dt.datetime(2024, 1, 15, 10, 30)
    rows = [
        ("a" * 24, "jo", 7, t0, "x|y", 1.5, True),
        ("b" * 24, None, None, None, None, -0.25, False),
    ]
    path = str(tmp_path / "dump")
    mongo_import_write(spark, _wdf(spark, rows), path, WCOLS)
    got = _read_back(spark, path)
    assert len(got) == 2
    r = got["a" * 24]
    assert (r["user_name"], r["user_age"], r["score"], r["ok"]) == (
        "jo", 7, 1.5, True)
    assert r["tags"] == "x|y"
    assert r["ts"].replace(tzinfo=None) == t0
    r2 = got["b" * 24]
    # NULL scalars stay NULL (lossless upgrade over the reference's "")
    assert (r2["user_name"], r2["user_age"], r2["ts"]) == (None, None, None)
    # NULL array column → [] (reference MongoDBWriter.java:161-163 parity)
    assert r2["tags"] == ""


def test_import_write_insert_appends(spark, tmp_path):
    from datax_spark.sources.mongo_json import mongo_import_write

    path = str(tmp_path / "dump")
    t0 = dt.datetime(2024, 1, 1)
    mongo_import_write(
        spark, _wdf(spark, [("a" * 24, "jo", 1, t0, "x", 1.0, True)]),
        path, WCOLS)
    mongo_import_write(
        spark, _wdf(spark, [("b" * 24, "an", 2, t0, "y", 2.0, True)]),
        path, WCOLS)
    assert set(_read_back(spark, path)) == {"a" * 24, "b" * 24}


def test_import_write_replace_by_key(spark, tmp_path):
    """ReplaceOne-with-upsert analog: matching keys superseded, other
    existing lines kept verbatim, unseen keys inserted."""
    from datax_spark.sources.mongo_json import mongo_import_write

    path = str(tmp_path / "dump")
    t0 = dt.datetime(2024, 1, 1)
    base = [("a" * 24, "jo", 1, t0, "x", 1.0, True),
            ("b" * 24, "an", 2, t0, "y", 2.0, True)]
    mongo_import_write(spark, _wdf(spark, base), path, WCOLS)
    upd = [("b" * 24, "bo", 22, t0, "z", 0.5, False),   # replace existing
           ("c" * 24, "cy", 3, t0, "w", 3.0, True)]     # upsert new
    mongo_import_write(
        spark, _wdf(spark, upd), path, WCOLS,
        write_mode={"is_replace": True, "replace_key": "_id"})
    got = _read_back(spark, path)
    assert len(got) == 3
    assert got["a" * 24]["user_name"] == "jo"          # untouched
    assert (got["b" * 24]["user_name"], got["b" * 24]["user_age"]) == ("bo", 22)
    assert got["c" * 24]["user_name"] == "cy"          # upserted


def test_import_write_registry(spark, tmp_path):
    """mongodbwriter drives through the writer registry with the reference's
    writeMode param shape."""
    from datax_spark.sources.writers import build_writer

    path = str(tmp_path / "dump")
    t0 = dt.datetime(2024, 1, 1)
    build_writer(_wdf(spark, [("a" * 24, "jo", 1, t0, "x", 1.0, True)]),
                 "mongodbwriter", {"path": path, "column": WCOLS})
    build_writer(
        _wdf(spark, [("a" * 24, "JO", 11, t0, "x", 1.0, True)]),
        "mongodbwriter",
        {"path": path, "column": WCOLS,
         "writeMode": {"isReplace": "true", "replaceKey": "_id"}})
    got = _read_back(spark, path)
    assert len(got) == 1 and got["a" * 24]["user_name"] == "JO"


def test_import_encode_is_pure_catalyst(spark):
    from datax_spark.sources.mongo_json import mongo_import_lines

    df = _wdf(spark, [("a" * 24, "jo", 1, dt.datetime(2024, 1, 1),
                       "x", 1.0, True)])
    plan = (mongo_import_lines(df, WCOLS)._jdf.queryExecution()
            .executedPlan().toString())
    assert "EvalPython" not in plan
