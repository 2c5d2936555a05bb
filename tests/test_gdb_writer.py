"""gdbwriter: element mapping, Gremlin DSL framing, INSERT/SKIP/MERGE.

Reference semantics under test:
- column/columnType element mapping      DefaultGdbMapper.java:45-120
- idTransRule labelPrefix                Key.IdTransRule / MappingRuleFactory
- parameterized DSL + property batching  ScriptGdbGraph.buildDsl:151-187
- duplicate-id UpdateMode handling       ScriptGdbGraph.addInternal:81-101
- write → gdb_read roundtrip             shared dump schema
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.sources.nosql import gdb_elements, gdb_read, gdb_statements, gdb_write
from datax_spark.sources.writers import build_writer

VCOLS = [
    {"name": "uid", "columnType": "primaryKey"},
    {"name": "name", "columnType": "vertexProperty"},
    {"name": "score", "columnType": "vertexProperty"},
]


def _people(spark, n=20):
    return spark.range(n).select(
        F.format_string("u%03d", F.col("id")).alias("uid"),
        F.format_string("person-%d", F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )


def test_vertex_mapping_and_label_prefix(spark):
    p = {"labelType": "VERTEX", "label": "person", "column": VCOLS,
         "idTransRule": "labelPrefix"}
    e = gdb_elements(_people(spark, 3), p).orderBy("id").collect()
    assert e[0].id == "person:u000" and e[0].label == "person"
    assert e[0].properties == {"name": "person-0", "score": "0.0"}


def test_edge_mapping_requires_endpoints(spark):
    df = spark.createDataFrame([("e1", "a", "b", "5")],
                               "eid string, s string, d string, w string")
    with pytest.raises(ValueError, match="srcPrimaryKey"):
        gdb_elements(df, {"labelType": "EDGE", "label": "knows", "column": [
            {"name": "eid", "columnType": "primaryKey"}]})
    e = gdb_elements(df, {
        "labelType": "EDGE", "label": "knows", "srcLabel": "person",
        "dstLabel": "person", "column": [
            {"name": "eid", "columnType": "primaryKey"},
            {"name": "s", "columnType": "srcPrimaryKey"},
            {"name": "d", "columnType": "dstPrimaryKey"},
            {"name": "w", "columnType": "edgeProperty"}]}).first()
    assert (e["from"], e["to"]) == ("a", "b")
    assert e.fromLabel == "person" and e.properties == {"w": "5"}


def test_dsl_scripts_and_param_binding(spark):
    p = {"labelType": "VERTEX", "label": "person", "column": VCOLS}
    stmts = gdb_statements(_people(spark, 2), p)
    rows = stmts.collect()
    assert len(rows) == 2  # one batch: 2 props < batch size
    r = sorted(rows, key=lambda r: r.params["GDB___id"])[0]
    assert r.script == ("g.addV(GDB___label).property(id, GDB___id)"
                        ".property(GDB___PK0, GDB___PV0)"
                        ".property(GDB___PK1, GDB___PV1)")
    assert r.params["GDB___id"] == "u000"
    assert r.params["GDB___label"] == "person"
    assert r.params["GDB___PK0"] == "name"
    assert r.params["GDB___PV0"] == "person-0"


def test_dsl_property_batching_splits_into_updates(spark):
    cols = [{"name": "uid", "columnType": "primaryKey"}] + [
        {"name": f"p{i}", "columnType": "vertexProperty"} for i in range(5)]
    df = spark.createDataFrame(
        [tuple(["x"] + [str(i) for i in range(5)])],
        "uid string, " + ", ".join(f"p{i} string" for i in range(5)))
    stmts = gdb_statements(df, {
        "labelType": "VERTEX", "label": "n", "column": cols,
        "maxPropertiesBatchNumber": 2}).collect()
    scripts = sorted(r.script for r in stmts)
    # 5 props / batch 2 → addV(2) + two g.V updates (2 + 1)
    assert len(stmts) == 3
    assert sum(s.startswith("g.addV") for s in scripts) == 1
    assert sum(s.startswith("g.V(GDB___id)") for s in scripts) == 2
    # set-cardinality renders .property(set, ...)
    sset = gdb_statements(df.select("uid", "p0"), {
        "labelType": "VERTEX", "label": "n", "column": [
            {"name": "uid", "columnType": "primaryKey"},
            {"name": "p0", "columnType": "vertexSetProperty"}]}).first()
    assert ".property(set, GDB___PK0, GDB___PV0)" in sset.script


def test_insert_duplicates_are_dirty(spark, tmp_path):
    p = {"labelType": "VERTEX", "label": "person", "column": VCOLS,
         "path": str(tmp_path / "g"), "writeMode": "INSERT"}
    r = gdb_write(spark, _people(spark, 10), p)
    assert r["rows"] == 10 and r["dirty"] == 0
    # re-offer 4 existing + 1 fresh
    again = _people(spark, 4).withColumn("name", F.lit("MUST NOT LAND"))
    fresh = spark.createDataFrame([("u999", "new", 1.0)],
                                  "uid string, name string, score double")
    r2 = gdb_write(spark, again.unionByName(fresh), p)
    assert r2["rows"] == 11 and r2["dirty"] == 4
    stored = spark.read.parquet(p["path"])
    assert stored.filter("properties.name = 'MUST NOT LAND'").count() == 0


def test_skip_and_merge_modes(spark, tmp_path):
    path = str(tmp_path / "g")
    p = {"labelType": "VERTEX", "label": "person", "column": VCOLS,
         "path": path, "writeMode": "INSERT"}
    gdb_write(spark, _people(spark, 5), p)
    upd = _people(spark, 5).withColumn("name", F.lit("SKIPPED"))
    gdb_write(spark, upd, {**p, "writeMode": "SKIP"})
    stored = spark.read.parquet(path)
    assert stored.filter("properties.name = 'SKIPPED'").count() == 0
    # MERGE overlays only the offered properties, keeps the rest
    patch = spark.createDataFrame([("u001", "MERGED")],
                                  "uid string, name string")
    gdb_write(spark, patch, {**p, "writeMode": "MERGE", "column": [
        {"name": "uid", "columnType": "primaryKey"},
        {"name": "name", "columnType": "vertexProperty"}]})
    row = spark.read.parquet(path).filter("id = 'u001'").first()
    assert row.properties["name"] == "MERGED"
    assert row.properties["score"] == "1.5"  # untouched property survives


def test_roundtrip_through_gdb_read(spark, tmp_path):
    path = str(tmp_path / "g")
    build_writer(_people(spark, 8), "gdbwriter", {
        "labelType": "VERTEX", "label": "person", "column": VCOLS,
        "path": path, "statementsPath": str(tmp_path / "dsl")})
    back = gdb_read(spark, {
        "labelType": "VERTEX", "path": path, "format": "parquet",
        "labels": ["person"], "column": [
            {"name": "uid", "columnType": "primaryKey"},
            {"name": "name", "columnType": "vertexProperty"},
            {"name": "score", "type": "double",
             "columnType": "vertexProperty"}]})
    assert back.count() == 8
    r = back.filter("uid = 'u002'").first()
    assert r.name == "person-2" and r.score == 3.0
    dsl = spark.read.json(str(tmp_path / "dsl"))
    assert dsl.count() == 8 and set(dsl.columns) == {"script", "params"}


def test_json_property_bundle_merges_into_bag(spark):
    df = spark.createDataFrame(
        [("k1", '{"properties":[{"k":"a","t":"string","v":"1"},'
                 '{"k":"b","t":"string","v":"2"}]}')],
        "uid string, bundle string")
    e = gdb_elements(df, {"labelType": "VERTEX", "label": "n", "column": [
        {"name": "uid", "columnType": "primaryKey"},
        {"name": "bundle", "columnType": "vertexJsonProperty"}]}).first()
    assert e.properties == {"a": "1", "b": "2"}
