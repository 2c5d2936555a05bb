"""neo4jwriter: typed value adaptation + UNWIND-batch framing.

Reference semantics under test:
- PropertyType value adaptation   ValueAdapter.java:14-77 (incl. split
  arrays, LOCAL_DATE/DATETIME formats, NULL passthrough)
- batchSize buffering per task    Neo4jClient.java:141-159
- cypher required, batch variable Neo4jClient.checkCypher:89-95
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from datax_spark.sources.neo4j_cypher import neo4j_batches, neo4j_value_expr
from datax_spark.sources.writers import build_writer

CYPHER = "unwind $batch as row merge (p:Person {id: row.id}) set p += row"


def test_cypher_required(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="cypher"):
        neo4j_batches(df, {"cypher": "  "})


def test_typed_value_adaptation(spark):
    df = spark.createDataFrame(
        [("7", "true", "2.5", "a,b,c", "1;2;3", "2024-03-05",
          '{"k":"v"}', None)],
        "i string, b string, d string, sa string, la string, "
        "dt string, m string, n string")
    out = df.select(
        neo4j_value_expr({"name": "i", "type": "LONG"}).alias("i"),
        neo4j_value_expr({"name": "b", "type": "Boolean"}).alias("b"),
        neo4j_value_expr({"name": "d", "type": "double"}).alias("d"),
        neo4j_value_expr({"name": "sa", "type": "STRING_ARRAY"}).alias("sa"),
        neo4j_value_expr({"name": "la", "type": "long_array",
                          "split": ";"}).alias("la"),
        neo4j_value_expr({"name": "dt", "type": "LOCAL_DATE",
                          "dateFormat": "yyyy-MM-dd"}).alias("dt"),
        neo4j_value_expr({"name": "m", "type": "map"}).alias("m"),
        neo4j_value_expr({"name": "n", "type": "string"}).alias("n"),
    ).first()
    assert out.i == 7 and out.b is True and out.d == 2.5
    assert out.sa == ["a", "b", "c"] and out.la == [1, 2, 3]
    assert out.dt == datetime.date(2024, 3, 5)
    assert out.m == {"k": "v"} and out.n is None


def test_empty_array_string_is_empty_list(spark):
    # ValueAdapter.parseArrayType: null/"" → empty list, not [""]
    df = spark.createDataFrame([("",), (None,)], "a string")
    got = df.select(neo4j_value_expr(
        {"name": "a", "type": "string_array"}).alias("a")).collect()
    assert [r.a for r in got] == [[], []]


def test_batch_framing_respects_batch_size(spark):
    df = spark.range(100).select(
        F.col("id").alias("id"),
        F.format_string("n%d", "id").alias("name"))
    batches = neo4j_batches(df.coalesce(1), {
        "cypher": CYPHER, "batchSize": 16,
        "properties": [{"name": "id", "type": "long"},
                       {"name": "name", "type": "string"}]})
    rows = batches.collect()
    sizes = sorted(len(r.batch) for r in rows)
    assert sum(sizes) == 100
    assert max(sizes) <= 16
    assert all(r.cypher == CYPHER for r in rows)
    # typed structs inside the batch
    one = rows[0].batch[0]
    assert isinstance(one.id, int) and one.name.startswith("n")


def test_registry_writer_emits_replayable_artifact(spark, tmp_path):
    df = spark.range(37).select(F.col("id"), F.lit("x").alias("v"))
    r = build_writer(df, "neo4jwriter", {
        "cypher": CYPHER, "batchSize": 10,
        "batchesPath": str(tmp_path / "batches"),
        "properties": [{"name": "id", "type": "long"},
                       {"name": "v", "type": "string"}]})
    assert r["rows"] == 37 and r["batches"] >= 4
    back = spark.read.json(str(tmp_path / "batches"))
    assert set(back.columns) == {"cypher", "batch"}
    total = back.select(F.sum(F.size("batch"))).first()[0]
    assert total == 37


def test_malformed_dates_degrade_to_null_not_crash(spark):
    # ANSI mode: to_date would abort the job; try_* must yield NULL
    df = spark.createDataFrame([("garbage", "12:30:45")],
                               "d string, t string")
    out = df.select(
        neo4j_value_expr({"name": "d", "type": "LOCAL_DATE"}).alias("d"),
        neo4j_value_expr({"name": "t", "type": "LOCAL_TIME"}).alias("t"),
    ).first()
    assert out.d is None
    assert out.t is not None  # time-only default format parses
