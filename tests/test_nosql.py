from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from datax_spark.sources.nosql import (
    MURMUR3_MAX,
    MURMUR3_MIN,
    RANDOM_MAX,
    RANDOM_MIN,
    cql_for_range,
    token_range_splits,
)
from datax_spark.sources.readers import build_reader


def test_token_splits_cover_ring_disjointly():
    for part, lo, hi in [
        ("Murmur3Partitioner", MURMUR3_MIN, MURMUR3_MAX),
        ("RandomPartitioner", RANDOM_MIN, RANDOM_MAX),
    ]:
        for n in (1, 3, 7, 16):
            r = token_range_splits(n, part)
            assert len(r) == n
            assert r[0][0] == lo and r[-1][1] == hi
            # contiguous half-open (l, r] ranges: no gaps, no overlap
            for (_, a_hi), (b_lo, _) in zip(r, r[1:]):
                assert a_hi == b_lo
            assert all(l < h for l, h in r)


def test_cql_template_matches_reference_shape():
    # getQueryString:486-530: token(pk) > l AND token(pk) <= r [+ where]
    cql = cql_for_range(
        "ks", "t", ["a", "b"], ["pk1", "pk2"], rng=(-10, 20), where="c > 5",
        allow_filtering=True,
    )
    assert cql == (
        "SELECT a, b FROM ks.t WHERE token(pk1,pk2) > -10 "
        "AND token(pk1,pk2) <= 20 AND c > 5 ALLOW FILTERING"
    )
    assert cql_for_range("ks", "t", [], ["pk"]) == "SELECT * FROM ks.t"


def test_cassandra_reader_ranges_partition_data(spark, tmp_path):
    src = str(tmp_path / "tbl")
    spark.range(0, 5000).selectExpr(
        "cast(id as string) AS pk", "id * 2 AS v"
    ).write.parquet(src)
    df = build_reader(spark, "cassandrareader", {
        "path": src, "partitionKey": "pk", "adviceNumber": 8,
        "column": ["pk", "v"],
    })
    # union of 8 token ranges == the whole table, no dupes
    assert df.count() == 5000
    assert df.select("pk").distinct().count() == 5000
    # where pushdown
    df2 = build_reader(spark, "cassandrareader", {
        "path": src, "partitionKey": "pk", "adviceNumber": 3, "where": "v >= 9000",
    })
    assert df2.count() == 500


def test_cassandra_reader_requires_path():
    with pytest.raises(NotImplementedError):
        from datax_spark.sources.nosql import cassandra_read

        cassandra_read(None, {"host": "10.0.0.1", "partitionKey": "pk"})


@pytest.fixture()
def graph_dump(spark, tmp_path):
    vdir, edir = str(tmp_path / "v"), str(tmp_path / "e")
    verts = [
        {"id": "v1", "label": "person", "properties": {"name": "ann", "age": "31"}},
        {"id": "v2", "label": "person", "properties": {"name": "bo"}},
        {"id": "v3", "label": "place", "properties": {"name": "oslo"}},
    ]
    edges = [
        {"id": "e1", "label": "knows", "from": "v1", "to": "v2",
         "fromLabel": "person", "toLabel": "person",
         "properties": {"since": "2019"}},
        {"id": "e2", "label": "visited", "from": "v2", "to": "v3",
         "fromLabel": "person", "toLabel": "place", "properties": {}},
    ]
    with open(vdir, "w") as f:
        f.writelines(json.dumps(v) + "\n" for v in verts)
    with open(edir, "w") as f:
        f.writelines(json.dumps(e) + "\n" for e in edges)
    return vdir, edir


def test_gdb_vertex_mapping(spark, graph_dump):
    vdir, _ = graph_dump
    df = build_reader(spark, "gdbreader", {
        "path": vdir, "labelType": "VERTEX", "labels": ["person"],
        "column": [
            {"name": "vid", "columnType": "primaryKey"},
            {"name": "vlabel", "columnType": "primaryLabel"},
            {"name": "name", "columnType": "vertexProperty"},
            {"name": "age", "type": "int", "columnType": "vertexProperty"},
        ],
    })
    rows = {r.vid: r for r in df.collect()}
    assert set(rows) == {"v1", "v2"}  # place filtered out by label
    assert rows["v1"].age == 31 and rows["v1"].name == "ann"
    assert rows["v2"].age is None
    assert rows["v1"].vlabel == "person"


def test_gdb_edge_mapping_and_json_bundle(spark, graph_dump):
    _, edir = graph_dump
    df = build_reader(spark, "gdbreader", {
        "path": edir, "labelType": "EDGE",
        "column": [
            {"name": "eid", "columnType": "primaryKey"},
            {"name": "src", "columnType": "srcPrimaryKey"},
            {"name": "dst", "columnType": "dstPrimaryKey"},
            {"name": "dstl", "columnType": "dstPrimaryLabel"},
            {"name": "since", "columnType": "edgeProperty"},
            {"name": "bundle", "columnType": "edgeJsonProperty"},
        ],
    })
    rows = {r.eid: r for r in df.collect()}
    assert rows["e1"].src == "v1" and rows["e1"].dst == "v2"
    assert rows["e2"].dstl == "place"
    assert rows["e1"].since == "2019"
    assert json.loads(rows["e1"].bundle) == {
        "properties": [{"k": "since", "t": "string", "v": "2019"}]
    }


def test_gdb_edge_only_columns_rejected_on_vertex(spark, graph_dump):
    vdir, _ = graph_dump
    with pytest.raises(ValueError, match="edge-only"):
        build_reader(spark, "gdbreader", {
            "path": vdir, "labelType": "VERTEX",
            "column": [{"name": "src", "columnType": "srcPrimaryKey"}],
        })


def test_cassandra_reader_single_scan_plan(spark, tmp_path):
    """Round-2 VERDICT: the local analog must read the parquet ONCE — the
    token ranges tile the ring, so a per-range union was pure N× read
    amplification. The per-range CQL stays the cluster-mode artifact."""
    from datax_spark.sources.nosql import cql_for_range, token_range_splits

    src = str(tmp_path / "tbl")
    spark.range(0, 1000).selectExpr(
        "cast(id as string) AS pk", "id AS v"
    ).write.parquet(src)
    df = build_reader(spark, "cassandrareader", {
        "path": src, "partitionKey": "pk", "adviceNumber": 8,
    })
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert max(plan.count("FileScan"), plan.count("Scan parquet")) == 1
    assert "Union" not in plan
    assert df.count() == 1000

    # cluster artifact: one CQL per range, rendering the same ring arithmetic
    cqls = [
        cql_for_range("ks", "tbl", ["pk", "v"], ["pk"], rng)
        for rng in token_range_splits(8)
    ]
    assert len(cqls) == 8 and all("token(pk) >" in c for c in cqls)


# ----------------------------- cassandrawriter -----------------------------

WCOLS = [
    {"name": "pk", "type": "bigint"},
    {"name": "name", "type": "text"},
    {"name": "score", "type": "double"},
    {"name": "ok", "type": "boolean"},
    {"name": "payload", "type": "blob"},
    {"name": "ts", "type": "timestamp"},
]


def _cdf(spark, rows):
    return spark.createDataFrame(
        rows, "pk long, name string, score double, ok boolean, "
              "payload binary, ts timestamp")


def test_cassandra_statement_framing(spark):
    """Rendered CQL mirrors the reference INSERT shape: typed literals
    (text '' escaping, 0x blob, lowercase boolean, quoted ISO timestamp),
    USING TIMESTAMP micros, NULL for null columns."""
    import datetime as dt

    from datax_spark.sources.nosql import cassandra_statements

    t0 = dt.datetime(2024, 1, 15, 10, 30)
    df = _cdf(spark, [
        (1, "o'hara", 1.5, True, b"\x01\xff", t0),
        (2, None, None, None, None, None),
    ])
    got = sorted(r["value"] for r in cassandra_statements(df, {
        "keyspace": "ks", "table": "t", "column": WCOLS, "pk": ["pk"],
        "batchSize": 1, "writeTimestampColumn": "ts",
    }).collect())
    s1 = next(s for s in got if "o''hara" in s)
    assert s1.startswith(
        "INSERT INTO ks.t (pk, name, score, ok, payload, ts) VALUES (1, "
        "'o''hara', 1.5, true, 0x01ff, '2024-01-15T10:30:00.000")
    assert " USING TIMESTAMP " in s1 and s1.endswith(";")
    s2 = next(s for s in got if "(2, NULL" in s)
    assert "NULL, NULL, NULL" in s2
    # a NULL writetime renders NULL after USING TIMESTAMP (driver -> "now")
    assert s2.rstrip(";").endswith("NULL")


def test_cassandra_unlogged_batches(spark):
    from datax_spark.sources.nosql import cassandra_statements

    df = _cdf(spark, [(i, f"n{i}", float(i), True, None, None)
                      for i in range(40)])
    got = [r["value"] for r in cassandra_statements(df, {
        "keyspace": "ks", "table": "t", "column": WCOLS, "pk": ["pk"],
        "batchSize": 8, "adviceNumber": 4,
    }).collect()]
    assert all(v.startswith("BEGIN UNLOGGED BATCH\n") and
               v.endswith("\nAPPLY BATCH;") for v in got)
    stmts = [ln for v in got for ln in v.split("\n")
             if ln.startswith("INSERT")]
    assert len(stmts) == 40
    assert max(v.count("INSERT") for v in got) <= 8


def test_cassandra_token_tile_groups_rows(spark):
    """Rows sharing a pk land in the same ring tile, and tiles are within
    [0, adviceNumber) — the token-aware grouping contract."""
    from datax_spark.sources.nosql import _token_tile

    df = _cdf(spark, [(i % 5, "x", 0.0, True, None, None)
                      for i in range(50)])
    tiles = df.select(F.col("pk"), _token_tile(["pk"], 4).alias("tile"))
    per_pk = tiles.groupBy("pk").agg(
        F.count_distinct("tile").alias("n"),
        F.min("tile").alias("lo"), F.max("tile").alias("hi")).collect()
    assert all(r["n"] == 1 for r in per_pk)
    assert all(0 <= r["lo"] <= r["hi"] <= 3 for r in per_pk)


def test_cassandra_write_upsert_analog(spark, tmp_path):
    """INSERT-is-upsert-by-pk over the local analog, LWW by writetime."""
    import datetime as dt

    from datax_spark.sources.writers import build_writer

    path = str(tmp_path / "tbl")
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    p = {"keyspace": "ks", "table": "t", "column": WCOLS, "pk": ["pk"],
         "path": path, "writeTimestampColumn": "ts",
         "statementsPath": str(tmp_path / "cql")}
    build_writer(_cdf(spark, [(1, "a", 1.0, True, None, t2),
                              (2, "b", 2.0, True, None, t1)]),
                 "cassandrawriter", p)
    # second write: pk=1 arrives with an OLDER writetime -> loses LWW;
    # pk=2 newer -> wins; pk=3 fresh -> inserted
    build_writer(_cdf(spark, [(1, "A-old", 0.0, False, None, t1),
                              (2, "B-new", 20.0, False, None, t2),
                              (3, "c", 3.0, True, None, t1)]),
                 "cassandrawriter", p)
    got = {r["pk"]: r for r in spark.read.parquet(path).collect()}
    assert len(got) == 3
    assert got[1]["name"] == "a"          # older writetime lost
    assert got[2]["name"] == "B-new"      # newer writetime won
    assert got[3]["name"] == "c"
    # the statement-stream artifact was persisted alongside
    cql = [r["value"] for r in
           spark.read.text(str(tmp_path / "cql")).collect()]
    assert any("INSERT INTO ks.t" in s for s in cql)


def test_cassandra_collection_literals(spark):
    from datax_spark.sources.nosql import cql_literal

    df = spark.createDataFrame(
        [('["a","b"]', '{"k":"v"}')], "l string, m string")
    got = df.select(
        cql_literal(F.col("l"), "list").alias("l"),
        cql_literal(F.col("l"), "set").alias("s"),
        cql_literal(F.col("m"), "map").alias("m"),
    ).first()
    assert got["l"] == "['a','b']"
    assert got["s"] == "{'a','b'}"
    assert got["m"] == "{'k':'v'}"
