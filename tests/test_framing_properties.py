"""Property tests for the writer framing kernels added in round 5.

Each framing artifact (neo4j UNWIND batches, gdb DSL param maps, kudu
flush-framed op stream) must carry every clean input record exactly once,
for any batch size — the exactly-once property the downstream driver
replay relies on.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@settings(max_examples=10, deadline=None)
@given(n=st.integers(1, 200), batch=st.integers(1, 50),
       parts=st.integers(1, 4))
def test_neo4j_batches_partition_rows_exactly_once(n, batch, parts, spark):
    from datax_spark.sources.neo4j_cypher import neo4j_batches

    df = spark.range(n).select(F.col("id"),
                               F.format_string("v%d", "id").alias("v")) \
        .repartition(parts)
    out = neo4j_batches(df, {
        "cypher": "unwind $batch as row return row", "batchSize": batch,
        "properties": [{"name": "id", "type": "long"},
                       {"name": "v", "type": "string"}]}).collect()
    ids = [r.id for row in out for r in row.batch]
    assert sorted(ids) == list(range(n))
    assert max(len(row.batch) for row in out) <= batch


@settings(max_examples=10, deadline=None)
@given(n=st.integers(1, 150), batch=st.integers(2, 64))
def test_kudu_op_stream_carries_every_clean_row_once(n, batch, spark):
    from datax_spark.sources.kudu import kudu_operations

    cols = [{"name": "k", "type": "long", "primaryKey": True},
            {"name": "v", "type": "string"}]
    df = spark.range(n).select(F.col("id").alias("k"),
                               F.lit("x").alias("v"))
    ops = kudu_operations(df, {"column": cols, "writeBatchSize": batch})
    rows = ops.collect()
    assert len(rows) == n
    import json as _json

    keys = sorted(_json.loads(r.row)["k"] for r in rows)
    assert keys == list(range(n))
    # flush groups never exceed the 80%-of-batch session threshold
    from collections import Counter

    per_flush = Counter((r.tablet, r.flush) for r in rows)
    assert max(per_flush.values()) <= max(1, int(batch * 0.8))


@settings(max_examples=10, deadline=None)
@given(n_props=st.integers(1, 12), batch=st.integers(1, 5))
def test_gdb_dsl_param_maps_cover_every_property(n_props, batch, spark):
    from datax_spark.sources.nosql import gdb_statements

    cols = [{"name": "uid", "columnType": "primaryKey"}] + [
        {"name": f"p{i}", "columnType": "vertexProperty"}
        for i in range(n_props)]
    df = spark.createDataFrame(
        [tuple(["x"] + [f"val{i}" for i in range(n_props)])],
        "uid string, " + ", ".join(f"p{i} string" for i in range(n_props)))
    stmts = gdb_statements(df, {
        "labelType": "VERTEX", "label": "n", "column": cols,
        "maxPropertiesBatchNumber": batch}).collect()
    # ceil(n_props / batch) statements, first is addV, rest are updates
    import math

    assert len(stmts) == math.ceil(n_props / batch)
    assert sum(s.script.startswith("g.addV") for s in stmts) == 1
    # every property key/value appears in exactly one statement's params
    seen = {}
    for s in stmts:
        for k, v in s.params.items():
            if k.startswith("GDB___PK"):
                idx = k[len("GDB___PK"):]
                seen[v] = s.params[f"GDB___PV{idx}"]
    assert seen == {f"p{i}": f"val{i}" for i in range(n_props)}
