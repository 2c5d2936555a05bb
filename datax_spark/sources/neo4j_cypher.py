"""neo4jwriter re-expressed Spark-first: typed UNWIND-batch framing.

The reference plugin (neo4jwriter/.../Neo4jClient.java:35-190,
adapter/ValueAdapter.java:14-77) does three things: adapt each record's
cells to typed bolt values through a ``properties`` spec (name/type/split/
dateFormat — twenty PropertyType rules including split-string arrays and
LocalDate/Time parsing), buffer ``batchSize`` typed maps, and run the
user-supplied Cypher once per buffer with the batch bound to
``batchDataVariableName`` (default ``batch`` — the canonical
``UNWIND $batch AS row ...`` pattern).

Here the value adaptation and batch framing are ONE Catalyst projection +
one per-task grouping (no Python in the row path); the result is the
(cypher, batch) parameter stream a bolt driver task submits — the same
cluster-mode artifact standard as ``cassandra_statements`` /
``gdb_statements`` (bolt is a binary protocol; the artifact is the
writer's entire record-shaping surface, which is what the tests and the
roundtrip oracle check). Each Spark task maps to one bolt session and each
output row to one ``session.run(cypher, batch)`` — executor-parallel,
driver sees only counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BATCH_VARIABLE = "batch"   # Option BATCH_DATA_VARIABLE_NAME default
DEFAULT_BATCH_SIZE = 1000          # Option BATCH_SIZE default

_SIMPLE = {
    "null": "string",
    "boolean": "boolean",
    "string": "string",
    "integer": "long",
    "long": "long",
    "short": "short",
    "float": "double",    # ValueAdapter: FLOAT/DOUBLE both → asDouble
    "double": "double",
}
_ARRAY_ELEM = {
    "string_array": "string",
    "object_array": "string",
    "list": "string",
    "char_array": "string",
    "byte_array": "short",
    "boolean_array": "boolean",
    "long_array": "long",
    "int_array": "int",
    "short_array": "short",
    "double_array": "double",
    "float_array": "double",
}


def neo4j_value_expr(prop: dict) -> Column:
    """Typed cell per ValueAdapter.column2Value:14-77.

    ``prop``: name, type (PropertyType, case-insensitive), split (array
    separator, default ","), dateFormat (LOCAL_* patterns). A NULL string
    form stays NULL (ValueAdapter:23-25)."""
    name = prop["name"]
    ptype = str(prop.get("type", "string")).lower()
    raw = F.col(name).cast("string")
    if ptype == "map":
        return F.from_json(raw, "map<string,string>")
    if ptype in _SIMPLE:
        if ptype == "boolean":
            return raw.try_cast("boolean")
        if ptype == "null":
            return F.lit(None).cast("string")
        return raw.try_cast(_SIMPLE[ptype])
    if ptype in _ARRAY_ELEM:
        split = prop.get("split", ",")
        arr = F.when(raw.isNull() | (raw == ""), F.array().cast(
            f"array<{_ARRAY_ELEM[ptype]}>")).otherwise(
            F.transform(F.split(raw, F.lit(split), F.lit(-1)),
                        lambda s: s.try_cast(_ARRAY_ELEM[ptype])))
        return arr
    if ptype == "local_date":
        # try_*: a malformed cell degrades to NULL like every numeric type
        # above, instead of ANSI-crashing the whole job
        fmt = prop.get("dateFormat", "yyyy-MM-dd")
        return F.try_to_timestamp(raw, F.lit(fmt)).cast("date")
    if ptype in ("local_time", "local_date_time"):
        fmt = prop.get("dateFormat",
                       "HH:mm:ss" if ptype == "local_time"
                       else "yyyy-MM-dd HH:mm:ss")
        return F.try_to_timestamp(raw, F.lit(fmt))
    raise ValueError(f"neo4jwriter: unsupported property type {ptype!r} "
                     f"for {name!r}")


def neo4j_batches(df: DataFrame, p: dict) -> DataFrame:
    """The (cypher, batch) parameter stream: one row per ``session.run``.

    ``p``: cypher (required), properties = [{name, type, split,
    dateFormat}], batchSize, batchDataVariableName. ``batch`` is an
    array<struct> of the typed property maps, framed per task in arrival
    order (Neo4jClient buffers per task thread)."""
    cypher = p.get("cypher")
    if not cypher or not str(cypher).strip():
        raise ValueError("neo4jwriter: cypher must not be null or empty")
    props = p.get("properties") or [
        {"name": c, "type": "string"} for c in df.columns]
    batch = int(p.get("batchSize", DEFAULT_BATCH_SIZE))
    var = p.get("batchDataVariableName", DEFAULT_BATCH_VARIABLE)
    typed = df.select(F.struct(
        *[neo4j_value_expr(pr).alias(pr["name"]) for pr in props]
    ).alias("row"))
    # monotonically_increasing_id is per-task contiguous: its low 33 bits
    # are the in-task record counter, so floor-div frames arrival order
    # within ONE task into session batches, like the reference's buffer
    framed = typed.withColumn(
        "_b", F.floor(F.pmod(F.monotonically_increasing_id(),
                             F.lit(1 << 33)) / batch)) \
        .withColumn("_t", F.spark_partition_id())
    return framed.groupBy("_t", "_b").agg(
        F.collect_list("row").alias(var)).select(
        F.lit(str(cypher)).alias("cypher"), F.col(var).alias("batch"))


def neo4j_write(df: DataFrame, p: dict) -> dict:
    """Persist the parameter stream to ``p['batchesPath']`` (JSON, one
    object per session.run) — the artifact a bolt-driver runner replays
    against a live endpoint. Returns row/batch counts."""
    path = p.get("batchesPath") or p.get("path")
    if not path:
        raise ValueError("neo4jwriter: batchesPath is required")
    batches = neo4j_batches(df, p)
    batches.write.mode("overwrite").json(path)
    spark = df.sparkSession
    back = spark.read.json(path)
    n_batches = back.count()
    n_rows = back.select(F.sum(F.size("batch"))).first()[0] or 0
    return {"written": True, "batches": int(n_batches),
            "rows": int(n_rows)}
