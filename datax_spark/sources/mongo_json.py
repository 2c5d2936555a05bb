"""MongoDB extended-JSON (mongoexport) reader — the mongodbreader surface
over the dump format instead of the live wire protocol.

The reference plugin cursors a live collection and emits typed columns per
record (``MongoDBReader.java:125-188``): dotted-path navigation into nested
documents, per-type Column conversion, array fields joined by a ``splitter``
string, and tasks split by ``_id`` ranges. The Mongo wire protocol (BSON
over its own TCP framing) is unreachable from this sandbox and has no
stdlib client — but the export side of every real Mongo pipeline is
``mongoexport`` NDJSON in MongoDB Extended JSON, and THAT is fully
testable. This module decodes it with pure Catalyst expressions
(``get_json_object`` paths — JVM-side, whole-stage codegen, no Python in
the row path):

- ``{"$oid": ...}`` → string; ``{"$numberInt"/"$numberLong": ...}`` → long;
  ``{"$numberDouble"/"$numberDecimal": ...}`` → double; ``{"$date": ISO}``
  (relaxed) and ``{"$date": {"$numberLong": ms}}`` (canonical) → timestamp;
  plain scalars pass through — one ``coalesce`` chain handles both
  canonical and relaxed exports;
- dotted column names navigate nested documents (reference :134-150);
- ``type="array"`` joins elements with ``splitter`` (reference :168-180 —
  the Joiner.on contract, splitter required);
- ``id_bounds=(lower, upper)`` filters ``_id >= lower AND _id < upper`` —
  the reference's range-split task predicate (:110-118); ObjectId hex
  strings are creation-time-ordered, so lexicographic compare is the same
  split arithmetic the reference gets from ObjectId ordering.

At scale: the NDJSON scan is a plain distributed text read (splittable,
partition-pruned by path); every extraction is a codegen'd JSON path — the
shape that survives a 100-TB dump directory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_ID = "_id"


def _path(dotted: str, *wrapper: str) -> str:
    parts = dotted.split(".") + list(wrapper)
    return "$" + "".join(f"['{p}']" for p in parts)


def mongo_column_expr(line_col: str, name: str, ctype: str,
                      splitter: str | None = None) -> Column:
    """One typed column from an extended-JSON line (Catalyst only)."""
    line = F.col(line_col)
    ctype = ctype.lower()
    if ctype in ("objectid", "oid"):
        return F.get_json_object(line, _path(name, "$oid"))
    if ctype in ("int", "long"):
        return F.coalesce(
            F.get_json_object(line, _path(name, "$numberLong")),
            F.get_json_object(line, _path(name, "$numberInt")),
            F.get_json_object(line, _path(name)),
        ).cast("long")
    if ctype == "double":
        return F.coalesce(
            F.get_json_object(line, _path(name, "$numberDouble")),
            F.get_json_object(line, _path(name, "$numberDecimal")),
            F.get_json_object(line, _path(name)),
        ).cast("double")
    if ctype in ("bool", "boolean"):
        return F.get_json_object(line, _path(name)).cast("boolean")
    if ctype == "date":
        ms = F.get_json_object(line, _path(name, "$date", "$numberLong"))
        iso = F.get_json_object(line, _path(name, "$date"))
        return F.coalesce(
            F.timestamp_millis(ms.cast("long")),
            F.to_timestamp(iso),
        )
    if ctype == "array":
        if not splitter:
            # reference parity: array columns REQUIRE a splitter
            # (MongoDBReader.java:171-174 throws ILLEGAL_VALUE)
            raise ValueError(f"array column {name!r} requires a splitter")
        arr = F.from_json(
            F.get_json_object(line, _path(name)), "array<string>")
        return F.array_join(arr, splitter)
    if ctype in ("string", "document"):
        return F.get_json_object(line, _path(name))
    raise ValueError(f"unsupported mongo column type {ctype!r} for {name!r}")


def decode_mongo_lines(df: DataFrame, columns: list[dict],
                       line_col: str = "value") -> DataFrame:
    """Project typed columns out of a DataFrame of extended-JSON lines.
    ``columns``: [{"name": dotted, "type": ..., "splitter": ...}] — the
    reference's column meta (KeyConstant COLUMN_NAME/TYPE/SPLITTER). Output
    column names replace dots with underscores."""
    exprs = []
    for c in columns:
        e = mongo_column_expr(line_col, c["name"], c["type"], c.get("splitter"))
        exprs.append(e.alias(c["name"].replace(".", "_")))
    return df.select(*exprs)


def mongo_export_read(
    spark: SparkSession,
    path: str,
    columns: list[dict],
    id_bounds: tuple[str | None, str | None] | None = None,
    id_type: str = "objectid",
) -> DataFrame:
    """Read a mongoexport NDJSON dump into typed columns.

    ``id_bounds=(lower, upper)``: half-open ``_id`` range (either side None
    = unbounded) applied BEFORE projection — the reference's per-task range
    filter; on ObjectId ids the hex-string order is creation order, so a
    driver can tile tasks exactly like ``CollectionSplitUtil`` does."""
    raw = spark.read.text(path)
    if id_bounds is not None:
        idc = mongo_column_expr("value", _ID, id_type)
        lo, hi = id_bounds
        if lo is not None:
            raw = raw.filter(idc >= F.lit(lo))
        if hi is not None:
            raw = raw.filter(idc < F.lit(hi))
    return decode_mongo_lines(raw, columns)
