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

from datax_spark.sources.store_swap import staged_swap, store_exists

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


# ---------------------------------------------------------------------------
# Writer — the mongodbwriter surface over the mongoimport dump format.
#
# The reference plugin buffers records and either insertMany()s them or, with
# writeMode {isReplace: true, replaceKey: k}, issues ReplaceOneModel upserts
# keyed by k (MongoDBWriter.java:133-146 batching, :291-316 replace path;
# column typing per meta entry at :148-287 — objectid/array+splitter+itemType/
# long/double/bool/date/bytes/string, KeyConstant.java:59-63). The import side
# of every real Mongo pipeline is mongoimport NDJSON, so this module emits
# canonical MongoDB Extended JSON lines with pure Catalyst (`to_json` over
# nested structs — JVM-side, no Python in the row path) and implements the
# two write modes at the dump-directory level:
#
# - insert       → append new part files (distributed text write);
# - replace(key) → existing lines whose key matches an incoming record are
#   dropped (their replacement is the new line), all other existing lines are
#   kept VERBATIM — exactly ReplaceOne-with-upsert folded over the dump. The
#   key probe on existing lines is one codegen'd get_json_object, so the fold
#   is a broadcast-able anti-join, not a full decode.
#
# Divergence (upgrade) from the reference: NULL scalar columns are emitted as
# JSON null (to_json ignoreNullFields=false) rather than "" (reference
# :159-167 writes an empty string), so a write→read roundtrip is lossless;
# NULL array columns still become [] for reference parity.
# ---------------------------------------------------------------------------


def mongo_encode_expr(name: str, ctype: str, splitter: str | None = None,
                      item_type: str | None = None,
                      source: str | None = None) -> Column:
    """One extended-JSON-typed value expression for document field ``name``
    from DataFrame column ``source`` (default: ``name`` with dots→underscores,
    the reader's output convention)."""
    col = F.col(source or name.replace(".", "_"))
    ctype = ctype.lower()

    def wrapped(expr: Column) -> Column:
        # a NULL value must render as JSON null, not a wrapper object with a
        # null inside ({"$numberLong": null} would poison the typed decode)
        return F.when(col.isNotNull(), expr)

    if ctype in ("objectid", "oid"):
        return wrapped(F.struct(col.cast("string").alias("$oid")))
    if ctype in ("int", "long"):
        return wrapped(F.struct(col.cast("long").cast("string")
                                .alias("$numberLong")))
    if ctype == "double":
        return wrapped(F.struct(col.cast("double").cast("string")
                                .alias("$numberDouble")))
    if ctype in ("bool", "boolean"):
        return col.cast("boolean")
    if ctype == "date":
        return wrapped(F.struct(
            F.struct(F.unix_millis(col.cast("timestamp")).cast("string")
                     .alias("$numberLong")).alias("$date")))
    if ctype == "bytes":
        return wrapped(F.struct(F.base64(col).alias("base64"),
                                F.lit("00").alias("subType")))
    if ctype == "array":
        if not splitter:
            # reference parity: array columns REQUIRE a splitter
            # (MongoDBWriter.java:185-188 throws ILLEGAL_VALUE)
            raise ValueError(f"array column {name!r} requires a splitter")
        import re as _re
        it = (item_type or "").lower()
        elem = {"int": "long", "long": "long", "double": "double",
                "bool": "boolean", "boolean": "boolean"}.get(it, "string")
        arr = F.split(col, _re.escape(splitter)).cast(f"array<{elem}>")
        # reference parity: NULL/empty array column → [] (:161-163)
        return F.coalesce(arr, F.array().cast(f"array<{elem}>"))
    if ctype == "string":
        return col.cast("string")
    raise ValueError(f"unsupported mongo column type {ctype!r} for {name!r}")


def _nest(fields: dict) -> list[Column]:
    """Fold {dotted path: Column} into nested struct expressions."""
    tree: dict = {}
    for dotted, expr in fields.items():
        node = tree
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"path conflict at {dotted!r}")
        node[parts[-1]] = expr

    def build(node: dict) -> list[Column]:
        out = []
        for k, v in node.items():
            out.append((F.struct(*build(v)) if isinstance(v, dict) else v)
                       .alias(k))
        return out

    return build(tree)


def mongo_import_lines(df: DataFrame, columns: list[dict]) -> DataFrame:
    """Encode typed columns into one canonical extended-JSON line per row
    (column ``value``). ``columns``: [{"name": dotted document path, "type":
    ..., "splitter": ..., "item_type": ..., "source": df column}] — the
    writer-side mirror of the reader's column meta."""
    fields = {
        c["name"]: mongo_encode_expr(
            c["name"], c["type"], c.get("splitter"), c.get("item_type"),
            c.get("source"))
        for c in columns
    }
    doc = F.struct(*_nest(fields))
    return df.select(
        F.to_json(doc, {"ignoreNullFields": "false"}).alias("value"))


def mongo_import_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    columns: list[dict],
    write_mode: dict | None = None,
    partitions: int | None = None,
) -> None:
    """Write ``df`` into the NDJSON dump directory ``path``.

    ``write_mode``: None / {"is_replace": False} → plain append (insertMany
    analog). {"is_replace": True, "replace_key": k} → ReplaceOne-with-upsert
    analog folded over the dump: existing lines whose ``k`` equals an
    incoming record's are superseded, everything else is kept byte-for-byte.
    Duplicate keys WITHIN the incoming batch are reduced to max(line) per key
    — deterministic under Spark's unordered shuffle, where the reference's
    "last record wins" stream order does not exist; pre-aggregate upstream if
    a different winner is wanted.

    The replaced dump is staged to a sibling temp directory and swapped in
    with POSIX renames (on an object store the same two steps are a manifest
    pointer flip, as in lake/table.py)."""
    lines = mongo_import_lines(df, columns)
    if partitions:
        lines = lines.coalesce(partitions)
    mode = write_mode or {}
    is_replace = bool(mode.get("is_replace"))
    key = mode.get("replace_key")
    exists = store_exists(path)
    if not is_replace or not key or not exists:
        lines.write.mode("append").text(path)
        return

    spec = next(c for c in columns if c["name"] == key)
    keyed = lines.select(
        mongo_column_expr("value", key, spec["type"], spec.get("splitter"))
        .alias("_k"), "value")
    # batch-internal dedup: one survivor per key (max(line) — see docstring)
    new = keyed.groupBy("_k").agg(F.max("value").alias("value"))
    old = spark.read.text(path).select(
        mongo_column_expr("value", key, spec["type"], spec.get("splitter"))
        .alias("_k"), "value")
    kept = old.join(new.select("_k"), "_k", "left_anti")
    merged = kept.unionByName(new).select("value")
    # materialize to tmp BEFORE touching the input dir (plans are lazy —
    # an in-place write would race its own scan)
    staged_swap(path, lambda tmp: merged.write.text(tmp))
