"""Nested-data flattening — the reference's edge flatteners, on native types.

The reference has no nested types in its channel (8 scalars only): readers
flatten at the edge — MongoDB walks nested Documents by a dotted column path
and joins arrays into delimited strings (MongoDBReader.java:125-160); the OTS
stream reader splats a ``_tags`` map into per-column strings
(SingleVerAndUpOnlyModeRecordSender.java:63-75); HBase's multi-version mode
emits one record per cell version (hbase11xreader, SURVEY.md §2.1).

Spark re-expression: keep data NESTED (StructType/ArrayType/MapType) through
the plan and flatten declaratively only where a flat sink needs it —
``col("a.b.c")`` for dotted paths, ``concat_ws`` for array-join,
``explode``/``inline`` for version fan-out, ``from_json`` for document ingest.
All Catalyst expressions; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.transforms.registry import register_transform


def _path_type(schema: T.StructType, path: str) -> T.DataType | None:
    """Resolve the data type at a dotted path, or None if unresolvable."""
    cur: T.DataType = schema
    for part in path.split("."):
        if not isinstance(cur, T.StructType):
            return None
        match = next((f for f in cur.fields if f.name == part), None)
        if match is None:
            return None
        cur = match.dataType
    return cur


def flatten_expr(df: DataFrame, path: str, array_delimiter: str = ",") -> Column:
    """One flattened cell: dotted-path navigation; arrays of atomics join to a
    delimited string (MongoDBReader.java:145-152 semantics); maps splat via
    explicit ``path.key`` (map access below)."""
    dtype = _path_type(df.schema, path)
    col = F.col(path) if dtype is not None else _map_aware_col(df, path)
    if isinstance(dtype, T.ArrayType) and not isinstance(
        dtype.elementType, (T.StructType, T.ArrayType, T.MapType)
    ):
        return F.concat_ws(array_delimiter, col.cast("array<string>"))
    return col


def _map_aware_col(df: DataFrame, path: str) -> Column:
    """Resolve ``a.b.key`` where some prefix is a MapType (OTS ``_tags``)."""
    parts = path.split(".")
    for i in range(len(parts) - 1, 0, -1):
        prefix = ".".join(parts[:i])
        dtype = _path_type(df.schema, prefix)
        if isinstance(dtype, T.MapType):
            col = F.col(prefix)
            for key in parts[i:]:
                col = col.getItem(key)
            return col
    return F.col(path)


def flatten(df: DataFrame, mapping: dict[str, str], array_delimiter: str = ",") -> DataFrame:
    """Project ``{out_name: dotted.path}`` into a flat DataFrame."""
    return df.select(
        *[flatten_expr(df, path, array_delimiter).alias(name) for name, path in mapping.items()]
    )


def parse_json(df: DataFrame, json_col: str, schema: T.StructType | str,
               out_col: str = "doc", drop: bool = True) -> DataFrame:
    """Document ingest: JSON string column → typed nested struct (the Spark
    path for Mongo-style sources: connector or JSON + from_json, SURVEY §2.1)."""
    out = df.withColumn(out_col, F.from_json(F.col(json_col), schema))
    return out.drop(json_col) if drop else out


def explode_versions(df: DataFrame, versions_col: str,
                     keep: list[str] | None = None) -> DataFrame:
    """Multi-version cell fan-out: one row per element of an array<struct>
    column (hbase11xreader multi-version mode → explode, SURVEY §2.1).
    Struct fields are splatted alongside the kept columns."""
    keep = keep if keep is not None else [c for c in df.columns if c != versions_col]
    exploded = df.select(*keep, F.explode(F.col(versions_col)).alias("_v"))
    vfields = [f.name for f in exploded.schema["_v"].dataType.fields]
    return exploded.select(*keep, *[F.col(f"_v.{f}").alias(f) for f in vfields])


@register_transform("dx_flatten")
def dx_flatten(mapping: dict, arrayDelimiter: str = ","):  # noqa: N803
    """Job-spec transform wrapping :func:`flatten`."""

    def apply(df: DataFrame) -> DataFrame:
        return flatten(df, mapping, arrayDelimiter)

    return apply
