"""Per-event transform registry — the reference's transformer plugins, vectorized.

Reference surface (SURVEY.md §2.2; transformer/doc/transformer.md:11-92): an
ordered chain of named transforms applied to every record between reader and
writer, with a registry of built-ins (dx_substr, dx_pad, dx_replace, dx_filter,
dx_digest — TransformerRegistry.java:28-40) plus arbitrary user code
(dx_groovy, GroovyTransformer.java:25-88).

Spark re-expression: each transform is a factory producing a DataFrame→DataFrame
function built from Catalyst expressions (whole-stage codegen, never per-row
Python). The dx_groovy escape hatch becomes ``dx_pandas``: an Arrow-batched
``mapInPandas`` over user code (vectorized; returning fewer rows = filtering).

Columns are addressed by NAME (we upgrade the reference's positional
``columnIndex`` — Record.java:13-15 — to named schema; a positional int is
still accepted and resolved against the current schema order for job-spec
compatibility).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TransformFactory = Callable[..., Callable[[DataFrame], DataFrame]]

TRANSFORMS: dict[str, TransformFactory] = {}


def register_transform(name: str) -> Callable[[TransformFactory], TransformFactory]:
    def deco(fn: TransformFactory) -> TransformFactory:
        TRANSFORMS[name] = fn
        return fn

    return deco


def _colname(df: DataFrame, column) -> str:
    if isinstance(column, int):
        return df.columns[column]
    return column


@register_transform("dx_substr")
def dx_substr(column, start: int, length: int):
    """Substring [start, start+length) of a string column; NULL passes through.

    (SubstrTransformer.java:21-64; start is 0-based there, ours too.)"""

    def apply(df: DataFrame) -> DataFrame:
        c = _colname(df, column)
        return df.withColumn(c, F.substring(F.col(c), start + 1, length))

    return apply


@register_transform("dx_pad")
def dx_pad(column, mode: str, length: int, pad: str):
    """Left/right pad-or-truncate to exactly ``length`` (PadTransformer.java:21-89)."""
    if mode not in ("l", "r"):
        raise ValueError("dx_pad mode must be 'l' or 'r'")

    def apply(df: DataFrame) -> DataFrame:
        c = _colname(df, column)
        padded = F.lpad(F.col(c), length, pad) if mode == "l" else F.rpad(F.col(c), length, pad)
        return df.withColumn(c, padded)

    return apply


@register_transform("dx_replace")
def dx_replace(column, start: int, length: int, replacement: str):
    """Splice-replace the [start, start+length) range (ReplaceTransformer.java)."""

    def apply(df: DataFrame) -> DataFrame:
        c = _colname(df, column)
        col = F.col(c)
        spliced = F.concat(
            F.substring(col, 1, start),
            F.lit(replacement),
            col.substr(F.lit(start + length + 1), F.length(col)),
        )
        return df.withColumn(c, F.when(col.isNull(), None).otherwise(spliced))

    return apply


_COMPARE_OPS = {">", "<", "=", "!=", ">=", "<="}


@register_transform("dx_filter")
def dx_filter(column, op: str, value):
    """DROP rows whose column matches (FilterTransformer.java:20-310).

    ``like``/``not like`` are Java-regex FULL matches in the reference
    (FilterTransformer.java:294-301), not SQL LIKE — mapped to rlike anchored.
    Typed compare: numeric when the value parses as a number, else string."""

    def apply(df: DataFrame) -> DataFrame:
        c = _colname(df, column)
        col = F.col(c)
        if op == "like":
            pred = col.rlike(f"^(?:{value})$")
        elif op == "not like":
            pred = ~col.rlike(f"^(?:{value})$")
        elif op in _COMPARE_OPS:
            try:
                v = float(value)
                left = col.cast("double")
            except (TypeError, ValueError):
                v = value
                left = col
            pred = {
                ">": left > v, "<": left < v, "=": left == v,
                "!=": left != v, ">=": left >= v, "<=": left <= v,
            }[op]
        else:
            raise ValueError(f"dx_filter: unknown op {op!r}")
        # drop matching rows; NULL comparisons are not matches (kept)
        return df.filter(~F.coalesce(pred, F.lit(False)))

    return apply


@register_transform("dx_digest")
def dx_digest(column, algo: str = "md5", case: str = "lower"):
    """md5/sha1 hex digest of a column (DigestTransformer.java:32-85)."""

    def apply(df: DataFrame) -> DataFrame:
        c = _colname(df, column)
        d = F.md5(F.col(c).cast("string")) if algo == "md5" else F.sha1(F.col(c).cast("string"))
        d = F.upper(d) if case == "upper" else d
        return df.withColumn(c, d)

    return apply


@register_transform("dx_map")
def dx_map(columns: list):
    """Projection + constant injection + typed cast + date format — the file
    readers' per-cell ``column`` spec ({index|value, type, format},
    UnstructuredStorageReaderUtil.transportOneRecord:340-470) as one select."""

    def apply(df: DataFrame) -> DataFrame:
        exprs = []
        for i, spec in enumerate(columns):
            if "value" in spec:
                col = F.lit(spec["value"])
            else:
                name = spec.get("name", spec.get("index"))
                col = F.col(_colname(df, name))
            typ = spec.get("type")
            if typ in ("date", "timestamp") and spec.get("format"):
                col = F.to_timestamp(col, spec["format"])
            elif typ:
                col = col.cast({"long": "long", "double": "double", "string": "string",
                                "bool": "boolean", "bytes": "binary", "date": "date",
                                "timestamp": "timestamp", "int": "int"}[typ])
            exprs.append(col.alias(spec.get("as", f"c{i}")))
        return df.select(*exprs)

    return apply


@register_transform("dx_sql")
def dx_sql(expr_sql: str):
    """Arbitrary SQL expression filter/projection step (querySql-mode analog,
    ReaderSplitUtil.java:97-107): 'WHERE ...' filters, else selectExpr list."""

    def apply(df: DataFrame) -> DataFrame:
        s = expr_sql.strip()
        if s.lower().startswith("where "):
            return df.filter(s[6:])
        return df.selectExpr(*[e.strip() for e in s.split(",")])

    return apply


@register_transform("dx_pandas")
def dx_pandas(fn, schema=None, context=None):
    """User code over Arrow pandas batches (dx_groovy replacement,
    GroovyTransformer.java:25-88 — vectorized instead of per-record).

    ``fn(pdf) -> pdf`` may drop/alter rows; ``schema`` defaults to the input's.
    ``context`` ports the ComplexTransformer surface (ComplexTransformer.java:
    11-30 — UDF with a shared context map): the dict is broadcast once and
    passed to ``fn(pdf, ctx)`` in every task instead of re-shipping per batch.
    """

    def apply(df: DataFrame) -> DataFrame:
        out_schema = schema or df.schema
        bc = df.sparkSession.sparkContext.broadcast(context) if context is not None else None

        def gen(it):
            for pdf in it:
                out = fn(pdf, bc.value) if bc is not None else fn(pdf)
                if out is not None and len(out):
                    yield out

        return df.mapInPandas(gen, schema=out_schema)

    return apply


def apply_transform_chain(df: DataFrame, chain: list[dict]) -> DataFrame:
    """Apply an ordered list of {"name": ..., "parameter": {...}} specs
    (TransformerExchanger.doTransformer:53-127 — chained, short-circuit on
    filter)."""
    for step in chain:
        name = step["name"]
        if name not in TRANSFORMS:
            raise KeyError(f"unknown transform {name!r}; registered: {sorted(TRANSFORMS)}")
        params = step.get("parameter", {})
        factory = TRANSFORMS[name]
        df = factory(**params)(df)
    return df
