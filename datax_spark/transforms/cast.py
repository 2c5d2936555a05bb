"""ColumnCast parity — config-driven typed casts with a format fallback chain.

The reference centralizes cross-type casting in ``ColumnCast``
(common/.../element/ColumnCast.java:13-122), bound once at engine start
(core Engine.java:43) from job config: ``datetimeFormat`` (default
``yyyy-MM-dd HH:mm:ss``), ``dateFormat`` (``yyyy-MM-dd``), ``timeFormat``
(``HH:mm:ss``), a list of ``extraFormats``, a timezone (GMT+8 default) and an
encoding. String→Date parsing tries datetime, then date, then time, then the
extras, first success wins (ColumnCast.java:92-122).

Spark re-expression: the chain becomes ONE Catalyst expression —
``coalesce(try_to_timestamp(col, f) for f in chain)`` — evaluated inside
whole-stage codegen; no Python in the hot path. Scalar casts use ``try_cast``
so malformed cells become NULL (→ the dirty-record channel) instead of failing
the task under ANSI mode, matching the reference's bad-record-to-collector
behavior (CommonRdbmsReader.buildRecord:241-350). The session timezone is the
Spark analog of the reference's global GMT+8 (set it via
``spark.sql.session.timeZone``; our default is UTC, see session.py).

The 8 reference column types (Column.java:74-76) map to: string, long, int,
double, decimal(38,18) (string-backed DoubleColumn exactness), boolean,
binary, date, timestamp.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datax_spark.transforms.registry import register_transform

# Java SimpleDateFormat patterns (the reference's config format) → Spark's
# java.time patterns are compatible for the subset we care about.
DEFAULT_DATETIME_FORMAT = "yyyy-MM-dd HH:mm:ss"
DEFAULT_DATE_FORMAT = "yyyy-MM-dd"
DEFAULT_TIME_FORMAT = "HH:mm:ss"


@dataclass
class CastFormats:
    """The ColumnCast.java:46-56 config block."""

    datetime_format: str = DEFAULT_DATETIME_FORMAT
    date_format: str = DEFAULT_DATE_FORMAT
    time_format: str = DEFAULT_TIME_FORMAT
    extra_formats: list[str] = field(default_factory=list)

    def chain(self) -> list[str]:
        return [self.datetime_format, self.date_format, self.time_format,
                *self.extra_formats]


def parse_timestamp_expr(col: Column, formats: CastFormats | None = None) -> Column:
    """String→timestamp with the reference's try-each-format-in-order chain
    (ColumnCast.java:92-122), as a single coalesce of try_to_timestamp."""
    formats = formats or CastFormats()
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in formats.chain()])


_SIMPLE_TYPES = {
    "string": "string",
    "long": "long",
    "int": "int",
    "double": "double",
    "decimal": "decimal(38,18)",
    "bool": "boolean",
    "boolean": "boolean",
    "bytes": "binary",
    "binary": "binary",
    "date": "date",
}


def cast_expr(col: Column, typ: str, formats: CastFormats | None = None,
              fmt: str | None = None) -> Column:
    """One typed cast: NULL on malformed input (never a task failure)."""
    if typ in ("timestamp", "datetime"):
        if fmt:
            return F.try_to_timestamp(col, F.lit(fmt))
        return parse_timestamp_expr(col, formats)
    if typ == "date":
        parsed = F.try_to_timestamp(col, F.lit(fmt)) if fmt else parse_timestamp_expr(col, formats)
        # non-string inputs (already date/timestamp) cast directly
        return F.coalesce(col.try_cast("date"), parsed.try_cast("date"))
    if typ not in _SIMPLE_TYPES:
        raise ValueError(f"cast_expr: unknown type {typ!r}")
    return col.try_cast(_SIMPLE_TYPES[typ])


def cast_columns(df: DataFrame, specs: list[dict],
                 formats: CastFormats | None = None) -> DataFrame:
    """Apply a list of ``{"name": col, "type": t, "format": optional}`` casts
    in place (the boundary-cast layer of SURVEY.md §2.5, vectorized)."""
    out = df
    for s in specs:
        c = s["name"]
        out = out.withColumn(c, cast_expr(F.col(c), s["type"], formats, s.get("format")))
    return out


@register_transform("dx_cast")
def dx_cast(columns: list, datetimeFormat: str = DEFAULT_DATETIME_FORMAT,  # noqa: N803
            dateFormat: str = DEFAULT_DATE_FORMAT,  # noqa: N803
            timeFormat: str = DEFAULT_TIME_FORMAT,  # noqa: N803
            extraFormats: list[str] | None = None):  # noqa: N803
    """Job-spec transform: ColumnCast config block + per-column cast specs."""
    formats = CastFormats(datetimeFormat, dateFormat, timeFormat, list(extraFormats or []))

    def apply(df: DataFrame) -> DataFrame:
        return cast_columns(df, columns, formats)

    return apply
