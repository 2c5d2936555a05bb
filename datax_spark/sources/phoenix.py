"""Phoenix SQL-over-HBase reader analog (reference ``hbase20xsqlreader``).

The reference reads HBase through the Phoenix QueryServer's thin JDBC
(Avatica) client: validate the table/columns/splitKey against
``SYSTEM.CATALOG``, plan per-task SELECTs — user ``querySql`` list, explicit
``splitPoints`` ranges, or auto min/max splitKey ranges — then stream each
split on its own connection (``HBase20SQLReaderHelper.java:37-66,170-246``,
``HBase20xSQLReaderTask.java``).

This module reproduces that planning layer exactly and executes the splits
through the shared DB-API seam (:func:`datax_spark.sources.dbapi.dbapi_read`
``query_sqls`` mode — one connection per Spark task, ``fetchmany``
streaming). ``phoenixdb`` exposes the same DB-API 2.0 surface as the
in-sandbox sqlite3 test double, so on a real cluster it drops in as
``driver="phoenixdb"`` with the QueryServer URL in ``connect_args`` — the
same substitution documented for psycopg2/mysqlclient on the RDBMS path.

Differences from the generic RDBMS reader, mirrored from the reference:

- identifiers are double-quoted Phoenix-style, with an optional ``schema``
  prefix (``HBase20SQLReaderHelper.validateParameter:50-56``);
- the auto splitKey path requires the key to be a PRIMARY-KEY column
  (``checkTable:123-129`` — a non-PK split forces full scans per split) and
  emits NO ``IS NULL`` residual slice: Phoenix PKs are non-null, and the
  reference instead falls back to one ``splitKey IS NOT NULL`` task when a
  range list cannot be built (``doSplit:227-235``);
- user ``splitPoints`` (pre-known region boundaries) become n+1 half-open
  ranges ``key <= p1``, ``p_{i-1} < key <= p_i``, ``key > p_n`` with
  type-directed literal framing — strings quoted, dates/times/timestamps
  wrapped in ``TO_DATE/TO_TIME/TO_TIMESTAMP``, binary/array rejected
  (``buildSplitRange:264-318``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .dbapi import dbapi_read, query_sql, range_split_predicates


def quote_table(table: str, schema: str | None = None) -> str:
    """``"schema"."table"`` / ``"table"`` framing (validateParameter:50-56)."""
    if schema:
        return f'"{schema}"."{table}"'
    return f'"{table}"'


def clean_where(where: str | None) -> str | None:
    """dealWhere parity: trim and drop a trailing ASCII or full-width
    semicolon (``HBase20SQLReaderHelper.dealWhere:156-166``)."""
    if not where or not where.strip():
        return None
    w = where.strip()
    if w.endswith(";") or w.endswith("；"):
        w = w[:-1]
    return w


def _literal(value, kind: str) -> str:
    """Type-directed split-point literal (buildSplitRange:276-295)."""
    if kind in ("binary", "varbinary", "array"):
        raise ValueError(
            f"splitKey type {kind!r} is not splittable "
            "(buildSplitRange rejects BINARY/VARBINARY/ARRAY)")
    if kind in ("char", "varchar", "string"):
        return "'%s'" % value
    if kind == "date":
        return "TO_DATE('%s')" % value
    if kind == "time":
        return "TO_TIME('%s')" % value
    if kind == "timestamp":
        return "TO_TIMESTAMP('%s')" % value
    return str(value)


def split_point_predicates(split_key: str, points: list,
                           kind: str = "long") -> list[str]:
    """n+1 range predicates over user split points (buildSplitRange:296-308):
    ``key <= p1``; ``p_{i-1} < key <= p_i``; ``key > p_n``. Together they
    tile the whole key space exactly once, so no residual slice is needed."""
    if not points:
        raise ValueError("split_points must be non-empty")
    out = []
    lits = [_literal(p, kind) for p in points]
    for i in range(len(points) + 1):
        if i == 0:
            out.append(f"{split_key} <= {lits[0]}")
        elif i == len(points):
            out.append(f"{split_key} > {lits[-1]}")
        else:
            out.append(f"{split_key} > {lits[i - 1]} AND "
                       f"{split_key} <= {lits[i]}")
    return out


def check_catalog(driver: str, database: str, catalog_sql: str,
                  columns: list[str] | None, split_key: str | None,
                  connect_args: dict | None = None,
                  ) -> tuple[list[str], list[str]]:
    """checkTable parity (``HBase20SQLReaderHelper.checkTable:88-138``):
    ``catalog_sql`` must yield ``(column_name, column_family)`` rows for the
    target table — the reference's ``SYSTEM.CATALOG`` select, where a NULL
    column family marks a primary-key column. Validates that every requested
    column exists and that ``split_key`` is a PK column; returns
    ``(all_columns, pk_columns)``."""
    rows = query_sql(driver, database, catalog_sql, connect_args)
    all_cols = [r[0] for r in rows]
    pk_cols = [r[0] for r in rows if r[1] is None]
    for c in columns or []:
        if c not in all_cols:
            raise ValueError(
                f"column {c!r} not in table metadata (checkTable:115-121)")
    if split_key is not None and split_key not in pk_cols:
        raise ValueError(
            f"splitKey {split_key!r} is not a primary-key column "
            "(checkTable:123-129 — non-PK splits destroy read performance)")
    return all_cols, pk_cols


def build_phoenix_splits(
    driver: str,
    database: str,
    table: str,
    columns: list[str],
    where: str | None = None,
    split_key: str | None = None,
    split_points: list | None = None,
    split_point_kind: str = "long",
    num_partitions: int = 4,
    schema_name: str | None = None,
    connect_args: dict | None = None,
) -> list[str]:
    """Per-task SELECT list (``doSplit:170-246`` parity). Ranges come from
    explicit ``split_points`` when given, else from MIN/MAX of ``split_key``
    under ``where`` through the shared range arithmetic; no usable range ⇒
    the reference's single ``splitKey IS NOT NULL`` task (or the bare query
    when there is no split key at all)."""
    where = clean_where(where)
    full = quote_table(table, schema_name)
    cols = ", ".join(f'"{c}"' for c in columns)
    base = f"SELECT {cols} FROM {full}"
    base_where = f" WHERE {where}" if where else ""
    glue = " AND " if where else " WHERE "
    if split_points:
        preds = split_point_predicates(split_key, split_points,
                                       split_point_kind)
        return [f"{base}{base_where}{glue}({p})" for p in preds]
    if not split_key or num_partitions <= 1:
        return [base + base_where]
    guard = f"({where}) AND " if where else ""
    mm_where = f"{base_where}{glue}{split_key} IS NOT NULL"
    mm = query_sql(
        driver, database,
        f'SELECT MIN("{split_key}"), MAX("{split_key}") FROM {full}{mm_where}',
        connect_args,
    )[0]
    preds = range_split_predicates(split_key, mm[0], mm[1], num_partitions)
    if preds is None:
        # getPkRange came back empty/unsplittable: one IS NOT NULL task
        # (doSplit:227-235) — Phoenix PKs are non-null so nothing is lost
        return [f"{base}{base_where}{glue}{split_key} IS NOT NULL"]
    return [f"{base} WHERE {guard}{p}" for p in preds]


def phoenix_read(
    spark,
    driver: str,
    database: str,
    schema: str,
    table: str | None = None,
    columns: list[str] | None = None,
    where: str | None = None,
    split_key: str | None = None,
    split_points: list | None = None,
    split_point_kind: str = "long",
    num_partitions: int = 4,
    query_sqls: list[str] | None = None,
    catalog_sql: str | None = None,
    fetch_size: int = 1024,
    connect_args: dict | None = None,
    schema_name: str | None = None,
) -> DataFrame:
    """SQL-over-HBase parallel read (``hbase20xsqlreader`` analog).

    ``query_sqls`` mode bypasses planning entirely — one user statement per
    task (``doSplit:238-244``). Otherwise ``table`` (+ optional ``columns``/
    ``where``/``split_key``/``split_points``) plans per-task SELECTs as the
    reference does, optionally validated against ``catalog_sql`` metadata
    first. ``schema`` is the output DDL (DB-API cursors carry no reliable
    type metadata — same contract as :func:`dbapi_read`)."""
    from pyspark.sql import types as T

    if query_sqls is None:
        if table is None:
            raise ValueError("phoenix_read needs table= or query_sqls=")
        names = [f.name for f in T._parse_datatype_string(schema).fields]
        cols = columns or names
        if catalog_sql:
            check_catalog(driver, database, catalog_sql, cols, split_key,
                          connect_args)
        query_sqls = build_phoenix_splits(
            driver, database, table, cols, where, split_key, split_points,
            split_point_kind, num_partitions, schema_name, connect_args,
        )
    return dbapi_read(
        spark, driver, database, schema,
        query_sqls=query_sqls, fetch_size=fetch_size,
        connect_args=connect_args,
    )
