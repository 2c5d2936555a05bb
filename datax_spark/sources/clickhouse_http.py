"""ClickHouse wire connector over the HTTP interface — the clickhousereader
surface without a JDBC driver.

The reference's clickhousereader is CommonRdbmsReader with the ClickHouse
JDBC dialect (column / where / splitPk / querySql — semantics in
``sources/dbapi.py``). ClickHouse's OTHER public wire protocol is plain
HTTP: ``POST / `` with the SQL as the body, options as query params,
``X-ClickHouse-User/Key`` headers, result in the requested ``FORMAT``.
That protocol is exercisable end-to-end here (tests run a real TCP server
whose SQL engine is DuckDB, so the split queries actually execute), and on
a cluster the same code points at ``http://<clickhouse>:8123``.

Reference parity (cited, not copied):

- splitPk range split: one probe query for MIN/MAX under ``where``, even
  [lo, hi) ranges with the last inclusive, plus the ``splitPk IS NULL``
  residual task (``SingleTableSplitUtil.splitSingleTable:35-129``, NULL
  residual at ``:113-126``); no splitPk → one task
  (``mysqlreader.md:292-302``);
- ``querySql`` passthrough mode, one task per statement
  (``CommonRdbmsReader`` querySql branch);
- per-task connections: each Spark task POSTs its own split query — the
  channel model.

Spark shape: tasks fetch ``FORMAT JSONEachRow`` lines (one HTTP stream per
task) and the TYPED decode happens JVM-side via ``from_json`` against the
caller's schema — Catalyst, not Python, parses every row.
"""

from __future__ import annotations

import urllib.parse
import urllib.request

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ch_query(url: str, sql: str, database: str | None = None,
             user: str | None = None, password: str | None = None,
             timeout: float = 60.0) -> bytes:
    """One HTTP query against a ClickHouse endpoint; returns the raw body."""
    params = {}
    if database:
        params["database"] = database
    full = url + ("/?" + urllib.parse.urlencode(params) if params else "/")
    headers = {"Content-Type": "text/plain"}
    if user:
        headers["X-ClickHouse-User"] = user
    if password:
        headers["X-ClickHouse-Key"] = password
    req = urllib.request.Request(full, data=sql.encode(), method="POST",
                                 headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if resp.status != 200:
            raise IOError(f"clickhouse query failed: HTTP {resp.status}")
        return resp.read()


def build_ch_split_sqls(
    url: str,
    table: str,
    columns: list[str] | None,
    where: str | None,
    split_pk: str | None,
    n_splits: int,
    database: str | None = None,
    user: str | None = None,
    password: str | None = None,
) -> list[str]:
    """Per-task SELECTs tiling the table exactly once — split arithmetic
    shared with the DB-API reader (``dbapi.range_split_predicates``:
    splitSingleTable + RangeSplitUtil parity; int and ASCII-string keys);
    non-splittable key types degrade to one task instead of failing."""
    from datax_spark.sources.dbapi import range_split_predicates

    cols = ", ".join(columns) if columns and columns != ["*"] else "*"
    base_where = f" AND ({where})" if where else ""
    plain_where = f" WHERE ({where})" if where else ""
    if not split_pk or n_splits <= 1:
        return [f"SELECT {cols} FROM {table}{plain_where}"]
    probe = (f"SELECT min({split_pk}), max({split_pk}) FROM {table} "
             f"WHERE {split_pk} IS NOT NULL{base_where}")
    body = ch_query(url, probe + " FORMAT TSV", database, user, password)
    line = body.decode().strip().split("\n")[0] if body.strip() else ""
    lo = hi = None
    if line and "\\N" not in line:
        lo_s, hi_s = line.split("\t")
        try:
            lo, hi = int(lo_s), int(hi_s)
        except ValueError:
            try:
                float(lo_s)  # numeric-but-not-integer key (Float/Decimal):
                lo = hi = None  # string-range predicates would miscompare —
                #                 degrade to one task instead
            except ValueError:
                lo, hi = lo_s, hi_s  # true string keys: base-128 ranges
    preds = range_split_predicates(split_pk, lo, hi, n_splits)
    if preds is None:  # empty table / all-NULL keys / unsupported type
        return [f"SELECT {cols} FROM {table}{plain_where}"]
    out = [f"SELECT {cols} FROM {table} WHERE {p}{base_where}" for p in preds]
    # NULL residual slice (splitSingleTable:113-126): never drop NULL keys
    out.append(f"SELECT {cols} FROM {table} "
               f"WHERE {split_pk} IS NULL{base_where}")
    return out


def clickhouse_http_read(
    spark: SparkSession,
    url: str,
    schema: str,
    table: str | None = None,
    columns: list[str] | None = None,
    where: str | None = None,
    split_pk: str | None = None,
    n_splits: int = 1,
    query_sql: str | list[str] | None = None,
    database: str | None = None,
    user: str | None = None,
    password: str | None = None,
) -> DataFrame:
    """Distributed ClickHouse-over-HTTP read; ``schema`` is the Spark DDL
    string the JSONEachRow payload decodes into (from_json, JVM-side)."""
    if query_sql is not None:
        sqls = [query_sql] if isinstance(query_sql, str) else list(query_sql)
    else:
        if table is None:
            raise ValueError("need table or query_sql")
        sqls = build_ch_split_sqls(url, table, columns, where, split_pk,
                                   n_splits, database, user, password)
    creds = {"url": url, "database": database, "user": user,
             "password": password}

    def fetch(pdfs):
        for pdf in pdfs:
            for _, task in pdf.iterrows():
                body = ch_query(
                    creds["url"], task["sql"] + " FORMAT JSONEachRow",
                    creds["database"], creds["user"], creds["password"])
                lines = [ln for ln in body.decode().split("\n") if ln.strip()]
                if lines:
                    yield pd.DataFrame({"value": lines})

    tasks = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sqls)], "i int, sql string"
    ).repartition(len(sqls), "i")
    raw = tasks.mapInPandas(fetch, "value string")
    return raw.select(F.from_json("value", schema).alias("r")).select("r.*")


def clickhouse_http_write(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = 10_000,
    database: str | None = None,
    user: str | None = None,
    password: str | None = None,
    max_tasks: int | None = None,
) -> dict:
    """Batched ``INSERT INTO <table> FORMAT JSONEachRow`` POSTs — the
    clickhousewriter surface (CommonRdbmsWriter batch-INSERT semantics) over
    HTTP. Rows are serialized JVM-side (``to_json``); each task streams its
    partition through its own connection in ``batch_size`` chunks. Returns
    {"rows", "batches"}."""
    if max_tasks:
        df = df.coalesce(max_tasks)
    lines = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    creds = {"url": url, "database": database, "user": user,
             "password": password}
    head = f"INSERT INTO {table} FORMAT JSONEachRow\n"

    def ship(pdfs):
        rows = batches = 0
        buf: list[str] = []

        def flush():
            nonlocal batches, buf
            if buf:
                ch_query(creds["url"], head + "\n".join(buf),
                         creds["database"], creds["user"], creds["password"])
                batches += 1
                buf = []

        for pdf in pdfs:
            for v in pdf["value"]:
                buf.append(v)
                rows += 1
                if len(buf) >= batch_size:
                    flush()
        flush()
        yield pd.DataFrame({"rows": [rows], "batches": [batches]})

    stats = lines.mapInPandas(ship, "rows long, batches long").agg(
        F.sum("rows").alias("rows"), F.sum("batches").alias("batches")
    ).collect()[0]
    return {"rows": stats["rows"] or 0, "batches": stats["batches"] or 0}
