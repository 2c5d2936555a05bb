"""ClickHouse-over-HTTP connector tests against a real TCP server whose SQL
engine is DuckDB — the split queries genuinely execute, so range tiling,
NULL residuals, and querySql mode are proven end-to-end over the wire."""

from __future__ import annotations

import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.sources.clickhouse_http import (  # noqa: E402
    build_ch_split_sqls,
    clickhouse_http_read,
)


class FakeClickHouse:
    """HTTP endpoint speaking the ClickHouse dialect surface this connector
    uses (POST body SQL, FORMAT TSV/JSONEachRow) with DuckDB executing."""

    def __init__(self, setup_sql: list[str]):
        self._con = duckdb.connect()
        for s in setup_sql:
            self._con.execute(s)
        self._lock = threading.Lock()
        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                sql = self.rfile.read(n).decode()
                first, _, rest = sql.partition("\n")
                if first.strip().upper().startswith("INSERT INTO") \
                        and first.rstrip().endswith("FORMAT JSONEachRow"):
                    import pandas as pd
                    table = first.split()[2]
                    rows = [json.loads(ln) for ln in rest.split("\n")
                            if ln.strip()]
                    payload = pd.DataFrame(rows)  # noqa: F841 (duckdb scans it)
                    with fake._lock:
                        fake._con.execute(
                            f"INSERT INTO {table} BY NAME "
                            "SELECT * FROM payload")
                    self.send_response(200)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                fmt = "TSV"
                for f in ("JSONEachRow", "TSV"):
                    if sql.rstrip().endswith("FORMAT " + f):
                        fmt = f
                        sql = sql.rstrip()[: -len("FORMAT " + f)].rstrip()
                try:
                    with fake._lock:
                        cur = fake._con.execute(sql)
                        names = [d[0] for d in cur.description]
                        data = cur.fetchall()
                except Exception as e:  # noqa: BLE001
                    body = str(e).encode()
                    self.send_response(500)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if fmt == "JSONEachRow":
                    # fetchall (not .df().to_json()): pandas upcasts nullable
                    # int columns to float, emitting "id":7.0 — a real
                    # ClickHouse emits proper ints, and the connector's typed
                    # from_json decode rightly rejects 7.0 as a long
                    import decimal

                    def jdefault(v):
                        if isinstance(v, decimal.Decimal):
                            return float(v)
                        return str(v)

                    body = "\n".join(
                        json.dumps(dict(zip(names, row)), default=jdefault)
                        for row in data
                    ).encode()
                else:
                    body = "\n".join(
                        "\t".join("\\N" if v is None or v != v else str(v)
                                  for v in row)
                        for row in data
                    ).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    @property
    def url(self):
        h, p = self._server.server_address
        return f"http://{h}:{p}"

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *a):
        self._server.shutdown()
        self._server.server_close()


SETUP = [
    """CREATE TABLE ev AS
       SELECT i AS id, 'u' || (i % 7) AS user, i * 1.5 AS score
       FROM range(0, 100) t(i)""",
    "INSERT INTO ev VALUES (NULL, 'u-null', -1.0)",
]
SCHEMA = "id long, user string, score double"


def test_split_read_tiles_exactly(spark):
    with FakeClickHouse(SETUP) as ch:
        df = clickhouse_http_read(
            spark, ch.url, SCHEMA, table="ev",
            columns=["id", "user", "score"], split_pk="id", n_splits=4)
        rows = df.collect()
        assert len(rows) == 101  # 100 ranged + 1 NULL residual
        ids = sorted(r["id"] for r in rows if r["id"] is not None)
        assert ids == list(range(100))  # exactly once each
        assert any(r["id"] is None and r["user"] == "u-null" for r in rows)
        assert {type(r["score"]) for r in rows if r["score"]} == {float}


def test_where_pushes_into_every_split(spark):
    with FakeClickHouse(SETUP) as ch:
        df = clickhouse_http_read(
            spark, ch.url, SCHEMA, table="ev", where="id >= 50",
            split_pk="id", n_splits=3)
        ids = sorted(r["id"] for r in df.collect() if r["id"] is not None)
        assert ids == list(range(50, 100))


def test_query_sql_mode_one_task_each(spark):
    with FakeClickHouse(SETUP) as ch:
        df = clickhouse_http_read(
            spark, ch.url, SCHEMA,
            query_sql=["SELECT id, user, score FROM ev WHERE id < 10",
                       "SELECT id, user, score FROM ev WHERE id >= 90"])
        ids = sorted(r["id"] for r in df.collect() if r["id"] is not None)
        assert ids == list(range(10)) + list(range(90, 100))


def test_http_write_roundtrip(spark):
    with FakeClickHouse(
            ["CREATE TABLE sink (id BIGINT, user VARCHAR, score DOUBLE)"]) as ch:
        from datax_spark.sources.clickhouse_http import clickhouse_http_write

        src = spark.createDataFrame(
            [(i, f"u{i}", i * 0.5) for i in range(40)],
            "id long, user string, score double").repartition(2)
        stats = clickhouse_http_write(src, ch.url, "sink", batch_size=16)
        assert stats["rows"] == 40 and stats["batches"] >= 3
        back = clickhouse_http_read(spark, ch.url, SCHEMA, table="sink")
        got = {r["id"]: (r["user"], r["score"]) for r in back.collect()}
        assert len(got) == 40 and got[7] == ("u7", 3.5)


def test_split_sql_shapes():
    with FakeClickHouse(SETUP) as ch:
        sqls = build_ch_split_sqls(ch.url, "ev", ["id"], None, "id", 4)
        assert len(sqls) == 5  # 4 ranges + NULL residual
        assert sqls[-1].endswith("WHERE id IS NULL")
        assert " <= 99" in sqls[-2]  # last range inclusive of max
        # no splitPk -> single statement
        assert len(build_ch_split_sqls(ch.url, "ev", None, None, None, 4)) == 1


def test_non_integer_splitpk_degrades_gracefully(spark):
    """Float splitPk: string-range predicates would miscompare, so the read
    degrades to a single statement instead of failing (review fix)."""
    with FakeClickHouse(SETUP) as ch:
        sqls = build_ch_split_sqls(ch.url, "ev", ["id"], None, "score", 4)
        assert len(sqls) == 1 and "score >=" not in sqls[0]
        df = clickhouse_http_read(spark, ch.url, SCHEMA, table="ev",
                                  split_pk="score", n_splits=4)
        assert df.count() == 101


def test_string_splitpk_splits_via_base128(spark):
    with FakeClickHouse(SETUP) as ch:
        sqls = build_ch_split_sqls(ch.url, "ev", ["id", "user"], None,
                                   "user", 3)
        assert len(sqls) >= 3 and sqls[-1].endswith("WHERE user IS NULL")
        df = clickhouse_http_read(spark, ch.url, SCHEMA, table="ev",
                                  split_pk="user", n_splits=3)
        rows = df.collect()
        ids = sorted(r["id"] for r in rows if r["id"] is not None)
        assert ids == list(range(100))  # tiles exactly once incl. residual
