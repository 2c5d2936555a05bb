"""DB-API writer: writeMode templates (WriterUtil parity), batched writes with
per-row fallback → dirty quarantine, preSql/postSql, upsert round trips
against a REAL embedded DB (sqlite3)."""

from __future__ import annotations

import sqlite3

import pytest

from datax_spark.plans import run_job
from datax_spark.sources.dbapi import dbapi_write, get_write_template, query_sql


def test_write_templates_match_reference():
    cols = ["id", "name", "v"]
    # mysql update → INSERT … ON DUPLICATE KEY UPDATE (WriterUtil.java:111-168)
    t = get_write_template("mysql", "update", "t", cols)
    assert t == ("INSERT INTO t (id, name, v) VALUES (%s, %s, %s) "
                 "ON DUPLICATE KEY UPDATE id = VALUES(id), name = VALUES(name), "
                 "v = VALUES(v)")
    assert get_write_template("mysql", "replace", "t", cols).startswith("REPLACE INTO t")
    assert get_write_template("sqlite", "insert", "t", cols) == \
        "INSERT INTO t (id, name, v) VALUES (?, ?, ?)"
    pg = get_write_template("postgres", "update", "t", cols, key_cols=["id"])
    assert "ON CONFLICT (id) DO UPDATE SET name = excluded.name, v = excluded.v" in pg
    with pytest.raises(ValueError):
        get_write_template("postgres", "update", "t", cols)  # keyCols required


def test_upsert_twice_final_state(spark, tmp_path):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE kv (id INTEGER PRIMARY KEY, name TEXT, v INTEGER)")
    con.commit(); con.close()

    df1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long")
    s1 = dbapi_write(df1, "sqlite3", db, "kv", write_mode="update",
                     key_cols=["id"], max_tasks=2)
    assert s1 == {"written": 3, "dirty": 0, "dirty_reasons": {}, "quarantine_files": []}
    # second pass updates 2 keys, inserts 1 — idempotent keyed apply
    df2 = spark.createDataFrame(
        [(2, "B", 200), (3, "C", 300), (4, "d", 40)], "id long, name string, v long")
    dbapi_write(df2, "sqlite3", db, "kv", write_mode="update",
                key_cols=["id"], max_tasks=2)
    got = query_sql("sqlite3", db, "SELECT id, name, v FROM kv ORDER BY id")
    assert got == [(1, "a", 10), (2, "B", 200), (3, "C", 300), (4, "d", 40)]


def test_replace_mode(spark, tmp_path):
    db = str(tmp_path / "r.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE kv (id INTEGER PRIMARY KEY, v INTEGER)")
    con.commit(); con.close()
    df = spark.createDataFrame([(1, 1), (1, 2)], "id long, v long").coalesce(1)
    dbapi_write(df, "sqlite3", db, "kv", write_mode="replace", max_tasks=1)
    got = query_sql("sqlite3", db, "SELECT count(*) FROM kv")
    assert got == [(1,)]


def test_batch_fail_degrades_to_row_fail_and_quarantines(spark, tmp_path):
    """A batch holding constraint-violating rows is replayed row-by-row:
    good rows land, bad rows quarantine with a reason
    (CommonRdbmsWriter.doBatchInsert:348-409 parity)."""
    db = str(tmp_path / "q.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE kv (id INTEGER PRIMARY KEY, v INTEGER NOT NULL)")
    con.commit(); con.close()
    rows = [(1, 10), (2, None), (3, 30), (3, 31)]  # NULL v + dup PK under insert
    df = spark.createDataFrame(rows, "id long, v long").coalesce(1)
    qdir = str(tmp_path / "quarantine")
    stats = dbapi_write(df, "sqlite3", db, "kv", write_mode="insert",
                        batch_size=100, quarantine_dir=qdir, max_tasks=1)
    assert stats["written"] == 2 and stats["dirty"] == 2
    assert stats["dirty_reasons"] == {"IntegrityError": 2}
    q = spark.read.parquet(*stats["quarantine_files"])
    assert q.count() == 2 and "_dirty_reason" in q.columns
    got = query_sql("sqlite3", db, "SELECT id, v FROM kv ORDER BY id")
    assert got == [(1, 10), (3, 30)]


def test_jobspec_dbapi_with_pre_post_sql(spark, tmp_path):
    """Full job: preSql creates+seeds the table, write upserts, postSql
    verified driver-side (Job.prepare:89-129 / Job.post:137-167)."""
    db = str(tmp_path / "job.db")
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string") \
        .write.parquet(src)
    job = {"job": {"content": [{
        "reader": {"name": "parquetreader", "parameter": {"path": src}},
        "writer": {"name": "dbapiwriter", "parameter": {
            "database": db, "table": "kv", "writeMode": "update",
            "keyCols": ["id"], "maxTasks": 1,
            "preSql": [
                "CREATE TABLE kv (id INTEGER PRIMARY KEY, name TEXT)",
                "INSERT INTO kv VALUES (1, 'old')",
            ],
            "postSql": ["CREATE TABLE done AS SELECT count(*) AS n FROM kv"],
        }},
    }]}}
    stats = run_job(spark, job)
    assert stats["contents"][0]["writer_result"]["written"] == 2
    assert query_sql("sqlite3", db, "SELECT name FROM kv WHERE id=1") == [("x",)]
    assert query_sql("sqlite3", db, "SELECT n FROM done") == [(2,)]


def test_bulk_writer_es_payloads(spark, tmp_path):
    """ES _bulk framing: action+source line pairs, keyed _id, batch splitting
    (elasticsearchwriter parity, transport spooled to files)."""
    import json
    import os

    from datax_spark.plans import run_job

    spool = str(tmp_path / "bulk")
    job = {"job": {"content": [{
        "reader": {"name": "streamreader", "parameter": {
            "sliceRecordCount": 25,
            "column": [{"name": "id", "random": "0,10000", "type": "long"},
                       {"name": "v", "value": "x", "type": "string"}]}},
        "writer": {"name": "eswriter", "parameter": {
            "index": "docs", "keyCols": ["id"], "batchSize": 10,
            "endpointDir": spool, "maxTasks": 1, "actionType": "update"}},
    }]}}
    stats = run_job(spark, job)
    wr = stats["contents"][0]["writer_result"]
    assert wr["rows"] == 25 and wr["batches"] == 3  # 10+10+5
    files = sorted(os.listdir(spool))
    assert len(files) == 3
    lines = open(os.path.join(spool, files[0])).read().strip().split("\n")
    assert len(lines) == 20  # action + source per row
    act = json.loads(lines[0])
    assert act["update"]["_index"] == "docs" and "_id" in act["update"]
    assert json.loads(lines[1])["doc_as_upsert"] is True


def test_bulk_writer_stream_load_format(spark, tmp_path):
    import os

    from datax_spark.sources.bulk import bulk_write

    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, v string")
    spool = str(tmp_path / "sl")
    stats = bulk_write(df.coalesce(1), index="t", fmt="stream_load",
                       batch_size=10, endpoint_dir=spool, max_tasks=1)
    assert stats["rows"] == 2 and stats["batches"] == 1
    body = open(os.path.join(spool, os.listdir(spool)[0])).read()
    assert body == "1\x01a\n2\x01\n"


def test_bulk_payload_builders_match_shipped_bytes(spark, tmp_path):
    """The exported payload builders are the reference implementation of the
    task closure's framing — byte-identical output."""
    import os

    from datax_spark.sources.bulk import bulk_write, es_bulk_payload

    rows = [{"id": 7, "v": "a"}, {"id": 9, "v": None}]
    df = spark.createDataFrame([(7, "a"), (9, None)], "id long, v string").coalesce(1)
    spool = str(tmp_path / "p")
    bulk_write(df, index="i", fmt="es", action="index", id_cols=["id"],
               batch_size=10, endpoint_dir=spool, max_tasks=1)
    shipped = open(os.path.join(spool, os.listdir(spool)[0]), "rb").read()
    assert shipped == es_bulk_payload(rows, "i", "index", ["id"])


# ------------------------------------------------------------- reader (split)

def _mk_db(tmp_path, n=500):
    db = str(tmp_path / "r.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ev (id INTEGER, name TEXT, v REAL)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)",
                    [(i, f"n{i}", i / 4.0) for i in range(n)])
    con.execute("INSERT INTO ev VALUES (NULL, 'null-key', -1.0)")
    con.commit(); con.close()
    return db


def test_split_queries_cover_all_rows_and_null_residual(tmp_path):
    from datax_spark.sources.dbapi import build_split_queries

    db = _mk_db(tmp_path)
    qs = build_split_queries("sqlite3", db, "ev", ["id", "name", "v"],
                            None, "id", 4)
    assert len(qs) == 5  # 4 ranges + IS NULL residual
    assert qs[-1].endswith("id IS NULL")
    total = sum(len(query_sql("sqlite3", db, q)) for q in qs)
    assert total == 501  # no row lost, none duplicated


def test_split_queries_degenerate_pk_no_duplicates(tmp_path):
    """ADVICE r2: all-NULL splitPk must NOT emit the residual on top of the
    unguarded query (rows were read twice); lo == hi must guard its slice
    with IS NOT NULL (SingleTableSplitUtil.java:59-126 parity)."""
    from datax_spark.sources.dbapi import build_split_queries

    db = str(tmp_path / "d.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ev (id INTEGER, name TEXT)")
    con.executemany("INSERT INTO ev VALUES (?, ?)",
                    [(None, f"x{i}") for i in range(7)])
    con.commit(); con.close()

    # every splitPk NULL → single unguarded query, exactly once per row
    qs = build_split_queries("sqlite3", db, "ev", ["id", "name"], None, "id", 4)
    assert len(qs) == 1
    assert sum(len(query_sql("sqlite3", db, q)) for q in qs) == 7

    # one distinct non-NULL value (lo == hi) → guarded slice + NULL residual
    con = sqlite3.connect(db)
    con.executemany("INSERT INTO ev VALUES (?, ?)", [(42, "a"), (42, "b")])
    con.commit(); con.close()
    qs = build_split_queries("sqlite3", db, "ev", ["id", "name"], None, "id", 4)
    assert len(qs) == 2
    assert "IS NOT NULL" in qs[0] and qs[1].endswith("id IS NULL")
    assert sum(len(query_sql("sqlite3", db, q)) for q in qs) == 9


def test_dbapi_reader_split_read(spark, tmp_path):
    from datax_spark.sources.readers import build_reader

    db = _mk_db(tmp_path)
    df = build_reader(spark, "dbapireader", {
        "database": db, "table": "ev", "splitPk": "id", "numPartitions": 4,
        "schema": "id long, name string, v double", "fetchSize": 64,
    })
    rows = df.collect()
    assert len(rows) == 501
    byid = {r.id: (r.name, r.v) for r in rows}
    assert byid[123] == ("n123", 30.75)
    assert byid[None] == ("null-key", -1.0)  # IS NULL residual slice
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "v": "double"}


def test_dbapi_reader_pushdown_and_querysql_list(spark, tmp_path):
    from datax_spark.sources.readers import build_reader

    db = _mk_db(tmp_path)
    df = build_reader(spark, "dbapireader", {
        "database": db, "table": "ev", "splitPk": "id", "numPartitions": 3,
        "where": "v >= 100.0", "column": ["id", "v"], "schema": "id long, v double",
    })
    got = df.collect()
    assert len(got) == 100 and all(r.v >= 100.0 for r in got)

    # querySql mode: one SQL per task (ReaderSplitUtil:97-107)
    df2 = build_reader(spark, "dbapireader", {
        "database": db, "schema": "id long, name string",
        "querySql": ["SELECT id, name FROM ev WHERE id < 10",
                     "SELECT id, name FROM ev WHERE id >= 490"],
    })
    assert df2.count() == 20


def test_db_to_db_sync_job(spark, tmp_path):
    """The reference's signature job shape — RDBMS → RDBMS with split read,
    transform chain, upsert write — end to end between two real sqlite DBs."""
    src = str(tmp_path / "src.db")
    dst = str(tmp_path / "dst.db")
    con = sqlite3.connect(src)
    con.execute("CREATE TABLE ev (id INTEGER, name TEXT, v REAL)")
    con.executemany("INSERT INTO ev VALUES (?,?,?)",
                    [(i, f"n{i}", float(i)) for i in range(300)])
    con.commit(); con.close()
    con = sqlite3.connect(dst)
    con.execute("CREATE TABLE ev2 (id INTEGER PRIMARY KEY, name TEXT, v REAL)")
    con.execute("INSERT INTO ev2 VALUES (5, 'stale', -1.0)")  # will be upserted
    con.commit(); con.close()

    job = {"job": {"content": [{
        "reader": {"name": "dbapireader", "parameter": {
            "database": src, "table": "ev", "splitPk": "id", "numPartitions": 3,
            "schema": "id long, name string, v double"}},
        "transformer": [
            {"name": "dx_filter", "parameter": {"column": "id", "op": ">=", "value": "200"}},
        ],
        "writer": {"name": "dbapiwriter", "parameter": {
            "database": dst, "table": "ev2", "writeMode": "update",
            "keyCols": ["id"], "batchSize": 64}},
    }]}}
    stats = run_job(spark, job)
    got = query_sql("sqlite3", dst, "SELECT id, name, v FROM ev2 ORDER BY id")
    # dx_filter DROPS matching rows (FilterTransformer semantics): ids >= 200 removed
    assert len(got) == 200
    assert got[5] == (5, "n5", 5.0)  # stale row upserted by key
    assert stats["contents"][0]["writer_result"]["written"] == 200


def test_split_queries_string_pk(tmp_path):
    """String splitPk splits via base-128 bigint arithmetic
    (RangeSplitUtil.doAsciiStringSplit:14-30 analog): N non-empty slices
    whose union equals the full table, NULL residual intact."""
    from datax_spark.sources.dbapi import build_split_queries

    db = str(tmp_path / "s.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ev (pk TEXT, v INTEGER)")
    con.executemany("INSERT INTO ev VALUES (?, ?)",
                    [(f"user-{i:04d}", i) for i in range(400)])
    con.execute("INSERT INTO ev VALUES (NULL, -1)")
    con.commit(); con.close()

    qs = build_split_queries("sqlite3", db, "ev", ["pk", "v"], None, "pk", 4)
    assert qs[-1].endswith("pk IS NULL")
    counts = [len(query_sql("sqlite3", db, q)) for q in qs]
    assert sum(counts) == 401          # union == full table, no dup/loss
    assert counts[-1] == 1             # the NULL residual
    ranges = counts[:-1]
    assert len(ranges) == 4 and all(c > 0 for c in ranges)  # N non-empty


def test_split_queries_string_pk_with_where(tmp_path):
    from datax_spark.sources.dbapi import build_split_queries

    db = str(tmp_path / "sw.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ev (pk TEXT, v INTEGER)")
    con.executemany("INSERT INTO ev VALUES (?, ?)",
                    [(f"k{i:03d}", i) for i in range(300)])
    con.commit(); con.close()
    qs = build_split_queries("sqlite3", db, "ev", ["pk"], "v < 200", "pk", 3)
    total = sum(len(query_sql("sqlite3", db, q)) for q in qs)
    assert total == 200


def test_split_queries_quantile_fallback_for_dates(tmp_path):
    """Non-integer, non-ASCII-string splitPk (dates) falls back to sampled
    quantile boundaries (genSplitSqlForOracle:317-412 analog)."""
    from datax_spark.sources import dbapi
    from datax_spark.sources.dbapi import build_split_queries

    db = str(tmp_path / "q.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE ev (d REAL, v INTEGER)")  # REAL pk: no int path
    con.executemany("INSERT INTO ev VALUES (?, ?)",
                    [(i + 0.5, i) for i in range(250)])
    con.execute("INSERT INTO ev VALUES (NULL, -1)")
    con.commit(); con.close()

    qs = build_split_queries("sqlite3", db, "ev", ["d", "v"], None, "d", 4)
    counts = [len(query_sql("sqlite3", db, q)) for q in qs]
    assert sum(counts) == 251
    assert len([c for c in counts[:-1] if c > 0]) >= 3  # quantiles spread


def test_session_statements_run_per_connection(spark, tmp_path):
    """`session` executes on every task connection BEFORE the split query —
    visible here because the session statement creates a temp view the
    split query then reads (CommonRdbmsReader.Task.startRead parity)."""
    from datax_spark.sources.dbapi import dbapi_read

    db = _mk_db(tmp_path, n=100)
    df = dbapi_read(
        spark, "sqlite3", db, "id long, name string",
        query_sqls=["SELECT id, name FROM sess_view WHERE id < 50",
                    "SELECT id, name FROM sess_view WHERE id >= 50"],
        session=["CREATE TEMP VIEW sess_view AS SELECT id, name FROM ev "
                 "WHERE id IS NOT NULL"],
    )
    assert df.count() == 100  # both connections saw their session view


def test_hint_injected_after_select(tmp_path):
    from datax_spark.sources.dbapi import build_split_queries

    db = _mk_db(tmp_path, n=10)
    qs = build_split_queries("sqlite3", db, "ev", ["id", "name"], None,
                             "id", 2, hint="/*+ parallel(4) */")
    assert all(q.startswith("SELECT /*+ parallel(4) */ id, name") for q in qs)
    total = sum(len(query_sql("sqlite3", db, q)) for q in qs)
    assert total == 11


def test_bulk_writer_http_transport(spark):
    """The injectable transport over a REAL HTTP server: each executor task
    POSTs its NDJSON batches like the ES _bulk endpoint receives them —
    closes the loop the file-spool tests leave open."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    received: list[bytes] = []
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            with lock:
                received.append(body)
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/_bulk"
    try:
        from datax_spark.sources.bulk import bulk_write

        def post(payload: bytes, meta: dict) -> None:
            import urllib.request
            req = urllib.request.Request(url, data=payload, method="POST")
            with urllib.request.urlopen(req, timeout=10) as resp:
                assert resp.status == 200

        df = spark.createDataFrame(
            [(i, f"d{i}") for i in range(30)], "id long, body string"
        ).repartition(2)
        stats = bulk_write(df, index="docs", fmt="es", id_cols=["id"],
                           batch_size=8, transport=post)
        assert stats["rows"] == 30
        lines = b"".join(received).decode().strip().split("\n")
        actions = [_json.loads(x) for x in lines[0::2]]
        sources = [_json.loads(x) for x in lines[1::2]]
        assert len(sources) == 30
        assert all(a["index"]["_index"] == "docs" for a in actions)
        assert {s["id"] for s in sources} == set(range(30))
    finally:
        srv.shutdown()
        srv.server_close()
