"""ocswriter over a protocol-faithful local memcached text-protocol server.

Covers the reference semantics (OcsWriter.java):
- key/value delimiter framing + dirty rules   buildKey:240-268, buildValue:204-238
- set / add / replace / append / prepend       startWrite:127-152, commit:155-186
- add on existing key → NOT_STORED → dirty     commit:162-166
- replace on missing key → NOT_STORED → dirty
- append/prepend mutate existing values
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.sources.memcached import (
    LocalMemcachedServer,
    memcached_get,
    memcached_write,
    ocs_frame,
)
from datax_spark.sources.writers import build_writer


@pytest.fixture()
def mc():
    with LocalMemcachedServer() as s:
        yield s


def _df(spark, n=30):
    return spark.range(n).select(
        F.format_string("k%03d", F.col("id")).alias("uid"),
        F.format_string("name-%d", F.col("id")).alias("name"),
        (F.col("id") * 2.5).alias("score"),
    )


def test_set_roundtrip_multi_partition(spark, mc):
    p = {"proxy": "127.0.0.1", "port": mc.port, "writeMode": "set",
         "batchSize": 7}
    r = memcached_write(_df(spark).repartition(4), p)
    assert r == {"stored": 30, "failed": 0, "dirty": 0}
    back = memcached_get(spark, "127.0.0.1", mc.port,
                         [f"k{i:03d}" for i in range(30)],
                         delimiter="\x01",
                         columns=["uid", "name", "score"])
    assert back.count() == 30
    row = back.filter("key = 'k004'").first()
    assert row.name == "name-4" and row.score == "10.0"


def test_add_fails_on_existing_key(spark, mc):
    p = {"proxy": "127.0.0.1", "port": mc.port, "writeMode": "set"}
    memcached_write(_df(spark, 10), p)
    r = memcached_write(_df(spark, 15), {**p, "writeMode": "add"})
    assert r["stored"] == 5 and r["failed"] == 10  # 10 keys already present


def test_replace_fails_on_missing_key(spark, mc):
    p = {"proxy": "127.0.0.1", "port": mc.port, "writeMode": "set"}
    memcached_write(_df(spark, 5), p)
    r = memcached_write(_df(spark, 10), {**p, "writeMode": "replace"})
    assert r["stored"] == 5 and r["failed"] == 5


def test_append_and_prepend_mutate_existing(spark, mc):
    p = {"proxy": "127.0.0.1", "port": mc.port, "writeMode": "set"}
    one = spark.createDataFrame([("a", "MID")], "uid string, v string")
    memcached_write(one, p)
    memcached_write(one.withColumn("v", F.lit(">>")),
                    {**p, "writeMode": "prepend"})
    memcached_write(one.withColumn("v", F.lit("<<")),
                    {**p, "writeMode": "append"})
    # appended/prepended payloads are full framed records (all columns
    # joined), so the mutations land around the original framed value
    v = mc.store["a"].decode()
    assert v.endswith("<<") and v.startswith("a\x01>>")
    assert v.index(">>") < v.index("MID") < v.index("<<")


def test_framing_dirty_rules(spark):
    delim = "|"
    df = spark.createDataFrame(
        [("ok", "v1"), ("has|delim", "v2"), ("", "v3"),
         ("space key", "v4"), (None, "v5")],
        "uid string, v string")
    framed = ocs_frame(df, {"fieldDelimiter": delim})
    got = {r.value: r._dirty for r in framed.collect()}
    assert got["ok|v1"] is None
    assert "fieldDelimiter" in got["has|delim|v2"]
    assert "invalid" in got["|v3"]          # empty key (NULL renders "")
    assert "invalid" in got["space key|v4"]
    assert "invalid" in got["|v5"]


def test_multi_index_key_printable_delimiter(spark):
    df = spark.createDataFrame([("u1", "s1", "x")],
                               "a string, b string, c string")
    # a printable delimiter — with the default \x01 a multi-part key is
    # itself dirty under the text-wire control-byte rule (documented)
    framed = ocs_frame(df, {"indexes": "0,1", "fieldDelimiter": ":"})
    r = framed.first()
    assert r.key == "u1:s1"
    # value joins ALL columns (buildValue), key only the indexed ones
    assert r.value == "u1:s1:x"
    # a multi-part key contains the delimiter by construction — the per-cell
    # dirty check must not fire on it
    assert r._dirty is None


def test_binary_column_rejected(spark):
    df = spark.createDataFrame([("k", bytearray(b"\x00"))],
                               "uid string, blob binary")
    with pytest.raises(ValueError, match="binary"):
        ocs_frame(df, {})


def test_registry_entry(spark, mc):
    r = build_writer(_df(spark, 8), "ocswriter",
                     {"proxy": "127.0.0.1", "port": mc.port,
                      "writeMode": "set"})
    assert r["stored"] == 8


def test_values_containing_crlf_roundtrip(spark, mc):
    # data blocks are length-prefixed on the wire, so a cell with \r\n is
    # protocol-legal — the get parser must not line-split blindly
    df = spark.createDataFrame([("k1", "line1\r\nline2"), ("k2", "END\r\n")],
                               "uid string, v string")
    p = {"proxy": "127.0.0.1", "port": mc.port, "writeMode": "set",
         "fieldDelimiter": "|"}
    r = memcached_write(df, p)
    assert r["stored"] == 2
    back = memcached_get(spark, "127.0.0.1", mc.port, ["k1", "k2"],
                         delimiter="|", columns=["uid", "v"])
    got = {r.key: r.v for r in back.collect()}
    assert got == {"k1": "line1\r\nline2", "k2": "END\r\n"}


def test_server_error_retry_is_selective(spark):
    """Only the SERVER_ERROR'd commands are retried: re-offering keys that
    already STORED would flip add-mode replies to NOT_STORED and corrupt
    the dirty accounting."""
    import socketserver
    import threading

    store = {}
    failed_once = set()
    lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            while True:
                line = self.rfile.readline()
                if not line:
                    return
                parts = line.strip().decode().split()
                if not parts:
                    continue
                if parts[0] == "add":
                    key, _f, _e, nbytes = parts[1:5]
                    data = self.rfile.read(int(nbytes))
                    self.rfile.read(2)
                    with lock:
                        # every key transiently fails its FIRST offer
                        if key not in failed_once:
                            failed_once.add(key)
                            self.wfile.write(b"SERVER_ERROR busy\r\n")
                            continue
                        ok = key not in store
                        if ok:
                            store[key] = data
                    self.wfile.write(b"STORED\r\n" if ok
                                     else b"NOT_STORED\r\n")

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.range(20).coalesce(1).select(
            F.format_string("k%d", "id").alias("k"),
            F.lit("v").alias("v"))
        r = memcached_write(df, {
            "proxy": "127.0.0.1", "port": srv.server_address[1],
            "writeMode": "add", "fieldDelimiter": "|", "batchSize": 20})
        # all 20 keys land on the retry; none is miscounted as failed
        assert r == {"stored": 20, "failed": 0, "dirty": 0}
        assert len(store) == 20
    finally:
        srv.shutdown()
        srv.server_close()


def test_mixed_batch_counts_settled_failures_across_retries(spark):
    """A NOT_STORED settled on a NON-final attempt must still count as
    failed: only the SERVER_ERROR'd command re-offers, so deferring the
    settled tally to the breaking attempt drops failures silently."""
    import socketserver
    import threading

    store = {"k_existing": b"old"}
    failed_once = set()
    lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            while True:
                line = self.rfile.readline()
                if not line:
                    return
                parts = line.strip().decode().split()
                if not parts:
                    continue
                if parts[0] == "add":
                    key, _f, _e, nbytes = parts[1:5]
                    data = self.rfile.read(int(nbytes))
                    self.rfile.read(2)
                    with lock:
                        if key == "k_transient" and key not in failed_once:
                            failed_once.add(key)
                            self.wfile.write(b"SERVER_ERROR busy\r\n")
                            continue
                        ok = key not in store
                        if ok:
                            store[key] = data
                    self.wfile.write(b"STORED\r\n" if ok
                                     else b"NOT_STORED\r\n")

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [("k_existing", "v"), ("k_transient", "v")], "k string, v string"
        ).coalesce(1)
        r = memcached_write(df, {
            "proxy": "127.0.0.1", "port": srv.server_address[1],
            "writeMode": "add", "fieldDelimiter": "|", "batchSize": 2})
        # k_existing settles NOT_STORED on attempt 0 (counted once, never
        # re-offered); k_transient retries then STOREs
        assert r == {"stored": 1, "failed": 1, "dirty": 0}
    finally:
        srv.shutdown()
        srv.server_close()
