"""OCS (memcached-protocol cache) writer — real wire connector.

The reference ``ocswriter`` drives an OCS endpoint through spymemcached's
binary protocol (OcsWriter.java:113-122). This module speaks the public
memcached TEXT protocol (``doc/protocol.txt`` in the memcached
distribution) — the same storage command set with identical semantics:

- ``set``      store unconditionally (idempotent, retried)
- ``add``      fails (NOT_STORED) when the key exists (OcsWriter.java:162-166)
- ``replace``  fails when the key is missing
- ``append`` / ``prepend``  mutate an existing value; deliberately NOT
  retried — the reference marks them non-idempotent (OcsWriter.java:171-176)

Record framing (OcsWriter.buildKey:240-268 / buildValue:204-238):
- key   = the columns at ``indexes`` (default ``[0]``) joined by
  ``fieldDelimiter`` (default ``\\u0001``)
- value = ALL columns joined by the same delimiter
- dirty = any cell whose text contains the delimiter, plus (text-wire
  constraint) keys that are empty, >250 bytes, or contain whitespace /
  control bytes — the binary protocol the reference uses has the same
  250-byte cap but allows arbitrary bytes; the stricter text rule is
  documented here, not hidden.
- a NULL cell renders as the empty string (``StringUtils.join`` behavior)

Spark-side split of labor: framing + dirty classification is pure Catalyst
(one projection, no Python in the row path); the socket write runs once per
partition via ``mapPartitions`` — one connection per task, commands
pipelined in batches, per-partition (stored, failed) counts reduced to job
totals. At cluster scale each executor holds exactly one cache connection
per task and the only driver traffic is the final count — the same shape as
the ClickHouse/HBase wire writers in this package.
"""

from __future__ import annotations

import socket

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WRITE_MODES = ("set", "add", "replace", "append", "prepend")
# storage commands that get the reference's 3-attempt retry (idempotent)
RETRIED_MODES = ("set", "add", "replace")


def ocs_frame(df: DataFrame, p: dict) -> DataFrame:
    """Catalyst framing: (key, value, _dirty) per input row.

    ``p``: indexes (list[int] | comma string, default "0"), fieldDelimiter
    (default \\u0001). Dirty reasons mirror OcsWriter's DIRTY_RECORD paths.
    """
    delim = p.get("fieldDelimiter", "")
    idx = p.get("indexes", "0")
    if isinstance(idx, str):
        idx = [int(i) for i in idx.split(",")]
    cols = df.columns
    for i in idx:
        if not 0 <= i < len(cols):
            raise ValueError(f"ocswriter: key index {i} out of range "
                             f"(record has {len(cols)} columns)")
    for f_ in df.schema.fields:
        if f_.dataType.typeName() == "binary":
            # OcsWriter.buildValue:227-229 — binary cells are dirty records;
            # with a typed DataFrame the whole column is, so fail fast
            raise ValueError(
                f"ocswriter: binary column {f_.name!r} unsupported "
                "(reference treats binary cells as dirty records)")

    def cell(c: str):
        return F.coalesce(F.col(c).cast("string"), F.lit(""))

    has_delim = F.lit(False)
    for c in cols:
        has_delim = has_delim | cell(c).contains(delim)
    key = F.concat_ws(delim, *[cell(cols[i]) for i in idx])
    value = F.concat_ws(delim, *[cell(c) for c in cols])
    bad_key = (F.length(key) == 0) | (F.octet_length(key) > 250) | \
        key.rlike(r"[\s\x00-\x1f\x7f]")
    dirty = F.when(has_delim, F.lit("cell contains fieldDelimiter")) \
             .when(bad_key, F.lit("key invalid for memcached text wire")) \
             .otherwise(F.lit(None).cast("string"))
    return df.select(key.alias("key"), value.alias("value"),
                     dirty.alias("_dirty"))


def _drain(sock: socket.socket, n_replies: int) -> list[str]:
    """Read ``n_replies`` CRLF-terminated reply lines from a storage-command
    pipeline (set/add/... replies are single lines: STORED / NOT_STORED /
    ERROR / CLIENT_ERROR ... / SERVER_ERROR ...)."""
    buf = b""
    lines: list[str] = []
    while len(lines) < n_replies:
        chunk = sock.recv(65536)
        if not chunk:
            raise ConnectionError("memcached connection closed mid-reply")
        buf += chunk
        while b"\r\n" in buf and len(lines) < n_replies:
            line, buf = buf.split(b"\r\n", 1)
            lines.append(line.decode("utf-8", "replace"))
    return lines


def memcached_write(df: DataFrame, p: dict) -> dict:
    """Write the framed records over the memcached text wire.

    ``p``: proxy (host), port (default 11211), writeMode (one of
    WRITE_MODES), expireTime (seconds, default 0 = never), batchSize
    (commands pipelined per round-trip, default 100), plus the framing
    params of :func:`ocs_frame`. Returns ``{"stored", "failed", "dirty"}``
    — ``failed`` are wire-level NOT_STORED/ERROR replies (e.g. ``add`` on an
    existing key), which the reference routes to the dirty collector
    (OcsWriter.startWrite:146-149).
    """
    mode = str(p.get("writeMode", "set")).lower()
    if mode not in WRITE_MODES:
        raise ValueError(f"ocswriter: writeMode {mode!r} not in "
                         f"{WRITE_MODES}")
    host = p.get("proxy", "127.0.0.1")
    port = int(p.get("port", 11211))
    exptime = int(p.get("expireTime", 0))
    batch = max(1, int(p.get("batchSize", 100)))
    retries = 3 if mode in RETRIED_MODES else 1  # OcsWriter:139,171-176

    framed = ocs_frame(df, p).cache()
    try:
        n_dirty = framed.filter(F.col("_dirty").isNotNull()).count()
        clean = framed.filter(F.col("_dirty").isNull()).drop("_dirty")

        def write_partition(rows):
            stored = failed = 0
            # peek before connecting: empty partitions (filtered/small
            # inputs under many shuffle partitions) must not cost the cache
            # endpoint a connect/close round-trip each
            first = next(rows, None)
            if first is None:
                yield (0, 0)
                return
            import itertools

            rows = itertools.chain([first], rows)
            sock = socket.create_connection((host, port), timeout=30)
            try:
                pend: list[tuple[str, bytes]] = []

                def flush():
                    nonlocal stored, failed
                    if not pend:
                        return
                    todo = list(pend)
                    for attempt in range(retries):
                        payload = b"".join(
                            f"{mode} {k} 0 {exptime} {len(v)}\r\n".encode()
                            + v + b"\r\n" for k, v in todo)
                        sock.sendall(payload)
                        replies = _drain(sock, len(todo))
                        # retry ONLY the transient-errored commands: re-
                        # offering keys that already STORED would return
                        # NOT_STORED under add/replace and corrupt the
                        # dirty tally (the reference's per-record retry has
                        # the same only-failures-retry shape). Settled
                        # replies (STORED / NOT_STORED / CLIENT_ERROR) are
                        # tallied on EVERY attempt — they never re-offer,
                        # so deferring their count to the final attempt
                        # would silently drop failures from retried batches
                        errored = [i for i, r in enumerate(replies)
                                   if r.startswith("SERVER_ERROR")]
                        done = [r for r in replies
                                if not r.startswith("SERVER_ERROR")]
                        stored += sum(r == "STORED" for r in done)
                        failed += sum(r != "STORED" for r in done)
                        if mode in RETRIED_MODES and errored \
                                and attempt < retries - 1:
                            todo = [todo[i] for i in errored]
                            continue
                        failed += len(errored)
                        break
                    pend.clear()

                for r in rows:
                    pend.append((r["key"], r["value"].encode("utf-8")))
                    if len(pend) >= batch:
                        flush()
                flush()
            finally:
                sock.close()
            yield (stored, failed)

        totals = clean.rdd.mapPartitions(write_partition).collect()
        stored = sum(t[0] for t in totals)
        failed = sum(t[1] for t in totals)
        return {"stored": stored, "failed": failed, "dirty": n_dirty}
    finally:
        framed.unpersist()


def memcached_get(spark: SparkSession, host: str, port: int,
                  keys: list[str], delimiter: str = "",
                  columns: list[str] | None = None) -> DataFrame:
    """Fetch ``keys`` back over the wire (``get`` multi-key form) and
    re-split values on the delimiter — the verification read used by tests
    and the roundtrip oracle query. Driver-side by design: a cache is a
    point-lookup store, not a scan source."""
    out: list[tuple] = []
    sock = socket.create_connection((host, port), timeout=30)

    def read_until(buf: bytearray, n: int) -> None:
        while len(buf) < n:
            got = sock.recv(65536)
            if not got:
                raise ConnectionError("memcached closed during get")
            buf.extend(got)

    def read_line(buf: bytearray) -> bytes:
        while b"\r\n" not in buf:
            got = sock.recv(65536)
            if not got:
                raise ConnectionError("memcached closed during get")
            buf.extend(got)
        i = buf.index(b"\r\n")
        line = bytes(buf[:i])
        del buf[:i + 2]
        return line

    try:
        for i in range(0, len(keys), 64):
            chunk = keys[i:i + 64]
            sock.sendall(("get " + " ".join(chunk) + "\r\n").encode())
            buf = bytearray()
            while True:
                # length-aware parse: data blocks are length-prefixed and may
                # legally contain \r\n, so never line-split blindly
                line = read_line(buf)
                if line == b"END":
                    break
                if not line.startswith(b"VALUE "):
                    raise ConnectionError(f"unexpected reply {line!r}")
                _, key, _flags, nbytes = line.split()[:4]
                n = int(nbytes)
                read_until(buf, n + 2)
                val = bytes(buf[:n]).decode("utf-8")
                del buf[:n + 2]
                out.append((key.decode(), *val.split(delimiter)) if columns
                           else (key.decode(), val))
    finally:
        sock.close()
    if columns:
        schema = "key string, " + ", ".join(f"{c} string" for c in columns)
        return spark.createDataFrame(out, schema)
    return spark.createDataFrame(out, "key string, value string")


class LocalMemcachedServer:
    """In-sandbox memcached text-protocol emulation (the OCS stand-in used
    by tests and the roundtrip oracle query — on a cluster the writer points
    at the real endpoint instead). Faithful to ``doc/protocol.txt`` for the
    subset the writer uses: the five storage commands with STORED /
    NOT_STORED semantics, and multi-key ``get``."""

    def __init__(self):
        import socketserver
        import threading

        store: dict[str, bytes] = {}
        lock = threading.Lock()
        self.store = store

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    line = self.rfile.readline()
                    if not line:
                        return
                    parts = line.strip().decode().split()
                    if not parts:
                        continue
                    cmd = parts[0]
                    if cmd in WRITE_MODES:
                        key, _flags, _exp, nbytes = parts[1:5]
                        data = self.rfile.read(int(nbytes))
                        self.rfile.read(2)  # trailing \r\n
                        with lock:
                            if cmd == "set":
                                store[key] = data
                                ok = True
                            elif cmd == "add":
                                ok = key not in store
                                if ok:
                                    store[key] = data
                            elif cmd == "replace":
                                ok = key in store
                                if ok:
                                    store[key] = data
                            elif cmd == "append":
                                ok = key in store
                                if ok:
                                    store[key] = store[key] + data
                            else:  # prepend
                                ok = key in store
                                if ok:
                                    store[key] = data + store[key]
                        self.wfile.write(b"STORED\r\n" if ok
                                         else b"NOT_STORED\r\n")
                    elif cmd == "get":
                        with lock:
                            for k in parts[1:]:
                                if k in store:
                                    v = store[k]
                                    self.wfile.write(
                                        f"VALUE {k} 0 {len(v)}\r\n".encode()
                                        + v + b"\r\n")
                        self.wfile.write(b"END\r\n")
                    else:
                        self.wfile.write(b"ERROR\r\n")

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._srv = Server(("127.0.0.1", 0), Handler)
        self.port = self._srv.server_address[1]
        self._thread = None

    def start(self):
        import threading

        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def __enter__(self):
        return self.start()

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()

    def __exit__(self, *a):
        self.stop()
