"""In-sandbox HBase REST gateway emulation — a real HTTP/TCP server speaking
the Stargate JSON CellSet dialect that ``sources.hbase_rest`` targets.

Role is identical to ``lake/objectstore.py``'s local object store: no HBase
is reachable from this sandbox, so the PROTOCOL layer is exercised against a
faithful local implementation — real sockets, real base64 CellSet JSON, real
scanner lifecycle (POST -> Location -> GET pages -> 204 -> DELETE) — while on
a cluster the same client code points at the actual gateway. Executors (the
separate Python worker processes Spark launches) connect over TCP exactly as
they would in production.

Emulated semantics (matching the gateway + hbase11xreader expectations):

- cells are versioned: each PUT appends (timestamp, value), reads serve the
  newest ``maxVersions`` per column, newest first (MultiVersionTask parity);
- scanners snapshot at creation, page ``batch`` ROWS per GET, 204 when
  exhausted;
- ``GET /{table}/regions`` reports the region split points the table was
  created with (RegionLocator.getStartEndKeys analog) — what drives the
  reader's one-task-per-region split.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode("ascii")


def _unb64(s: str) -> bytes:
    return base64.b64decode(s)


class HBaseGateway:
    """Threaded local gateway. ``with HBaseGateway(...) as gw: gw.url``."""

    def __init__(self, region_splits: dict[str, list[bytes]] | None = None,
                 max_versions: int = 3):
        # table -> {rowkey: {column: [(ts, value), ...newest last]}}
        self._tables: dict[str, dict[bytes, dict[str, list]]] = {}
        self._splits = region_splits or {}
        self._max_versions = max_versions
        self._scanners: dict[str, dict] = {}
        self._lock = threading.RLock()
        self._ts = 0
        gw = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr spam
                pass

            def _send(self, status: int, body: bytes = b"",
                      headers: dict | None = None):
                self.send_response(status)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length", 0))
                return self.rfile.read(n) if n else b""

            def do_GET(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 2 and parts[1] == "regions":
                    self._send(200, json.dumps(gw._regions(parts[0])).encode(),
                               {"Content-Type": "application/json"})
                elif len(parts) == 3 and parts[1] == "scanner":
                    page = gw._scan_page(parts[2])
                    if page is None:
                        self._send(204)
                    else:
                        self._send(200, json.dumps(page).encode(),
                                   {"Content-Type": "application/json"})
                else:
                    self._send(404)

            def do_POST(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 2 and parts[1] == "scanner":
                    sid = gw._open_scanner(parts[0], json.loads(self._body()))
                    self._send(201, headers={
                        "Location": f"{gw.url}/{parts[0]}/scanner/{sid}"})
                else:
                    self._send(404)

            def do_PUT(self):
                parts = self.path.strip("/").split("/")
                if len(parts) >= 2:
                    gw._put(parts[0], json.loads(self._body()))
                    self._send(200)
                else:
                    self._send(404)

            def do_DELETE(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 3 and parts[1] == "scanner":
                    with gw._lock:
                        gw._scanners.pop(parts[2], None)
                    self._send(200)
                else:
                    self._send(404)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    # -- lifecycle --------------------------------------------------------
    @property
    def url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def start(self) -> "HBaseGateway":
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *a):
        self.stop()

    # -- store ops (all under the lock) ------------------------------------
    def _regions(self, table: str) -> dict:
        splits = self._splits.get(table, [])
        bounds = [b""] + list(splits) + [b""]
        regions = []
        for i in range(len(bounds) - 1):
            regions.append({"startKey": _b64(bounds[i]),
                            "endKey": _b64(bounds[i + 1])})
        return {"Region": regions}

    def _put(self, table: str, cellset: dict):
        with self._lock:
            t = self._tables.setdefault(table, {})
            for row in cellset.get("Row", []):
                key = _unb64(row["key"])
                cols = t.setdefault(key, {})
                for cell in row.get("Cell", []):
                    col = _unb64(cell["column"]).decode()
                    val = _unb64(cell["$"])
                    self._ts += 1
                    ts = int(cell.get("timestamp", self._ts))
                    versions = cols.setdefault(col, [])
                    versions.append((ts, val))
                    del versions[:-self._max_versions]

    def _open_scanner(self, table: str, spec: dict) -> str:
        with self._lock:
            lo = _unb64(spec.get("startRow", ""))
            hi = _unb64(spec.get("endRow", ""))
            want = {_unb64(c).decode() for c in spec.get("column", [])}
            maxv = int(spec.get("maxVersions", 1))
            rows = []
            for key in sorted(self._tables.get(table, {})):
                if key < lo or (hi and key >= hi):
                    continue
                cols = self._tables[table][key]
                cells = []
                for col in sorted(cols):
                    if want and col not in want:
                        continue
                    for ts, val in sorted(cols[col], reverse=True)[:maxv]:
                        cells.append({"column": _b64(col.encode()),
                                      "timestamp": ts, "$": _b64(val)})
                if cells:
                    rows.append({"key": _b64(key), "Cell": cells})
            sid = f"s{len(self._scanners)}-{id(rows) & 0xffff:x}"
            self._scanners[sid] = {"rows": rows, "pos": 0,
                                   "batch": int(spec.get("batch", 1000))}
            return sid

    def _scan_page(self, sid: str) -> dict | None:
        with self._lock:
            sc = self._scanners.get(sid)
            if sc is None or sc["pos"] >= len(sc["rows"]):
                return None
            page = sc["rows"][sc["pos"]:sc["pos"] + sc["batch"]]
            sc["pos"] += len(page)
            return {"Row": page}
