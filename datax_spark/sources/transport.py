"""Remote file transports — the reference's ftpreader/ossreader byte layer.

The reference separates "how bytes arrive" from "how records parse": FtpReader
logs in and streams each remote file inside a task
(``ftpreader/.../FtpReader.java:17,437``), OssReader walks bucket objects and
hands each to the shared CSV layer (``ossreader/.../OssReader.java``). This
module is that seam for Spark: a :class:`Transport` lists remote objects on
the driver (metadata) and streams bytes inside executor tasks (data), feeding
the same CSV/zip parse layer as local files (sources/readers.py).

Transports are built from PICKLABLE spec dicts (``make_transport``) so each
executor task opens its own connection — one connection per task, the DataX
channel model. Implementations:

- ``{"kind": "local"}`` — POSIX walk/read (testing + mounted filesystems).
- ``{"kind": "object", ...}`` — any :class:`ObjectStoreClient`
  (lake/objectstore.py): the OSS/S3 bucket-walk surface. In-sandbox the
  local-emulated store; on a cluster an S3/OSS client with the same five
  calls.
- ``{"kind": "ftp", ...}`` — ftplib (stdlib) login + NLST walk + RETR
  stream. No FTP server exists in the sandbox, so the protocol adapter takes
  an injectable ``client_factory`` and the walk/read logic is tested against
  a fake FTP client; on a real deployment the default factory opens
  ``ftplib.FTP``/``FTP_TLS``.
"""

from __future__ import annotations

import os
import posixpath
from typing import Callable


class Transport:
    """Byte-transport contract: driver-side listing, task-side streaming."""

    def walk(self, path: str) -> list[str]:
        """All file/object names under ``path`` (recursive), sorted."""
        raise NotImplementedError

    def read_bytes(self, name: str) -> bytes:
        raise NotImplementedError

    def write_bytes(self, name: str, data: bytes) -> None:
        raise NotImplementedError

    def delete(self, name: str) -> None:
        raise NotImplementedError


class LocalTransport(Transport):
    def walk(self, path: str) -> list[str]:
        if os.path.isfile(path):
            return [path]
        out = []
        for dirpath, _dirs, fns in os.walk(path):
            out += [os.path.join(dirpath, fn) for fn in fns]
        return sorted(out)

    def read_bytes(self, name: str) -> bytes:
        with open(name, "rb") as f:
            return f.read()

    def write_bytes(self, name: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(name), exist_ok=True)
        tmp = f"{name}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, name)

    def delete(self, name: str) -> None:
        os.unlink(name)


class ObjectTransport(Transport):
    """Bucket-object walk + streaming over an ObjectStoreClient — the
    ossreader/osswriter shape (object LIST on the driver, GET per task)."""

    def __init__(self, store):
        self.store = store

    def walk(self, path: str) -> list[str]:
        return self.store.list_objects(path.rstrip("/") + "/") or self.store.list_objects(path)

    def read_bytes(self, name: str) -> bytes:
        return self.store.get_object(name)

    def write_bytes(self, name: str, data: bytes) -> None:
        self.store.put_object(name, data)

    def delete(self, name: str) -> None:
        self.store.delete_object(name)


class FtpTransport(Transport):
    """ftplib adapter (FtpReader parity: login, recursive dir walk, RETR
    stream, STOR upload). ``client_factory`` yields a connected, logged-in
    client per call — injectable so the walk/read logic is testable without a
    live server; each executor task calls it once (one FTP session per task,
    like the reference's one-connection-per-channel)."""

    def __init__(self, host: str = "", port: int = 21, user: str = "",
                 password: str = "", timeout: int = 30,
                 client_factory: Callable | None = None):
        if client_factory is None:
            def client_factory():  # pragma: no cover - needs a live server
                import ftplib

                c = ftplib.FTP()
                c.connect(host, port, timeout=timeout)
                c.login(user, password)
                return c

        self._factory = client_factory

    def _is_file(self, c, name: str) -> bool:
        try:
            c.size(name)  # SIZE succeeds only on files
            return True
        except Exception:  # noqa: BLE001 - dirs answer 550
            return False

    def walk(self, path: str) -> list[str]:
        c = self._factory()
        try:
            out: list[str] = []
            stack = [path.rstrip("/") or "/"]
            while stack:
                cur = stack.pop()
                if self._is_file(c, cur):
                    out.append(cur)
                    continue
                for entry in c.nlst(cur):
                    full = entry if posixpath.dirname(entry) else posixpath.join(cur, entry)
                    if full in (cur, posixpath.join(cur, "."), posixpath.join(cur, "..")):
                        continue
                    (out if self._is_file(c, full) else stack).append(full)
            return sorted(out)
        finally:
            _quiet_close(c)

    def read_bytes(self, name: str) -> bytes:
        c = self._factory()
        try:
            chunks: list[bytes] = []
            c.retrbinary(f"RETR {name}", chunks.append)
            return b"".join(chunks)
        finally:
            _quiet_close(c)

    def write_bytes(self, name: str, data: bytes) -> None:
        import io

        c = self._factory()
        try:
            d = posixpath.dirname(name)
            if d and d != "/":
                try:
                    c.mkd(d)
                except Exception:  # noqa: BLE001 - exists
                    pass
            c.storbinary(f"STOR {name}", io.BytesIO(data))
        finally:
            _quiet_close(c)

    def delete(self, name: str) -> None:
        c = self._factory()
        try:
            c.delete(name)
        finally:
            _quiet_close(c)


def _quiet_close(c) -> None:
    try:
        c.quit()
    except Exception:  # noqa: BLE001
        try:
            c.close()
        except Exception:  # noqa: BLE001
            pass


def make_transport(spec) -> Transport:
    """Build a transport from a picklable spec dict (or pass a Transport
    through). Tasks call this executor-side, so every task gets its own
    connection."""
    if isinstance(spec, Transport):
        return spec
    kind = spec.get("kind", "local")
    if kind == "local":
        return LocalTransport()
    if kind == "object":
        store = spec.get("store")
        if store is None or store == "local-emulated":
            from datax_spark.lake.objectstore import LocalEmulatedObjectStore

            store = LocalEmulatedObjectStore()
        elif isinstance(store, dict) and store.get("kind") == "s3":
            from datax_spark.lake.objectstore import S3ObjectStore

            store = S3ObjectStore(store["bucket"], **store.get("client_kwargs", {}))
        return ObjectTransport(store)
    if kind == "ftp":
        return FtpTransport(
            host=spec.get("host", ""), port=int(spec.get("port", 21)),
            user=spec.get("username", spec.get("user", "")),
            password=spec.get("password", ""),
            timeout=int(spec.get("timeout", 30)),
            client_factory=spec.get("client_factory"),
        )
    raise ValueError(f"unknown transport kind {kind!r}")
