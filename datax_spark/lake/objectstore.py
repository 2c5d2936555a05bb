"""Object-store backend for the LakeFS metadata seam (lake/fs.py).

The reference reaches remote storage through per-plugin transports — FTP
login/stream (``ftpreader/.../FtpReader.java:17,437``), OSS bucket-object
walks (``ossreader/.../OssReader.java``), HDFS clients — while its job state
lives on the local disk of one process. A lake table shared by many Spark
jobs needs the opposite: table METADATA on a store that every driver can
reach, with an atomic create-if-absent publish for optimistic concurrency.
Modern object stores provide exactly that contract:

- conditional PUT (S3 ``If-None-Match: *`` — public AWS API; GCS
  ``x-goog-if-generation-match: 0``; Azure ``If-None-Match: *``),
- strong read-after-write consistency,
- prefix LIST.

This module splits the problem in two:

- :class:`ObjectStoreClient` — the five-call wire contract (put / get /
  list / delete / head). A production deployment implements it with the
  vendor SDK (:class:`S3ObjectStore` below is the boto3 shape, import-gated);
  the sandbox uses :class:`LocalEmulatedObjectStore`, which enforces
  object-store semantics over local disk (whole-object atomic PUT,
  conditional create, prefix list, NO mkdir/rename/append) and can inject
  publish races for tests.
- :class:`ObjectFS` — adapts any ``ObjectStoreClient`` to the
  :class:`~datax_spark.lake.fs.LakeFS` contract, so ``LakeTable(...,
  fs=ObjectFS(client))`` runs unchanged. Directory calls map to prefix
  semantics: ``makedirs`` is a no-op (object stores have no directories),
  ``isdir`` means "any object under this prefix", ``listdir`` is a
  delimiter-style immediate-children listing.

DATA files are not routed here: executors write parquet bytes with
pyarrow, which targets object stores natively (``pyarrow.fs`` /
s3a on a cluster). The commit protocol never needs data-file renames —
files land under uuid staging keys and only task-reported keys enter the
snapshot manifest, so the no-rename constraint of object stores is already
satisfied (this is why the Iceberg-style "manifest is the commit" design
was chosen over a Hadoop output committer; see LakeTable._write_data_files).
"""

from __future__ import annotations

import os
from typing import Callable, Iterator

from datax_spark.lake.fs import LakeFS


class ObjectStoreClient:
    """Minimal wire contract every object store offers.

    Keys are opaque strings (LakeTable passes POSIX-joined paths; ``/`` is
    just a character, as in S3). Implementations must provide:

    - atomic whole-object visibility: a GET during a PUT sees either the
      old object or the new one, never a torn write;
    - ``if_none_match=True`` → create-only PUT, raising FileExistsError if
      the key exists (the optimistic-concurrency primitive);
    - strong read-after-write LIST/GET consistency.
    """

    def put_object(self, key: str, data: bytes, *, if_none_match: bool = False) -> None:
        raise NotImplementedError

    def get_object(self, key: str) -> bytes:
        raise NotImplementedError

    def list_objects(self, prefix: str) -> list[str]:
        """All keys under ``prefix``, sorted."""
        raise NotImplementedError

    def delete_object(self, key: str) -> None:
        raise NotImplementedError

    def head_object(self, key: str) -> int:
        """Object size in bytes; FileNotFoundError if absent."""
        raise NotImplementedError


class LocalEmulatedObjectStore(ObjectStoreClient):
    """Sandbox object store over local disk, restricted to object-store
    semantics so code written against it deploys unchanged on S3/GCS:

    - PUT is whole-object and atomically visible (tmp write + rename — an
      implementation detail of the emulation, not part of the contract);
    - conditional PUT uses a hard-link create, which is atomic and fails on
      collision — byte-exact ``If-None-Match: *`` behavior;
    - LIST walks the prefix; there is no mkdir/append/partial-write API.

    ``race_hook(key)``, when set, runs immediately before a conditional
    PUT's create attempt — tests use it to publish a competing object in
    the race window and prove the loser gets FileExistsError, not silent
    overwrite.
    """

    def __init__(self, race_hook: Callable[[str], None] | None = None):
        self.race_hook = race_hook

    def put_object(self, key: str, data: bytes, *, if_none_match: bool = False) -> None:
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.upload-{os.getpid()}-{id(data)}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            if if_none_match:
                if self.race_hook is not None:
                    self.race_hook(key)
                os.link(tmp, key)  # atomic create-if-absent
            else:
                os.replace(tmp, key)  # atomic overwrite (plain PUT)
                return
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def get_object(self, key: str) -> bytes:
        with open(key, "rb") as f:
            return f.read()

    def list_objects(self, prefix: str) -> list[str]:
        root = prefix.rstrip("/")
        out: list[str] = []
        if os.path.isfile(root):
            return [root]
        for dirpath, _dirs, fns in os.walk(root):
            for fn in fns:
                out.append(os.path.join(dirpath, fn))
        return sorted(out)

    def delete_object(self, key: str) -> None:
        os.unlink(key)

    def head_object(self, key: str) -> int:
        return os.path.getsize(key)


class S3ObjectStore(ObjectStoreClient):
    """boto3-backed client (the deployable implementation of the contract).

    Import-gated: boto3 is not in the sandbox image, and no S3 endpoint is
    reachable from it — the semantics this adapter relies on (conditional
    PUT via ``IfNoneMatch="*"``, strong consistency, prefix LIST) are
    exercised in-sandbox through :class:`LocalEmulatedObjectStore`, which
    implements the same five-call contract.
    """

    def __init__(self, bucket: str, client=None, **client_kwargs):
        if client is None:
            try:
                import boto3  # noqa: PLC0415
            except ImportError as e:  # pragma: no cover - sandbox has no boto3
                raise NotImplementedError(
                    "S3ObjectStore needs boto3 (pip install boto3) or an "
                    "injected client implementing put_object/get_object/"
                    "list_objects_v2/delete_object/head_object"
                ) from e
            client = boto3.client("s3", **client_kwargs)
        self.bucket = bucket
        self.c = client

    def put_object(self, key: str, data: bytes, *, if_none_match: bool = False) -> None:
        kw = {"Bucket": self.bucket, "Key": key.lstrip("/"), "Body": data}
        if if_none_match:
            kw["IfNoneMatch"] = "*"
        try:
            self.c.put_object(**kw)
        except Exception as e:  # noqa: BLE001 - map the SDK's 412 to the contract
            code = getattr(e, "response", {}).get("Error", {}).get("Code", "")
            if code in ("PreconditionFailed", "412"):
                raise FileExistsError(key) from e
            raise

    def get_object(self, key: str) -> bytes:
        return self.c.get_object(Bucket=self.bucket, Key=key.lstrip("/"))["Body"].read()

    def list_objects(self, prefix: str) -> list[str]:
        keys: list[str] = []
        token: str | None = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": prefix.lstrip("/")}
            if token:
                kw["ContinuationToken"] = token
            resp = self.c.list_objects_v2(**kw)
            keys += ["/" + o["Key"] for o in resp.get("Contents", [])]
            if not resp.get("IsTruncated"):
                return sorted(keys)
            token = resp.get("NextContinuationToken")

    def delete_object(self, key: str) -> None:
        self.c.delete_object(Bucket=self.bucket, Key=key.lstrip("/"))

    def head_object(self, key: str) -> int:
        try:
            return int(
                self.c.head_object(Bucket=self.bucket, Key=key.lstrip("/"))["ContentLength"]
            )
        except Exception as e:  # noqa: BLE001
            code = getattr(e, "response", {}).get("Error", {}).get("Code", "")
            if code in ("404", "NoSuchKey", "NotFound"):
                raise FileNotFoundError(key) from e
            raise


class ObjectFS(LakeFS):
    """LakeFS over an :class:`ObjectStoreClient` — LakeTable's metadata and
    staging-layout calls mapped to object semantics, no LakeTable changes."""

    def __init__(self, store: ObjectStoreClient):
        self.store = store

    def makedirs(self, path: str) -> None:
        # object stores have no directories; prefixes exist when objects do
        pass

    def isdir(self, path: str) -> bool:
        return bool(self.store.list_objects(path.rstrip("/") + "/"))

    def listdir(self, path: str) -> list[str]:
        # delimiter-style listing: immediate children under the prefix
        prefix = path.rstrip("/") + "/"
        children = {k[len(prefix):].split("/", 1)[0] for k in self.store.list_objects(prefix)}
        return sorted(children)

    def read_text(self, path: str) -> str:
        return self.store.get_object(path).decode("utf-8")

    def write_text(self, path: str, content: str) -> None:
        self.store.put_object(path, content.encode("utf-8"))

    def isfile(self, path: str) -> bool:
        try:
            self.store.head_object(path)
            return True
        except (FileNotFoundError, OSError):
            return False

    def publish_atomic(self, path: str, content: str) -> None:
        self.store.put_object(path, content.encode("utf-8"), if_none_match=True)

    def walk_files(self, root: str) -> Iterator[str]:
        yield from self.store.list_objects(root.rstrip("/") + "/")

    def remove(self, path: str) -> None:
        self.store.delete_object(path)

    def getsize(self, path: str) -> int:
        return self.store.head_object(path)


def emulated_objectfs() -> ObjectFS:
    """No-arg factory for the streaming changelog source's ``fsFactory``
    option (``datax_spark.lake.objectstore:emulated_objectfs``): the
    metadata plane of a table whose lake lives on the emulated object
    store. Stateless by design — a restarted stream reconstructs it from
    the option string alone; a production deployment points ``fsFactory``
    at a module-level callable returning ``ObjectFS(S3ObjectStore(...))``
    with connection details from the environment."""
    return ObjectFS(LocalEmulatedObjectStore())
