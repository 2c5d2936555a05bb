"""Filesystem seam for LakeTable metadata and staging-layout operations.

LakeTable's DATA files flow through pyarrow.parquet, which natively targets
object stores via ``pyarrow.fs`` (s3://, gs://, hdfs://) — the part that needs
an explicit abstraction is the ~10 driver-side METADATA touchpoints: snapshot
listing/reading, the atomic snapshot publish, staging-dir creation, and
vacuum's walk/delete. This module isolates them behind :class:`LakeFS` so an
object-store backend is a drop-in:

- ``LocalFS`` (default): POSIX semantics; the atomic publish is a hard-link
  create, which fails on collision → optimistic concurrency.
- An S3/GCS backend would implement ``publish_atomic`` with a conditional PUT
  (``If-None-Match: *`` / ``x-goog-if-generation-match: 0``) and the listing
  calls with prefix LISTs — same contract, no LakeTable changes. (A real
  Iceberg catalog replaces this file entirely; see lake/table.py header.)

LakeTable requires from its FS only: create-if-absent atomicity on publish,
read-after-write visibility of published objects, and prefix listing — the
same guarantees Iceberg's HadoopCatalog needs, provided by modern object
stores.
"""

from __future__ import annotations

import os
from typing import Iterator


class LakeFS:
    """Metadata-filesystem contract for LakeTable (see module docstring)."""

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def publish_atomic(self, path: str, content: str) -> None:
        """Create ``path`` with ``content`` iff it does not exist; raise
        FileExistsError if another writer published it first."""
        raise NotImplementedError

    def write_text(self, path: str, content: str) -> None:
        """Unconditional atomic overwrite (a plain object-store PUT) — used
        only for ADVISORY metadata (the version hint): correctness never
        depends on which concurrent writer wins."""
        raise NotImplementedError

    def isfile(self, path: str) -> bool:
        """Existence check for one object (HEAD, not LIST)."""
        raise NotImplementedError

    def walk_files(self, root: str) -> Iterator[str]:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def getsize(self, path: str) -> int:
        raise NotImplementedError


class LocalFS(LakeFS):
    """POSIX-backed default (shared filesystem across driver and executors —
    the sandbox stand-in for an object store / HDFS)."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, content: str) -> None:
        tmp = f"{path}.tmp-{os.getpid()}-{id(content)}"
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, path)

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def publish_atomic(self, path: str, content: str) -> None:
        tmp = f"{path}.tmp-{os.getpid()}-{id(content)}"
        with open(tmp, "w") as f:
            f.write(content)
        try:
            # hard-link create is atomic and fails on collision
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def walk_files(self, root: str) -> Iterator[str]:
        for dirpath, _dirs, fns in os.walk(root):
            for fn in fns:
                yield os.path.join(dirpath, fn)

    def remove(self, path: str) -> None:
        os.unlink(path)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)
