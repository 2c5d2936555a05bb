"""Shared staged-swap protocol for the local keyed-store writer analogs.

Every writer analog that folds incoming records into an existing store
(kudu tablet store, gdb element store, cassandra table, mongoimport dump)
follows the same commit shape: materialize the merged result into a
sibling ``.tmp-<uuid>`` directory FIRST (so the source store is never read
and rewritten in place — Spark plans are lazy and the write would race its
own input), then rename the old store aside, rename the tmp in, and drop
the old. This module is the single implementation; fixes to the protocol
(e.g. crash-safety between the two renames) land once.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Callable


def store_exists(path: str, data_prefixes: tuple[str, ...] = ()) -> bool:
    """True when ``path`` holds data files. Entries starting with ``_`` or
    ``.`` are metadata (Spark _SUCCESS, hidden files) — except the
    partition-directory prefixes a caller names in ``data_prefixes``
    (e.g. ``"_tablet="`` for the kudu layout)."""
    if not os.path.isdir(path):
        return False
    for fn in os.listdir(path):
        # str.startswith(()) is False, so no data_prefixes guard needed
        if fn.startswith(data_prefixes) or not fn.startswith(("_", ".")):
            return True
    return False


def staged_swap(path: str, write_tmp: Callable[[str], object]) -> object:
    """Run ``write_tmp(tmp_dir)`` to materialize the new store, then swap
    it into ``path``. Returns ``write_tmp``'s return value (callers that
    count rows off the materialized tmp return the count through here).
    The old store (if any) is renamed aside before the tmp moves in, so a
    reader never sees a half-written directory at ``path``."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    result = write_tmp(tmp)
    if os.path.isdir(path):
        back = f"{path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(path, back)
        os.rename(tmp, path)
        shutil.rmtree(back)
    else:
        os.rename(tmp, path)
    return result
