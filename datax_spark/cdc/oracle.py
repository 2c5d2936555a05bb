"""Independent correctness oracle: non-Spark last-writer-wins fold of the feed.

Reads the change-feed parquet epochs with pyarrow (explicit evolved schema so
pre-evolution files yield tool=NULL), applies events strictly in ``seq`` order
with a plain Python dict — I/U set the key's payload, D deletes it — and emits
rows sorted by (conv_id, turn_idx, ts). Malformed events are skipped under the
same validation rules as the engine's quarantine (merge.split_valid_dirty).

This is the reference fold FIXTURES.md §4 requires; tests assert the engine's
final table equals it exactly (per-turn text byte equality).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.dataset as ds

ORACLE_ARROW_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us", tz="UTC")),
    ]
)

_VALID_OPS = {"I", "U", "D"}


def _is_dirty(op, conv_id, turn_idx, text) -> bool:
    if conv_id is None or conv_id == "":
        return True
    if turn_idx is None or turn_idx < 0:
        return True
    if op not in _VALID_OPS:
        return True
    if op != "D" and text is None:
        return True
    return False


def fold_feed(feed_dir: str, max_epoch: int | None = None) -> list[dict]:
    """Return final state rows sorted by (conv_id, turn_idx, ts)."""
    paths = []
    for d in sorted(os.listdir(feed_dir)):
        if not d.startswith("epoch="):
            continue
        epoch = int(d.split("=", 1)[1])
        if max_epoch is not None and epoch > max_epoch:
            continue
        sub = os.path.join(feed_dir, d)
        for dirpath, _dirs, fns in sorted(os.walk(sub)):
            paths += [os.path.join(dirpath, f) for f in sorted(fns) if f.endswith(".parquet")]
    dataset = ds.dataset(paths, format="parquet", schema=ORACLE_ARROW_SCHEMA)
    tbl = dataset.to_table()
    df = tbl.to_pandas().sort_values("seq", kind="mergesort")

    state: dict[tuple, dict] = {}
    for row in df.itertuples(index=False):
        turn_idx = None if row.turn_idx is None or row.turn_idx != row.turn_idx else int(row.turn_idx)
        if _is_dirty(row.op, row.conv_id, turn_idx, row.text):
            continue
        key = (row.conv_id, turn_idx)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = {
                "conv_id": row.conv_id,
                "turn_idx": turn_idx,
                "role": row.role,
                "text": row.text,
                "tool": None if row.tool != row.tool else row.tool,
                "ts": row.ts.to_pydatetime() if row.ts is not None else None,
            }
    return sorted(state.values(), key=lambda r: (r["conv_id"], r["turn_idx"], r["ts"]))
