"""Changelog-maintained per-GROUP materializations.

:class:`ContinuousAggregate` (cdc/rollup.py) maintains aggregates whose
measures fold as signed deltas (SUM/COUNT-like) in O(changes) arithmetic.
Plenty of per-group derivations aren't signed-foldable — MIN/MAX,
count_distinct, and order-sensitive audits like
:func:`~datax_spark.ops.transcripts.validate_transcripts` (turn contiguity,
role alternation). For those, :class:`GroupedRecomputeIndex` keeps a
materialized per-group table fresh by *recomputing only touched groups*:

1. the base table's changelog between the index watermark and the current
   version names the groups whose rows changed;
2. each touched group's FULL current rows are fetched by keyed point read
   (:meth:`LakeTable.lookup` — manifest bucket pruning + zone-map file
   pruning + Arrow row-group key filters, so the fetch is O(touched
   groups), never O(table)); above ``max_point_keys`` touched groups the
   fetch falls back to one semi-join scan (at that point the epoch touched
   so much of the table that a scan is the cheaper plan anyway);
3. the derivation runs over just those rows and the results MERGE into the
   index table, with delete events for groups that vanished. The watermark
   rides in the index table's own commit (same exactly-once shape as
   MinHashIndex / ContinuousAggregate: fold and watermark are one atomic
   commit, so a crashed refresh replays its window against unchanged state).

Per refresh the cost is O(changed groups × group size) — with bounded
conversations that is O(changes) — regardless of base table size.

Reference analog: DataX has no maintained views at all (every job is a full
re-extract); this is the incremental sibling its post-job handlers would
need at 10^10 events.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable


class GroupedRecomputeIndex:
    """A LakeTable holding one derived row per group of the base table,
    maintained from the base's changelog by touched-group recompute.

    ``derive`` maps a DataFrame of base-table rows to AT MOST ONE row per
    ``group_col`` value (keyed-unique — it feeds a keyed MERGE). It must be
    a pure function of a group's rows: it sees exactly the touched groups'
    current rows on refresh, and the whole table at seed time. ``derive``
    is code, not data, so :meth:`open` takes it again and only the
    structural parameters travel in the index table's lineage.
    """

    _OP, _SEQ = "_aud_op", "_aud_seq"
    _PROP = "audit_base_version"
    _PARAMS = "audit_params"

    def __init__(self, base: LakeTable, index: LakeTable,
                 derive: Callable[[DataFrame], DataFrame],
                 group_col: str, max_point_keys: int = 100_000):
        self.base = base
        self.index = index
        self.derive = derive
        self.group_col = group_col
        self.max_point_keys = max_point_keys

    # ------------------------------------------------------------ bootstrap
    @classmethod
    def create(cls, base: LakeTable, index_root: str,
               derive: Callable[[DataFrame], DataFrame], group_col: str, *,
               n_buckets: int = 16, max_point_keys: int = 100_000,
               fs=None) -> "GroupedRecomputeIndex":
        """Create the index table and seed it from the base's CURRENT
        version — the one O(table) derivation pass."""
        base_version = base.current_version()
        if base_version is None:
            raise ValueError(f"base table has no snapshot: {base.root}")
        seed = derive(base.read(base_version))
        if group_col not in seed.columns:
            raise ValueError(
                f"derive() output lacks the group column {group_col!r}")
        schema = T.StructType([
            T.StructField(f.name, f.dataType, f.name != group_col)
            for f in seed.schema.fields
        ])
        index = LakeTable.create(base.spark, index_root, schema,
                                 bucket_key=group_col, n_buckets=n_buckets,
                                 fs=fs)
        idx = cls(base, index, derive, group_col,
                  max_point_keys=max_point_keys)
        idx._apply(
            seed.withColumn(cls._OP, F.lit("U")), base_version,
            params=json.dumps({"class": cls.__name__, "group_col": group_col,
                               "max_point_keys": max_point_keys}),
        )
        return idx

    @classmethod
    def open(cls, base: LakeTable, index_root: str,
             derive: Callable[[DataFrame], DataFrame],
             fs=None) -> "GroupedRecomputeIndex":
        """Re-attach to an existing index. ``derive`` must be the function
        the index was created with (it defines every non-key column; a
        different derivation would silently corrupt the merge)."""
        index = LakeTable(base.spark, index_root, fs=fs)
        for entry in index.history():
            p = entry.get("properties", {}).get(cls._PARAMS)
            if p is not None:
                params = json.loads(p)
                if params.get("class") != cls.__name__:
                    raise ValueError(
                        f"index at {index_root} was created as "
                        f"{params.get('class')}, not {cls.__name__}")
                return cls(base, index, derive, params["group_col"],
                           max_point_keys=params.get("max_point_keys",
                                                     100_000))
        raise ValueError(
            f"index at {index_root} has no {cls._PARAMS} lineage; "
            "was it created via .create()?")

    # ------------------------------------------------------------ watermark
    def consumed_version(self) -> int:
        """Latest base version folded in — read from the index table's own
        commit history, so it advances atomically with the data."""
        for entry in reversed(self.index.history()):
            v = entry.get("properties", {}).get(self._PROP)
            if v is not None:
                return int(v)
        raise ValueError(
            f"index at {self.index.root} has no {self._PROP} lineage; "
            "was it created via .create()?")

    # -------------------------------------------------------------- refresh
    def refresh(self) -> dict:
        """Fold all base commits since the last refresh. Returns
        ``{"from": v0, "to": v1, "groups_touched": n, "fetch": mode}``;
        no-op (no commit) when the base hasn't advanced."""
        start = self.consumed_version()
        end = self.base.current_version()
        if end is None or end <= start:
            return {"from": start, "to": start, "groups_touched": 0,
                    "fetch": "none"}

        g = self.group_col
        snap = self.base.snapshot(end)
        merge_keys = {k for k in
                      snap.properties.get("merge_keys", "").split(",") if k}
        # When the group column is part of the merge key, a row can never
        # move between groups and every change row (incl. delete markers)
        # carries its group value — post-images suffice. Otherwise an update
        # can MOVE a row between groups and a lean delete marker may carry a
        # NULL group: read pre-images too so the moved-from / deleted-from
        # group also re-derives. (Groups keyed by NULL are not tracked.)
        pre = bool(merge_keys) and g not in merge_keys
        changed = (
            self.base.read_changes(start, end, include_preimages=pre)
            .select(g).distinct().filter(F.col(g).isNotNull())
        )
        # bounded collect: up to the cap the key list steers point lookups
        # (bucket + zone-map + row-group pruning); past it the epoch touched
        # enough of the table that one semi-join scan is the better plan.
        # Point lookups key by the base's BUCKET key — when the group column
        # is anything else, only the semi-join scan is sound.
        pointable = snap.bucket_key == g
        cap = self.max_point_keys if pointable else 0
        keys = [r[0] for r in changed.limit(cap + 1).collect()]
        # NOTE: keys may be empty while end > start (a maintenance-only
        # window: compact/rebucket emit no logical changes). The refresh
        # still commits, so the watermark advances and follow() never
        # rescans the window.
        if len(keys) <= cap or not keys:
            fetch = "point"
            cur = self.base.lookup(keys, version=end)
            changed = self.base.spark.createDataFrame(
                [(k,) for k in keys], T.StructType([snap.schema[g]]))
        else:
            fetch = "scan"
            cur = self.base.read(end).join(changed, g, "left_semi")

        derived = self.derive(cur)
        # touched groups with no derived row (all rows deleted, or derive
        # filtered the group out) must leave the index
        gone = changed.join(derived.select(g), g, "left_anti")
        for f in self.index.snapshot().schema.fields:
            if f.name != g:
                gone = gone.withColumn(f.name, F.lit(None).cast(f.dataType))
        events = (
            derived.withColumn(self._OP, F.lit("U"))
            .unionByName(gone.withColumn(self._OP, F.lit("D")))
        )
        self._apply(events, end)
        n = len(keys) if fetch == "point" else changed.count()
        return {"from": start, "to": end, "groups_touched": n,
                "fetch": fetch}

    def follow(self, poll_s: float = 5.0, max_cycles: int | None = None) -> int:
        """Tail loop: poll the base for new commits and refresh each window
        in (same shape as ContinuousAggregate.follow). Returns the number of
        non-empty windows; ``max_cycles`` bounds the loop for tests/batch
        catch-up."""
        import time as _time

        folded = 0
        cycles = 0
        while max_cycles is None or cycles < max_cycles:
            cycles += 1
            r = self.refresh()
            if r["to"] > r["from"]:
                folded += 1
            elif max_cycles is None or cycles < max_cycles:
                _time.sleep(poll_s)
        return folded

    def _apply(self, events: DataFrame, base_version: int,
               params: str | None = None) -> None:
        props = {self._PROP: str(base_version)}
        if params is not None:
            props[self._PARAMS] = params
        self.index.apply_cdc(
            events.withColumn(self._SEQ,
                              F.lit(int(base_version)).cast("long")),
            key_cols=[self.group_col], op_col=self._OP, seq_col=self._SEQ,
            properties=props,
        )

    def read(self) -> DataFrame:
        return self.index.read()


def transcript_audit_index(base: LakeTable, index_root: str, *,
                           n_buckets: int = 16,
                           max_point_keys: int = 100_000,
                           fs=None, **validate_kwargs) -> GroupedRecomputeIndex:
    """Changelog-maintained transcript integrity audit: one
    :func:`~datax_spark.ops.transcripts.validate_transcripts` row per
    conversation, kept fresh as CDC replay mutates the table — the
    post-ingest sanity signal (turn gaps, dup turns, role breaks, empty
    turns, ts regressions) at O(changed conversations) per refresh."""
    from datax_spark.ops.transcripts import validate_transcripts

    conv_col = validate_kwargs.get("conv_col", "conv_id")
    return GroupedRecomputeIndex.create(
        base, index_root,
        lambda df: validate_transcripts(df, **validate_kwargs),
        conv_col, n_buckets=n_buckets, max_point_keys=max_point_keys, fs=fs,
    )
