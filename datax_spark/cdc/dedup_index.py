"""Changelog-maintained near-duplicate index: MinHash signatures kept in
lockstep with a CDC-ingested LakeTable at O(changes) per refresh.

This composes the engine's two halves. The CDC half lands keyed
upserts/deletes into a transcripts/documents LakeTable at 10^10-event scale;
the data-pipeline half needs near-dup detection over that corpus — but
re-running the batch MinHash pipeline (ops/dedup.py) after every ingest epoch
re-shingles the WHOLE table, O(corpus) per epoch. This index maintains the
expensive artifact — the per-doc MinHash signature — incrementally from
``LakeTable.read_changes``:

- ``create()`` seeds signatures with ONE O(table) pass (the same
  one-aggregation ``minhash_signatures`` kernel the batch pipeline uses).
- ``refresh()`` folds a commit window: the window's folded changelog is
  collapsed to the last change per key, deletions drop signature rows, and
  upserts re-shingle ONLY the changed docs — cost O(changed docs), never
  O(corpus). The signature table is itself a LakeTable keyed and bucketed by
  the doc id, so the apply is a colocated keyed MERGE.
- ``near_dups()`` answers from the maintained signatures: banded LSH over
  ids+signatures (no text moves through the shuffle), then exact-Jaccard
  verification that re-shingles only the candidate docs (``jaccard_verify``).

Delivery contract — exactly-once, same scheme as cdc/rollup.py: the consumed
base version rides in the index table's own commit properties
(``mhidx_base_version``), so the signature MERGE and the watermark advance
are one atomic snapshot publish; a crashed refresh replays its window against
unchanged state (and signature upserts are idempotent anyway).

Scale shape at 10^9 docs: per ingest epoch the index pays shingling for the
epoch's changed docs only; signatures live bucketed next to the corpus;
``near_dups`` shuffles O(docs x bands) ids and verifies O(candidates). The
batch pipeline's one-shot cost is amortized into ingest — the near-dup
answer is always warm.

Reference contract: the reference has no incremental-index analog (each DataX
job recomputes its full reader->writer pass; e.g. a dedupe would re-read the
source — JobContainer schedule loop); this is the lake-native generalization
the north rule's "training-data pipeline at 100 TB" story needs.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window, functions as F, types as T

from datax_spark.lake.table import LakeTable
from datax_spark.ops.dedup import (
    jaccard_verify,
    lsh_candidates,
    minhash_signatures,
)


class MinHashIndex:
    """A LakeTable of per-doc MinHash signatures maintained from the base
    table's changelog."""

    _OP, _SEQ = "_idx_op", "_idx_seq"
    _PROP = "mhidx_base_version"
    _PARAMS = "mhidx_params"

    def __init__(self, base: LakeTable, index: LakeTable, *,
                 text_col: str = "text", id_col: str = "doc_id",
                 w: int = 5, n_hashes: int = 64, portable: bool = False):
        self.base = base
        self.index = index
        self.text_col = text_col
        self.id_col = id_col
        self.w = w
        self.n_hashes = n_hashes
        self.portable = portable

    # ------------------------------------------------------------ bootstrap
    @classmethod
    def create(cls, base: LakeTable, index_root: str, *,
               text_col: str = "text", id_col: str = "doc_id",
               w: int = 5, n_hashes: int = 64, portable: bool = False,
               n_buckets: int = 16, fs=None) -> "MinHashIndex":
        """Create the signature table and seed it from the base table's
        CURRENT version — the one O(table) shingle pass."""
        base_version = base.current_version()
        if base_version is None:
            raise ValueError(f"base table has no snapshot: {base.root}")
        id_type = base.snapshot(base_version).schema[id_col].dataType
        schema = T.StructType([
            T.StructField(id_col, id_type, False),
            T.StructField("minhash", T.ArrayType(T.LongType()), True),
        ])
        index = LakeTable.create(base.spark, index_root, schema,
                                 bucket_key=id_col, n_buckets=n_buckets, fs=fs)
        idx = cls(base, index, text_col=text_col, id_col=id_col,
                  w=w, n_hashes=n_hashes, portable=portable)
        seed = minhash_signatures(
            base.read(base_version).select(id_col, text_col),
            text_col, id_col, w, n_hashes, portable=portable,
        ).withColumn(cls._OP, F.lit("U"))
        idx._apply(seed, base_version, params=json.dumps({
            "text_col": text_col, "id_col": id_col, "w": w,
            "n_hashes": n_hashes, "portable": portable,
        }))
        return idx

    @classmethod
    def open(cls, base: LakeTable, index_root: str, fs=None) -> "MinHashIndex":
        """Re-attach to an existing index; parameters come from the lineage
        recorded at create time (they define the signature function — mixing
        parameterizations would silently corrupt the index)."""
        index = LakeTable(base.spark, index_root, fs=fs)
        for entry in index.history():
            p = entry.get("properties", {}).get(cls._PARAMS)
            if p is not None:
                params = json.loads(p)
                return cls(base, index, **params)
        raise ValueError(
            f"index at {index_root} has no {cls._PARAMS} lineage; "
            "was it created via MinHashIndex.create()?"
        )

    # ------------------------------------------------------------ watermark
    def consumed_version(self) -> int:
        """Latest base version folded into the index — read from the index
        table's own commit history, so it advances atomically with the data."""
        for entry in reversed(self.index.history()):
            v = entry.get("properties", {}).get(self._PROP)
            if v is not None:
                return int(v)
        raise ValueError(
            f"index at {self.index.root} has no {self._PROP} lineage; "
            "was it created via MinHashIndex.create()?"
        )

    # -------------------------------------------------------------- refresh
    def refresh(self) -> dict:
        """Fold all base commits since the last refresh into the index.
        Returns ``{"from": v0, "to": v1, "docs_touched": n}``; no-op (and no
        commit) when the base hasn't advanced."""
        start = self.consumed_version()
        end = self.base.current_version()
        if end is None or end <= start:
            return {"from": start, "to": start, "docs_touched": 0}

        idc, txc = self.id_col, self.text_col
        ch = self.base.read_changes(start, end)
        # last effective change per doc in the window (a doc updated then
        # deleted across commits must end deleted); within one commit the
        # folded changelog already holds at most one row per key
        last = (
            ch.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(idc)
                    .orderBy(F.col("_commit_version").desc())
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(idc, txc, "_change_type")
            .persist()
        )
        try:
            ups = last.filter(F.col("_change_type") != "delete").select(idc, txc)
            sigs = minhash_signatures(
                ups, txc, idc, self.w, self.n_hashes, portable=self.portable
            )
            # an upserted doc with no shingles (empty text) yields no
            # signature row: any stale signature for it must be dropped
            no_sig = ups.select(idc).join(sigs.select(idc), idc, "left_anti")
            dels = last.filter(F.col("_change_type") == "delete").select(idc)
            events = (
                sigs.withColumn(self._OP, F.lit("U"))
                .unionByName(
                    no_sig.union(dels)
                    .withColumn("minhash",
                                F.lit(None).cast(T.ArrayType(T.LongType())))
                    .withColumn(self._OP, F.lit("D"))
                )
            )
            n_docs = last.count()  # cheap: last is persisted
            self._apply(events, end)
        finally:
            last.unpersist()
        return {"from": start, "to": end, "docs_touched": n_docs}

    def _apply(self, events: DataFrame, base_version: int,
               params: str | None = None) -> None:
        props = {self._PROP: str(base_version)}
        if params is not None:
            props[self._PARAMS] = params
        self.index.apply_cdc(
            events.withColumn(self._SEQ, F.lit(int(base_version)).cast("long")),
            key_cols=[self.id_col], op_col=self._OP, seq_col=self._SEQ,
            properties=props,
        )

    # --------------------------------------------------------------- query
    def signatures(self) -> DataFrame:
        return self.index.read().select(self.id_col, "minhash")

    def near_dups(self, n_bands: int = 16,
                  threshold: float = 0.5) -> DataFrame:
        """Near-duplicate pairs of the CURRENT indexed state: banded LSH over
        the maintained signatures, exact-Jaccard verify over candidate docs
        only. Must equal the batch pipeline (``minhash_near_dupes``) run on
        the base table's current version — the oracle property."""
        rows = self.n_hashes // n_bands
        cand = lsh_candidates(self.signatures(), self.id_col, n_bands, rows,
                              portable=self.portable)
        docs = self.base.read().select(self.id_col, self.text_col)
        # prune=True is safe AND profitable here: cand re-derives from the
        # MATERIALIZED signature table (a cheap scan, not a recompute), and
        # the verify stage then re-shingles only candidate docs
        return jaccard_verify(cand, docs, self.text_col, self.id_col,
                              self.w, threshold, prune=True)
