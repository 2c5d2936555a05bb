"""Changelog-maintained near-duplicate indexes: per-doc signatures kept in
lockstep with a CDC-ingested LakeTable at O(changes) per refresh.

This composes the engine's two halves. The CDC half lands keyed
upserts/deletes into a transcripts/documents LakeTable at 10^10-event scale;
the data-pipeline half needs near-dup detection over that corpus — but
re-running a batch pipeline (ops/dedup.py, ops/similarity.py) after every
ingest epoch re-derives signatures for the WHOLE table, O(corpus) per epoch.
These indexes maintain the expensive artifact — the per-doc signature —
incrementally from ``LakeTable.read_changes``:

- ``create()`` seeds signatures with ONE O(table) pass (the same kernels the
  batch pipelines use).
- ``refresh()`` folds a commit window: the window's folded changelog is
  collapsed to the last change per key, deletions drop signature rows, and
  upserts re-derive signatures ONLY for the changed docs — cost O(changed
  docs), never O(corpus). The signature table is itself a LakeTable keyed
  and bucketed by the doc id, so the apply is a colocated keyed MERGE.
- ``near_dups()`` answers from the maintained signatures: banded LSH over
  ids+signatures (no text/vectors move through the shuffle), then exact
  verification (Jaccard / cosine) that touches only candidate docs.

Two concrete indexes share the skeleton:

- :class:`MinHashIndex` — text near-dup (word-shingle MinHash, exact-Jaccard
  verify), the maintained form of ``ops.dedup.minhash_near_dupes``.
- :class:`EmbeddingLshIndex` — vector near-dup (random-hyperplane band
  buckets, exact-cosine verify), the maintained form of
  ``ops.similarity.embedding_near_dupes``. Signature parameters are FROZEN
  at create time (mixing parameterizations would corrupt the index), so the
  batch pipeline's corpus-sized band auto-sizing is deliberately unavailable
  — pick planes/bands for the target corpus size and rebuild to resize,
  the same contract as retraining a FAISS index.

Delivery contract — exactly-once, same scheme as cdc/rollup.py: the consumed
base version rides in the index table's own commit properties, so the
signature MERGE and the watermark advance are one atomic snapshot publish; a
crashed refresh replays its window against unchanged state (and signature
upserts are idempotent anyway).

Scale shape at 10^9 docs: per ingest epoch the index pays signature
derivation for the epoch's changed docs only; signatures live bucketed next
to the corpus; ``near_dups`` shuffles O(docs x bands) ids and verifies
O(candidates). The batch pipeline's one-shot cost is amortized into ingest —
the near-dup answer is always warm.

Reference contract: the reference has no incremental-index analog (each DataX
job recomputes its full reader->writer pass — JobContainer schedule loop);
this is the lake-native generalization the north rule's "training-data
pipeline at 100 TB" story needs.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window, functions as F, types as T

from datax_spark.lake.table import LakeTable


def delete_events(table: LakeTable, keys: DataFrame, id_col: str,
                  op_col: str, seq_col: str, delete_op: str,
                  seq: int = 0) -> DataFrame:
    """Build minimal delete events for ``keys``: id + op + seq, every other
    payload column a typed NULL literal (the MoR merge fold resolves deletes
    by key/op/seq and never reads a delete's payload). When the table's
    bucket key differs from ``id_col`` the events must still carry the real
    bucket-key value to route to the right bucket, so ONLY that column is
    fetched from the table — the wide payload (text, vectors) never enters
    the apply's shuffle either way."""
    snap = table.snapshot()
    if snap.bucket_key == id_col:
        ev = keys.select(id_col)
    else:
        ev = (
            table.read(columns=[id_col, snap.bucket_key])
            .join(keys.select(id_col), id_col, "left_semi")
        )
    for f in snap.schema.fields:
        if f.name not in ev.columns:
            ev = ev.withColumn(f.name, F.lit(None).cast(f.dataType))
    return (
        ev.withColumn(op_col, F.lit(delete_op))
        .withColumn(seq_col, F.lit(int(seq)).cast("long"))
    )


def dedupe_table(table: LakeTable, pairs: DataFrame, id_col: str = "doc_id",
                 seq: int = 0) -> dict:
    """Delete every non-canonical member of each near-dup cluster from a
    LakeTable IN PLACE: connected components over ``pairs`` pick the min-id
    keeper per cluster, and the losers leave via ONE keyed CDC apply of
    delete events — so the removal is itself a versioned, changelog-visible
    commit (downstream ContinuousAggregates and signature indexes fold it
    like any other change window). The delete events are keys-only (payload
    columns are NULL literals — see :func:`delete_events`), so a 100-TB
    corpus never hauls loser text through the apply. ``seq`` is the delete
    events' source sequence and orders them only WITHIN this one apply
    batch; cross-commit resolution is newest-generation-wins, so ``seq``
    does NOT protect against a later re-apply of the original feed —
    replay protection is the CdcEngine's epoch-manifest skip (a feed
    re-applied through the engine is recognized and not re-applied; feeds
    applied outside the engine have no such guard). Returns
    ``{"clusters": n, "deleted": n}``."""
    from datax_spark.ops.dedup import connected_components

    # reuse the table's recorded merge convention: existing MoR delta files
    # carry the ORIGINAL op/seq column names, and the per-bucket fold reads
    # them by name — a differently-named apply would break the merge
    props = table.snapshot().properties
    op_col = props.get("merge_op_col", "op")
    seq_col = props.get("merge_seq_col", "seq")
    delete_op = props.get("merge_delete_op", "D")

    # connected_components returns an eager localCheckpoint, so reusing
    # `cc` below (losers + cluster count) does not recompute the loop
    cc = connected_components(pairs, id_out=id_col)
    losers = cc.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    ev = delete_events(table, losers, id_col, op_col, seq_col, delete_op,
                       seq=seq)
    n = ev.count()
    n_clusters = cc.select("cluster_id").distinct().count()
    if n:
        table.apply_cdc(ev, key_cols=[id_col],
                        op_col=op_col, seq_col=seq_col,
                        delete_op=delete_op)
    return {"clusters": n_clusters, "deleted": n}


class _ChangelogIndex:
    """Skeleton: a LakeTable of per-doc signatures maintained from the base
    table's changelog. Subclasses define the signature schema + derivation."""

    _OP, _SEQ = "_idx_op", "_idx_seq"
    _PROP = "mhidx_base_version"
    _PARAMS = "mhidx_params"

    def __init__(self, base: LakeTable, index: LakeTable, **params):
        self.base = base
        self.index = index
        for k, v in params.items():
            setattr(self, k, v)
        self._params = params

    # -------------------------------------------------- subclass contract
    def _derive(self, df: DataFrame) -> DataFrame:
        """(id, *signature cols) for every input doc that HAS a signature;
        docs yielding none (empty text, NULL vector) are simply absent."""
        raise NotImplementedError

    def _sig_fields(self, id_type: T.DataType) -> list[T.StructField]:
        raise NotImplementedError

    # ------------------------------------------------------------ bootstrap
    @classmethod
    def create(cls, base: LakeTable, index_root: str, *,
               n_buckets: int = 16, fs=None, **params) -> "_ChangelogIndex":
        """Create the signature table and seed it from the base table's
        CURRENT version — the one O(table) derivation pass."""
        params = {**cls._DEFAULTS, **params}
        base_version = base.current_version()
        if base_version is None:
            raise ValueError(f"base table has no snapshot: {base.root}")
        id_col = params["id_col"]
        id_type = base.snapshot(base_version).schema[id_col].dataType
        idx = cls(base, LakeTable.__new__(LakeTable), **params)  # temp for schema
        schema = T.StructType(
            [T.StructField(id_col, id_type, False)] + idx._sig_fields(id_type)
        )
        index = LakeTable.create(base.spark, index_root, schema,
                                 bucket_key=id_col, n_buckets=n_buckets, fs=fs)
        idx.index = index
        seed = idx._derive(base.read(base_version)).withColumn(
            cls._OP, F.lit("U"))
        idx._apply(seed, base_version,
                   params=json.dumps({"class": cls.__name__, **params}))
        return idx

    @classmethod
    def open(cls, base: LakeTable, index_root: str, fs=None) -> "_ChangelogIndex":
        """Re-attach to an existing index; parameters come from the lineage
        recorded at create time (they define the signature function — mixing
        parameterizations would silently corrupt the index)."""
        index = LakeTable(base.spark, index_root, fs=fs)
        for entry in index.history():
            p = entry.get("properties", {}).get(cls._PARAMS)
            if p is not None:
                params = json.loads(p)
                klass = params.pop("class", cls.__name__)
                if klass != cls.__name__:
                    raise ValueError(
                        f"index at {index_root} was created as {klass}, "
                        f"not {cls.__name__}"
                    )
                return cls(base, index, **params)
        raise ValueError(
            f"index at {index_root} has no {cls._PARAMS} lineage; "
            "was it created via .create()?"
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
            "was it created via .create()?"
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

        idc = self.id_col
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
            .drop("_rn")
            .persist()
        )
        try:
            ups = last.filter(F.col("_change_type") != "delete")
            sigs = self._derive(ups)
            # an upserted doc with no derivable signature (empty text, NULL
            # vector) yields no row: any stale signature for it must drop
            no_sig = ups.select(idc).join(sigs.select(idc), idc, "left_anti")
            dels = last.filter(F.col("_change_type") == "delete").select(idc)
            null_sigs = no_sig.union(dels)
            for f in self.index.snapshot().schema.fields:
                if f.name != idc:
                    null_sigs = null_sigs.withColumn(
                        f.name, F.lit(None).cast(f.dataType))
            events = (
                sigs.withColumn(self._OP, F.lit("U"))
                .unionByName(null_sigs.withColumn(self._OP, F.lit("D")))
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

    def signatures(self) -> DataFrame:
        return self.index.read()


class MinHashIndex(_ChangelogIndex):
    """Text near-dup index: per-doc MinHash signatures; ``near_dups()`` =
    banded LSH + exact-Jaccard verify over candidate docs only. Must equal
    ``ops.dedup.minhash_near_dupes`` on the base's current state."""

    _DEFAULTS = dict(text_col="text", id_col="doc_id",
                     w=5, n_hashes=64, portable=False)

    def _sig_fields(self, id_type):
        return [T.StructField("minhash", T.ArrayType(T.LongType()), True)]

    def _derive(self, df: DataFrame) -> DataFrame:
        from datax_spark.ops.dedup import minhash_signatures

        return minhash_signatures(
            df.select(self.id_col, self.text_col),
            self.text_col, self.id_col, self.w, self.n_hashes,
            portable=self.portable,
        )

    def near_dups(self, n_bands: int = 16,
                  threshold: float = 0.5) -> DataFrame:
        from datax_spark.ops.dedup import jaccard_verify, lsh_candidates

        rows = self.n_hashes // n_bands
        cand = lsh_candidates(
            self.signatures().select(self.id_col, "minhash"),
            self.id_col, n_bands, rows, portable=self.portable)
        docs = self.base.read().select(self.id_col, self.text_col)
        # prune=True is safe AND profitable here: cand re-derives from the
        # MATERIALIZED signature table (a cheap scan, not a recompute), and
        # the verify stage then re-shingles only candidate docs
        return jaccard_verify(cand, docs, self.text_col, self.id_col,
                              self.w, threshold, prune=True)


class EmbeddingLshIndex(_ChangelogIndex):
    """Vector near-dup index: per-vector random-hyperplane band buckets;
    ``near_dups()`` = banded self-join over the stored buckets + exact-cosine
    verify on candidate vectors fetched from the base. Must equal
    ``ops.similarity.embedding_near_dupes`` (same explicit planes/bands) on
    the base's current state."""

    _DEFAULTS = dict(vec_col="embedding", id_col="vec_id",
                     n_planes=96, n_bands=8, dim=64)

    def _sig_fields(self, id_type):
        return [T.StructField("bands", T.ArrayType(T.IntegerType()), True)]

    def _derive(self, df: DataFrame) -> DataFrame:
        from datax_spark.ops.similarity import band_buckets_expr

        return (
            df.select(self.id_col, self.vec_col)
            .filter(F.col(self.vec_col).isNotNull())
            .select(
                self.id_col,
                band_buckets_expr(self.vec_col, self.n_planes,
                                  self.n_bands, self.dim).alias("bands"),
            )
        )

    def near_dups(self, threshold: float = 0.95) -> DataFrame:
        from datax_spark.ops.similarity import cosine_expr

        idc = self.id_col
        ex = self.signatures().select(
            idc, F.posexplode("bands").alias("band", "bucket"))
        a = ex.select(F.col(idc).alias("id_a"), "band", "bucket")
        b = ex.select(F.col(idc).alias("id_b"), "band", "bucket")
        pairs = (
            a.join(b, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # semi-join prune: fetch vectors ONLY for candidate ids, so the plan
        # never shuffles the full corpus vectors regardless of AQE broadcast
        # thresholds. Referencing the pair subtree twice re-derives it from
        # the MATERIALIZED signature table — a cheap ids+bands scan, the same
        # prune=True justification as MinHashIndex.near_dups.
        cand_ids = (
            pairs.select(F.col("id_a").alias(idc))
            .union(pairs.select(F.col("id_b").alias(idc)))
            .distinct()
        )
        s = (
            self.base.read(columns=[idc, self.vec_col])
            .join(cand_ids, idc, "left_semi")
        )
        va = s.select(F.col(idc).alias("id_a"), F.col(self.vec_col).alias("_va"))
        vb = s.select(F.col(idc).alias("id_b"), F.col(self.vec_col).alias("_vb"))
        return (
            pairs.join(va, "id_a").join(vb, "id_b")
            .withColumn("cos", cosine_expr(F.col("_va"), F.col("_vb")))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )

    def topk(self, probes: DataFrame, k: int = 5,
             multi_probe: int = 0) -> DataFrame:
        """Approximate top-k of each probe vector against the indexed corpus
        — ``ops.similarity.lsh_ann_topk`` with the corpus side's banding
        already materialized: query time pays ONLY the probe set's bucket
        derivation plus the candidate join; no corpus pass at all. Equals
        ``lsh_ann_topk(probes, base.read(), <frozen params>)`` exactly.
        ``multi_probe=n`` flips the probe's n lowest-margin sign bits per
        band (probe-side explode only — corpus shuffle volume unchanged)."""
        from pyspark.sql.window import Window

        from datax_spark.ops.similarity import (
            band_buckets_expr,
            cosine_expr,
            probe_buckets_expr,
        )

        idc, vc = self.id_col, self.vec_col
        if multi_probe:
            pexpr = probe_buckets_expr(vc, self.n_planes, self.n_bands,
                                       self.dim, n_flip=multi_probe)
            probe_side = (
                probes.select(F.col(idc).alias("probe_id"), pexpr.alias("_pb"))
                .select("probe_id", F.posexplode("_pb").alias("pos", "bucket"))
                .select("probe_id",
                        (F.col("pos") / (1 + multi_probe)).cast("int").alias("band"),
                        "bucket")
                .distinct()
            )
        else:
            bexpr = band_buckets_expr(vc, self.n_planes, self.n_bands, self.dim)
            probe_side = (
                probes.select(F.col(idc).alias("probe_id"), bexpr.alias("_b"))
                .select("probe_id", F.posexplode("_b").alias("band", "bucket"))
            )
        corpus_side = self.signatures().select(
            F.col(idc).alias("neighbor_id"),
            F.posexplode("bands").alias("band", "bucket"),
        )
        cand = (
            corpus_side.join(F.broadcast(probe_side), ["band", "bucket"])
            .where(F.col("probe_id") != F.col("neighbor_id"))
            .select("probe_id", "neighbor_id")
            .distinct()
        )
        pv = probes.select(F.col(idc).alias("probe_id"), F.col(vc).alias("_probev"))
        # semi-join prune (same rationale as near_dups): only candidate
        # neighbors' vectors are fetched; re-deriving `cand` for the semi
        # side is a cheap scan of the materialized signature table
        nv = (
            self.base.read(columns=[idc, vc])
            .join(cand.select(F.col("neighbor_id").alias(idc)).distinct(),
                  idc, "left_semi")
            .select(F.col(idc).alias("neighbor_id"), F.col(vc).alias("_neighborv"))
        )
        scored = (
            cand.join(F.broadcast(pv), "probe_id")
            .join(nv, "neighbor_id")
            .withColumn("cos", F.round(
                cosine_expr(F.col("_probev"), F.col("_neighborv")), 6))
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", "neighbor_id", "rank", "cos")
        )
