"""Changelog-maintained MinHash index (cdc/dedup_index.py).

The load-bearing invariant: after any sequence of base-table commits,
``MinHashIndex.refresh()`` + ``near_dups()`` must be indistinguishable from
running the BATCH pipeline (``minhash_near_dupes``) on the base table's
current state — incremental maintenance may never change the answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.dedup_index import MinHashIndex
from datax_spark.lake.table import LakeTable
from datax_spark.ops.dedup import minhash_near_dupes

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])

N_BANDS, THRESHOLD = 16, 0.4


def _mk_text(i: int, mut: int = 0) -> str:
    base = [f"tok{(i * 7 + j) % 23}" for j in range(30)]
    for m in range(mut):
        base[m * 3 % len(base)] = f"mut{i}_{m}"
    return " ".join(base)


def _events(spark, rows):
    """rows: (doc_id, text, seq, op)"""
    return spark.createDataFrame(
        rows, "doc_id long, text string, seq long, op string"
    )


def _apply(t, spark, rows, mode="mor"):
    t.apply_cdc_stats(
        _events(spark, rows), key_cols=["doc_id"], op_col="op", seq_col="seq",
        write_mode=mode, compact_threshold=100,
    )


def _pairs(df):
    return sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect())


def _batch(t):
    return _pairs(minhash_near_dupes(
        t.read().select("doc_id", "text"), "text", "doc_id",
        n_bands=N_BANDS, threshold=THRESHOLD,
    ))


@pytest.fixture()
def base(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, "doc_id", n_buckets=4)
    # 3 clusters of near-identical docs + singletons
    rows = []
    seq = 1
    for i in range(12):
        rows.append((i, _mk_text(i % 4, mut=i // 4), seq, "I"))
        seq += 1
    for i in range(12, 20):
        rows.append((i, _mk_text(100 + i), seq, "I"))
        seq += 1
    _apply(t, spark, rows)
    return t


def test_seed_matches_batch(spark, tmp_path, base):
    idx = MinHashIndex.create(base, str(tmp_path / "idx"), n_buckets=4)
    got = _pairs(idx.near_dups(N_BANDS, THRESHOLD))
    assert got == _batch(base)
    assert len(got) > 0  # non-vacuous: the planted clusters must show up
    assert idx.consumed_version() == base.current_version()


def test_refresh_tracks_updates_deletes_inserts(spark, tmp_path, base):
    idx = MinHashIndex.create(base, str(tmp_path / "idx"), n_buckets=4)

    # window 1: mutate a cluster member away, delete another, insert a dup
    _apply(base, spark, [
        (0, _mk_text(900), 100, "U"),           # leaves its cluster
        (1, "", 101, "D"),                      # deleted
        (50, _mk_text(2, mut=1), 102, "I"),     # joins cluster 2
    ])
    r = idx.refresh()
    assert r["to"] == base.current_version() and r["docs_touched"] == 3
    assert _pairs(idx.near_dups(N_BANDS, THRESHOLD)) == _batch(base)

    # window 2: two commits folded in one refresh; update-then-delete same key
    _apply(base, spark, [(50, _mk_text(3), 110, "U"), (51, _mk_text(2), 111, "I")])
    _apply(base, spark, [(50, "", 112, "D")])
    idx.refresh()
    assert _pairs(idx.near_dups(N_BANDS, THRESHOLD)) == _batch(base)
    # the deleted doc may not appear in any pair
    assert not any(50 in (a, b) for a, b, _ in _pairs(idx.near_dups(N_BANDS, THRESHOLD)))


def test_empty_text_upsert_drops_signature(spark, tmp_path, base):
    idx = MinHashIndex.create(base, str(tmp_path / "idx"), n_buckets=4)
    _apply(base, spark, [(2, "", 100, "U")])   # doc 2 becomes shingle-less
    idx.refresh()
    assert _pairs(idx.near_dups(N_BANDS, THRESHOLD)) == _batch(base)
    sigs = {r["doc_id"] for r in idx.signatures().collect()}
    assert 2 not in sigs


def test_refresh_noop_and_exactly_once_replay(spark, tmp_path, base):
    idx = MinHashIndex.create(base, str(tmp_path / "idx"), n_buckets=4)
    v = idx.index.current_version()
    r = idx.refresh()
    assert r["docs_touched"] == 0
    assert idx.index.current_version() == v  # no empty commit

    _apply(base, spark, [(0, _mk_text(1), 100, "U")])
    idx.refresh()
    state = _pairs(idx.near_dups(N_BANDS, THRESHOLD))
    # a crashed-then-replayed refresh window is a no-op (watermark advanced
    # atomically with the data)
    idx.refresh()
    assert _pairs(idx.near_dups(N_BANDS, THRESHOLD)) == state


def test_open_restores_params_and_watermark(spark, tmp_path, base):
    MinHashIndex.create(base, str(tmp_path / "idx"), n_buckets=4, w=3, n_hashes=32)
    idx2 = MinHashIndex.open(base, str(tmp_path / "idx"))
    assert (idx2.w, idx2.n_hashes) == (3, 32)
    assert idx2.consumed_version() == base.current_version()
    _apply(base, spark, [(0, _mk_text(5), 100, "U")])
    idx2.refresh()
    got = _pairs(idx2.near_dups(N_BANDS, THRESHOLD))
    want = _pairs(minhash_near_dupes(
        base.read().select("doc_id", "text"), "text", "doc_id",
        w=3, n_hashes=32, n_bands=N_BANDS, threshold=THRESHOLD,
    ))
    assert got == want


def test_maintenance_commits_do_not_disturb_index(spark, tmp_path, base):
    """compact()/rebucket() between refreshes change files, not rows — the
    index must fold them as no-ops (zero effective changes) and keep exact
    batch equality; real changes landing AFTER maintenance still fold."""
    idx = MinHashIndex.create(base, str(tmp_path / "idx"), n_buckets=4)
    before = _pairs(idx.near_dups(N_BANDS, THRESHOLD))

    base.compact()
    base.rebucket(n_buckets=8)
    r = idx.refresh()
    assert r["docs_touched"] == 0
    assert idx.consumed_version() == base.current_version()
    assert _pairs(idx.near_dups(N_BANDS, THRESHOLD)) == before

    # post-maintenance real change folds normally against the new layout
    _apply(base, spark, [(0, _mk_text(1), 200, "U")])
    idx.refresh()
    assert _pairs(idx.near_dups(N_BANDS, THRESHOLD)) == _batch(base)


def test_dedupe_table_in_place_and_index_follows(spark, tmp_path, base):
    """dedupe_table deletes cluster losers via ONE CDC apply; the removal is
    changelog-visible, so a maintained index folds it like any other window
    and its next near_dups() is pair-free."""
    from datax_spark.cdc.dedup_index import dedupe_table

    idx = MinHashIndex.create(base, str(tmp_path / "idx"), n_buckets=4)
    pairs = idx.near_dups(N_BANDS, THRESHOLD)
    assert pairs.count() > 0
    before_rows = base.read().count()

    r = dedupe_table(base, pairs, seq=10_000)
    assert r["deleted"] > 0 and r["clusters"] > 0
    kept = {x[0] for x in base.read().select("doc_id").collect()}
    assert len(kept) == before_rows - r["deleted"]
    # no near-dup pair survives intact (exactly the component min is kept)
    for a, b, _ in _pairs(pairs):
        assert not (a in kept and b in kept)

    idx.refresh()
    assert _pairs(idx.near_dups(N_BANDS, THRESHOLD)) == _batch(base)
    # a deduped corpus has no remaining near-dup pairs above threshold
    assert _pairs(idx.near_dups(N_BANDS, THRESHOLD)) == []


def test_delete_events_carry_no_payload(spark, tmp_path, base):
    """The dedupe apply's delete events are keys-only: when the table is
    bucketed by the id, the event plan never touches the base table at all
    (no loser text flows through persist/shuffle/write), and payload columns
    are NULL literals."""
    from datax_spark.cdc.dedup_index import delete_events

    losers = spark.createDataFrame([(1,), (2,)], "doc_id long")
    ev = delete_events(base, losers, "doc_id", "op", "seq", "D", seq=7)
    plan = ev._jdf.queryExecution().optimizedPlan().toString()
    assert str(base.root) not in plan  # built from keys + literals only
    rows = ev.orderBy("doc_id").collect()
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert all(r["text"] is None and r["op"] == "D" and r["seq"] == 7
               for r in rows)


def test_dedupe_table_nonbucket_id_routes_correctly(spark, tmp_path):
    """When the bucket key differs from the dedup id, delete events fetch
    ONLY the bucket-key column (never the wide payload) and still route to
    the right buckets — final state equals a batch anti-join."""
    from datax_spark.cdc.dedup_index import dedupe_table

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "g"), schema, "grp", n_buckets=4)
    rows = [(i, f"g{i % 5}", _mk_text(i % 3, mut=i // 3), i + 1, "I")
            for i in range(12)]
    t.apply_cdc_stats(
        spark.createDataFrame(
            rows, "doc_id long, grp string, text string, seq long, op string"),
        key_cols=["doc_id"], op_col="op", seq_col="seq",
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 6), (1, 4)], "id_a long, id_b long")
    r = dedupe_table(t, pairs, id_col="doc_id", seq=100)
    assert r == {"clusters": 2, "deleted": 3}
    kept = sorted(x[0] for x in t.read().select("doc_id").collect())
    assert kept == [0, 1, 2, 5, 7, 8, 9, 10, 11]
