"""File-level min/max zone maps in snapshot manifests + predicate pruning.

Stats are read FREE from the parquet footers the writers already produce
(Iceberg write-metrics analog) and recorded per DataFile entry; selective
reads skip files whose column ranges cannot match. Pruning is an
optimization only — the predicate is always re-applied as a filter, and MoR
scans (where a newer delta can move a row INTO range) merge first, unpruned.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
from datax_spark.lake.table import (
    LakeTable,
    _file_may_match,
    _parse_prune_preds,
)

TS = dt.datetime(2025, 1, 1)


def _mk(spark, tmp_path, n_buckets=2):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA_V1,
        bucket_key="conv_id", n_buckets=n_buckets,
    )


def _rows(spark, items):
    return spark.createDataFrame(items, TRANSCRIPTS_SCHEMA_V1)


def _gen_batches(spark, t, n_batches=4, per=25):
    """Each append produces files with a DISJOINT turn_idx range."""
    for k in range(n_batches):
        t.append(_rows(spark, [
            (f"c{k}-{i}", k * 1000 + i, "user", f"m{k}/{i}",
             TS + dt.timedelta(days=k))
            for i in range(per)
        ]))


def test_manifest_records_stats(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _gen_batches(spark, t, n_batches=1)
    snap = t.snapshot()
    entries = [f for fl in snap.files.values() for f in fl]
    assert entries
    for e in entries:
        s = e["stats"]
        assert 0 <= s["turn_idx"][0] <= s["turn_idx"][1] < 1000
        assert s["conv_id"][0].startswith("c0-")
        assert s["turn_idx"][2] == 0  # null count
        assert s["ts"][0].startswith("2025-01-01")
    # stats survive the JSON manifest roundtrip
    again = LakeTable(spark, t.root).snapshot()
    assert [f.get("stats") for fl in again.files.values() for f in fl] == \
        [f.get("stats") for fl in snap.files.values() for f in fl]


def test_pred_parser():
    assert _parse_prune_preds("turn_idx >= 100 AND role = 'user'") == [
        ("turn_idx", ">=", 100), ("role", "=", "user")]
    assert _parse_prune_preds("a < 1.5 and b == \"x\"") == [
        ("a", "<", 1.5), ("b", "=", "x")]
    # OR / parens / unparseable terms disable or skip — never wrong
    assert _parse_prune_preds("a = 1 OR b = 2") == []
    assert _parse_prune_preds("(a = 1) AND b = 2") == []
    assert _parse_prune_preds("a = 1 AND b IN (1,2)") == []  # parens: bail out


def test_file_may_match_logic():
    stats = {"n": [10, 20, 0], "s": ["aa", "mm", 0],
             "ts": ["2025-01-05T00:00:00", "2025-01-09T00:00:00", 0]}
    assert not _file_may_match(stats, [("n", ">", 20)])
    assert _file_may_match(stats, [("n", ">=", 20)])
    assert not _file_may_match(stats, [("n", "<", 10)])
    assert not _file_may_match(stats, [("n", "=", 5)])
    assert _file_may_match(stats, [("n", "=", 15)])
    assert not _file_may_match(stats, [("s", "=", "zz")])
    assert not _file_may_match(stats, [("ts", ">=", "2025-02-01")])
    assert _file_may_match(stats, [("ts", ">=", "2025-01-06")])
    # unknown column / missing stats / type confusion → keep the file
    assert _file_may_match(stats, [("other", "=", 1)])
    assert _file_may_match(None, [("n", "=", 999)])
    assert _file_may_match(stats, [("n", "=", "not-a-number")])
    # key-set pruning (lookup)
    assert _file_may_match(stats, [("s", "in", ["zz", "bb"])])
    assert not _file_may_match(stats, [("s", "in", ["zz", "nn"])])


def test_read_where_prunes_files_and_matches_unpruned(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _gen_batches(spark, t, n_batches=4)
    snap = t.snapshot()
    all_files = [f for fl in snap.files.values() for f in fl]
    preds = _parse_prune_preds("turn_idx >= 3000")
    kept = [f for f in all_files if _file_may_match(f.get("stats"), preds)]
    assert len(kept) < len(all_files)  # pruning actually fires
    assert all(f["stats"]["turn_idx"][1] >= 3000 for f in kept)

    got = sorted((r.conv_id, r.turn_idx)
                 for r in t.read(where="turn_idx >= 3000").collect())
    want = sorted((r.conv_id, r.turn_idx)
                  for r in t.read().filter("turn_idx >= 3000").collect())
    assert got == want and len(got) == 25

    # timestamp predicate prunes too, identical results
    got = t.read(where="ts >= '2025-01-03'").count()
    assert got == t.read().filter("ts >= '2025-01-03'").count() == 50


def test_lookup_prunes_by_key_range(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _gen_batches(spark, t, n_batches=4)
    out = t.lookup(["c2-5"]).collect()
    assert [(r.conv_id, r.turn_idx) for r in out] == [("c2-5", 2005)]
    # a key matching no file's range returns empty without error
    assert t.lookup(["zzz"]).count() == 0


def test_mor_scans_stay_correct_without_pruning(spark, tmp_path):
    """Under MoR deltas, where= must merge-then-filter (a delta can move a
    row INTO the predicate range — pruning the old base would resurrect the
    stale value)."""
    t = _mk(spark, tmp_path)
    _gen_batches(spark, t, n_batches=2)
    src = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields)
        + [T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())]
    )
    # move a batch-0 key INTO the >= 1000 range via a MoR delta update
    t.apply_cdc_stats(
        spark.createDataFrame(
            [("c0-0", 0, "user", "updated-text", TS, "U", 99)], src),
        key_cols=["conv_id", "turn_idx"], write_mode="mor",
    )
    assert t.snapshot().has_deltas()
    got = {r.conv_id: r.text for r in
           t.read(where="text = 'updated-text'").collect()}
    assert got == {"c0-0": "updated-text"}
    # and the filter sees post-merge values, not the stale base row
    assert t.read(where="text = 'm0/0'").count() == 0


def test_stats_follow_compaction_and_rebucket(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _gen_batches(spark, t, n_batches=2)
    src = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields)
        + [T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())]
    )
    t.apply_cdc_stats(
        spark.createDataFrame([("c0-1", 1, "user", "x", TS, "U", 1)], src),
        key_cols=["conv_id", "turn_idx"], write_mode="mor",
    )
    t.compact()
    snap = t.snapshot()
    assert all(
        "turn_idx" in (f.get("stats") or {})
        for fl in snap.files.values() for f in fl
    )
    t.rebucket(4)
    snap = t.snapshot()
    assert all(
        "turn_idx" in (f.get("stats") or {})
        for fl in snap.files.values() for f in fl
    )
    assert t.read(where="turn_idx >= 1000").count() == 25


def test_clustering_compact_layout_only_and_selective(spark, tmp_path):
    """compact(sort_by=..., max_rows_per_file=...) is a clustering rewrite:
    live rows are bit-identical, each bucket splits into range-disjoint
    files, and zone-map pruning on the sort column becomes selective."""
    t = _mk(spark, tmp_path)
    src = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields)
        + [T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())]
    )
    # turn_idx deliberately written in a scrambled order: pre-clustering,
    # every file's [min,max] spans nearly the whole domain
    t.apply_cdc(
        spark.createDataFrame(
            [(f"c{i}", (i * 37) % 2000, "user", f"m{i}", TS, "I", i)
             for i in range(2000)], src),
        key_cols=["conv_id", "turn_idx"], op_col="op", seq_col="seq",
    )
    before = sorted((r.conv_id, r.turn_idx, r.text)
                    for r in t.read().collect())
    preds = _parse_prune_preds("turn_idx >= 1900")
    pre_files = [f for fl in t.snapshot().files.values() for f in fl]
    pre_kept = [f for f in pre_files if _file_may_match(f.get("stats"), preds)]
    assert len(pre_kept) == len(pre_files)  # unsorted: nothing prunable

    t.compact(sort_by=["turn_idx"], max_rows_per_file=200)
    snap = t.snapshot()
    assert snap.properties["clustered_by"] == "turn_idx"
    after = sorted((r.conv_id, r.turn_idx, r.text)
                   for r in t.read().collect())
    assert after == before  # layout-only

    for b, fl in snap.files.items():
        assert len(fl) >= 2  # split actually happened
        spans = sorted((f["stats"]["turn_idx"][0], f["stats"]["turn_idx"][1])
                       for f in fl)
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2  # range-disjoint files within the bucket

    post_files = [f for fl in snap.files.values() for f in fl]
    post_kept = [f for f in post_files if _file_may_match(f.get("stats"), preds)]
    assert len(post_kept) <= len(post_files) // 4  # selective now
    got = sorted((r.conv_id, r.turn_idx)
                 for r in t.read(where="turn_idx >= 1900").collect())
    want = sorted((r.conv_id, r.turn_idx)
                  for r in t.read().filter("turn_idx >= 1900").collect())
    assert got == want and len(got) == 100


def test_clustering_compact_folds_deltas_too(spark, tmp_path):
    """A clustering rewrite on a MoR snapshot folds the delta layers in the
    same pass (it is also a full compaction)."""
    t = _mk(spark, tmp_path)
    src = T.StructType(
        list(TRANSCRIPTS_SCHEMA_V1.fields)
        + [T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())]
    )
    t.apply_cdc_stats(
        spark.createDataFrame(
            [(f"c{i}", i, "user", f"m{i}", TS, "I", i) for i in range(100)], src),
        key_cols=["conv_id", "turn_idx"], op_col="op", seq_col="seq",
        write_mode="mor", compact_threshold=1000,
    )
    t.apply_cdc_stats(
        spark.createDataFrame(
            [("c5", 5, "user", "UPDATED", TS, "U", 999),
             ("c7", 7, "user", "m7", TS, "D", 1000)], src),
        key_cols=["conv_id", "turn_idx"], op_col="op", seq_col="seq",
        write_mode="mor", compact_threshold=1000,
    )
    assert t.snapshot().has_deltas()
    t.compact(sort_by=["turn_idx"], max_rows_per_file=30)
    snap = t.snapshot()
    assert not snap.has_deltas()
    rows = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert rows[("c5", 5)] == "UPDATED" and ("c7", 7) not in rows
    assert len(rows) == 99
