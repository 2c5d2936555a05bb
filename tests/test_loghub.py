"""loghub/datahub feed analogs: keyed shard append + cursor-window pull.

The writer emits the engine's own feed contract (epoch=K/shard=S layout +
_dsx_feed.json), so the strongest test is the full loop: events written
through loghubwriter are replayed by CdcEngine and must equal the
independent fold oracle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from datax_spark.sources.readers import build_reader
from datax_spark.sources.writers import build_writer

EVENT_SCHEMA = ("seq long, op string, conv_id string, turn_idx int, "
                "role string, text string, ts string")


def _events(spark):
    rows = []
    seq = 0
    for conv in range(40):
        for turn in range(5):
            rows.append((seq, "I", f"c{conv:03d}", turn, "user",
                         f"t{conv}-{turn}", "2024-01-01 00:00:00"))
            seq += 1
    # updates + deletes in a second wave
    for conv in range(0, 40, 4):
        rows.append((seq, "U", f"c{conv:03d}", 0, "user", "UPDATED",
                     "2024-02-01 00:00:00"))
        seq += 1
    for conv in range(0, 40, 8):
        rows.append((seq, "D", f"c{conv:03d}", 1, None, None, None))
        seq += 1
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_writer_emits_feed_contract(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ev = _events(spark)
    r0 = build_writer(ev.filter("op = 'I'"), "loghubwriter",
                      {"path": feed, "shards": 8})
    r1 = build_writer(ev.filter("op <> 'I'"), "loghubwriter",
                      {"path": feed, "shards": 8})
    assert (r0["epoch"], r1["epoch"]) == (0, 1)  # auto-incrementing cursor
    meta = json.load(open(os.path.join(feed, "_dsx_feed.json")))
    assert meta["shards_per_epoch"] == 8
    assert meta["shard_fn"].startswith("pmod(xxhash64(conv_id)")
    dirs = sorted(d for d in os.listdir(feed) if d.startswith("epoch="))
    assert dirs == ["epoch=0", "epoch=1"]


def test_reader_cursor_window_prunes_epochs(spark, tmp_path):
    feed = str(tmp_path / "feed")
    ev = _events(spark)
    build_writer(ev.filter("op = 'I'"), "loghubwriter",
                 {"path": feed, "shards": 4})
    build_writer(ev.filter("op <> 'I'"), "loghubwriter",
                 {"path": feed, "shards": 4})
    win = build_reader(spark, "loghubreader", {
        "path": feed, "beginEpoch": 1, "endEpoch": 2})
    assert win.count() == ev.filter("op <> 'I'").count()
    # epoch is a partition column — the window is partition-pruned
    plan = win._jdf.queryExecution().executedPlan().toString()
    assert "epoch" in plan
    allr = build_reader(spark, "datahubreader", {"path": feed})
    assert allr.count() == ev.count()


def test_engine_consumes_loghubwriter_feed(spark, tmp_path):
    from datax_spark.cdc.engine import CdcEngine, EngineConfig
    from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
    from datax_spark.lake.table import LakeTable

    feed = str(tmp_path / "feed")
    ev = _events(spark)
    build_writer(ev.filter("op = 'I'"), "loghubwriter",
                 {"path": feed, "shards": 8})
    build_writer(ev.filter("op <> 'I'"), "loghubwriter",
                 {"path": feed, "shards": 8})
    tbl = str(tmp_path / "tbl")
    # same modulus + key hash → the zero-shuffle aligned path activates
    LakeTable.create(spark, tbl, TRANSCRIPTS_SCHEMA_V1, "conv_id",
                     n_buckets=8)
    eng = CdcEngine(spark, EngineConfig(
        table_root=tbl, feed_dir=feed,
        checkpoint_dir=str(tmp_path / "ckpt")))
    eng.run()
    got = {(r.conv_id, r.turn_idx): r.text for r in eng.table.read().collect()}
    # independent fold
    want = {}
    for r in ev.orderBy("seq").collect():
        k = (r.conv_id, r.turn_idx)
        if r.op == "D":
            want.pop(k, None)
        else:
            want[k] = r.text
    assert got == want
    # lineage says the aligned path ran (feed shards == table buckets)
    commits = sorted(os.listdir(os.path.join(str(tmp_path / "ckpt"),
                                             "commits")))
    mode = json.load(open(os.path.join(str(tmp_path / "ckpt"), "commits",
                                       commits[0]))).get("mode")
    assert mode == "aligned"


def test_long_shard_key_aligns_with_table_buckets(spark, tmp_path):
    """xxhash64(5L) != xxhash64('5'): the writer must hash the STRING form
    like LakeTable's bucket fn, or a non-string key silently routes events
    to wrong buckets on the aligned path."""
    from datax_spark.lake.table import LakeTable  # noqa: F401

    feed = str(tmp_path / "feed")
    ev = spark.range(64).select(
        F.col("id").alias("seq"), F.lit("I").alias("op"),
        F.col("id").alias("conv_id"),  # LONG key
        F.lit(0).alias("turn_idx"), F.lit("u").alias("role"),
        F.lit("t").alias("text"),
        F.lit("2024-01-01").cast("timestamp").alias("ts"))
    build_writer(ev, "loghubwriter", {"path": feed, "shards": 8})
    got = spark.read.parquet(feed).select("conv_id", "shard")
    want = got.select(
        "conv_id",
        F.pmod(F.xxhash64(F.col("conv_id").cast("string")),
               F.lit(8)).alias("w"))
    bad = got.join(want, "conv_id").filter("shard <> w").count()
    assert bad == 0


def test_shard_count_drift_refused(spark, tmp_path):
    import pytest as _pytest

    feed = str(tmp_path / "feed")
    ev = _events(spark)
    build_writer(ev.filter("op = 'I'"), "loghubwriter",
                 {"path": feed, "shards": 8})
    with _pytest.raises(ValueError, match="shards_per_epoch"):
        build_writer(ev.filter("op <> 'I'"), "loghubwriter",
                     {"path": feed, "shards": 16})


def test_manifest_names_cast_hash_for_nonstring_key(spark, tmp_path):
    """The shard_fn string is load-bearing (the engine's aligned gate
    matches it) so it must name the hash actually applied: raw form for a
    string key, explicit cast form otherwise."""
    feed_s = str(tmp_path / "feed-str")
    ev = _events(spark)
    build_writer(ev, "loghubwriter", {"path": feed_s, "shards": 4})
    meta = json.load(open(os.path.join(feed_s, "_dsx_feed.json")))
    assert meta["shard_fn"] == "pmod(xxhash64(conv_id), shards_per_epoch)"

    feed_l = str(tmp_path / "feed-long")
    evl = spark.range(8).select(
        F.col("id").alias("seq"), F.lit("I").alias("op"),
        F.col("id").alias("conv_id"), F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"), F.lit("t").alias("text"),
        F.lit("2024-01-01").cast("timestamp").alias("ts"))
    build_writer(evl, "loghubwriter", {"path": feed_l, "shards": 4})
    meta = json.load(open(os.path.join(feed_l, "_dsx_feed.json")))
    assert meta["shard_fn"] == \
        "pmod(xxhash64(cast(conv_id as string)), shards_per_epoch)"


def test_hash_form_drift_refused(spark, tmp_path):
    """Appending epochs whose shard hash differs from the manifest's is
    refused — mixed hash forms would silently mis-route on the aligned
    path (e.g. a feed whose manifest predates the cast-to-string fix)."""
    import pytest as _pytest

    feed = str(tmp_path / "feed")
    ev = _events(spark)
    build_writer(ev.filter("op = 'I'"), "loghubwriter",
                 {"path": feed, "shards": 4})
    # simulate a stale manifest claiming a different hash form
    mpath = os.path.join(feed, "_dsx_feed.json")
    meta = json.load(open(mpath))
    meta["shard_fn"] = "pmod(xxhash64(cast(conv_id as string)), shards_per_epoch)"
    with open(mpath, "w") as f:
        json.dump(meta, f)
    with _pytest.raises(ValueError, match="hash forms"):
        build_writer(ev.filter("op <> 'I'"), "loghubwriter",
                     {"path": feed, "shards": 4})
