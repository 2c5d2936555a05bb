"""Streaming feed dedup (streaming/dedup.py): first-wins within and across
micro-batches, and the watermark bound — a duplicate inside the horizon is
guaranteed dropped, one delivered after eviction re-emits (the documented
two-tier contract: the engine's keyed fold is the authoritative layer).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable
from datax_spark.streaming.changelog import read_changelog_stream
from datax_spark.streaming.dedup import dedup_stream

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("payload", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

D = dt.datetime


def _drain(spark, root, delay):
    from datax_spark.streaming.util import drain_to_memory

    sdf = read_changelog_stream(spark, root, starting_version=0,
                                max_versions_per_trigger=1)
    out = dedup_stream(sdf, id_cols=("event_id",), ts_col="ts", delay=delay)
    name = drain_to_memory(out)
    return sorted((r.event_id, r.payload) for r in
                  spark.table(name).select("event_id", "payload").collect())


def test_first_wins_within_and_across_batches(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         bucket_key="event_id", n_buckets=2)
    ts = D(2024, 1, 1, 10, 0, 0)
    # v1: original + an in-batch duplicate of id 1
    t.append(spark.createDataFrame(
        [(1, "first", ts), (1, "in-batch-dupe", ts), (2, "two", ts)], SCHEMA))
    # v2: cross-batch redelivery of both
    t.append(spark.createDataFrame(
        [(1, "redelivered", ts), (2, "redelivered", ts), (3, "three", ts)], SCHEMA))
    got = _drain(spark, t.root, delay="365 days")
    assert got == [(1, "first"), (2, "two"), (3, "three")]


def test_eviction_bound_reemits_after_horizon(spark, tmp_path):
    """The honest edge of the contract: push the watermark past an entry's
    horizon, then redeliver — the duplicate re-emits (state was evicted).
    Downstream the engine's (key, seq) fold absorbs it; here we pin the
    behavior so the delay-sizing rule in the module docstring stays true."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         bucket_key="event_id", n_buckets=2)
    t.append(spark.createDataFrame([(1, "first", D(2024, 1, 1, 10, 0, 0))], SCHEMA))
    # advance watermark far past 10:00 + 1h horizon
    t.append(spark.createDataFrame([(2, "late-mark", D(2024, 6, 1))], SCHEMA))
    # spacer batch so the eviction watermark (which lags one batch for
    # filtering) is in force, then redeliver id 1
    t.append(spark.createDataFrame([(3, "spacer", D(2024, 6, 1))], SCHEMA))
    t.append(spark.createDataFrame([(1, "redelivered", D(2024, 6, 1, 0, 0, 1))], SCHEMA))
    got = _drain(spark, t.root, delay="1 hour")
    assert (1, "first") in got and (2, "late-mark") in got and (3, "spacer") in got
    # the post-eviction redelivery passes through again
    assert (1, "redelivered") in got
