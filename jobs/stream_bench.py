"""Scale ladder for the event-time streaming layer (streaming/windowed.py,
streaming/dedup.py, streaming/stateful.py): the same three stream topologies
drained at two feed sizes (1x and 10x), reporting events/s at each and the
size-scaling ratio.

What each leg stresses at 10^10-event scale:

  windowed — watermarked tumbling-window aggregation in append mode. State
             is O(open windows x group keys), INDEPENDENT of feed length;
             per-event cost should be flat as the feed grows.
  dedup    — dropDuplicatesWithinWatermark keyed on the delivery id. State
             is O(ids inside the watermark horizon); this ladder runs the
             worst case (horizon covers the whole feed), so state grows
             with the feed and the ratio shows what an over-wide horizon
             costs — the reason the module docstring says to size delay to
             the transport's redelivery window, not the feed length.
  sessions — applyInPandasWithState per-conversation tracker. State is
             O(live conversations); conv count scales with the feed here,
             so this bounds the per-conv state-update overhead.

Feed: synthetic events in K equal commits to a lake table (spark.range —
no driver-side data), drained through the changelog source one commit per
micro-batch, parquet sinks on tmpfs (nothing large lands on the driver).

Usage:  python jobs/stream_bench.py [--events 2000000] [--commits 4]
                                    [--mult 10] [--legs windowed,dedup,sessions]
Writes: BENCH_STREAM.json (repo root).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_feed(spark, root: str, n_events: int, n_commits: int, n_convs: int):
    """n_commits equal appends of synthetic change events; ts mostly ordered
    across commits with a deterministic late-straggler slice (id % 97)."""
    from pyspark.sql import functions as F

    from datax_spark.lake.table import LakeTable

    per = n_events // n_commits  # actual feed size = per * n_commits
    schema = None
    t = None
    for c in range(n_commits):
        ev = (
            spark.range(per)
            .select(
                (F.col("id") + c * per).alias("event_id"),
                F.concat(F.lit("c"), ((F.col("id") + c * per) % n_convs)
                         .cast("string")).alias("conv_id"),
                ((F.col("id") + c * per) % 50).alias("turn_idx"),
                F.when((F.col("id") % 20) == 0, "D").otherwise("U").alias("op"),
                (F.rand(seed=c) * 100).alias("value"),
                # commit c covers hour-range [c*24, (c+1)*24) with %97
                # stragglers reaching back one commit-range
                F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("t0"),
            )
            .withColumn(
                "ts",
                F.col("t0") + F.make_interval(
                    secs=(F.col("event_id") % (24 * 3600))
                    + F.lit(c * 24 * 3600)
                    - F.when((F.col("event_id") % 97) == 0,
                             F.lit(24 * 3600)).otherwise(F.lit(0)),
                ),
            )
            .drop("t0")
        )
        if t is None:
            schema = ev.schema
            t = LakeTable.create(spark, root, schema, bucket_key="conv_id",
                                 n_buckets=16)
        t.append(ev)
    return t


def run_leg(spark, leg: str, root: str, work: str, n_events: int) -> dict:
    from pyspark.sql import functions as F

    from datax_spark.streaming.changelog import read_changelog_stream
    from datax_spark.streaming.dedup import dedup_stream
    from datax_spark.streaming.stateful import conversation_sessions
    from datax_spark.streaming.windowed import windowed_rollup

    sdf = read_changelog_stream(spark, root, starting_version=0,
                                max_versions_per_trigger=1)
    if leg == "windowed":
        out = windowed_rollup(
            sdf, ts_col="ts", window="1 hour", delay="30 minutes",
            keys=["op"], aggs={"n": F.count(F.lit(1)),
                               "sum_value": F.sum("value")})
        mode = "append"
    elif leg == "dedup":
        out = dedup_stream(sdf, id_cols=("event_id",), ts_col="ts",
                           delay="30 days")  # horizon >> feed: worst case
        mode = "append"
    elif leg == "sessions":
        out = conversation_sessions(sdf)
        mode = "update"
    else:
        raise ValueError(leg)

    sink = os.path.join(work, f"sink-{leg}")
    ckpt = os.path.join(work, f"ckpt-{leg}")
    from datax_spark.streaming.util import drain_query

    if mode == "append":
        w = (out.writeStream.format("parquet").outputMode(mode)
             .option("path", sink))
    else:
        # parquet sink rejects update mode; land each batch's update rows
        # as an append through foreachBatch (same executor-side write path)
        w = (out.writeStream.outputMode(mode).foreachBatch(
            lambda df, _bid: df.write.mode("append").parquet(sink)))
    q = w.option("checkpointLocation", ckpt).start()
    t0 = time.time()
    drain_query(q)
    dt = time.time() - t0
    out_rows = spark.read.parquet(sink).count()
    return {
        "drain_sec": round(dt, 2),
        "events_per_sec": round(n_events / dt, 1),
        "output_rows": out_rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--commits", type=int, default=4)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--legs", default="windowed,dedup,sessions")
    ap.add_argument("--state-store", choices=("rocksdb", "hdfs"),
                    default="rocksdb",
                    help="rocksdb (default) is the at-scale choice: dedup "
                         "state = one entry per delivery id in the horizon, "
                         "which overflows an in-JVM map long before it "
                         "troubles RocksDB (the 10x leg OOMed a 8g heap "
                         "with the hdfs provider at 20M ids)")
    args = ap.parse_args()

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    os.environ.setdefault("SPARK_LOCAL_DIRS",
                          f"{base}/dsx-stream-local-{os.getpid()}")

    from bench import host_probe
    from datax_spark.session import get_spark

    extra = {}
    if args.state_store == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    spark = get_spark(app_name="datax-stream-bench", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    work = f"{base}/dsx-stream-{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    result = {
        "events_1x": args.events, "mult": args.mult,
        "commits": args.commits,
        "host_bw_gbps_4proc_pre": host_probe(),
        "cores": spark.sparkContext.defaultParallelism,
        "legs": {},
    }
    try:
        for scale, n in (("1x", args.events), (f"{args.mult}x",
                                               args.events * args.mult)):
            root = os.path.join(work, f"table-{scale}")
            # conv count scales with the feed (state growth is the point)
            # but at 200 events/conv — the pandas state fn is invoked once
            # per (conv, batch), so this also bounds group-call overhead
            # actual feed size after integer division into equal commits —
            # the throughput denominator must count events actually drained
            actual = (n // args.commits) * args.commits
            build_feed(spark, root, actual, args.commits,
                       n_convs=max(actual // 200, 1))
            for leg in args.legs.split(","):
                r = run_leg(spark, leg, root, work + f"/{scale}", actual)
                result["legs"].setdefault(leg, {})[scale] = r
                print(leg, scale, r, flush=True)
        for leg, pts in result["legs"].items():
            a = pts["1x"]["events_per_sec"]
            b = pts[f"{args.mult}x"]["events_per_sec"]
            pts["throughput_ratio_10x_over_1x"] = round(b / a, 3)
        result["host_bw_gbps_4proc_post"] = host_probe()
        with open(os.path.join(REPO, "BENCH_STREAM.json"), "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(json.dumps({k: v for k, v in result.items() if k != "legs"}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
