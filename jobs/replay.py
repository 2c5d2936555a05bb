"""spark-submit entry point for a CDC feed replay into the lake table.

    zip -r datax_spark.zip datax_spark
    spark-submit --py-files datax_spark.zip jobs/replay.py \
        --feed /data/feed --table /data/transcripts --ckpt /data/ckpt \
        [--buckets 64] [--gen-convs 100000 --gen-epochs 4]   # synth feed

Resumable: re-running skips committed epochs via the checkpoint manifests.
On a cluster the session (master, executors, memory) comes from spark-submit
conf; locally it falls back to local[*].
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="replay")
    ap.add_argument("--feed", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--gen-convs", type=int, default=None,
                    help="generate a synthetic feed of N conversations first")
    ap.add_argument("--gen-epochs", type=int, default=4)
    ap.add_argument("--gen-seed", type=int, default=42,
                    help="generator seed — vary to produce a DIFFERENT feed "
                         "against the same table (same feed re-applied is an "
                         "exactly-once no-op by design)")
    ap.add_argument("--write-mode", choices=("mor", "cow"), default="mor")
    ap.add_argument("--compact-threshold", type=int, default=8)
    ap.add_argument("--error-limit-fraction", type=float, default=None)
    ap.add_argument("--vacuum-keep-last", type=int, default=None)
    ap.add_argument("--streaming", action="store_true",
                    help="tail via Structured Streaming (availableNow) instead "
                         "of the batch epoch loop")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from datax_spark.cdc.engine import CdcEngine, EngineConfig
    from datax_spark.cdc.schema import TRANSCRIPTS_SCHEMA_V1
    from datax_spark.lake.table import LakeTable

    spark = SparkSession.builder.appName("datax-spark:replay").getOrCreate()
    try:
        if args.gen_convs:
            from datax_spark.cdc.generator import ChangeFeedSpec, generate_change_feed

            spec = ChangeFeedSpec(
                seed=args.gen_seed, n_convs=args.gen_convs,
                n_epochs=args.gen_epochs,
                evolve_frac=0.5, shards_per_epoch=args.buckets,
            )
            generate_change_feed(spark, args.feed, spec)
        if not LakeTable.exists(args.table):
            LakeTable.create(spark, args.table, TRANSCRIPTS_SCHEMA_V1,
                             bucket_key="conv_id", n_buckets=args.buckets)
        cfg = EngineConfig(
            table_root=args.table, feed_dir=args.feed, checkpoint_dir=args.ckpt,
            write_mode=args.write_mode, compact_threshold=args.compact_threshold,
            error_limit_fraction=args.error_limit_fraction,
            vacuum_keep_last=args.vacuum_keep_last,
        )
        if args.streaming:
            from datax_spark.streaming.feed import StreamingCdcEngine

            summary = StreamingCdcEngine(spark, cfg).run_available_now()
        else:
            summary = CdcEngine(spark, cfg).run()
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
