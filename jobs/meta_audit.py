"""Metadata-scaling audit: manifest bytes written per small epoch on a
many-bucket table, segmented manifests vs the monolithic-equivalent (what a
legacy full-inventory snapshot of the same state would weigh).

This is the reproducer for the BASELINE.md round-4 numbers (the round-3
verdict's top scale risk: one monolithic snapshot JSON per commit, measured
1.6 MB at 4096 buckets, rewritten per commit and parsed per load).

Usage: python jobs/meta_audit.py [--buckets 4096] [--rows 300000]
Prints one `AUDIT {json}` line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, default=4096)
    ap.add_argument("--rows", type=int, default=300_000)
    ap.add_argument("--small-rows", type=int, default=10)
    args = ap.parse_args()

    from datax_spark import get_spark
    from datax_spark.lake.table import LakeTable, _snapshot_name
    import pyspark.sql.types as T

    base = "/dev/shm/dsx-meta-audit" if os.path.isdir("/dev/shm") \
        else "/tmp/dsx-meta-audit"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("v", T.LongType())])
    t = LakeTable.create(spark, f"{base}/t", schema, "k",
                         n_buckets=args.buckets)
    meta = os.path.join(t.root, "_meta")

    def inventory():
        return {n: os.path.getsize(os.path.join(meta, n))
                for n in os.listdir(meta)}

    seed = spark.range(args.rows).selectExpr(
        "concat('k', id) k", "id v", "id seq", "'I' op")
    t0 = time.time()
    t.apply_cdc_stats(seed, key_cols=["k"], op_col="op", seq_col="seq",
                      write_mode="mor")
    seed_s = time.time() - t0

    before = inventory()
    small = spark.range(args.small_rows).selectExpr(
        "concat('k', id*37) k", "id+1000000 v", "id+1000000 seq", "'U' op")
    t0 = time.time()
    t.apply_cdc_stats(small, key_cols=["k"], op_col="op", seq_col="seq",
                      write_mode="mor")
    small_s = time.time() - t0
    after = inventory()
    new = {n: s for n, s in after.items() if n not in before}
    manifest_b = sum(s for n, s in new.items() if n.startswith("m-"))
    snap_b = sum(s for n, s in new.items() if n.startswith("v"))
    mono_b = len(json.dumps(t.snapshot().to_json()))

    t0 = time.time()
    for _ in range(20):
        t.snapshot()
    load_ms = (time.time() - t0) / 20 * 1000

    print("AUDIT", json.dumps({
        "buckets": args.buckets,
        "seed_rows": args.rows,
        "seed_sec": round(seed_s, 1),
        "small_epoch_sec": round(small_s, 2),
        "small_epoch_meta_files": len(new),
        "small_epoch_manifest_bytes": manifest_b,
        "small_epoch_snapshot_bytes": snap_b,
        "small_epoch_meta_bytes": manifest_b + snap_b,
        "monolithic_equiv_bytes": mono_b,
        "reduction_x": round(mono_b / max(manifest_b + snap_b, 1), 1),
        "snapshot_load_ms": round(load_ms, 1),
    }))
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
