"""spark-submit entry point for the changelog-maintained transcript audit
(cdc/audit.py GroupedRecomputeIndex): tail the base table's commits and keep
one validate_transcripts row per conversation fresh at O(changed
conversations) per refresh — the post-ingest integrity signal running as a
first-class follower job next to jobs/replay.py.

    zip -r datax_spark.zip datax_spark
    spark-submit --py-files datax_spark.zip jobs/audit_follow.py \
        --table /data/transcripts --index /data/transcripts_audit \
        [--poll 5] [--max-cycles N] [--catch-up] [--verify]

First run seeds the index from the base's current version (the one O(table)
pass); later runs re-attach and fold only new commit windows. The index
table's own commits carry the consumed-version watermark, so kill/restart at
any point resumes exactly (same shape as the replay engine's checkpoint).
Per refresh a JSON metrics line is printed: window, groups touched, fetch
mode (keyed point lookups under the cap, semi-join scan past it), duration,
and remaining version lag. ``--catch-up`` exits once lag is 0 (batch mode);
``--verify`` then cross-checks the maintained index against a full
recomputation of the audit — the maintained-view correctness oracle.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="audit_follow")
    ap.add_argument("--table", required=True, help="base transcripts table")
    ap.add_argument("--index", required=True, help="audit index table root")
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument("--max-cycles", type=int, default=None)
    ap.add_argument("--catch-up", action="store_true",
                    help="exit once the index has folded every base commit")
    ap.add_argument("--max-point-keys", type=int, default=100_000)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--verify", action="store_true",
                    help="after catch-up, assert index == full recompute")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from datax_spark.cdc.audit import (
        GroupedRecomputeIndex,
        transcript_audit_index,
    )
    from datax_spark.lake.table import LakeTable
    from datax_spark.ops.transcripts import validate_transcripts

    spark = SparkSession.builder.appName("datax-spark:audit-follow").getOrCreate()
    try:
        base = LakeTable(spark, args.table)
        created = not LakeTable.exists(args.index)
        if created:
            idx = transcript_audit_index(
                base, args.index, n_buckets=args.n_buckets,
                max_point_keys=args.max_point_keys)
        else:
            idx = GroupedRecomputeIndex.open(
                base, args.index, lambda df: validate_transcripts(df))

        refreshes = 0
        cycles = 0
        while args.max_cycles is None or cycles < args.max_cycles:
            cycles += 1
            t0 = time.time()
            r = idx.refresh()
            lag = (base.current_version() or 0) - r["to"]
            print(json.dumps({
                "kind": "audit_refresh", **r,
                "duration_s": round(time.time() - t0, 3),
                "lag_versions": lag,
            }))
            if r["to"] > r["from"]:
                refreshes += 1
            if args.catch_up and lag <= 0:
                break
            if r["to"] == r["from"] and not args.catch_up:
                time.sleep(args.poll)

        verified = None
        if args.verify:
            full = validate_transcripts(base.read())
            got = idx.read().select(*full.columns)
            extra = got.exceptAll(full).count()
            missing = full.exceptAll(got).count()
            verified = extra == 0 and missing == 0
            if not verified:
                print(json.dumps({"kind": "verify_mismatch",
                                  "extra": extra, "missing": missing}))
                return 2
        summary = {
            "created": created,
            "refreshes": refreshes,
            "consumed_version": idx.consumed_version(),
            "base_version": base.current_version(),
            "index_rows": idx.read().count(),
            "verified": verified,
        }
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
