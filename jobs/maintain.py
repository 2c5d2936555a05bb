"""spark-submit entry point for lake-table maintenance (the operational
procedures Iceberg exposes as stored procedures — rewrite_data_files,
expire_snapshots, schema evolution — and the reference leaves to sink-side
DBAs; DataX itself has no table to maintain).

    zip -r datax_spark.zip datax_spark
    spark-submit --py-files datax_spark.zip jobs/maintain.py \
        --table /data/transcripts compact [--buckets 0,1,2]
    ... maintain.py --table T rebucket --n-buckets 256
    ... maintain.py --table T vacuum [--keep-last 2]
    ... maintain.py --table T add-columns --columns "tool:string,score:double"
    ... maintain.py --table T drop-columns --columns tool
    ... maintain.py --table T history

Run off the ingest path: every action commits a new snapshot (or none, for
history); concurrent CDC applies rebase or conflict per the optimistic
commit rules in lake/table.py.
"""

from __future__ import annotations

import argparse
import json
import sys


def _fields(spec: str):
    from pyspark.sql import types as T

    out = []
    for part in spec.split(","):
        name, _, typ = part.partition(":")
        out.append(T.StructField(name.strip(), T._parse_datatype_string(typ.strip() or "string")))
    return out


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="maintain")
    ap.add_argument("--table", required=True)
    sub = ap.add_subparsers(dest="action", required=True)
    p = sub.add_parser("compact")
    p.add_argument("--buckets", default=None, help="comma-separated bucket ids (default: all with deltas)")
    p.add_argument("--sort-by", default=None,
                   help="comma-separated columns: clustering rewrite (sort + "
                        "range-disjoint files, selects ALL buckets)")
    p.add_argument("--max-rows-per-file", type=int, default=None)
    p = sub.add_parser("rebucket")
    p.add_argument("--n-buckets", type=int, required=True)
    p = sub.add_parser("vacuum")
    p.add_argument("--keep-last", type=int, default=2)
    p = sub.add_parser("add-columns")
    p.add_argument("--columns", required=True, help='"name:type,name:type"')
    p = sub.add_parser("drop-columns")
    p.add_argument("--columns", required=True, help="comma-separated names")
    sub.add_parser("history")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from datax_spark.lake.table import LakeTable

    existing = SparkSession.getActiveSession()
    spark = existing or SparkSession.builder.appName(f"dsx-maintain:{args.action}").getOrCreate()
    try:
        t = LakeTable(spark, args.table)
        if args.action == "compact":
            buckets = [int(b) for b in args.buckets.split(",")] if args.buckets else None
            snap = t.compact(
                buckets=buckets,
                sort_by=[c.strip() for c in args.sort_by.split(",")] if args.sort_by else None,
                max_rows_per_file=args.max_rows_per_file,
            )
            out = {"action": "compact", "version": snap.version,
                   "compacted_buckets": snap.properties.get("compacted_buckets", 0),
                   "clustered_by": snap.properties.get("clustered_by")}
        elif args.action == "rebucket":
            snap = t.rebucket(args.n_buckets)
            out = {"action": "rebucket", "version": snap.version, "n_buckets": snap.n_buckets}
        elif args.action == "vacuum":
            removed = t.vacuum(keep_last=args.keep_last)
            out = {"action": "vacuum", "data_files_removed": removed}
        elif args.action == "add-columns":
            snap = t.add_columns(_fields(args.columns))
            out = {"action": "add-columns", "version": snap.version,
                   "schema": [f.name for f in snap.schema.fields]}
        elif args.action == "drop-columns":
            snap = t.drop_columns([c.strip() for c in args.columns.split(",")])
            out = {"action": "drop-columns", "version": snap.version,
                   "schema": [f.name for f in snap.schema.fields]}
        else:
            out = {"action": "history", "history": t.history()}
        print(json.dumps(out))
        return 0
    finally:
        if existing is None:  # stop only a session this entry point created
            spark.stop()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
