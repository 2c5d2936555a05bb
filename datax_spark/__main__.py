"""CLI entry — parity with the reference's ``python datax.py job.json``
(Engine.main, core Engine.java:198-218):

    spark-submit --py-files datax_spark.zip -m datax_spark job.json
    python -m datax_spark job.json [--master local[8]] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import sys

from datax_spark.plans.jobspec import run_job_file
from datax_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="datax_spark", description="Run a DataX-shaped JSON job on Spark")
    ap.add_argument("job", help="path to job JSON")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)
    spark = get_spark(app_name=f"datax-spark:{args.job}", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    try:
        stats = run_job_file(spark, args.job)
        print(json.dumps(stats))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
