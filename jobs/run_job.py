"""spark-submit entry point for DataX-shaped JSON jobs.

Usage (cluster):
    zip -r datax_spark.zip datax_spark
    spark-submit --py-files datax_spark.zip jobs/run_job.py path/to/job.json

On a cluster the session comes from spark-submit's conf (master, executors);
locally this falls back to the same tuned defaults as ``python -m datax_spark``.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: spark-submit --py-files datax_spark.zip jobs/run_job.py job.json",
              file=sys.stderr)
        return 2
    from datax_spark.plans.jobspec import run_job_file

    spark = SparkSession.builder.appName(f"datax-spark:{argv[0]}").getOrCreate()
    try:
        print(json.dumps(run_job_file(spark, argv[0])))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
