"""A harness that imports this repo via sys.path from a FOREIGN cwd (no
PYTHONPATH, not the repo root) must still be able to run the streaming
queries: Python workers don't inherit the driver's sys.path entries, and the
streaming source runner's files dir is a special-cased subdir — both are
closed by ``datax_spark.session.ensure_workers_can_import`` (addFile tree
+ streaming_job symlink; called from get_spark, the changelog source's
register, LakeTable init, and the ``queries()`` wrapper). This is exactly
the shape of an external correctness harness, so pin it cross-process.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})   # driver-side only, like an external harness
import __spark_entry__ as e
# deliberately NOT datax_spark.session.get_spark: the harness owns the session
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]").appName("foreign-cwd")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
n = qs["cdc_changelog_stream"](spark, {sf!r}).count()
assert n > 0, n
# a pure mapInPandas kernel path (no LakeTable touch): covered by the
# queries() chokepoint, not the LakeTable/register seams
m = qs["media_features"](spark, {sf!r}).count()
assert m > 0, m
print("FOREIGN_CWD_OK", n, m)
spark.stop()
"""


def test_streaming_query_from_foreign_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    script = tmp_path / "probe.py"
    script.write_text(SCRIPT.format(repo=REPO, sf="/root/testdata/sf0.001"))
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert "FOREIGN_CWD_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
