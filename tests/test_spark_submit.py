"""End-to-end `spark-submit --py-files datax_spark.zip` packaging proof.

The north-star contract says the engine is "packaged for spark-submit
--py-files". This test builds the zip exactly as the jobs/ docstrings say,
then submits jobs/replay.py from a NEUTRAL working directory with a scrubbed
PYTHONPATH — the only way `import datax_spark` can succeed inside the driver
and executors is through the --py-files archive. A second submit against the
same checkpoint proves resume works across JVM boundaries (0 new epochs).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(dest: str) -> str:
    """zip -r datax_spark.zip datax_spark (sources only, no caches)."""
    path = os.path.join(dest, "datax_spark.zip")
    pkg = os.path.join(REPO, "datax_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py") or f.endswith(".txt"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def _submit(args: list[str], cwd: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("SPARK_LOCAL_DIRS", cwd)
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.driver.memory=4g",
         *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"spark-submit failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            return json.loads(line)
    raise AssertionError(f"no JSON summary in stdout:\n{r.stdout[-2000:]}")


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH")
def test_py_files_replay_and_cross_jvm_resume(tmp_path):
    zip_path = _build_zip(str(tmp_path))
    neutral = tmp_path / "cwd"
    neutral.mkdir()
    feed, table, ckpt = (str(tmp_path / d) for d in ("feed", "table", "ckpt"))

    base = ["--py-files", zip_path, os.path.join(REPO, "jobs", "replay.py"),
            "--feed", feed, "--table", table, "--ckpt", ckpt, "--buckets", "4"]

    summary = _submit(base + ["--gen-convs", "60", "--gen-epochs", "2"], str(neutral))
    assert summary["epochs_applied"] == 2, summary
    assert summary["events_applied"] > 0

    # fresh JVM, same checkpoint: nothing to re-apply, table state untouched
    again = _submit(base, str(neutral))
    assert again["epochs_applied"] == 0, again
    assert again["table_version"] == summary["table_version"]


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH")
def test_audit_follow_cross_jvm_resume(tmp_path):
    """The maintained-audit loop survives JVM boundaries: seed in one
    process, mutate the base from another replay, re-attach in a THIRD
    process and fold only the new window — then verify the maintained index
    equals a full recomputation."""
    zip_path = _build_zip(str(tmp_path))
    neutral = tmp_path / "cwd"
    neutral.mkdir()
    feed, table, ckpt = (str(tmp_path / d) for d in ("feed", "table", "ckpt"))
    feed2, ckpt2 = str(tmp_path / "feed2"), str(tmp_path / "ckpt2")
    index = str(tmp_path / "audit")

    replay = ["--py-files", zip_path, os.path.join(REPO, "jobs", "replay.py"),
              "--feed", feed, "--table", table, "--ckpt", ckpt,
              "--buckets", "4"]
    _submit(replay + ["--gen-convs", "60", "--gen-epochs", "2"], str(neutral))

    audit = ["--py-files", zip_path,
             os.path.join(REPO, "jobs", "audit_follow.py"),
             "--table", table, "--index", index, "--catch-up",
             "--max-cycles", "5"]
    s1 = _submit(audit, str(neutral))
    assert s1["created"] is True
    assert s1["index_rows"] > 0
    assert s1["consumed_version"] == s1["base_version"]

    # mutate the base from a fresh replay with a DIFFERENT feed (new seed +
    # 30 extra conversations — re-applying the identical feed is an
    # exactly-once no-op by design, so it would not advance the base)
    _submit(["--py-files", zip_path, os.path.join(REPO, "jobs", "replay.py"),
             "--feed", feed2, "--table", table, "--ckpt", ckpt2,
             "--buckets", "4", "--gen-convs", "90", "--gen-epochs", "2",
             "--gen-seed", "7"],
            str(neutral))

    # third JVM: re-attach, fold ONLY the new window, verify vs recompute
    s2 = _submit(audit + ["--verify"], str(neutral))
    assert s2["created"] is False
    assert s2["refreshes"] >= 1
    assert s2["base_version"] > s1["base_version"]
    assert s2["consumed_version"] == s2["base_version"]
    assert s2["verified"] is True
