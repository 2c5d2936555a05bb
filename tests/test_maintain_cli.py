"""jobs/maintain.py: the spark-submit maintenance entry point, driven
in-process against a live MoR table (it reuses the active session)."""

from __future__ import annotations

import datetime as dt
import io
import contextlib
import json
import os
import sys

import pytest
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))
import maintain  # noqa: E402

TS = dt.datetime(2025, 1, 1)

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
])


def _run(*args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = maintain.main(list(args))
    assert rc == 0
    return json.loads(buf.getvalue())


def test_maintain_actions_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, "conv_id", n_buckets=4)
    t.append(spark.createDataFrame(
        [(f"c{i}", 0, f"m{i}") for i in range(10)], SCHEMA))
    src = T.StructType(list(SCHEMA.fields) + [
        T.StructField("op", T.StringType()), T.StructField("seq", T.LongType())])
    t.apply_cdc_stats(
        spark.createDataFrame([("c1", 0, "upd", "U", 5)], src),
        key_cols=["conv_id", "turn_idx"], op_col="op", seq_col="seq",
        write_mode="mor", compact_threshold=100,
    )
    assert t.snapshot().has_deltas()

    out = _run("--table", root, "compact")
    assert out["compacted_buckets"] >= 1
    assert not t.snapshot().has_deltas()

    out = _run("--table", root, "add-columns", "--columns", "tool:string, score:double")
    assert out["schema"][-2:] == ["tool", "score"]
    out = _run("--table", root, "drop-columns", "--columns", "score")
    assert "score" not in out["schema"]

    out = _run("--table", root, "rebucket", "--n-buckets", "6")
    assert out["n_buckets"] == 6

    out = _run("--table", root, "vacuum", "--keep-last", "1")
    assert out["data_files_removed"] > 0

    out = _run("--table", root, "history")
    assert out["history"][-1]["version"] == t.current_version()

    # the table survived the full maintenance pass with its data intact
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got["c1"] == "upd" and len(got) == 10
    # session still usable (maintain must not stop a session it didn't create)
    assert spark.range(1).count() == 1
