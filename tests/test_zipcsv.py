"""ZIP-compressed CSV reading (the reference's ``compress: zip`` option,
ZipCycleInputStream walking all archive members)."""

from __future__ import annotations

import os
import zipfile

import pytest

from datax_spark.plans.jobspec import run_job
from datax_spark.sources.readers import build_reader

SCHEMA = "id long, name string, score double"


def _mk_zip(path: str, members: dict[str, str]) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for name, text in members.items():
            z.writestr(name, text)


@pytest.fixture()
def zdir(tmp_path):
    d = tmp_path / "zips"
    d.mkdir()
    _mk_zip(
        str(d / "a.zip"),
        {
            "part1.csv": "1,alice,0.5\n2,bob,\\N\n",
            "sub/part2.csv": "3,carol,2.25\n",
        },
    )
    _mk_zip(str(d / "b.zip"), {"only.csv": "4,dave,9.0\nBADLINE-not-enough-fields\n"})
    return str(d)


def test_zip_members_all_read_with_types(spark, zdir):
    df = build_reader(
        spark, "csvreader",
        {"path": os.path.join(zdir, "*.zip"), "compress": "zip", "schema": SCHEMA},
    )
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    # malformed line dropped (DROPMALFORMED) without quarantineDir
    assert rows == {1: ("alice", 0.5), 2: ("bob", None), 3: ("carol", 2.25),
                    4: ("dave", 9.0)}
    assert dict(df.dtypes)["score"] == "double"


def test_zip_corrupt_capture_and_pushdown(spark, zdir):
    df = build_reader(
        spark, "csvreader",
        {"path": os.path.join(zdir, "*.zip"), "compress": "zip", "schema": SCHEMA,
         "quarantineDir": "/tmp/unused-marker", "where": "id IS NULL OR id > 2",
         "columns": ["id", "name", "_corrupt_record"]},
    )
    out = df.collect()
    good = {r.id for r in out if r._corrupt_record is None}
    bad = [r._corrupt_record for r in out if r._corrupt_record is not None]
    assert good == {3, 4}
    assert bad == ["BADLINE-not-enough-fields"]


def test_zip_skip_header_and_delimiter(spark, tmp_path):
    d = tmp_path / "z2"
    d.mkdir()
    _mk_zip(str(d / "h.zip"), {"m.csv": "id|name|score\n7|erin|1.5\n"})
    df = build_reader(
        spark, "csvreader",
        {"path": str(d / "h.zip"), "compress": "zip", "schema": SCHEMA,
         "fieldDelimiter": "|", "skipHeader": True},
    )
    assert [(r.id, r.name, r.score) for r in df.collect()] == [(7, "erin", 1.5)]


def test_zip_through_run_job_quarantines(spark, zdir, tmp_path):
    qdir = str(tmp_path / "quarantine")
    out = str(tmp_path / "out")
    job = {
        "job": {
            "content": [{
                "reader": {"name": "csvreader", "parameter": {
                    "path": os.path.join(zdir, "*.zip"), "compress": "zip",
                    "schema": SCHEMA, "quarantineDir": qdir,
                }},
                "writer": {"name": "parquetwriter", "parameter": {"path": out}},
            }],
            "setting": {"errorLimit": {"record": 5}},
        }
    }
    stats = run_job(spark, job)
    assert spark.read.parquet(out).count() == 4
    q = spark.read.parquet(qdir)
    assert q.count() == 1
    assert stats["contents"][0]["parse_dirty_rows"] == 1
