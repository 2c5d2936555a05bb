from __future__ import annotations

import os

import pytest

from datax_spark.plans import run_job
from datax_spark.plans.jobspec import JobErrorLimitExceeded

SF = "/root/testdata/sf0.001"


def test_parquet_to_csv_with_transforms(spark, tmp_path):
    out = str(tmp_path / "out_csv")
    job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "parquetreader",
                        "parameter": {
                            "path": f"{SF}/lineitem.parquet",
                            "columns": ["l_orderkey", "l_quantity", "l_returnflag"],
                            "where": "l_quantity > 10",
                        },
                    },
                    "transformer": [
                        {"name": "dx_digest", "parameter": {"column": "l_returnflag"}},
                    ],
                    "writer": {
                        "name": "csvwriter",
                        "parameter": {"path": out, "writeMode": "truncate", "header": True},
                    },
                }
            ]
        }
    }
    stats = run_job(spark, job)
    assert stats["contents"][0]["writer_result"]["mode"] == "overwrite"
    back = spark.read.option("header", True).csv(out)
    assert back.count() > 0
    assert set(back.columns) == {"l_orderkey", "l_quantity", "l_returnflag"}
    assert len(back.first().l_returnflag) == 32  # md5 applied


def test_streamreader_synthetic_to_parquet(spark, tmp_path):
    out = str(tmp_path / "synth")
    job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "streamreader",
                        "parameter": {
                            "sliceRecordCount": 500,
                            "column": [
                                {"name": "k", "random": "0,99", "type": "long"},
                                {"name": "tag", "value": "hello", "type": "string"},
                            ],
                        },
                    },
                    "writer": {"name": "parquetwriter", "parameter": {"path": out, "writeMode": "truncate"}},
                }
            ]
        }
    }
    run_job(spark, job)
    back = spark.read.parquet(out)
    assert back.count() == 500
    ks = [r.k for r in back.select("k").collect()]
    assert min(ks) >= 0 and max(ks) <= 99
    # deterministic: rerun produces identical data
    run_job(spark, {"job": {"content": [{
        "reader": {"name": "streamreader", "parameter": {
            "sliceRecordCount": 500,
            "column": [{"name": "k", "random": "0,99", "type": "long"},
                       {"name": "tag", "value": "hello", "type": "string"}]}},
        "writer": {"name": "parquetwriter", "parameter": {"path": str(tmp_path / "synth2"), "writeMode": "truncate"}},
    }]}})
    back2 = spark.read.parquet(str(tmp_path / "synth2"))
    assert back.exceptAll(back2).count() == 0


def test_lakewriter_upsert_job(spark, tmp_path):
    root = str(tmp_path / "lake")
    base_job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "parquetreader",
                        "parameter": {"path": f"{SF}/orders.parquet",
                                      "columns": ["o_orderkey", "o_orderstatus", "o_totalprice"]},
                    },
                    "writer": {
                        "name": "lakewriter",
                        "parameter": {"root": root, "writeMode": "append",
                                      "bucketKey": "o_orderkey", "buckets": 8},
                    },
                }
            ]
        }
    }
    run_job(spark, base_job)
    # upsert: re-write every row with a constant status via transform, merge on key
    upsert_job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "parquetreader",
                        "parameter": {"path": f"{SF}/orders.parquet",
                                      "columns": ["o_orderkey", "o_orderstatus", "o_totalprice"],
                                      "where": "o_orderkey <= 10"},
                    },
                    "transformer": [
                        {"name": "dx_map", "parameter": {"columns": [
                            {"name": "o_orderkey", "as": "o_orderkey"},
                            {"value": "X", "as": "o_orderstatus"},
                            {"name": "o_totalprice", "as": "o_totalprice"},
                        ]}},
                    ],
                    "writer": {
                        "name": "lakewriter",
                        "parameter": {"root": root, "writeMode": "upsert", "keyCols": ["o_orderkey"]},
                    },
                }
            ]
        }
    }
    run_job(spark, upsert_job)
    from datax_spark.lake.table import LakeTable

    t = LakeTable(spark, root)
    df = t.read()
    assert df.count() == spark.read.parquet(f"{SF}/orders.parquet").count()
    assert df.filter("o_orderkey <= 10 and o_orderstatus <> 'X'").count() == 0
    assert df.filter("o_orderkey > 10 and o_orderstatus = 'X'").count() == 0


def test_error_limit(spark, tmp_path):
    job = {
        "job": {
            "setting": {"errorLimit": {"percentage": 0.01}},
            "content": [
                {
                    "reader": {"name": "parquetreader",
                               "parameter": {"path": f"{SF}/lineitem.parquet"}},
                    "transformer": [
                        {"name": "dx_filter", "parameter": {"column": "l_quantity", "op": ">", "value": 1}},
                    ],
                    "writer": {"name": "parquetwriter",
                               "parameter": {"path": str(tmp_path / "x"), "writeMode": "truncate"}},
                }
            ],
        }
    }
    with pytest.raises(JobErrorLimitExceeded):
        run_job(spark, job)


def test_csv_roundtrip_options(spark, tmp_path):
    src = str(tmp_path / "in_csv")
    spark.createDataFrame([("a", 1), ("b", 2)], "name string, v int").write.option(
        "sep", ";"
    ).option("header", True).csv(src)
    job = {
        "job": {
            "content": [
                {
                    "reader": {"name": "csvreader",
                               "parameter": {"path": src, "fieldDelimiter": ";", "skipHeader": True}},
                    "writer": {"name": "streamwriter", "parameter": {"print": False}},
                }
            ]
        }
    }
    stats = run_job(spark, job)
    assert stats["contents"][0]["writer_result"]["shown"] == 2


def test_speed_record_cap_chunks_and_paces(spark, tmp_path):
    """setting.speed.record is ENFORCED: the content splits into >=N chunks
    and the measured rows/s stays at or under the cap (Channel.statPush:
    176-239 + adjustChannelNumber parity)."""
    out = str(tmp_path / "paced")
    job = {"job": {
        "setting": {"speed": {"record": 400, "channel": 2}},
        "content": [{
            "reader": {"name": "streamreader", "parameter": {
                "sliceRecordCount": 1000,
                "column": [{"name": "k", "random": "0,999999", "type": "long"}]}},
            "writer": {"name": "parquetwriter",
                       "parameter": {"path": out, "writeMode": "truncate"}},
        }],
    }}
    stats = run_job(spark, job)
    e = stats["contents"][0]
    assert e["speed_chunks"] >= 3          # 1000 rows / 400-per-sec cap
    assert e["rows_per_sec"] <= 400 * 1.05  # measured throughput clamped
    assert e["channels"] == 2
    assert spark.read.parquet(out).count() == 1000  # nothing lost to slicing


def test_speed_byte_cap(spark, tmp_path):
    out = str(tmp_path / "paced_b")
    job = {"job": {
        "setting": {"speed": {"byte": 4000}},
        "content": [{
            "reader": {"name": "streamreader", "parameter": {
                "sliceRecordCount": 600,
                "column": [{"name": "k", "random": "0,9", "type": "long"}]}},
            "writer": {"name": "parquetwriter",
                       "parameter": {"path": out, "writeMode": "truncate"}},
        }],
    }}
    stats = run_job(spark, job)
    e = stats["contents"][0]
    assert e["speed_chunks"] >= 2
    assert e["bytes_per_sec"] is not None and e["bytes_per_sec"] <= 4000 * 1.1
    assert spark.read.parquet(out).count() == 600


def test_job_pre_post_handlers(spark, tmp_path):
    """JobContainer.preHandle:312-345 / postHandle parity: callables (or
    'mod:fn' strings) run around the job; post sees the stats."""
    seen = {}
    job = {"job": {
        "setting": {
            "preHandler": lambda sp, j: seen.setdefault("pre", len(j["job"]["content"])),
            "postHandler": lambda sp, j, st: seen.setdefault("post", st["contents"][0]["writer_result"]["shown"]),
        },
        "content": [{
            "reader": {"name": "streamreader", "parameter": {
                "sliceRecordCount": 5,
                "column": [{"name": "k", "value": "v", "type": "string"}]}},
            "writer": {"name": "streamwriter", "parameter": {"print": False}},
        }],
    }}
    run_job(spark, job)
    assert seen == {"pre": 1, "post": 5}


def test_lakewriter_pre_post_sql_roundtrip(spark, tmp_path):
    """truncate-preSql → write → verify-postSql on the lake surface."""
    root = str(tmp_path / "lake_sql")
    src = str(tmp_path / "src_sql")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(src)

    def mk(write_mode, pre=None, post=None):
        return {"job": {"content": [{
            "reader": {"name": "parquetreader", "parameter": {"path": src}},
            "writer": {"name": "lakewriter", "parameter": {
                "root": root, "writeMode": write_mode, "bucketKey": "id",
                "buckets": 4, **({"preSql": pre} if pre else {}),
                **({"postSql": post} if post else {})}},
        }]}}

    run_job(spark, mk("append"))
    stats = run_job(spark, mk(
        "append",
        pre=["TRUNCATE TABLE lake_target"],
        post=["SELECT count(*) FROM lake_target"],
    ))
    wr = stats["contents"][0]["writer_result"]
    assert "truncated_at_version" in wr["preSql"][0]
    assert wr["postSql"][0]["rows"] == [[2]]  # truncated then re-written once


def test_csv_parse_quarantine(spark, tmp_path):
    """Malformed CSV rows quarantine to parquet with _dirty_reason and count
    against errorLimit, instead of being silently nulled (PERMISSIVE
    corrupt-record capture; ErrorRecordChecker parity)."""
    import os

    src = str(tmp_path / "bad.csv")
    with open(src, "w") as f:
        f.write("1,a\n2,b\nnot_an_int,c\n3\n4,d\n")
    qdir = str(tmp_path / "q")
    out = str(tmp_path / "clean")
    job = {"job": {
        "setting": {"errorLimit": {"record": 10}},
        "content": [{
            "reader": {"name": "csvreader", "parameter": {
                "path": src, "schema": "id int, name string",
                "quarantineDir": qdir}},
            "writer": {"name": "parquetwriter",
                       "parameter": {"path": out, "writeMode": "truncate"}},
        }],
    }}
    stats = run_job(spark, job)
    e = stats["contents"][0]
    assert e["parse_dirty_rows"] == 2  # bad int + short row
    q = spark.read.parquet(qdir)
    assert q.count() == 2 and set(q.columns) == {"_raw", "_dirty_reason"}
    clean = spark.read.parquet(out)
    assert clean.count() == 3 and "_corrupt_record" not in clean.columns
    # tight limit → abort
    job["job"]["setting"]["errorLimit"] = {"record": 1}
    with pytest.raises(JobErrorLimitExceeded):
        run_job(spark, job)


def test_seqfile_reader_roundtrip(spark, tmp_path):
    """SEQ format parity (hdfsreader HdfsReader.java:82-89): Text key/value
    SequenceFile -> delimited value split by the shared column-spec layer."""
    path = str(tmp_path / "seq")
    rows = [(f"k{i}", f"{i}\tname{i}\t{i * 1.5}") for i in range(100)]
    spark.sparkContext.parallelize(rows, 2).saveAsSequenceFile(path)
    from datax_spark.sources.readers import build_reader

    df = build_reader(spark, "seqfilereader", {
        "path": path,
        "fieldDelimiter": "\t",
        "column": [
            {"name": "id", "type": "int"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
        ],
        "where": "id >= 10",
    })
    assert df.columns == ["key", "id", "name", "score"]
    got = {r.id: (r.name, r.score) for r in df.collect()}
    assert len(got) == 90 and got[42] == ("name42", 63.0)
