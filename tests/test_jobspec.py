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
