"""Time-series range reader (sources/tsdb.py) — tsdbreader parity.

The reference tiles (time-slice x metric) tasks over an HTTP TSDB
(``TSDBReader.java:163-270``); here the split arithmetic is kept as a plan
artifact and the data path is predicate pushdown. Tests pin the tiling
property (exact cover, no overlap), both output shapes, and that the
filters actually reach the parquet scan (PushedFilters).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from datax_spark.sources.tsdb import series_read, split_plan

T0 = dt.datetime(2024, 1, 1)


def _series_df(spark):
    rows = [
        ("cpu", T0 + dt.timedelta(minutes=m), "h1" if m % 2 else "h2",
         "z1", float(m))
        for m in range(60)
    ] + [
        ("mem", T0 + dt.timedelta(minutes=m), "h1", "z2", 100.0 + m)
        for m in range(60)
    ]
    return spark.createDataFrame(
        rows, "metric string, ts timestamp, host string, zone string, value double")


# ------------------------------------------------------------- split_plan

def test_split_plan_tiles_exactly():
    tasks = split_plan(0, 10_000, 3_000, ["cpu"])
    spans = [(t["start"], t["end"]) for t in tasks]
    assert spans == [(0, 3000), (3000, 6000), (6000, 9000), (9000, 10000)]
    # half-open, contiguous, exact cover
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2
    assert spans[0][0] == 0 and spans[-1][1] == 10_000


def test_split_plan_crosses_metrics():
    tasks = split_plan(0, 6_000, 3_000, ["cpu", "mem"])
    assert len(tasks) == 4  # 2 slices x 2 metrics
    assert {t["metrics"][0] for t in tasks} == {"cpu", "mem"}
    combined = split_plan(0, 6_000, 3_000, ["cpu", "mem"], combine=True)
    assert len(combined) == 2 and combined[0]["metrics"] == ["cpu", "mem"]


def test_split_plan_validates():
    with pytest.raises(ValueError, match="splitIntervalMs"):
        split_plan(0, 10, 0, ["cpu"])
    with pytest.raises(ValueError, match="empty window"):
        split_plan(10, 10, 5, ["cpu"])
    with pytest.raises(ValueError, match="metric"):
        split_plan(0, 10, 5, [])


# ------------------------------------------------------------ series_read

def test_rdb_output_filters_and_shape(spark):
    df = _series_df(spark)
    out = series_read(
        df, ["cpu"], begin=T0 + dt.timedelta(minutes=10),
        end=T0 + dt.timedelta(minutes=20), tags={"host": "h1"},
        tag_cols=["host", "zone"],
    )
    rows = out.collect()
    assert out.columns == ["metric", "timestamp", "host", "zone", "value"]
    # odd minutes 11..19 on h1 → 5 rows, half-open upper bound
    assert [r.value for r in sorted(rows, key=lambda r: r.timestamp)] == \
        [11.0, 13.0, 15.0, 17.0, 19.0]
    assert all(r.metric == "cpu" and r.host == "h1" for r in rows)


def test_tsdb_output_is_datapoint_json(spark):
    df = _series_df(spark)
    out = series_read(df, ["mem"], end=T0 + dt.timedelta(minutes=2),
                      output="tsdb", tag_cols=["host", "zone"])
    points = [json.loads(r.datapoint) for r in out.collect()]
    assert len(points) == 2
    p = sorted(points, key=lambda p: p["timestamp"])[0]
    assert p["metric"] == "mem" and p["value"] == 100.0
    assert p["tags"] == {"host": "h1", "zone": "z2"}
    assert p["timestamp"] == int(T0.timestamp() * 1000)


def test_tsdb_output_rejects_reserved_tag_names(spark):
    df = _series_df(spark).withColumnRenamed("host", "value2")
    with pytest.raises(ValueError, match="output must be|collide"):
        series_read(_series_df(spark), ["cpu"], output="tsdb",
                    tag_cols=["metric"])


def test_filters_push_to_parquet_scan(spark, tmp_path):
    p = str(tmp_path / "series")
    _series_df(spark).write.parquet(p)
    out = series_read(spark.read.parquet(p), ["cpu"],
                      begin=T0 + dt.timedelta(minutes=30),
                      tags={"zone": "z1"}, tag_cols=["host"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    for col in ("metric", "ts", "zone"):
        assert col in plan.split("PushedFilters")[1][:400], col
    assert out.count() == 30  # cpu minutes 30..59, all in zone z1


# ------------------------------------------------------------- tsdbwriter

def test_tsdb_put_writer_payloads(spark, tmp_path):
    """tsdbwriter parity: rows ship as OpenTSDB /api/put JSON arrays of
    DataPoint4TSDB {timestamp, metric, tags, value}, batched."""
    import glob
    import json

    from datax_spark.sources.writers import build_writer
    from pyspark.sql import functions as F

    spool = str(tmp_path / "tsdb")
    df = (_series_df(spark)
          .withColumn("epoch", F.unix_timestamp("ts"))
          .coalesce(1))
    stats = build_writer(df, "tsdbwriter", {
        "metricCol": "metric", "tsCol": "epoch", "valueCol": "value",
        "tagCols": ["host", "zone"], "batchSize": 50,
        "endpointDir": spool, "maxTasks": 1,
    })
    assert stats["rows"] == 120 and stats["batches"] == 3  # ceil(120/50)
    dps = []
    for f in sorted(glob.glob(spool + "/*")):
        dps.extend(json.loads(open(f).read()))
    assert len(dps) == 120
    cpu = [d for d in dps if d["metric"] == "cpu"]
    assert len(cpu) == 60
    d0 = min(cpu, key=lambda d: d["timestamp"])
    assert set(d0["tags"]) == {"host", "zone"}
    assert d0["tags"]["zone"] == "z1" and isinstance(d0["timestamp"], int)
    assert d0["value"] == 0.0


def test_tsdb_writer_metric_defaults_without_metric_col(spark, tmp_path):
    """No metric/metricCol in the jobspec: datapoints fall back to the index
    default instead of metric=null (review fix)."""
    import glob
    import json

    from datax_spark.sources.writers import build_writer
    from pyspark.sql import functions as F

    spool = str(tmp_path / "tsdb2")
    df = (_series_df(spark).withColumn("epoch", F.unix_timestamp("ts"))
          .limit(5).coalesce(1))
    build_writer(df, "tsdbwriter", {
        "tsCol": "epoch", "valueCol": "value", "endpointDir": spool,
    })
    dps = []
    for f in sorted(glob.glob(spool + "/*")):
        dps.extend(json.loads(open(f).read()))
    assert dps and all(d["metric"] == "metric" for d in dps)
