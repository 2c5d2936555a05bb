"""HBase REST wire connector tests: real HTTP over TCP against the local
gateway emulation — executors (separate worker processes) connect through
stdlib urllib exactly as they would against a production gateway."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.sources.hbase_gateway import HBaseGateway  # noqa: E402
from datax_spark.sources.hbase_rest import (  # noqa: E402
    decode_cell,
    encode_cell,
    hbase_read,
    hbase_write,
    split_ranges,
)

COLS_W = [
    {"name": "name", "hbase": "d:name", "type": "string"},
    {"name": "score", "hbase": "d:score", "type": "double"},
    {"name": "n", "hbase": "d:n", "type": "int", "encoding": "binary"},
    {"name": "ok", "hbase": "d:ok", "type": "boolean"},
]
COLS_R = [
    {"name": "rowkey", "type": "string"},
    {"name": "d:name", "type": "string"},
    {"name": "d:score", "type": "double"},
    {"name": "d:n", "type": "int", "encoding": "binary"},
    {"name": "d:ok", "type": "boolean"},
]


def _sample(spark, n=50):
    rows = [(f"user{i:04d}", f"name-{i}", i * 1.5, i, i % 2 == 0)
            for i in range(n)]
    return spark.createDataFrame(rows, ["id", "name", "score", "n", "ok"])


def test_roundtrip_typed(spark):
    with HBaseGateway() as gw:
        df = _sample(spark).repartition(3)
        stats = hbase_write(df, gw.url, "t1",
                            rowkey=[{"name": "id"}], columns=COLS_W,
                            batch_size=16)
        assert stats["rows"] == 50 and stats["batches"] >= 3
        got = hbase_read(spark, gw.url, "t1", COLS_R).collect()
        assert len(got) == 50
        by_key = {r["rowkey"]: r for r in got}
        assert by_key["user0007"]["d_name"] == "name-7"
        assert by_key["user0007"]["d_score"] == 10.5
        assert by_key["user0007"]["d_n"] == 7  # binary big-endian round trip
        assert by_key["user0006"]["d_ok"] is True
        assert by_key["user0007"]["d_ok"] is False


def test_region_split_and_window(spark):
    splits = {"t2": [b"user0020", b"user0035"]}  # 3 regions
    with HBaseGateway(region_splits=splits) as gw:
        hbase_write(_sample(spark), gw.url, "t2",
                    rowkey=[{"name": "id"}], columns=COLS_W)
        # full read crosses all 3 regions
        assert hbase_read(spark, gw.url, "t2", COLS_R).count() == 50
        # user window clipped into regions (doSplit parity): [0010, 0030)
        got = hbase_read(spark, gw.url, "t2", COLS_R,
                         start_rowkey="user0010",
                         end_rowkey="user0030").collect()
        keys = sorted(r["rowkey"] for r in got)
        assert keys[0] == "user0010" and keys[-1] == "user0029"
        assert len(keys) == 20


def test_split_ranges_unit():
    regions = [(b"", b"m"), (b"m", b"t"), (b"t", b"")]
    # window inside the middle region only
    assert split_ranges(regions, b"n", b"p") == [(b"n", b"p")]
    # open window = regions unchanged
    assert split_ranges(regions) == regions
    # start > end rejected (Hbase11xHelper.split:294-298)
    with pytest.raises(ValueError):
        split_ranges(regions, b"z", b"a")


def test_multiversion_read(spark):
    with HBaseGateway(max_versions=3) as gw:
        one = spark.createDataFrame([("k1", "v1", 0.0, 0, True)],
                                    ["id", "name", "score", "n", "ok"])
        two = spark.createDataFrame([("k1", "v2", 0.0, 0, True)],
                                    ["id", "name", "score", "n", "ok"])
        hbase_write(one, gw.url, "t3", rowkey=[{"name": "id"}],
                    columns=COLS_W[:1])
        hbase_write(two, gw.url, "t3", rowkey=[{"name": "id"}],
                    columns=COLS_W[:1])
        got = hbase_read(spark, gw.url, "t3",
                         [{"name": "rowkey", "type": "string"},
                          {"name": "d:name", "type": "string"}],
                         mode="multiversion", max_versions=3).collect()
        vals = [r["value"] for r in got]
        assert vals == ["v2", "v1"]  # newest first, one row per version
        # normal mode folds to newest
        norm = hbase_read(spark, gw.url, "t3",
                          [{"name": "rowkey", "type": "string"},
                           {"name": "d:name", "type": "string"}]).collect()
        assert len(norm) == 1 and norm[0]["d_name"] == "v2"


def test_writer_rowkey_constant_parts(spark):
    with HBaseGateway() as gw:
        df = spark.createDataFrame([("a", "x", 1.0, 1, True)],
                                   ["id", "name", "score", "n", "ok"])
        hbase_write(df, gw.url, "t4",
                    rowkey=[{"value": "pfx_"}, {"name": "id"},
                            {"value": "_sfx"}],
                    columns=COLS_W[:1])
        got = hbase_read(spark, gw.url, "t4",
                         [{"name": "rowkey", "type": "string"},
                          {"name": "d:name", "type": "string"}]).collect()
        assert got[0]["rowkey"] == "pfx_a_sfx"


def test_registry_jobspec_surface(spark):
    """DataX-job-JSON parity: the connector drives through the reader/writer
    registries (plans/jobspec.py plugin names), not just the direct API."""
    from datax_spark.sources.readers import build_reader
    from datax_spark.sources.writers import build_writer

    with HBaseGateway() as gw:
        stats = build_writer(_sample(spark, 30), "hbase11xwriter", {
            "gatewayUrl": gw.url, "table": "t5",
            "rowkeyColumn": [{"name": "id"}], "column": COLS_W,
        })
        assert stats["rows"] == 30
        got = build_reader(spark, "hbase11xreader", {
            "gatewayUrl": gw.url, "table": "t5", "column": COLS_R,
            "maxVersion": -1, "mode": "multiVersionFixedColumn",
        })
        assert got.count() >= 30 * 4  # one row per cell version (4 columns)
        norm = build_reader(spark, "hbase11xreader", {
            "gatewayUrl": gw.url, "table": "t5", "column": COLS_R,
        })
        assert norm.count() == 30


def test_cell_codec_roundtrip():
    for v, t, enc in [(42, "int", "binary"), (42, "int", "string"),
                      (-7, "long", "binary"), (3.25, "double", "binary"),
                      (3.25, "double", "string"), (True, "boolean", "string"),
                      (False, "boolean", "binary"), ("héllo", "string", "string"),
                      (b"\x00\xff", "binary", "string")]:
        assert decode_cell(encode_cell(v, t, enc), t, enc) == v
    assert decode_cell(b"", "int") is None


def test_string_cell_with_binary_encoding_is_utf8():
    """Bytes.toBytes(String) is UTF-8 under either encoding (review fix:
    previously KeyError for type string + encoding binary)."""
    assert decode_cell(encode_cell("héllo", "string", "binary"),
                       "string", "binary") == "héllo"
    assert decode_cell(encode_cell(True, "boolean", "binary"),
                       "boolean", "binary") is True
