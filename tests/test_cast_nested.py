"""ColumnCast-parity format-chain casts and nested flatten (Mongo/OTS edge)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from datax_spark.transforms.cast import CastFormats, cast_columns, cast_expr, parse_timestamp_expr
from datax_spark.transforms.nested import explode_versions, flatten, parse_json
from datax_spark.transforms.registry import TRANSFORMS


@pytest.fixture()
def cast_df(spark):
    return spark.createDataFrame(
        [
            ("2024-03-01 10:00:00", "42", "3.5", "true"),
            ("2024-03-02", "x", "bad", "nope"),
            ("11:30:00", "-7", "2.25", "false"),
            ("01/04/2024", None, None, None),
        ],
        "when_str string, n_str string, d_str string, b_str string",
    )


def test_parse_timestamp_chain_order(cast_df):
    """datetime → date → time → extras, first success wins (ColumnCast.java:92-122)."""
    fmts = CastFormats(extra_formats=["dd/MM/yyyy"])
    out = cast_df.select(parse_timestamp_expr(F.col("when_str"), fmts).alias("ts")).collect()
    assert out[0].ts == datetime.datetime(2024, 3, 1, 10, 0, 0)
    assert out[1].ts == datetime.datetime(2024, 3, 2, 0, 0, 0)       # date format
    assert out[2].ts == datetime.datetime(1970, 1, 1, 11, 30, 0)     # time format
    assert out[3].ts == datetime.datetime(2024, 4, 1, 0, 0, 0)       # extra format


def test_try_cast_null_on_malformed_not_task_failure(cast_df):
    """Malformed cells become NULL (dirty channel), never ANSI task failures."""
    out = cast_columns(
        cast_df,
        [{"name": "n_str", "type": "long"}, {"name": "d_str", "type": "double"},
         {"name": "b_str", "type": "bool"}],
    ).collect()
    assert [r.n_str for r in out] == [42, None, -7, None]
    assert [r.d_str for r in out] == [3.5, None, 2.25, None]
    assert [r.b_str for r in out] == [True, None, False, None]


def test_cast_decimal_and_date(cast_df):
    out = cast_df.select(
        cast_expr(F.lit("1.23456789012345678"), "decimal").alias("dec"),
        cast_expr(F.col("when_str"), "date").alias("d"),
    ).collect()
    assert str(out[0].dec) == "1.234567890123456780"
    assert out[0].d == datetime.date(2024, 3, 1)
    assert out[1].d == datetime.date(2024, 3, 2)


def test_dx_cast_in_chain(cast_df):
    chain = TRANSFORMS["dx_cast"](
        [{"name": "when_str", "type": "timestamp"}], extraFormats=["dd/MM/yyyy"]
    )
    out = chain(cast_df).collect()
    assert out[3].when_str == datetime.datetime(2024, 4, 1, 0, 0, 0)
    assert out[0].when_str == datetime.datetime(2024, 3, 1, 10, 0, 0)


@pytest.fixture()
def nested_df(spark):
    return spark.createDataFrame(
        [
            (1, {"b": {"c": "deep1"}}, ["x", "y", "z"], {"env": "prod", "tier": "1"}),
            (2, {"b": {"c": None}}, [], {"env": "dev"}),
        ],
        "id int, a struct<b: struct<c: string>>, arr array<string>, tags map<string,string>",
    )


def test_flatten_dotted_path_and_array_join(nested_df):
    """MongoDBReader.java:125-160: dotted path navigation + array→delimited string."""
    out = flatten(
        nested_df, {"id": "id", "deep": "a.b.c", "joined": "arr", "env": "tags.env"}
    ).collect()
    assert out[0].deep == "deep1" and out[0].joined == "x,y,z" and out[0].env == "prod"
    assert out[1].deep is None and out[1].joined == "" and out[1].env == "dev"


def test_flatten_map_missing_key_is_null(nested_df):
    out = flatten(nested_df, {"tier": "tags.tier"}).collect()
    assert out[0].tier == "1" and out[1].tier is None


def test_dx_flatten_transform(nested_df):
    out = TRANSFORMS["dx_flatten"]({"deep": "a.b.c", "joined": "arr"}, arrayDelimiter="|")(
        nested_df
    ).collect()
    assert out[0].joined == "x|y|z"


def test_parse_json_document_ingest(spark):
    df = spark.createDataFrame(
        [(1, '{"user": {"name": "ada"}, "n": 3}'), (2, "not json")],
        "id int, raw string",
    )
    typed = parse_json(df, "raw", "user struct<name: string>, n int")
    out = flatten(typed, {"id": "id", "uname": "doc.user.name", "n": "doc.n"}).collect()
    assert out[0].uname == "ada" and out[0].n == 3
    assert out[1].uname is None  # malformed doc → NULL (dirty channel)


def test_explode_versions_multi_cell(spark):
    """hbase multi-version cell mode: one output row per version."""
    df = spark.createDataFrame(
        [("k1", [(100, "v1"), (200, "v2")]), ("k2", [(150, "w1")])],
        "rowkey string, versions array<struct<ts: long, value: string>>",
    )
    out = explode_versions(df, "versions")
    assert out.columns == ["rowkey", "ts", "value"]
    rows = sorted((r.rowkey, r.ts, r.value) for r in out.collect())
    assert rows == [("k1", 100, "v1"), ("k1", 200, "v2"), ("k2", 150, "w1")]
