from __future__ import annotations

import pytest

from datax_spark.transforms import apply_transform_chain
from datax_spark.transforms.registry import TRANSFORMS


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [("alpha", 5, "2024-03-01 10:00:00"), ("bravo", 15, "2024-03-02 11:30:00"),
         (None, 25, "2024-03-03 12:45:00")],
        "name string, qty int, when_str string",
    )


def test_dx_substr(df):
    out = TRANSFORMS["dx_substr"]("name", 1, 3)(df).collect()
    assert [r.name for r in out] == ["lph", "rav", None]  # null passthrough


def test_dx_substr_positional(df):
    out = TRANSFORMS["dx_substr"](0, 0, 2)(df).collect()
    assert out[0].name == "al"


def test_dx_pad(df):
    out = TRANSFORMS["dx_pad"]("name", "l", 8, "*")(df).collect()
    assert out[0].name == "***alpha"
    trunc = TRANSFORMS["dx_pad"]("name", "r", 3, "*")(df).collect()
    assert trunc[0].name == "alp"  # pad-or-truncate


def test_dx_replace(df):
    out = TRANSFORMS["dx_replace"]("name", 1, 3, "XY")(df).collect()
    assert out[0].name == "aXYa"
    assert out[2].name is None


def test_dx_filter_numeric_and_regex(df):
    # drop rows where qty > 10
    out = TRANSFORMS["dx_filter"]("qty", ">", 10)(df).collect()
    assert [r.qty for r in out] == [5]
    # java-regex full match semantics: 'al.*' matches 'alpha' fully → dropped
    out2 = TRANSFORMS["dx_filter"]("name", "like", "al.*")(df).collect()
    assert sorted(r.qty for r in out2) == [15, 25]  # null name kept (no match)


def test_dx_digest(df):
    import hashlib

    out = TRANSFORMS["dx_digest"]("name", "md5", "lower")(df).collect()
    assert out[0].name == hashlib.md5(b"alpha").hexdigest()


def test_dx_map_projection_constant_cast(df):
    chain = [
        {
            "name": "dx_map",
            "parameter": {
                "columns": [
                    {"name": "name", "as": "id"},
                    {"value": "const", "as": "tag"},
                    {"name": "qty", "type": "double", "as": "qty_d"},
                    {"name": "when_str", "type": "timestamp",
                     "format": "yyyy-MM-dd HH:mm:ss", "as": "when_ts"},
                ]
            },
        }
    ]
    out = apply_transform_chain(df, chain)
    assert out.columns == ["id", "tag", "qty_d", "when_ts"]
    r = out.collect()[0]
    assert r.tag == "const" and r.qty_d == 5.0 and r.when_ts.year == 2024


def test_dx_pandas_vectorized_filter(df):
    def drop_big(pdf):
        return pdf[pdf["qty"] < 20]

    out = TRANSFORMS["dx_pandas"](drop_big)(df)
    assert sorted(r.qty for r in out.collect()) == [5, 15]


def test_dx_pandas_broadcast_context(df):
    """ComplexTransformer parity: fn(pdf, ctx) with a broadcast context map."""

    def scale(pdf, ctx):
        pdf = pdf.copy()
        pdf["qty"] = pdf["qty"] * ctx["factor"] + ctx["offset"]
        return pdf

    out = TRANSFORMS["dx_pandas"](scale, context={"factor": 10, "offset": 1})(df)
    assert sorted(r.qty for r in out.collect()) == [51, 151, 251]


def test_dx_sql(df):
    out = apply_transform_chain(df, [{"name": "dx_sql", "parameter": {"expr_sql": "where qty >= 15"}}])
    assert out.count() == 2


def test_chain_order(df):
    chain = [
        {"name": "dx_filter", "parameter": {"column": "qty", "op": "<", "value": 10}},
        {"name": "dx_digest", "parameter": {"column": "name", "algo": "sha1"}},
    ]
    out = apply_transform_chain(df, chain).collect()
    assert len(out) == 2 and all(len(r.name) == 40 for r in out if r.name)


def test_unknown_transform_raises(df):
    with pytest.raises(KeyError):
        apply_transform_chain(df, [{"name": "dx_nope"}])
