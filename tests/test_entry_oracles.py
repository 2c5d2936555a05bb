"""Replicates the driver's correctness gate: every __spark_entry__ query must
match its DuckDB oracle at sf0.01 — row count, column names, and
order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df):
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else round(v, 6))
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got = q(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check for non-SQL-expressible ops
        return
    want = duck.sql(sql).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), f"{name}: columns differ"
    g, w = _normalize(got), _normalize(want)
    eq = g.equals(w)
    if not eq:
        diff = g.compare(w) if g.shape == w.shape else None
        raise AssertionError(f"{name}: values differ\n{diff.head(10) if diff is not None else (g.head(), w.head())}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
