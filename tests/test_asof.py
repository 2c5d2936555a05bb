from __future__ import annotations

import datetime as dt

import pytest

from datax_spark.ops.asof import asof_join


@pytest.fixture()
def quotes_trades(spark):
    T = dt.datetime
    trades = spark.createDataFrame(
        [
            ("A", T(2026, 1, 1, 10, 0, 0), 100),
            ("A", T(2026, 1, 1, 10, 0, 5), 101),
            ("A", T(2026, 1, 1, 10, 1, 0), 102),
            ("B", T(2026, 1, 1, 10, 0, 2), 200),
            ("C", T(2026, 1, 1, 10, 0, 2), 300),  # no quotes at all
        ],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", T(2026, 1, 1, 9, 59, 58), 10.0),
            ("A", T(2026, 1, 1, 10, 0, 5), 10.5),   # exact-ts match counts
            ("A", T(2026, 1, 1, 10, 0, 30), 11.0),
            ("B", T(2026, 1, 1, 10, 0, 3), 20.0),   # after the only B trade
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_join_basic(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {r.trade_id: r for r in asof_join(trades, quotes, on="sym").collect()}
    assert len(out) == 5
    assert out[100].asof_px == 10.0
    assert out[101].asof_px == 10.5          # right.ts == left.ts matches
    assert out[102].asof_px == 11.0          # latest at-or-before 10:01
    assert out[200].asof_px is None          # quote only after the trade
    assert out[300].asof_px is None          # no right rows for key
    assert out[101].asof_ts == dt.datetime(2026, 1, 1, 10, 0, 5)


def test_asof_join_tolerance(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        r.trade_id: r
        for r in asof_join(trades, quotes, on="sym", tolerance_s=10).collect()
    }
    assert out[100].asof_px == 10.0          # 2 s old: within tolerance
    assert out[101].asof_px == 10.5          # exact-ts: 0 s old
    assert out[102].asof_px is None          # 30 s old > 10 s tolerance → voided
    assert out[102].asof_ts is None


def test_asof_join_matches_pandas(spark):
    """Randomized cross-check vs pandas.merge_asof (by-key, backward)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    n_l, n_r = 600, 400
    lp = pd.DataFrame({
        "k": rng.randint(0, 12, n_l),
        "ts": pd.to_datetime("2026-01-01") + pd.to_timedelta(
            rng.randint(0, 10_000_000, n_l), unit="us"),
        "lid": np.arange(n_l),
    })
    rp = pd.DataFrame({
        "k": rng.randint(0, 12, n_r),
        "ts": pd.to_datetime("2026-01-01") + pd.to_timedelta(
            # microsecond grid; collision chance negligible
            rng.randint(0, 10_000_000, n_r), unit="us"),
        "val": rng.randn(n_r).round(6),
    })
    want = pd.merge_asof(
        lp.sort_values("ts", kind="mergesort"),
        rp.sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction="backward",
    ).set_index("lid")["val"]

    out = asof_join(
        spark.createDataFrame(lp), spark.createDataFrame(rp), on="k"
    ).toPandas().set_index("lid")["asof_val"]
    for lid in lp["lid"]:
        w, g = want.loc[lid], out.loc[lid]
        assert (pd.isna(w) and pd.isna(g)) or w == g, (lid, w, g)
