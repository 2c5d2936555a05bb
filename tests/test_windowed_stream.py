"""Watermarked event-time windowed aggregation over the changelog stream
(streaming/windowed.py): the two-watermark contract (late filter lags one
batch behind eviction), non-strict boundaries, exactly-once window emission
across a checkpoint restart, and agreement with the pure-Python model the
DuckDB oracle of ``cdc_stream_windowed`` encodes.
"""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable
from datax_spark.streaming.windowed import (
    run_windowed_rollup,
    start_windowed_rollup,
    windowed_rollup,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])

D = dt.datetime


def _mk(spark, tmp_path, name="t"):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, bucket_key="k", n_buckets=2)


def _commit(spark, t, rows):
    t.append(spark.createDataFrame(rows, SCHEMA))


def _collect(df):
    return sorted(
        (r.window_start, r.window_end, r.n, sorted(r.ks))
        for r in df.collect()
    )


AGGS = lambda: {"n": F.count(F.lit(1)),
                "ks": F.sort_array(F.collect_list("k"))}


def test_two_watermark_contract(spark, tmp_path):
    """The empirical grid that pins Spark's semantics:

    - v2 row 3 (window end 12:00) arrives while wm_evict is already 12:15,
      but the LATE filter uses the previous batch's watermark (8:30), so it
      is KEPT and emitted in the same batch's eviction.
    - v3 row 4 (window end 11:00 <= wm_late 12:15, window already emitted)
      is DROPPED — append mode never emits a window twice.
    - v4 boundary: window [12,13) with end exactly == wm_evict 13:00 IS
      evicted (non-strict <=).
    """
    t = _mk(spark, tmp_path)
    _commit(spark, t, [(0, D(2024, 1, 1, 9, 0, 0))])
    _commit(spark, t, [(1, D(2024, 1, 1, 10, 15, 0)), (2, D(2024, 1, 1, 12, 45, 0))])
    _commit(spark, t, [(3, D(2024, 1, 1, 11, 5, 0))])
    _commit(spark, t, [(4, D(2024, 1, 1, 10, 20, 0)), (5, D(2024, 1, 1, 13, 30, 0))])
    _commit(spark, t, [(9, D(2030, 1, 1, 0, 0, 0))])

    out = run_windowed_rollup(
        spark, t.root, ts_col="ts", window="1 hour", delay="30 minutes",
        aggs=AGGS(), starting_version=0)
    got = _collect(out)
    assert got == [
        (D(2024, 1, 1, 9), D(2024, 1, 1, 10), 1, [0]),
        (D(2024, 1, 1, 10), D(2024, 1, 1, 11), 1, [1]),   # 4 dropped
        (D(2024, 1, 1, 11), D(2024, 1, 1, 12), 1, [3]),   # 3 kept (lagged filter)
        (D(2024, 1, 1, 12), D(2024, 1, 1, 13), 1, [2]),   # boundary-evicted
        (D(2024, 1, 1, 13), D(2024, 1, 1, 14), 1, [5]),
    ]
    # sentinel's own window never finalizes -> absent
    assert all(ws.year < 2030 for ws, *_ in got)


def test_late_filter_boundary_nonstrict(spark, tmp_path):
    """A row whose window end equals wm_late EXACTLY is dropped (<=)."""
    t = _mk(spark, tmp_path)
    _commit(spark, t, [(1, D(2024, 1, 1, 12, 45, 0))])  # wm -> 12:00 at delay 45m
    _commit(spark, t, [(2, D(2024, 1, 1, 13, 10, 0))])  # spacer: wm_late(v3)=12:00
    _commit(spark, t, [(3, D(2024, 1, 1, 11, 30, 0)),   # end 12:00 == wm_late -> drop
                       (4, D(2024, 1, 1, 12, 30, 0))])  # end 13:00 > wm_late -> keep
    _commit(spark, t, [(9, D(2030, 1, 1, 0, 0, 0))])

    out = run_windowed_rollup(
        spark, t.root, ts_col="ts", window="1 hour", delay="45 minutes",
        aggs=AGGS(), starting_version=0)
    got = _collect(out)
    assert got == [
        (D(2024, 1, 1, 12), D(2024, 1, 1, 13), 2, [1, 4]),
        (D(2024, 1, 1, 13), D(2024, 1, 1, 14), 1, [2]),
    ]


def test_restart_is_exactly_once(spark, tmp_path):
    """Stop after the first commits, restart from the same checkpoint with
    more commits: every finalized window is emitted exactly once overall.

    Restart semantics (pinned here): Spark restores ONE watermark value from
    the checkpoint, so for the first post-restart batch the late filter no
    longer lags a batch behind eviction — wm_late == wm_evict == the
    checkpointed watermark. A row that a continuous run would have kept
    (row 3: window end 12:00, filtered at the pre-restart wm 12:15) is
    dropped after a restart. That is the documented conservative direction:
    restarts may drop MORE late data, never emit a window twice."""
    from datax_spark.streaming.changelog import read_changelog_stream

    rows_a = [(1, D(2024, 1, 1, 10, 15, 0)), (2, D(2024, 1, 1, 12, 45, 0))]
    rows_b = [(3, D(2024, 1, 1, 11, 5, 0)), (4, D(2024, 1, 1, 13, 30, 0))]
    rows_c = [(9, D(2030, 1, 1, 0, 0, 0))]

    # one-shot reference
    t1 = _mk(spark, tmp_path, "oneshot")
    for rows in (rows_a, rows_b, rows_c):
        _commit(spark, t1, rows)
    ref = _collect(run_windowed_rollup(
        spark, t1.root, ts_col="ts", window="1 hour", delay="30 minutes",
        aggs=AGGS(), starting_version=0))

    # two-leg run into a parquet sink (survives restart, unlike memory)
    t2 = _mk(spark, tmp_path, "twoleg")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def leg():
        from datax_spark.streaming.util import drain_query

        sdf = read_changelog_stream(spark, t2.root, starting_version=0,
                                    max_versions_per_trigger=1)
        out = windowed_rollup(sdf, ts_col="ts", window="1 hour",
                              delay="30 minutes", aggs=AGGS())
        q = (out.writeStream.format("parquet").outputMode("append")
             .option("path", sink).option("checkpointLocation", ckpt)
             .start())
        drain_query(q)

    _commit(spark, t2, rows_a)
    leg()                      # leg 1 sees only rows_a
    _commit(spark, t2, rows_b)
    _commit(spark, t2, rows_c)
    leg()                      # leg 2 resumes from checkpoint

    got = _collect(spark.read.parquet(sink))
    # row 3 ([11,12), end 12:00 <= restored wm 12:15) is restart-dropped;
    # everything else matches the one-shot run
    assert got == [x for x in ref if x[3] != [3]]
    assert (D(2024, 1, 1, 11), D(2024, 1, 1, 12), 1, [3]) in ref
    # exactly-once: no window appears twice
    starts = [ws for ws, *_ in got]
    assert len(starts) == len(set(starts))


def test_session_windows(spark, tmp_path):
    """Native session windows over the changelog stream (session_rollup):

    - events within the gap merge into one session, across micro-batches
      (k=a: 10:00 in v1 + 10:10 in v2 -> one session ending 10:25);
    - a gap-exceeding event opens a new session (k=a at 11:10);
    - a late event inside an already-CLOSED session's span is dropped, so
      closed sessions never reopen or overlap. The two-watermark lag makes
      the spacer commit necessary: eviction (close) uses the current
      watermark but the late filter uses the previous batch's, so the drop
      only happens one batch after the close.
    """
    from datax_spark.streaming.changelog import read_changelog_stream
    from datax_spark.streaming.util import drain_to_memory
    from datax_spark.streaming.windowed import session_rollup

    kschema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), kschema,
                         bucket_key="k", n_buckets=2)

    def commit(rows):
        t.append(spark.createDataFrame(rows, kschema))

    commit([("a", D(2024, 1, 1, 10, 0, 0)), ("b", D(2024, 1, 1, 10, 2, 0))])
    commit([("a", D(2024, 1, 1, 10, 10, 0))])          # merges into a's session
    commit([("a", D(2024, 1, 1, 11, 10, 0))])          # new session; raises wm
    commit([("c", D(2024, 1, 1, 11, 12, 0))])          # spacer: closes the 10:xx
    #                                                    sessions (wm_evict 10:40)
    commit([("a", D(2024, 1, 1, 10, 5, 0)),            # late, inside closed span:
            #                                            dropped (wm_late 10:40)
            ("a", D(2024, 1, 1, 11, 20, 0))])          # extends the 11:10 session
    commit([("z", D(2030, 1, 1, 0, 0, 0))])            # flush sentinel

    sdf = read_changelog_stream(spark, t.root, starting_version=0,
                                max_versions_per_trigger=1)
    out = session_rollup(sdf, ts_col="ts", gap="15 minutes",
                         delay="30 minutes", keys=["k"],
                         aggs={"n": F.count(F.lit(1))})
    got = sorted((r.k, r.session_start, r.session_end, r.n)
                 for r in spark.table(drain_to_memory(out))
                 .filter(F.col("k").isin("a", "b")).collect())
    assert got == [
        ("a", D(2024, 1, 1, 10, 0), D(2024, 1, 1, 10, 25), 2),
        ("a", D(2024, 1, 1, 11, 10), D(2024, 1, 1, 11, 35), 2),
        ("b", D(2024, 1, 1, 10, 2), D(2024, 1, 1, 10, 17), 1),
    ]
    # no overlapping sessions per key
    for k in ("a", "b"):
        spans = [(s, e) for kk, s, e, _ in got if kk == k]
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2


def _model(batches, delay_s, window_s=3600):
    """Pure-Python replica of the pinned semantics (the oracle model)."""
    kept = []
    run_max = None          # running max event time over completed batches
    wm_late = None          # eviction watermark of the PREVIOUS batch
    for rows in batches:
        wm_evict = (run_max - dt.timedelta(seconds=delay_s)
                    if run_max is not None else None)
        for k, ts in rows:
            epoch_s = (ts - dt.datetime(1970, 1, 1)).total_seconds()
            end_s = (int(epoch_s) // window_s + 1) * window_s
            end = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=end_s)
            if wm_late is None or end > wm_late:
                kept.append((k, ts, end))
        mx = max((ts for _, ts in rows), default=None)
        if mx is not None:
            mx = mx.replace(microsecond=mx.microsecond // 1000 * 1000)
            run_max = mx if run_max is None else max(run_max, mx)
        wm_late = wm_evict
    final_wm = run_max - dt.timedelta(seconds=delay_s)
    out = {}
    for k, ts, end in kept:
        if end <= final_wm:
            out.setdefault(end, []).append(k)
    return {end: sorted(ks) for end, ks in out.items()}


@pytest.mark.parametrize("seed", [7, 23])
def test_matches_python_model(spark, tmp_path, seed):
    """Randomized (seeded) commit sequences agree with the pure model —
    the same model the DuckDB oracle encodes in SQL."""
    import random

    rng = random.Random(seed)
    base = D(2024, 3, 1)
    batches = []
    k = 0
    for _ in range(5):
        rows = []
        for _ in range(rng.randint(2, 6)):
            ts = base + dt.timedelta(seconds=rng.randint(0, 6 * 86400),
                                     microseconds=rng.randint(0, 999_999))
            rows.append((k, ts))
            k += 1
        batches.append(rows)
    batches.append([(999, D(2035, 1, 1))])  # flush sentinel

    t = _mk(spark, tmp_path, f"rnd{seed}")
    for rows in batches:
        _commit(spark, t, rows)
    out = run_windowed_rollup(
        spark, t.root, ts_col="ts", window="1 hour", delay="1801 seconds",
        aggs=AGGS(), starting_version=0)
    got = {r.window_end: sorted(r.ks) for r in out.collect()}
    assert got == _model(batches, 1801)
