"""Property-based tests (hypothesis) for the wire-connector primitives:
the HBase cell codec, region-range tiling, and the shared SQL range-split
arithmetic. These are the pieces whose edge cases (empty keys, negative
numbers, unicode, adversarial region layouts) a handful of example tests
cannot enumerate."""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.sources.dbapi import range_split_predicates  # noqa: E402
from datax_spark.sources.hbase_rest import (  # noqa: E402
    decode_cell,
    encode_cell,
    split_ranges,
)

_TYPED = st.one_of(
    st.tuples(st.just("int"), st.integers(-2**31, 2**31 - 1)),
    st.tuples(st.just("long"), st.integers(-2**63, 2**63 - 1)),
    st.tuples(st.just("short"), st.integers(-2**15, 2**15 - 1)),
    st.tuples(st.just("boolean"), st.booleans()),
    st.tuples(st.just("string"), st.text(max_size=64)),
    st.tuples(st.just("binary"), st.binary(min_size=1, max_size=64)),
)


@settings(max_examples=300, deadline=None)
@given(tv=_TYPED, enc=st.sampled_from(["string", "binary"]))
def test_cell_codec_roundtrips_all_types(tv, enc):
    t, v = tv
    if t == "string" and v == "":
        v = None  # empty bytes decode as NULL by contract (HBase empty cell)
    got = decode_cell(encode_cell(v, t, enc), t, enc)
    assert got == v


@settings(max_examples=200, deadline=None)
@given(
    splits=st.lists(st.binary(min_size=1, max_size=6), min_size=0,
                    max_size=6, unique=True),
    lo=st.binary(max_size=6),
    hi=st.binary(max_size=6),
)
def test_split_ranges_tile_the_window(splits, lo, hi):
    """Clipped ranges are disjoint, ordered, inside the window, and cover it
    exactly (doSplit parity, for arbitrary region layouts)."""
    bounds = [b""] + sorted(splits) + [b""]
    regions = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
    if hi and lo > hi:
        lo, hi = hi, lo
    ranges = split_ranges(regions, lo, hi)
    # inside the window, non-empty, ordered, disjoint and contiguous
    prev_end = None
    for a, b in ranges:
        assert a >= lo
        if hi:
            assert (not b) or b <= hi or (b == hi)
            assert a < hi
        if b:
            assert a < b
        if prev_end is not None:
            assert a == prev_end  # contiguous tiling, no gap/overlap
        prev_end = b
    if ranges:
        assert ranges[0][0] == lo
        assert ranges[-1][1] == (hi if hi else b"")


@settings(max_examples=200, deadline=None)
@given(
    lo=st.integers(-10**12, 10**12),
    span=st.integers(0, 10**6),
    n=st.integers(1, 64),
)
def test_int_range_predicates_tile_exactly(lo, span, n):
    """Every integer in [lo, hi] satisfies exactly ONE predicate (the
    splitSingleTable tiling invariant), checked by direct evaluation on a
    sample of the domain."""
    hi = lo + span
    preds = range_split_predicates("k", lo, hi, n)
    assert preds is not None

    def matches(k: int, pred: str) -> bool:
        if pred == "k IS NOT NULL":
            return True
        ok = True
        for c in pred.split(" AND "):
            op, val = c.replace("k ", "", 1).split(" ", 1)
            v = int(val)
            ok &= (k >= v if op == ">=" else k < v if op == "<" else k <= v)
        return ok

    sample = {lo, hi, lo + span // 2, lo + 1, hi - 1} if span else {lo}
    sample = {k for k in sample if lo <= k <= hi}
    for k in sample:
        hits = sum(1 for p in preds if matches(k, p))
        assert hits == 1, (k, preds)


# --- Phoenix splitPoints tiling (sources/phoenix.py) ---

from datax_spark.sources.phoenix import split_point_predicates  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    points=st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=8,
                    unique=True).map(sorted),
    key=st.integers(-20_000, 20_000),
)
def test_split_points_tile_int_space_exactly_once(points, key):
    """Every integer key matches EXACTLY ONE of the n+1 splitPoint ranges
    (buildSplitRange semantics: <= p1, (p_{i-1}, p_i], > p_n) — no gaps, no
    overlaps, regardless of the points chosen."""
    preds = split_point_predicates("k", points, kind="long")
    assert len(preds) == len(points) + 1

    def matches(pred: str) -> bool:
        # predicates use only <=, >, AND over one variable
        clauses = pred.split(" AND ")
        ok = True
        for c in clauses:
            _, op, lit = c.split(" ", 2)
            ok &= (key <= int(lit)) if op == "<=" else (key > int(lit))
        return ok

    assert sum(matches(p) for p in preds) == 1


# --- Kudu range-tablet assignment (sources/kudu.py) ---

from datax_spark.sources.kudu import kudu_normalize_spec, kudu_tablet_expr  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(
    bounds=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        min_size=2, max_size=6, unique=True).map(sorted),
    keys=st.lists(st.text(alphabet="abcdefghij", min_size=0, max_size=5),
                  min_size=1, max_size=8),
)
def test_kudu_range_assignment_model(bounds, keys, spark):
    """Pure-model property: the range spec built from consecutive sorted
    bounds assigns every key to the FIRST [lower, upper) range covering it,
    -1 when none covers (NonCoveredRangeException analog). With contiguous
    ranges that is exactly the bisect position. The Spark expression itself
    is checked against this model once, below."""
    ranges = [{"lower": bounds[i], "upper": bounds[i + 1]}
              for i in range(len(bounds) - 1)]
    spec = kudu_normalize_spec({
        "column": [{"name": "k", "type": "string", "primaryKey": True}],
        "partition": {"range": {"k": ranges}}})
    _, n = kudu_tablet_expr(spec)
    assert n == len(ranges)
    for k in keys:
        want = -1
        for i, r in enumerate(ranges):
            if r["lower"] <= k < r["upper"]:
                want = i
                break
        # contiguous ranges: covered iff bounds[0] <= k < bounds[-1]
        assert (want >= 0) == (bounds[0] <= k < bounds[-1])
        if want >= 0:
            import bisect
            assert want == bisect.bisect_right(bounds, k) - 1


def test_kudu_range_spark_expr_matches_model(spark):
    """One Spark evaluation of kudu_tablet_expr over an adversarial key set
    (bound values themselves, neighbors, out-of-range on both sides) agrees
    with the first-covering-range model above."""
    from pyspark.sql import functions as F

    bounds = ["b", "d", "dd", "g"]
    ranges = [{"lower": bounds[i], "upper": bounds[i + 1]}
              for i in range(len(bounds) - 1)]
    spec = kudu_normalize_spec({
        "column": [{"name": "k", "type": "string", "primaryKey": True}],
        "partition": {"range": {"k": ranges}}})
    expr, n = kudu_tablet_expr(spec)
    keys = ["a", "az", "b", "c", "d", "db", "dd", "de", "f", "g", "gz", ""]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r.k: r.t for r in df.select("k", expr.alias("t")).collect()}
    for k in keys:
        want = -1
        for i, r in enumerate(ranges):
            if r["lower"] <= k < r["upper"]:
                want = i
                break
        assert got[k] == want, (k, got[k], want)
