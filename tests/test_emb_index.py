"""Changelog-maintained embedding LSH index (cdc/dedup_index.py).

Invariant: after any sequence of base-table commits, ``refresh()`` +
``near_dups()`` equals the BATCH pipeline (``embedding_near_dupes`` with the
same frozen planes/bands) on the base table's current state.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from datax_spark.cdc.dedup_index import EmbeddingLshIndex
from datax_spark.lake.table import LakeTable
from datax_spark.ops.similarity import embedding_near_dupes

DIM, PLANES, BANDS, THRESH = 16, 48, 8, 0.9

SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
])


def _vec(i: int, jitter: float = 0.0) -> list[float]:
    rng = np.random.RandomState(i % 7 + 1)   # 7 base directions -> planted dups
    v = rng.uniform(-1, 1, DIM)
    if jitter:
        v = v + np.random.RandomState(1000 + i).uniform(-jitter, jitter, DIM)
    return [float(x) for x in v]


def _events(spark, rows):
    """rows: (vec_id, embedding, seq, op)"""
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, seq long, op string"
    )


def _apply(t, spark, rows):
    t.apply_cdc_stats(
        _events(spark, rows), key_cols=["vec_id"], op_col="op", seq_col="seq",
        write_mode="mor", compact_threshold=100,
    )


def _pairs(df):
    return sorted((r["id_a"], r["id_b"], round(r["cos"], 9)) for r in df.collect())


def _batch(t):
    return _pairs(embedding_near_dupes(
        t.read().select("vec_id", "embedding"), threshold=THRESH,
        id_col="vec_id", vec_col="embedding",
        n_planes=PLANES, n_bands=BANDS, dim=DIM,
    ))


@pytest.fixture()
def base(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, "vec_id", n_buckets=4)
    rows = [(i, _vec(i, jitter=0.02 * (i // 7)), i + 1, "I") for i in range(21)]
    _apply(t, spark, rows)
    return t


def test_seed_matches_batch(spark, tmp_path, base):
    idx = EmbeddingLshIndex.create(
        base, str(tmp_path / "idx"), n_buckets=4,
        n_planes=PLANES, n_bands=BANDS, dim=DIM,
    )
    got = _pairs(idx.near_dups(THRESH))
    assert got == _batch(base) and len(got) > 0
    assert idx.consumed_version() == base.current_version()


def test_refresh_tracks_lifecycle_and_null_vectors(spark, tmp_path, base):
    idx = EmbeddingLshIndex.create(
        base, str(tmp_path / "idx"), n_buckets=4,
        n_planes=PLANES, n_bands=BANDS, dim=DIM,
    )
    _apply(base, spark, [
        (0, _vec(900), 100, "U"),            # leaves its direction cluster
        (7, _vec(0), 101, "D"),              # deleted
        (50, _vec(1, jitter=0.01), 102, "I"),  # joins direction-1 cluster
        (8, None, 103, "U"),                 # NULL vector -> signature drops
    ])
    r = idx.refresh()
    assert r["to"] == base.current_version() and r["docs_touched"] == 4
    got = _pairs(idx.near_dups(THRESH))
    # the batch reference must skip the NULL vector too
    want = _pairs(embedding_near_dupes(
        base.read().filter("embedding IS NOT NULL").select("vec_id", "embedding"),
        threshold=THRESH, id_col="vec_id", vec_col="embedding",
        n_planes=PLANES, n_bands=BANDS, dim=DIM,
    ))
    assert got == want
    assert not any(7 in (a, b) or 8 in (a, b) for a, b, _ in got)
    # idempotent replay
    assert idx.refresh()["docs_touched"] == 0
    assert _pairs(idx.near_dups(THRESH)) == got


def test_open_rejects_wrong_class_and_restores_params(spark, tmp_path, base):
    from datax_spark.cdc.dedup_index import MinHashIndex

    EmbeddingLshIndex.create(
        base, str(tmp_path / "idx"), n_buckets=4,
        n_planes=PLANES, n_bands=BANDS, dim=DIM,
    )
    idx2 = EmbeddingLshIndex.open(base, str(tmp_path / "idx"))
    assert (idx2.n_planes, idx2.n_bands, idx2.dim) == (PLANES, BANDS, DIM)
    with pytest.raises(ValueError, match="created as EmbeddingLshIndex"):
        MinHashIndex.open(base, str(tmp_path / "idx"))


def test_topk_matches_batch_lsh_ann(spark, tmp_path, base):
    """topk() against the maintained index == lsh_ann_topk over the current
    corpus with the frozen params — including after a refresh window and
    with multi-probe on."""
    from datax_spark.ops.similarity import lsh_ann_topk

    idx = EmbeddingLshIndex.create(
        base, str(tmp_path / "idx"), n_buckets=4,
        n_planes=PLANES, n_bands=BANDS, dim=DIM,
    )
    _apply(base, spark, [
        (0, _vec(2, jitter=0.01), 100, "U"),
        (13, _vec(6), 101, "D"),
        (60, _vec(3, jitter=0.015), 102, "I"),
    ])
    idx.refresh()
    probes = base.read().filter("vec_id % 4 = 1").select("vec_id", "embedding")
    for mp in (0, 2):
        got = sorted(tuple(r) for r in idx.topk(probes, k=3, multi_probe=mp).collect())
        want = sorted(tuple(r) for r in lsh_ann_topk(
            probes, base.read().select("vec_id", "embedding"), k=3,
            n_planes=PLANES, n_bands=BANDS, dim=DIM, multi_probe=mp,
        ).collect())
        assert got == want and len(got) > 0, f"multi_probe={mp}"
