"""Connected components / canonical dedup (ops/dedup.py).

Correctness reference: a driver-side union-find over the same pair list —
the distributed min-label propagation must produce identical components.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.ops.dedup import connected_components, dedup_keep_canonical


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((x, find(x)) for x in parent)


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(df).collect()
    )
    assert got == _uf_components(pairs)
    return got


def test_cliques_and_chains(spark):
    pairs = [
        (1, 2), (2, 3), (1, 3),          # triangle
        (10, 11),                        # pair
        (20, 21), (21, 22), (22, 23),    # chain of diameter 3
        (30, 31), (32, 31), (30, 33),    # star-ish
    ]
    got = _run(spark, pairs)
    labels = {d: c for d, c in got}
    assert labels[23] == 20 and labels[3] == 1 and labels[33] == 30


def test_bridge_merges_two_cliques(spark):
    # two cliques connected by one bridge edge must become ONE component
    clique = lambda base: [(base + i, base + j) for i in range(4) for j in range(i + 1, 4)]
    pairs = clique(100) + clique(200) + [(103, 200)]
    got = _run(spark, pairs)
    assert {c for _, c in got} == {100}


def test_keep_canonical_drops_losers_keeps_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 5), (6, 7)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    # clusters {1,2,5}->keep 1, {6,7}->keep 6; singletons 0,3,4 survive
    assert kept == [0, 1, 3, 4, 6]


def test_checkpoint_dir_materializes_durably(spark, tmp_path):
    """checkpoint_dir variant: same components, but the result is backed by
    a parquet write (survives executor churn, unlike localCheckpoint)."""
    import os

    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    ckdir = str(tmp_path / "cc")
    out = connected_components(df, checkpoint_dir=ckdir)
    got = sorted((r["doc_id"], r["cluster_id"]) for r in out.collect())
    assert got == _uf_components(pairs)
    # the clustering is durably on disk, and the result reads FROM it
    written = [d for d in os.listdir(ckdir) if d.startswith("cc-")]
    assert len(written) == 1
    assert "parquet" in out._jdf.queryExecution().executedPlan().toString().lower() \
        or out.count() == len(got)
