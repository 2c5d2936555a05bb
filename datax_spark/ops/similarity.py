"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  probe set is broadcast; the corpus streams through a single scan (no O(n^2)
  shuffle). Dot products are Catalyst ``zip_with``+``aggregate`` folds in
  double precision (JVM codegen, no Python).
- ``lsh_ann_topk``: random-hyperplane LSH buckets — the scale path. Probes
  and corpus hash to sign-bit signatures; candidates share a signature band;
  exact cosine re-ranks candidates only. At 10^9 vectors the bucket join
  shuffles O(n x bands) rows instead of scanning the corpus per probe.
- ``embedding_near_dupes``: corpus self-join near-duplicate detection via the
  same LSH buckets (cosine >= threshold on candidates).

Hyperplanes are deterministic pseudo-random vectors derived from xxhash64 of
(plane index, dimension) — reproducible across runs and engines, no stored
model state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k corpus neighbors per probe (self-matches excluded).

    Broadcast the (small) probe set against the corpus scan: one pass over
    the corpus, cost O(|corpus| x |probes| x dim) compute, zero shuffle of
    the corpus. Rank ties break on neighbor id (deterministic).
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine_expr(F.col("_pv"), F.col("_cv")), 6))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "cos")
    )


def hyperplane_signature_expr(
    vec_col: str, n_planes: int = 16, dim: int = 64, seed: str = "lsh"
) -> Column:
    """Sign-bit signature: bit p = (v . r_p) > 0 for pseudo-random plane r_p.

    r_p[d] = xxhash64(seed, p, d) mapped to [-1, 1) — deterministic, built as
    a literal-free expression so it runs entirely in codegen.
    """
    sig = F.lit(0).cast("long")
    v = F.col(vec_col)
    for p in range(n_planes):
        plane = F.array(*[
            (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), F.lit(d)), F.lit(1 << 20)).cast("double")
                / float(1 << 19)
                - 1.0
            )
            for d in range(dim)
        ])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, r: x.cast("double") * r),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
        )
    return sig


def lsh_ann_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share >= 1 LSH signature band; exact
    cosine re-ranks candidates. Recall < 1 by design — the scale path."""
    rows = n_planes // n_bands
    sig = hyperplane_signature_expr(vec_col, n_planes, dim)

    def banded(df: DataFrame, role: str) -> DataFrame:
        s = df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"_{role}v"),
            sig.alias("_sig"),
        )
        bands = F.array(*[
            F.shiftright(F.col("_sig"), b * rows).bitwiseAND(F.lit((1 << rows) - 1))
            for b in range(n_bands)
        ])
        return s.select(
            f"{role}_id", f"_{role}v", F.posexplode(bands).alias("band", "bucket")
        )

    cand = (
        banded(corpus, "neighbor")
        .join(F.broadcast(banded(probes, "probe")), ["band", "bucket"])
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id", "_probev", "_neighborv")
        .distinct()
    )
    scored = cand.withColumn(
        "cos", F.round(cosine_expr(F.col("_probev"), F.col("_neighborv")), 6)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "cos")
    )


def embedding_near_dupes(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via LSH blocking."""
    rows = n_planes // n_bands
    sig = hyperplane_signature_expr(vec_col, n_planes, dim)
    s = corpus.select(F.col(id_col), F.col(vec_col), sig.alias("_sig"))
    bands = F.array(*[
        F.shiftright(F.col("_sig"), b * rows).bitwiseAND(F.lit((1 << rows) - 1))
        for b in range(n_bands)
    ])
    ex = s.select(id_col, vec_col, F.posexplode(bands).alias("band", "bucket"))
    a = ex.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "band", "bucket"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
        .distinct()
        .withColumn("cos", F.round(cosine_expr(F.col("_va"), F.col("_vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
