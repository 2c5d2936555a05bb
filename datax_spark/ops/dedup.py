"""Corpus deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each):
- exact: one hash-groupBy — map-side combined, no blowup.
- n-gram Jaccard: exact pairwise similarity via a gram-inverted-index join;
  correct but O(sum of gram-bucket^2) — the *verifier*, not the scale path.
- MinHash+LSH: signatures in ONE aggregation pass over exploded shingles
  (k hash functions as k agg columns), banded bucket join for candidates —
  the 10^9-doc scale path (shuffle is O(docs x bands), never O(docs^2)).
- SimHash: 64-bit signature in one aggregation pass (per-bit weighted sums),
  banded blocking on 16-bit chunks for Hamming-distance candidates.

All hashing is xxhash64-based (deterministic, columnar, JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.ops.text import fingerprint_expr, tokens_expr


# ------------------------------------------------------------------ exact

def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by normalized-text fingerprint; keeper = min id."""
    return (
        df.select(F.col(id_col), fingerprint_expr(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return df with duplicates dropped (keeper = min id per fingerprint)."""
    keep = (
        exact_dedup_groups(df, text_col, id_col)
        .select(F.col("keep_id").alias(id_col))
    )
    return df.join(keep, on=id_col, how="inner")


# ------------------------------------------------------------- shingling

def shingles_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", w: int = 5
) -> DataFrame:
    """Distinct word w-shingles per doc: (id, shingle string)."""
    toks = tokens_expr(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - w, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, w)))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
        .where(F.col("shingle") != "")
    )


# ----------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """All doc pairs (a<b) with shingle-set Jaccard >= threshold.

    Inverted-index self-join on shingle value; ``block_col`` (e.g. language)
    restricts pairs to equal blocks — the standard blocking trick that cuts
    the candidate space before the shuffle.
    """
    sh = shingles_df(df, text_col, id_col, w)
    join_keys = ["shingle"]
    if block_col:
        sh = sh.join(df.select(id_col, F.col(block_col).alias("_blk")), id_col)
        join_keys.append("_blk")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("id_a"), *join_keys)
    b = sh.select(F.col(id_col).alias("id_b"), *join_keys)
    pairs = a.join(b, on=join_keys).where(F.col("id_a") < F.col("id_b"))
    inter = pairs.groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter"))

    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    )


# --------------------------------------------------------------- MinHash/LSH

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    n_hashes: int = 64,
) -> DataFrame:
    """k-minhash signature per doc in ONE aggregation pass.

    Each hash function h_i(s) = xxhash64(seed_i, s); signature[i] =
    min over shingles. GroupBy gets a map-side partial combine, so a doc's
    shingles collapse locally before the shuffle.
    """
    sh = shingles_df(df, text_col, id_col, w)
    aggs = [
        F.min(F.xxhash64(F.lit(f"mh:{i}"), F.col("shingle"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("minhash")
    )


def lsh_candidates(
    sig: DataFrame, id_col: str = "doc_id", n_bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Banded LSH: docs sharing any band-bucket become candidate pairs.

    Shuffle cost O(docs x bands); a bucket with B docs emits B(B-1)/2 pairs —
    identical signatures cluster but real corpora keep buckets small.
    """
    bands = F.array(*[
        F.xxhash64(
            F.lit(f"band:{b}"),
            *[F.col("minhash")[b * rows_per_band + r] for r in range(rows_per_band)],
        )
        for b in range(n_bands)
    ])
    exploded = sig.select(
        F.col(id_col), F.posexplode(bands).alias("band", "bucket")
    )
    a = exploded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = exploded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dupes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    n_hashes: int = 64,
    n_bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard >= threshold.

    The scale pipeline: signatures (1 pass) -> banded join (docs x bands) ->
    exact verify only on candidates (tiny fraction of all pairs).
    """
    rows = n_hashes // n_bands
    sig = minhash_signatures(df, text_col, id_col, w, n_hashes)
    cand = lsh_candidates(sig, id_col, n_bands, rows)

    sh = shingles_df(df, text_col, id_col, w)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a_sh = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------- SimHash

def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc in one aggregation pass.

    Token hash h = xxhash64(token); bit j of the signature is 1 iff
    sum over tokens of (+1 if bit j of h else -1) > 0.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    per_bit = tok.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(0)
        )
    return per_bit.select(id_col, sig.alias("simhash"))


def simhash_near_dupes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Candidate pairs with Hamming(simhash) <= max_hamming via 16-bit banding.

    Two 64-bit hashes within Hamming distance 3 share at least one of the four
    16-bit quarters exactly (pigeonhole) — block on quarters, verify distance.
    """
    sig = simhash_signatures(df, text_col, id_col)
    quarters = F.array(*[
        F.shiftright(F.col("simhash"), q * 16).bitwiseAND(F.lit(0xFFFF)) for q in range(4)
    ])
    ex = sig.select(id_col, "simhash", F.posexplode(quarters).alias("q", "qv"))
    a = ex.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "q", "qv")
    b = ex.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "q", "qv")
    cand = (
        a.join(b, ["q", "qv"]).where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b").distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
