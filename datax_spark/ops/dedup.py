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

Hashing comes in two flavors:
- xxhash64 (default): fastest, JVM-side, not portable to other engines.
- portable md5-60 (``portable=True``): ``conv(substr(md5(s),1,15),16,10)`` — a
  60-bit integer that DuckDB reproduces bit-for-bit via
  ``CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)``, so the ENTIRE
  LSH pipeline (signatures → bands → candidates → verified pairs) is
  replicable by the SQL correctness oracle, not just the final invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datax_spark.ops.text import fingerprint_expr, tokens_expr

#: Mersenne prime 2^31-1: (a*h + b) % P stays under 2^62 — no int64 overflow
#: in either engine.
P_MINHASH = 2_147_483_647


def portable_hash60_expr(col: Column) -> Column:
    """60-bit md5-derived hash, bit-identical in Spark and DuckDB (see
    ``portable_hash60_sql``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB SQL replicating ``portable_hash60_expr`` exactly."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_perms(n_hashes: int, p: int = P_MINHASH) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) affine-permutation constants shared by the
    Spark pipeline and the SQL oracle builder (seeded 64-bit LCG)."""
    perms: list[tuple[int, int]] = []
    x = 0x9E3779B97F4A7C15
    for _ in range(n_hashes):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = x % (p - 1) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % p
        perms.append((a, b))
    return perms


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
    """Distinct word w-shingles per doc: (id, shingle string).

    Arrow-vectorized (a documented, measured exception to built-ins-first,
    like the LSH signature matmul): the Catalyst form —
    ``transform(sequence(...), i -> concat_ws(' ', slice(tokens, i+1, w)))``
    — is a HigherOrderFunction chain that evaluates interpreted per element
    (outside whole-stage codegen) and measured 6.1 s for 250k shingles at
    sf0.1; the same derivation in one map-only Arrow pass is ~20x faster.
    Semantics are byte-identical to the expression form and to the SQL
    oracles: lowercase, split on single spaces, drop empty tokens, shingle i
    = tokens[i:i+w] joined by one space for i in [0, max(n-w, 0)], distinct
    within doc, drop ''.

    Re-validated round 3: a fully vectorized variant (pandas ``str.split``
    C-level tokenize, flat numpy offset-view shingle assembly via
    object-array concatenation, ``drop_duplicates`` dedupe) produced
    identical output but measured **2.4x slower** (26.2 s vs 10.8 s for 3.1M
    shingles from 20k docs, same host window) — elementwise object-dtype
    ``+`` materializes w intermediate arrays and the global dedupe loses to
    the per-doc ``set``. The loop is the measured-best kernel; it
    parallelizes across cores via mapInPandas (one Arrow batch per task), so
    at 10^9 docs throughput scales with executor count, and the ops_scale
    bench shows the full minhash pipeline sub-linear at a 10x corpus.
    """
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, shingle string"

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids: list = []
            shs: list = []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in (txt or "").lower().split(" ") if t]
                seen = set()
                for i in range(max(len(toks) - w, 0) + 1):
                    s = " ".join(toks[i:i + w])
                    if s and s not in seen:
                        seen.add(s)
                        ids.append(doc_id)
                        shs.append(s)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="object"),
                                "shingle": shs})

    return df.select(id_col, text_col).mapInPandas(gen, schema=out_schema)


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
    portable: bool = False,
) -> DataFrame:
    """k-minhash signature per doc in ONE aggregation pass.

    Default: h_i(s) = xxhash64(seed_i, s). Portable: ONE md5-60 hash per
    shingle + k affine permutations (a_i*h + b_i) mod P — cheaper than k
    hash calls AND bit-replicable by the DuckDB oracle. signature[i] =
    min over shingles; groupBy gets a map-side partial combine, so a doc's
    shingles collapse locally before the shuffle.
    """
    sh = shingles_df(df, text_col, id_col, w)
    if portable:
        h = F.pmod(portable_hash60_expr(F.col("shingle")), F.lit(P_MINHASH))
        sh = sh.select(id_col, h.alias("_h"))
        aggs = [
            F.min(F.pmod(F.lit(a) * F.col("_h") + F.lit(b), F.lit(P_MINHASH))).alias(f"h{i}")
            for i, (a, b) in enumerate(minhash_perms(n_hashes))
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.lit(f"mh:{i}"), F.col("shingle"))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("minhash")
    )


def lsh_candidates(
    sig: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
    rows_per_band: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Banded LSH: docs sharing any band-bucket become candidate pairs.

    Shuffle cost O(docs x bands); a bucket with B docs emits B(B-1)/2 pairs —
    identical signatures cluster but real corpora keep buckets small.
    Portable mode buckets on the exact minhash tuple (concat string) so a
    band-hash collision can never invent a candidate the oracle lacks.
    """
    def band_key(b: int):
        cols = [F.col("minhash")[b * rows_per_band + r] for r in range(rows_per_band)]
        if portable:
            return F.concat_ws(":", *[c.cast("string") for c in cols])
        return F.xxhash64(F.lit(f"band:{b}"), *cols).cast("string")

    bands = F.array(*[band_key(b) for b in range(n_bands)])
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


def jaccard_verify(
    cand: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    threshold: float = 0.5,
    prune: bool = False,
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs ``(id_a, id_b)``.

    ``prune=True`` derives shingles ONLY for docs that appear in some
    candidate pair (a semi-join restricts the tokenize/shingle pass to the
    candidate set). Use it ONLY when ``cand`` reads from materialized state
    (e.g. a MinHashIndex signature table): the prune references ``cand``
    a second time, and with a lazily-recomputed candidate pipeline that
    re-executes the whole signature+banding subtree — measured 4.6x SLOWER
    than just shingling the corpus once in the batch pipeline. Default is
    the single-reference plan: shingle all of ``docs``, join candidates.
    """
    if prune:
        ids = (
            cand.select(F.col("id_a").alias(id_col))
            .union(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        docs = docs.select(id_col, text_col).join(ids, id_col, "left_semi")
    sh = shingles_df(docs, text_col, id_col, w)
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


def minhash_near_dupes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    n_hashes: int = 64,
    n_bands: int = 16,
    threshold: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard >= threshold.

    The scale pipeline: signatures (1 pass) -> banded join (docs x bands) ->
    exact verify only on candidate pairs (tiny fraction of all pairs).
    """
    rows = n_hashes // n_bands
    sig = minhash_signatures(df, text_col, id_col, w, n_hashes, portable=portable)
    cand = lsh_candidates(sig, id_col, n_bands, rows, portable=portable)
    return jaccard_verify(cand, df, text_col, id_col, w, threshold)


# ------------------------------------------------------------------- SimHash

def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash per doc in one aggregation pass.

    Token hash h = xxhash64(token) (or the 60-bit md5 portable hash — pass
    ``bits=60`` with ``portable=True``); bit j of the signature is 1 iff
    sum over tokens of (+1 if bit j of h else -1) > 0.
    """
    tok_hash = (
        portable_hash60_expr(F.col("tok")) if portable else F.xxhash64("tok")
    )
    tok = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok")
    ).withColumn("h", tok_hash)
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
    bits: int = 64,
    n_blocks: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via pigeonhole banding.

    Splitting ``bits`` into ``n_blocks`` equal blocks and joining on
    block equality GUARANTEES 100% recall iff max_hamming <= n_blocks - 1
    (a pair with <= n_blocks-1 differing bits must share one block exactly)
    — so the blocked output equals the exact all-pairs result, which is what
    lets the DuckDB oracle check it with a plain O(n^2) hamming filter.
    """
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_blocks>={max_hamming + 1} "
            "for guaranteed pigeonhole recall"
        )
    if bits % n_blocks:
        raise ValueError(f"bits={bits} not divisible by n_blocks={n_blocks}")
    bw = bits // n_blocks
    sig = simhash_signatures(df, text_col, id_col, bits=bits, portable=portable)
    quarters = F.array(*[
        F.shiftright(F.col("simhash"), q * bw).bitwiseAND(F.lit((1 << bw) - 1))
        for q in range(n_blocks)
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


# ------------------------------------------------- clustering / canonicalize

def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "doc_id",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over near-dup pairs: ``(doc_id, cluster_id)``
    with ``cluster_id`` = the smallest doc id in the component — the step
    that turns pairwise near-dup output into actionable dedup (keep one
    canonical doc per cluster, drop the rest).

    Min-label propagation: every vertex repeatedly takes the minimum label
    among itself and its neighbors until a fixpoint; each round is one
    edge-join + min-aggregate (two shuffles on the PAIR set, which at LSH
    selectivity is orders of magnitude smaller than the corpus). Rounds
    needed = component diameter — near-dup clusters are dense little cliques
    (diameter 1-3), so convergence is a handful of rounds. For adversarial
    long-chain graphs the published upgrade is alternating large-star/
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond"), which this deliberately is not: the dedup use
    case never pays for it. Deterministic (min is order-free), so the DuckDB
    oracle can replay it as a recursive transitive closure.

    Only docs that appear in some pair are returned — singletons are their
    own trivial cluster and are left to the caller (a left-anti join).

    Durability: by default the result is an EAGER ``localCheckpoint`` —
    computed once, blocks pinned on executors with lineage truncated. On a
    long-lived cluster an executor loss after return makes downstream
    actions on the result fail unrecoverably (unlike a reliable
    checkpoint); pass ``checkpoint_dir`` to materialize the clustering to
    storage instead (one parquet write + re-read — survives executor
    churn, at one round-trip of I/O). Callers that consume the result
    immediately don't need it (``dedupe_table`` feeds one CDC apply right
    away, which is itself the durable artifact).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = edges.select("u").distinct().withColumn("lbl", F.col("u")).persist()
    labels.count()
    try:
        for _ in range(max_iter):
            nbr = (
                edges.join(labels.withColumnRenamed("u", "v"), "v")
                .groupBy("u")
                .agg(F.min("lbl").alias("nlbl"))
            )
            new_labels = (
                labels.join(nbr, "u", "left")
                .select("u", F.least(F.col("lbl"),
                                     F.coalesce("nlbl", "lbl")).alias("lbl"))
                .persist()
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("lbl", "_old"), "u")
                .filter(F.col("lbl") != F.col("_old"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if not changed:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
        out = labels.select(
            F.col("u").alias(id_out), F.col("lbl").alias("cluster_id")
        )
        # materialization boundary: the caller gets a plain DataFrame whose
        # lineage doesn't reference the unpersisted loop state
        if checkpoint_dir is not None:
            import os
            import uuid

            path = os.path.join(checkpoint_dir, f"cc-{uuid.uuid4().hex}")
            out.write.parquet(path)
            return pairs.sparkSession.read.parquet(path)
        return out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
        labels.unpersist()


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every non-canonical member of each near-dup cluster: keep the
    min-id doc per connected component plus all docs in no pair at all."""
    cc = connected_components(pairs, id_out=id_col)
    losers = cc.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return df.join(losers, id_col, "left_anti")
