"""Training-data ops: dedup (exact/minhash/simhash/jaccard), similarity
search, text analysis, multimodal plumbing — validated against independent
pure-Python/numpy computations."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from datax_spark.ops import dedup as D
from datax_spark.ops import multimodal as MM
from datax_spark.ops import similarity as S
from datax_spark.ops import text as TX

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the dog dreams of bones"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en"),
        (1, BASE, "en"),                                   # exact dup of 0
        (2, BASE.replace("lazy", "sleepy"), "en"),          # near dup of 0
        (3, BASE.replace("dog", "wolf").replace("cat", "owl"), "en"),  # nearish
        (4, "le chat est sur la table et le chien est dans le jardin pour la nuit", "fr"),
        (5, "der hund ist ein gutes tier und die katze ist auch ein gutes tier", "de"),
        (6, "completely different words about spark engines and parquet files here", "en"),
        (7, "  The   QUICK brown fox jumps over the lazy dog while the cat sleeps "
            "near the warm fire and the dog dreams of bones!! ", "en"),  # normalized dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _shingles(text, w=5):
    toks = [t for t in text.lower().split(" ") if t]
    if len(toks) <= w:
        return {" ".join(toks[:w])}
    return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}


def _jaccard(a, b, w=5):
    sa, sb = _shingles(a, w), _shingles(b, w)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(docs):
    groups = {r["keep_id"]: r["dup_count"] for r in D.exact_dedup_groups(docs).collect()}
    assert groups[0] == 3  # 0, 1, and 7 (same after normalization)
    kept = {r["doc_id"] for r in D.exact_dedup(docs).collect()}
    assert 0 in kept and 1 not in kept and 7 not in kept
    assert {2, 3, 4, 5, 6} <= kept


def test_ngram_jaccard_pairs(docs):
    rows = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert (0, 1) in rows and rows[(0, 1)] == 1.0
    assert (0, 2) in rows
    for (a, b), j in rows.items():
        assert abs(j - _jaccard(texts[a], texts[b])) < 1e-6


def test_minhash_near_dupes(docs):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in D.minhash_near_dupes(docs, threshold=0.3, n_bands=32).collect()}
    # 32 bands x 2 rows: LSH threshold (1/32)^(1/2) ~ 0.18 -> recall ~1 at j>=0.3
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 2) in got
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for (a, b), j in got.items():
        assert abs(j - _jaccard(texts[a], texts[b])) < 1e-6  # verified, not approximated


def test_simhash(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]  # identical text -> identical signature
    ham02 = bin(sigs[0] ^ sigs[2]).count("1")
    ham06 = bin(sigs[0] ^ sigs[6]).count("1")
    assert ham02 < ham06  # near-dup closer than unrelated
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_near_dupes(docs, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0
    with pytest.raises(ValueError):
        # pigeonhole blocking cannot guarantee recall past n_blocks - 1
        D.simhash_near_dupes(docs, max_hamming=8, n_blocks=4)


def test_portable_hashing_matches_duckdb(docs):
    """The md5-60 portable hash — the primitive the SQL oracles rebuild the
    minhash/simhash pipelines from — is bit-identical in Spark and DuckDB."""
    import duckdb

    got = {r["tok"]: r["h"] for r in docs.select(
        F.explode(TX.tokens_expr()).alias("tok")
    ).select("tok", D.portable_hash60_expr(F.col("tok")).alias("h")).collect()}
    con = duckdb.connect()
    for tok, h in list(got.items())[:50]:
        want = con.execute(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT)", [tok]
        ).fetchone()[0]
        assert h == want, tok


def test_minhash_portable_pipeline(docs):
    """Portable mode finds the same verified pairs as xxhash64 mode (the
    verify stage makes the output hash-function-independent at high recall)."""
    fast = {(r["id_a"], r["id_b"]) for r in
            D.minhash_near_dupes(docs, threshold=0.3, n_bands=32).collect()}
    portable = {(r["id_a"], r["id_b"]) for r in
                D.minhash_near_dupes(docs, threshold=0.3, n_bands=32, portable=True).collect()}
    assert (0, 1) in portable and (0, 2) in portable
    assert portable == fast


def test_text_quality_and_lang(docs):
    q = {r["doc_id"]: r for r in TX.quality_score(docs).collect()}
    assert q[0]["n_tokens"] == len(BASE.split())
    assert 0.0 <= q[0]["quality_score"] <= 1.0
    assert q[0]["alpha_ratio"] > 0.7
    lang = {r["doc_id"]: r["lang_guess"] for r in TX.language_scores(docs).collect()}
    assert lang[0] == "en" and lang[4] == "fr" and lang[5] == "de"


def test_fingerprint_and_rolling_hash(docs, spark):
    fp = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", TX.fingerprint_expr().alias("fp")).collect()}
    assert fp[0] == fp[7] != fp[2]
    norm = " ".join(BASE.lower().split())
    assert fp[0] == hashlib.md5(norm.encode()).hexdigest()
    rh = {r["doc_id"]: r["rh"] for r in docs.select("doc_id", TX.rolling_hash_expr().alias("rh")).collect()}
    expect = 0
    for ch in BASE:
        expect = (expect * 31 + ord(ch)) % 1_000_000_007
    assert rh[0] == expect


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    centers = rng.randn(4, 16)
    rows = []
    for i in range(60):
        c = centers[i % 4]
        v = c + 0.05 * rng.randn(16)
        rows.append((i, [float(x) for x in v]))
    v0 = np.array(rows[0][1])
    rows.append((60, [float(x) for x in v0 + 1e-4 * rng.randn(16)]))  # near-dup of vec 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_cosine_topk_matches_numpy(vectors):
    df, rows = vectors
    probes = df.where(F.col("vec_id") < 3)
    got = S.cosine_topk(probes, df, k=5).collect()
    mat = np.array([r[1] for r in rows])
    ids = np.array([r[0] for r in rows])
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for pid in range(3):
        cos = normed @ normed[pid]
        order = sorted(
            [(round(float(cos[j]), 6), int(ids[j])) for j in range(len(ids)) if ids[j] != pid],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        mine = sorted(
            [(r["cos"], r["neighbor_id"]) for r in got if r["probe_id"] == pid],
            key=lambda t: (-t[0], t[1]),
        )
        assert [t[1] for t in mine] == [t[1] for t in order]


def test_lsh_ann_recall(vectors):
    df, _ = vectors
    probes = df.where(F.col("vec_id") < 8)
    exact = {(r["probe_id"], r["neighbor_id"]) for r in S.cosine_topk(probes, df, k=3).collect()}
    approx = {(r["probe_id"], r["neighbor_id"]) for r in S.lsh_ann_topk(probes, df, k=3, dim=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # same-cluster vectors share hyperplane buckets


def test_lsh_multi_probe_improves_recall_at_fixed_bands(vectors):
    """Multi-probe flips the probe's lowest-margin sign bits: recall must
    dominate single-probe at the SAME bands/planes (corpus explode volume
    unchanged), and every extra candidate is still exact-cosine-verified."""
    df, _ = vectors
    probes = df.where(F.col("vec_id") < 8)
    exact = {(r["probe_id"], r["neighbor_id"])
             for r in S.cosine_topk(probes, df, k=3).collect()}

    def recall(multi_probe):
        got = {(r["probe_id"], r["neighbor_id"])
               for r in S.lsh_ann_topk(probes, df, k=3, dim=16,
                                       n_planes=24, n_bands=2,
                                       multi_probe=multi_probe).collect()}
        return len(exact & got) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0
    assert r2 >= 0.8  # narrow-band single-probe misses; probing recovers

    # probe bucket ids live in the corpus bucket space: base bucket (j=0)
    # must equal band_buckets_expr's id for the same vector
    row = probes.select(
        S.band_buckets_expr("embedding", 24, 2, dim=16).alias("base"),
        S.probe_buckets_expr("embedding", 24, 2, dim=16, n_flip=2).alias("mp"),
    ).first()
    assert row["mp"][0] == row["base"][0] and row["mp"][3] == row["base"][1]
    # flipped variants differ from base by exactly one power of two
    for band, j in ((0, 1), (0, 2), (1, 4), (1, 5)):
        d = row["mp"][j] ^ row["base"][band]
        assert d > 0 and (d & (d - 1)) == 0


def test_embedding_near_dupes(vectors):
    df, _ = vectors
    pairs = {(r["id_a"], r["id_b"]): r["cos"]
             for r in S.embedding_near_dupes(df, threshold=0.999, dim=16).collect()}
    assert (0, 60) in pairs  # the planted near-duplicate


def test_multimodal_plumbing(docs):
    media = MM.synth_media(docs)
    r = media.where(F.col("doc_id") == 0).collect()[0]
    assert bytes(r["payload"]).decode() == BASE
    assert r["media_meta"]["n_bytes"] == len(BASE)

    feats = {r["doc_id"]: r["features"] for r in MM.extract_features(media).collect()}
    assert len(feats[0]) == 8 and feats[0] == feats[1]  # deterministic, equal for dup text
    assert all(0.0 <= x <= 1.0 for x in feats[0])

    # the decode seam now defaults to the real PPM parser (ops/codecs.py);
    # fake payloads aren't PPM, so the decoder rejects them per-payload
    with pytest.raises(Exception, match="not a PPM"):
        MM.decode_image(media).collect()

    plan = MM.frame_sample_plan(media, every_n=1)
    assert plan.count() >= media.count()


def test_multimodal_resize_and_audio(spark, docs):
    media = MM.synth_media(docs)
    rz = {r["doc_id"]: r for r in MM.resize_pixels(media, out_n=4).collect()}
    assert all(0.0 <= rz[0][f"p{j}"] <= 1.0 for j in range(4))
    # nearest-neighbor: pixel 0 is the first byte of the payload
    assert rz[0]["p0"] == ord(BASE[0]) / 255.0

    en = {r["doc_id"]: r for r in MM.audio_energy(media, n_windows=2).collect()}
    assert en[0]["e0"] > 0.0 and en[0]["e1"] > 0.0

    # empty payload → all-zero features, no crash
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [(99, b"")],
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("payload", T.BinaryType())]),
    )
    r = MM.resize_pixels(empty, out_n=4).collect()[0]
    assert [r[f"p{j}"] for j in range(4)] == [0.0] * 4
    r = MM.audio_energy(empty, n_windows=2).collect()[0]
    assert [r["e0"], r["e1"]] == [0.0, 0.0]


def test_ivf_topk_recall(vectors):
    """IVF ANN: clustered vectors land in the same inverted list; recall vs
    exact brute force stays high with n_probe lists scanned per probe."""
    df, _ = vectors
    probes = df.where(F.col("vec_id") < 8)
    exact = {(r["probe_id"], r["neighbor_id"]) for r in S.cosine_topk(probes, df, k=3).collect()}
    approx = {(r["probe_id"], r["neighbor_id"])
              for r in S.ivf_topk(probes, df, k=3, n_lists=8, n_probe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7
    # deterministic across invocations (seeded centroids)
    again = {(r["probe_id"], r["neighbor_id"])
             for r in S.ivf_topk(probes, df, k=3, n_lists=8, n_probe=3).collect()}
    assert approx == again


def test_ivf_deterministic_across_partitionings(vectors):
    """The centroid sample is ordered by id before the limit, so the fitted
    model — and the full top-k result — is identical no matter how the input
    is partitioned (round 1 used an unordered limit)."""
    df, _ = vectors
    probes = df.where(F.col("vec_id") < 8)
    results = []
    for parts in (1, 7):
        r = S.ivf_topk(probes, df.repartition(parts), k=3, n_lists=8, n_probe=3)
        results.append(sorted(
            (x["probe_id"], x["rank"], x["neighbor_id"], x["cos"]) for x in r.collect()
        ))
    assert results[0] == results[1]


def test_band_buckets_rejects_int32_overflow():
    """ADVICE r2: > 31 sign bits per band would silently overflow the int32
    per-band bucket id — must raise, not corrupt buckets."""
    import pytest

    with pytest.raises(ValueError, match="31"):
        S.band_buckets_expr("embedding", n_planes=64, n_bands=1)
    # boundary: 31 bits per band is still fine (expression builds)
    S.band_buckets_expr("embedding", n_planes=62, n_bands=2)
