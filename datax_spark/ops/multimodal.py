"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct — the same shape a production ingest uses (the bytes are
opaque to Spark; Catalyst prunes/partitions around them). The codec step is
an injected-callable seam with REAL pure-Python defaults (``ops.codecs``:
PPM pixels, RIFF/WAVE PCM samples — stdlib only, since PIL/cv2/ffmpeg are
absent from this sandbox); a production deployment swaps in PIL/ffmpeg
decoders without touching the Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning — which is tested end-to-end.
``extract_features`` additionally ships a deterministic fake featureizer so
feature pipelines are SQL-oracle-checkable bit-for-bit.

At 100 TB: binary payloads dominate bytes; the plumbing keeps them
out of shuffles (features are computed in a map-only pass; only the small
feature vectors shuffle).
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_FIELDS = "media_type string, width int, height int, n_bytes int"


def synth_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text, metadata
    derived from its length (stands in for a real image/audio column)."""
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.pmod(n, F.lit(640)).cast("int").alias("width"),
            F.pmod(n, F.lit(480)).cast("int").alias("height"),
            n.cast("int").alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_image(df: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Decode payload bytes to pixel arrays via an injected vectorized decoder.

    ``decoder(pdf) -> pdf`` runs over Arrow pandas batches. The sandbox has
    no PIL/cv2, but the seam is NOT a stub: ``ops.codecs.ppm_image_decoder``
    (pure stdlib PPM parser) decodes real pixels through this exact path —
    the default here. Swap in a PIL/cv2-backed callable for JPEG/PNG.
    """
    if decoder is None:
        from datax_spark.ops.codecs import ppm_image_decoder

        decoder = ppm_image_decoder
    schema = "doc_id long, pixels array<int>, width int, height int"

    def gen(it: Iterator) -> Iterator:
        for pdf in it:
            yield decoder(pdf)

    return df.mapInPandas(gen, schema=schema)


def decode_audio(df: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Audio twin of :func:`decode_image`: payload bytes → PCM samples via an
    injected vectorized decoder; defaults to the stdlib RIFF/WAVE parser
    (``ops.codecs.wav_audio_decoder``). Map-only: binaries never shuffle."""
    if decoder is None:
        from datax_spark.ops.codecs import wav_audio_decoder

        decoder = wav_audio_decoder
    schema = "doc_id long, samples array<int>, sample_rate int, channels int"

    def gen(it: Iterator) -> Iterator:
        for pdf in it:
            yield decoder(pdf)

    return df.mapInPandas(gen, schema=schema)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_features: int = 8,
) -> DataFrame:
    """Deterministic fake feature extraction over Arrow batches.

    Stands in for a real embedding/perceptual-hash model: features are a
    stable function of the payload bytes (xxhash-free, numpy-only), computed
    batch-at-a-time in ``mapInPandas`` — the exact plumbing a real model UDF
    uses (vectorized, map-only, no shuffle of the binary column).
    """
    schema = f"{id_col} long, features array<double>"

    def gen(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                if len(b) == 0:
                    feats.append([0.0] * n_features)
                    continue
                # integer byte sums are exact in float64 regardless of order,
                # so mean/255 is bit-reproducible by the SQL oracle
                chunks = np.array_split(b.astype(np.float64), n_features)
                feats.append([float(c.mean()) / 255.0 if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(gen, schema=schema)


def resize_pixels(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    out_n: int = 16,
) -> DataFrame:
    """Nearest-neighbor resize over the payload byte stream (deterministic
    fake for an image resize: a real decoder yields a (h, w) grid and the
    2-D resize is the same gather with row-major index arithmetic — this
    sandbox's fake metadata dims don't factor n_bytes, so the op resizes the
    1-D stream). Sample j of ``out_n`` reads byte floor(j*n/out_n); output is
    ``out_n`` scalar columns p0..p{out_n-1} in [0, 1]. Map-only over Arrow
    batches: the binary column never shuffles, only the tiny resized rows do.
    """
    cols = ", ".join(f"p{j} double" for j in range(out_n))
    schema = f"{id_col} long, {cols}"

    def gen(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                n = len(b)
                if n == 0:
                    rows.append([0.0] * out_n)
                    continue
                idx = (np.arange(out_n, dtype=np.int64) * n) // out_n
                rows.append((b[idx].astype(np.float64) / 255.0).tolist())
            out = pd.DataFrame(rows, columns=[f"p{j}" for j in range(out_n)])
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(gen, schema=schema)


def audio_energy(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_windows: int = 4,
) -> DataFrame:
    """Windowed RMS energy over the payload byte stream (deterministic fake
    for an audio feature pass: bytes stand in for PCM samples). Windows use
    np.array_split boundaries (first n%k windows one longer); RMS =
    sqrt(mean(byte^2))/255 — integer squares sum exactly in float64 and IEEE
    sqrt is correctly rounded, so a SQL oracle reproduces it bit-for-bit.
    Same map-only shape as :func:`extract_features`."""
    cols = ", ".join(f"e{j} double" for j in range(n_windows))
    schema = f"{id_col} long, {cols}"

    def gen(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for raw in pdf[payload_col]:
                b = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.float64)
                if len(b) == 0:
                    rows.append([0.0] * n_windows)
                    continue
                rows.append([
                    float(np.sqrt((w * w).sum() / len(w))) / 255.0 if len(w) else 0.0
                    for w in np.array_split(b, n_windows)
                ])
            out = pd.DataFrame(rows, columns=[f"e{j}" for j in range(n_windows)])
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(gen, schema=schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling *plan* for video payloads: emit (doc, frame_idx) rows
    for frames 0, n, 2n, ... based on metadata — pure Catalyst (the decode of
    each sampled frame would be a decoder UDF as above)."""
    n_frames = F.greatest((F.col("media_meta.n_bytes") / 1000).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(F.col(id_col), F.explode(idx).alias("frame_idx"))
