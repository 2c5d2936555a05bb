"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct — the same shape a production ingest uses (the bytes are
opaque to Spark; Catalyst prunes/partitions around them). The actual codec
step is STUBBED (no image/audio libraries in this sandbox): ``decode_image``
raises ``NotImplementedError`` unless a decoder is injected, and
``extract_features`` ships a deterministic fake featureizer so the Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signature, partitioning
— is real and tested end-to-end.

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

    ``decoder(pdf) -> pdf`` runs over Arrow pandas batches. No decoder ships
    in this sandbox (no PIL/cv2): calling without one raises, by design.
    """
    if decoder is None:
        raise NotImplementedError(
            "no image codec in this environment; inject decoder=fn(pdf)->pdf "
            "(e.g. PIL-based) to materialize pixels"
        )
    schema = "doc_id long, pixels array<int>, width int, height int"

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


def frame_sample_plan(df: DataFrame, every_n: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling *plan* for video payloads: emit (doc, frame_idx) rows
    for frames 0, n, 2n, ... based on metadata — pure Catalyst (the decode of
    each sampled frame would be a decoder UDF as above)."""
    n_frames = F.greatest((F.col("media_meta.n_bytes") / 1000).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(F.col(id_col), F.explode(idx).alias("frame_idx"))
