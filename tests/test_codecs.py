"""Pure-Python PPM/WAV codecs through the multimodal decode seam: real
pixels and PCM samples flow the same Arrow mapInPandas path a PIL/ffmpeg
decoder would use — the decode step is no longer a stub."""

from __future__ import annotations

import pytest

from datax_spark.ops.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)
from datax_spark.ops.multimodal import decode_audio, decode_image


def test_ppm_roundtrip_and_variants():
    px = [r for i in range(6) for r in (i * 10, i * 10 + 1, i * 10 + 2)]
    data = encode_ppm(3, 2, px)
    assert decode_ppm(data) == (3, 2, px)
    # comments in the header are legal netpbm
    commented = data.replace(b"P6\n", b"P6\n# made by a test\n", 1)
    assert decode_ppm(commented) == (3, 2, px)
    # P3 (ASCII) variant
    ascii_ppm = ("P3\n3 2\n255\n" + " ".join(str(v) for v in px)).encode()
    assert decode_ppm(ascii_ppm) == (3, 2, px)
    # maxval scaling
    scaled = b"P3\n1 1\n100\n100 50 0"
    assert decode_ppm(scaled) == (1, 1, [255, 127, 0])
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(data[:-4])
    with pytest.raises(ValueError, match="not a PPM"):
        decode_ppm(b"JFIF....")


def test_wav_roundtrip_and_variants():
    samples = [0, 1000, -1000, 32767, -32768, 7]
    data = encode_wav(samples, sample_rate=16000, channels=2)
    assert decode_wav(data) == (16000, 2, samples)
    # 8-bit unsigned PCM
    s8 = [0, 10, -10, 127, -128]
    assert decode_wav(encode_wav(s8, bits=8)) == (8000, 1, s8)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS....")
    with pytest.raises(ValueError, match="only PCM"):
        bad = bytearray(encode_wav(samples))
        bad[20] = 3  # format tag -> IEEE float
        decode_wav(bytes(bad))


def test_decode_image_through_arrow_path(spark):
    imgs = {
        1: (2, 2, list(range(12))),
        2: (1, 3, [9, 8, 7, 6, 5, 4, 3, 2, 1]),
    }
    df = spark.createDataFrame(
        [(i, bytearray(encode_ppm(w, h, px))) for i, (w, h, px) in imgs.items()],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: (r.width, r.height, list(r.pixels))
           for r in decode_image(df).collect()}
    assert out == imgs  # exact pixels through mapInPandas


def test_decode_audio_through_arrow_path(spark):
    clips = {1: [0, 5, -5, 100], 2: [32767, -32768]}
    df = spark.createDataFrame(
        [(i, bytearray(encode_wav(s, sample_rate=22050))) for i, s in clips.items()],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: (r.sample_rate, r.channels, list(r.samples))
           for r in decode_audio(df).collect()}
    assert out == {i: (22050, 1, s) for i, s in clips.items()}
