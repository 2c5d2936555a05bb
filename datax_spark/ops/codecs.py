"""Pure-Python media codecs proving the multimodal decode seam is real.

The sandbox has no PIL/cv2/soundfile, so ``ops/multimodal.py`` ships the
decode step as an injected-decoder seam. These stdlib-only parsers close the
loop: PPM (the canonical uncompressed image interchange format) and RIFF/WAVE
PCM (the canonical uncompressed audio container) decode REAL pixels/samples
through the same Arrow ``mapInPandas`` path a PIL/ffmpeg decoder would use —
swapping in a production codec changes one injected callable, nothing else.

Formats are public specs: PPM per netpbm (P6 binary / P3 ASCII, ``#``
comments, maxval); WAV per RIFF (fmt + data chunks, PCM 8-bit unsigned /
16-bit signed little-endian).
"""

from __future__ import annotations

import struct


# ------------------------------------------------------------------ PPM image

def encode_ppm(width: int, height: int, pixels: list[int]) -> bytes:
    """P6 binary PPM from a flat RGB list (len == w*h*3), for fixtures."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be w*h*3 RGB values")
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(pixels)


def _ppm_tokens(data: bytes, n: int, pos: int) -> tuple[list[bytes], int]:
    """Read n whitespace-separated header tokens, honoring '#' comments."""
    toks: list[bytes] = []
    cur = b""
    i = pos
    while len(toks) < n:
        if i >= len(data):
            raise ValueError("truncated PPM header")
        c = data[i:i + 1]
        if c == b"#":
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
        elif c in b" \t\r\n":
            if cur:
                toks.append(cur)
                cur = b""
        else:
            cur += c
        i += 1
    return toks, i


def decode_ppm(data: bytes) -> tuple[int, int, list[int]]:
    """(width, height, flat RGB list). P6 (binary) and P3 (ASCII) supported."""
    magic = data[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError(f"not a PPM payload (magic {magic!r})")
    toks, pos = _ppm_tokens(data, 3, 2)
    w, h, maxval = (int(t) for t in toks)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    if magic == b"P6":
        raw = data[pos:pos + n]
        if len(raw) < n:
            raise ValueError("truncated PPM pixel data")
        px = list(raw)
    else:
        vals = data[pos - 1:].split()
        if len(vals) < n:
            raise ValueError("truncated PPM pixel data")
        px = [int(v) for v in vals[:n]]
    if maxval != 255:
        px = [v * 255 // maxval for v in px]
    return w, h, px


def ppm_image_decoder(pdf, payload_col: str = "payload", id_col: str = "doc_id"):
    """Vectorized injected decoder for :func:`ops.multimodal.decode_image`:
    pandas batch of PPM payloads → (doc_id, pixels, width, height)."""
    import pandas as pd

    ids, pixels, ws, hs = [], [], [], []
    for i, raw in zip(pdf[id_col], pdf[payload_col]):
        w, h, px = decode_ppm(bytes(raw))
        ids.append(i)
        pixels.append(px)
        ws.append(w)
        hs.append(h)
    return pd.DataFrame({id_col: ids, "pixels": pixels, "width": ws, "height": hs})


# ------------------------------------------------------------------ WAV audio

def encode_wav(samples: list[int], sample_rate: int = 8000, channels: int = 1,
               bits: int = 16) -> bytes:
    """PCM RIFF/WAVE from interleaved integer samples, for fixtures."""
    if bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        frames = bytes((s + 128) & 0xFF for s in samples)  # 8-bit is unsigned
    else:
        raise ValueError("bits must be 8 or 16")
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, channels, interleaved samples). PCM 8/16-bit only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _br, _ba, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"only PCM supported (format {audio_fmt})")
    if bits == 16:
        samples = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    elif bits == 8:
        samples = [b - 128 for b in frames]
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return rate, channels, samples


def wav_audio_decoder(pdf, payload_col: str = "payload", id_col: str = "doc_id"):
    """Vectorized injected decoder for :func:`ops.multimodal.decode_audio`:
    pandas batch of WAV payloads → (doc_id, samples, sample_rate, channels)."""
    import pandas as pd

    ids, samples, rates, chans = [], [], [], []
    for i, raw in zip(pdf[id_col], pdf[payload_col]):
        rate, ch, s = decode_wav(bytes(raw))
        ids.append(i)
        samples.append(s)
        rates.append(rate)
        chans.append(ch)
    return pd.DataFrame({id_col: ids, "samples": samples,
                         "sample_rate": rates, "channels": chans})
