"""LZO codec: hand-assembled instruction vectors for every LZO1X opcode
class (derived by executing the kernel Documentation/lzo.txt encoding on
paper), compressor/decompressor roundtrip properties, lzop container
framing incl. checksum failure, raw block-stream framing, and the
CSV-over-LZO reader end-to-end."""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.sources.lzo import (  # noqa: E402
    LzoError,
    lzo1x_compress,
    lzo1x_decompress,
    lzo_block_stream_compress,
    lzo_block_stream_decompress,
    lzop_compress,
    lzop_decompress,
)

EOS = b"\x11\x00\x00"


def test_literal_only_streams():
    # long literal run at stream start: opcode L=10 -> length 3+10=13
    assert lzo1x_decompress(bytes([10]) + b"hello world!!" + EOS) == b"hello world!!"
    # first-byte shortcut: 17+3 -> 3 leading literals
    assert lzo1x_decompress(bytes([20]) + b"abc" + EOS) == b"abc"
    # empty stream is just EOS
    assert lzo1x_decompress(EOS) == b""


def test_m2_short_match_vector():
    # "abcd" then M2 copy len 4 dist 4: opcode 01 1 011 00 = 0x6C, H=0
    stream = bytes([21]) + b"abcd" + bytes([0x6C, 0x00]) + EOS
    assert lzo1x_decompress(stream) == b"abcdabcd"


def test_m2_overlapping_rle_vector():
    # "a" then M2 copy len 7 dist 1 (overlap => RLE): 1 10 000 00 = 0xC0, H=0
    stream = bytes([18]) + b"a" + bytes([0xC0, 0x00]) + EOS
    assert lzo1x_decompress(stream) == b"a" * 8


def test_state_dependent_near_match_vector():
    # 2 leading literals (state=2) then opcode 0..15: 2-byte copy,
    # dist=(H<<2)+D+1 with D=1,H=0 -> 2 : opcode 0000 01 00 = 4
    stream = bytes([19]) + b"xy" + bytes([4, 0]) + EOS
    assert lzo1x_decompress(stream) == b"xyxy"


def test_state4_far_match_vector():
    # literal run of 2060 (opcode 0 + ext: 15 + 8*255 + 2 = 2057 = L,
    # length 3+2057), then state=4 opcode 0: 3-byte copy dist 2049
    lit = bytes((i * 7 + 3) % 256 for i in range(2060))
    stream = (bytes([0]) + b"\x00" * 8 + bytes([2]) + lit
              + bytes([0, 0]) + EOS)
    got = lzo1x_decompress(stream)
    assert got == lit + lit[2060 - 2049:2060 - 2049 + 3]


def test_m4_long_distance_vector():
    # 17000 literals then M4: insn 0001 0 010 = 18 (len 2+2=4),
    # LE16 = 4 -> D=1, S=0 -> dist 16385
    lit = bytes((i * 13 + 1) % 256 for i in range(17000))
    ext = 17000 - 3 - 15  # = zeros*255 + last
    zeros, last = divmod(ext - 1, 255)
    stream = (bytes([0]) + b"\x00" * zeros + bytes([last + 1]) + lit
              + bytes([18, 4, 0]) + EOS)
    got = lzo1x_decompress(stream)
    assert got == lit + lit[17000 - 16385:17000 - 16385 + 4]


def test_decoder_rejects_corruption():
    with pytest.raises(LzoError):
        lzo1x_decompress(bytes([21]) + b"ab")  # truncated literals
    with pytest.raises(LzoError):
        # match before start of output: M2 at stream start (state 0)
        lzo1x_decompress(bytes([0x6C, 0x00]) + EOS)
    with pytest.raises(LzoError):
        lzo1x_decompress(bytes([10]) + b"x" * 13 + EOS, out_len=99)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_roundtrip_random(data):
    assert lzo1x_decompress(lzo1x_compress(data)) == data


@settings(max_examples=80, deadline=None)
@given(st.lists(st.sampled_from([b"conv", b"-", b"0012", b"turn", b"\n",
                                 b"assistant,", b"hello world "]),
                min_size=0, max_size=400))
def test_roundtrip_repetitive_text(parts):
    data = b"".join(parts)
    comp = lzo1x_compress(data)
    assert lzo1x_decompress(comp) == data
    if len(data) > 200:
        assert len(comp) < len(data)  # repetitive text must actually shrink


def test_roundtrip_pathological_shapes():
    for data in (b"", b"a", b"ab", b"abc", b"a" * 100_000,
                 bytes(range(256)) * 40, b"ab" * 9000):
        assert lzo1x_decompress(lzo1x_compress(data)) == data


def test_lzop_container_roundtrip_multiblock():
    data = (b"conv-%d,assistant,hello world\n" * 2000) % tuple(range(2000))
    blob = lzop_compress(data, block_size=4096, name=b"t.csv")
    assert lzop_decompress(blob) == data
    assert len(blob) < len(data)


def test_lzop_stored_block_path():
    import random

    rnd = random.Random(7)
    data = bytes(rnd.getrandbits(8) for _ in range(5000))  # incompressible
    blob = lzop_compress(data, block_size=2048)
    assert lzop_decompress(blob) == data


def test_lzop_checksum_and_magic_failures():
    data = b"hello hello hello hello"
    blob = bytearray(lzop_compress(data))
    with pytest.raises(LzoError, match="magic"):
        lzop_decompress(b"\x00" + bytes(blob[1:]))
    blob[15] ^= 0xFF  # flip a header flag byte -> header checksum mismatch
    with pytest.raises(LzoError):
        lzop_decompress(bytes(blob))
    blob2 = bytearray(lzop_compress(data))
    blob2[-4] ^= 0xFF  # corrupt last block payload byte
    with pytest.raises(LzoError):
        lzop_decompress(bytes(blob2))


def test_block_stream_roundtrip():
    data = b"0123456789" * 5000
    blob = lzo_block_stream_compress(data, block_size=8192)
    assert lzo_block_stream_decompress(blob) == data
    assert lzo_block_stream_decompress(b"") == b""


def test_csv_over_lzo_reader(spark, tmp_path):
    from datax_spark.sources.readers import build_reader

    rows = "".join(f"c{i:04d},{i},{i * 3 % 7}\n" for i in range(500))
    lzop_path = tmp_path / "data.csv.lzo"
    lzop_path.write_bytes(lzop_compress(rows.encode(), block_size=4096))
    raw_path = tmp_path / "data.csv.lzo_deflate"
    raw_path.write_bytes(lzo_block_stream_compress(rows.encode()))

    got = build_reader(spark, "csvreader", {
        "path": str(lzop_path), "compress": "lzo",
        "schema": "id string, a long, b long",
    }).toPandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 500
    assert got.loc[7, "id"] == "c0007" and int(got.loc[7, "a"]) == 7

    got2 = build_reader(spark, "csvreader", {
        "path": str(raw_path), "compress": "lzo_deflate",
        "schema": "id string, a long, b long",
    }).toPandas()
    assert sorted(got2["id"]) == sorted(got["id"])
