"""Pure-Python PNG/BMP codec tests (no Spark). The decoder backs the
multimodal_decode driver query; these pin the spec corners the oracle's
closed-form fixtures don't reach: every filter type, palette + sub-byte
depths, alpha modes, BMP 8/24/32-bit both row orders, and malformed input
rejection."""

from __future__ import annotations

import random
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openccnet_spark.imagecodec import (
    DecodedImage,
    ImageDecodeError,
    _PNG_SIG,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _raw_png(width, height, depth, color_type, scanlines: bytes, plte: bytes = b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("mode,channels", [("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_all_modes_filters(mode, channels, filter_type):
    rnd = random.Random(hash((mode, filter_type)) & 0xFFFF)
    w, h = rnd.randint(1, 41), rnd.randint(1, 29)
    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    img = decode_png(encode_png(w, h, px, mode, filter_type))
    assert (img.width, img.height, img.channels, img.mode) == (w, h, channels, mode)
    assert img.pixels == px
    assert img.format == "png"


def test_png_width_one_exercises_left_predictors():
    # width 1 => "left" and "upper-left" are always 0 in Sub/Average/Paeth
    px = bytes([7, 200, 3, 9, 250])
    for ft in range(5):
        assert decode_png(encode_png(1, 5, px, "L", ft)).pixels == px


def test_png_palette_depth8():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    idx_rows = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 1, 0])
    img = decode_png(_raw_png(3, 2, 8, 3, idx_rows, plte))
    assert (img.width, img.height, img.mode, img.channels) == (3, 2, "RGB", 3)
    assert img.pixels == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )


def test_png_palette_depth4():
    plte = bytes([10, 20, 30, 40, 50, 60])
    # 3 px/row at depth 4 -> 2 bytes per row: indexes 0,1,0 -> 0x01 0x00
    rows = b"\x00" + bytes([0x01, 0x00]) + b"\x00" + bytes([0x10, 0x10])
    img = decode_png(_raw_png(3, 2, 4, 3, rows, plte))
    assert img.pixels == bytes(
        [10, 20, 30, 40, 50, 60, 10, 20, 30, 40, 50, 60, 10, 20, 30, 40, 50, 60][:18]
    )


@pytest.mark.parametrize("depth,samples,expected", [
    (1, [1, 0, 1, 1, 0, 1, 0, 0], [255, 0, 255, 255, 0, 255, 0, 0]),
    (2, [0, 1, 2, 3], [0, 85, 170, 255]),
    (4, [0, 5, 15, 8], [0, 85, 255, 136]),
])
def test_png_subbyte_grayscale(depth, samples, expected):
    per_byte = 8 // depth
    row = bytearray((len(samples) + per_byte - 1) // per_byte)
    for i, s in enumerate(samples):
        row[i // per_byte] |= s << (8 - depth * (i % per_byte + 1))
    img = decode_png(_raw_png(len(samples), 1, depth, 0, b"\x00" + bytes(row)))
    assert list(img.pixels) == expected


def test_png_crc_mismatch_rejected():
    data = bytearray(encode_png(4, 4, bytes(48), "RGB"))
    idat = data.index(b"IDAT")
    data[idat + 5] ^= 0x01
    with pytest.raises(ImageDecodeError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_interlace_and_16bit():
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = _PNG_SIG + _chunk(b"IHDR", ihdr_i)
    with pytest.raises(ImageDecodeError, match="Adam7"):
        decode_png(bad + _chunk(b"IEND", b""))
    ihdr_16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    with pytest.raises(ImageDecodeError, match="bit depth"):
        decode_png(_PNG_SIG + _chunk(b"IHDR", ihdr_16) + _chunk(b"IEND", b""))


def test_png_truncated_and_bad_filter():
    good = encode_png(3, 3, bytes(27), "RGB")
    with pytest.raises(ImageDecodeError):
        decode_png(good[:-8])  # IEND cut off
    # wrong pixel-data length: 1 row instead of 2
    with pytest.raises(ImageDecodeError, match="length"):
        decode_png(_raw_png(2, 2, 8, 0, b"\x00\x01\x02"))
    with pytest.raises(ImageDecodeError, match="filter type"):
        decode_png(_raw_png(2, 1, 8, 0, b"\x09\x01\x02"))


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_24bit_round_trip(top_down):
    rnd = random.Random(7 if top_down else 8)
    w, h = 5, 3  # stride 15 -> 1 pad byte
    px = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    img = decode_bmp(encode_bmp(w, h, px, top_down=top_down))
    assert (img.width, img.height, img.pixels) == (w, h, px)
    assert img.format == "bmp"


def test_bmp_32bit():
    # hand-build a 2x2 32-bit BGRA bottom-up image
    rows = [
        bytes([1, 2, 3, 0, 4, 5, 6, 0]),   # bottom row: px(3,2,1) px(6,5,4) RGB
        bytes([7, 8, 9, 0, 10, 11, 12, 0]),  # top row
    ]
    body = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 32, 0, len(body), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    img = decode_bmp(hdr + info + body)
    assert img.pixels == bytes([9, 8, 7, 12, 11, 10, 3, 2, 1, 6, 5, 4])


def test_bmp_8bit_palette():
    pal = bytes([30, 20, 10, 0, 60, 50, 40, 0])  # BGRA quads: colors (10,20,30),(40,50,60)
    # 3x1, stride pads to 4
    body = bytes([0, 1, 0, 0])
    info = struct.pack("<IiiHHIIiiII", 40, 3, 1, 1, 8, 0, len(body), 0, 0, 2, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 8 + len(body), 0, 0, 14 + 40 + 8)
    img = decode_bmp(hdr + info + pal + body)
    assert img.pixels == bytes([10, 20, 30, 40, 50, 60, 10, 20, 30])


def test_bmp_rejects_compressed_and_truncated():
    good = bytearray(encode_bmp(2, 2, bytes(12)))
    bad = bytearray(good)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ImageDecodeError, match="compression"):
        decode_bmp(bytes(bad))
    with pytest.raises(ImageDecodeError, match="truncated"):
        decode_bmp(bytes(good[:-3]))


def test_dispatch_and_channel_sums():
    img = decode_image(encode_png(2, 1, bytes([10, 20, 30, 40, 50, 60]), "RGB"))
    assert img.channel_sums() == (50, 70, 90)
    gray = decode_image(encode_png(2, 1, bytes([5, 9]), "L"))
    assert gray.channel_sums() == (14, 14, 14)
    la = DecodedImage(2, 1, 2, "LA", "png", bytes([5, 255, 9, 0]))
    assert la.channel_sums() == (14, 14, 14)  # alpha excluded
    rgba = decode_image(encode_png(1, 1, bytes([1, 2, 3, 200]), "RGBA"))
    assert rgba.channel_sums() == (1, 2, 3)
    with pytest.raises(ImageDecodeError, match="unrecognized"):
        decode_image(b"GIF89a not supported")


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    mode=st.sampled_from(["L", "LA", "RGB", "RGBA"]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31),
)
def test_png_property_round_trip(w, h, mode, ft, seed):
    channels = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    rnd = random.Random(seed)
    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    assert decode_png(encode_png(w, h, px, mode, ft)).pixels == px


@settings(max_examples=20, deadline=None)
@given(w=st.integers(1, 24), h=st.integers(1, 16), td=st.booleans(), seed=st.integers(0, 2**31))
def test_bmp_property_round_trip(w, h, td, seed):
    rnd = random.Random(seed)
    px = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, px, top_down=td)).pixels == px
