"""GIF frame codec tests: LZW decode (table growth, KwKwK), compositing
with offsets/transparency, error paths, the closed-form synth fixture, and
the Spark multimodal video plumbing."""

from __future__ import annotations

import struct

import pytest

from openccnet_spark.videocodec import (
    VideoDecodeError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_video,
    encode_gif,
)

PAL4 = [(0, 0, 0), (10, 20, 30), (40, 50, 60), (70, 80, 90)]


def _pack_codes(pairs) -> bytes:
    acc = 0
    nbits = 0
    for code, width in pairs:
        acc |= code << nbits
        nbits += width
    return acc.to_bytes((nbits + 7) // 8, "little")


def test_lzw_decode_table_growth_and_kwkwk():
    # min_code_size=2: CLEAR=4, EOI=5; codes 0,1 build table[6]="01",
    # code 6 builds table[7]="10" (next_code hits 8 -> width grows to 4),
    # code 8 is the KwKwK case ("01"+"0").
    data = _pack_codes([(4, 3), (0, 3), (1, 3), (6, 3), (8, 4), (5, 4)])
    out = _lzw_decode(2, data, 7)
    assert bytes(out) == bytes([0, 1, 0, 1, 0, 1, 0])


def test_lzw_decode_errors():
    with pytest.raises(VideoDecodeError, match="out of range"):
        _lzw_decode(2, _pack_codes([(4, 3), (0, 3), (7, 3)]), 5)
    with pytest.raises(VideoDecodeError, match="truncated"):
        _lzw_decode(2, _pack_codes([(4, 3), (0, 3), (5, 3)]), 5)


def test_roundtrip_animated():
    frames = [bytes((f + x) % 4 for x in range(12)) for f in range(3)]
    vid = decode_gif(encode_gif(4, 3, PAL4, frames, delay_cs=6))
    assert (vid.width, vid.height, len(vid.frames)) == (4, 3, 3)
    for f, fr in enumerate(vid.frames):
        assert (fr.index, fr.delay_cs) == (f, 6)
        exp = [0, 0, 0]
        for x in range(12):
            for c in range(3):
                exp[c] += PAL4[(f + x) % 4][c]
        assert fr.channel_sums() == tuple(exp)


def _gce(delay_cs: int, transparent: int | None = None) -> bytes:
    flags = 1 if transparent is not None else 0
    return (
        b"\x21\xf9\x04"
        + bytes([flags])
        + struct.pack("<H", delay_cs)
        + bytes([transparent if transparent is not None else 0])
        + b"\x00"
    )


def _image(x, y, w, h, indices, local_pal=None, packed=0):
    out = b"\x2c" + struct.pack("<HHHH", x, y, w, h)
    if local_pal is not None:
        depth = len(local_pal).bit_length() - 1
        out += bytes([0x80 | packed | (depth - 1)])
        for r, g, b in local_pal:
            out += bytes([r, g, b])
    else:
        out += bytes([packed])
    return out + b"\x02" + _lzw_encode(2, bytes(indices))


def test_composite_offsets_transparency_and_local_table():
    """Frame 2 is a 2x1 sub-rectangle at (1,1) with its own color table and
    a transparent index: the transparent pixel keeps frame 1's color,
    the opaque one takes the LOCAL table's color."""
    local = [(200, 0, 0), (0, 200, 0), (0, 0, 200), (5, 5, 5)]
    data = (
        b"GIF89a"
        + struct.pack("<HH", 4, 3)
        + bytes([0x81, 0, 0])  # global table, 4 entries
        + b"".join(bytes(c) for c in PAL4)
        + _gce(5)
        + _image(0, 0, 4, 3, [1] * 12)
        + _gce(7, transparent=3)
        + _image(1, 1, 2, 1, [2, 3], local_pal=local)
        + b"\x3b"
    )
    vid = decode_gif(data)
    assert len(vid.frames) == 2
    f1, f2 = vid.frames
    assert f1.delay_cs == 5 and f2.delay_cs == 7
    px = f2.pixels
    assert px[(1 * 4 + 1) * 3 : (1 * 4 + 1) * 3 + 3] == bytes((0, 0, 200))
    # transparent index -> prior frame's color survives
    assert px[(1 * 4 + 2) * 3 : (1 * 4 + 2) * 3 + 3] == bytes(PAL4[1])
    # comment extension between frames is skipped by sub-block structure
    comment = b"\x21\xfe\x05hello\x00"
    vid2 = decode_gif(data[:-1] + comment + b"\x3b")
    assert len(vid2.frames) == 2


@pytest.mark.parametrize(
    "mangle, msg",
    [
        (lambda p: b"JIF89a" + p[6:], "signature"),
        (lambda p: p[:10], "truncated"),
        (lambda p: p.replace(b"\x2c", b"\x2a", 1), "unexpected block"),
    ],
)
def test_decode_errors(mangle, msg):
    payload = encode_gif(4, 3, PAL4, [bytes(12)])
    with pytest.raises(VideoDecodeError, match=msg):
        decode_gif(mangle(payload))


def test_interlaced_rejected():
    data = (
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + bytes([0x81, 0, 0])
        + b"".join(bytes(c) for c in PAL4)
        + _image(0, 0, 2, 2, [0, 1, 2, 3], packed=0x40)
        + b"\x3b"
    )
    with pytest.raises(VideoDecodeError, match="interlaced"):
        decode_gif(data)


def test_decode_video_dispatch_rejects_non_video():
    with pytest.raises(VideoDecodeError):
        decode_video(b"not video at all")
    with pytest.raises(VideoDecodeError):
        decode_video(b"RIFF\x00\x00\x00\x00WAVE")


def test_synth_payload_matches_closed_form():
    """The driver fixture's decoded frames equal the oracle's closed form."""
    from openccnet_spark.operators.multimodal import (
        _SYNTH_PALETTE,
        synth_video_payload,
    )

    for doc_id in (0, 3, 20, 37, 105):
        vid = decode_video(synth_video_payload(doc_id))
        w, h = 8 + doc_id % 9, 6 + doc_id % 5
        assert (vid.width, vid.height) == (w, h)
        assert len(vid.frames) == 4 + doc_id % 7
        for fr in vid.frames:
            exp = [0, 0, 0]
            for y in range(h):
                for x in range(w):
                    col = _SYNTH_PALETTE[(doc_id + 3 * x + 5 * y + 7 * fr.index) % 16]
                    for c in range(3):
                        exp[c] += col[c]
            assert fr.channel_sums() == tuple(exp)


def test_spark_video_frames_and_opaque_fallback(spark):
    """sample_video_frames over synthetic GIFs emits every-2nd-frame
    features; text payloads take the documented opaque fallback."""
    from openccnet_spark.operators.multimodal import (
        sample_video_frames,
        with_binary_payload,
        with_synth_video_payload,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} body text") for i in range(5)], "doc_id long, text string"
    )
    rows = sample_video_frames(
        with_synth_video_payload(docs), every_n=2
    ).collect()
    by_doc = {}
    for r in rows:
        assert r.format == "gif" and r.delay_cs == 4
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for i in range(5):
        n_frames = 4 + i % 7
        assert sorted(by_doc[i]) == list(range(0, n_frames, 2))
    opaque = sample_video_frames(with_binary_payload(docs)).collect()
    assert len(opaque) == 5
    assert all(r.format == "opaque" and r.frame_idx is None for r in opaque)
