"""WAV/PCM codec tests: round-trips, error paths, channel sums, and the
Spark multimodal audio plumbing."""

from __future__ import annotations

import struct

import pytest

from openccnet_spark.audiocodec import (
    AudioDecodeError,
    decode_audio,
    decode_wav,
    encode_wav,
)


def test_roundtrip_16bit_stereo():
    samples = [((7 * i) % 4096) - 2048 for i in range(400)]  # 200 frames x 2ch
    payload = encode_wav(16000, 2, 16, samples)
    au = decode_wav(payload)
    assert (au.sample_rate, au.channels, au.bits, au.n_samples) == (16000, 2, 16, 200)
    assert list(struct.unpack("<400h", au.frames)) == samples
    s0, s1 = au.channel_sums()
    assert s0 == sum(samples[0::2])
    assert s1 == sum(samples[1::2])


def test_roundtrip_8bit_mono_replicates_channel0():
    samples = [(13 * i) % 256 for i in range(333)]
    au = decode_wav(encode_wav(8000, 1, 8, samples))
    assert (au.sample_rate, au.channels, au.bits, au.n_samples) == (8000, 1, 8, 333)
    s0, s1 = au.channel_sums()
    assert s0 == sum(samples)
    assert s1 == s0  # mono replicates, like gray images


def test_odd_data_chunk_is_padded_and_parses():
    # 8-bit mono with an odd frame count -> odd data chunk, pad byte added
    payload = encode_wav(8000, 1, 8, [1, 2, 3])
    assert len(payload) % 2 == 0
    assert decode_wav(payload).n_samples == 3


def test_extra_chunks_skipped():
    base = encode_wav(8000, 1, 8, [10, 20])
    # splice a LIST chunk between fmt and data
    fmt_end = base.index(b"data")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    au = decode_wav(spliced)
    assert au.n_samples == 2 and au.channel_sums() == (30, 30)


@pytest.mark.parametrize(
    "mangle, msg",
    [
        (lambda p: b"XXXX" + p[4:], "signature"),
        (lambda p: p.replace(b"fmt ", b"fmtX"), "missing fmt"),
        (lambda p: p.replace(b"data", b"dato"), "missing data"),
        (lambda p: p[: p.index(b"fmt ") + 8] + struct.pack("<H", 3) + p[p.index(b"fmt ") + 10 :], "format tag"),
    ],
)
def test_malformed_rejected(mangle, msg):
    payload = encode_wav(8000, 1, 8, [1, 2])
    with pytest.raises(AudioDecodeError, match=msg):
        decode_wav(mangle(payload))


def test_unsupported_bit_depth_rejected():
    with pytest.raises(ValueError, match="bit depth"):
        encode_wav(8000, 1, 24, [0])
    # hand-build a 32-bit fmt header
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 32000, 4, 32)
    body = b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(AudioDecodeError, match="bit depth"):
        decode_wav(payload)


def test_decode_audio_dispatch_rejects_non_audio():
    with pytest.raises(AudioDecodeError):
        decode_audio(b"not audio at all")
    with pytest.raises(AudioDecodeError):
        decode_audio(b"\x89PNG\r\n\x1a\n rest")


def test_synth_payload_matches_closed_form():
    """The driver fixture's decoded sums equal the oracle's closed form."""
    from openccnet_spark.operators.multimodal import synth_audio_payload

    for doc_id in (0, 5, 16, 27, 93):
        au = decode_audio(synth_audio_payload(doc_id))
        n = 200 + doc_id % 331
        channels = 1 + doc_id % 2
        bits = 8 if doc_id % 3 == 0 else 16
        assert (au.n_samples, au.channels, au.bits) == (n, channels, bits)
        assert au.sample_rate == 8000 + (doc_id % 5) * 1000
        exp = []
        for c in range(2):
            cc = min(c, channels - 1)
            s = sum(
                (doc_id * 13 + 7 * i + 11 * cc) % 256
                if bits == 8
                else (doc_id * 13 + 7 * i + 11 * cc) % 4096 - 2048
                for i in range(n)
            )
            exp.append(s)
        assert au.channel_sums() == tuple(exp)


def test_spark_audio_features_and_opaque_fallback(spark):
    """extract_audio_features over synthetic WAVs decodes real metadata;
    text payloads take the documented opaque fallback."""
    from pyspark.sql import functions as F

    from openccnet_spark.operators.multimodal import (
        extract_audio_features,
        with_binary_payload,
        with_synth_audio_payload,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} body text") for i in range(6)], "doc_id long, text string"
    )
    feats = {
        r.doc_id: r
        for r in extract_audio_features(with_synth_audio_payload(docs)).collect()
    }
    assert all(r.format == "wav" for r in feats.values())
    assert feats[3].bits == 8 and feats[4].bits == 16
    assert feats[1].channels == 2 and feats[2].channels == 1
    opaque = extract_audio_features(with_binary_payload(docs)).collect()
    assert all(r.format == "opaque" and r.sample_rate is None for r in opaque)
    assert all(r.n_bytes > 0 for r in opaque)
