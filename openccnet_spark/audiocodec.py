"""Self-contained pure-Python WAV/PCM codec for multimodal audio columns.

The container has no audio libraries (no soundfile/ffmpeg), so the
multimodal operator's audio decode is implemented here from the public
RIFF/WAVE format (Microsoft/IBM multimedia spec; the same layout every
`.wav` reader consumes):

* RIFF container — 'RIFF' <size> 'WAVE' followed by <id, size, payload>
  chunks, odd-sized chunks padded to even offsets.
* 'fmt ' chunk — format tag 1 (integer PCM) with 8-bit (unsigned) or
  16-bit (signed little-endian) samples, any channel count / sample rate.
  Other format tags (float, ADPCM, extensible) and bit depths are rejected
  with a clear error, never mis-decoded.
* 'data' chunk — interleaved sample frames; n_samples = len // block_align.

The encoder exists so tests and driver fixtures can synthesize
deterministic audio without external data. Decoded samples keep the WAV
conventions: 8-bit values are unsigned (0..255, midpoint 128), 16-bit are
signed (-32768..32767) — per-channel integer sums over those values are
exact and oracle-checkable in closed-form SQL.

Reference parity note: the reference repo (laisuk/OpenccNet) has no audio
path at all — this module serves the LLM-pipeline multimodal brief
(sibling of ``imagecodec.py``), behind the Spark plumbing in
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


class AudioDecodeError(ValueError):
    """Raised for malformed or unsupported audio payloads."""


@dataclass
class DecodedAudio:
    """PCM frames plus the fmt-chunk metadata."""

    sample_rate: int
    channels: int
    bits: int  # 8 (unsigned) or 16 (signed LE)
    n_samples: int  # frames per channel
    frames: bytes  # raw interleaved PCM, len == n_samples * block_align
    format: str = "wav"

    def channel_sums(self) -> tuple[int, int]:
        """Exact int sums of the first two channels' sample values
        (8-bit: unsigned 0..255; 16-bit: signed). Mono replicates channel
        0 — same convention as ``DecodedImage.channel_sums`` gray
        replication — so the output schema is fixed-width."""
        if self.bits == 8:
            vals = self.frames  # unsigned bytes
            step = self.channels
            s0 = sum(vals[0::step])
            s1 = sum(vals[1::step]) if self.channels >= 2 else s0
            return s0, s1
        vals = struct.unpack(f"<{self.n_samples * self.channels}h", self.frames)
        step = self.channels
        s0 = sum(vals[0::step])
        s1 = sum(vals[1::step]) if self.channels >= 2 else s0
        return s0, s1


def decode_wav(data: bytes) -> DecodedAudio:
    """Parse a RIFF/WAVE payload into PCM frames + metadata."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioDecodeError("WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise AudioDecodeError(f"WAV: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise AudioDecodeError("WAV: fmt chunk too short")
            tag, channels, rate, _brate, balign, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1:
                raise AudioDecodeError(f"WAV: unsupported format tag {tag} (PCM only)")
            if bits not in (8, 16):
                raise AudioDecodeError(f"WAV: unsupported bit depth {bits}")
            if channels < 1:
                raise AudioDecodeError("WAV: zero channels")
            if balign != channels * (bits // 8):
                raise AudioDecodeError("WAV: block align inconsistent with fmt")
            fmt = (channels, rate, bits, balign)
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # odd chunks pad to even offsets
    if fmt is None:
        raise AudioDecodeError("WAV: missing fmt chunk")
    if frames is None:
        raise AudioDecodeError("WAV: missing data chunk")
    channels, rate, bits, balign = fmt
    n_samples = len(frames) // balign
    frames = frames[: n_samples * balign]  # drop a trailing partial frame
    return DecodedAudio(rate, channels, bits, n_samples, frames)


def encode_wav(
    sample_rate: int, channels: int, bits: int, samples: list[int]
) -> bytes:
    """Build a canonical RIFF/WAVE payload from interleaved sample values
    (8-bit: 0..255 unsigned; 16-bit: signed). Round-trips through
    ``decode_wav`` bit-exactly."""
    if bits == 8:
        frames = bytes(v & 0xFF for v in samples)
    elif bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    else:
        raise ValueError(f"encode_wav: unsupported bit depth {bits}")
    balign = channels * (bits // 8)
    if len(samples) % channels:
        raise ValueError("encode_wav: sample count not a multiple of channels")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * balign, balign, bits
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
        + (b"\x00" if len(frames) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_audio(data: bytes) -> DecodedAudio:
    """Sniff-and-decode dispatcher (WAV is the only audio container the
    codec ships; anything else raises for the caller's opaque fallback)."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    raise AudioDecodeError("not a supported audio payload")
