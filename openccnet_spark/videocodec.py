"""Self-contained pure-Python GIF frame codec for multimodal video columns.

The container has no video libraries (no ffmpeg/PyAV), so the multimodal
operator's frame-sampling path decodes animated GIF — a real, ubiquitous
frame-sequence format whose spec (GIF87a/89a, CompuServe; public) is
small enough to implement exactly:

* logical screen descriptor + global color table;
* per-frame image descriptors with optional local color tables and
  offsets into the logical screen;
* LZW-compressed pixel indices (variable code width, CLEAR/EOI codes,
  12-bit table cap);
* graphic control extensions (frame delay, transparency index) parsed;
  other extensions skipped by their sub-block structure.

Interlaced frames are rejected explicitly (clear error, not corruption).
Frames are returned as palette-resolved RGB bytes so downstream feature
extraction matches the image codec's conventions.

The encoder builds valid animated GIFs for deterministic fixtures: pixel
indices are LZW-coded with the always-emit-literal + periodic-CLEAR
strategy (spec-valid, trivially correct, mildly sub-optimal — fixtures
only).

Reference parity note: the reference repo (laisuk/OpenccNet) has no video
path at all — this module serves the LLM-pipeline multimodal brief
(sibling of ``imagecodec.py`` / ``audiocodec.py``), behind the Spark
plumbing in ``operators/multimodal.py``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


class VideoDecodeError(ValueError):
    """Raised for malformed or unsupported video payloads."""


@dataclass
class GifFrame:
    """One decoded frame composited onto the logical screen: RGB bytes,
    rows top-to-bottom (same conventions as ``DecodedImage``)."""

    index: int
    width: int
    height: int
    delay_cs: int  # centiseconds, from the graphic control extension
    pixels: bytes  # len == width * height * 3 (RGB)

    def channel_sums(self) -> tuple[int, int, int]:
        px = self.pixels
        return sum(px[0::3]), sum(px[1::3]), sum(px[2::3])


@dataclass
class DecodedVideo:
    width: int
    height: int
    frames: list[GifFrame]
    format: str = "gif"


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF LZW: variable-width codes growing to 12 bits, CLEAR resets the
    table, EOI terminates. Emits exactly ``expected`` indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = eoi + 1
    prev: bytes | None = None
    while bitpos + width <= nbits:
        byte = bitpos >> 3
        # little-endian bit packing: read up to 3 bytes covering the code
        chunk = int.from_bytes(data[byte : byte + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise VideoDecodeError("GIF: bad first LZW code")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise VideoDecodeError("GIF: LZW code out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise VideoDecodeError("GIF: truncated LZW pixel data")
    return out[:expected]


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[list[tuple], int]:
    table = [
        (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
        for i in range(n)
    ]
    return table, pos + 3 * n


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise VideoDecodeError("GIF: truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise VideoDecodeError("GIF: truncated sub-block")
        out += data[pos : pos + n]
        pos += n


def decode_gif(data: bytes) -> DecodedVideo:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise VideoDecodeError("GIF: bad signature")
    if len(data) < 13:
        raise VideoDecodeError("GIF: truncated header")
    width, height = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    global_table: list[tuple] | None = None
    if packed & 0x80:
        global_table, pos = _read_color_table(data, pos, 2 << (packed & 7))
    frames: list[GifFrame] = []
    delay_cs = 0
    transparent: int | None = None
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = _read_subblocks(data, pos)
                if len(blk) >= 4:
                    delay_cs = blk[1] | (blk[2] << 8)
                    transparent = blk[3] if blk[0] & 1 else None
            else:
                _, pos = _read_subblocks(data, pos)
            continue
        if b != 0x2C:  # image descriptor
            raise VideoDecodeError(f"GIF: unexpected block 0x{b:02x}")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", data, pos)
        fpacked = data[pos + 8]
        pos += 9
        if fpacked & 0x40:
            raise VideoDecodeError("GIF: interlaced frames unsupported")
        table = global_table
        if fpacked & 0x80:
            table, pos = _read_color_table(data, pos, 2 << (fpacked & 7))
        if table is None:
            raise VideoDecodeError("GIF: frame with no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, lzw, fw * fh)
        # composite onto the logical screen over the previous frame
        # (disposal handling: 'do not dispose' semantics — enough for the
        # frame-feature use case; transparency keeps the prior pixel)
        if frames:
            canvas = bytearray(frames[-1].pixels)
        else:
            canvas = bytearray(width * height * 3)
        for y in range(fh):
            row = (fy + y) * width
            for x in range(fw):
                i = idx[y * fw + x]
                if transparent is not None and i == transparent:
                    continue
                if i >= len(table):
                    raise VideoDecodeError("GIF: palette index out of range")
                off = (row + fx + x) * 3
                canvas[off : off + 3] = bytes(table[i])
        frames.append(
            GifFrame(len(frames), width, height, delay_cs, bytes(canvas))
        )
        transparent = None  # a graphic control extension scopes ONE image
    if not frames:
        raise VideoDecodeError("GIF: no frames")
    return DecodedVideo(width, height, frames)


def decode_video(data: bytes) -> DecodedVideo:
    """Sniff-and-decode dispatcher (GIF is the only frame-sequence format
    the codec ships; anything else raises for the opaque fallback)."""
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    raise VideoDecodeError("not a supported video payload")


# ---------------------------------------------------------------------------
# encoder (deterministic fixtures)
# ---------------------------------------------------------------------------


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Spec-valid LZW: every pixel emitted as a literal code with a CLEAR
    before each (code width stays min_code_size+1 forever — the decoder's
    table never grows past EOI+1). Trivially correct; fixtures only."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
    put(clear)
    for i in indices:
        put(i)
        put(clear)  # keep the table (and the code width) fixed
    put(eoi)
    stream = acc.to_bytes((nbits + 7) // 8, "little")
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple],
    frames: list[bytes],
    delay_cs: int = 4,
) -> bytes:
    """Animated GIF89a from palette-index frames (each ``width*height``
    bytes). Palette is padded to a power-of-two size; full-screen frames,
    no transparency, 'do not dispose'."""
    n = 2
    while n < len(palette):
        n <<= 1
    n = max(n, 2)
    pal = list(palette) + [(0, 0, 0)] * (n - len(palette))
    depth = n.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (depth - 1), 0, 0])
    for r, g, b in pal:
        out += bytes([r, g, b])
    # netscape loop extension (standard for animation)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(depth, 2)
    for fr in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += bytes([min_code]) + _lzw_encode(min_code, fr)
    out += b"\x3b"
    return bytes(out)
