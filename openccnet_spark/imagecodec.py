"""Self-contained pure-Python PNG / BMP codec for multimodal columns.

The container has no image libraries (no PIL/ffmpeg), so the multimodal
operator's decode step is implemented here from the public specs:

* PNG  — ISO/IEC 15948 / RFC 2083 (zlib is stdlib; filters 0-4 incl.
  Paeth; color types 0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA;
  bit depths 1/2/4/8 for gray+palette, 8 elsewhere). Adam7 interlace and
  16-bit depth are explicitly rejected (clear error, not corruption).
* BMP  — Windows BITMAPINFOHEADER, uncompressed BI_RGB 24/32-bit and
  8-bit palettized, bottom-up and top-down row order, 4-byte row padding.

Encoders exist for both formats so tests and driver fixtures can
synthesize deterministic images without external data. Decoded output is
always 8-bit samples, rows top-to-bottom, channels interleaved.

Reference parity note: the reference repo (laisuk/OpenccNet) has no image
path at all — this module serves the LLM-pipeline multimodal brief, which
asks for real decode behind the Spark plumbing in
``operators/multimodal.py``.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> (mode name, channels)
_COLOR_TYPES = {0: ("L", 1), 2: ("RGB", 3), 3: ("P", 1), 4: ("LA", 2), 6: ("RGBA", 4)}


class ImageDecodeError(ValueError):
    """Raised for malformed or unsupported image payloads."""


@dataclass
class DecodedImage:
    """8-bit interleaved pixel buffer, rows top-to-bottom."""

    width: int
    height: int
    channels: int
    mode: str  # "L" | "LA" | "RGB" | "RGBA" (palette is expanded to RGB)
    format: str  # "png" | "bmp"
    pixels: bytes  # len == width * height * channels

    def channel_sums(self) -> tuple[int, int, int]:
        """Exact per-channel sums over (R, G, B) — alpha excluded, gray
        replicated to all three. Integer-exact, safe to oracle-check."""
        w, h, c, px = self.width, self.height, self.channels, self.pixels
        if c in (1, 2):  # gray / gray+alpha
            s = sum(px[0 :: c]) if c == 2 else sum(px)
            return s, s, s
        r = sum(px[0::c])
        g = sum(px[1::c])
        b = sum(px[2::c])
        return r, g, b


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int, stride: int) -> bytearray:
    """Reverse PNG scanline filtering. ``bpp`` = bytes per complete pixel
    (max(1, bits_per_pixel // 8)); ``stride`` = filtered bytes per row."""
    out = bytearray(height * stride)
    pos = 0
    prev_off = -stride
    for y in range(height):
        if pos >= len(raw):
            raise ImageDecodeError("PNG: truncated pixel data")
        ft = raw[pos]
        pos += 1
        row = raw[pos : pos + stride]
        if len(row) < stride:
            raise ImageDecodeError("PNG: truncated scanline")
        pos += stride
        off = y * stride
        if ft == 0:
            out[off : off + stride] = row
        elif ft == 1:  # Sub
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (row[i] + left) & 0xFF
        elif ft == 2:  # Up
            if y == 0:
                out[off : off + stride] = row
            else:
                for i in range(stride):
                    out[off + i] = (row[i] + out[off + prev_off + i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[off + prev_off + i] if y > 0 else 0
                out[off + i] = (row[i] + ((left + up) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[off + prev_off + i] if y > 0 else 0
                ul = out[off + prev_off + i - bpp] if (y > 0 and i >= bpp) else 0
                out[off + i] = (row[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ImageDecodeError(f"PNG: unknown filter type {ft}")
    return out


def _expand_bits(row: bytes, width: int, depth: int) -> bytes:
    """Unpack sub-byte samples (depth 1/2/4) to one byte per sample,
    scaled to 8-bit range (left-bit-replication per the PNG spec)."""
    out = bytearray(width)
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    scale = 255 // mask
    for x in range(width):
        byte = row[x // per_byte]
        shift = 8 - depth * (x % per_byte + 1)
        out[x] = ((byte >> shift) & mask) * scale
    return bytes(out)


def decode_png(data: bytes) -> DecodedImage:
    if not data.startswith(_PNG_SIG):
        raise ImageDecodeError("PNG: bad signature")
    pos = len(_PNG_SIG)
    width = height = depth = color_type = None
    palette = b""
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ImageDecodeError("PNG: truncated chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) < 4 or struct.unpack(">I", crc)[0] != zlib.crc32(ctype + body):
            raise ImageDecodeError(f"PNG: CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ImageDecodeError(f"PNG: IHDR length {len(body)} != 13")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ImageDecodeError("PNG: unknown compression/filter method")
            if interlace != 0:
                raise ImageDecodeError("PNG: Adam7 interlace not supported")
            if color_type not in _COLOR_TYPES:
                raise ImageDecodeError(f"PNG: unknown color type {color_type}")
            ok_depths = (1, 2, 4, 8) if color_type in (0, 3) else (8,)
            if depth not in ok_depths:
                raise ImageDecodeError(
                    f"PNG: bit depth {depth} not supported for color type {color_type}"
                )
            if width == 0 or height == 0 or width * height > 64_000_000:
                raise ImageDecodeError("PNG: bad dimensions")
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
    if width is None:
        raise ImageDecodeError("PNG: missing IHDR")
    if not seen_iend:
        raise ImageDecodeError("PNG: missing IEND")
    mode, channels = _COLOR_TYPES[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # pragma: no cover - corrupt stream
        raise ImageDecodeError(f"PNG: zlib error: {exc}") from exc
    bits_per_px = depth * channels
    stride = (width * bits_per_px + 7) // 8
    bpp = max(1, bits_per_px // 8)
    if len(raw) != height * (stride + 1):
        raise ImageDecodeError(
            f"PNG: pixel data length {len(raw)} != expected {height * (stride + 1)}"
        )
    flat = _unfilter(raw, width, height, bpp, stride)
    if depth < 8:
        rows = [
            _expand_bits(flat[y * stride : (y + 1) * stride], width, depth)
            for y in range(height)
        ]
        flat = bytearray(b"".join(rows))
    if color_type == 3:
        if not palette or len(palette) % 3:
            raise ImageDecodeError("PNG: palette image without valid PLTE")
        n_entries = len(palette) // 3
        if depth < 8:
            # _expand_bits scaled indexes; undo the scale to recover them
            scale = 255 // ((1 << depth) - 1)
            idx = bytes(v // scale for v in flat)
        else:
            idx = bytes(flat)
        out = bytearray(width * height * 3)
        for i, v in enumerate(idx):
            if v >= n_entries:
                raise ImageDecodeError("PNG: palette index out of range")
            out[3 * i : 3 * i + 3] = palette[3 * v : 3 * v + 3]
        return DecodedImage(width, height, 3, "RGB", "png", bytes(out))
    return DecodedImage(width, height, channels, mode, "png", bytes(flat))


# ---------------------------------------------------------------------------
# PNG encode
# ---------------------------------------------------------------------------

_MODE_TO_COLOR = {"L": (0, 1), "RGB": (2, 3), "LA": (4, 2), "RGBA": (6, 4)}


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _filter_row(
    ft: int, row: bytes, prev: bytes, bpp: int
) -> bytes:
    if ft == 0:
        return row
    out = bytearray(len(row))
    for i in range(len(row)):
        left = row[i - bpp] if i >= bpp else 0
        up = prev[i] if prev else 0
        ul = (prev[i - bpp] if i >= bpp else 0) if prev else 0
        if ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, ul)
        out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    filter_type: int = 0,
) -> bytes:
    """Write an 8-bit PNG. ``filter_type`` 0-4 applies that filter to every
    row (lossless either way — tests use it to exercise the decoder)."""
    color_type, channels = _MODE_TO_COLOR[mode]
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    stride = width * channels
    parts = []
    prev = b""
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        parts.append(bytes([filter_type]) + _filter_row(filter_type, row, prev, channels))
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, BI_RGB)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> DecodedImage:
    if len(data) < 54 or data[:2] != b"BM":
        raise ImageDecodeError("BMP: bad signature")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ImageDecodeError(f"BMP: header size {hdr_size} not supported")
    width, raw_height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ImageDecodeError(f"BMP: compression {compression} not supported")
    if bpp not in (8, 24, 32):
        raise ImageDecodeError(f"BMP: {bpp}-bit not supported")
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    if width <= 0 or height <= 0 or width * height > 64_000_000:
        raise ImageDecodeError("BMP: bad dimensions")
    palette = b""
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        palette = data[pal_off : pal_off + 4 * n_colors]  # BGRA quads
        if len(palette) < 4 * n_colors:
            raise ImageDecodeError("BMP: truncated palette")
    src_stride = ((width * bpp + 31) // 32) * 4
    need = src_stride * height
    body = data[pixel_off : pixel_off + need]
    if len(body) < need:
        raise ImageDecodeError("BMP: truncated pixel data")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = body[src_y * src_stride : src_y * src_stride + src_stride]
        dst = y * width * 3
        if bpp == 8:
            for x in range(width):
                q = 4 * row[x]
                if q + 3 > len(palette):
                    raise ImageDecodeError("BMP: palette index out of range")
                out[dst + 3 * x + 0] = palette[q + 2]  # R
                out[dst + 3 * x + 1] = palette[q + 1]  # G
                out[dst + 3 * x + 2] = palette[q + 0]  # B
        else:
            step = bpp // 8
            for x in range(width):
                o = x * step
                out[dst + 3 * x + 0] = row[o + 2]
                out[dst + 3 * x + 1] = row[o + 1]
                out[dst + 3 * x + 2] = row[o + 0]
    return DecodedImage(width, height, 3, "RGB", "bmp", bytes(out))


def encode_bmp(width: int, height: int, pixels: bytes, top_down: bool = False) -> bytes:
    """Write a 24-bit BI_RGB BMP from an RGB buffer (rows top-to-bottom)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    stride = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - width * 3)
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = pixels[y * width * 3 : (y + 1) * width * 3]
        bgr = bytearray(len(row))
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        rows.append(bytes(bgr) + pad)
    body = b"".join(rows)
    raw_h = -height if top_down else height
    info = struct.pack("<IiiHHIIiiII", 40, width, raw_h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return file_hdr + info + body


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> DecodedImage:
    """Sniff the container by magic and decode. Raises ImageDecodeError for
    anything that is not a supported PNG/BMP."""
    if data.startswith(_PNG_SIG):
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise ImageDecodeError("unrecognized image payload (not PNG/BMP)")
