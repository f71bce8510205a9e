"""Interop loader for the reference's serialized dictionary bundles.

The reference publishes ``DictionaryMaxlength`` packs as JSON, CBOR, and
Zstd-compressed JSON (``OpenccNetLib/DictionaryLib.cs:552-583,618-646,
1715-1806``): a map of the 21 slot names to ``{Dict, MaxLength, MinLength,
LengthMask, LongLengths}``. This module loads those files into our
``DictionaryBundle``:

* only the ``Dict`` payload is taken — the length metadata is UTF-16-unit
  based and is always recomputed here in code points (SURVEY.md §1.2);
* CBOR is decoded by a small self-contained RFC 8949 reader (major types
  0-7, definite + indefinite lengths) — no third-party dependency;
* Zstd-compressed JSON decodes through the ``zstandard`` wheel when one is
  installed, else through the self-contained pure-Python RFC 8878 decoder
  in ``zstd_decode.py`` — all three reference fixture formats
  (``OpenccNetTests/data/dictionary_maxlength.{json,cbor}``,
  ``OpenccNetLib/dicts/dictionary_maxlength.zstd``) load with no
  third-party dependency.

Compat-ideograph and DeTofu tables are not part of the reference's bundle
serialization (they live in separate ``dicts/*.txt`` data), so they are
carried over from the default compiled bundle.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

from .dictionary import SLOTS, DictionaryBundle, load_bundle

_BREAK = object()


def decode_cbor(data: bytes):
    """Decode one CBOR item (RFC 8949). Returns the Python value."""
    value, pos = _decode_item(data, 0)
    if value is _BREAK:
        raise ValueError("unexpected CBOR break code at top level")
    return value


def _read_uint(data: bytes, pos: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, pos
    if info == 24:
        return data[pos], pos + 1
    if info == 25:
        return int.from_bytes(data[pos : pos + 2], "big"), pos + 2
    if info == 26:
        return int.from_bytes(data[pos : pos + 4], "big"), pos + 4
    if info == 27:
        return int.from_bytes(data[pos : pos + 8], "big"), pos + 8
    raise ValueError(f"unsupported CBOR additional info {info}")


def _decode_item(data: bytes, pos: int):
    ib = data[pos]
    pos += 1
    major, info = ib >> 5, ib & 0x1F
    if major == 0:  # unsigned int
        return _read_uint(data, pos, info)
    if major == 1:  # negative int
        n, pos = _read_uint(data, pos, info)
        return -1 - n, pos
    if major in (2, 3):  # byte / text string
        if info == 31:  # indefinite: concat definite chunks
            chunks = []
            while data[pos] != 0xFF:
                chunk, pos = _decode_item(data, pos)
                chunks.append(chunk)
            joined = b"".join(chunks) if major == 2 else "".join(chunks)
            return joined, pos + 1
        n, pos = _read_uint(data, pos, info)
        raw = data[pos : pos + n]
        return (raw if major == 2 else raw.decode("utf-8")), pos + n
    if major == 4:  # array
        out = []
        if info == 31:
            while True:
                item, pos = _decode_item(data, pos)
                if item is _BREAK:
                    return out, pos
                out.append(item)
        n, pos = _read_uint(data, pos, info)
        for _ in range(n):
            item, pos = _decode_item(data, pos)
            out.append(item)
        return out, pos
    if major == 5:  # map
        out = {}
        if info == 31:
            while True:
                key, pos = _decode_item(data, pos)
                if key is _BREAK:
                    return out, pos
                val, pos = _decode_item(data, pos)
                out[key] = val
            # unreachable
        n, pos = _read_uint(data, pos, info)
        for _ in range(n):
            key, pos = _decode_item(data, pos)
            val, pos = _decode_item(data, pos)
            out[key] = val
        return out, pos
    if major == 6:  # tag: decode and return the tagged item
        _, pos = _read_uint(data, pos, info)
        return _decode_item(data, pos)
    # major == 7: simple values / floats / break
    if info == 20:
        return False, pos
    if info == 21:
        return True, pos
    if info in (22, 23):
        return None, pos
    if info == 25:  # half float
        return _half_float(data[pos : pos + 2]), pos + 2
    if info == 26:
        return struct.unpack(">f", data[pos : pos + 4])[0], pos + 4
    if info == 27:
        return struct.unpack(">d", data[pos : pos + 8])[0], pos + 8
    if info == 31:
        return _BREAK, pos
    if info < 24:
        return info, pos  # other simple values, returned numerically
    if info == 24:
        return data[pos], pos + 1
    raise ValueError(f"unsupported CBOR simple/float info {info}")


def _half_float(b: bytes) -> float:
    h = int.from_bytes(b, "big")
    sign, exp, frac = (h >> 15) & 1, (h >> 10) & 0x1F, h & 0x3FF
    if exp == 0:
        val = frac * 2.0**-24
    elif exp == 31:
        val = float("inf") if frac == 0 else float("nan")
    else:
        val = (frac + 1024) * 2.0 ** (exp - 25)
    return -val if sign else val


def _slot_dict(entry) -> dict:
    """Extract the key->value payload from one serialized slot (field name
    is ``Dict`` in the JSON serialization, ``dict`` in CBOR)."""
    for name in ("Dict", "dict"):
        if name in entry:
            return dict(entry[name])
    raise ValueError(f"slot entry missing Dict payload (keys: {list(entry)[:5]})")


def load_reference_bundle(path: str | Path, base: DictionaryBundle | None = None) -> DictionaryBundle:
    """Load a reference-format bundle file into a ``DictionaryBundle``.

    Format chosen by extension: ``.json`` / ``.cbor`` / ``.zstd`` (Zstd
    via the ``zstandard`` wheel when installed, else the built-in
    pure-Python RFC 8878 decoder). Compat / DeTofu tables come from
    ``base`` (default: the compiled bundle).
    """
    p = Path(path)
    raw = p.read_bytes()
    suffix = p.suffix.lower()
    if suffix == ".cbor":
        doc = decode_cbor(raw)
    elif suffix == ".zstd":
        try:
            import zstandard  # fast path when a codec wheel is installed

            payload = zstandard.ZstdDecompressor().decompress(raw)
        except ImportError:
            # self-contained RFC 8878 decoder (same spirit as the CBOR
            # reader above) — the reference's .zstd fixture loads with
            # no third-party dependency
            from .zstd_decode import decompress

            payload = decompress(raw)
        doc = json.loads(payload.decode("utf-8"))
    else:
        doc = json.loads(raw.decode("utf-8"))
    missing = [s for s in SLOTS if s not in doc]
    if missing:
        raise ValueError(f"reference bundle missing slots: {missing}")
    slots = {s: _slot_dict(doc[s]) for s in SLOTS}
    base = base or load_bundle()
    return DictionaryBundle(
        slots,
        {chr(k): v for k, v in base.compat_table.items()},
        {k: [v, e] for k, (v, e) in base.detofu.items()},
        {"source": str(p), "format": suffix.lstrip(".") or "json"},
    )


__all__ = ["decode_cbor", "load_reference_bundle"]
