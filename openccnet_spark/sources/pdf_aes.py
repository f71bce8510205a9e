"""Compact pure-Python AES (FIPS-197) + CBC helpers for PDF decryption.

No crypto wheel ships in this sandbox; PDF's AES crypt filters (/AESV2 =
AES-128-CBC, /AESV3 = AES-256-CBC) need block decryption, and revision 6
key derivation (Algorithm 2.B) additionally needs block ENCRYPTION, so
both directions are implemented. Tables are derived from the GF(2^8)
arithmetic in the public standard rather than pasted blobs. Performance
is irrelevant here (keys and short streams), correctness is pinned to the
FIPS-197 appendix vectors in tests.
"""

from __future__ import annotations

# --- GF(2^8) tables (generator 3) -------------------------------------------

_LOG = [0] * 256
_ALOG = [0] * 256
_x = 1
for _i in range(255):
    _ALOG[_i] = _x
    _LOG[_x] = _i
    _x ^= (_x << 1) ^ (0x11B if _x & 0x80 else 0)
    _x &= 0xFF


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _ALOG[(_LOG[a] + _LOG[b]) % 255]


def _rotl8(v: int, n: int) -> int:
    return ((v << n) | (v >> (8 - n))) & 0xFF


_SBOX = [0] * 256
_INV_SBOX = [0] * 256
for _i in range(256):
    # (255 - log) mod 255: log(1) == 0 must map to alog[0] == 1, not the
    # never-populated alog[255]
    inv = _ALOG[(255 - _LOG[_i]) % 255] if _i else 0
    s = inv ^ _rotl8(inv, 1) ^ _rotl8(inv, 2) ^ _rotl8(inv, 3) ^ _rotl8(inv, 4) ^ 0x63
    _SBOX[_i] = s
    _INV_SBOX[s] = _i

_RCON = [0x01]
for _i in range(13):
    _RCON.append(_gmul(_RCON[-1], 2))


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as a list of (Nr+1) 16-byte lists."""
    nk = len(key) // 4
    nr = {4: 10, 6: 12, 8: 14}[nk]
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _shift_rows(s: list[int], inv: bool) -> list[int]:
    out = [0] * 16
    for r in range(4):
        for c in range(4):
            src_c = (c + r) % 4 if not inv else (c - r) % 4
            out[r + 4 * c] = s[r + 4 * src_c]
    return out


def _mix_columns(s: list[int], inv: bool) -> list[int]:
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    out = [0] * 16
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            out[4 * c + r] = (
                _gmul(m[0], col[r])
                ^ _gmul(m[1], col[(r + 1) % 4])
                ^ _gmul(m[2], col[(r + 2) % 4])
                ^ _gmul(m[3], col[(r + 3) % 4])
            )
    return out


def encrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    s = [b ^ k for b, k in zip(block, rk[0])]
    for r in range(1, len(rk) - 1):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s, inv=False)
        s = _mix_columns(s, inv=False)
        s = [b ^ k for b, k in zip(s, rk[r])]
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s, inv=False)
    s = [b ^ k for b, k in zip(s, rk[-1])]
    return bytes(s)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    s = [b ^ k for b, k in zip(block, rk[-1])]
    for r in range(len(rk) - 2, 0, -1):
        s = _shift_rows(s, inv=True)
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rk[r])]
        s = _mix_columns(s, inv=True)
    s = _shift_rows(s, inv=True)
    s = [_INV_SBOX[b] for b in s]
    s = [b ^ k for b, k in zip(s, rk[0])]
    return bytes(s)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]  # tolerate ragged tails
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, blk), prev))
        prev = blk
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    assert len(data) % 16 == 0
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = encrypt_block(key, blk)
        out += prev
    return bytes(out)


def strip_pkcs7(data: bytes) -> bytes:
    if not data:
        return data
    pad = data[-1]
    if 1 <= pad <= 16 and pad <= len(data):
        return data[:-pad]
    return data
