"""PDF standard security handler (PDF 1.7 §7.6.3 / PDF 2.0 §7.6.4).

Covers both the common EMPTY-user-password case (permissions-only
encryption that every viewer opens transparently) and SUPPLIED user or
owner passwords:

* Algorithm 2  — file encryption key from a user password, /O, /P, the
  first document ID, for revisions 2 and 3/4;
* Algorithm 4/5 — user-password verification against /U;
* Algorithm 7  — owner-password verification (decrypt /O back to the
  padded user password, then authenticate it);
* Algorithm 2.A/2.B — AES-256 (V5 revisions 5/6) user AND owner paths,
  with the revision-6 iterated hash;
* per-object keys (md5 of file key + object number + generation), RC4.

A wrong password degrades via the caller's ``encryption_unsupported``
surface (pages extract as empty). All algorithms here are from the
public PDF specification; AES primitives live in ``pdf_aes.py``.
"""

from __future__ import annotations

import hashlib

#: the spec's 32-byte password padding string (PDF 1.7 §7.6.3.3)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 stream cipher (symmetric: encrypts and decrypts)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_file_key(
    user_pw: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    revision: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(user_pw))
    h.update(o_entry[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if revision >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def compute_o_entry(owner_pw: bytes, user_pw: bytes, revision: int, key_len: int) -> bytes:
    """Algorithm 3: the /O value (needed by the test fixture WRITER)."""
    key = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    rc4_key = key[:key_len]
    o = rc4(rc4_key, _pad_password(user_pw))
    if revision >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def compute_u_entry(file_key: bytes, id0: bytes, revision: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R>=3): the /U value."""
    if revision == 2:
        return rc4(file_key, PAD)
    x = hashlib.md5(PAD + id0).digest()
    x = rc4(file_key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in file_key), x)
    return x + b"\x00" * 16  # last 16 bytes arbitrary per spec


def authenticate_user_password(
    user_pw: bytes,
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    id0: bytes,
    revision: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """File key if ``user_pw`` verifies against /U, else None."""
    key = compute_file_key(user_pw, o_entry, p, id0, revision, key_len, encrypt_metadata)
    expect = compute_u_entry(key, id0, revision)
    got = bytes(u_entry)
    ok = expect[:16] == got[:16] if revision >= 3 else expect == got[:32]
    return key if ok else None


def authenticate_owner_password(
    owner_pw: bytes,
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    id0: bytes,
    revision: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 7: file key if ``owner_pw`` verifies. Decrypting /O with
    the owner-derived RC4 key recovers the PADDED user password, which
    then authenticates through the normal user path (re-padding a 32-byte
    padded password is the identity, so it can be passed straight in)."""
    key = hashlib.md5(_pad_password(owner_pw)).digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    rc4_key = key[:key_len]
    if revision == 2:
        user_pad = rc4(rc4_key, bytes(o_entry)[:32])
    else:
        user_pad = bytes(o_entry)[:32]
        for i in range(19, -1, -1):
            user_pad = rc4(bytes(b ^ i for b in rc4_key), user_pad)
    return authenticate_user_password(
        user_pad, o_entry, u_entry, p, id0, revision, key_len, encrypt_metadata
    )


def object_key(file_key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """Per-object key (PDF 1.7 Algorithm 1; AES appends the 'sAlT' bytes)."""
    h = hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


# --- revision 5/6 (AES-256, /V 5) -------------------------------------------


def hash_2b(password: bytes, salt: bytes, udata: bytes, revision: int = 6) -> bytes:
    """PDF 2.0 Algorithm 2.B (revision 6 iterated hash; revision 5 is a
    single SHA-256). Needs AES-128-CBC ENCRYPTION for the iteration."""
    from .pdf_aes import cbc_encrypt

    k = hashlib.sha256(password + salt + udata).digest()
    if revision < 6:
        return k
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        mod = int.from_bytes(e[:16], "big") % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def authenticate_user_password_v5(
    user_pw: bytes, u_entry: bytes, ue_entry: bytes, revision: int
) -> bytes | None:
    """PDF 2.0 Algorithm 2.A, user-password path: the 32-byte file key if
    ``user_pw`` validates against the 48-byte /U, decrypted from /UE."""
    from .pdf_aes import cbc_decrypt

    u = bytes(u_entry)
    if len(u) < 48:
        return None
    vsalt, ksalt = u[32:40], u[40:48]
    if hash_2b(user_pw, vsalt, b"", revision) != u[:32]:
        return None
    intermediate = hash_2b(user_pw, ksalt, b"", revision)
    # AES-256-CBC, zero IV, NO padding (the payload is exactly 32 bytes)
    return cbc_decrypt(intermediate, b"\x00" * 16, bytes(ue_entry))[:32]


def authenticate_owner_password_v5(
    owner_pw: bytes, o_entry: bytes, oe_entry: bytes, u_entry: bytes, revision: int
) -> bytes | None:
    """PDF 2.0 Algorithm 2.A, owner-password path: the owner hash salts
    come from /O and the full 48-byte /U participates as ``udata``."""
    from .pdf_aes import cbc_decrypt

    o, u = bytes(o_entry), bytes(u_entry)
    if len(o) < 48 or len(u) < 48:
        return None
    vsalt, ksalt = o[32:40], o[40:48]
    if hash_2b(owner_pw, vsalt, u[:48], revision) != o[:32]:
        return None
    intermediate = hash_2b(owner_pw, ksalt, u[:48], revision)
    return cbc_decrypt(intermediate, b"\x00" * 16, bytes(oe_entry))[:32]


def truncate_utf8_password(pw: bytes | str) -> bytes:
    """PDF 2.0 (V5) passwords: UTF-8, truncated to 127 bytes (ISO 32000-2
    §7.6.4.3.3; SASLprep normalization is not applied — callers pass
    already-normalized text)."""
    raw = pw.encode("utf-8") if isinstance(pw, str) else bytes(pw)
    return raw[:127]
