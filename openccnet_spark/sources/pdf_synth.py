"""Deterministic synthetic PDF builders (test + driver-query fixtures).

No PDF library exists in this sandbox, so fixtures are written by hand:
a minimal but spec-valid PDF (header, objects, xref, trailer). Two font
modes: a simple Type1 font (1-byte Latin codes, no ToUnicode) and a CJK
composite font (Identity-H, 2-byte codes, ToUnicode CMap) — the two
decoding paths of ``openccnet_spark/sources/pdf.py``.
"""

from __future__ import annotations

import zlib


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _stream_obj(
    num: int, payload: bytes, extra: bytes = b"", compress: bool = False, enc=None
) -> bytes:
    if compress:
        payload = zlib.compress(payload)
        extra += b" /Filter /FlateDecode"
    if enc is not None:
        payload = enc(num, payload)  # encryption applies to the FINAL bytes
    head = b"<< /Length %d%s >>\nstream\n" % (len(payload), extra)
    return _obj(num, head + payload + b"\nendstream")


def _cid_hex(text: str) -> bytes:
    """Encode text as 2-byte CIDs == BMP code points (Identity mapping)."""
    return ("<" + "".join(f"{ord(c):04X}" for c in text) + ">").encode("ascii")


def _tounicode_identity() -> bytes:
    """ToUnicode CMap mapping every 2-byte code to the same BMP char."""
    return (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfrange\n<0000> <FFFF> <0000>\nendbfrange\n"
        b"endcmap CMapName currentdict /CMap defineresource pop end end"
    )


def _build_objects(
    pages: list[list[str]], cjk: bool, compress: bool, enc=None
) -> dict[int, bytes]:
    """The shared object set (catalog/pages/font/contents) of one PDF."""
    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    # 1 catalog, 2 pages node, 3 font, 4 tounicode (cjk), pages from 5
    kids = b" ".join(b"%d 0 R" % (5 + 2 * i) for i in range(n_pages))
    objects[1] = _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    objects[2] = _obj(
        2, b"<< /Type /Pages /Count %d /Kids [%s] >>" % (n_pages, kids)
    )
    if cjk:
        objects[3] = _obj(
            3,
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-Identity"
            b" /Encoding /Identity-H /ToUnicode 4 0 R >>",
        )
        objects[4] = _stream_obj(4, _tounicode_identity(), compress=compress, enc=enc)
    else:
        objects[3] = _obj(
            3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )

    for i, lines in enumerate(pages):
        page_num = 5 + 2 * i
        content_num = page_num + 1
        if isinstance(lines, bytes):
            content = lines  # pre-built raw content stream (layout fixtures)
        else:
            ops = [b"BT /F1 12 Tf 72 720 Td"]
            for j, line in enumerate(lines):
                if j:
                    ops.append(b"0 -14 Td")
                ops.append(_show_op(line, cjk))
            ops.append(b"ET")
            content = b"\n".join(ops)
        objects[page_num] = _obj(
            page_num,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % content_num,
        )
        objects[content_num] = _stream_obj(content_num, content, compress=compress, enc=enc)
    return objects


def _show_op(line: str, cjk: bool) -> bytes:
    if cjk:
        return _cid_hex(line) + b" Tj"
    esc = (
        line.encode("latin-1")
        .replace(b"\\", rb"\\")
        .replace(b"(", rb"\(")
        .replace(b")", rb"\)")
    )
    return b"(" + esc + b") Tj"


def build_pdf_two_column(
    columns: list[list[str]],
    cjk: bool = True,
    compress: bool = True,
    xs: tuple = (72, 330),
    top: float = 720.0,
    line_height: float = 14.0,
    title_lines: list[str] | None = None,
) -> bytes:
    """One-page PDF whose CONTENT STREAM interleaves the columns ROW BY
    ROW (left line, right line, next row...) with absolute Tm positioning
    — the order a naive writer emits and exactly what makes content-order
    extraction interleave columns. Ground-truth reading order is column
    after column; ``extract_pdf_text(column_layout=True)`` must recover
    it. ``xs`` are the column x origins (gutter >> MIN_COLUMN_GUTTER for
    the default text widths)."""
    n_rows = max(len(c) for c in columns)
    ops = [b"BT /F1 12 Tf"]
    for j, line in enumerate(title_lines or []):
        # full-width spanner rows above the columns (title/abstract shape)
        ops.append(b"1 0 0 1 %d %d Tm" % (int(xs[0]), int(top + (len(title_lines) - j) * line_height)))
        ops.append(_show_op(line, cjk))
    for row in range(n_rows):
        for col, lines in enumerate(columns):
            if row >= len(lines):
                continue
            y = top - row * line_height
            ops.append(b"1 0 0 1 %d %d Tm" % (int(xs[col]), int(y)))
            ops.append(_show_op(lines[row], cjk))
    ops.append(b"ET")
    # one "page" whose content is the pre-built stream (the bytes
    # passthrough in _build_objects); serialization is build_pdf's
    return build_pdf([b"\n".join(ops)], cjk=cjk, compress=compress)


def build_pdf_positioned(
    items: list[tuple[float, float, str]],
    cjk: bool = True,
    compress: bool = True,
) -> bytes:
    """One-page PDF placing each (x, y, text) run with absolute Tm
    positioning, in the GIVEN (deliberately arbitrary) content-stream
    order — the general fixture for layout-analysis tests: nested
    column/caption/column pages, scrambled emission order, anything
    ``build_pdf_two_column``'s row-interleave shape can't express."""
    return build_pdf_positioned_pages([items], cjk=cjk, compress=compress)


def build_pdf_positioned_pages(
    pages: list[list[tuple[float, float, str]]],
    cjk: bool = True,
    compress: bool = True,
) -> bytes:
    """Multi-page ``build_pdf_positioned`` — the fixture for cross-page
    layout analysis (running header/footer suppression needs repeated
    lines at the same y across pages)."""
    contents = []
    for items in pages:
        ops = [b"BT /F1 12 Tf"]
        for x, y, text in items:
            ops.append(b"1 0 0 1 %d %d Tm" % (int(x), int(y)))
            ops.append(_show_op(text, cjk))
        ops.append(b"ET")
        contents.append(b"\n".join(ops))
    return build_pdf(contents, cjk=cjk, compress=compress)


def build_pdf(pages: list[list[str]], cjk: bool = True, compress: bool = True) -> bytes:
    """One PDF with the given pages; each page is a list of text lines.

    ``cjk=True`` uses the Identity-H composite font + ToUnicode CMap
    (2-byte hex-string codes); ``cjk=False`` uses a plain Type1 font with
    1-byte literal strings (Latin-1 text only). Classic xref table.
    """
    objects = _build_objects(pages, cjk, compress)
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += objects[num]
    xref_pos = len(out)
    max_num = max(objects)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, xref_pos)
    )
    return bytes(out)


def build_pdf_xrefstream(
    pages: list[list[str]], cjk: bool = True, compress: bool = True
) -> bytes:
    """Same document as ``build_pdf`` but with a PDF 1.5 cross-reference
    STREAM (/Type /XRef, W=[1 4 2]) compressed with FlateDecode and
    PNG-predictor 12 (Up) — the modern layout ``PdfDocument._load_via_xref``
    must parse WITHOUT falling back to the object scan. No ``trailer``
    keyword exists in the file at all, so a reader that only understands
    classic tables sees nothing."""
    objects = _build_objects(pages, cjk, compress)
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += objects[num]
    xref_num = max(objects) + 1
    xref_pos = len(out)
    size = xref_num + 1
    # entry rows (W = 1,4,2): type, offset, gen — object 0 free, rest in use
    rows = [b"\x00" + (0).to_bytes(4, "big") + b"\xff\xff"]
    for num in range(1, xref_num):
        rows.append(b"\x01" + offsets.get(num, 0).to_bytes(4, "big") + b"\x00\x00")
    rows.append(b"\x01" + xref_pos.to_bytes(4, "big") + b"\x00\x00")  # self
    columns = 7
    # PNG predictor 12: per-row filter byte 2 (Up), row = row - prev
    prev = bytes(columns)
    filtered = bytearray()
    for row in rows:
        filtered.append(2)
        filtered += bytes((row[j] - prev[j]) & 0xFF for j in range(columns))
        prev = row
    payload = zlib.compress(bytes(filtered))
    head = (
        b"<< /Type /XRef /Size %d /Root 1 0 R /W [1 4 2] /Length %d"
        b" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns %d >> >>\nstream\n"
        % (size, len(payload), columns)
    )
    out += _obj(xref_num, head + payload + b"\nendstream")
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


def build_pdf_encrypted(
    pages: list[list[str]],
    cjk: bool = True,
    compress: bool = True,
    user_pw: bytes = b"",
    owner_pw: bytes = b"owner-secret",
    method: str = "rc4",
) -> bytes:
    """Same document as ``build_pdf`` but encrypted with the standard
    security handler — by default with an EMPTY user password, the common
    permissions-only encryption the reader must decrypt transparently.
    ``method``: "rc4" (V2/R3 128-bit), "aesv2" (V4/R4 AES-128 crypt
    filter) or "aesv3" (V5/R6 AES-256, Algorithm 2.B key derivation).
    A non-empty ``user_pw`` produces a file the reader must treat as
    honestly unreadable."""
    import hashlib

    from .pdf_aes import cbc_encrypt
    from .pdf_crypt import (
        compute_file_key,
        compute_o_entry,
        compute_u_entry,
        hash_2b,
        object_key,
        rc4,
    )

    p = -44
    id0 = hashlib.md5(b"openccnet-synth-encrypted-id").digest()

    def _pad16(b: bytes) -> bytes:
        n = 16 - len(b) % 16
        return b + bytes([n]) * n

    def _iv(num: int) -> bytes:  # deterministic per-object IV for the fixture
        return hashlib.md5(b"iv%d" % num).digest()

    if method == "aesv3":
        revision = 6
        key = hashlib.sha256(b"openccnet-synth-aes256-file-key").digest()
        vsalt, ksalt = b"VSALT001", b"KSALT001"
        u = hash_2b(user_pw, vsalt, b"", revision) + vsalt + ksalt
        intermediate = hash_2b(user_pw, ksalt, b"", revision)
        ue = cbc_encrypt(intermediate, b"\x00" * 16, key)
        # real owner entries (Algorithm 9): owner hashes salt with the
        # full 48-byte /U as udata, /OE wraps the same file key
        ovsalt, oksalt = b"OVSALT01", b"OKSALT01"
        o = hash_2b(owner_pw, ovsalt, u, revision) + ovsalt + oksalt
        oe = cbc_encrypt(hash_2b(owner_pw, oksalt, u, revision), b"\x00" * 16, key)
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d"
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /O <%s> /OE <%s> /U <%s> /UE <%s> /Perms <%s> >>"
            % (
                p,
                o.hex().encode(),
                oe.hex().encode(),
                u.hex().encode(),
                ue.hex().encode(),
                (b"\x33" * 16).hex().encode(),
            )
        )

        def enc(num: int, payload: bytes) -> bytes:
            iv = _iv(num)
            return iv + cbc_encrypt(key, iv, _pad16(payload))

    elif method == "aesv2":
        revision, keylen = 4, 16
        o = compute_o_entry(owner_pw, user_pw, revision, keylen)
        key = compute_file_key(user_pw, o, p, id0, revision, keylen)
        u = compute_u_entry(key, id0, revision)
        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d"
            b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
            b" /StmF /StdCF /StrF /StdCF /O <%s> /U <%s> >>"
            % (p, o.hex().encode(), u.hex().encode())
        )

        def enc(num: int, payload: bytes) -> bytes:
            k = object_key(key, num, 0, aes=True)
            iv = _iv(num)
            return iv + cbc_encrypt(k, iv, _pad16(payload))

    else:
        revision, keylen = 3, 16
        o = compute_o_entry(owner_pw, user_pw, revision, keylen)
        key = compute_file_key(user_pw, o, p, id0, revision, keylen)
        u = compute_u_entry(key, id0, revision)
        enc_dict = (
            b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P %d /O <%s> /U <%s> >>"
            % (p, o.hex().encode(), u.hex().encode())
        )

        def enc(num: int, payload: bytes) -> bytes:
            return rc4(object_key(key, num, 0), payload)

    objects = _build_objects(pages, cjk, compress, enc=enc)
    enc_num = max(objects) + 1
    objects[enc_num] = _obj(enc_num, enc_dict)
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += objects[num]
    xref_pos = len(out)
    max_num = max(objects)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    idhex = id0.hex().encode()
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Encrypt %d 0 R /ID [<%s> <%s>] >>\n"
        b"startxref\n%d\n%%%%EOF\n"
        % (max_num + 1, enc_num, idhex, idhex, xref_pos)
    )
    return bytes(out)
