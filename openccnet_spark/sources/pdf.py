"""PDF text extraction + CJK reflow + conversion (reference ``pdf`` command).

The reference extracts page text with PdfPig's content-order extractor,
optionally adds ``=== [Page x/y] ===`` headers, reflows CJK paragraphs, and
converts (``OpenccNet/PdfCommand.cs:211-247``, ``PdfHelper.cs:98-170``).
PdfPig is a full managed PDF library; this module is a from-scratch minimal
extractor for TEXT-BEARING PDFs, covering the structures that matter for a
text corpus:

* classic xref tables AND cross-reference streams (``/Type /XRef``, incl.
  PNG-predictor-coded ones) walked via startxref + /Prev, with a full
  object-scan fallback for damaged files; FlateDecode streams (with PNG/
  TIFF /Predictor DecodeParms), object streams (``/Type /ObjStm``);
* page order via the ``/Root -> /Pages -> /Kids`` tree (fallback: object
  order) — the reference's page iteration order;
* text operators ``BT/ET Tf Td TD T* Tm Tj TJ ' "``, with newline emission
  on line-moves — a simplification of PdfPig's layout analysis that is
  exact for line-oriented text PDFs;
* per-font ``/ToUnicode`` CMaps (bfchar + bfrange, 1- and 2-byte codes) for
  CJK (Identity-H etc.); fonts without a CMap decode as Latin-1.

* encrypted files decrypt transparently with an EMPTY user password (the
  common permissions-only encryption) or a SUPPLIED user/owner password
  (Algorithms 2, 7 and 2.A): standard security handler RC4 (V1/V2/V4
  /V2), AES-128 (V4 /AESV2) and AES-256 (V5 revisions 5/6 incl. the
  Algorithm 2.B iterated hash) — ``pdf_crypt.py`` + the pure-Python
  FIPS-197 AES in ``pdf_aes.py``;
* all four auxiliary stream filters beyond Flate: ASCIIHexDecode,
  ASCII85Decode, RunLengthDecode, LZWDecode (9-12 bit, EarlyChange).

Honest limits (documented, not hidden): a wrong/unknown password
extracts as empty (``encryption_unsupported`` is set), no per-glyph
positioning
reconstruction, JBIG2/DCT/image filters skipped (image data carries no
extractable text). Unsupported content degrades to skipped streams,
never to exceptions.

Spark integration mirrors the office source: one ``binaryFile`` scan ->
``mapInPandas`` -> one row per page. PDFs parallelize by file; page payloads
never shuffle.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..convert import Converter, default_converter
from ..reflow import reflow_cjk_paragraphs

# --- PDF object model ---------------------------------------------------------


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


class Name(str):
    """A /Name token (distinct from a string value)."""


class PdfString(bytes):
    """A (literal) or <hex> string operand — distinct from operator bytes."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer for the PDF object syntax subset used in dictionaries,
    arrays, and content streams."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                e = d.find(b"\n", self.pos)
                self.pos = n if e < 0 else e + 1
            else:
                return

    def next_token(self):
        """Returns one of: bytes operator/keyword, Name, int, float, str
        (decoded text string as raw bytes), list, dict, Ref, bool, None,
        or the sentinel b'' at end of input."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return b""
        c = d[self.pos]
        if c == 0x2F:  # /Name
            self.pos += 1
            start = self.pos
            while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
                self.pos += 1
            raw = d[start : self.pos]
            # #xx hex escapes in names
            if b"#" in raw:
                raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
            return Name(raw.decode("latin-1"))
        if c == 0x28:  # ( literal string
            return self._literal_string()
        if c == 0x3C:  # << dict or <hex string>
            if self.pos + 1 < n and d[self.pos + 1] == 0x3C:
                return self._dict()
            return self._hex_string()
        if c == 0x5B:  # [ array
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if self.pos >= n:
                    return arr
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return self._fold_refs(arr)
                arr.append(self.next_token())
        if c == 0x5D:
            self.pos += 1
            return b"]"
        if c == 0x3E:  # >> (stray)
            self.pos += 2
            return b">>"
        # number, keyword, or operator
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:  # lone delimiter we don't handle
            self.pos += 1
            return d[start : self.pos]
        raw = d[start : self.pos]
        if re.fullmatch(rb"[+-]?\d+", raw):
            return int(raw)
        if re.fullmatch(rb"[+-]?\d*\.\d*", raw):
            return float(raw or 0)
        if raw == b"true":
            return True
        if raw == b"false":
            return False
        if raw == b"null":
            return None
        return raw  # operator / keyword (obj, endobj, R, BT, Tj, ...)

    def _literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f"}[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return PdfString(out)
            out.append(c)
            self.pos += 1
        return PdfString(out)

    def _hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos)
        if end < 0:
            # unterminated <hex string (truncated/corrupt PDF): consume to
            # end-of-input — `end + 1` would be 0 and REWIND the lexer,
            # turning every enclosing token loop into an infinite loop
            end = len(self.data)
        raw = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos + 1 : end])
        self.pos = min(end + 1, len(self.data))
        if len(raw) % 2:
            raw += b"0"
        return PdfString(bytes.fromhex(raw.decode("ascii")))

    def _dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        pending: list = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                break
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                break
            pending.append(self.next_token())
        items = self._fold_refs(pending)
        for i in range(0, len(items) - 1, 2):
            if isinstance(items[i], Name):
                out[str(items[i])] = items[i + 1]
        return out

    @staticmethod
    def _fold_refs(items: list) -> list:
        """Collapse `n g R` triples into Ref(n) (generation ignored)."""
        out: list = []
        for it in items:
            if it == b"R" and len(out) >= 2 and isinstance(out[-1], int) and isinstance(out[-2], int):
                out.pop()  # generation
                out.append(Ref(out.pop()))
            else:
                out.append(it)
        return out


# --- stream filters (PDF 7.4; FlateDecode uses zlib directly) -----------------


def _asciihex_decode(data: bytes) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hexs = re.sub(rb"[^0-9A-Fa-f]", b"", data)
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    if data.startswith(b"<~"):
        data = data[2:]
    out = bytearray()
    group: list[int] = []
    for c in data:
        if c in _WS:
            continue
        if c == 0x7A:  # 'z' == four zero bytes, only between groups
            if group:
                raise ValueError("z inside ascii85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not (0x21 <= c <= 0x75):
            raise ValueError("bad ascii85 byte")
        group.append(c - 0x21)
        if len(group) == 5:
            n = 0
            for g in group:
                n = n * 85 + g
            out += n.to_bytes(4, "big")
            group = []
    if group:  # partial final group: pad with 'u', drop pad bytes
        k = len(group)
        group += [84] * (5 - k)
        n = 0
        for g in group:
            n = n * 85 + g
        out += n.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        i += 1
        if l == 128:  # EOD
            break
        if l < 128:
            out += data[i : i + l + 1]
            i += l + 1
        else:
            out += bytes([data[i]]) * (257 - l)
            i += 1
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode: 9->12 bit codes MSB-first, 256=clear, 257=EOD,
    code width bumps one code early when EarlyChange=1 (the default)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            # mask to the live bits: without this the accumulator grows as
            # an unbounded int and bit ops over a long stream go O(n^2)
            acc &= (1 << nbits) - 1
            if code == 256:  # clear table
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    """Parsed object table + page tree of one PDF byte blob."""

    def __init__(self, data: bytes, password: bytes | str = b""):
        self.data = data
        self._password = (
            password.encode("utf-8") if isinstance(password, str) else bytes(password)
        )
        # the legacy (R2-R4) standard security handler takes PDFDocEncoding
        # passwords (~Latin-1 for the printable range), NOT UTF-8 — keep a
        # Latin-1 candidate for str passwords so "café" opens both vintages
        self._password_alt = b""
        if isinstance(password, str):
            try:
                alt = password.encode("latin-1")
                if alt != self._password:
                    self._password_alt = alt
            except UnicodeEncodeError:
                pass
        self.objects: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}  # raw (still encoded) stream data
        self.gens: dict[int, int] = {}  # object generations (per-object keys)
        self.trailers: list[dict] = []  # trailer / xref-stream dicts
        self._free: set[int] = set()  # freed in a newer section: tombstoned
        self._plain_objects: set[int] = set()  # never-encrypted objects
        self._file_key: bytes | None = None
        self._cipher = "rc4"  # rc4 | aes_v4 (AES-128) | aes_v5 (AES-256)
        #: True when the file is encrypted in a way this reader does not
        #: support (AES, a real password): pages degrade to empty, honestly
        self.encryption_unsupported = False
        self._cmap_cache: dict[int, tuple[dict[int, str], int] | None] = {}
        loaded = False
        try:
            loaded = self._load_via_xref()
        except Exception:
            loaded = False
        if loaded:
            self._setup_encryption()
            self._expand_object_streams()
            if not self._has_catalog():
                # xref chain parsed but didn't reach a usable document —
                # reset and fall back to the exhaustive scan
                loaded = False
                self.objects.clear()
                self.streams.clear()
                self.gens.clear()
                self.trailers.clear()
                self._free.clear()
                self._plain_objects.clear()
                self._file_key = None
                self._cipher = "rc4"
                self.encryption_unsupported = False
                self._cmap_cache.clear()
        if not loaded:
            self._scan_objects()
            self._setup_encryption()
            self._expand_object_streams()
        #: True when the object table came from the xref table/stream path
        #: (O(objects)) rather than the O(file) full scan fallback
        self.xref_loaded = loaded

    def _setup_encryption(self):
        """Standard-security-handler setup (empty user password, RC4).
        Runs BEFORE object-stream expansion: ObjStm payloads decrypt as
        streams; their contained objects are not separately encrypted."""
        from .pdf_crypt import authenticate_user_password

        enc_ref = id0 = None
        for tr in self.trailers:
            if "Encrypt" in tr:
                enc_ref = tr["Encrypt"]
                ids = self.resolve(tr.get("ID"))
                if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
                    id0 = bytes(ids[0])
                break
        if enc_ref is None:
            return
        if isinstance(enc_ref, Ref):
            self._plain_objects.add(enc_ref.num)  # never decrypted
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict) or str(enc.get("Filter", "")) != "Standard":
            self.encryption_unsupported = True
            return
        v = self.resolve(enc.get("V", 0))
        r = self.resolve(enc.get("R", 2))
        o = bytes(self.resolve(enc.get("O")) or b"")
        u = bytes(self.resolve(enc.get("U")) or b"")
        p = int(self.resolve(enc.get("P", -1)))
        em = self.resolve(enc.get("EncryptMetadata", True))
        if v == 5:  # AES-256 (revision 5/6)
            from .pdf_crypt import (
                authenticate_owner_password_v5,
                authenticate_user_password_v5,
                truncate_utf8_password,
            )

            ue = bytes(self.resolve(enc.get("UE")) or b"")
            oe = bytes(self.resolve(enc.get("OE")) or b"")
            pw = truncate_utf8_password(self._password)
            # supplied password as user, then as owner (Algorithm 2.A both
            # paths), then the common empty-user-password case
            key = authenticate_user_password_v5(pw, u, ue, int(r))
            if key is None and pw:
                key = authenticate_owner_password_v5(pw, o, oe, u, int(r))
            if key is None and pw:
                key = authenticate_user_password_v5(b"", u, ue, int(r))
            if key is None:
                self.encryption_unsupported = True  # wrong/unknown password
                return
            self._file_key = key
            self._cipher = "aes_v5"
            return
        cfm = ""
        if v == 4:
            # crypt filters: RC4 (/V2) and AES-128 (/AESV2) are in scope
            cf = self.resolve(enc.get("CF")) or {}
            stmf = str(self.resolve(enc.get("StmF", Name("Identity"))))
            if stmf == "Identity":
                # streams deliberately unencrypted (a legal configuration:
                # only strings/embedded files carry ciphertext) — text
                # extraction reads streams, so proceed with no stream key
                return
            c = self.resolve(cf.get(stmf)) if isinstance(cf, dict) else None
            cfm = str(self.resolve(c.get("CFM", ""))) if isinstance(c, dict) else ""
            if cfm not in ("V2", "AESV2"):
                self.encryption_unsupported = True
                return
        elif v not in (1, 2):
            self.encryption_unsupported = True
            return
        length = int(self.resolve(enc.get("Length", 40)) or 40) // 8
        if v == 1:
            length = 5
        # each candidate encoding (UTF-8 str bytes, then Latin-1 for str
        # passwords — the legacy handler's PDFDocEncoding) as user
        # (Algorithm 2), then as owner (Algorithm 7), then the common
        # empty-user-password case
        from .pdf_crypt import authenticate_owner_password

        args = (o, u, p, id0 or b"", int(r), length, bool(em))
        candidates = [self._password] + ([self._password_alt] if self._password_alt else [])
        key = None
        for pw in candidates:
            if key is None:
                key = authenticate_user_password(pw, *args)
            if key is None and pw:
                key = authenticate_owner_password(pw, *args)
        if key is None and self._password:
            key = authenticate_user_password(b"", *args)
        if key is None:
            # wrong (or unknown) password: honestly unreadable
            self.encryption_unsupported = True
            return
        self._file_key = key
        self._cipher = "aes_v4" if cfm == "AESV2" else "rc4"

    def _has_catalog(self) -> bool:
        return any(
            isinstance(o, dict) and str(o.get("Type", "")) == "Catalog"
            for o in self.objects.values()
        )

    # -- object table --

    def _scan_objects(self):
        """Exhaustive fallback: regex-scan every `N G obj` in the file."""
        d = self.data
        pending: list[tuple[int, dict, int]] = []
        for m in _OBJ_RE.finditer(d):
            num = int(m.group(1))
            body_start = m.end()
            lex = _Lexer(d, body_start)
            try:
                value = lex.next_token()
            except Exception:
                continue
            self.objects[num] = value
            self.gens[num] = int(m.group(2))
            # stream payload? sliced AFTER the full pass so an indirect
            # /Length defined later in the file still resolves exactly
            rest = d[lex.pos : lex.pos + 32]
            sm = re.match(rb"\s*stream(\r\n|\n|\r)", rest)
            if sm and isinstance(value, dict):
                pending.append((num, value, lex.pos + sm.end()))
        # trailers (Encrypt/ID live there); xref-stream dicts count too
        for m in re.finditer(rb"trailer\b", d):
            try:
                t = _Lexer(d, m.end()).next_token()
            except Exception:
                continue
            if isinstance(t, dict):
                self.trailers.append(t)
        for num, obj in self.objects.items():
            if isinstance(obj, dict) and str(obj.get("Type", "")) == "XRef":
                self.trailers.append(obj)
                self._plain_objects.add(num)  # xref streams are never encrypted
        self._slice_streams(pending)

    def _slice_streams(self, pending: list[tuple[int, dict, int]]):
        """Second pass: slice stream payloads once EVERY object (and thus
        every indirect /Length value, even forward-referenced) is known."""
        d = self.data
        for num, value, start in pending:
            length = value.get("Length")
            if isinstance(length, Ref):
                length = self.resolve(length)
            if isinstance(length, int) and d[start + length : start + length + 20].lstrip().startswith(
                b"endstream"
            ):
                # /Length matched exactly: the payload boundary is
                # authoritative — stripping here would eat compressed
                # bytes that happen to end in \r/\n (~1/64 of Flate
                # streams) and silently empty the page
                self.streams[num] = d[start : start + length]
            else:
                end = d.find(b"endstream", start)
                if end < 0:
                    continue
                # fallback boundary includes the EOL before the
                # endstream keyword; that EOL is not payload
                self.streams[num] = d[start:end].rstrip(b"\r\n")

    # -- xref table / xref stream loading (the O(objects) path) --

    def _parse_object_at(self, pos: int, pending: list) -> None:
        """Parse one `N G obj` at byte offset ``pos`` (first-loaded wins:
        xref sections are walked newest-first, so an older /Prev section
        never overrides a newer definition)."""
        m = re.compile(rb"\s*(\d+)\s+(\d+)\s+obj\b").match(self.data, pos)
        if not m:
            return
        num = int(m.group(1))
        if num in self.objects or num in self._free:
            return
        lex = _Lexer(self.data, m.end())
        try:
            value = lex.next_token()
        except Exception:
            return
        self.objects[num] = value
        self.gens[num] = int(m.group(2))
        rest = self.data[lex.pos : lex.pos + 32]
        sm = re.match(rb"\s*stream(\r\n|\n|\r)", rest)
        if sm and isinstance(value, dict):
            pending.append((num, value, lex.pos + sm.end()))

    def _load_via_xref(self) -> bool:
        """Follow startxref -> xref table/stream (+ /Prev chain) to locate
        objects directly instead of scanning the whole file. Returns False
        (caller falls back to the scan) on any structural surprise."""
        d = self.data
        tail = d[-2048:]
        last = None
        for last in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if last is None:
            return False
        offset = int(last.group(1))
        pending: list[tuple[int, dict, int]] = []
        seen: set[int] = set()
        if not self._load_xref_section(offset, pending, seen, depth=0):
            return False
        if not self.objects:
            return False
        self._slice_streams(pending)
        return True

    def _load_xref_section(self, offset: int, pending: list, seen: set, depth: int) -> bool:
        d = self.data
        if depth > 32 or offset in seen or not (0 <= offset < len(d)):
            return False
        seen.add(offset)
        m = re.compile(rb"\s*xref\b").match(d, offset)
        if m:
            return self._load_xref_table(m.end(), pending, seen, depth)
        return self._load_xref_stream(offset, pending, seen, depth)

    def _load_xref_table(self, pos: int, pending: list, seen: set, depth: int) -> bool:
        """Classic `xref` table: subsections of 20-byte entries + trailer."""
        d = self.data
        sub_re = re.compile(rb"\s*(\d+)\s+(\d+)[ ]*(\r\n|\r|\n)")
        ent_re = re.compile(rb"(\d{10})\s(\d{5})\s([nf])")
        offsets: list[int] = []
        freed: list[int] = []
        while True:
            m = sub_re.match(d, pos)
            if not m:
                break
            start_num, count = int(m.group(1)), int(m.group(2))
            pos = m.end()
            for i in range(count):
                em = ent_re.match(d, pos)
                if not em:
                    return False
                onum = start_num + i
                if em.group(3) == b"n" and onum != 0:
                    offsets.append(int(em.group(1)))
                elif em.group(3) == b"f" and onum != 0:
                    freed.append(onum)
                pos = em.end()
                # entries are fixed 20 bytes; tolerate 19-byte writers
                while pos < len(d) and d[pos] in b"\r\n ":
                    pos += 1
        tm = re.compile(rb"\s*trailer\b").match(d, pos)
        if not tm:
            return False
        trailer = _Lexer(d, tm.end()).next_token()
        if not isinstance(trailer, dict):
            return False
        self.trailers.append(trailer)
        for off in offsets:
            self._parse_object_at(off, pending)
        # hybrid-reference files: /XRefStm points at the stream holding the
        # NEWER entries and takes precedence over /Prev (PDF 1.7 §7.5.8.4),
        # so with first-loaded-wins it must register first — and BEFORE this
        # table's free entries become tombstones: the standard Acrobat
        # hybrid shape marks its hidden objects 'f' in the classic table
        # while the xref stream holds their real entries
        xrefstm = trailer.get("XRefStm")
        if isinstance(xrefstm, int):
            self._load_xref_section(xrefstm, pending, seen, depth + 1)
        for onum in freed:
            if onum not in self.objects:
                # freed here and not defined by this section's XRefStm or
                # any NEWER section: tombstone so an older /Prev definition
                # cannot resurrect deleted content (walk is newest-first)
                self._free.add(onum)
        prev = trailer.get("Prev")
        if isinstance(prev, int):
            self._load_xref_section(prev, pending, seen, depth + 1)
        return True

    def _load_xref_stream(self, offset: int, pending: list, seen: set, depth: int) -> bool:
        """Cross-reference STREAM (PDF 1.5+): /Type /XRef, binary entries of
        /W field widths, usually FlateDecode + PNG predictor 12."""
        d = self.data
        m = re.compile(rb"\s*(\d+)\s+(\d+)\s+obj\b").match(d, offset)
        if not m:
            return False
        num = int(m.group(1))
        lex = _Lexer(d, m.end())
        info = lex.next_token()
        if not isinstance(info, dict) or str(info.get("Type", "")) != "XRef":
            return False
        sm = re.match(rb"\s*stream(\r\n|\n|\r)", d[lex.pos : lex.pos + 32])
        length = info.get("Length")
        if not sm or not isinstance(length, int):
            # an xref stream's /Length must be direct (nothing is loaded
            # yet to resolve a Ref through) — bail to the scan fallback
            return False
        start = lex.pos + sm.end()
        self.objects.setdefault(num, info)
        self.streams.setdefault(num, d[start : start + length])
        self.trailers.append(info)  # xref-stream dict carries Root/Encrypt/ID
        self._plain_objects.add(num)  # xref streams are never encrypted
        payload = self.stream_bytes(num)
        w = info.get("W")
        size = info.get("Size")
        if not payload or not (isinstance(w, list) and len(w) == 3) or not isinstance(size, int):
            return False
        w1, w2, w3 = (int(x) for x in w)
        ent_len = w1 + w2 + w3
        index = info.get("Index")
        if not isinstance(index, list):
            index = [0, size]
        rows = len(payload) // ent_len if ent_len else 0
        entries: list[tuple[int, int, int]] = []
        p = 0
        for r in range(rows):
            f1 = int.from_bytes(payload[p : p + w1], "big") if w1 else 1
            f2 = int.from_bytes(payload[p + w1 : p + w1 + w2], "big")
            f3 = int.from_bytes(payload[p + w1 + w2 : p + ent_len], "big")
            entries.append((f1, f2, f3))
            p += ent_len
        # map entry rows to object numbers via /Index pairs
        row = 0
        for i in range(0, len(index) - 1, 2):
            start_num, count = int(index[i]), int(index[i + 1])
            for k in range(count):
                if row >= len(entries):
                    break
                typ, f2, _f3 = entries[row]
                row += 1
                onum = start_num + k
                if typ == 1 and onum != 0:
                    self._parse_object_at(f2, pending)
                elif typ == 0 and onum != 0 and onum not in self.objects:
                    # type-0 = free: tombstone against older sections
                    # (same rule as classic-table 'f' entries)
                    self._free.add(onum)
                # typ == 2 (compressed): the object lives in ObjStm f2,
                # which is itself a type-1 entry; _expand_object_streams
                # unpacks it after loading
        prev = info.get("Prev")
        if isinstance(prev, int):
            self._load_xref_section(prev, pending, seen, depth + 1)
        return True

    def resolve(self, v):
        seen = 0
        while isinstance(v, Ref) and seen < 32:
            v = self.objects.get(v.num)
            seen += 1
        return v

    def tounicode(self, num: int) -> tuple[dict[int, str], int] | None:
        """Parsed ToUnicode CMap of stream object ``num``, cached per
        document — shared fonts would otherwise rebuild a potentially
        65k-entry table once per page."""
        if num not in self._cmap_cache:
            data = self.stream_bytes(num)
            self._cmap_cache[num] = parse_tounicode(data) if data else None
        return self._cmap_cache[num]

    def stream_bytes(self, num: int) -> bytes:
        """Decoded stream content of object `num` ('' if undecodable)."""
        raw = self.streams.get(num)
        info = self.objects.get(num)
        if raw is None or not isinstance(info, dict):
            return b""
        if self._file_key is not None and num not in self._plain_objects:
            from .pdf_crypt import object_key, rc4

            if self._cipher == "rc4":
                raw = rc4(object_key(self._file_key, num, self.gens.get(num, 0)), raw)
            else:
                from .pdf_aes import cbc_decrypt, strip_pkcs7

                k = (
                    self._file_key  # V5: the file key encrypts every object
                    if self._cipher == "aes_v5"
                    else object_key(
                        self._file_key, num, self.gens.get(num, 0), aes=True
                    )
                )
                if len(raw) < 16:
                    return b""
                raw = strip_pkcs7(cbc_decrypt(k, raw[:16], raw[16:]))
        filt = self.resolve(info.get("Filter"))
        filters = [filt] if not isinstance(filt, list) else list(filt)
        parms = self.resolve(info.get("DecodeParms"))
        parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
        out = raw
        for i, f in enumerate(filters):
            f = self.resolve(f)
            if f is None:
                continue
            name = str(f)
            p = self.resolve(parms_list[i]) if i < len(parms_list) else None
            try:
                if name == "FlateDecode":
                    out = zlib.decompress(out)
                elif name in ("ASCIIHexDecode", "AHx"):
                    out = _asciihex_decode(out)
                elif name in ("ASCII85Decode", "A85"):
                    out = _ascii85_decode(out)
                elif name in ("RunLengthDecode", "RL"):
                    out = _runlength_decode(out)
                elif name in ("LZWDecode", "LZW"):
                    early = 1
                    if isinstance(p, dict):
                        e = self.resolve(p.get("EarlyChange", 1))
                        early = int(e) if isinstance(e, int) else 1
                    out = _lzw_decode(out, early)
                else:
                    return b""  # unsupported filter: skip stream honestly
            except Exception:
                return b""  # corrupt data: skip stream honestly
            if name in ("FlateDecode", "LZWDecode", "LZW") and isinstance(p, dict):
                out = self._unpredict(out, p)
        return out

    def _unpredict(self, data: bytes, parms: dict) -> bytes:
        """Undo a /Predictor post-filter (PDF 7.4.4.4). Predictors >= 10
        are the PNG row filters — every modern xref stream uses 12 (Up),
        but the per-ROW filter byte decides, so all five are handled."""
        pred = self.resolve(parms.get("Predictor", 1))
        if not isinstance(pred, int) or pred < 2:
            return data
        colors = self.resolve(parms.get("Colors", 1)) or 1
        bpc = self.resolve(parms.get("BitsPerComponent", 8)) or 8
        columns = self.resolve(parms.get("Columns", 1)) or 1
        bpp = max((int(colors) * int(bpc) + 7) // 8, 1)
        rowlen = (int(columns) * int(colors) * int(bpc) + 7) // 8
        if pred == 2:  # TIFF horizontal differencing (8-bit components only)
            if bpc != 8:
                return data
            row = bytearray(data)
            for r in range(0, len(row), rowlen):
                for j in range(r + bpp, min(r + rowlen, len(row))):
                    row[j] = (row[j] + row[j - bpp]) & 0xFF
            return bytes(row)
        # PNG predictors: each row is (filter_type byte + rowlen bytes)
        out = bytearray()
        prev = bytearray(rowlen)
        i = 0
        n = len(data)
        while i < n:
            ft = data[i]
            row = bytearray(data[i + 1 : i + 1 + rowlen])
            i += 1 + rowlen
            if ft == 1:  # Sub
                for j in range(bpp, len(row)):
                    row[j] = (row[j] + row[j - bpp]) & 0xFF
            elif ft == 2:  # Up
                for j in range(len(row)):
                    row[j] = (row[j] + prev[j]) & 0xFF
            elif ft == 3:  # Average
                for j in range(len(row)):
                    left = row[j - bpp] if j >= bpp else 0
                    row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for j in range(len(row)):
                    a = row[j - bpp] if j >= bpp else 0
                    b = prev[j]
                    c = prev[j - bpp] if j >= bpp else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    if pa <= pb and pa <= pc:
                        pr = a
                    elif pb <= pc:
                        pr = b
                    else:
                        pr = c
                    row[j] = (row[j] + pr) & 0xFF
            out += row
            prev = row
        return bytes(out)

    def _expand_object_streams(self):
        for num, info in list(self.objects.items()):
            if not (isinstance(info, dict) and str(info.get("Type", "")) == "ObjStm"):
                continue
            payload = self.stream_bytes(num)
            if not payload:
                continue
            n = self.resolve(info.get("N"))
            first = self.resolve(info.get("First"))
            if not isinstance(n, int) or not isinstance(first, int):
                continue
            header = _Lexer(payload[:first])
            pairs = []
            try:
                for _ in range(n):
                    onum = header.next_token()
                    off = header.next_token()
                    pairs.append((onum, off))
            except Exception:
                continue
            for onum, off in pairs:
                if not (isinstance(onum, int) and isinstance(off, int)):
                    continue
                if onum in self._free:
                    # the tombstone invariant covers compressed objects
                    # too: a number freed by a NEWER section must not be
                    # resurrected out of an older section's ObjStm
                    continue
                lex = _Lexer(payload, first + off)
                try:
                    val = lex.next_token()
                except Exception:
                    continue
                self.objects.setdefault(onum, val)

    # -- page tree --

    def pages(self) -> list[dict]:
        root = None
        for obj in self.objects.values():
            obj = obj if isinstance(obj, dict) else None
            if obj and str(obj.get("Type", "")) == "Catalog":
                root = obj
                break
        ordered: list[dict] = []

        def walk(node, depth=0):
            node = self.resolve(node)
            if not isinstance(node, dict) or depth > 64:
                return
            t = str(node.get("Type", ""))
            if t == "Page":
                ordered.append(node)
            elif t == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, depth + 1)

        if root is not None:
            walk(root.get("Pages"))
        if not ordered:  # fallback: document order
            ordered = [
                o for o in self.objects.values()
                if isinstance(o, dict) and str(o.get("Type", "")) == "Page"
            ]
        return ordered


# --- ToUnicode CMaps ----------------------------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_CODESPACE_RE = re.compile(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S)


def parse_tounicode(cmap: bytes) -> tuple[dict[int, str], int]:
    """(code -> text, code byte width) from a ToUnicode CMap stream."""
    table: dict[int, str] = {}
    width = 2
    m = _CODESPACE_RE.search(cmap)
    if m:
        width = max(1, len(m.group(1)) // 2)

    def utf16(hexs: bytes) -> str:
        return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be", errors="replace")

    for block in _BFCHAR_RE.findall(cmap):
        hexes = _HEX_RE.findall(block)
        for i in range(0, len(hexes) - 1, 2):
            table[int(hexes[i], 16)] = utf16(hexes[i + 1])
    for block in _BFRANGE_RE.findall(cmap):
        pos = 0
        while True:
            m = _HEX_RE.search(block, pos)
            if not m:
                break
            lo = int(m.group(1), 16)
            m2 = _HEX_RE.search(block, m.end())
            if not m2:
                break
            hi = int(m2.group(1), 16)
            # destination: either <hex> or [ <hex> <hex> ... ]
            rest = block[m2.end() :]
            stripped = rest.lstrip()
            if stripped.startswith(b"["):
                # indices computed in BLOCK coordinates — an lstripped-
                # offset bug here silently dropped every range after an
                # indented [..] destination array
                lbracket = m2.end() + (len(rest) - len(stripped))
                rbracket = block.find(b"]", lbracket)
                if rbracket < 0:
                    break
                dsts = _HEX_RE.findall(block[lbracket:rbracket])
                for k, dst in enumerate(dsts):
                    table[lo + k] = utf16(dst)
                pos = rbracket + 1
            else:
                m3 = _HEX_RE.search(block, m2.end())
                if not m3:
                    break
                base_hex = m3.group(1)
                base = int(base_hex, 16)
                if len(base_hex) <= 4:
                    for k in range(hi - lo + 1):
                        table[lo + k] = chr(base + k)
                else:  # multi-unit dst: increment last unit
                    prefix = base_hex[:-4]
                    last = int(base_hex[-4:], 16)
                    for k in range(hi - lo + 1):
                        table[lo + k] = utf16(prefix + b"%04X" % (last + k))
                pos = m3.end()
    return table, width


# --- content stream interpretation ---------------------------------------------


def _decode_with_font(raw: bytes, font: tuple[dict[int, str], int] | None) -> str:
    if font is None:
        return raw.decode("latin-1")
    table, width = font
    if width == 1:
        return "".join(table.get(b, chr(b)) for b in raw)
    out = []
    for i in range(0, len(raw) - 1, 2):
        code = (raw[i] << 8) | raw[i + 1]
        out.append(table.get(code, ""))
    return "".join(out)


def _page_text(doc: PdfDocument, page: dict) -> str:
    # fonts
    fonts: dict[str, tuple[dict[int, str], int] | None] = {}
    res = doc.resolve(page.get("Resources")) or {}
    font_dict = doc.resolve(res.get("Font")) or {}
    if isinstance(font_dict, dict):
        for fname, fref in font_dict.items():
            fobj = doc.resolve(fref)
            cmap = None
            if isinstance(fobj, dict):
                tu = fobj.get("ToUnicode")
                if isinstance(tu, Ref):
                    cmap = doc.tounicode(tu.num)
            fonts[str(fname)] = cmap
    # content
    contents = page.get("Contents")
    refs = contents if isinstance(contents, list) else [contents]
    blobs = []
    for r in refs:
        if isinstance(r, Ref):
            blobs.append(doc.stream_bytes(r.num))
    content = b"\n".join(b for b in blobs if b)
    if not content:
        return ""

    lines: list[str] = []
    cur: list[str] = []
    cur_font: tuple[dict[int, str], int] | None = None
    stack: list = []
    last_ty: float | None = None
    font_size = 12.0
    # crude text-space advance estimate since the last positioning op:
    # CJK/fullwidth glyphs ~1 em, others ~0.5 em. Only used to decide
    # whether a same-baseline Td jump is a real gap (tab stop / column)
    # or just per-run absolute positioning of contiguous text.
    advance = 0.0

    def est_width(s: str) -> float:
        return sum(font_size if ord(c) >= 0x2E80 else font_size * 0.5 for c in s)

    def newline():
        nonlocal cur, advance
        advance = 0.0
        if cur:
            lines.append("".join(cur))
            cur = []

    lex = _Lexer(content)
    while True:
        try:
            tok = lex.next_token()
        except Exception:
            break
        if tok == b"":
            break
        if isinstance(tok, PdfString) or not isinstance(tok, bytes):
            stack.append(tok)  # operand (number/name/string/array/dict/bool)
            continue
        op = tok  # bare bytes token == content operator
        if op == b"Tf" and len(stack) >= 2 and isinstance(stack[-2], Name):
            cur_font = fonts.get(str(stack[-2]))
            if isinstance(stack[-1], (int, float)) and stack[-1] > 0:
                font_size = float(stack[-1])
        elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
            shown = _decode_with_font(stack[-1], cur_font)
            cur.append(shown)
            advance += est_width(shown)
        elif op in (b"'", b'"') and stack and isinstance(stack[-1], bytes):
            newline()
            shown = _decode_with_font(stack[-1], cur_font)
            cur.append(shown)
            advance += est_width(shown)
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    shown = _decode_with_font(item, cur_font)
                    cur.append(shown)
                    advance += est_width(shown)
                elif isinstance(item, (int, float)):
                    advance += -float(item) / 1000.0 * font_size
                    if item < -180:
                        # a large negative TJ adjustment (thousandths of
                        # text space) is the common word-gap encoding;
                        # PdfPig's position-based extractor renders it as
                        # whitespace. -180 is the conventional threshold
                        # (cf. pdfminer's word-margin default); kerning
                        # tweaks are far smaller.
                        if cur and not cur[-1].endswith((" ", "\n")):
                            cur.append(" ")
        elif op in (b"Td", b"TD") and len(stack) >= 2 and isinstance(stack[-1], (int, float)):
            if stack[-1] != 0:  # vertical move => new line
                newline()
            elif isinstance(stack[-2], (int, float)):
                tx = float(stack[-2])
                # a same-baseline jump is a REAL gap only when it clearly
                # exceeds the estimated width of the text already shown on
                # this line — per-run absolute positioning of contiguous
                # text (tx == previous run's advance) must NOT get a space
                if (
                    cur
                    and tx - advance > 0.3 * font_size
                    and not cur[-1].endswith((" ", "\n"))
                ):
                    cur.append(" ")
                # Td moves the line origin: rebase the advance estimate
                advance = max(advance - tx, 0.0)
        elif op == b"T*":
            newline()
        elif op == b"Tm" and len(stack) >= 6 and isinstance(stack[-1], (int, float)):
            ty = float(stack[-1])
            if last_ty is not None and ty != last_ty:
                newline()
            last_ty = ty
        elif op == b"ET":
            newline()
        stack.clear()
    newline()
    return "\n".join(lines)


def _page_runs(doc: PdfDocument, page: dict) -> list[tuple]:
    """Geometry-tracking walk of the content stream: positioned text runs
    ``(x, y, text, est_width, font_size)`` in TEXT SPACE (translation
    components of Tm/Td; rotation/skew are ignored — column detection
    needs x-bands, not exact glyph metrics). Run widths reuse the same
    CJK~1em / other~0.5em estimate as the content-order extractor."""
    fonts: dict[str, tuple[dict[int, str], int] | None] = {}
    res = doc.resolve(page.get("Resources")) or {}
    font_dict = doc.resolve(res.get("Font")) or {}
    if isinstance(font_dict, dict):
        for fname, fref in font_dict.items():
            fobj = doc.resolve(fref)
            cmap = None
            if isinstance(fobj, dict):
                tu = fobj.get("ToUnicode")
                if isinstance(tu, Ref):
                    cmap = doc.tounicode(tu.num)
            fonts[str(fname)] = cmap
    contents = page.get("Contents")
    refs = contents if isinstance(contents, list) else [contents]
    blobs = [doc.stream_bytes(r.num) for r in refs if isinstance(r, Ref)]
    content = b"\n".join(b for b in blobs if b)
    runs: list[tuple] = []
    if not content:
        return runs

    cur_font: tuple[dict[int, str], int] | None = None
    font_size = 12.0
    x = y = line_x = line_y = 0.0
    leading = 0.0
    stack: list = []

    def est_width(s: str) -> float:
        return sum(font_size if ord(c) >= 0x2E80 else font_size * 0.5 for c in s)

    def show(raw: bytes):
        nonlocal x
        shown = _decode_with_font(raw, cur_font)
        if shown:
            w = est_width(shown)
            runs.append((x, y, shown, w, font_size))
            x += w

    def td(tx: float, ty: float):
        nonlocal x, y, line_x, line_y
        line_x += tx
        line_y += ty
        x, y = line_x, line_y

    lex = _Lexer(content)
    while True:
        try:
            tok = lex.next_token()
        except Exception:
            break
        if tok == b"":
            break
        if isinstance(tok, PdfString) or not isinstance(tok, bytes):
            stack.append(tok)
            continue
        op = tok
        if op == b"BT":
            x = y = line_x = line_y = 0.0
        elif op == b"Tf" and len(stack) >= 2 and isinstance(stack[-2], Name):
            cur_font = fonts.get(str(stack[-2]))
            if isinstance(stack[-1], (int, float)) and stack[-1] > 0:
                font_size = float(stack[-1])
        elif op == b"TL" and stack and isinstance(stack[-1], (int, float)):
            leading = float(stack[-1])
        elif op == b"Tm" and len(stack) >= 6 and isinstance(stack[-1], (int, float)) and isinstance(stack[-2], (int, float)):
            line_x = x = float(stack[-2])
            line_y = y = float(stack[-1])
        elif op in (b"Td", b"TD") and len(stack) >= 2 and isinstance(stack[-1], (int, float)) and isinstance(stack[-2], (int, float)):
            if op == b"TD":
                leading = -float(stack[-1])
            td(float(stack[-2]), float(stack[-1]))
        elif op == b"T*":
            td(0.0, -leading)
        elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
            show(stack[-1])
        elif op in (b"'", b'"') and stack and isinstance(stack[-1], bytes):
            td(0.0, -leading)
            show(stack[-1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    show(item)
                elif isinstance(item, (int, float)):
                    x -= float(item) / 1000.0 * font_size
        stack.clear()
    return runs


#: minimum empty x-band width (points) treated as a column gutter —
#: ~1.5 em at 12 pt; narrower whitespace is word spacing, not layout
MIN_COLUMN_GUTTER = 18.0


def _render_line(rrs: list[tuple]) -> str:
    """One baseline's runs, left-to-right, spacing real x-gaps — the same
    0.3 em gap rule as the content-order extractor."""
    parts: list[str] = []
    end_x = None
    for r in sorted(rrs, key=lambda t: t[0]):
        if (
            parts
            and end_x is not None
            and r[0] - end_x > 0.3 * r[4]
            and not parts[-1].endswith((" ", "\n"))
        ):
            parts.append(" ")
        parts.append(r[2])
        end_x = r[0] + r[3]
    return "".join(parts)


def _gutter_groups(block_runs: list[tuple], min_gutter: float) -> list[list[float]]:
    """Merged x-intervals of the runs; >= 2 groups means columns separated
    by an empty vertical band of at least ``min_gutter``."""
    iv = sorted((r[0], r[0] + r[3]) for r in block_runs)
    groups: list[list[float]] = []
    for s, e in iv:
        if groups and s - groups[-1][1] < min_gutter:
            groups[-1][1] = max(groups[-1][1], e)
        else:
            groups.append([s, e])
    return groups


#: XY-cut recursion depth cap: title-over-columns is depth 1, a column
#: block / full-width figure / more columns page is depth 2, sub-columns
#: inside a column is depth 3 — real documents don't nest deeper, and the
#: cap bounds worst-case work on adversarial run soups
XY_CUT_MAX_DEPTH = 4

#: a vertical whitespace band this many times the region's median line
#: spacing is a layout break (figure/table hole, section gap), not
#: paragraph leading
_VGAP_FACTOR = 1.9


def _ygap_bands(block_rows: list[list[tuple]]) -> list[list[list[tuple]]]:
    """Split top-to-bottom rows at vertical whitespace bands clearly wider
    than the region's own line spacing (gap > _VGAP_FACTOR x the median
    consecutive-baseline gap). Returns one band or several; never reorders
    rows. This is the horizontal cut of the XY-cut — it isolates a
    NON-spanning element with clear space around it (a centered figure
    caption narrower than 60%% of the region bridges no gutter and is no
    spanner, yet must still segment the column blocks above and below)."""
    if len(block_rows) < 3:
        return [block_rows]
    ys = [rrs[0][1] for rrs in block_rows]  # descending (top-to-bottom)
    gaps = [ys[i] - ys[i + 1] for i in range(len(ys) - 1)]
    med = sorted(gaps)[len(gaps) // 2]
    if med <= 0:
        return [block_rows]
    bands: list[list[list[tuple]]] = [[block_rows[0]]]
    for i, rrs in enumerate(block_rows[1:]):
        if gaps[i] > _VGAP_FACTOR * med:
            bands.append([rrs])
        else:
            bands[-1].append(rrs)
    return bands


def _xy_region(
    block_rows: list[list[tuple]], min_gutter: float, depth: int
) -> tuple[list[str], bool]:
    """Recursive XY-cut over one region's rows (top-to-bottom lists of
    runs). Returns (reading-order lines, found_columns).

    Per level: (1) segment at FULL-WIDTH spanner rows (a run wider than
    60%% of the REGION's text width — titles, abstracts, captions that do
    span), which bridge gutters without any whitespace signal; (2) per
    block, cut on vertical whitespace bands (``_ygap_bands`` — isolates
    narrow centered elements between column blocks); (3) per band, cut on
    x gutters (>= 2 merged x-intervals separated by ``min_gutter``) into
    columns and RECURSE into each column (nested layouts: a column block
    above a figure above more columns, sub-columns inside a column);
    (4) no cut -> emit rows in order. ``found_columns`` is set only by an
    actual x split — y cuts alone never reorder anything, so a page
    without column structure still reports None and keeps content order.
    """
    runs = [r for rrs in block_rows for r in rrs]
    if not runs:
        return [], False
    if depth <= 0:
        return [_render_line(rrs) for rrs in block_rows], False
    import bisect

    width = max(r[0] + r[3] for r in runs) - min(r[0] for r in runs)

    def is_spanner(rrs: list[tuple]) -> bool:
        return any(r[3] > 0.6 * width for r in rrs)

    blocks: list[tuple[bool, list[list[tuple]]]] = []
    cur: list[list[tuple]] = []
    for rrs in block_rows:
        if is_spanner(rrs):
            if cur:
                blocks.append((False, cur))
                cur = []
            blocks.append((True, [rrs]))
        else:
            cur.append(rrs)
    if cur:
        blocks.append((False, cur))

    out: list[str] = []
    found = False
    for spanner, rows in blocks:
        if spanner:
            out.extend(_render_line(rrs) for rrs in rows)
            continue
        bands = _ygap_bands(rows)
        for band in bands:
            groups = _gutter_groups([r for rrs in band for r in rrs], min_gutter)
            if len(groups) < 2:
                if len(bands) > 1:
                    # the y-split made strict progress (band ⊂ rows):
                    # re-examine the band one level down — it may hold its
                    # own spanner/column structure at band-local width
                    sub, f = _xy_region(band, min_gutter, depth - 1)
                    out.extend(sub)
                    found = found or f
                else:
                    out.extend(_render_line(rrs) for rrs in band)
                continue
            found = True
            starts = [g[0] for g in groups]
            cols: list[list[list[tuple]]] = [[] for _ in groups]  # col -> rows
            for rrs in band:
                per_col: dict[int, list[tuple]] = {}
                for r in rrs:
                    i = max(bisect.bisect_right(starts, r[0]) - 1, 0)
                    per_col.setdefault(i, []).append(r)
                for i, col_runs in per_col.items():
                    cols[i].append(col_runs)
            for col in cols:
                sub, f = _xy_region(col, min_gutter, depth - 1)
                out.extend(sub)
                found = found or f
    return out, found


def _columns_text(runs: list[tuple], min_gutter: float = MIN_COLUMN_GUTTER) -> str | None:
    """Reading-order text from positioned runs; None when no column
    structure is detected anywhere on the page (caller falls back to
    content order).

    Recursive XY-cut (``_xy_region``, depth-capped): rows (baselines, y
    quantized, top-to-bottom — PDF y grows upward) are segmented by
    full-width spanner rows and by vertical whitespace bands, then split
    at x gutters into columns, recursively — so nested layouts (column
    block above a full-width or narrow centered figure caption above more
    columns; sub-columns within a column) extract in reading order. A
    layout with NO whitespace or width signal at a block boundary (e.g. a
    narrow caption spaced exactly like body lines) is inherently
    ambiguous and keeps the x-band order — heuristic limit, documented.
    """
    txt = [r for r in runs if r[2].strip()]
    if not txt:
        return None
    by_line: dict[float, list[tuple]] = {}
    for r in txt:
        by_line.setdefault(round(r[1], 1), []).append(r)
    rows = [by_line[y] for y in sorted(by_line, reverse=True)]
    out, any_columns = _xy_region(rows, min_gutter, XY_CUT_MAX_DEPTH)
    if not any_columns:
        return None
    return "\n".join(out)


# -- running header/footer suppression (opt-in) ------------------------------

_HF_DIGIT_RE = re.compile(r"[0-9]+")
_HF_Y_QUANT = 2.0  # same-y tolerance (points) for "the same running line"
_HF_MIN_FRAC = 0.5  # repeated on at least half the pages (and always >= 2)


def _hf_rows(runs: list[tuple]) -> dict[float, list[tuple]]:
    by_line: dict[float, list[tuple]] = {}
    for r in runs:
        if r[2].strip():
            by_line.setdefault(round(r[1], 1), []).append(r)
    return by_line


def _hf_line_key(y: float, rendered: str) -> tuple:
    """Identity of a running line: digits masked (page NUMBERS vary —
    'Page 3 of 10' == 'Page 7 of 10') + quantized baseline y (a header
    repeats at the same place; the same sentence in body text does not)."""
    return (_HF_DIGIT_RE.sub("#", rendered.strip()), round(y / _HF_Y_QUANT))


def _repeated_line_keys(per_page_runs: list[list[tuple]]) -> set:
    """Line keys present on >= max(2, ceil(_HF_MIN_FRAC * pages)) pages."""
    counts: dict[tuple, int] = {}
    for runs in per_page_runs:
        for y, rrs in _hf_rows(runs).items():
            rendered = _render_line(rrs)
            if rendered.strip():
                k = _hf_line_key(y, rendered)
                counts[k] = counts.get(k, 0) + 1
    import math

    need = max(2, math.ceil(_HF_MIN_FRAC * len(per_page_runs)))
    return {k for k, c in counts.items() if c >= need}


def _strip_repeated_runs(runs: list[tuple], keys: set) -> list[tuple]:
    """Drop every run belonging to a flagged line, preserving the original
    content-stream order of the survivors."""
    drop: set[int] = set()
    by_line: dict[float, list[int]] = {}
    for i, r in enumerate(runs):
        by_line.setdefault(round(r[1], 1), []).append(i)
    for y, idxs in by_line.items():
        rendered = _render_line([runs[i] for i in idxs])
        if rendered.strip() and _hf_line_key(y, rendered) in keys:
            drop.update(idxs)
    return [r for i, r in enumerate(runs) if i not in drop]


def _lines_text(runs: list[tuple]) -> str:
    """Plain positional rendering: baselines top-to-bottom, runs
    left-to-right with the shared gap rule — the renderer for suppression
    mode on pages with no column structure."""
    by_line = _hf_rows(runs)
    return "\n".join(_render_line(by_line[y]) for y in sorted(by_line, reverse=True))


def extract_pdf_text(
    data: bytes,
    add_page_header: bool = False,
    password: bytes | str = b"",
    column_layout: bool = False,
    strip_repeated: bool = False,
) -> str:
    """Whole-document text, page-concatenated like the reference
    (``PdfHelper.cs:140-170``): per page trim CR/LF/space, optional
    ``=== [Page i/n] ===`` header, blank-line separators, blank pages kept
    as separators. ``password`` opens password-protected files the way
    PdfPig's open-with-password does for the reference; a wrong password
    degrades to empty pages via ``encryption_unsupported``.

    ``column_layout=True`` reorders multi-column pages into reading order
    (x-band gutter detection over positioned runs — ``_columns_text``);
    pages with no detected column structure keep content order. OFF by
    default DELIBERATELY: the reference's ContentOrderTextExtractor
    (``PdfHelper.cs:40``) emits content-stream order, so the default
    stays byte-parity with it and column mode is the opt-in improvement
    for two-column papers/scanned books, where content order interleaves
    the columns.

    ``strip_repeated=True`` removes running headers/footers: lines whose
    digit-masked text repeats at the same quantized y on at least half
    the pages (min 2). Also opt-in and positional by nature (pages with
    flagged lines render baselines top-to-bottom); with no repeats —
    including every single-page document — output is identical to the
    flag being off. The reference has no counterpart (PdfPig
    ContentOrderTextExtractor keeps running lines)."""
    doc = PdfDocument(data, password=password)
    pages = doc.pages()
    total = len(pages)
    if total == 0:
        return ""
    hf_keys: set = set()
    runs_cache: dict[int, list | None] = {}
    if strip_repeated and total >= 2:
        for idx, page in enumerate(pages):
            try:
                runs_cache[idx] = _page_runs(doc, page)
            except Exception:
                runs_cache[idx] = None
        hf_keys = _repeated_line_keys([r for r in runs_cache.values() if r])
    parts: list[str] = []
    for i, page in enumerate(pages, 1):
        try:
            text = None
            if column_layout or hf_keys:
                # an isolated attempt: a failure in the positional pass
                # must degrade to content order, not to an empty page.
                # (A no-column page pays the runs walk twice — the cost
                # of the opt-in mode, correctness first.)
                try:
                    runs = runs_cache.get(i - 1, ...)
                    if runs is ...:
                        runs = _page_runs(doc, page)
                    if runs is not None and hf_keys:
                        stripped = _strip_repeated_runs(runs, hf_keys)
                        if len(stripped) < len(runs):
                            # a page with flagged lines renders positionally
                            text = (
                                _columns_text(stripped) if column_layout else None
                            ) or _lines_text(stripped)
                            runs = None  # positional path taken
                        else:
                            runs = stripped
                    if text is None and column_layout and runs is not None:
                        text = _columns_text(runs)
                except Exception:
                    text = None
            if text is None:
                text = _page_text(doc, page)
            text = text.strip("\r\n ")
        except Exception:
            text = ""
        if add_page_header:
            parts.append(f"=== [Page {i}/{total}] ===")
        if text:
            parts.append(text)
        parts.append("")  # blank separator line
    return "\n".join(parts) + "\n" if parts else ""


def _match_groups(cols: list, groups: list, x_tol: float) -> list[int] | None:
    """Assign each row group to a distinct grid column by left edge
    (both sorted; two-pointer). None if any group matches no column —
    rows may have FEWER groups than the grid (missing/empty cells), never
    unmatched ones."""
    out: list[int] = []
    i = 0
    for g in groups:
        while i < len(cols) and cols[i][0] < g[0] - x_tol:
            i += 1
        if i >= len(cols) or abs(cols[i][0] - g[0]) > x_tol:
            return None
        out.append(i)
        i += 1
    return out


def extract_pdf_tables(
    data: bytes,
    password: bytes | str = b"",
    min_gutter: float = 18.0,
    min_rows: int = 2,
    min_cols: int = 2,
    x_tol: float = 10.0,
) -> list[list[list[list[str]]]]:
    """Detect column-aligned text grids (tables) from positioned runs.

    Returns one list per page; each table is rows (top-to-bottom) of
    cell strings (left-to-right, ``''`` for an empty cell). A table is a
    maximal block of >= ``min_rows`` consecutive baselines whose runs
    fall into the SAME >= ``min_cols`` x-interval groups (gutters of at
    least ``min_gutter`` between them, left edges agreeing within
    ``x_tol``); each row's runs are assigned to the rightmost column
    whose left edge they reach, and rendered with the extractor's
    standard gap rule.

    Opt-in by nature (the reference's ContentOrderTextExtractor has no
    table concept — this closes the SURVEY §2.8 table-extraction scope
    cut). Known limitation, documented: a two-column BODY page is
    geometrically a two-column grid, so on column-layout documents
    either pre-split with ``column_layout=True`` or raise ``min_cols``
    to 3 — the detector reads geometry, not semantics. Failures on a
    page (bad content stream) yield that page's ``[]``, never an
    exception — same degradation contract as text extraction.
    """
    doc = PdfDocument(data, password=password)
    out: list[list[list[list[str]]]] = []
    for page in doc.pages():
        tables: list[list[list[str]]] = []
        try:
            runs = _page_runs(doc, page)
        except Exception:
            out.append(tables)
            continue
        by_line = _hf_rows(runs)
        rows = [by_line[y] for y in sorted(by_line, reverse=True)]
        cur_rows: list[list[tuple]] = []
        cur_cols: list[list[float]] | None = None

        def flush() -> None:
            nonlocal cur_rows, cur_cols
            if cur_cols is not None and len(cur_rows) >= min_rows:
                table: list[list[str]] = []
                for rrs in cur_rows:
                    cells: list[list[tuple]] = [[] for _ in cur_cols]
                    for r in sorted(rrs, key=lambda t: t[0]):
                        ci = 0
                        for i, g in enumerate(cur_cols):
                            if r[0] >= g[0] - x_tol:
                                ci = i
                        cells[ci].append(r)
                    table.append([_render_line(c) if c else "" for c in cells])
                tables.append(table)
            cur_rows, cur_cols = [], None

        for rrs in rows:
            groups = _gutter_groups(rrs, min_gutter)
            matched = (
                _match_groups(cur_cols, groups, x_tol)
                if cur_cols is not None and len(groups) >= 1
                else None
            )
            if cur_cols is not None and matched is not None and len(groups) >= 2:
                # a continuation row: its groups all sit on known column
                # edges (possibly a subset — missing/empty cells)
                cur_rows.append(rrs)
                for g, ci in zip(groups, matched):
                    cur_cols[ci][0] = min(cur_cols[ci][0], g[0])
                    cur_cols[ci][1] = max(cur_cols[ci][1], g[1])
            elif len(groups) >= min_cols:
                flush()
                cur_rows = [rrs]
                cur_cols = [list(g) for g in groups]
            else:
                flush()
        flush()
        out.append(tables)
    return out


def pdf_to_text(
    data: bytes,
    config: str | None = None,
    punct: bool = False,
    add_page_header: bool = False,
    reflow: bool = False,
    compact: bool = False,
    converter: Converter | None = None,
    password: bytes | str = b"",
    column_layout: bool = False,
    strip_repeated: bool = False,
) -> str:
    """The reference's full pdf-command pipeline over one PDF byte blob
    (``PdfCommand.cs:211-247``): extract -> NormalizeCompat (always, like
    the reference's unconditional NormalizeUnicodeCompatibility pass) ->
    optional reflow -> optional conversion. ``config=None`` =
    extract-only. (The reference's --norm-compat flag re-normalizes before
    conversion; normalization is idempotent, so that second pass can never
    change anything and is not reproduced.)"""
    cc = converter or default_converter()
    text = extract_pdf_text(
        data, add_page_header, password=password, column_layout=column_layout,
        strip_repeated=strip_repeated,
    )
    text = cc.normalize_compat(text)
    if reflow:
        text = reflow_cjk_paragraphs(text, add_pdf_page_header=add_page_header, compact=compact)
    if config is not None:
        text = cc.convert(text, config, punct)
    return text


def convert_pdf_files(
    spark: SparkSession,
    path_glob: str,
    config: str | None = None,
    punct: bool = False,
    add_page_header: bool = False,
    reflow: bool = False,
    compact: bool = False,
    password: bytes | str = b"",
    column_layout: bool = False,
    strip_repeated: bool = False,
) -> DataFrame:
    """binaryFile scan -> per-file extract/reflow/convert -> (path, text).
    ``password`` (one shared user/owner password, the common corpus case)
    is captured into the UDF closure and shipped with the task."""
    binary = spark.read.format("binaryFile").load(path_glob)

    def _extract(batches):
        for pdf in batches:
            out = [
                pdf_to_text(
                    bytes(c), config, punct, add_page_header, reflow, compact,
                    password=password, column_layout=column_layout,
                    strip_repeated=strip_repeated,
                )
                for c in pdf["content"]
            ]
            yield pd.DataFrame({"path": pdf["path"], "text": out})

    return binary.select("path", "content").mapInPandas(_extract, "path string, text string")
