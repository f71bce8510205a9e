"""PDF text extraction + CJK reflow + conversion (reference ``pdf`` command).

The reference extracts page text with PdfPig's content-order extractor,
optionally adds ``=== [Page x/y] ===`` headers, reflows CJK paragraphs, and
converts (``OpenccNet/PdfCommand.cs:211-247``, ``PdfHelper.cs:98-170``).
PdfPig is a full managed PDF library; this module is a from-scratch minimal
extractor for TEXT-BEARING PDFs, covering the structures that matter for a
text corpus:

* classic xref or no xref (objects found by scanning), FlateDecode streams,
  object streams (``/Type /ObjStm``);
* page order via the ``/Root -> /Pages -> /Kids`` tree (fallback: object
  order) — the reference's page iteration order;
* text operators ``BT/ET Tf Td TD T* Tm Tj TJ ' "``, with newline emission
  on line-moves — a simplification of PdfPig's layout analysis that is
  exact for line-oriented text PDFs;
* per-font ``/ToUnicode`` CMaps (bfchar + bfrange, 1- and 2-byte codes) for
  CJK (Identity-H etc.); fonts without a CMap decode as Latin-1.

Honest limits (documented, not hidden): no encrypted PDFs, no per-glyph
positioning reconstruction, no predictor-coded xref streams, non-Flate
filters skipped. Unsupported content degrades to skipped streams, never to
exceptions.

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
        raw = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos + 1 : end])
        self.pos = end + 1
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


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    """Parsed object table + page tree of one PDF byte blob."""

    def __init__(self, data: bytes):
        self.data = data
        self.objects: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}  # raw (still encoded) stream data
        self._cmap_cache: dict[int, tuple[dict[int, str], int] | None] = {}
        self._scan_objects()
        self._expand_object_streams()

    # -- object table --

    def _scan_objects(self):
        d = self.data
        for m in _OBJ_RE.finditer(d):
            num = int(m.group(1))
            body_start = m.end()
            lex = _Lexer(d, body_start)
            try:
                value = lex.next_token()
            except Exception:
                continue
            self.objects[num] = value
            # stream payload?
            rest = d[lex.pos : lex.pos + 32]
            sm = re.match(rb"\s*stream(\r\n|\n|\r)", rest)
            if sm and isinstance(value, dict):
                start = lex.pos + sm.end()
                length = value.get("Length")
                if isinstance(length, Ref):
                    length = self.objects.get(length.num)
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
        filt = self.resolve(info.get("Filter"))
        filters = [filt] if not isinstance(filt, list) else list(filt)
        out = raw
        for f in filters:
            f = self.resolve(f)
            if f is None:
                continue
            if str(f) == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error:
                    return b""
            else:
                return b""  # unsupported filter: skip stream honestly
        return out

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

    def newline():
        nonlocal cur
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
        elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
            cur.append(_decode_with_font(stack[-1], cur_font))
        elif op in (b"'", b'"') and stack and isinstance(stack[-1], bytes):
            newline()
            cur.append(_decode_with_font(stack[-1], cur_font))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    cur.append(_decode_with_font(item, cur_font))
        elif op in (b"Td", b"TD") and len(stack) >= 2 and isinstance(stack[-1], (int, float)):
            if stack[-1] != 0:  # vertical move => new line
                newline()
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


def extract_pdf_text(data: bytes, add_page_header: bool = False) -> str:
    """Whole-document text, page-concatenated like the reference
    (``PdfHelper.cs:140-170``): per page trim CR/LF/space, optional
    ``=== [Page i/n] ===`` header, blank-line separators, blank pages kept
    as separators."""
    doc = PdfDocument(data)
    pages = doc.pages()
    total = len(pages)
    if total == 0:
        return ""
    parts: list[str] = []
    for i, page in enumerate(pages, 1):
        try:
            text = _page_text(doc, page).strip("\r\n ")
        except Exception:
            text = ""
        if add_page_header:
            parts.append(f"=== [Page {i}/{total}] ===")
        if text:
            parts.append(text)
        parts.append("")  # blank separator line
    return "\n".join(parts) + "\n" if parts else ""


def pdf_to_text(
    data: bytes,
    config: str | None = None,
    punct: bool = False,
    add_page_header: bool = False,
    reflow: bool = False,
    compact: bool = False,
    converter: Converter | None = None,
) -> str:
    """The reference's full pdf-command pipeline over one PDF byte blob
    (``PdfCommand.cs:211-247``): extract -> NormalizeCompat (always, like
    the reference's unconditional NormalizeUnicodeCompatibility pass) ->
    optional reflow -> optional conversion. ``config=None`` =
    extract-only. (The reference's --norm-compat flag re-normalizes before
    conversion; normalization is idempotent, so that second pass can never
    change anything and is not reproduced.)"""
    cc = converter or default_converter()
    text = extract_pdf_text(data, add_page_header)
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
) -> DataFrame:
    """binaryFile scan -> per-file extract/reflow/convert -> (path, text)."""
    binary = spark.read.format("binaryFile").load(path_glob)

    def _extract(batches):
        for pdf in batches:
            out = [
                pdf_to_text(
                    bytes(c), config, punct, add_page_header, reflow, compact
                )
                for c in pdf["content"]
            ]
            yield pd.DataFrame({"path": pdf["path"], "text": out})

    return binary.select("path", "content").mapInPandas(_extract, "path string, text string")
