"""PDF extraction + CJK reflow tests (reference PdfCommand/ReflowHelper).

Reference behaviors pinned: page order + [Page x/y] headers + blank-page
separators (PdfHelper.cs:140-170), ToUnicode CMap decoding, reflow joins/
breaks (ReflowHelper.cs:163-510), heading/metadata/divider/list handling,
repeated-header collapsing.
"""

from __future__ import annotations

from openccnet_spark.reflow import (
    ends_with_sentence_boundary,
    has_unclosed_bracket,
    has_unclosed_dialog_quote,
    reflow_cjk_paragraphs,
)
from openccnet_spark.sources.pdf import extract_pdf_text, pdf_to_text
from openccnet_spark.sources.pdf_synth import build_pdf


def test_extract_cjk_pages():
    pdf = build_pdf([["他走在路上，忽然看见", "一个熟悉的身影。"], ["第二页内容。"]])
    assert extract_pdf_text(pdf) == "他走在路上，忽然看见\n一个熟悉的身影。\n\n第二页内容。\n\n"


def test_extract_page_headers_and_blank_page():
    pdf = build_pdf([["第一页。"], [], ["第三页。"]])
    out = extract_pdf_text(pdf, add_page_header=True)
    assert "=== [Page 1/3] ===" in out
    assert "=== [Page 2/3] ===" in out  # blank page keeps its header
    assert "=== [Page 3/3] ===" in out
    assert "第三页。" in out


def test_extract_ascii_uncompressed():
    pdf = build_pdf([["hello (world) \\ test", "line two"]], cjk=False, compress=False)
    assert extract_pdf_text(pdf) == "hello (world) \\ test\nline two\n\n"


def test_pdf_pipeline_reflow_and_convert():
    pdf = build_pdf([["他走在路上，忽然看见", "一个熟悉的身影。"], ["第二页内容。"]])
    out = pdf_to_text(pdf, config="s2t", reflow=True)
    assert out == "他走在路上，忽然看見一個熟悉的身影。\n\n第二頁內容。"


def test_pdf_extract_only():
    pdf = build_pdf([["简体字不转换"]])
    assert "简体字不转换" in pdf_to_text(pdf)  # config=None: extract only


def test_spark_pdf_source(spark, tmp_path):
    pdf = build_pdf([["他走在路上，忽然看见", "一个熟悉的身影。"]])
    (tmp_path / "a.pdf").write_bytes(pdf)
    (tmp_path / "b.pdf").write_bytes(pdf)
    from openccnet_spark.sources.pdf import convert_pdf_files

    rows = convert_pdf_files(
        spark, str(tmp_path / "*.pdf"), config="t2s", reflow=True
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.text == "他走在路上，忽然看见一个熟悉的身影。"


# --- reflow unit behavior ------------------------------------------------------


def test_reflow_joins_wrapped_paragraph():
    out = reflow_cjk_paragraphs("他走在路上，忽然看见\n一个熟悉的身影，那是\n多年未见的老朋友。")
    assert out == "他走在路上，忽然看见一个熟悉的身影，那是多年未见的老朋友。"


def test_reflow_chapter_heading_standalone():
    out = reflow_cjk_paragraphs("第一章 初遇\n他走在路上。")
    assert out == "第一章 初遇\n\n他走在路上。"


def test_reflow_dialog_kept_whole():
    out = reflow_cjk_paragraphs("“你还好吗？”他问道，\n声音里带着颤抖。")
    assert out == "“你还好吗？”他问道，声音里带着颤抖。"


def test_reflow_metadata_and_divider_standalone():
    out = reflow_cjk_paragraphs("作者：某人\n---\n正文第一句。")
    assert out.split("\n\n") == ["作者：某人", "---", "正文第一句。"]


def test_reflow_unclosed_quote_joins_across_blank_line():
    # a blank line inside an open quote is extraction noise, not a break
    out = reflow_cjk_paragraphs("“他说道，这个句子很长\n\n还没有说完。”然后停了。")
    assert out == "“他说道，这个句子很长还没有说完。”然后停了。"


def test_reflow_page_header_mode_breaks_on_blank():
    txt = "=== [Page 1/2] ===\n第一段完。\n\n=== [Page 2/2] ===\n第二段完。"
    out = reflow_cjk_paragraphs(txt, add_pdf_page_header=True)
    parts = out.split("\n\n")
    assert "=== [Page 1/2] ===" in parts and "第二段完。" in parts


def test_reflow_collapses_repeated_header_tokens():
    # 3+ consecutive repeats of a short phrase collapse to one
    out = reflow_cjk_paragraphs("某书名 某书名 某书名 某书名\n正文开始了。")
    assert "某书名 某书名" not in out
    assert "某书名" in out


def test_reflow_list_lines():
    out = reflow_cjk_paragraphs("1) 第一项。\n2) 第二项。")
    assert out == "1) 第一项。\n\n2) 第二项。"


def test_reflow_compact_mode():
    out = reflow_cjk_paragraphs("第一段。\n第二段。", compact=True)
    assert out == "第一段。\n第二段。"


def test_punct_helpers():
    assert has_unclosed_bracket("（未闭合")
    assert not has_unclosed_bracket("（闭合了）")
    assert has_unclosed_bracket("错配）")  # unmatched closer counts
    assert not has_unclosed_bracket("无括号")
    assert has_unclosed_dialog_quote("“开着")
    assert not has_unclosed_dialog_quote("“闭合”")
    assert ends_with_sentence_boundary("他说完了。")
    assert ends_with_sentence_boundary("他问：“好吗？”")  # closer after strong end
    assert not ends_with_sentence_boundary("他说，")


def test_tounicode_bfrange_with_indented_array_destination():
    """Regression: an lstripped-offset bug dropped every bfrange after an
    indented [..] destination array (code-review finding, round 2)."""
    from openccnet_spark.sources.pdf import parse_tounicode

    cmap = (
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfrange\n"
        b"<0001> <0002>\n        [<4E00> <4E8C>]\n"
        b"<0010> <0012> <5B66>\n"
        b"endbfrange"
    )
    table, width = parse_tounicode(cmap)
    assert width == 2
    assert table[0x0001] == "一" and table[0x0002] == "二"
    # the range AFTER the array destination must survive
    assert table[0x0010] == "学" and table[0x0012] == "孨"


def test_xref_stream_predictor_path():
    """A PDF 1.5 cross-reference STREAM (FlateDecode + PNG predictor 12,
    no `trailer` keyword anywhere) must load via the xref path — not the
    object-scan fallback — and extract identically to the classic layout."""
    from openccnet_spark.sources.pdf import PdfDocument
    from openccnet_spark.sources.pdf_synth import build_pdf_xrefstream

    pages = [["他走在路上，忽然看见", "一个熟悉的身影。"], ["第二页内容。"]]
    xs = build_pdf_xrefstream(pages)
    assert b"trailer" not in xs
    doc = PdfDocument(xs)
    assert doc.xref_loaded is True
    assert extract_pdf_text(xs) == extract_pdf_text(build_pdf(pages))


import pytest as _pytest


@_pytest.mark.parametrize("method", ["rc4", "aesv2", "aesv3"])
def test_encrypted_pdf_decrypts_transparently(method):
    """Standard security handler with an EMPTY user password (the common
    permissions-only encryption), all three cipher generations — RC4
    (V2/R3), AES-128 (V4/R4 /AESV2), AES-256 (V5/R6 with the Algorithm
    2.B iterated hash): extraction must equal the unencrypted document;
    the file must not contain the plaintext streams."""
    from openccnet_spark.sources.pdf import PdfDocument
    from openccnet_spark.sources.pdf_synth import build_pdf, build_pdf_encrypted

    pages = [["他走在路上，忽然看见", "一个熟悉的身影。"], ["第二页内容。"]]
    plain = build_pdf(pages)
    enc = build_pdf_encrypted(pages, method=method)
    doc = PdfDocument(enc)
    assert doc._file_key is not None and not doc.encryption_unsupported
    assert extract_pdf_text(enc) == extract_pdf_text(plain)
    import zlib

    assert zlib.compress(b"BT /F1 12 Tf 72 720 Td") not in enc


@_pytest.mark.parametrize("method", ["rc4", "aesv2", "aesv3"])
def test_real_password_pdf_degrades_honestly(method):
    """A password-protected file opened WITHOUT its password must mark
    itself unsupported and extract as empty — never garbage. (Supplying
    the password opens it: see the tests below.)"""
    from openccnet_spark.sources.pdf import PdfDocument
    from openccnet_spark.sources.pdf_synth import build_pdf_encrypted

    locked = build_pdf_encrypted([["秘密内容"]], user_pw=b"secret", method=method)
    doc = PdfDocument(locked)
    assert doc.encryption_unsupported is True
    assert extract_pdf_text(locked).strip() == ""


def test_aes_fips_vectors():
    """The pure-Python AES must match the FIPS-197 appendix C vectors."""
    from openccnet_spark.sources.pdf_aes import (
        cbc_decrypt,
        cbc_encrypt,
        decrypt_block,
        encrypt_block,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    vectors = {
        bytes(range(16)): "69c4e0d86a7b0430d8cdb78070b4c55a",
        bytes(range(24)): "dda97ca4864cdfe06eaf70a0ec0d7191",
        bytes(range(32)): "8ea2b7ca516745bfeafc49904b496089",
    }
    for key, ct in vectors.items():
        assert encrypt_block(key, pt).hex() == ct
        assert decrypt_block(key, bytes.fromhex(ct)) == pt
    iv = bytes(range(16))
    data = b"0123456789abcdef" * 3
    assert cbc_decrypt(bytes(range(32)), iv, cbc_encrypt(bytes(range(32)), iv, data)) == data


def test_auxiliary_stream_filters():
    """ASCIIHex / ASCII85 / RunLength / LZW decode, incl. a full PDF whose
    content stream is ASCII85(Flate(...)) — a filter CHAIN."""
    import base64
    import zlib

    from openccnet_spark.sources.pdf import (
        _ascii85_decode,
        _asciihex_decode,
        _lzw_decode,
        _runlength_decode,
    )

    assert _asciihex_decode(b"48 65 6C6C 6F>") == b"Hello"
    for payload in (b"hello world", b"\x00\x00\x00\x00abc", bytes(range(97))):
        assert _ascii85_decode(base64.a85encode(payload, adobe=True)) == payload
    assert _runlength_decode(b"\x02abc\xfeZ\x80") == b"abcZZZ"
    # LZW: clear + literals + EOD, hand-packed 9-bit codes
    codes = [256, ord("a"), ord("b"), 257]
    acc = n = 0
    packed = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        n += 9
        while n >= 8:
            packed.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        packed.append((acc << (8 - n)) & 0xFF)
    assert _lzw_decode(bytes(packed)) == b"ab"
    # end-to-end chain: content stream stored as ASCII85(Flate(ops))
    ops = b"BT (chained filters) Tj ET"
    payload = base64.a85encode(zlib.compress(ops)) + b"~>"
    pdf = (
        b"%%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n"
        % len(payload)
        + payload
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "chained filters\n\n"


def test_rc4_roundtrip_and_algorithm_vectors():
    """pdf_crypt primitives: RC4 against a published test vector and the
    O/U/key algorithms' self-consistency."""
    from openccnet_spark.sources.pdf_crypt import (
        authenticate_user_password,
        compute_file_key,
        compute_o_entry,
        compute_u_entry,
        rc4,
    )

    # classic RC4 test vector (public): key "Key", plaintext "Plaintext"
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Key", rc4(b"Key", b"payload")) == b"payload"
    o = compute_o_entry(b"owner", b"", 3, 16)
    key = compute_file_key(b"", o, -44, b"id0", 3, 16)
    u = compute_u_entry(key, b"id0", 3)
    assert authenticate_user_password(b"", o, u, -44, b"id0", 3, 16) == key
    assert authenticate_user_password(b"wrong", o, u, -44, b"id0", 3, 16) is None


def test_unterminated_hex_string_terminates():
    """Regression (round-3 advice, high): a truncated `<hex` with no
    closing '>' used to rewind the lexer to position 0 and loop forever,
    hanging the executor task. It must now consume to end-of-input."""
    from openccnet_spark.sources.pdf import _Lexer

    lex = _Lexer(b"<303132")
    assert lex.next_token() == b"012"
    assert lex.pos == 7  # at end-of-input, not rewound
    # end-to-end: a content stream ending in an unterminated hex string
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 20 >>\nstream\nBT (abc) Tj <4142 ET\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "abc\n\n"


def test_forward_referenced_stream_length():
    """Regression (round-3 advice, medium): an indirect /Length whose value
    object appears AFTER the stream used to fall to the rstrip fallback,
    which eats Flate payloads ending in \\r/\\n (~1/64 of streams). The
    two-pass scan must hit the exact-length path."""
    import zlib

    payload = zlib.compress(b"BT (fwd 17 marker) Tj ET")
    assert payload.endswith(b"\n")  # the byte the old fallback stripped
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 9 0 R /Filter /FlateDecode >>\nstream\n"
        + payload
        + b"\nendstream\nendobj\n"
        b"9 0 obj\n%d\nendobj\n" % len(payload)
    )
    assert extract_pdf_text(pdf) == "fwd 17 marker\n\n"


def test_png_predictor_unfiltering_all_types():
    """_unpredict must invert every PNG row filter (Sub/Up/Average/Paeth),
    not just the Up filter xref streams typically use."""
    from openccnet_spark.sources.pdf import PdfDocument

    doc = PdfDocument.__new__(PdfDocument)
    doc.objects = {}
    rows = [bytes([10, 20, 30, 40]), bytes([15, 25, 35, 45]), bytes([200, 1, 7, 255])]
    for ft in (0, 1, 2, 3, 4):
        prev = bytes(4)
        enc = bytearray()
        for row in rows:
            if ft == 0:
                out = row
            elif ft == 1:
                out = bytes((row[j] - (row[j - 1] if j else 0)) & 0xFF for j in range(4))
            elif ft == 2:
                out = bytes((row[j] - prev[j]) & 0xFF for j in range(4))
            elif ft == 3:
                out = bytes(
                    (row[j] - (((row[j - 1] if j else 0) + prev[j]) >> 1)) & 0xFF
                    for j in range(4)
                )
            else:
                out = bytearray()
                for j in range(4):
                    a = row[j - 1] if j else 0
                    b, c = prev[j], (prev[j - 1] if j else 0)
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    out.append((row[j] - pr) & 0xFF)
            enc.append(ft)
            enc += out
            prev = row
        got = doc._unpredict(bytes(enc), {"Predictor": 12, "Columns": 4})
        assert got == b"".join(rows), f"filter type {ft}"


# --- property-based fuzzing -----------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_CJK_LINE = st.text(
    alphabet=st.sampled_from("他走在路上忽然看见一个熟悉的身影说道，。？！“”「」（）…的是了不在有人"),
    min_size=1,
    max_size=40,
)


@settings(max_examples=120, deadline=None)
@given(st.lists(_CJK_LINE, min_size=1, max_size=12))
def test_reflow_preserves_content(lines):
    """Reflow only RE-GROUPS lines: with no edge whitespace, the
    concatenation of output segments equals the concatenation of input
    lines — after the same repeated-segment collapse reflow itself applies
    (a random line CAN be a periodic repeat, e.g. one char x 12, which
    reflow legitimately collapses)."""
    from openccnet_spark.reflow import _collapse_repeated_segments

    text = "\n".join(lines)
    out = reflow_cjk_paragraphs(text)
    expected = "".join(_collapse_repeated_segments(ln) for ln in lines)
    assert out.replace("\n", "") == expected


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.sampled_from("汉字内容测试的了是不一ABC abz09，。"),
                min_size=1,
                max_size=30,
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_pdf_build_extract_roundtrip(pages):
    """Arbitrary BMP text through build_pdf -> extract_pdf_text comes back
    line-exact (fuzzes the lexer, Flate, page tree and CMap decode)."""
    pdf = build_pdf(pages, cjk=True)
    out = extract_pdf_text(pdf)
    expected = "".join(
        ("\n".join(lines).strip("\r\n ") + "\n\n" if "\n".join(lines).strip("\r\n ") else "\n")
        for lines in pages
    )
    assert out == expected


@_pytest.mark.parametrize("method", ["rc4", "aesv2", "aesv3"])
def test_password_protected_pdf_opens_with_user_password(method):
    """A REAL user password (Algorithm 2 for V<=4, Algorithm 2.A for V5)
    must open the file when supplied; a wrong password must degrade via
    the existing encryption_unsupported surface."""
    from openccnet_spark.sources.pdf import PdfDocument, extract_pdf_text
    from openccnet_spark.sources.pdf_synth import build_pdf, build_pdf_encrypted

    pages = [["他走在路上，忽然看见", "一个熟悉的身影。"], ["第二页内容。"]]
    plain = extract_pdf_text(build_pdf(pages))
    locked = build_pdf_encrypted(pages, user_pw=b"s3cret", method=method)

    doc = PdfDocument(locked, password=b"s3cret")
    assert doc._file_key is not None and not doc.encryption_unsupported
    assert extract_pdf_text(locked, password=b"s3cret") == plain
    assert extract_pdf_text(locked, password="s3cret") == plain  # str ok

    wrong = PdfDocument(locked, password=b"nope")
    assert wrong.encryption_unsupported is True
    # pages degrade to empty (only blank-page separators remain)
    assert extract_pdf_text(locked, password=b"nope").strip() == ""


@_pytest.mark.parametrize("method", ["rc4", "aesv2", "aesv3"])
def test_password_protected_pdf_opens_with_owner_password(method):
    """The owner password must also open the file (Algorithm 7 for V<=4,
    Algorithm 2.A owner path for V5)."""
    from openccnet_spark.sources.pdf import extract_pdf_text
    from openccnet_spark.sources.pdf_synth import build_pdf, build_pdf_encrypted

    pages = [["秘密内容第一行。"]]
    plain = extract_pdf_text(build_pdf(pages))
    locked = build_pdf_encrypted(
        pages, user_pw=b"uspw", owner_pw=b"own3r", method=method
    )
    assert extract_pdf_text(locked, password=b"own3r") == plain


def test_password_pdf_converts_through_pipeline():
    """pdf_to_text must accept the password and run the full extract ->
    normalize -> convert pipeline on a protected file."""
    from openccnet_spark.sources.pdf import pdf_to_text
    from openccnet_spark.sources.pdf_synth import build_pdf_encrypted

    locked = build_pdf_encrypted([["这是简体内容。"]], user_pw=b"pw", method="aesv3")
    assert pdf_to_text(locked, config="s2t", password=b"pw").strip() == "這是簡體內容。"


def test_incremental_update_free_entry_tombstones_old_object():
    """An object freed in a NEWER xref section must not be resurrected
    from its older /Prev definition (deleted content must stay deleted —
    PDF 1.7 incremental-update semantics)."""
    from openccnet_spark.sources.pdf import PdfDocument, extract_pdf_text
    from openccnet_spark.sources.pdf_synth import build_pdf

    base = build_pdf([["秘密已删除的内容。"]])
    m = None
    import re as _re
    for m in _re.finditer(rb"startxref\s+(\d+)", base):
        pass
    old_xref = int(m.group(1))
    upd = bytearray(base)
    new_xref = len(upd)
    # free object 6 (page 1's content stream) in the update section
    upd += (
        b"xref\n6 1\n0000000000 00001 f \n"
        b"trailer\n<< /Size 7 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (old_xref, new_xref)
    )
    doc = PdfDocument(bytes(upd))
    assert doc.xref_loaded is True
    assert 6 in doc._free and 6 not in doc.objects
    assert extract_pdf_text(bytes(upd)).strip() == ""
    assert "秘密" in extract_pdf_text(base)


def test_hybrid_xrefstm_takes_precedence_over_prev():
    """Hybrid-reference files: /XRefStm's (newer) entries must register
    before the /Prev chain's older ones (PDF 1.7 §7.5.8.4)."""
    import zlib as _zlib

    from openccnet_spark.sources.pdf import PdfDocument, extract_pdf_text
    from openccnet_spark.sources.pdf_synth import _cid_hex, build_pdf

    base = build_pdf([["旧版本文字。"]])
    import re as _re
    for m in _re.finditer(rb"startxref\s+(\d+)", base):
        pass
    old_xref = int(m.group(1))
    upd = bytearray(base)
    # new content object 6 (replaces the old one)
    new6_off = len(upd)
    content = b"BT /F1 12 Tf 72 720 Td " + _cid_hex("新版本文字。") + b" Tj ET"
    flate = _zlib.compress(content)
    upd += (
        b"6 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(flate)
        + flate + b"\nendstream\nendobj\n"
    )
    # xref STREAM holding the newer entry for object 6 (W=[1 4 2], raw)
    stm_off = len(upd)
    entry = bytes([1]) + new6_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    upd += (
        b"100 0 obj\n<< /Type /XRef /Size 101 /Index [6 1] /W [1 4 2]"
        b" /Root 1 0 R /Length %d >>\nstream\n" % len(entry)
        + entry + b"\nendstream\nendobj\n"
    )
    # hybrid classic table: no entries of its own; XRefStm + Prev
    new_xref = len(upd)
    upd += (
        b"xref\n0 0\ntrailer\n<< /Size 101 /Root 1 0 R /Prev %d /XRefStm %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (old_xref, stm_off, new_xref)
    )
    doc = PdfDocument(bytes(upd))
    assert doc.xref_loaded is True
    text = extract_pdf_text(bytes(upd))
    assert "新版本文字" in text and "旧版本" not in text


def test_v4_stmf_identity_streams_are_plaintext():
    """V4 encryption with /StmF Identity leaves streams unencrypted (a
    legal configuration): extraction must work, not be marked
    unsupported."""
    from openccnet_spark.sources.pdf import PdfDocument, extract_pdf_text
    from openccnet_spark.sources.pdf_synth import _build_objects, _obj

    pages = [["正常可读的内容。"]]
    objects = _build_objects(pages, cjk=True, compress=True)
    enc_num = max(objects) + 1
    objects[enc_num] = _obj(
        enc_num,
        b"<< /Filter /Standard /V 4 /R 4 /Length 128"
        b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
        b" /StmF /Identity /StrF /StdCF"
        b" /O <" + b"11" * 32 + b"> /U <" + b"22" * 32 + b"> /P -44 >>",
    )
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += objects[num]
    xref_pos = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (enc_num + 1)
    for num in range(1, enc_num + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Encrypt %d 0 R"
        b" /ID [<aa11> <aa11>] >>\nstartxref\n%d\n%%%%EOF\n"
        % (enc_num + 1, enc_num, xref_pos)
    )
    doc = PdfDocument(bytes(out))
    assert doc.encryption_unsupported is False and doc._file_key is None
    assert "正常可读的内容" in extract_pdf_text(bytes(out))


def test_positional_whitespace_heuristics():
    """Same-baseline Td jumps and large negative TJ adjustments must
    surface as separating spaces (the positional-whitespace behavior of
    the reference's ContentOrderTextExtractor), while small kerning
    tweaks must not."""
    import zlib as _zlib

    from openccnet_spark.sources.pdf import extract_pdf_text
    from openccnet_spark.sources.pdf_synth import _build_objects, _obj

    content = (
        b"BT /F1 12 Tf 72 720 Td (left) Tj 200 0 Td (right) Tj "
        b"0 -14 Td [(ker) -50 (ned)] TJ "
        b"0 -14 Td [(word) -400 (gap)] TJ ET"
    )
    objects = _build_objects([[""]], cjk=False, compress=False)
    flate = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    objects[6] = b"6 0 obj\n" + flate + b"\nendobj\n"
    out = bytearray(b"%PDF-1.7\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += objects[num]
    xref_pos = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (max(objects) + 1)
    for num in range(1, max(objects) + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max(objects) + 1, xref_pos)
    )
    text = extract_pdf_text(bytes(out))
    assert "left right" in text      # Td forward jump -> space
    assert "kerned" in text          # -50 kerning -> NO space
    assert "word gap" in text        # -400 adjustment -> space


def test_hybrid_classic_f_entries_do_not_tombstone_xrefstm_objects():
    """The standard Acrobat hybrid shape marks its hidden objects 'f' in
    the classic table while the /XRefStm holds their real entries — those
    objects must load, not be tombstoned (code-review finding, round 4)."""
    import re as _re
    import zlib as _zlib

    from openccnet_spark.sources.pdf import PdfDocument, extract_pdf_text
    from openccnet_spark.sources.pdf_synth import _cid_hex, build_pdf

    base = build_pdf([["旧版本文字。"]])
    for m in _re.finditer(rb"startxref\s+(\d+)", base):
        pass
    old_xref = int(m.group(1))
    upd = bytearray(base)
    new6_off = len(upd)
    content = b"BT /F1 12 Tf 72 720 Td " + _cid_hex("新版本文字。") + b" Tj ET"
    flate = _zlib.compress(content)
    upd += (
        b"6 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(flate)
        + flate + b"\nendstream\nendobj\n"
    )
    stm_off = len(upd)
    entry = bytes([1]) + new6_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    upd += (
        b"100 0 obj\n<< /Type /XRef /Size 101 /Index [6 1] /W [1 4 2]"
        b" /Root 1 0 R /Length %d >>\nstream\n" % len(entry)
        + entry + b"\nendstream\nendobj\n"
    )
    new_xref = len(upd)
    # the CLASSIC table marks 6 free (hidden-object convention); the
    # XRefStm of the SAME section holds 6's real entry
    upd += (
        b"xref\n6 1\n0000000000 00001 f \n"
        b"trailer\n<< /Size 101 /Root 1 0 R /Prev %d /XRefStm %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (old_xref, stm_off, new_xref)
    )
    doc = PdfDocument(bytes(upd))
    assert 6 in doc.objects and 6 not in doc._free
    text = extract_pdf_text(bytes(upd))
    assert "新版本文字" in text and "旧版本" not in text


def test_freed_object_not_resurrected_from_objstm():
    """The tombstone invariant must hold for compressed objects: a number
    freed by a newer section must not come back out of an older section's
    /ObjStm (code-review finding, round 4)."""
    from openccnet_spark.sources.pdf import PdfDocument

    inner = b"<< /Marker true >>"
    stm_payload = b"20 0\n" + inner
    first = 5
    objects = {
        1: b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        2: b"2 0 obj\n<< /Type /Pages /Count 0 /Kids [] >>\nendobj\n",
        10: (
            b"10 0 obj\n<< /Type /ObjStm /N 1 /First %d /Length %d >>\nstream\n"
            % (first, len(stm_payload))
            + stm_payload + b"\nendstream\nendobj\n"
        ),
    }
    out = bytearray(b"%PDF-1.7\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += objects[num]
    xref_pos = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    for num in (1, 2):
        out += b"%d 1\n%010d 00000 n \n" % (num, offsets[num])
    out += b"10 1\n%010d 00000 n \n" % offsets[10]
    out += (
        b"trailer\n<< /Size 21 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    )
    base = bytes(out)
    doc = PdfDocument(base)
    assert 20 in doc.objects  # expanded from the ObjStm
    # incremental update frees 20
    upd = bytearray(base)
    new_xref = len(upd)
    upd += (
        b"xref\n20 1\n0000000000 00001 f \n"
        b"trailer\n<< /Size 21 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (xref_pos, new_xref)
    )
    doc2 = PdfDocument(bytes(upd))
    assert 20 in doc2._free and 20 not in doc2.objects


def test_midword_td_positioning_gets_no_space():
    """Per-run absolute positioning of contiguous text (tx equals the
    previous run's advance) must NOT inject a space — only clear gaps do
    (code-review finding, round 4)."""
    from openccnet_spark.sources.pdf import extract_pdf_text
    from openccnet_spark.sources.pdf_synth import _build_objects

    content = (
        b"BT /F1 12 Tf 72 720 Td (bo) Tj 12 0 Td (ld) Tj "
        b"40 0 Td (gap) Tj ET"
    )
    objects = _build_objects([[""]], cjk=False, compress=False)
    objects[6] = (
        b"6 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream\nendobj\n"
    )
    out = bytearray(b"%PDF-1.7\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += objects[num]
    xref_pos = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (max(objects) + 1)
    for num in range(1, max(objects) + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max(objects) + 1, xref_pos)
    )
    text = extract_pdf_text(bytes(out))
    # "bo" (2 ASCII @ 6 units = 12) + Td 12 -> contiguous; Td 40 - 12 -> gap
    assert "bold gap" in text


@_pytest.mark.parametrize("method", ["rc4", "aesv2"])
def test_legacy_password_latin1_encoding(method):
    """R2-R4 standard-handler passwords are PDFDocEncoding (~Latin-1):
    a str password with non-ASCII must open a file encrypted with its
    Latin-1 bytes (code-review finding, round 4)."""
    from openccnet_spark.sources.pdf import extract_pdf_text
    from openccnet_spark.sources.pdf_synth import build_pdf, build_pdf_encrypted

    pages = [["内容文字。"]]
    plain = extract_pdf_text(build_pdf(pages))
    locked = build_pdf_encrypted(
        pages, user_pw="café".encode("latin-1"), method=method
    )
    assert extract_pdf_text(locked, password="café") == plain


def test_two_column_reading_order():
    """A two-column page whose content stream interleaves the columns row
    by row: content order (the reference-parity default) interleaves;
    column_layout=True recovers column-by-column reading order."""
    from openccnet_spark.sources.pdf_synth import build_pdf_two_column

    left = ["左欄第一行内容", "左欄第二行内容", "左欄第三行内容"]
    right = ["右欄第一行内容", "右欄第二行内容", "右欄第三行内容"]
    data = build_pdf_two_column([left, right])
    # default stays content order (reference ContentOrderTextExtractor
    # parity): each emitted line interleaves the two columns' same-row text
    content_order = extract_pdf_text(data).strip().splitlines()
    assert content_order[0] == left[0] + right[0]
    # column mode: all of column 1 before any of column 2
    cols = extract_pdf_text(data, column_layout=True).strip().splitlines()
    assert cols == left + right, cols


def test_two_column_latin_with_gaps_and_single_column_fallback():
    from openccnet_spark.sources.pdf_synth import build_pdf, build_pdf_two_column

    left = ["alpha one", "alpha two"]
    right = ["beta one", "beta two"]
    data = build_pdf_two_column([left, right], cjk=False)
    cols = extract_pdf_text(data, column_layout=True).strip().splitlines()
    assert cols == left + right, cols
    # a single-column page must be unchanged by column mode (gutter
    # detection finds one band -> content-order fallback)
    single = build_pdf([["只有一欄的頁面", "第二行文字"]])
    assert extract_pdf_text(single, column_layout=True) == extract_pdf_text(single)


def test_two_column_with_spanning_title():
    """A full-width title bridges the gutter; the one-level XY-cut must
    segment it into its own row block so the columns below still separate
    — title first, then column 1, then column 2."""
    from openccnet_spark.sources.pdf_synth import build_pdf_two_column

    title = ["這是一個橫跨兩欄的非常長的文件標題共十八字"]  # > 0.6 page width
    left = ["左欄第一行内容", "左欄第二行内容"]
    right = ["右欄第一行内容", "右欄第二行内容"]
    data = build_pdf_two_column([left, right], title_lines=title)
    cols = extract_pdf_text(data, column_layout=True).strip().splitlines()
    assert cols == title + left + right, cols


def test_nested_layout_caption_between_column_blocks():
    """Recursive XY-cut, vertical-band case: a NARROW centered figure
    caption (no spanner — it bridges no gutter and is under 60% of page
    width) sits between two two-column blocks, separated by clear
    vertical whitespace. The y-cut must isolate the three bands so each
    column block reads column-by-column: title, block-A left, block-A
    right, caption, block-B left, block-B right."""
    from openccnet_spark.sources.pdf_synth import build_pdf_positioned

    title = "這是一個橫跨整頁寬度的非常長的總標題共二十個字"  # 20 chars: spanner
    a_left = ["甲欄第一行", "甲欄第二行", "甲欄第三行"]
    a_right = ["乙欄第一行", "乙欄第二行", "乙欄第三行"]
    caption = "圖一說明"  # 4 chars at x=220: inside the gutter, not a spanner
    b_left = ["丙欄第一行", "丙欄第二行", "丙欄第三行"]
    b_right = ["丁欄第一行", "丁欄第二行", "丁欄第三行"]
    items = [(72, 760.0, title)]
    # content stream interleaves the columns row by row (worst case)
    for i in range(3):
        items.append((72, 720.0 - 14 * i, a_left[i]))
        items.append((330, 720.0 - 14 * i, a_right[i]))
    items.append((220, 650.0, caption))  # 42 pt above/below: y-band breaks
    for i in range(3):
        items.append((72, 608.0 - 14 * i, b_left[i]))
        items.append((330, 608.0 - 14 * i, b_right[i]))
    data = build_pdf_positioned(items)
    got = extract_pdf_text(data, column_layout=True).strip().splitlines()
    assert got == [title] + a_left + a_right + [caption] + b_left + b_right, got


def test_nested_layout_subcolumns_inside_a_column():
    """Recursive XY-cut, x-recursion case: the left top-level column holds
    its own column-local header (a spanner only relative to the COLUMN's
    width) above two sub-columns. Reading order: left header, sub-column
    1, sub-column 2, then the right top-level column."""
    from openccnet_spark.sources.pdf_synth import build_pdf_positioned

    header = "左欄標題佔滿整欄寬度哦"  # 11 chars = full left-column width
    sub1 = ["子甲", "子乙"]
    sub2 = ["丑甲", "丑乙"]
    right = ["右邊第一行", "右邊第二行", "右邊第三行"]
    items = [(72, 720.0, header)]
    for i in range(2):
        items.append((72, 706.0 - 14 * i, sub1[i]))
        items.append((140, 706.0 - 14 * i, sub2[i]))
    for i in range(3):
        items.append((330, 720.0 - 14 * i, right[i]))
    data = build_pdf_positioned(items)
    got = extract_pdf_text(data, column_layout=True).strip().splitlines()
    assert got == [header] + sub1 + sub2 + right, got


def test_strip_repeated_headers_footers():
    """Running header (digit-masked: 'Chapter 1' page numbers vary) and
    footer ('Page N of M') repeat at the same y across pages -> dropped;
    body lines survive in order; a page-unique line at the header y
    survives."""
    from openccnet_spark.sources.pdf_synth import build_pdf_positioned_pages

    pages = []
    for p in range(4):
        items = [
            (72, 760, f"Chapter {p + 1}"),          # header, digits vary
            (72, 720, f"body {'wxyz'[p]} line one"),
            (72, 706, f"body {'wxyz'[p]} line two"),
            (72, 40, f"Page {p + 1} of 4"),          # footer
        ]
        pages.append(items)
    pages[2].append((300, 744, "unique marginal note"))  # one page only
    data = build_pdf_positioned_pages(pages)
    plain = extract_pdf_text(data)
    assert "Chapter 2" in plain and "Page 3 of 4" in plain
    got = extract_pdf_text(data, strip_repeated=True)
    assert "Chapter" not in got and "Page" not in got
    assert "unique marginal note" in got
    for p in range(4):
        assert f"body {'wxyz'[p]} line one\nbody {'wxyz'[p]} line two" in got


def test_strip_repeated_noop_without_repeats_and_on_single_page():
    """No repeated lines (or a single page) -> byte-identical to the flag
    being off, so default content-order parity is preserved."""
    from openccnet_spark.sources.pdf_synth import build_pdf, build_pdf_positioned_pages

    single = build_pdf([["只有 一頁", "第二 行"]])
    assert extract_pdf_text(single, strip_repeated=True) == extract_pdf_text(single)
    # LETTERS differ across pages (digit masking must not unify these)
    names = ["alpha", "bravo"]
    data = build_pdf_positioned_pages(
        [
            [(72, 720 - 14 * i, f"{names[p]} line {'abc'[i]}") for i in range(3)]
            for p in range(2)
        ]
    )
    assert extract_pdf_text(data, strip_repeated=True) == extract_pdf_text(data)


def test_strip_repeated_same_text_different_y_not_dropped():
    """The same sentence at DIFFERENT y positions is body text, not a
    running line — the y component of the key must keep it."""
    from openccnet_spark.sources.pdf_synth import build_pdf_positioned_pages

    pages = [
        [(72, 700 - 30 * p, "repeated sentence"), (72, 400, f"filler {p}")]
        for p in range(4)
    ]
    got = extract_pdf_text(build_pdf_positioned_pages(pages), strip_repeated=True)
    assert got.count("repeated sentence") == 4


def test_strip_repeated_composes_with_column_layout():
    """Header suppression + column reordering on the same pages: the
    repeated header vanishes and the columns still read in order."""
    from openccnet_spark.sources.pdf_synth import build_pdf_positioned_pages

    def page(p):
        items = [(72, 760, "Running Head")]
        for i in range(3):  # interleaved emission, two columns
            items.append((72, 700 - 14 * i, f"L{'pq'[p]}{'abc'[i]}x L{'pq'[p]}{'abc'[i]}y"))
            items.append((330, 700 - 14 * i, f"R{'pq'[p]}{'abc'[i]}x R{'pq'[p]}{'abc'[i]}y"))
        return items

    data = build_pdf_positioned_pages([page(0), page(1)])
    got = extract_pdf_text(data, column_layout=True, strip_repeated=True)
    assert "Running Head" not in got
    p0 = got.splitlines()
    li = [l for l in p0 if l.startswith("Lp")]
    ri = [l for l in p0 if l.startswith("Rp")]
    assert li == ["Lpax Lpay", "Lpbx Lpby", "Lpcx Lpcy"]
    assert p0.index(li[-1]) < p0.index(ri[0])  # left column before right
