"""Office/EPUB container conversion round-trip (reference
OfficeDocConverterTests: converts a bundled docx fixture — here the fixture
is synthesized)."""

from __future__ import annotations

import io
import zipfile

from openccnet_spark.sources.office import convert_office_bytes, convert_office_files

_DOC_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
    "<w:body><w:p><w:r><w:t>简体中文的软件文档</w:t></w:r></w:p></w:body></w:document>"
)


def _make_docx() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", _DOC_XML)
        z.writestr("word/media/img.bin", b"\x00\x01binary stays untouched")
    return buf.getvalue()


def _make_epub() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        info = zipfile.ZipInfo("mimetype")
        info.compress_type = zipfile.ZIP_STORED
        z.writestr(info, "application/epub+zip")
        z.writestr("OEBPS/ch1.xhtml", "<html><body>简体章节内容</body></html>")
    return buf.getvalue()


def test_docx_roundtrip():
    out = convert_office_bytes(_make_docx(), "docx", "s2t")
    z = zipfile.ZipFile(io.BytesIO(out))
    doc = z.read("word/document.xml").decode("utf-8")
    assert "簡體中文的軟件文檔" in doc
    assert "<w:document" in doc  # markup intact
    assert z.read("word/media/img.bin") == b"\x00\x01binary stays untouched"


def test_epub_mimetype_first_and_stored():
    out = convert_office_bytes(_make_epub(), "epub", "s2t")
    z = zipfile.ZipFile(io.BytesIO(out))
    infos = z.infolist()
    assert infos[0].filename == "mimetype"
    assert infos[0].compress_type == zipfile.ZIP_STORED
    assert "簡體章節內容" in z.read("OEBPS/ch1.xhtml").decode("utf-8")


def test_spark_office_conversion(spark, tmp_path):
    (tmp_path / "a.docx").write_bytes(_make_docx())
    (tmp_path / "b.docx").write_bytes(_make_docx())
    out = convert_office_files(spark, str(tmp_path / "*.docx"), "docx", "s2t").collect()
    assert len(out) == 2
    for r in out:
        z = zipfile.ZipFile(io.BytesIO(bytes(r.content)))
        assert "簡體中文的軟件文檔" in z.read("word/document.xml").decode("utf-8")


def test_target_part_selection_per_format():
    from openccnet_spark.sources.office import _is_target_part

    assert _is_target_part("docx", "word/document.xml")
    assert not _is_target_part("docx", "word/styles.xml")
    assert _is_target_part("xlsx", "xl/sharedStrings.xml")
    # worksheets are targets now (inline-string cells live there)
    assert _is_target_part("xlsx", "xl/worksheets/sheet1.xml")
    assert not _is_target_part("xlsx", "xl/workbook.xml")
    assert _is_target_part("pptx", "ppt/slides/slide1.xml")
    assert _is_target_part("pptx", "ppt/notesSlides/notesSlide1.xml")
    # layouts, masters and comments (OfficeDocConverter.cs:1302-1320)
    assert _is_target_part("pptx", "ppt/slideLayouts/slideLayout3.xml")
    assert _is_target_part("pptx", "ppt/slideMasters/slideMaster1.xml")
    assert _is_target_part("pptx", "ppt/comments/comment1.xml")
    assert not _is_target_part("pptx", "ppt/theme/theme1.xml")
    for odf in ("odt", "ods", "odp"):
        assert _is_target_part(odf, "content.xml")
        assert not _is_target_part(odf, "styles.xml")
    assert _is_target_part("epub", "OEBPS/content.opf")
    assert not _is_target_part("epub", "OEBPS/cover.jpg")


def test_xlsx_shared_strings():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/sharedStrings.xml", "<sst><si><t>简体表格内容</t></si></sst>")
        z.writestr("xl/workbook.xml", "<workbook>简体不该被转换</workbook>")
    out = convert_office_bytes(buf.getvalue(), "xlsx", "s2t")
    z = zipfile.ZipFile(io.BytesIO(out))
    assert "簡體表格內容" in z.read("xl/sharedStrings.xml").decode("utf-8")
    # non-target parts untouched
    assert "简体不该被转换" in z.read("xl/workbook.xml").decode("utf-8")


_SHEET_XML = (
    '<worksheet><sheetData>'
    '<row r="1">'
    '<c r="A1" t="inlineStr"><is><t>简体行内字符串</t></is></c>'
    '<c r="B1" t="s"><v>0</v></c>'
    '<c r="C1"><f>简体("x")</f><v>42</v></c>'
    "</row></sheetData></worksheet>"
)


def test_xlsx_inline_string_cells():
    """Worksheet parts convert ONLY <t> nodes inside t="inlineStr" cells
    (reference OfficeDocConverter.cs:147-153,1264-1283)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", _SHEET_XML)
    out = convert_office_bytes(buf.getvalue(), "xlsx", "s2t")
    sheet = zipfile.ZipFile(io.BytesIO(out)).read("xl/worksheets/sheet1.xml").decode()
    assert "簡體行內字符串" in sheet  # inlineStr cell converted
    assert '简体("x")' in sheet  # formula text outside inlineStr untouched
    assert 't="inlineStr"' in sheet  # cell attributes intact


def test_pptx_layouts_and_masters_convert():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("ppt/slides/slide1.xml", "<p:sp><a:t>简体幻灯片</a:t></p:sp>")
        z.writestr("ppt/slideLayouts/slideLayout1.xml", "<p:sp><a:t>简体版式</a:t></p:sp>")
        z.writestr("ppt/slideMasters/slideMaster1.xml", "<p:sp><a:t>简体母版</a:t></p:sp>")
        z.writestr("ppt/theme/theme1.xml", "<a:theme>简体主题不转换</a:theme>")
    out = convert_office_bytes(buf.getvalue(), "pptx", "s2t")
    z = zipfile.ZipFile(io.BytesIO(out))
    assert "簡體幻燈片" in z.read("ppt/slides/slide1.xml").decode()
    assert "簡體版式" in z.read("ppt/slideLayouts/slideLayout1.xml").decode()
    assert "簡體母版" in z.read("ppt/slideMasters/slideMaster1.xml").decode()
    assert "简体主题不转换" in z.read("ppt/theme/theme1.xml").decode()


def test_keep_font_preserves_font_names():
    """keep_font masks font-name attributes so 宋体 stays 宋体 while body
    text converts (reference OfficeDocConverter.cs:996-1050)."""
    doc = (
        '<w:document><w:rPr><w:rFonts w:eastAsia="宋体" w:ascii="宋体"/></w:rPr>'
        "<w:t>简体正文内容</w:t></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    # without keep_font the font name is (wrongly, for styling) converted
    out_plain = convert_office_bytes(buf.getvalue(), "docx", "s2t")
    plain = zipfile.ZipFile(io.BytesIO(out_plain)).read("word/document.xml").decode()
    assert 'w:eastAsia="宋體"' in plain
    # with keep_font the font survives and body text still converts
    out_kept = convert_office_bytes(buf.getvalue(), "docx", "s2t", keep_font=True)
    kept = zipfile.ZipFile(io.BytesIO(out_kept)).read("word/document.xml").decode()
    assert 'w:eastAsia="宋体"' in kept
    assert 'w:ascii="宋体"' in kept
    assert "簡體正文內容" in kept
    assert "__F_O_N_T_" not in kept  # all markers restored


def test_keep_font_xlsx_shared_strings_only():
    """xlsx masks fonts only in sharedStrings (ShouldMaskFonts,
    OfficeDocConverter.cs:1242-1249); a styled sharedStrings keeps 宋体."""
    sst = '<sst><si><rPr><rFont val="宋体"/></rPr><t>简体文字</t></si></sst>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET_XML)
    out = convert_office_bytes(buf.getvalue(), "xlsx", "s2t", keep_font=True)
    z = zipfile.ZipFile(io.BytesIO(out))
    shared = z.read("xl/sharedStrings.xml").decode()
    assert 'val="宋体"' in shared  # font preserved
    assert "簡體文字" in shared  # text converted
    sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "簡體行內字符串" in sheet  # inlineStr conversion still applies


def test_keep_font_pptx_and_epub_patterns():
    ppt = '<a:latin typeface="宋体"/><a:t>简体文字</a:t>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("ppt/slides/slide1.xml", ppt)
    out = convert_office_bytes(buf.getvalue(), "pptx", "s2t", keep_font=True)
    slide = zipfile.ZipFile(io.BytesIO(out)).read("ppt/slides/slide1.xml").decode()
    assert 'typeface="宋体"' in slide and "簡體文字" in slide

    html = '<body style="font-family: 宋体;">简体章节</body>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        info = zipfile.ZipInfo("mimetype")
        info.compress_type = zipfile.ZIP_STORED
        z.writestr(info, "application/epub+zip")
        z.writestr("OEBPS/ch1.xhtml", html)
    out = convert_office_bytes(buf.getvalue(), "epub", "s2t", keep_font=True)
    page = zipfile.ZipFile(io.BytesIO(out)).read("OEBPS/ch1.xhtml").decode()
    assert "font-family: 宋体;" in page and "簡體章節" in page


import os
import pytest
import re

_REF_DOCX = "/root/reference/OpenccNetTests/滕王阁序.docx"


@pytest.mark.skipif(not os.path.exists(_REF_DOCX), reason="reference fixture absent")
def test_reference_real_docx_fixture_s2t_keepfont():
    """The reference's OWN OfficeDocConverterTests fixture (a real Word
    document) through our converter with the same arguments the reference
    test uses (s2t, keepFont=True, OfficeDocConverterTests.cs:26-55):
    output must be a valid docx whose body text converted and whose CJK
    font names survived."""
    data = open(_REF_DOCX, "rb").read()
    out = convert_office_bytes(data, "docx", "s2t", keep_font=True)
    zin = zipfile.ZipFile(io.BytesIO(data))
    zout = zipfile.ZipFile(io.BytesIO(out))
    assert zin.namelist() == zout.namelist()  # every part preserved, in order
    doc = zout.read("word/document.xml").decode("utf-8")
    assert doc.strip()
    # title and body converted (滕王阁序 -> 滕王閣序; 衡庐 -> 衡廬)
    assert "滕王閣序" in doc and "衡廬" in doc
    assert "滕王阁序" not in doc
    # CJK font names preserved by keep_font (楷体 must NOT become 楷體)
    fonts = set(re.findall(r'w:eastAsia="([^"]+)"', doc))
    assert "楷体" in fonts and "楷體" not in fonts
    assert "__F_O_N_T_" not in doc
