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
    assert not _is_target_part("xlsx", "xl/workbook.xml")
    assert _is_target_part("pptx", "ppt/slides/slide1.xml")
    assert _is_target_part("pptx", "ppt/notesSlides/notesSlide1.xml")
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
