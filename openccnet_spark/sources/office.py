"""Office/EPUB container conversion (SURVEY §2.3 / reference §3.3).

The reference's ``OfficeDocConverter`` (OfficeDocConverter.cs:950-1105)
unzips the container, converts the text-bearing XML parts, and re-zips
(EPUB: ``mimetype`` first, STORED). Semantics reproduced here:

* Target parts per format (``GetTargetXmlPaths``,
  OfficeDocConverter.cs:1188-1320): docx ``word/document.xml``; xlsx
  ``xl/sharedStrings.xml`` plus every ``xl/worksheets/**/*.xml`` (for
  inline-string cells); pptx every ``ppt/**/*.xml`` that is a slide,
  notesSlide, slideLayout, slideMaster, or comment part; ODF
  ``content.xml``; EPUB all XHTML/HTML/OPF/NCX files.
* xlsx scoping (``ConvertXlsxXmlPart``, OfficeDocConverter.cs:1251-1286):
  sharedStrings is converted whole; worksheet parts convert ONLY the
  ``<t>`` text nodes inside ``t="inlineStr"`` cells (regexes at
  OfficeDocConverter.cs:147-153) so formulas/refs are untouched.
* Font masking (``keep_font``, OfficeDocConverter.cs:996-1050): font-name
  attributes are CJK text too (``val="宋体"``) — converting them breaks the
  style reference. With ``keep_font=True`` they are swapped for
  ``__F_O_N_T_n__`` markers before conversion and restored after, using the
  reference's per-format attribute regexes. For xlsx, masking applies only
  to sharedStrings.xml (``ShouldMaskFonts``, OfficeDocConverter.cs:1242-1249).

Spark integration: one ``binaryFile`` scan -> ``mapInPandas`` -> binary
output column. Containers never shuffle; a 100 TB corpus of documents
parallelizes by file across tasks.
"""

from __future__ import annotations

import io
import re
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..convert import Converter, default_converter

SUPPORTED_FORMATS = ("docx", "xlsx", "pptx", "odt", "ods", "odp", "epub")

#: reference XlsxInlineStringCellRegex / XlsxTextNodeRegex
#: (OfficeDocConverter.cs:147-153)
_XLSX_INLINE_CELL = re.compile(
    r"<c\b(?=[^>]*\bt=(?:\"inlineStr\"|'inlineStr'))[^>]*>.*?</c>", re.DOTALL
)
_XLSX_TEXT_NODE = re.compile(r"(<t\b[^>]*>)(.*?)(</t>)", re.DOTALL)

#: per-format font-attribute patterns (OfficeDocConverter.cs:1003-1027)
_FONT_PATTERNS = {
    "docx": r'(w:eastAsia="|w:ascii="|w:hAnsi="|w:cs=")(.*?)(")',
    "xlsx": r'(val=")(.*?)(")',
    "pptx": r'(typeface=")(.*?)(")',
    "odt": r'((?:style:font-name(?:-asian|-complex)?|svg:font-family|style:name)=["\'])([^"\']+)(["\'])',
    "epub": r'(font-family\s*:\s*)([^;"\']+)([;"\'])?',
}
_FONT_PATTERNS["ods"] = _FONT_PATTERNS["odp"] = _FONT_PATTERNS["odt"]


def _is_target_part(fmt: str, name: str) -> bool:
    """Reference GetTargetXmlPaths (OfficeDocConverter.cs:1188-1320)."""
    n = name.lower()
    if fmt == "docx":
        return name == "word/document.xml"
    if fmt == "xlsx":
        return name == "xl/sharedStrings.xml" or (
            n.startswith("xl/worksheets/") and n.endswith(".xml")
        )
    if fmt == "pptx":
        if not (n.startswith("ppt/") and n.endswith(".xml")):
            return False
        base = n.rsplit("/", 1)[-1]
        return (
            base.startswith("slide")
            or "notesslide" in n
            or "slidemaster" in n
            or "slidelayout" in n
            or "comment" in n
        )
    if fmt in ("odt", "ods", "odp"):
        return name == "content.xml"
    if fmt == "epub":
        return n.endswith((".xhtml", ".html", ".htm", ".opf", ".ncx"))
    raise ValueError(f"unsupported container format: {fmt}")


def _should_mask_fonts(fmt: str, name: str) -> bool:
    """Reference ShouldMaskFonts (OfficeDocConverter.cs:1242-1249): xlsx
    masks only in sharedStrings (worksheet conversion is already scoped to
    inline-string text nodes); every other format masks in all parts."""
    if fmt != "xlsx":
        return True
    return name.lower() == "xl/sharedstrings.xml"


def _mask_fonts(fmt: str, text: str) -> tuple[str, dict[str, str]]:
    """Swap font-name attribute values for ``__F_O_N_T_n__`` markers
    (OfficeDocConverter.cs:1029-1046). Returns (masked_text, marker_map)."""
    pattern = _FONT_PATTERNS.get(fmt)
    if pattern is None:  # pragma: no cover - all formats have a pattern
        return text, {}
    font_map: dict[str, str] = {}
    counter = 0

    def _sub(m: re.Match) -> str:
        nonlocal counter
        marker = f"__F_O_N_T_{counter}__"
        counter += 1
        font_map[marker] = m.group(2)
        # group 3 is optional in the epub pattern; non-participating -> ""
        return m.group(1) + marker + (m.group(3) or "")

    return re.sub(pattern, _sub, text), font_map


def _convert_xlsx_part(
    text: str, name: str, convert  # convert: str -> str
) -> str:
    """Reference ConvertXlsxXmlPart (OfficeDocConverter.cs:1251-1286)."""
    low = name.lower()
    if low == "xl/sharedstrings.xml":
        return convert(text)
    if low.startswith("xl/worksheets/") and low.endswith(".xml"):

        def _cell(cell_m: re.Match) -> str:
            def _t(t_m: re.Match) -> str:
                inner = t_m.group(2)
                if not inner:
                    return t_m.group(0)
                return t_m.group(1) + convert(inner) + t_m.group(3)

            return _XLSX_TEXT_NODE.sub(_t, cell_m.group(0))

        return _XLSX_INLINE_CELL.sub(_cell, text)
    return text  # pragma: no cover - only targets reach here


def convert_office_bytes(
    data: bytes,
    fmt: str,
    config: str = "s2t",
    punct: bool = False,
    converter: Converter | None = None,
    keep_font: bool = False,
) -> bytes:
    """Convert the text-bearing XML parts of one container; returns new zip.

    EPUB keeps ``mimetype`` as the first, STORED entry per spec.
    ``keep_font=True`` preserves font-name declarations via temporary
    markers (reference ``keepFont``, OfficeDocConverter.cs:996-1050).
    """
    cc = converter or default_converter()
    convert = lambda s: cc.convert(s, config, punct)  # noqa: E731
    src = zipfile.ZipFile(io.BytesIO(data))
    out_buf = io.BytesIO()
    with zipfile.ZipFile(out_buf, "w", zipfile.ZIP_DEFLATED) as dst:
        names = src.namelist()
        ordered = sorted(names, key=lambda n: (n != "mimetype",)) if fmt == "epub" else names
        for name in ordered:
            blob = src.read(name)
            if _is_target_part(fmt, name):
                text = blob.decode("utf-8")
                font_map: dict[str, str] = {}
                if keep_font and _should_mask_fonts(fmt, name):
                    text, font_map = _mask_fonts(fmt, text)
                if fmt == "xlsx":
                    text = _convert_xlsx_part(text, name, convert)
                else:
                    text = convert(text)
                for marker, original in font_map.items():
                    text = text.replace(marker, original)
                blob = text.encode("utf-8")
            if fmt == "epub" and name == "mimetype":
                info = zipfile.ZipInfo("mimetype")
                info.compress_type = zipfile.ZIP_STORED
                dst.writestr(info, blob)
            else:
                dst.writestr(name, blob)
    return out_buf.getvalue()


def convert_office_files(
    spark: SparkSession,
    path_glob: str,
    fmt: str,
    config: str = "s2t",
    punct: bool = False,
    keep_font: bool = False,
) -> DataFrame:
    """binaryFile scan -> per-file conversion -> (path, content) frame."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported container format: {fmt}")
    binary = spark.read.format("binaryFile").load(path_glob)

    def _convert(batches):
        for pdf in batches:
            out = [
                convert_office_bytes(bytes(c), fmt, config, punct, keep_font=keep_font)
                for c in pdf["content"]
            ]
            yield pd.DataFrame({"path": pdf["path"], "content": out})

    return binary.select("path", "content").mapInPandas(
        _convert, "path string, content binary"
    )
