"""Office/EPUB container conversion (SURVEY §2.3 / reference §3.3) — minimal.

The reference's ``OfficeDocConverter`` (OfficeDocConverter.cs:955-1100)
unzips the container, runs the conversion over the text-bearing XML parts,
and re-zips (EPUB: ``mimetype`` first, stored). This is that core, without
the reference's font-masking regexes (``:996-1050``) — conversion only
rewrites CJK code points and (optionally) CJK punctuation, neither of which
appears in XML markup, so converting the whole part text is safe.

Spark integration: one ``binaryFile`` scan -> ``mapInPandas`` -> binary
output column. Containers never shuffle; a 100 TB corpus of documents
parallelizes by file across tasks.
"""

from __future__ import annotations

import io
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..convert import Converter, default_converter

#: extension -> predicate over part names (reference GetTargetXmlPaths,
#: OfficeDocConverter.cs:1188-1320)
def _is_target_part(fmt: str, name: str) -> bool:
    n = name.lower()
    if fmt == "docx":
        return name == "word/document.xml"
    if fmt == "xlsx":
        return name == "xl/sharedStrings.xml"
    if fmt == "pptx":
        return (
            name.startswith(("ppt/slides/", "ppt/notesSlides/"))
            and n.endswith(".xml")
        )
    if fmt in ("odt", "ods", "odp"):
        return name == "content.xml"
    if fmt == "epub":
        return n.endswith((".xhtml", ".html", ".htm", ".opf", ".ncx"))
    raise ValueError(f"unsupported container format: {fmt}")


SUPPORTED_FORMATS = ("docx", "xlsx", "pptx", "odt", "ods", "odp", "epub")


def convert_office_bytes(
    data: bytes,
    fmt: str,
    config: str = "s2t",
    punct: bool = False,
    converter: Converter | None = None,
) -> bytes:
    """Convert the text-bearing XML parts of one container; returns new zip.

    EPUB keeps ``mimetype`` as the first, STORED entry per spec.
    """
    cc = converter or default_converter()
    src = zipfile.ZipFile(io.BytesIO(data))
    out_buf = io.BytesIO()
    with zipfile.ZipFile(out_buf, "w", zipfile.ZIP_DEFLATED) as dst:
        names = src.namelist()
        ordered = sorted(names, key=lambda n: (n != "mimetype",)) if fmt == "epub" else names
        for name in ordered:
            blob = src.read(name)
            if _is_target_part(fmt, name):
                blob = cc.convert(blob.decode("utf-8"), config, punct).encode("utf-8")
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
) -> DataFrame:
    """binaryFile scan -> per-file conversion -> (path, content) frame."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported container format: {fmt}")
    binary = spark.read.format("binaryFile").load(path_glob)

    def _convert(batches):
        for pdf in batches:
            out = [
                convert_office_bytes(bytes(c), fmt, config, punct)
                for c in pdf["content"]
            ]
            yield pd.DataFrame({"path": pdf["path"], "content": out})

    return binary.select("path", "content").mapInPandas(
        _convert, "path string, content binary"
    )
