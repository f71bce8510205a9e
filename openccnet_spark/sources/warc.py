"""WARC (ISO 28500) source — the canonical web-corpus ingest format.

A 100 TB training-data pipeline starts from Common-Crawl-shaped WARC
files: each ~1 GB file is a stream of records, each record either plain
or (the CC layout) an independent gzip member, holding a full HTTP
response whose body is the page HTML. The reference engine
(laisuk/OpenccNet) reads plain text/office/PDF files
(`OpenccNet/Program.cs` conversion commands); WARC is the training-data
extension of the same source family.

Spark mapping (the 100 TB story):
- **File-granular parallelism.** WARC is not splittable mid-stream
  (gzip members carry no sync markers), so the unit of work is the file
  — exactly how production CC jobs shard: one task per WARC, thousands
  of WARCs per job. `read_warc` uses ``spark.read.format("binaryFile")``
  and parses inside ``mapInPandas``: file bytes never hit the driver.
- **Parse then project.** The parser emits one row per response record
  with the body as ``binary``; HTML→text extraction is a separate
  narrow projection so callers that only need headers never pay it.
- **Deterministic extraction.** `html_to_text` is a small, deterministic
  extractor (drop script/style/head, strip tags, unescape entities,
  collapse whitespace) — no external HTML library, so results are
  bit-stable across workers.

Strictness: `parse_warc` RAISES on malformed input (bad version line,
short payload, missing terminator). A corrupt record in a 100 TB run
must surface in metrics, not silently truncate a file; callers that
want skip-and-count wrap per-file (`read_warc(strict=False)` records
the error and keeps the file's earlier records).
"""

from __future__ import annotations

import gzip
import html as _html
from hashlib import md5 as _md5
import io
import re
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CRLF = b"\r\n"

#: schema of one parsed record row (shared by both readers)
RECORD_SCHEMA = (
    "warc_file string, rec_offset long, warc_type string, record_id string, "
    "target_uri string, warc_date string, http_status int, "
    "content_type string, body binary, parse_error string"
)


# ---------------------------------------------------------------- writing


def build_warc_record(
    uri: str,
    date: str,
    payload: bytes,
    rec_type: str = "response",
    record_id: str | None = None,
) -> bytes:
    """One WARC/1.0 record: header block, blank line, payload, 2x CRLF.

    The default record id derives from the md5-prefix hash family (the
    house cross-engine hash) — NOT Python ``hash()``, whose per-process
    salt would break the module's byte-determinism across workers/runs.
    """
    rid = record_id or (
        f"<urn:uuid:{int(_md5(uri.encode('utf-8')).hexdigest()[:8], 16):08x}>"
    )
    ctype = (
        "application/http; msgtype=response"
        if rec_type == "response"
        else "application/warc-fields"
    )
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + payload + CRLF + CRLF


def build_http_response(
    body: bytes, status: int = 200, content_type: str = "text/html; charset=utf-8"
) -> bytes:
    """Minimal HTTP/1.1 response envelope for a response record payload."""
    head = (
        f"HTTP/1.1 {status} {'OK' if status == 200 else 'ERR'}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + body


def build_warc(records: Iterable[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate records; ``gzip_members`` = one gzip member per record
    (the Common Crawl layout — members concatenate into a valid .gz)."""
    if not gzip_members:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        # mtime pinned for byte-determinism across workers/runs
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(rec)
    return out.getvalue()


# ---------------------------------------------------------------- parsing


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream, one member at a time."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(31)
        chunk = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        pos += consumed


def _parse_one(data: bytes, pos: int) -> tuple[dict, int]:
    """Parse the record starting at ``pos``; return (record, next_pos)."""
    head_end = data.find(CRLF + CRLF, pos)
    if head_end < 0:
        raise ValueError(f"no header terminator after offset {pos}")
    head = data[pos:head_end].decode("utf-8", "replace")
    lines = head.split("\r\n")
    if not lines[0].startswith("WARC/"):
        raise ValueError(f"bad WARC version line at offset {pos}: {lines[0]!r}")
    hdr: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        hdr[k.strip().lower()] = v.strip()
    try:
        clen = int(hdr["content-length"])
    except KeyError:
        raise ValueError(f"record at offset {pos} has no Content-Length")
    body_start = head_end + 4
    payload = data[body_start : body_start + clen]
    if len(payload) != clen:
        raise ValueError(f"record at offset {pos}: payload short of Content-Length")
    # Content-Length is exact — NEVER strip the payload (binary bodies end
    # in \r/\n legitimately; same lesson as sources/pdf.py streams)
    tail = data[body_start + clen : body_start + clen + 4]
    if tail != CRLF + CRLF:
        raise ValueError(f"record at offset {pos}: missing CRLFCRLF terminator")
    return (
        {
            "offset": pos,
            "warc_type": hdr.get("warc-type", ""),
            "record_id": hdr.get("warc-record-id", ""),
            "target_uri": hdr.get("warc-target-uri", ""),
            "warc_date": hdr.get("warc-date", ""),
            "payload": payload,
        },
        body_start + clen + 4,
    )


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC byte stream (plain or per-record gzip members)."""
    if data[:2] == b"\x1f\x8b":
        out = []
        off = 0
        for member in _gzip_members(data):
            rec, _ = _parse_one(member, 0)
            rec["offset"] = off  # member index stands in for byte offset
            out.append(rec)
            off += 1
        return out
    out = []
    pos = 0
    while pos < len(data):
        rec, pos = _parse_one(data, pos)
        out.append(rec)
    return out


_STATUS_RE = re.compile(rb"^HTTP/\d\.\d (\d{3})")


def split_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, content_type, body) of an HTTP response payload."""
    m = _STATUS_RE.match(payload)
    if not m:
        raise ValueError("response payload does not start with an HTTP status line")
    head_end = payload.find(CRLF + CRLF)
    if head_end < 0:
        raise ValueError("HTTP response without header terminator")
    ctype = ""
    for ln in payload[:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return int(m.group(1)), ctype, payload[head_end + 4 :]


# ------------------------------------------------------------ extraction

_DROP_RE = re.compile(
    r"<(script|style|head)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def html_to_text(html_bytes: bytes) -> str:
    """Deterministic HTML → text: drop script/style/head subtrees, strip
    tags, unescape entities, collapse runs of whitespace."""
    txt = html_bytes.decode("utf-8", "replace")
    txt = _DROP_RE.sub(" ", txt)
    txt = _TAG_RE.sub(" ", txt)
    txt = _html.unescape(txt)
    return _WS_RE.sub(" ", txt).strip()


# ------------------------------------------------------------- Spark side


def _records_from(
    name: str, data: bytes, strict: bool, extract_text: bool = False
) -> list[dict]:
    rows: list[dict] = []
    err: str | None = None
    try:
        recs = parse_warc(data)
    except ValueError as e:
        if strict:
            raise
        recs, err = [], str(e)
    for r in recs:
        status, ctype, body = None, "", None
        if r["warc_type"] == "response":
            try:
                status, ctype, body = split_http_response(r["payload"])
            except ValueError as e:
                if strict:
                    raise
                err = str(e)
        row = {
            "warc_file": name,
            "rec_offset": r["offset"],
            "warc_type": r["warc_type"],
            "record_id": r["record_id"],
            "target_uri": r["target_uri"],
            "warc_date": r["warc_date"],
            "http_status": status,
            "content_type": ctype,
            "parse_error": err,
        }
        if extract_text:
            # text INSTEAD of body: HTML never crosses the Arrow boundary
            row["text"] = html_to_text(body) if body is not None else None
        else:
            row["body"] = body
        rows.append(row)
    if not rows and err is not None:
        row = {
            "warc_file": name,
            "rec_offset": -1,
            "warc_type": "",
            "record_id": "",
            "target_uri": "",
            "warc_date": "",
            "http_status": None,
            "content_type": "",
            "parse_error": err,
        }
        row["text" if extract_text else "body"] = None
        rows.append(row)
    return rows


def _record_columns(extract_text: bool) -> list[str]:
    cols = [
        "warc_file", "rec_offset", "warc_type", "record_id",
        "target_uri", "warc_date", "http_status", "content_type",
        "text" if extract_text else "body", "parse_error",
    ]
    return cols


def _record_schema(extract_text: bool) -> str:
    return RECORD_SCHEMA.replace("body binary", "text string") if extract_text \
        else RECORD_SCHEMA


def read_warc(
    spark: SparkSession, path: str, strict: bool = True,
    extract_text: bool = False,
) -> DataFrame:
    """Distributed WARC reader: one task per file (binaryFile source),
    records parsed worker-side. File bytes never reach the driver.
    ``extract_text=True`` runs `html_to_text` in the SAME Python stage
    (one ArrowEvalPython, no HTML across the Arrow boundary)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for name, data in zip(pdf["path"], pdf["content"]):
                rows.extend(_records_from(str(name), bytes(data), strict, extract_text))
            yield pd.DataFrame(rows, columns=_record_columns(extract_text))

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_parse, _record_schema(extract_text))


def records_from_blobs(
    df: DataFrame, blob_col: str = "blob", name_col: str = "blob_name",
    strict: bool = True, extract_text: bool = False,
) -> DataFrame:
    """Same parser over in-frame WARC blobs (a binary column) — used by
    the driver query, which synthesizes its corpus distributedly."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for name, data in zip(pdf[name_col], pdf[blob_col]):
                rows.extend(_records_from(str(name), bytes(data), strict, extract_text))
            yield pd.DataFrame(rows, columns=_record_columns(extract_text))

    return df.select(name_col, blob_col).mapInPandas(_parse, _record_schema(extract_text))


# -------------------------------------------------------------- synthesis


def synth_doc_record(doc_id: int, lang: str, text: str) -> bytes:
    """Deterministic WARC response record for one document row: URI, date
    and HTML body are closed-form functions of (doc_id, lang, text), so a
    SQL oracle recomputes every extracted field from the documents table.
    The head block carries a <script> to exercise subtree dropping."""
    esc = _html.escape(text or "", quote=False)
    body = (
        f"<html><head><title>doc {doc_id}</title>"
        f"<script>var x = {doc_id} < 1 && 2 > 1;</script></head>"
        f"<body><p>{esc}</p></body></html>"
    ).encode("utf-8")
    uri = f"http://sf.test/{lang or 'und'}/{doc_id}"
    date = f"2026-01-{doc_id % 28 + 1:02d}T00:00:{doc_id % 60:02d}Z"
    return build_warc_record(uri, date, build_http_response(body))


def synth_warc_blobs(df: DataFrame, n_groups: int = 32) -> DataFrame:
    """documents → one multi-record WARC blob per doc_id%%n_groups bucket
    (odd buckets use gzip members — both layouts exercised every run).
    Distributed: each bucket builds worker-side, records sorted by doc_id
    for byte-determinism at any partitioning."""
    from pyspark.sql import functions as F

    def _build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        pdf = pdf.sort_values("doc_id")
        recs = [
            synth_doc_record(int(t.doc_id), t.lang, t.text)
            for t in pdf.itertuples()
        ]
        gz = g % 2 == 1
        return pd.DataFrame(
            {
                "blob_name": [f"synth-{g:05d}.warc" + (".gz" if gz else "")],
                "blob": [build_warc(recs, gzip_members=gz)],
            }
        )

    return (
        df.withColumn("grp", (F.col("doc_id") % n_groups).cast("int"))
        .groupBy("grp")
        .applyInPandas(_build, "blob_name string, blob binary")
    )
