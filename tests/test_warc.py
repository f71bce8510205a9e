"""WARC source: writer/parser round trips, gzip member handling,
Content-Length exactness, strictness contract, HTML extraction, and the
distributed binaryFile reader."""

from __future__ import annotations

import gzip

import pytest

from openccnet_spark.sources.warc import (
    build_http_response,
    build_warc,
    build_warc_record,
    html_to_text,
    parse_warc,
    read_warc,
    split_http_response,
    synth_doc_record,
)


def _recs(n=3, body_suffix=b""):
    out = []
    for i in range(n):
        body = f"<html><body><p>doc {i}</p></body></html>".encode() + body_suffix
        out.append(
            build_warc_record(
                f"http://x.test/{i}", f"2026-01-0{i+1}T00:00:00Z",
                build_http_response(body),
            )
        )
    return out


def test_round_trip_plain():
    recs = parse_warc(build_warc(_recs(3)))
    assert [r["target_uri"] for r in recs] == [f"http://x.test/{i}" for i in range(3)]
    status, ctype, body = split_http_response(recs[1]["payload"])
    assert (status, ctype) == (200, "text/html; charset=utf-8")
    assert body == b"<html><body><p>doc 1</p></body></html>"


def test_round_trip_gzip_members():
    blob = build_warc(_recs(4), gzip_members=True)
    assert blob[:2] == b"\x1f\x8b"
    recs = parse_warc(blob)
    assert len(recs) == 4
    # members must also decompress as one concatenated stream (valid .gz)
    assert gzip.decompress(blob) == build_warc(_recs(4))


def test_content_length_exact_trailing_crlf_kept():
    """A body ending in CRLF must survive: Content-Length is exact and the
    parser never strips the payload (the sources/pdf.py lesson)."""
    recs = parse_warc(build_warc(_recs(1, body_suffix=b"\r\n")))
    _, _, body = split_http_response(recs[0]["payload"])
    assert body.endswith(b"</html>\r\n")


def test_truncated_record_raises():
    blob = build_warc(_recs(2))
    with pytest.raises(ValueError, match="Content-Length|terminator"):
        parse_warc(blob[:-6])
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"NOT-A-WARC\r\n\r\n")


def test_truncated_gzip_member_raises():
    blob = build_warc(_recs(2), gzip_members=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(blob[:-10])


def test_html_to_text_drops_head_script_style_entities():
    html = (
        b"<html><head><title>t</title><script>if (1 < 2 && 3 > 1) {}</script>"
        b"</head><body><style>p { color: red }</style>"
        b"<p>a &amp; b\n\n  c &lt;d&gt;</p></body></html>"
    )
    assert html_to_text(html) == "a & b c <d>"


def test_synth_record_extraction_round_trips():
    text = "alpha & beta <gamma> delta"
    rec = parse_warc(synth_doc_record(7, "en", text))[0]
    assert rec["target_uri"] == "http://sf.test/en/7"
    assert rec["warc_date"] == "2026-01-08T00:00:07Z"
    _, _, body = split_http_response(rec["payload"])
    assert html_to_text(body) == text


def test_read_warc_binaryfile(spark, tmp_path):
    """Distributed reader: one plain + one gzip-member file through the
    binaryFile source; extract_text stays a single Python stage."""
    (tmp_path / "a.warc").write_bytes(build_warc(_recs(3)))
    (tmp_path / "b.warc.gz").write_bytes(build_warc(_recs(2), gzip_members=True))
    df = read_warc(spark, str(tmp_path) + "/*", extract_text=True)
    rows = df.filter("warc_type = 'response'").collect()
    assert len(rows) == 5
    assert {r["text"] for r in rows} <= {f"doc {i}" for i in range(3)}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") <= 1


def test_read_warc_lenient_records_error(spark, tmp_path):
    (tmp_path / "good.warc").write_bytes(build_warc(_recs(1)))
    (tmp_path / "bad.warc").write_bytes(b"NOT-A-WARC\r\n\r\npadding")
    df = read_warc(spark, str(tmp_path) + "/*", strict=False)
    rows = {r["warc_file"].split("/")[-1]: r for r in df.collect()}
    assert rows["good.warc"]["parse_error"] is None
    assert "version" in rows["bad.warc"]["parse_error"]
    with pytest.raises(Exception):
        read_warc(spark, str(tmp_path) + "/bad.warc", strict=True).collect()
