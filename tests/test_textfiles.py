"""Legacy-encoding text source (SURVEY §2.3 CLI encodings)."""

from __future__ import annotations

from openccnet_spark.functions import convert_udf
from openccnet_spark.sources.textfiles import read_text_files

SAMPLE = ["简体中文第一行", "第二行带标点，好。", "ascii line"]


def _write(tmp_path, name, encoding):
    p = tmp_path / name
    p.write_text("\n".join(SAMPLE), encoding=encoding)
    return str(p)


def test_read_gbk_and_big5(spark, tmp_path):
    for enc in ("gbk", "utf-16", "utf-8"):
        path = _write(tmp_path, f"f_{enc}.txt", enc)
        rows = read_text_files(spark, path, encoding=enc).orderBy("line_no").collect()
        assert [r.text for r in rows] == SAMPLE
        assert [r.line_no for r in rows] == [0, 1, 2]
    # big5 is Traditional-oriented; round-trip Traditional content
    trad = "繁體中文內容"
    p = tmp_path / "f_big5.txt"
    p.write_text(trad, encoding="big5")
    rows = read_text_files(spark, str(p), encoding="big5").collect()
    assert rows[0].text == trad


def test_decode_then_convert(spark, tmp_path):
    path = _write(tmp_path, "conv.txt", "gbk")
    df = read_text_files(spark, path, encoding="gbk")
    out = (
        df.withColumn("converted", convert_udf("s2t")("text"))
        .orderBy("line_no")
        .collect()
    )
    assert out[0].converted == "簡體中文第一行"


def test_line_numbers_split_on_newlines_only(spark, tmp_path):
    """A form feed / U+2028 inside a line must NOT split it: line_no
    lineage must match the file's actual newline count (wc -l semantics)
    — code-review finding, round 4."""
    from openccnet_spark.sources.textfiles import read_text_files

    p = tmp_path / "ff.txt"
    p.write_bytes("第一行有\x0c换页符\nline 2\nlast".encode("utf-8"))
    rows = sorted(
        read_text_files(spark, str(p)).collect(), key=lambda r: r.line_no
    )
    assert [(r.line_no, r.text) for r in rows] == [
        (0, "第一行有\x0c换页符"),
        (1, "line 2"),
        (2, "last"),
    ]
