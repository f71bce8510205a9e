"""HTML boilerplate removal: golden pages, classifier edges, the
no-entity contract of the page synthesizer, and the zero-shuffle plan."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from openccnet_spark.operators.boilerplate import (
    MIN_BLOCK_CHARS,
    extract_main_text,
    sql_extract_main_text,
    sql_synth_page,
)

LONG = " ".join(["word"] * 20)  # 99 chars, no links -> content


def _run(spark, pages):
    df = spark.createDataFrame(pages, "doc_id long, html string")
    return {
        r["doc_id"]: (r["n_blocks"], r["n_content"], r["main_text"])
        for r in extract_main_text(df).collect()
    }


def test_golden_page(spark):
    html = (
        '<div><a href="/">Home</a> <a href="/a">About</a></div>'
        f"<p>{LONG}</p>"
        '<div>Cookies: <a href="/p">Learn more</a>.</div>'
        f"<p>second {LONG}</p>"
        '<footer><a href="/t">Terms</a></footer>'
    )
    got = _run(spark, [(1, html)])
    assert got[1] == (5, 2, f"{LONG}\nsecond {LONG}")


def test_link_density_kills_long_link_blocks(spark):
    """A long block made mostly of anchor text must be boilerplate even
    though it clears the length threshold."""
    anchors = " ".join(f'<a href="/x{i}">link text {i}</a>' for i in range(12))
    got = _run(spark, [(1, f"<div>{anchors}</div><p>{LONG}</p>")])
    assert got[1] == (2, 1, LONG)


def test_short_blocks_are_boilerplate(spark):
    short = "x" * (MIN_BLOCK_CHARS - 1)
    keep = "y" * MIN_BLOCK_CHARS
    got = _run(spark, [(1, f"<p>{short}</p><p>{keep}</p>")])
    assert got[1] == (2, 1, keep)


def test_empty_and_null_pages(spark):
    got = _run(spark, [(1, ""), (2, None), (3, "<p></p><div> </div>")])
    assert got[1] == (0, 0, "")
    assert got[2] == (0, 0, "")
    assert got[3] == (0, 0, "")


def test_matches_duckdb_twin(spark):
    rows = [
        (1, f'<div><a href="/">Home</a></div><p>{LONG}</p>'),
        (2, ""),
        (3, f"<p>{LONG}</p><p>{LONG}</p>"),
        (4, '<footer><a href="/t">Terms</a> and conditions</footer>'),
    ]
    got = sorted(map(tuple, _run(spark, rows).items()))
    duckdb.register("bp_t", pd.DataFrame(rows, columns=["doc_id", "html"]))
    want = sorted(
        (r[0], (r[1], r[2], r[3]))
        for r in duckdb.sql(sql_extract_main_text("bp_t")).fetchall()
    )
    assert got == want


def test_synth_page_has_no_entities(spark):
    """The synthesizer's no-escaping shortcut is only sound if the corpus
    text really has no <, > or & — pin it against the real testdata."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.filter(F.col("text").rlike("[<>&]")).count()
    assert n == 0


def test_plan_is_zero_shuffle_pure_jvm(spark):
    docs = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.expr(sql_synth_page("'some text'")).alias("html"),
    )
    plan = extract_main_text(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
