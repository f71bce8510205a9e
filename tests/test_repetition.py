"""Repetition-signal tests: the Spark Arrow pass, the scalar ground
truth, and the DuckDB oracle must agree bit-for-bit, and the plan must
stay shuffle-free (the operator is per-document by construction)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from openccnet_spark.operators.repetition import (
    REP_THRESHOLDS_PPM,
    repetition_keep_expr,
    repetition_signals,
    repetition_signals_py,
    sql_repetition_signals,
)

_DOCS = [
    (0, "a b a b a b a b"),
    (1, "the cat sat on the mat the cat sat on the mat"),
    (2, ""),
    (3, "single"),
    (4, "x  y  x  y"),  # double spaces -> empty words survive the split
    (5, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),  # fully unique
    (6, "a a a a a a a a a a a a a a a a"),
    (7, None),
    (8, "p q r s t p q r s t u v w x y p q r s t"),  # 5-gram repeats
]


def test_scalar_spec_edge_cases():
    s5 = repetition_signals_py(_DOCS[5][1])
    assert all(v == 0 for k, v in s5.items() if k != "keep") and s5["keep"] == 1
    s6 = repetition_signals_py(_DOCS[6][1])
    assert s6["top2_ppm"] == s6["dup10_ppm"] == 1_000_000 and s6["keep"] == 0
    s8 = repetition_signals_py(_DOCS[8][1])
    assert s8["dup5_ppm"] > 0
    assert repetition_signals_py("")["keep"] == 1
    assert repetition_signals_py(None)["keep"] == 1


def test_spark_matches_scalar_and_duckdb(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        r.doc_id: {k: r[k] for k in (*REP_THRESHOLDS_PPM, "keep")}
        for r in repetition_signals(df).collect()
    }
    assert set(got) == {d for d, _ in _DOCS}
    for doc_id, text in _DOCS:
        assert got[doc_id] == repetition_signals_py(text), doc_id
    duckdb.register("rep_docs", pd.DataFrame(_DOCS, columns=["doc_id", "text"]))
    oracle = duckdb.sql(sql_repetition_signals("rep_docs")).df()
    for _, r in oracle.iterrows():
        want = got[int(r.doc_id)]
        assert {k: int(r[k]) for k in want} == want, int(r.doc_id)


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-document: nothing may shuffle
    assert plan.count("ArrowEvalPython") == 0  # mapInPandas, not an eval UDF


def test_carry_cols_pass_through(spark):
    rows = [(i, t, f"lang{i % 2}") for i, t in _DOCS]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.doc_id: (r.lang, r.text)
        for r in repetition_signals(df, carry_cols=("lang", "text")).collect()
    }
    assert got == {i: (l, t) for i, t, l in rows}


def test_keep_expr_matches_embedded_flag(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    sig = repetition_signals(df).withColumn("keep2", repetition_keep_expr())
    assert all(r.keep == r.keep2 for r in sig.collect())
