"""DSIR importance resampling: weight direction, score exactness vs a
scalar replay, domain-selection behavior, empty-doc handling, and full
DuckDB parity including the exact-rank selection."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd

from openccnet_spark.operators.dsir import (
    DSIR_BUCKETS,
    bucket_counts,
    dsir_score,
    dsir_select,
    dsir_weights,
    sql_dsir_select,
)

_SCHEMA = "doc_id long, text string"

# two disjoint token pools — "domain A" and "domain B" documents
_A_DOCS = [f"alpha beta gamma delta w{i} alpha beta" for i in range(12)]
_B_DOCS = [f"omega psi chi phi v{i} omega psi" for i in range(12)]


def _py_buckets(text: str, n: int = 2, buckets: int = DSIR_BUCKETS):
    ws = (text or "").split(" ")
    return [
        int(hashlib.md5(" ".join(ws[i : i + n]).encode()).hexdigest()[:15], 16)
        % buckets
        for i in range(len(ws) - n + 1)
    ]


def _counts(texts):
    out: dict[int, int] = {}
    for t in texts:
        for b in _py_buckets(t):
            out[b] = out.get(b, 0) + 1
    return out


def test_weights_favor_target_ngrams():
    tgt, raw = _counts(_A_DOCS), _counts(_A_DOCS + _B_DOCS)
    w = dsir_weights(tgt, raw)
    a_bucket = _py_buckets("alpha beta")[0]
    b_bucket = _py_buckets("omega psi")[0]
    assert w[a_bucket] > 0 > w[b_bucket]


def test_score_matches_scalar_replay(spark):
    texts = _A_DOCS[:4] + _B_DOCS[:4]
    tgt, raw = _counts(_A_DOCS), _counts(texts)
    w = dsir_weights(tgt, raw)
    df = spark.createDataFrame(list(enumerate(texts)), _SCHEMA)
    got = {r["doc_id"]: r for r in dsir_score(df, w).collect()}
    for i, t in enumerate(texts):
        bs = _py_buckets(t)
        assert got[i]["n_grams"] == len(bs)
        assert got[i]["score_milli"] == sum(w[b] for b in bs)


def test_select_prefers_target_domain(spark):
    texts = _A_DOCS + _B_DOCS
    df = spark.createDataFrame(list(enumerate(texts)), _SCHEMA)
    raw = {r["bucket"]: r["cnt"] for r in bucket_counts(df).collect()}
    tgt_df = spark.createDataFrame(list(enumerate(_A_DOCS)), _SCHEMA)
    tgt = {r["bucket"]: r["cnt"] for r in bucket_counts(tgt_df).collect()}
    w = dsir_weights(tgt, raw)
    out = {r["doc_id"]: r["selected"] for r in dsir_select(df, w, 500000).collect()}
    # top half by importance = exactly the A-domain documents
    assert all(out[i] for i in range(12))
    assert not any(out[i] for i in range(12, 24))


def test_gramless_docs_survive_with_zero_score(spark):
    df = spark.createDataFrame([(0, ""), (1, "one"), (2, "alpha beta")], _SCHEMA)
    w = dsir_weights(_counts(["alpha beta"]), _counts(["alpha beta"]))
    got = {r["doc_id"]: r for r in dsir_score(df, w).collect()}
    assert len(got) == 3
    assert got[0]["n_grams"] == 0 and got[0]["score_milli"] == 0
    assert got[1]["n_grams"] == 0 and got[1]["avg_milli"] == 0


def test_matches_duckdb_including_selection(spark):
    texts = _A_DOCS + _B_DOCS + ["", "one"]
    df = spark.createDataFrame(list(enumerate(texts)), _SCHEMA)
    raw = {r["bucket"]: r["cnt"] for r in bucket_counts(df).collect()}
    tgt_df = spark.createDataFrame(list(enumerate(_A_DOCS)), _SCHEMA)
    tgt = {r["bucket"]: r["cnt"] for r in bucket_counts(tgt_df).collect()}
    w = dsir_weights(tgt, raw)
    got = sorted(map(tuple, dsir_select(df, w, 250000).collect()))
    duckdb.register(
        "dsir_t", pd.DataFrame(list(enumerate(texts)), columns=["doc_id", "text"])
    )
    want = sorted(map(tuple, duckdb.sql(sql_dsir_select("dsir_t", w, 250000)).fetchall()))
    assert got == want
