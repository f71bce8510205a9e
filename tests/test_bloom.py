"""Bloom-prefilter tests: bitmap determinism across partitionings, the
no-false-negative invariant, exactness of the final verdict at any FP
rate, and the DuckDB position-set replay of every bit answer."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators.bloom import (
    BLOOM_K,
    bloom_build,
    bloom_positions,
    bloom_tag,
    hash60_expr,
    incremental_exact_dedup,
    sql_incremental_exact,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_bloom(hashes, m_bits):
    bits = set()
    for h in hashes:
        bits.update(bloom_positions(h, m_bits))
    return bits


def _py_hit(h, bits, m_bits):
    return all(p in bits for p in bloom_positions(h, m_bits))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"doc number {i} body {'x' * (i % 5)}") for i in range(200)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_hash60_matches_python(spark, corpus):
    rows, df = corpus
    for r in df.select("doc_id", hash60_expr("text").alias("h")).collect()[:10]:
        assert r.h == _h60(rows[r.doc_id][1])


@pytest.mark.parametrize("n_parts", [1, 7])
def test_bitmap_partition_invariant_and_matches_python(spark, corpus, n_parts):
    rows, df = corpus
    m = 1 << 10
    hdf = df.repartition(n_parts).select(hash60_expr("text").alias("h"))
    bits = bloom_build(hdf, m_bits=m)
    want = _py_bloom([_h60(t) for _, t in rows], m)
    got = {
        i * 64 + b
        for i, w in enumerate(
            int.from_bytes(bits[i : i + 8], "little")
            for i in range(0, len(bits), 8)
        )
        for b in range(64)
        if w >> b & 1
    }
    assert got == want


def test_bad_m_bits_rejected(spark, corpus):
    _, df = corpus
    hdf = df.select(hash60_expr("text").alias("h"))
    for m in (3, 1 << 31):
        with pytest.raises(ValueError):
            bloom_build(hdf, m_bits=m)


def test_tag_no_false_negatives_and_exactness(spark, corpus):
    rows, df = corpus
    m = 1 << 8  # tiny: force a high FP rate so the exact join earns its keep
    index = df.filter(F.col("doc_id") % 2 == 0)
    handles: list = []
    out = incremental_exact_dedup(
        df, index, m_bits=m, persist=True, handles=handles
    ).collect()
    for h in handles:
        h.unpersist()
    got = {r.doc_id: (r.bloom_hit, r.is_new) for r in out}
    assert len(got) == len(rows)
    index_hashes = {_h60(t) for i, t in rows if i % 2 == 0}
    bits = _py_bloom(index_hashes, m)
    fp = 0
    for i, t in rows:
        h = _h60(t)
        want_hit = int(_py_hit(h, bits, m))
        want_new = int(h not in index_hashes)
        assert got[i] == (want_hit, want_new), i
        fp += int(want_hit and want_new)
        if got[i][0] == 0:
            assert got[i][1] == 1  # a miss PROVES novelty
    assert fp > 0  # the tiny bitmap actually exercised false positives


def test_sql_oracle_matches_operator(spark, corpus):
    rows, df = corpus
    m = 1 << 9
    got = {
        r.doc_id: (r.bloom_hit, r.is_new)
        for r in incremental_exact_dedup(
            df, df.filter(F.col("doc_id") % 3 != 0), m_bits=m
        ).collect()
    }
    duckdb.register("bloom_docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = sql_incremental_exact(
        "TRUE", "doc_id % 3 <> 0", m, table="bloom_docs"
    )
    for _, r in duckdb.sql(sql).df().iterrows():
        assert got[int(r.doc_id)] == (int(r.bloom_hit), int(r.is_new))


def test_large_bitmap_fp_rate_at_scale(spark):
    """The round-7 double-hash position family must keep pruning past the
    old 2^20 structural cap: at m_bits=2^26 a 10^5-key index must tag
    well under 1% of 10^5 non-member probes as hits (analytic FP at
    k=3, n=1e5, m=2^26 is ~9e-8; the 1% bound leaves room for hash
    clustering). The pre-r7 20-bit-slice family cannot pass this at any
    m_bits: its bitmap tops out at 2^20 bits."""
    m = 1 << 26
    index_h = (
        spark.range(100_000)
        .select(hash60_expr("CAST(id AS STRING)").alias("h"))
        .coalesce(4)
    )
    bits = bloom_build(index_h, m_bits=m)
    probes = spark.range(100_000, 200_000).select(
        F.col("id").alias("doc_id"), hash60_expr("CAST(id AS STRING)").alias("h")
    ).coalesce(4)
    hits = (
        bloom_tag(probes, bits, m)
        .agg(F.sum("bloom_hit").alias("n_hits"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert hits.n == 100_000
    assert hits.n_hits / hits.n < 0.01, hits.n_hits
    # spot-check the no-false-negative side on the same bitmap
    member = bloom_tag(
        spark.range(5).select(
            F.col("id").alias("doc_id"), hash60_expr("CAST(id AS STRING)").alias("h")
        ),
        bits,
        m,
    ).collect()
    assert all(r.bloom_hit == 1 for r in member)


def test_miss_path_plan_never_touches_index(spark, corpus):
    """The bloom-miss branch must be shuffle-free: proven-new rows go
    straight through, only the hit sliver exchanges (broadcast)."""
    rows, df = corpus
    out = incremental_exact_dedup(
        df, df.filter(F.col("doc_id") % 2 == 0), m_bits=1 << 20
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # every join must be broadcast
