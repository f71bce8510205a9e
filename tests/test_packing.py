"""Sequence-packing tests: the bucket-decomposed global prefix sum must
equal the naive ordered cumsum at any bucketing, and the resulting
stream must tile perfectly (no gaps, no overlaps)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators.packing import pack_chunks


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _naive(rows, window):
    """rows: (doc_id, n_tokens). The spec: cumsum in (hash, id) order."""
    order = sorted(
        (r for r in rows if r[1] > 0), key=lambda r: (_h60(f"pack:{r[0]}"), r[0])
    )
    out, off = {}, 0
    for doc_id, toks in order:
        first, last = off // window, (off + toks - 1) // window
        out[doc_id] = (toks, off, first, last, last - first + 1)
        off += toks
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 13) % 9 + 1) for i in range(300)]
    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(t))) for i, t in rows],
        "doc_id long, text string",
    )
    return rows, df


@pytest.mark.parametrize("n_buckets", [1, 7, 4096])
def test_matches_naive_prefix_sum(spark, docs, n_buckets):
    rows, df = docs
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.first_chunk, r.last_chunk, r.n_chunks)
        for r in pack_chunks(df, 16, n_buckets=n_buckets).collect()
    }
    assert got == _naive(rows, 16)


def test_stream_tiles_without_gaps(spark, docs):
    rows, df = docs
    placed = sorted(
        (r.start_offset, r.n_tokens)
        for r in pack_chunks(df, 128).collect()
    )
    off = 0
    for start, toks in placed:
        assert start == off  # perfect tiling: next doc starts where prev ended
        off += toks
    assert off == sum(t for _, t in rows)


def test_zero_token_and_window_guards(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    out = pack_chunks(df, 2).collect()
    assert [r.doc_id for r in out] == [1]  # null text -> dropped
    (r,) = out
    assert (r.first_chunk, r.last_chunk, r.n_chunks) == (0, 1, 2)
    with pytest.raises(ValueError):
        pack_chunks(df, 0)
