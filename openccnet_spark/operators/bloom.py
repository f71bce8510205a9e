"""Broadcast-Bloom membership prefilter for incremental exact dedup.

The daily operation of a 100 TB ingest is "which of today's documents
already exist in the corpus index?". ``dedup.incremental_minhash_dedup``
answers the *near*-dup version with a band-key equi-join; for the *exact*
version the join against a petabyte-scale index is mostly wasted work —
the overwhelming majority of new documents are NOT in the index. A Bloom
filter of the index's 60-bit text hashes, built once and **broadcast to
every executor as a few MB of bits**, answers "definitely new" map-side
with zero shuffle; only the rare bloom hits (true dups + false
positives) proceed to the exact verification join. The final answer is
EXACT — the bloom only prunes the join input, false positives are
eliminated by the hash equi-join — and the bloom bit pattern itself is
deterministic and oracle-checkable (reference repo laisuk/OpenccNet has
no counterpart; LLM-pipeline brief, sibling of ``dedup.py``).

Hash spec (cross-engine, see dedup.simhash provenance): ``h = first 15
hex chars of md5(text) as int`` (60 bits); the ``k = 3`` bit positions
use Kirsch–Mitzenmacher double hashing over the two independent 30-bit
halves, ``pos_s = (h_lo + s * h_hi) % m_bits`` with ``h_lo = h % 2^30``,
``h_hi = h // 2^30`` and ``m_bits`` a power of two <= 2^30 — plain
integer arithmetic, so DuckDB replays membership as three ``IN`` tests
against the index's distinct position set with no bitmap SQL-side.
(The pre-round-7 family sliced three 20-bit windows out of ``h``, which
structurally capped ``m_bits`` at 2^20 ≈ 1 Mbit — saturated and stopped
pruning at ≳10^5–10^6 index keys. Double hashing keeps every position
full-width, so the bitmap scales to 2^30 bits = 128 MB broadcast,
enough for ~10^8 index keys at k=3 under 1% FP.)

Scale shape: the build is one narrow pass emitting ONE fixed-size
partial bitmap row per partition (m_bits/8 bytes each — bounded by
partition count, not data), OR-ed on the driver and broadcast; the
prefilter is a narrow Arrow pass against the broadcast bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BLOOM_K",
    "hash60_expr",
    "bloom_positions",
    "bloom_build",
    "bloom_tag",
    "incremental_exact_dedup",
]

BLOOM_K = 3


def hash60_expr(col: str) -> Column:
    """60-bit md5-prefix hash of a column (cross-engine family)."""
    return F.expr(f"CAST(conv(substr(md5({col}), 1, 15), 16, 10) AS BIGINT)")


def bloom_positions(h: int, m_bits: int) -> tuple[int, ...]:
    """The k bit positions of a 60-bit hash (double hashing over the
    30-bit halves: ``(h_lo + s*h_hi) % m_bits``)."""
    lo, hi = h % (1 << 30), h >> 30
    return tuple((lo + s * hi) % m_bits for s in range(BLOOM_K))


def bloom_build(df: DataFrame, hash_col: str = "h", m_bits: int = 1 << 20) -> bytes:
    """Build the index bitmap: one partial per partition, OR-ed driver-side.

    ``m_bits`` must be a power of two <= 2^30 (the double-hash half
    width). The collect is ``n_partitions`` rows of ``m_bits/8`` bytes
    each — independent of data volume, but at large ``m_bits`` coalesce
    the hash frame first (the build pass is narrow anyway).
    """
    if m_bits & (m_bits - 1) or m_bits > 1 << 30:
        raise ValueError("m_bits must be a power of two <= 2^30")
    n_words = m_bits // 64

    def _partial(batches):
        bits = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            h = pdf[hash_col].to_numpy(dtype=np.uint64)
            lo, hi = h % np.uint64(1 << 30), h >> np.uint64(30)
            for s in range(BLOOM_K):
                pos = (lo + np.uint64(s) * hi) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bits, (pos // 64).astype(np.int64), np.uint64(1) << (pos % np.uint64(64))
                )
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = df.select(hash_col).mapInPandas(_partial, "bits binary").collect()
    acc = np.zeros(n_words, dtype=np.uint64)
    for row in partials:
        acc |= np.frombuffer(row.bits, dtype=np.uint64)
    return acc.tobytes()


def bloom_tag(
    df: DataFrame, bloom_bytes: bytes, m_bits: int, hash_col: str = "h"
) -> DataFrame:
    """Append ``bloom_hit`` (0/1): all k bits set in the broadcast bitmap.

    ``bloom_hit = 0`` is a PROOF the hash is not in the index (no false
    negatives); ``1`` means "verify me". The bitmap rides an executor
    broadcast, not the task closure.
    """
    bc = df.sparkSession.sparkContext.broadcast(bloom_bytes)
    cols = df.columns

    def _tag(batches):
        bits = np.frombuffer(bc.value, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf[hash_col].to_numpy(dtype=np.uint64)
            lo, hi = h % np.uint64(1 << 30), h >> np.uint64(30)
            hit = np.ones(len(h), dtype=bool)
            for s in range(BLOOM_K):
                pos = (lo + np.uint64(s) * hi) % np.uint64(m_bits)
                word = bits[(pos // 64).astype(np.int64)]
                hit &= (word >> (pos % np.uint64(64))) & np.uint64(1) != 0
            out = pdf.copy()
            out["bloom_hit"] = hit.astype(np.int32)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(_tag, f"{schema}, bloom_hit int")


def incremental_exact_dedup(
    batch: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Exact incremental dedup of ``batch`` against ``index`` with a
    broadcast-Bloom prefilter.

    Emits every batch row as ``(id_col, bloom_hit, is_new)``:
    ``bloom_hit`` is the (deterministic, oracle-checkable) bitmap answer,
    ``is_new`` the exact verdict. The result equals a plain anti-join at
    any false-positive rate — misses are proven new without shuffling a
    byte, hits are verified exactly — but the INDEX side never shuffles:
    the rare bloom-hit hash sliver is broadcast against the index
    (semi-join, narrow index scan), and the surviving "actually present"
    hashes — no larger than the sliver — are broadcast back. The contract
    is a mostly-new batch (the daily-ingest shape): a batch that is
    mostly duplicates makes the hit sliver large and the plain
    ``dedup.incremental_*`` join the right tool instead.

    ``persist`` materializes the distinct index-hash frame, which backs
    both the bitmap-build job (an action) and the verify semi-join —
    honored ONLY when ``handles`` supplies a release channel: a persist
    nobody can unpersist leaks into the shared session's CacheManager
    (measured 2-4x degradation of later queries — CLAUDE.md).
    """
    bh = batch.select(F.col(id_col), hash60_expr(text_col).alias("h"))
    ih = index.select(hash60_expr(text_col).alias("h")).distinct()
    if persist and handles is not None:
        ih = ih.persist()
        handles.append(ih)
    bloom = bloom_build(ih, m_bits=m_bits)
    tagged = bloom_tag(bh, bloom, m_bits)
    misses = tagged.filter(F.col("bloom_hit") == 0).withColumn(
        "is_new", F.lit(1)
    )
    hit_rows = tagged.filter(F.col("bloom_hit") == 1)
    present = ih.join(
        F.broadcast(hit_rows.select("h").distinct()), "h", "leftsemi"
    ).withColumn("in_index", F.lit(1))
    hits = hit_rows.join(F.broadcast(present), "h", "left").withColumn(
        "is_new", F.when(F.col("in_index").isNull(), 1).otherwise(0)
    )
    cols = [id_col, "bloom_hit", "is_new"]
    return misses.select(*cols).unionByName(hits.select(*cols))


def sql_incremental_exact(
    batch_where: str, index_where: str, m_bits: int, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB replay: the bloom answer via three IN-tests against the
    index's distinct position set, the exact verdict via NOT IN."""
    half = 1 << 30
    slots = " AND ".join(
        f"(((b.h % {half}) + {s} * (b.h // {half})) % {m_bits}) IN (SELECT p FROM pos)"
        for s in range(BLOOM_K)
    )
    pos_union = " UNION ".join(
        f"SELECT (((h % {half}) + {s} * (h // {half})) % {m_bits}) AS p FROM ih"
        for s in range(BLOOM_K)
    )
    return f"""
WITH ih AS (SELECT DISTINCT ('0x' || substr(md5({text_col}), 1, 15))::BIGINT AS h
            FROM {table} WHERE {index_where}),
pos AS ({pos_union}),
b AS (SELECT {id_col}, ('0x' || substr(md5({text_col}), 1, 15))::BIGINT AS h
      FROM {table} WHERE {batch_where})
SELECT b.{id_col},
       (CASE WHEN {slots} THEN 1 ELSE 0 END)::INT AS bloom_hit,
       (CASE WHEN b.h IN (SELECT h FROM ih) THEN 0 ELSE 1 END)::INT AS is_new
FROM b
"""
