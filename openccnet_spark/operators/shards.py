"""Deterministic training-shard writer (WebDataset-style sink).

Training jobs consume a corpus as numbered shard files of roughly equal
token mass with a manifest (doc/token counts + a content digest per
shard) for integrity checks and resumable data loading. The whole value
is determinism: the same corpus must produce the same shard membership
on any cluster, any partitioning, any day — otherwise a resumed
training run silently re-reads different data.

Built on `packing.pack_chunks`' exact distributed prefix sum: a doc's
shard is `start_offset DIV shard_tokens` in the canonical
(60-bit md5 key, id) order — doc-granular (no doc splits across
shards), shards close over/under the cap by at most one document. The
manifest digest is the XOR of per-doc 60-bit hashes (order-free,
ANSI-safe — CLAUDE.md set-digest rule), cross-engine reproducible.

The sink itself is one dynamic-partition parquet write partitioned by
shard_id — each shard is a directory an independent loader can read,
and the write shuffles each document exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .curation import key60_col
from .packing import pack_chunks

__all__ = ["assign_shards", "shard_manifest", "write_shards"]


def assign_shards(
    df: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
) -> DataFrame:
    """(id, n_tokens, shard_id): shard = the packing chunk the doc's
    exact global start offset falls in (window = shard token cap)."""
    packed = pack_chunks(df, shard_tokens, id_col=id_col, tokens_col=tokens_col)
    return packed.select(
        id_col, "n_tokens", F.col("first_chunk").alias("shard_id")
    )


def shard_manifest(
    df: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
) -> DataFrame:
    """(shard_id, n_docs, sum_tokens, doc_digest) per shard; the digest
    is bit_xor of 60-bit doc-id hashes (ids must be distinct)."""
    a = assign_shards(df, shard_tokens, id_col, tokens_col)
    return a.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.bit_xor(key60_col("shard:", id_col)).alias("doc_digest"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    shard_tokens: int,
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Write the corpus as `shard_id=N/` parquet directories plus a
    `_manifest` directory; returns the manifest frame. One shuffle: the
    assignment join repartitions by shard so each shard's files are
    written by the tasks that own it."""
    a = assign_shards(df, shard_tokens, id_col, tokens_col)
    (
        df.join(a.select(id_col, "shard_id"), id_col)
        .repartition(F.col("shard_id"))
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(f"{path}/data")
    )
    m = shard_manifest(df, shard_tokens, id_col, tokens_col)
    m.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return m


def sql_shard_manifest(
    shard_tokens: int, table: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle: naive single-window prefix sum -> same grouping."""
    from .packing import sql_pack_chunks

    return f"""
WITH p AS ({sql_pack_chunks(shard_tokens, table, id_col)})
SELECT first_chunk::BIGINT AS shard_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS sum_tokens,
       bit_xor(('0x' || substr(md5('shard:' || {id_col}), 1, 15))::BIGINT)::BIGINT
           AS doc_digest
FROM p GROUP BY 1
"""
