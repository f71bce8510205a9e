"""Deterministic sequence packing: concat-and-chop documents into
fixed-size token windows (the GPT-style training-prep step — documents
are laid end-to-end in a canonical order and the stream is chopped every
``window`` tokens; each document lands in a known span of chunks).

The hard part at 100 TB is the **exact global prefix sum** of token
counts in a deterministic order — a single global ordered window is one
reducer over the corpus. The decomposition (same family as
``curation.budget_select`` / ``textstats.quality_quantiles_frame``, but
where EVERY row needs its exact offset, not just a boundary bucket):

1. canonical order = (60-bit md5 key, id) — reproducible in any engine,
   and uniform, so the key's top bits bucket the corpus into
   ``n_buckets`` near-equal ranges;
2. a map-side combined per-bucket token-sum histogram (``n_buckets``
   rows total ever shuffle) + a tiny cumulative window over it give each
   bucket's below-offset;
3. each bucket's rows pay an in-bucket cumulative window — partitioned
   by bucket, so the "global sort" is 4096 independent reducers each
   holding ~1/4096 of the corpus, seeded by the broadcast below-offset.

Identical to the naive single-window prefix sum at any partitioning
(reference repo laisuk/OpenccNet has no counterpart; LLM-pipeline brief).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .curation import key60_col

__all__ = ["pack_chunks"]


def pack_chunks(
    df: DataFrame,
    window: int,
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
    n_buckets: int = 4096,
    salt: str = "pack:",
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Assign each document its span in the chopped token stream.

    Emits ``id_col, n_tokens, start_offset, first_chunk, last_chunk,
    n_chunks`` where ``first_chunk = start_offset DIV window`` and
    ``last_chunk = (start_offset + n_tokens - 1) DIV window`` — a doc
    straddling a boundary spans several chunks (real packers either pad
    or split there; the span is the contract either way). Zero-token
    documents are dropped (they occupy no stream position).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if tokens_col is None:
        tokens_col = F.size(F.split(F.col("text"), " "))
    keyed = (
        df.select(
            F.col(id_col),
            tokens_col.cast("long").alias("n_tokens"),
            key60_col(salt, id_col).alias("hkey"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            # integer DIV: 60-bit keys mis-bucket under double division
            "bucket",
            F.expr(f"CAST(hkey DIV {(1 << 60) // n_buckets} AS INT)"),
        )
    )
    if persist and handles is not None:
        # keyed feeds the histogram AND the placed branch — persist so the
        # input subtree (md5 key + token split, or a whole upstream
        # curation pipeline in curation_e2e) evaluates once; release via
        # the caller's handles (house rule)
        keyed = keyed.persist()
        handles.append(keyed)
    hist = keyed.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_below = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    below = hist.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_below), F.lit(0)).alias(
            "below_offset"
        ),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("hkey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        keyed.join(F.broadcast(below), "bucket")
        .withColumn(
            "start_offset",
            F.col("below_offset")
            + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
        .withColumn("first_chunk", F.expr(f"start_offset DIV {int(window)}"))
        .withColumn(
            "last_chunk",
            F.expr(f"(start_offset + n_tokens - 1) DIV {int(window)}"),
        )
        .withColumn("n_chunks", F.col("last_chunk") - F.col("first_chunk") + 1)
    )
    return placed.select(
        id_col, "n_tokens", "start_offset", "first_chunk", "last_chunk", "n_chunks"
    )


def sql_pack_chunks(
    window: int, table: str = "documents", id_col: str = "doc_id",
    salt: str = "pack:",
) -> str:
    """DuckDB replay: the NAIVE single-window global prefix sum over the
    same (hash, id) order — the decomposition must equal it exactly."""
    return f"""
WITH d AS (
  SELECT {id_col}, len(string_split(text, ' '))::BIGINT AS n_tokens,
         ('0x' || substr(md5('{salt}' || {id_col}), 1, 15))::BIGINT AS hkey
  FROM {table}
),
c AS (
  SELECT {id_col}, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY hkey, {id_col}
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS start_offset
  FROM d WHERE n_tokens > 0
)
SELECT {id_col}, n_tokens, start_offset,
       (start_offset // {int(window)})::BIGINT AS first_chunk,
       ((start_offset + n_tokens - 1) // {int(window)})::BIGINT AS last_chunk,
       ((start_offset + n_tokens - 1) // {int(window)}
        - start_offset // {int(window)} + 1)::BIGINT AS n_chunks
FROM c
"""
