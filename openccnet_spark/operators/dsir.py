"""DSIR-style importance resampling: domain-matched data selection.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", NeurIPS): score every raw document by how much more likely
its hashed n-gram features are under a TARGET corpus' distribution than
under the RAW corpus' own, then keep the top slice — the standard way to
carve "Wikipedia-like" or "domain-D-like" training data out of a web
crawl without a trained classifier.

The Spark mapping keeps every unbounded step an aggregation and every
float a driver-side constant:

1. **Feature counts are bucket-bounded.** Word n-grams hash (the repo's
   cross-engine 60-bit md5 family) into ``DSIR_BUCKETS`` buckets;
   per-corpus counts are one explode + groupBy(bucket) — map-side
   combine collapses each partition to <= buckets rows before the
   exchange, so the two counting scans cost O(corpus) reads but only
   O(buckets) shuffle, at any corpus size.
2. **The weight solve is driver-side on 2 x buckets integers.** The
   smoothed log-ratio per bucket is computed ONCE in Python and
   milli-quantized (``dsir_weights``) — the same single-source-of-truth
   float discipline as the IVF centroids and the distilled classifier:
   both engines consume the identical integer table, so no cross-engine
   ``log`` ever happens.
3. **Scoring is an exact integer dot, JVM-side.** Documents explode to
   (id, bucket), join the BROADCAST 4096-row weight table, and
   groupBy(id) sum — no Python in the hot path (a 4096-element literal
   array would cost seconds of Catalyst analysis per query — the
   measured giant-literal-tree rule — hence the broadcast join, same as
   quality_model serving).
4. **Selection reuses the exact-rank machinery.** The per-gram average
   importance (floor of an exact-in-double division, clamped to
   ±``DSIR_CLAMP_MILLI``) has a BOUNDED domain, so
   ``curation.top_fraction_select``'s histogram-cutoff decomposition
   applies unchanged: cutoff from a <= 2*clamp+1-row histogram, only the
   tie group pays a window.

The paper resamples with Gumbel noise; this implementation's selection
is the deterministic top-fraction by average importance (exact rank,
(score DESC, id) tie-break) so the whole operator is oracle-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DSIR_BUCKETS",
    "DSIR_NGRAM",
    "DSIR_CLAMP_MILLI",
    "ngram_buckets_col",
    "bucket_counts",
    "dsir_weights",
    "dsir_score",
    "dsir_select",
    "sql_dsir_select",
]

#: hashed-feature dimensionality (the paper uses 10k; any power of two
#: keeps the modulo integer-exact cross-engine)
DSIR_BUCKETS = 4096
#: feature n-gram order (paper: unigrams+bigrams; bigrams carry both)
DSIR_NGRAM = 2
#: per-gram average importance clamp — bounds the selection score domain
DSIR_CLAMP_MILLI = 20000


def ngram_buckets_col(
    text_col: str, n: int = DSIR_NGRAM, buckets: int = DSIR_BUCKETS
) -> Column:
    """Array of hashed n-gram bucket ids, one per POSITION (duplicates
    kept — DSIR features are counts, unlike decontamination's distinct
    membership). Same hoisted-split shape as ``curation.ngram_hashes_col``
    (an inline split inside the lambda re-splits per position)."""
    return F.expr(
        f"""
        element_at(transform(array(split({text_col}, ' ')), ws ->
          CASE WHEN size(ws) >= {n}
            THEN transform(
                   sequence(1, size(ws) - {n} + 1),
                   i -> CAST(conv(substr(md5(array_join(slice(ws, i, {n}), ' ')), 1, 15), 16, 10) AS BIGINT) % {buckets})
            ELSE CAST(array() AS array<bigint>)
          END), 1)
        """
    )


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = DSIR_NGRAM,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(bucket, cnt) feature counts of a corpus — the exchange is
    <= ``buckets`` rows per partition (map-side combine)."""
    return (
        df.select(
            F.explode(
                ngram_buckets_col(f"coalesce({text_col}, '')", n, buckets)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def py_bucket_counts(
    texts, n: int = DSIR_NGRAM, buckets: int = DSIR_BUCKETS
) -> dict[int, int]:
    """Scalar replay of ``bucket_counts`` (oracle builders recount the
    corpus independently of the Spark aggregation — a wrong Spark count
    shifts the weights and hash-fails)."""
    import hashlib

    out: dict[int, int] = {}
    for t in texts:
        ws = (t or "").split(" ")
        for i in range(len(ws) - n + 1):
            b = (
                int(
                    hashlib.md5(" ".join(ws[i : i + n]).encode()).hexdigest()[:15],
                    16,
                )
                % buckets
            )
            out[b] = out.get(b, 0) + 1
    return out


def dsir_weights(
    target_counts: dict[int, int],
    raw_counts: dict[int, int],
    buckets: int = DSIR_BUCKETS,
) -> list[int]:
    """Milli-quantized add-one-smoothed log importance ratio per bucket:
    floor(1000 * (log p_target(b) - log p_raw(b))). Driver-side Python is
    the single source of truth; both engines consume these integers."""
    t_total = sum(target_counts.values()) + buckets
    r_total = sum(raw_counts.values()) + buckets
    return [
        math.floor(
            (
                math.log((target_counts.get(b, 0) + 1) / t_total)
                - math.log((raw_counts.get(b, 0) + 1) / r_total)
            )
            * 1000
        )
        for b in range(buckets)
    ]


def _avg_clamped() -> Column:
    """floor(score/n_grams) clamped — exact in double (|score| < 2^53)
    and floor-of-division (NOT integer DIV, which truncates toward zero
    for negatives in Spark but floors in DuckDB)."""
    avg = F.when(F.col("n_grams") == 0, F.lit(0)).otherwise(
        F.floor(F.col("score_milli").cast("double") / F.col("n_grams"))
    )
    return F.greatest(
        F.lit(-DSIR_CLAMP_MILLI), F.least(F.lit(DSIR_CLAMP_MILLI), avg)
    ).cast("long")


def dsir_score(
    df: DataFrame,
    weights: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DSIR_NGRAM,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, n_grams, score_milli, avg_milli): exact integer dot of each
    document's bucket counts with the broadcast weight table.
    ``explode_outer`` keeps gram-less documents (short/empty text) in the
    output with score 0."""
    wdf = df.sparkSession.createDataFrame(
        [(b, int(w)) for b, w in enumerate(weights)], "bucket long, wt long"
    )
    ex = df.select(
        F.col(id_col),
        F.explode_outer(ngram_buckets_col(f"coalesce({text_col}, '')", n, buckets)).alias(
            "bucket"
        ),
    )
    scored = (
        ex.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum("wt"), F.lit(0)).alias("score_milli"),
        )
    )
    return scored.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("score_milli").cast("long").alias("score_milli"),
        _avg_clamped().alias("avg_milli"),
    )


def dsir_select(
    df: DataFrame,
    weights: list[int],
    frac_ppm: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DSIR_NGRAM,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Scores plus the deterministic top-``frac_ppm`` selection flag by
    (avg_milli DESC, id) exact rank — the histogram-cutoff machinery of
    ``top_fraction_select`` over the clamped (bounded-domain) average."""
    from .curation import top_fraction_select

    scored = dsir_score(df, weights, id_col, text_col, n, buckets)
    kept = top_fraction_select(
        scored.withColumn("stratum", F.lit("all")),
        frac_ppm=frac_ppm,
        strata_col="stratum",
        id_col=id_col,
        score_col=F.col("avg_milli"),
    ).select(F.col(id_col), F.lit(True).alias("selected"))
    return (
        scored.join(kept, id_col, "left")
        .select(
            id_col,
            "n_grams",
            "score_milli",
            "avg_milli",
            F.coalesce(F.col("selected"), F.lit(False)).alias("selected"),
        )
    )


def sql_dsir_select(
    src: str,
    weights: list[int],
    frac_ppm: int,
    n: int = DSIR_NGRAM,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay: same weight table as VALUES literals, lateral
    generate_series n-gram positions, exact integer dot, floor-division
    average, naive single-window exact rank for the selection."""
    rows = ", ".join(f"({b}, {int(w)})" for b, w in enumerate(weights))
    c = DSIR_CLAMP_MILLI
    return f"""
WITH w AS (SELECT * FROM (VALUES {rows}) AS v(bucket, wt)),
docs AS (SELECT {id_col}, string_split(coalesce({text_col}, ''), ' ') AS ws
         FROM {src}),
gb AS (
  SELECT {id_col},
         ('0x' || substr(md5(array_to_string(ws[i:i+{n - 1}], ' ')), 1, 15))::BIGINT
           % {buckets} AS bucket
  FROM (SELECT {id_col}, ws,
               unnest(generate_series(1, len(ws) - {n} + 1)) AS i
        FROM docs WHERE len(ws) >= {n})
),
sc AS (
  SELECT d.{id_col},
         count(g.bucket)::BIGINT AS n_grams,
         coalesce(sum(w.wt), 0)::BIGINT AS score_milli
  FROM docs d
  LEFT JOIN gb g ON d.{id_col} = g.{id_col}
  LEFT JOIN w ON g.bucket = w.bucket
  GROUP BY d.{id_col}
),
a AS (
  SELECT {id_col}, n_grams, score_milli,
         greatest(-{c}, least({c},
           CASE WHEN n_grams = 0 THEN 0
                ELSE floor(score_milli::DOUBLE / n_grams)::BIGINT
           END))::BIGINT AS avg_milli
  FROM sc
),
r AS (SELECT *, row_number() OVER (ORDER BY avg_milli DESC, {id_col}) AS rn,
             count(*) OVER () AS nn
      FROM a)
SELECT {id_col}, n_grams, score_milli, avg_milli,
       rn <= least(nn, (nn * {frac_ppm} + 999999) // 1000000) AS selected
FROM r
"""
