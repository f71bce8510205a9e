"""Count-min sketch heavy hitters — the brief's "novel sketch" operator.

A count-min sketch answers "how often does X occur?" with bounded
memory: d hash rows × w counters, estimate = min over rows, guaranteed
>= the true count (collisions only ADD). The Spark mapping keeps every
step an aggregation:

- **Ingest is weight-compressed.** Words pre-aggregate to (word, count)
  first (map-side combine), so the sketch ingests each DISTINCT word
  once with its weight — identical counters, far fewer rows.
- **The counter table is domain-bounded.** Fan each distinct word to
  its d (row, bucket) cells and groupBy-sum: the shuffle key domain is
  d*w cells (4096 here) regardless of corpus size, so the second
  aggregation is a fixed-size combine no matter how many TB went in.
  Sketch merging across corpora = the same elementwise sum
  (associative — this IS the distributed-friendliness of the sketch).
- **Point queries broadcast the sketch.** d*w rows join candidates
  broadcast-side; estimates are min-over-d.

Hashes are the repo's cross-engine 60-bit md5 family (CLAUDE.md), so a
DuckDB oracle rebuilds the identical counters and estimates — and the
CMS overestimate guarantee (est >= exact) is asserted per row in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import hash60_expr

#: sketch geometry — d hash rows x w buckets (bounded memory: d*w cells)
CMS_D = 4
CMS_W = 1024


def _bucket_expr(word_sql: str, r: int):
    """Row-r bucket of a word: 60-bit md5 hash mod w (integer arithmetic
    end to end; the 'cms{r}:' prefix makes the d rows independent)."""
    return hash60_expr(f"concat('cms{r}:', {word_sql})") % CMS_W


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c) distinct-word weights — the weight-compressed ingest."""
    return (
        df.select(
            F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_build(freqs: DataFrame) -> DataFrame:
    """Counter table (r, bucket, cnt): d*w-bounded groupBy-sum."""
    cells = freqs.select(
        F.posexplode(
            F.array(*[_bucket_expr("w", r) for r in range(CMS_D)])
        ).alias("r", "bucket"),
        "c",
    )
    return cells.groupBy("r", "bucket").agg(F.sum("c").alias("cnt"))


def cms_estimate(counters: DataFrame, candidates: DataFrame) -> DataFrame:
    """min-over-d point estimates for candidate words (column ``w``).
    The counter table is d*w rows — always the broadcast side."""
    cand_cells = candidates.select(
        "*",
        F.posexplode(
            F.array(*[_bucket_expr("w", r) for r in range(CMS_D)])
        ).alias("r", "bucket"),
    )
    joined = cand_cells.join(F.broadcast(counters), ["r", "bucket"])
    keys = [c for c in candidates.columns]
    return joined.groupBy(*keys).agg(F.min("cnt").alias("est_count"))


def heavy_hitters(df: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Exact top-k words with their CMS estimates side by side:
    (word, exact_count, est_count), est_count >= exact_count always."""
    freqs = word_frequencies(df, text_col)
    counters = cms_build(freqs)
    top = freqs.orderBy(F.desc("c"), F.asc("w")).limit(k)
    est = cms_estimate(counters, top)
    return est.select(
        F.col("w").alias("word"),
        F.col("c").cast("long").alias("exact_count"),
        F.col("est_count").cast("long").alias("est_count"),
    )


def sql_heavy_hitters(k: int = 50, table: str = "documents") -> str:
    """DuckDB oracle: identical hash family, counters and min-over-d."""
    return f"""
WITH words AS (
  SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w FROM {table}
), wc AS (
  SELECT w, count(*)::BIGINT AS c FROM words WHERE w <> '' GROUP BY w
), cells AS (
  SELECT r, ('0x' || substr(md5('cms' || r || ':' || w), 1, 15))::BIGINT
             % {CMS_W} AS bucket, c, w
  FROM wc, (VALUES ('0'), ('1'), ('2'), ('3')) rr(r)
), counters AS (
  SELECT r, bucket, sum(c)::BIGINT AS cnt FROM cells GROUP BY r, bucket
), top AS (
  SELECT w, c FROM wc ORDER BY c DESC, w LIMIT {k}
)
SELECT t.w AS word, t.c AS exact_count, min(ct.cnt)::BIGINT AS est_count
FROM top t
JOIN cells ce ON ce.w = t.w
JOIN counters ct ON ct.r = ce.r AND ct.bucket = ce.bucket
GROUP BY t.w, t.c
"""
