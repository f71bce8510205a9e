"""Exact duplicated-substring deduplication (sliding k-token windows).

Passage dedup (`passages.py`) removes repeats only when they align to
fixed k-word passage boundaries; real boilerplate rarely does. The
standard corpus-level fix (Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL 2022) removes every maximal
substring that occurs more than once in the corpus. The exact
suffix-array construction is a single-machine algorithm; the
distributed re-expression used here (and by most production pipelines)
is its sliding-window form: hash every k-token window with stride 1,
keep the globally FIRST occurrence of each window content, and drop
every token covered by any LATER occurrence of a repeated window. Any
duplicated run of >= k tokens is covered end-to-end by its duplicated
k-grams, so the rule removes exactly the >= k-token repeats (up to
k-1 boundary tokens kept at the run's edges — the same granularity
loss the paper's suffix-array threshold has).

Rule (deterministic at any partitioning):
- window w at (doc_id, pos) is DUPLICATE iff some other occurrence of
  the same k-token content has a smaller (doc_id, pos);
- token position j of a doc is covered iff a duplicate window
  [pos, pos+k-1] of that doc contains j;
- output text keeps the uncovered tokens in order.

Plan shape (the 100 TB story):
- the token array splits ONCE per document (hoisted single-element-array
  transform — the `dedup.shingles_col` trick; an inline split in the
  per-position lambda would re-split the doc per window);
- occurrences shuffle as (ghash, doc_id, pos) — a 60-bit hash plus two
  longs, never window text;
- the global winner per hash is a groupBy-min (map-side partial
  aggregation absorbs mega-duplicated boilerplate skew; a window over
  ghash would funnel each hot hash into one reducer), then one
  scalar-only equi-join back;
- covered positions re-aggregate per doc (state bounded by doc length)
  and join the docs table once on doc_id — the only shuffle that
  carries text carries each doc exactly once;
- reconstruction is a single indexed `filter` over the token array
  (no per-token join, no explode of the kept side).

Window equality is 60-bit-hash equality (cross-engine md5 prefix,
CLAUDE.md hash rule); the DuckDB oracle uses the identical hash so the
contract is exact.

Reference parity note: the reference engine (OpenccNet, C#) has no
corpus-dedup surface at all — this family is part of the training-data
pipeline layer the brief adds on top of reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import hash60_expr

#: default duplicated-window width in tokens
WINDOW_TOKENS = 8


def kgram_occurrences(
    df: DataFrame, k: int = WINDOW_TOKENS, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per sliding k-token window: ``(id, pos, ghash)``; pos is
    1-based. Docs shorter than k tokens yield no rows (the
    ``sequence(1, n-k+1)`` bound is guarded — Spark's ``sequence(1, 0)``
    is DESCENDING).
    """

    def grams(words):
        n = F.size(words)
        idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(words, i, k), " ").alias("gtext"),
            ),
        )

    exploded = df.select(
        F.col(id_col),
        F.explode(
            F.element_at(
                F.transform(
                    F.array(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")), grams
                ),
                1,
            )
        ).alias("g"),
    )
    return exploded.select(
        id_col,
        F.col("g.pos").alias("pos"),
        hash60_expr("concat('sub:', g.gtext)").alias("ghash"),
    )


def substring_dedup(
    df: DataFrame, k: int = WINDOW_TOKENS, text_col: str = "text", id_col: str = "doc_id",
    persist: bool = False, handles: list | None = None,
) -> DataFrame:
    """Remove corpus-duplicated >= k-token substrings from every document.

    Output: ``(id_col, n_tokens, n_dup_positions, text_pruned)`` — one
    row per input document, all columns deterministic.
    """
    occ = kgram_occurrences(df, k, text_col, id_col)
    if persist and handles is not None:
        # occ (window explode + md5 hash per k-gram — the expensive stage)
        # feeds the winners aggregate AND the coverage join — persist so
        # it evaluates once; release via the caller's handles (house rule)
        occ = occ.persist()
        handles.append(occ)
    winners = occ.groupBy("ghash").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("w")
    )
    covered = (
        occ.join(winners, "ghash")
        .filter((F.col(id_col) != F.col("w.d")) | (F.col("pos") != F.col("w.p")))
        .select(id_col, F.explode(F.sequence("pos", F.col("pos") + (k - 1))).alias("j"))
        .groupBy(id_col)
        .agg(F.collect_set("j").alias("cov"))
    )
    words = F.element_at(
        F.transform(
            F.array(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")), lambda w: w
        ),
        1,
    )
    cov = F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    return df.join(covered, id_col, "left").select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_tokens"),
        F.size(cov).cast("long").alias("n_dup_positions"),
        # Spark's indexed filter lambda is 0-based; positions are 1-based
        F.array_join(
            F.filter(words, lambda x, i: ~F.array_contains(cov, (i + 1).cast("int"))),
            " ",
        ).alias("text_pruned"),
    )


def sql_substring_dedup(table: str = "documents", k: int = WINDOW_TOKENS) -> str:
    """DuckDB oracle: the same rule via a row_number window (winner =
    rn 1). ``unnest(generate_series(...))`` in the SELECT list is the
    correlated form DuckDB accepts; ``list_filter``'s two-arg lambda
    index is 1-based (Spark's is 0-based).
    """
    return f"""
WITH d AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM {table}),
g AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {k} + 1)) AS pos
      FROM d WHERE len(ws) >= {k}),
h AS (SELECT doc_id, pos,
             ('0x' || substr(md5('sub:' || array_to_string(ws[pos:pos + {k} - 1], ' ')), 1, 15))::BIGINT AS ghash
      FROM g),
r AS (SELECT doc_id, pos,
             row_number() OVER (PARTITION BY ghash ORDER BY doc_id, pos) AS rn
      FROM h),
c AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + {k} - 1)) AS j
      FROM r WHERE rn > 1),
cov AS (SELECT doc_id, list(j) AS cov FROM c GROUP BY doc_id)
SELECT d.doc_id,
       len(d.ws)::BIGINT AS n_tokens,
       coalesce(len(cov.cov), 0)::BIGINT AS n_dup_positions,
       coalesce(array_to_string(
           list_filter(d.ws, (x, i) -> NOT list_contains(coalesce(cov.cov, []), i)),
           ' '), '') AS text_pruned
FROM d LEFT JOIN cov ON d.doc_id = cov.doc_id
"""


def substring_dedup_py(docs, k: int = WINDOW_TOKENS):
    """Scalar ground truth: the same rule in plain Python (hash-free —
    window CONTENT equality, so a test failure distinguishes a hash
    mismatch from a rule mismatch). ``docs`` = [(doc_id, text)];
    returns {doc_id: (n_tokens, n_dup_positions, text_pruned)}.
    """
    first: dict[str, tuple[int, int]] = {}
    split_docs = []
    for doc_id, text in sorted(docs):
        ws = (text or "").split(" ")
        split_docs.append((doc_id, ws))
        for pos in range(len(ws) - k + 1):
            first.setdefault(" ".join(ws[pos : pos + k]), (doc_id, pos))
    out = {}
    for doc_id, ws in split_docs:
        cov = set()
        for pos in range(len(ws) - k + 1):
            if first[" ".join(ws[pos : pos + k])] != (doc_id, pos):
                cov.update(range(pos, pos + k))
        kept = [w for i, w in enumerate(ws) if i not in cov]
        out[doc_id] = (len(ws), len(cov), " ".join(kept))
    return out
