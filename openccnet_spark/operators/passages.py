"""Passage-level exact deduplication (CCNet-style line dedup).

CCNet and most web-scale corpora dedup at sub-document granularity:
boilerplate paragraphs (nav bars, cookie banners, license headers) repeat
across millions of pages while the surrounding documents differ, so
document-level dedup never catches them. The reference corpus here has no
newlines (space-separated words), so the "paragraph" unit is a fixed
k-word passage: consecutive windows of k words, last window short.

Rule: a passage occurrence survives iff it is the globally FIRST
occurrence of its content, first = smallest (doc_id, passage_idx). Every
later occurrence — including repeats within the same document — is
removed, and each document is rebuilt from its surviving passages in
order. Deterministic at any partitioning.

Plan shape (the 100 TB story):
- passage split is one narrow projection (hoisted-split transform — the
  single-element-array trick from ``dedup.shingles_col``; an inline
  ``split`` inside the lambda would re-split the document per passage);
- occurrences shuffle as (phash, doc_id, pidx) — a 60-bit hash plus two
  longs, never passage text;
- the global winner per hash is a groupBy-min (map-side partial
  aggregation absorbs skew from mega-duplicated boilerplate passages;
  a window over phash would funnel each hot hash into one reducer with
  no combine), then one scalar-only equi-join back;
- reconstruction groups surviving indices per doc (per-doc state is
  bounded by doc length / k) and joins the docs table once on doc_id —
  the only shuffle that carries text, and it carries each doc exactly
  once.

Passage equality is 60-bit-hash equality (cross-engine md5 prefix,
CLAUDE.md hash rule); at 2^60 the collision odds on a 100 TB corpus
(~10^11 passages) are ~10^-5 per corpus, and the DuckDB oracle uses the
identical hash so the contract is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import hash60_expr

#: default passage width in words
PASSAGE_WORDS = 8


def passages_col(text_col, k: int = PASSAGE_WORDS):
    """Array of consecutive k-word passages of ``text_col`` (JVM built-ins).

    ``split('', ' ')`` is ``['']`` in both Spark and DuckDB, so every
    document yields >= 1 passage and the ``sequence(0, n-1)`` upper bound
    is always >= 0 (no descending-sequence guard needed).
    """

    def build(words):
        n_p = F.ceil(F.size(words) / F.lit(k)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_p - 1),
            lambda i: F.array_join(F.slice(words, i * k + 1, k), " "),
        )

    return F.element_at(F.transform(F.array(F.split(text_col, " ")), build), 1)


def passage_occurrences(
    df: DataFrame, k: int = PASSAGE_WORDS, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode to one row per passage occurrence: (id, pidx, ptext, phash)."""
    return df.select(
        F.col(id_col),
        F.posexplode(passages_col(F.coalesce(F.col(text_col), F.lit("")), k)).alias(
            "pidx", "ptext"
        ),
    ).withColumn("phash", hash60_expr("concat('psg:', ptext)"))


def passage_dedup(
    df: DataFrame, k: int = PASSAGE_WORDS, text_col: str = "text", id_col: str = "doc_id",
    persist: bool = False, handles: list | None = None,
) -> DataFrame:
    """Dedup at passage granularity and rebuild each document.

    Output: ``(id_col, n_passages, n_kept, text_dedup)`` — one row per
    input document; ``text_dedup = ''`` when every passage was a repeat.
    """
    occ = passage_occurrences(df, k, text_col, id_col).select(id_col, "pidx", "phash")
    if persist and handles is not None:
        # occ (passage explode + md5 hash per passage) feeds the winners
        # aggregate AND the kept join — persist so it evaluates once;
        # release via the caller's handles (house rule)
        occ = occ.persist()
        handles.append(occ)
    winners = occ.groupBy("phash").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pidx").alias("p"))).alias("w")
    )
    kept = (
        occ.join(winners, "phash")
        .filter((F.col(id_col) == F.col("w.d")) & (F.col("pidx") == F.col("w.p")))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pidx")).alias("kept_idx"))
    )
    psg = passages_col(F.coalesce(F.col(text_col), F.lit("")), k)
    return (
        df.join(kept, id_col, "left")
        .select(
            F.col(id_col),
            F.size(psg).cast("long").alias("n_passages"),
            F.coalesce(F.size("kept_idx"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.col("kept_idx"), lambda i: F.element_at(psg, i + 1)
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("text_dedup"),
        )
    )


def sql_passage_dedup(table: str = "documents", k: int = PASSAGE_WORDS) -> str:
    """DuckDB oracle: naive window form of the same rule.

    ``unnest(generate_series(...))`` in the SELECT list is the correlated
    form DuckDB accepts (lateral ``generate_series`` binder-errors);
    list slices clamp past-the-end like Spark's ``slice``.
    """
    return f"""
WITH d AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS words FROM {table}),
i AS (SELECT doc_id, words,
             unnest(generate_series(1, (len(words) + {k} - 1) // {k})) AS i
      FROM d),
p AS (SELECT doc_id, i - 1 AS pidx,
             array_to_string(words[((i - 1) * {k} + 1):((i - 1) * {k} + {k})], ' ') AS ptext
      FROM i),
h AS (SELECT doc_id, pidx, ptext,
             ('0x' || substr(md5('psg:' || ptext), 1, 15))::BIGINT AS phash
      FROM p),
w AS (SELECT *, row_number() OVER (PARTITION BY phash ORDER BY doc_id, pidx) AS rn
      FROM h)
SELECT doc_id,
       count(*)::BIGINT AS n_passages,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN ptext END, ' ' ORDER BY pidx), '')
           AS text_dedup
FROM w
GROUP BY doc_id
"""


def passage_dedup_py(docs, k: int = PASSAGE_WORDS):
    """Scalar ground truth: the same rule in plain Python (hash-free —
    passage CONTENT equality, so a test failure distinguishes a hash
    mismatch from a rule mismatch). ``docs`` = [(doc_id, text)].
    """
    first: dict[str, tuple[int, int]] = {}
    split_docs = []
    for doc_id, text in sorted(docs):
        words = (text or "").split(" ")
        n_p = (len(words) + k - 1) // k or 1
        ps = [" ".join(words[i * k : (i + 1) * k]) for i in range(n_p)]
        split_docs.append((doc_id, ps))
        for pidx, ptext in enumerate(ps):
            first.setdefault(ptext, (doc_id, pidx))
    out = {}
    for doc_id, ps in split_docs:
        kept = [p for i, p in enumerate(ps) if first[p] == (doc_id, i)]
        out[doc_id] = (len(ps), len(kept), " ".join(kept))
    return out
