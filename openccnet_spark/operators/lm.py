"""Distributed n-gram LM training + corpus fluency scoring (CCNet shape).

CCNet (Wenzek et al. 2020) filters web corpora by training a language
model on trusted in-domain text (Wikipedia), scoring every corpus
document with it, and keeping documents by score bucket (head / middle /
tail per language). This module is that pipeline made Spark-native and
bit-deterministic:

* **Training** (``lm_train``) is pure distributed counting: word bigram
  and unigram counts over the trusted subset (groupBy with map-side
  partial aggregation — integer sums are order-free, so the model is
  identical at any partitioning). The smoothing is **stupid backoff**
  (Brants et al. 2007, "Large Language Models in Machine Translation"):
  ``S(b|a) = c(ab)/c(a)`` when the bigram was seen, else
  ``0.4 * c(b)/total`` — the published at-scale alternative to
  Kneser-Ney, chosen exactly because it needs nothing beyond count
  ratios (KenLM-style KN smoothing needs multiple dependency passes).
* **Quantization**: every score is a parts-per-million integer computed
  with integer division (``(c(ab) * 1e6) DIV c(a)``), so the Spark plan,
  the DuckDB oracle and scalar Python agree bit-for-bit — no float
  crosses an engine boundary (CLAUDE.md float discipline). The ``cnt *
  1e6`` numerator is ALWAYS computed in DECIMAL(38,0) (``ppm_div_sql``):
  int64 overflows past ~9.2e12 counts — which real web-corpus unigram
  totals exceed (under ANSI the job would fail outright) — and the
  decimal cost lands only on model-table-sized rows (distinct n-grams),
  never the corpus explode. Truncation parity with the int64 ``DIV`` is
  pinned in tests, so small-scale oracles are unchanged.
* **Scoring** (``lm_score``): the corpus explodes to bigrams (one
  hoisted split), LEFT-joins the two model tables on bounded-length
  token keys (bigram ppm, then unigram backoff ppm for misses — OOV
  scores 0), and aggregates ``mean token ppm`` per document with a
  map-side-combinable sum. Two equi-joins + one groupBy; the model side
  is broadcast when small (AQE decides), the corpus never collects.
* **Bucketing** (``ccnet_buckets``): head = top 10%, middle = next 30%,
  tail = rest, per language — composed from TWO calls of the exact-rank
  ``curation.top_fraction_select`` decomposition (histogram cutoff +
  tie-group-only window), so bucket assignment inherits its
  any-partitioning exactness.

The score is the **mean quantized token probability**, a monotone
fluency statistic fit for gating — deliberately NOT exp/log perplexity,
because cross-engine float logs cannot be made bit-exact; the embedded
char-bigram ``functions.ppl`` keeps serving the in-UDF perplexity rule.

No counterpart in the reference repo (laisuk/OpenccNet); this serves
the LLM-pipeline brief as a sibling of ``curation.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "words_col",
    "bigram_frame",
    "trigram_frame",
    "ppm_div_sql",
    "lm_train",
    "lm_train3",
    "lm_score",
    "lm_score3",
    "ccnet_buckets",
    "BACKOFF_NUM",
    "BACKOFF_DEN",
    "PPM",
]

PPM = 1_000_000
# stupid backoff alpha = 0.4 = BACKOFF_NUM / BACKOFF_DEN, kept as an
# integer ratio so the backoff score is one exact integer division
BACKOFF_NUM = 2
BACKOFF_DEN = 5

HEAD_PPM = 100_000  # CCNet head = top 10% per language
HEAD_MID_PPM = 400_000  # head + middle = top 40%


def ppm_div_sql(cnt: str, den: str, num_factor: int = 1) -> str:
    """``(num_factor * cnt * 1e6) DIV den`` with the numerator widened to
    DECIMAL(38,0): int64 overflows past cnt ~9.2e12 (a real web-corpus
    unigram count — ANSI mode fails the job there), and decimal ``DIV``
    truncates identically to the int64 path (pinned in tests). The
    quotient is <= 1e6 by construction, so the BIGINT narrowing is safe.
    """
    num = f"CAST({cnt} AS DECIMAL(38,0))"
    if num_factor != 1:
        num = f"{num_factor} * {num}"
    return f"CAST({num} * {PPM} DIV ({den}) AS BIGINT)"


def words_col(text_col: str) -> Column:
    """Space-tokenized words, empty tokens dropped (both engines agree:
    Spark split + filter == DuckDB string_split + list_filter)."""
    return F.filter(
        F.split(F.col(text_col), " "), lambda w: w != F.lit("")
    )


def bigram_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple = (),
) -> DataFrame:
    """``(id, *carry, a, b)`` — one row per adjacent word pair, docs with
    < 2 words contribute nothing. The split is bound once as a column, so
    the per-pair lambda touches a materialized array (no re-split; the
    no-CSE-in-lambdas trap only bites expressions inlined in the body).
    ``sequence(1, k)`` is guarded by the size >= 2 filter (k >= 1)."""
    carry = [F.col(c) for c in carry_cols]
    t = df.select(
        F.col(id_col), *carry, words_col(text_col).alias("ws")
    ).filter(F.size("ws") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.struct(
            F.element_at(F.col("ws"), i).alias("a"),
            F.element_at(F.col("ws"), i + 1).alias("b"),
        ),
    )
    return t.select(
        F.col(id_col), *carry, F.explode(pairs).alias("p")
    ).select(
        id_col, *carry_cols, F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )


def lm_train(
    trusted: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the stupid-backoff model on the trusted corpus.

    Returns ``(bigram_ppm, backoff_ppm)``:
    ``bigram_ppm([stratum,] a, b, ppm)`` with
    ``ppm = (c(ab) * 1e6) DIV c(a)`` and
    ``backoff_ppm([stratum,] b, ppm)`` with
    ``ppm = (2 * c(b) * 1e6) DIV (5 * total)``.

    With ``strata_col`` (CCNet trains ONE LM PER LANGUAGE) every count,
    total and score key carries the stratum, and the per-stratum totals
    stay a distributed frame (no driver scalar). Either way: count
    aggregations plus broadcast-friendly joins — all integer, all
    order-free, so the model is bit-identical at any partitioning.
    ``c(a) >= c(ab)`` by construction (the prefix occurs wherever the
    pair does), so the division is always defined.
    """
    bigram_ppm, backoff_ppm, _ = _train_tables(
        trusted, text_col, id_col, strata_col
    )
    return bigram_ppm, backoff_ppm


def _train_tables(
    trusted: DataFrame,
    text_col: str,
    id_col: str,
    strata_col: str | None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``(bigram_ppm, backoff_ppm, bigram_counts)`` — the third frame is
    the raw ``(a, b, cnt_ab)`` aggregate so ``lm_train3`` can reuse it as
    the trigram denominator: the subtree is then IDENTICAL in the
    combined scoring plan, so Spark's exchange reuse materializes the
    bigram count shuffle once instead of recounting the corpus."""
    keys = [strata_col] if strata_col else []
    bg = bigram_frame(trusted, text_col, id_col, carry_cols=tuple(keys))
    bigrams = bg.groupBy(*keys, "a", "b").agg(
        F.count(F.lit(1)).alias("cnt_ab")
    )
    uni = (
        trusted.select(
            *[F.col(k) for k in keys],
            F.explode(words_col(text_col)).alias("a"),
        )
        .groupBy(*keys, "a")
        .agg(F.count(F.lit(1)).alias("cnt_a"))
    )
    bigram_ppm = bigrams.join(uni, [*keys, "a"]).select(
        *keys,
        "a",
        "b",
        F.expr(ppm_div_sql("cnt_ab", "cnt_a")).alias("ppm"),
    )
    if strata_col:
        totals = uni.groupBy(strata_col).agg(F.sum("cnt_a").alias("t"))
        backoff_ppm = uni.join(totals, strata_col).select(
            strata_col,
            F.col("a").alias("b"),
            F.expr(
                ppm_div_sql("cnt_a", f"{BACKOFF_DEN} * t", BACKOFF_NUM)
            ).alias("ppm"),
        )
        return bigram_ppm, backoff_ppm, bigrams
    total = uni.agg(F.sum("cnt_a").alias("t")).first()["t"] or 0
    if total == 0:
        raise ValueError("lm_train: trusted corpus has no tokens")
    backoff_ppm = uni.select(
        F.col("a").alias("b"),
        F.expr(
            ppm_div_sql("cnt_a", f"{BACKOFF_DEN} * {int(total)}", BACKOFF_NUM)
        ).alias("ppm"),
    )
    return bigram_ppm, backoff_ppm, bigrams


def lm_score(
    docs: DataFrame,
    bigram_ppm: DataFrame,
    backoff_ppm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str | None = None,
) -> DataFrame:
    """Per-document fluency: ``(id, [stratum,] n_bigrams, score_ppm)``
    where ``score_ppm`` is the integer mean of per-token ppm scores
    (seen bigram -> its ppm; unseen -> unigram backoff ppm; OOV -> 0).
    With ``strata_col``, each document is scored against ITS stratum's
    model (the join keys carry the stratum). Documents with < 2 words
    have no bigrams and are not emitted.
    """
    keys = [strata_col] if strata_col else []
    bg = bigram_frame(docs, text_col, id_col, carry_cols=tuple(keys))
    scored = (
        bg.join(
            bigram_ppm.withColumnRenamed("ppm", "bg_ppm"),
            [*keys, "a", "b"],
            "left",
        )
        .join(
            backoff_ppm.withColumnRenamed("ppm", "bo_ppm"),
            [*keys, "b"],
            "left",
        )
        .select(
            F.col(id_col),
            *[F.col(k) for k in keys],
            F.coalesce("bg_ppm", "bo_ppm", F.lit(0)).alias("tok_ppm"),
        )
    )
    return scored.groupBy(id_col, *keys).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("sum(tok_ppm) DIV count(1)").alias("score_ppm"),
    )


def trigram_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, a, b, c)`` — one row per adjacent word triple (docs with
    < 3 words contribute nothing); same hoisted-split discipline as
    ``bigram_frame``."""
    t = df.select(F.col(id_col), words_col(text_col).alias("ws")).filter(
        F.size("ws") >= 3
    )
    triples = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 2),
        lambda i: F.struct(
            F.element_at(F.col("ws"), i).alias("a"),
            F.element_at(F.col("ws"), i + 1).alias("b"),
            F.element_at(F.col("ws"), i + 2).alias("c"),
        ),
    )
    return t.select(F.col(id_col), F.explode(triples).alias("p")).select(
        id_col,
        F.col("p.a").alias("a"),
        F.col("p.b").alias("b"),
        F.col("p.c").alias("c"),
    )


def lm_train3(
    trusted: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Trigram-order stupid backoff (the production order): adds
    ``trigram_ppm(a, b, c, ppm)`` with
    ``ppm = (c(abc) * 1e6) DIV c(ab)`` on top of the bigram model.
    The denominator is the raw bigram COUNT (the prefix occurs wherever
    the triple does, so the division is always defined); the bigram and
    unigram-backoff tables are ``lm_train``'s, unchanged. The
    denominator frame IS ``lm_train``'s internal count aggregate (not a
    recount): in the combined scoring plan the two consumers share one
    identical subtree, so exchange reuse runs the bigram count shuffle
    once per corpus pass.
    """
    bigram_ppm, backoff_ppm, bg_counts = _train_tables(
        trusted, text_col, id_col, None
    )
    tg = trigram_frame(trusted, text_col, id_col)
    trigrams = tg.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("cnt_abc")
    )
    trigram_ppm = trigrams.join(bg_counts, ["a", "b"]).select(
        "a",
        "b",
        "c",
        F.expr(ppm_div_sql("cnt_abc", "cnt_ab")).alias("ppm"),
    )
    return trigram_ppm, bigram_ppm, backoff_ppm


def lm_score3(
    docs: DataFrame,
    trigram_ppm: DataFrame,
    bigram_ppm: DataFrame,
    backoff_ppm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Trigram-order fluency: each token after the second is scored
    ``S(c|ab) = trigram ppm`` if seen, else ``(2 * S(c|b)) DIV 5``
    (stupid backoff's alpha = 0.4 as an exact integer step, recursing
    into the bigram score ``coalesce(bigram ppm, unigram backoff, 0)``);
    the document's FIRST bigram — which has no trigram context — is
    scored at bigram order. ``n_bigrams`` counts all scored transitions
    (len - 1), matching ``lm_score``'s row domain exactly.

    Plan: two narrow explodes (triples + one first-pair row per doc),
    three LEFT equi-joins on bounded token keys, one union, one
    map-side-combinable integer-mean aggregate.
    """
    bgp = bigram_ppm.withColumnRenamed("ppm", "bg_ppm")
    bop = backoff_ppm.withColumnRenamed("ppm", "bo_ppm")
    # first transition of each doc: bigram-order score
    first = (
        docs.select(F.col(id_col), words_col(text_col).alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.col(id_col),
            F.element_at("ws", 1).alias("a"),
            F.element_at("ws", 2).alias("b"),
        )
        .join(bgp, ["a", "b"], "left")
        .join(bop, ["b"], "left")
        .select(
            F.col(id_col),
            F.coalesce("bg_ppm", "bo_ppm", F.lit(0)).alias("tok_ppm"),
        )
    )
    # remaining transitions: trigram with exact-integer backoff
    tri = (
        trigram_frame(docs, text_col, id_col)
        .join(trigram_ppm.withColumnRenamed("ppm", "tri_ppm"), ["a", "b", "c"], "left")
        # bigram context for the fallback is (b, c); rename b->c BEFORE
        # a->b (the reverse order would alias two columns to "b")
        .join(
            bgp.withColumnRenamed("b", "c").withColumnRenamed("a", "b"),
            ["b", "c"],
            "left",
        )
        .join(bop.withColumnRenamed("b", "c"), ["c"], "left")
        .select(
            F.col(id_col),
            F.coalesce(
                "tri_ppm",
                F.expr(
                    f"({BACKOFF_NUM} * coalesce(bg_ppm, bo_ppm, 0))"
                    f" DIV {BACKOFF_DEN}"
                ),
            ).alias("tok_ppm"),
        )
    )
    return (
        first.unionByName(tri)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(tok_ppm) DIV count(1)").alias("score_ppm"),
        )
    )


def ccnet_buckets(
    scores: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    score_col: str = "score_ppm",
) -> DataFrame:
    """CCNet head/middle/tail per stratum: rank by (score DESC, id ASC),
    head = rank <= ceil(10% of n), middle = rank <= ceil(40% of n) and
    not head, tail = rest — quotas in pure integer arithmetic, via two
    ``top_fraction_select`` decompositions (each: bounded histogram
    cutoff + broadcast join + tie-group-only window), then two id-keyed
    equi-joins to tag. Emits ``(id, stratum, score, bucket)``.

    Scale note: ``score_ppm`` spans up to 1e6 distinct values per
    stratum, so the cutoff histogram here is "distinct scores per
    stratum" rows — wider than the <= 1001-row bound the milli-scale
    quality scores give ``top_fraction_select``, but still a per-stratum
    aggregate (1e6 rows x n_strata worst case), orders below the corpus.
    If that ever dominates, pre-bucket the cutoff pass (``score_ppm DIV
    1000``) and keep the exact window only on the boundary bucket."""
    from .curation import top_fraction_select

    head = top_fraction_select(
        scores, HEAD_PPM, strata_col, id_col, score_col=F.col(score_col)
    ).select(F.col(id_col), F.lit(1).alias("in_head"))
    head_mid = top_fraction_select(
        scores, HEAD_MID_PPM, strata_col, id_col, score_col=F.col(score_col)
    ).select(F.col(id_col), F.lit(1).alias("in_hm"))
    return (
        scores.join(head, id_col, "left")
        .join(head_mid, id_col, "left")
        .select(
            F.col(id_col),
            F.col(strata_col),
            F.col(score_col),
            F.when(F.col("in_head").isNotNull(), F.lit("head"))
            .when(F.col("in_hm").isNotNull(), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
