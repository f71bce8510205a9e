"""End-to-end quality-filter pipeline over a transcripts DataFrame.

Canonical operator order is the reference CLI's conversion pipeline
(``OpenccNet/ConvertCommand.cs:211-301``): NormalizeCompat -> Convert
rounds -> (DeTofu) — extended per the north_rule with language ID,
perplexity, heuristic rules and PII scrubbing:

    transcripts
      |> salted repartition on hash(conv_id, turn_idx)       # skew defeat
      |> pre-gate: raw-length rules                          # JVM CASE chain
      |> (convert + langid + gated ppl
          + char/word/symbol metrics + regex scrub)          # ONE fused Arrow UDF
      |> drop_reason / keep                                  # JVM CASE chain over the struct's metrics

All string-touching work (conversion, langid, ppl, metrics, scrub) rides
the ONE fused Arrow UDF — CPython ``re`` measured ~50x faster than Spark
``regexp_replace`` on this corpus (CLAUDE.md), so the "JVM regex" plan is
the slow one here. The UDF crosses the Arrow boundary ONCE (one Python
worker per task); the keep/drop decision is then pure int/double
arithmetic over the returned struct in whole-stage codegen. The salted repartition spreads the turns
of pathologically long conversations across partitions (rows are per-turn,
so hashing (conv_id, turn_idx) is a perfect salt — no key grouping is
needed downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..convert import Converter
from ..functions import pipeline_struct_udf
from ..functions.langid import detect_language
from ..functions.ppl import perplexity
from .quality import (
    MAX_CHARS,
    MIN_CHARS,
    PPL_MAX,
    REP_MIN_WORDS,
    REP_UNIQUE_RATIO,
    SYMBOL_RATIO,
    post_drop_expr,
    pre_drop_expr,
    quality_metrics,
    scrub_text,
)

#: Output columns added by the pipeline (beyond the input schema).
OUTPUT_COLUMNS = (
    "text_converted", "lang", "ppl", "char_len", "word_cnt", "uniq_ratio",
    "symbol_ratio", "drop_reason", "keep", "text_scrubbed",
)


def quality_filter(
    df: DataFrame,
    config: str = "t2s",
    punct: bool = False,
    with_ppl: bool = True,
    normalize: bool = True,
    detofu_level: int | None = None,
    salt_partitions: int | None = None,
    custom: list | None = None,
    preserve_ids: bool = False,
) -> DataFrame:
    """Apply the full keep/drop + scrub pipeline. Purely columnar; one
    optional shuffle (the salted repartition) and no joins or aggregations
    — embarrassingly parallel by construction, which is what carries the
    N -> 4N scaling-efficiency requirement.
    """
    if salt_partitions:
        df = df.repartition(salt_partitions, F.hash("conv_id", "turn_idx"))
    # Stage 1 — pre-gate on RAW length (JVM-only). Rows failing it carry a
    # NULL into the UDFs, which short-circuit on NULL: the expensive Python
    # work never runs for them. At web scale the too_long rule alone can
    # gate off the bulk of the bytes.
    raw_len = F.length(F.coalesce(F.col("text"), F.lit("")))
    df = df.withColumn("pre_reason", pre_drop_expr(raw_len))
    gated = F.when(F.col("pre_reason").isNull(), F.col("text"))
    # Stage 2 — ONE fused Arrow UDF (convert + langid + gated ppl) on
    # surviving rows: one Python worker per task, one Arrow round-trip.
    fused = pipeline_struct_udf(
        config, punct, normalize_compat=normalize,
        detofu_level=detofu_level, custom=custom, with_ppl=with_ppl,
        preserve_ids=preserve_ids,
    )
    df = df.withColumn("_r", fused(gated))
    for field in ("lang", "ppl", "char_len", "word_cnt", "uniq_ratio", "symbol_ratio"):
        df = df.withColumn(field, F.col(f"_r.{field}"))
    # Reconstitute the NULL-compressed strings (identity results travel as
    # NULL over Arrow): processed rows have char_len set; pre-gated don't.
    processed = F.col("_r.char_len").isNotNull()
    df = df.withColumn(
        "text_converted",
        F.when(processed, F.coalesce(F.col("_r.text_converted"), F.col("text"))),
    )
    df = df.withColumn(
        "text_scrubbed",
        F.when(processed, F.coalesce(F.col("_r.text_scrubbed"), F.col("text_converted"))),
    )
    df = df.drop("_r")
    # Stage 3 — rule CASE chain (JVM; pure int/double arithmetic on the
    # struct's metric columns — no JVM string work in the hot path).
    df = df.withColumn("post_reason", post_drop_expr())
    if with_ppl:
        ppl_reason = F.when(
            (F.col("ppl") > PPL_MAX) & (F.col("lang") == "zh"), "high_ppl"
        )
    else:
        df = df.drop("ppl")
        ppl_reason = F.lit(None).cast("string")
    df = df.withColumn(
        "drop_reason",
        F.coalesce(F.col("pre_reason"), F.col("post_reason"), ppl_reason, F.lit("none")),
    ).drop("pre_reason", "post_reason")
    df = df.withColumn("keep", F.col("drop_reason") == "none")
    return df


def reference_label(
    text: str,
    config: str = "t2s",
    punct: bool = False,
    with_ppl: bool = True,
    normalize: bool = True,
    converter: Converter | None = None,
) -> dict:
    """Pure-Python reference path for ONE turn — the labels the Spark job
    must reproduce (F1 >= 0.99 and byte-exact text per BASELINE). Used by
    tests and to compute the DuckDB-oracle literals in __spark_entry__.
    """
    cc = converter or Converter()
    raw = text or ""
    # stage 1: raw-length pre-gate (conversion skipped for dropped rows)
    if len(raw) < MIN_CHARS or len(raw) > MAX_CHARS:
        reason = "too_short" if len(raw) < MIN_CHARS else "too_long"
        return {
            "text_converted": None, "lang": None, "ppl": None,
            "drop_reason": reason, "keep": False, "text_scrubbed": None,
        }
    converted = cc.normalize_compat(raw) if normalize else raw
    converted = cc.convert(converted, config, punct)
    lang = detect_language(converted)
    # stage 3: heuristic rules on converted text
    m = quality_metrics(converted)
    if m["word_cnt"] >= REP_MIN_WORDS and m["uniq_ratio"] < REP_UNIQUE_RATIO:
        reason = "repetitive"
    elif m["symbol_ratio"] > SYMBOL_RATIO:
        reason = "symbol_dense"
    else:
        reason = None
    # stage 4: perplexity only for rows still alive
    ppl = None
    if reason is None and with_ppl:
        ppl = perplexity(converted)
        if ppl > PPL_MAX and lang == "zh":
            reason = "high_ppl"
    drop = reason or "none"
    return {
        "text_converted": converted,
        "lang": lang,
        "ppl": ppl,
        "drop_reason": drop,
        "keep": drop == "none",
        "text_scrubbed": scrub_text(converted),
    }
