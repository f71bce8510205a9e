"""End-to-end quality-filter pipeline over a transcripts DataFrame.

Canonical operator order is the reference CLI's conversion pipeline
(``OpenccNet/ConvertCommand.cs:211-301``): NormalizeCompat -> Convert
rounds -> (DeTofu) — extended per the north_rule with language ID,
perplexity, heuristic rules and PII scrubbing:

    transcripts
      |> salted repartition on hash(conv_id, turn_idx)       # skew defeat
      |> text_converted = convert_udf(config)                # pandas UDF
      |> lang           = langid_udf()                       # pandas UDF
      |> ppl            = ppl_udf()                          # pandas UDF
      |> char/word/symbol metrics                            # JVM built-ins
      |> drop_reason / keep                                  # JVM CASE chain
      |> text_scrubbed  = regex scrub                        # JVM built-ins

Only the three genuinely dictionary/model-bound operators cross the Arrow
boundary; everything else stays in whole-stage codegen. The salted
repartition spreads the turns of pathologically long conversations across
partitions (rows are per-turn, so hashing (conv_id, turn_idx) is a perfect
salt — no key grouping is needed downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..convert import Converter
from ..functions import convert_udf, langid_udf, ppl_udf
from ..functions.langid import detect_language
from ..functions.ppl import perplexity
from .quality import (
    drop_reason_expr,
    drop_reason_py,
    scrub_col,
    scrub_text,
    with_quality_columns,
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
) -> DataFrame:
    """Apply the full keep/drop + scrub pipeline. Purely columnar; one
    optional shuffle (the salted repartition) and no joins or aggregations
    — embarrassingly parallel by construction, which is what carries the
    N -> 4N scaling-efficiency requirement.
    """
    if salt_partitions:
        df = df.repartition(salt_partitions, F.hash("conv_id", "turn_idx"))
    df = df.withColumn(
        "text_converted",
        convert_udf(config, punct, normalize_compat=normalize,
                    detofu_level=detofu_level, custom=custom)("text"),
    )
    df = df.withColumn("lang", langid_udf()("text_converted"))
    if with_ppl:
        df = df.withColumn("ppl", ppl_udf()("text_converted"))
    df = with_quality_columns(df, "text_converted")
    df = df.withColumn(
        "drop_reason", drop_reason_expr("ppl" if with_ppl else None, "lang")
    )
    df = df.withColumn("keep", F.col("drop_reason") == "none")
    df = df.withColumn("text_scrubbed", scrub_col(F.col("text_converted")))
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
    converted = cc.normalize_compat(text) if normalize else text
    converted = cc.convert(converted, config, punct)
    lang = detect_language(converted)
    ppl = perplexity(converted) if with_ppl else None
    drop = drop_reason_py(converted, ppl, lang)
    return {
        "text_converted": converted,
        "lang": lang,
        "ppl": ppl,
        "drop_reason": drop,
        "keep": drop == "none",
        "text_scrubbed": scrub_text(converted),
    }
