"""Text analysis operators: token counting, quality scoring, fingerprints.

All JVM built-ins (regexp/array/aggregate expressions) — zero Python in
these paths, so they ride whole-stage codegen and scale linearly with cores.
Patterns use only explicit character classes so the DuckDB oracle can run
the byte-identical regex (RE2 vs Java regex agreement).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .quality import HAN_CLASS, SYMBOL_RE

#: BPE-ish token pattern: letter runs, digit runs, single Han chars,
#: any other non-space symbol — one match per token.
TOKEN_RE = f"[A-Za-z]+|[0-9]+|[{HAN_CLASS}]|[^A-Za-z0-9 \t\n\r]"


def whitespace_token_count(col: Column) -> Column:
    """Tokens by single-space split (matches `len(text.split(' '))`)."""
    return F.size(F.split(col, " "))


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count via the portable TOKEN_RE."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), F.lit(0)))


def sql_regex_token_count(t: str) -> str:
    return f"len(regexp_extract_all({t}, '{TOKEN_RE}'))"


def quality_score_milli(col: Column) -> Column:
    """Composite quality score in [0, 1000]: rewards moderate length and
    lexical diversity, penalizes symbol density. Deterministic integer
    output (floored milli units)."""
    n = F.length(col)
    words = F.split(col, " ")
    uniq = F.size(F.array_distinct(words)) / F.greatest(F.size(words), F.lit(1))
    # SYMBOL_RE is quality.py's single source of truth for the symbol
    # class — the quality gate, its oracle, and this score must never
    # diverge on what counts as a symbol
    symbols = (n - F.length(F.regexp_replace(col, SYMBOL_RE, ""))) / F.greatest(n, F.lit(1))
    length_term = F.least(n.cast("double") / 200.0, F.lit(1.0))
    score = (0.4 * length_term + 0.4 * uniq + 0.2 * (1.0 - symbols))
    return F.floor(score * 1000).cast("long")


def sql_quality_score_milli(t: str) -> str:
    # same SYMBOL_RE constant as the Spark side (literal characters — the
    # RE2-literal-chars rule for patterns shared with DuckDB oracles)
    sym = (
        f"(length({t}) - length(regexp_replace({t}, '{SYMBOL_RE}', '', 'g')))"
        f" / greatest(length({t}), 1)::DOUBLE"
    )
    uniq = (
        f"len(list_distinct(string_split({t}, ' ')))::DOUBLE"
        f" / greatest(len(string_split({t}, ' ')), 1)"
    )
    return (
        f"floor((0.4 * least(length({t})::DOUBLE / 200.0, 1.0)"
        f" + 0.4 * {uniq} + 0.2 * (1.0 - {sym})) * 1000)::BIGINT"
    )


#: chunk width for the fingerprint fold — bounds per-row temporary arrays
FP_CHUNK = 1024


def fingerprint64(col: Column) -> Column:
    """Rolling polynomial hash over the text's code points (document
    fingerprint): h = (h * 31 + codepoint) mod 2^31-1, left fold.

    Uses only integer arithmetic on ``ascii()`` of each character so the
    fold is engine-portable (both Spark and DuckDB ``ascii`` return the
    code point of the first character).

    CHUNKED for scale: the outer fold walks ``ceil(n / FP_CHUNK)`` chunk
    indices and the inner fold splits only one FP_CHUNK-char substring at
    a time, so a 100 KB document materializes a ~100-int array plus one
    1024-element char array — never a whole-document single-char-string
    array. The rolling hash is sequential, so chunking is exact: the inner
    fold of chunk i+1 continues from chunk i's accumulator.
    """
    n = F.length(col)
    # NB: sequence(0, -1) is DESCENDING [0, -1] — guard the empty string
    chunk_ids = F.when(
        n > 0, F.sequence(F.lit(0), F.ceil(n / F.lit(FP_CHUNK)).cast("int") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.aggregate(
        chunk_ids,
        F.lit(0).cast("long"),
        lambda acc, ci: F.aggregate(
            F.split(F.substring(col, ci * FP_CHUNK + 1, F.lit(FP_CHUNK)), ""),
            acc,
            lambda a, c: (a * 31 + F.ascii(c)) % 2147483647,
        ),
    )


def sql_fingerprint64(t: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split_regex({t}, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, c) -> (acc * 31 + c) % 2147483647)"
    )


def quality_quantiles_frame(docs):
    """Exact per-language quality-score percentiles (p50/p90/p99) from a
    (lang, text) frame via the window-free bounded-domain histogram plan
    (see `__spark_entry__._q_quality_quantiles` for the full rationale):
    groupBy(lang, q).count() map-side combines to <= 1001 rows per
    language, a second groupBy collects each language's sorted (q, cnt)
    array, and a linear JVM fold reads off q-at-rank-ceil(p*n). Shared by
    the driver query and the bench A/B so they always measure the same
    plan."""
    q = quality_score_milli(F.coalesce(F.col("text"), F.lit("")))
    hist = (
        docs.select("lang", q.alias("q"))
        .groupBy("lang", "q")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_lang = hist.groupBy("lang").agg(
        F.sort_array(F.collect_list(F.struct("q", "cnt"))).alias("h"),
        F.sum("cnt").alias("n"),
    )
    targets = {
        "p50": F.ceil(F.lit(0.5) * F.col("n")),
        "p90": F.ceil(F.lit(0.9) * F.col("n")),
        "p99": F.ceil(F.lit(0.99) * F.col("n")),
    }
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        *[F.lit(None).cast("long").alias(k) for k in targets],
    )

    def step(acc, x):
        cum = acc["cum"] + x["cnt"]
        return F.struct(
            cum.alias("cum"),
            *[
                F.coalesce(acc[k], F.when(cum >= t, x["q"])).alias(k)
                for k, t in targets.items()
            ],
        )

    res = F.aggregate(F.col("h"), zero, step)
    return per_lang.select("lang", *[res[k].alias(f"{k}_milli") for k in targets])
