"""URL-level corpus curation: canonicalization, URL dedup, domain gating.

Stage 1 of every web-scale corpus pipeline (C4, RefinedWeb, FineWeb):
before any text-level quality work runs, raw crawl URLs are
canonicalized (fragment/scheme/``www.`` stripped, host lowercased,
tracking params dropped, surviving params sorted, trailing slashes
trimmed), deduplicated at the URL level (the same page is fetched many
times under different messy spellings), and gated against a domain
blocklist with *suffix* semantics — blocking ``d7.example.com`` must
also block ``cdn.d7.example.com``.

The reference repo (laisuk/OpenccNet) has no counterpart; this module
serves the LLM-pipeline brief as a sibling of ``curation.py`` /
``dedup.py``.

Scale shape (the 100 TB story):

* canonicalization is pure JVM string expressions — no UDF, no shuffle,
  the whole transform stays inside whole-stage codegen;
* URL dedup shuffles a bounded-length canonical-URL key (tens of bytes)
  with map-side partial aggregation — the classic exact-dedup plan;
* domain gating expands each host into its <= label-count dot-suffixes
  and tests them against the broadcast-sized blocklist as a LITERAL
  ARRAY overlap (``arrays_overlap``) — a narrow expression, zero joins,
  zero shuffles; the corpus side is never nested-loop LIKE-scanned;
* the keep/drop decision needs exactly ONE shuffle (the window over the
  canonical URL that elects the surviving fetch).

Every transform has a DuckDB twin (``sql_*``) built from the SAME
pattern constants, so the driver oracle replays the full decision.
Regex constants use literal characters only (no ``\\uXXXX`` escapes —
DuckDB's RE2 silently matches nothing for those, see CLAUDE.md), and
backslash escapes that mean the same thing to Java regex and RE2.
"""

from __future__ import annotations

from typing import Iterable, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAM_RE",
    "host_col",
    "canonical_url_col",
    "host_suffixes_col",
    "synth_url_col",
    "url_dedup",
    "domain_gate",
    "sql_host",
    "sql_canonical_url",
    "sql_host_suffixes",
    "sql_synth_url",
]

# Shared verbatim between Spark (Java regex) and DuckDB (RE2): anchored,
# literal-character classes only.
TRACKING_PARAM_RE = "^(utm_|fbclid=|gclid=|ref=)"
_SCHEME_RE = "^https?://"
_WWW_RE = r"^www\."
_TRAILING_SLASH_RE = "/+$"

ColOrName = Union[str, Column]


def _col(c: ColOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ------------------------------------------------------------ Spark side


def _rest(u: Column) -> Column:
    """URL minus fragment and scheme: ``host[/path][?query]``."""
    return F.regexp_replace(
        F.split_part(u, F.lit("#"), F.lit(1)), _SCHEME_RE, ""
    )


def _hostfull(rest: Column) -> Column:
    """Raw authority: everything before the first ``/`` (or ``?``)."""
    return F.split_part(
        F.split_part(rest, F.lit("?"), F.lit(1)), F.lit("/"), F.lit(1)
    )


def host_col(url: ColOrName) -> Column:
    """Normalized host: lowercased, leading ``www.`` stripped."""
    return F.regexp_replace(F.lower(_hostfull(_rest(_col(url)))), _WWW_RE, "")


def canonical_url_col(url: ColOrName) -> Column:
    """Canonical form: ``host`` + trimmed path + sorted non-tracking params.

    Idempotent by construction (the canonical form has no scheme, no
    fragment, a lowercase ``www.``-free host, no trailing slash, and an
    already-filtered-and-sorted query), so re-canonicalizing an index of
    canonical URLs is a no-op — pytest pins this.

    Scope: the authority is treated as an opaque host token — explicit
    ports (``host:8080``) and userinfo (``user@host``) pass through
    lowercased rather than being stripped; percent-encoding is not
    decoded. Two spellings that differ only there stay distinct, which
    under-merges (never over-merges) — the safe direction for dedup.
    """
    u = _col(url)
    rest = _rest(u)
    hostfull = _hostfull(rest)
    host = F.regexp_replace(F.lower(hostfull), _WWW_RE, "")
    tail = rest.substr(F.length(hostfull) + F.lit(1), F.length(rest))
    path = F.regexp_replace(
        F.split_part(tail, F.lit("?"), F.lit(1)), _TRAILING_SLASH_RE, ""
    )
    query = F.split_part(tail, F.lit("?"), F.lit(2))
    # '&' is a literal in regex, so F.split's regex contract is safe here
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.concat(
        host,
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def host_suffixes_col(host: ColOrName) -> Column:
    """All dot-suffixes of a host: ``a.b.c -> [a.b.c, b.c, c]``.

    The split is hoisted through a one-element ``transform`` binding:
    higher-order lambda bodies get no subexpression elimination, so an
    inline ``split`` would re-split the host once per suffix
    (CLAUDE.md; same trick as ``dedup.shingles_col``). ``sequence(1, k)``
    is safe here: a host always has >= 1 label so k >= 1.
    """
    h = _col(host)
    return F.element_at(
        F.transform(
            F.array(F.split(h, r"\.")),
            lambda ls: F.transform(
                F.sequence(F.lit(1), F.size(ls)),
                lambda i: F.array_join(
                    F.slice(ls, i, F.size(ls) - i + F.lit(1)), "."
                ),
            ),
        ),
        1,
    )


# ------------------------------------------------- deterministic synthesis

# ~PAGE_GROUP consecutive doc_ids fetch the same logical page under
# different messy spellings, spread over N_HOSTS hosts; every 11th page
# is served from a `cdn.` sub-label so the blocklist's suffix semantics
# are actually exercised (blocking d7.example.com must catch
# cdn.d7.example.com).
PAGE_GROUP = 3
N_HOSTS = 50
_CDN_EVERY = 11


def _h60(id_expr: str, dialect: str) -> str:
    """60-bit md5-prefix variant bits — the cross-engine hash family
    (Spark conv(...,16,10) == DuckDB ('0x'||...)::BIGINT, CLAUDE.md)."""
    if dialect == "spark":
        return (
            "CAST(conv(substr(md5(concat('url:', CAST("
            + id_expr
            + " AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
    return f"('0x' || substr(md5('url:' || {id_expr}), 1, 15))::BIGINT"


def sql_synth_url(id_expr: str, dialect: str = "duckdb") -> str:
    """One messy-but-deterministic URL per id, identical in both engines.

    Seven md5-derived bits choose: scheme, ``www.`` prefix, host
    capitalization, trailing slash, ``#top`` fragment, which tracking
    param rides along, and query-param order. The canonical form depends
    only on the page, so docs sharing ``id DIV PAGE_GROUP`` are true
    URL-level duplicates.
    """
    spark = dialect == "spark"
    div = "DIV" if spark else "//"
    vc = "STRING" if spark else "VARCHAR"
    h = _h60(id_expr, dialect)
    page = f"({id_expr} {div} {PAGE_GROUP})"
    host0 = (
        f"(CASE WHEN {page} % {_CDN_EVERY} = 0 THEN 'cdn.' ELSE '' END || "
        f"'d' || CAST({page} % {N_HOSTS} AS {vc}) || '.example.com')"
    )
    hostvar = (
        f"(CASE WHEN ({h} {div} 4) % 2 = 0 THEN {host0} "
        f"ELSE upper(substr({host0}, 1, 1)) || substr({host0}, 2) END)"
    )
    vparam = f"('v=' || CAST({page} % 7 AS {vc}))"
    tparam = (
        f"(CASE WHEN ({h} {div} 32) % 2 = 0 "
        f"THEN 'utm_source=feed' ELSE 'ref=crawler' END)"
    )
    return (
        f"(CASE WHEN {h} % 2 = 0 THEN 'https' ELSE 'http' END || '://' || "
        f"CASE WHEN ({h} {div} 2) % 2 = 0 THEN 'www.' ELSE '' END || "
        f"{hostvar} || '/docs/' || CAST({page} AS {vc}) || "
        f"CASE WHEN ({h} {div} 8) % 2 = 0 THEN '/' ELSE '' END || '?' || "
        f"CASE WHEN ({h} {div} 64) % 2 = 0 THEN {vparam} || '&' || {tparam} "
        f"ELSE {tparam} || '&' || {vparam} END || "
        f"CASE WHEN ({h} {div} 16) % 2 = 0 THEN '#top' ELSE '' END)"
    )


def synth_url_col(id_col: str = "doc_id") -> Column:
    return F.expr(sql_synth_url(id_col, dialect="spark"))


# -------------------------------------------------------------- operators


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL: the surviving fetch + duplicate count.

    Plan: narrow canonicalization (JVM expressions) -> groupBy on the
    bounded-length canonical key with map-side partial min/count. The
    only shuffle carries (canon_url, partial min, partial count).
    """
    return (
        df.select(
            canonical_url_col(url_col).alias("canon_url"), F.col(id_col)
        )
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def domain_gate(
    df: DataFrame,
    blocked_domains: Iterable[str],
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keep/drop with reasons, C4-stage-1 shape.

    ``blocked_domain``: any dot-suffix of the host is blocklisted (the
    blocklist is broadcast-sized by nature, so it rides as a literal
    array in an ``arrays_overlap`` — zero joins). ``dup_url``: a
    duplicate that lost the min-id election within its canonical URL.
    ``keep``: the winner. The host is a prefix of the canonical key, so
    a canonical group is always uniformly blocked or uniformly clean —
    the blocked branch fires before the election ever matters for it.
    """
    blocked_lit = F.array(*[F.lit(d) for d in sorted(set(blocked_domains))])
    base = df.select(
        F.col(id_col),
        host_col(url_col).alias("host"),
        canonical_url_col(url_col).alias("canon_url"),
    ).withColumn(
        "blocked", F.arrays_overlap(host_suffixes_col("host"), blocked_lit)
    )
    w = Window.partitionBy("canon_url")
    keep_id = F.min(F.col(id_col)).over(w)
    return base.select(
        F.col(id_col),
        "host",
        "canon_url",
        F.when(F.col("blocked"), F.lit("blocked_domain"))
        .when(F.col(id_col) == keep_id, F.lit("keep"))
        .otherwise(F.lit("dup_url"))
        .alias("decision"),
    )


# ------------------------------------------------------------ DuckDB twins


def sql_host(url_expr: str) -> str:
    rest = (
        f"regexp_replace(split_part({url_expr}, '#', 1), "
        f"'{_SCHEME_RE}', '')"
    )
    hostfull = f"split_part(split_part({rest}, '?', 1), '/', 1)"
    return f"regexp_replace(lower({hostfull}), '{_WWW_RE}', '')"


def sql_canonical_url(url_expr: str) -> str:
    rest = (
        f"regexp_replace(split_part({url_expr}, '#', 1), "
        f"'{_SCHEME_RE}', '')"
    )
    hostfull = f"split_part(split_part({rest}, '?', 1), '/', 1)"
    host = f"regexp_replace(lower({hostfull}), '{_WWW_RE}', '')"
    tail = f"substr({rest}, length({hostfull}) + 1)"
    path = (
        f"regexp_replace(split_part({tail}, '?', 1), "
        f"'{_TRAILING_SLASH_RE}', '')"
    )
    query = f"split_part({tail}, '?', 2)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    return (
        f"({host} || {path} || CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END)"
    )


def sql_host_suffixes(host_expr: str) -> str:
    """DuckDB list of dot-suffixes of a host expression."""
    labels = f"string_split({host_expr}, '.')"
    return (
        f"list_transform(generate_series(1, len({labels})), "
        f"i -> array_to_string({labels}[i:], '.'))"
    )
