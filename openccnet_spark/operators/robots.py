"""robots.txt gating: longest-match allow/disallow per (host, path).

Crawl compliance is stage 0 of a web pipeline: before a fetched URL's
text enters the corpus, the host's robots rules decide whether the
fetch was permitted at all (retroactive filtering of pre-robots crawls
is standard when rules change). The decision rule is the REP standard
(RFC 9309 §2.2.2, the Googlebot rule): among the host's rules whose
path-prefix matches the URL path, the LONGEST prefix wins; on a length
tie, allow beats disallow; no matching rule (or no rules) = allowed.

Scale shape (the 100 TB story):
- robots rule sets are tiny by nature (a few rules per host), so the
  rules frame pre-aggregates to one (host, array<struct(prefix,allow)>)
  row per host and BROADCASTS — the corpus side never shuffles;
- the longest-match fold is a JVM higher-order ``aggregate`` over the
  per-host rule array (bounded), inside whole-stage codegen;
- the only join is the broadcast host equi-join.

The DuckDB oracle replays the decision RELATIONALLY (rank matching
rules by length desc, allow desc) — a deliberately different
formulation of the same rule, so a fold bug and a rank bug cannot
cancel.

The reference repo (laisuk/OpenccNet) has no counterpart; this extends
the URL-curation family (``operators/urls.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .urls import N_HOSTS, ColOrName, _col, _hostfull, _rest

__all__ = [
    "path_col",
    "robots_gate",
    "sql_path",
    "sql_synth_robots_rules",
    "synth_robots_rules",
]


def path_col(url: ColOrName) -> Column:
    """URL path (leading ``/``, query/fragment stripped, trailing
    slashes trimmed; ``''`` for a bare host)."""
    rest = _rest(_col(url))
    hostfull = _hostfull(rest)
    tail = rest.substr(F.length(hostfull) + F.lit(1), F.length(rest))
    return F.regexp_replace(F.split_part(tail, F.lit("?"), F.lit(1)), "/+$", "")


def sql_path(url_expr: str) -> str:
    """DuckDB twin of ``path_col``."""
    rest = f"regexp_replace(split_part({url_expr}, '#', 1), '^https?://', '')"
    hostfull = f"split_part(split_part({rest}, '?', 1), '/', 1)"
    tail = f"substr({rest}, length({hostfull}) + 1)"
    return f"regexp_replace(split_part({tail}, '?', 1), '/+$', '')"


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    host_col_name: str = "host",
    path_col_name: str = "path",
) -> DataFrame:
    """Append ``robots_allowed`` to ``urls`` (host, path rows).

    ``rules`` = (host, prefix, allow) — one row per rule. The fold
    carries (best_len, allowed): a strictly longer match replaces the
    state; an equal-length ALLOW upgrades it (RFC 9309 tie rule);
    the empty state (-1, true) realizes no-match-is-allowed.
    """
    per_host = rules.groupBy(host_col_name).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("prefix"), F.col("allow")))
        ).alias("rules")
    )
    joined = urls.join(F.broadcast(per_host), host_col_name, "left")
    decided = F.expr(
        f"""
        aggregate(
          filter(coalesce(rules, array()),
                 r -> startswith({path_col_name}, r.prefix)),
          named_struct('best', -1, 'allowed', true),
          (acc, r) -> CASE
            WHEN length(r.prefix) > acc.best
              THEN named_struct('best', length(r.prefix), 'allowed', r.allow)
            WHEN length(r.prefix) = acc.best
              THEN named_struct('best', acc.best, 'allowed', acc.allowed OR r.allow)
            ELSE acc END,
          acc -> acc.allowed
        )
        """
    )
    return joined.select(*urls.columns, decided.alias("robots_allowed"))


# ------------------------------------------------- deterministic synthesis

# Rule families over the urls.py host family (host = [cdn.]d<k>.example.com
# serving paths /docs/<page>): cdn hosts are fully disallowed; every
# non-cdn host k disallows /docs/<k%10> (a prefix that also matches
# /docs/<k%10>3, /docs/<k%10>35, ...) but allows /docs/<k%10>3 back via
# the LONGER prefix — exercising no-match, prefix disallow, and the
# longest-match allow override.


def _rules_rows() -> list[tuple[str, str, bool]]:
    rows: list[tuple[str, str, bool]] = []
    for k in range(N_HOSTS):
        host = f"d{k}.example.com"
        rows.append((host, f"/docs/{k % 10}", False))
        rows.append((host, f"/docs/{k % 10}3", True))
        rows.append((f"cdn.d{k}.example.com", "/", False))
    return sorted(rows)


def synth_robots_rules(spark) -> DataFrame:
    return spark.createDataFrame(
        _rules_rows(), "host string, prefix string, allow boolean"
    )


def sql_synth_robots_rules() -> str:
    """The identical rule rows as a DuckDB VALUES relation."""
    values = ",\n".join(
        f"('{h}', '{p}', {str(a).lower()})" for h, p, a in _rules_rows()
    )
    return f"(SELECT * FROM (VALUES\n{values}\n) AS t(host, prefix, allow))"
