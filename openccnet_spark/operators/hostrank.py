"""Host-graph PageRank for crawl prioritization (integer, fixed rounds).

Production crawl pipelines (Common Crawl's harmonic-centrality ranks,
C4/RefinedWeb domain weighting) rank HOSTS, not pages: the host graph is
~10^8 nodes where the page graph is ~10^11, so the rank job is a small
side-computation whose output broadcasts into the URL gate. This module
computes a fixed-round power iteration of PageRank with INTEGER
arithmetic so the result is bit-identical at any partitioning and
replayable by the DuckDB oracle:

    rank_0(v)   = SCALE DIV n
    rank_i+1(v) = (SCALE * (100-D)) DIV (100 * n)
                  + SUM over edges u->v of (rank_i(u) * D) DIV (100 * out(u))

with D = damping in percent (85) and SCALE = 10^12. Sums of integers
are order-free (the float-aggregation rule from CLAUDE.md), every DIV
floors in both engines, and dangling mass is deliberately dropped (the
standard sparse simplification; deterministic, documented).

Plan shape (the 100 TB story):
- the edge list joins its out-degree ONCE and persists (surfaced
  through ``handles`` per the house rule) — the per-round cost is then
  one NODE-sized shuffle of the ranks to the edge partitioning plus one
  groupBy(dst) with map-side partial sums, never a re-shuffle of the
  edge list;
- n (node count) is the only driver-side scalar;
- rounds are a fixed small constant (rank stabilizes in O(10) rounds;
  the oracle replays the same constant), so the lineage stays bounded
  without checkpointing.

The reference repo (laisuk/OpenccNet) has no counterpart; this is part
of the URL-curation family (``operators/urls.py``) the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import N_HOSTS, PAGE_GROUP, _CDN_EVERY

__all__ = [
    "RANK_SCALE",
    "DAMPING_PCT",
    "sql_page_host",
    "synth_host_edges",
    "sql_synth_host_edges",
    "host_rank",
]

#: fixed-point scale of the rank values (sum over nodes ~= SCALE)
RANK_SCALE = 10**12
#: damping factor in percent (the classic 0.85)
DAMPING_PCT = 85


def sql_page_host(p_expr: str, dialect: str = "duckdb") -> str:
    """Canonical host serving page ``p`` — the same host family
    ``urls.sql_synth_url`` spreads its URLs over (lowercase form; the
    URL's capitalization/www variants normalize back to this via
    ``urls.host_col``, pinned in pytest)."""
    vc = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"(CASE WHEN ({p_expr}) % {_CDN_EVERY} = 0 THEN 'cdn.' ELSE '' END || "
        f"'d' || CAST(({p_expr}) % {N_HOSTS} AS {vc}) || '.example.com')"
    )


def _edges_sql(id_expr: str, dialect: str) -> tuple[str, str, str]:
    """(page_expr, src_expr, dst pair) building blocks shared by both
    engines: page p links forward to p+1's host (a crawl-order ring) and
    up to p DIV 2's host (a hub funnel, so low-numbered hosts accumulate
    rank and the distribution is non-uniform)."""
    div = "DIV" if dialect == "spark" else "//"
    page = f"(({id_expr}) {div} {PAGE_GROUP})"
    return page, sql_page_host(page, dialect), div


def synth_host_edges(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic host-link graph from the documents table:
    DISTINCT (src, dst) host pairs, self-loops dropped."""
    page, src, div = _edges_sql(id_col, "spark")
    dst_ring = sql_page_host(f"{page} + 1", "spark")
    dst_hub = sql_page_host(f"{page} {div} 2", "spark")
    pages = docs.select(F.expr(src).alias("src"), F.expr(dst_ring).alias("d1"),
                        F.expr(dst_hub).alias("d2"))
    edges = pages.select("src", F.explode(F.array("d1", "d2")).alias("dst"))
    return edges.filter(F.col("src") != F.col("dst")).distinct()


def sql_synth_host_edges(table: str = "documents", id_expr: str = "doc_id") -> str:
    """DuckDB twin of ``synth_host_edges`` (a relation, not a query)."""
    page, src, div = _edges_sql(id_expr, "duckdb")
    dst_ring = sql_page_host(f"{page} + 1", "duckdb")
    dst_hub = sql_page_host(f"{page} {div} 2", "duckdb")
    return f"""(
SELECT DISTINCT src, dst FROM (
  SELECT {src} AS src, {dst_ring} AS dst FROM {table}
  UNION ALL
  SELECT {src} AS src, {dst_hub} AS dst FROM {table}
) WHERE src <> dst)"""


def host_rank(
    edges: DataFrame,
    n_rounds: int = 3,
    damping_pct: int = DAMPING_PCT,
    scale: int = RANK_SCALE,
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Integer PageRank over a distinct (src, dst) edge list.

    Output: ``(host, rank)`` — one row per node, ``rank`` a BIGINT fixed
    at ``scale`` total initial mass. ``persist`` materializes the
    degree-annotated edge list (reused every round) and appends it to
    ``handles`` for the caller to unpersist.
    """
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out"))
    edges_deg = edges.join(deg, "src")
    if persist and handles is not None:
        edges_deg = edges_deg.persist()
        handles.append(edges_deg)
    n = nodes.count()
    base = (scale * (100 - damping_pct)) // (100 * n)
    ranks = nodes.select("host", F.lit(scale // n).cast("long").alias("rank"))
    for _ in range(n_rounds):
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["host"])
            .select(
                F.col("dst"),
                F.expr(f"(rank * {damping_pct}) DIV (100 * out)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, nodes["host"] == contrib["dst"], "left").select(
            "host",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("rank"),
        )
    return ranks


def sql_host_rank(
    edges_rel: str,
    n_rounds: int = 3,
    damping_pct: int = DAMPING_PCT,
    scale: int = RANK_SCALE,
) -> str:
    """DuckDB oracle: the identical integer recursion as chained CTEs.
    DuckDB ``sum(BIGINT)`` widens to HUGEINT (pandas float) — the outer
    ``::BIGINT`` is mandatory (CLAUDE.md)."""
    d = damping_pct
    ctes = [
        f"e AS (SELECT src, dst FROM {edges_rel})",
        "deg AS (SELECT src, count(*)::BIGINT AS out FROM e GROUP BY src)",
        "nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT count(*)::BIGINT AS n FROM nodes)",
        f"r0 AS (SELECT host, ({scale} // n)::BIGINT AS rank FROM nodes, nn)",
    ]
    prev = "r0"
    for i in range(1, n_rounds + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT nodes.host,
         (({scale} * {100 - d}) // (100 * n)
          + coalesce((SELECT sum((p.rank * {d}) // (100 * deg.out))
                      FROM e JOIN {prev} p ON p.host = e.src
                             JOIN deg ON deg.src = e.src
                      WHERE e.dst = nodes.host), 0))::BIGINT AS rank
  FROM nodes, nn)"""
        )
        prev = f"r{i}"
    return "WITH " + ",\n".join(ctes) + f"\nSELECT host, rank FROM {prev}"


def host_rank_py(edges, n_rounds: int = 3, damping_pct: int = DAMPING_PCT,
                 scale: int = RANK_SCALE):
    """Scalar ground truth: the same integer recursion in plain Python.
    ``edges`` = iterable of (src, dst), assumed distinct, no self-loops.
    Returns {host: rank}."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out: dict[str, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    base = (scale * (100 - damping_pct)) // (100 * n)
    ranks = {v: scale // n for v in nodes}
    for _ in range(n_rounds):
        nxt = {v: base for v in nodes}
        for s, dst in edges:
            nxt[dst] += (ranks[s] * damping_pct) // (100 * out[s])
        ranks = nxt
    return ranks
