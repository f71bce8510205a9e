"""robots.txt gate: RFC 9309 longest-match semantics, tie rules, edge
cases, the broadcast/zero-corpus-shuffle plan, and DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pandas as pd

from openccnet_spark.operators.robots import path_col, robots_gate


def _gate(spark, urls, rules):
    udf = spark.createDataFrame(urls, "doc_id long, host string, path string")
    rdf = spark.createDataFrame(rules, "host string, prefix string, allow boolean")
    return {
        r["doc_id"]: r["robots_allowed"] for r in robots_gate(udf, rdf).collect()
    }


def test_longest_match_and_tie_rules(spark):
    rules = [
        ("h", "/docs", False),
        ("h", "/docs/pub", True),
        ("h", "/a", False),
        ("h", "/a", True),  # length tie: allow wins
    ]
    urls = [
        (1, "h", "/docs/secret"),  # /docs disallow
        (2, "h", "/docs/public"),  # longer /docs/pub allow overrides
        (3, "h", "/a/x"),          # tie -> allow
        (4, "h", "/other"),        # no match -> allow
        (5, "g", "/docs/secret"),  # no rules for host -> allow
    ]
    assert _gate(spark, urls, rules) == {1: False, 2: True, 3: True, 4: True, 5: True}


def test_full_disallow_root_prefix(spark):
    assert _gate(spark, [(1, "c", "/anything")], [("c", "/", False)]) == {1: False}


def test_path_col_strips_query_fragment_and_trailing_slash(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("https://www.H.com/a/b/?q=1#f",), ("http://h.com",)], "url string"
    )
    got = [r[0] for r in df.select(path_col("url")).collect()]
    assert got == ["/a/b", ""]


def test_matches_relational_duckdb_formulation(spark):
    """300 synthetic (host, path) rows against layered rules must equal
    the rank-based relational decision."""
    rules = []
    for k in range(5):
        rules += [(f"h{k}", f"/p{k}", k % 2 == 0), (f"h{k}", f"/p{k}/x", k % 2 == 1)]
    urls = [
        (i, f"h{i % 5}", f"/p{i % 7}" + ("/x/deep" if i % 3 == 0 else ""))
        for i in range(300)
    ]
    got = _gate(spark, urls, rules)
    duckdb.register("ru", pd.DataFrame(rules, columns=["host", "prefix", "allow"]))
    duckdb.register("uu", pd.DataFrame(urls, columns=["doc_id", "host", "path"]))
    want = dict(
        duckdb.sql("""
            WITH m AS (
              SELECT uu.doc_id, ru.allow,
                     row_number() OVER (PARTITION BY uu.doc_id
                                        ORDER BY length(ru.prefix) DESC,
                                                 ru.allow DESC) AS rn
              FROM uu JOIN ru ON ru.host = uu.host
                             AND starts_with(uu.path, ru.prefix))
            SELECT uu.doc_id, coalesce(m.allow, true)
            FROM uu LEFT JOIN (SELECT doc_id, allow FROM m WHERE rn = 1) m
                   USING (doc_id)
        """).fetchall()
    )
    assert got == want


def test_plan_broadcasts_rules_corpus_never_shuffles(spark):
    udf = spark.createDataFrame(
        [(1, "h", "/p")], "doc_id long, host string, path string"
    )
    rdf = spark.createDataFrame(
        [("h", "/p", True)], "host string, prefix string, allow boolean"
    )
    plan = robots_gate(udf, rdf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan.split("BroadcastExchange")[0]
