"""URL canonicalization / dedup / domain-gate operators (operators/urls.py).

Pins the cross-engine contract: the Spark expressions, the DuckDB twins
and a handcrafted expectation battery must all agree, the synthesizer
must produce byte-identical URLs in both engines, and the canonical form
must be idempotent.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators.urls import (
    PAGE_GROUP,
    canonical_url_col,
    domain_gate,
    host_col,
    host_suffixes_col,
    sql_canonical_url,
    sql_host,
    sql_host_suffixes,
    sql_synth_url,
    synth_url_col,
    url_dedup,
)

# (messy, canonical, host) — covers scheme variants, www/case folding,
# trailing slashes (incl. doubled), fragments, tracking-only queries
# collapsing to no '?', param sorting, schemeless and pathless URLs
CASES = [
    (
        "https://www.Example.COM/docs/5/?utm_source=feed&v=3#top",
        "example.com/docs/5?v=3",
        "example.com",
    ),
    (
        "http://example.com/docs/5?v=3&ref=crawler",
        "example.com/docs/5?v=3",
        "example.com",
    ),
    (
        "https://CDN.d7.example.com/a/b//?z=1&a=2&utm_x=9",
        "cdn.d7.example.com/a/b?a=2&z=1",
        "cdn.d7.example.com",
    ),
    ("example.com/path", "example.com/path", "example.com"),
    ("http://www.example.com", "example.com", "example.com"),
    ("https://example.com/?utm_source=x", "example.com", "example.com"),
    ("http://host.com/p?fbclid=123&gclid=4&ref=z", "host.com/p", "host.com"),
    ("host.com/p/?b=2&a=1", "host.com/p?a=1&b=2", "host.com"),
]


def test_canonicalize_battery_spark(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    rows = df.select(
        canonical_url_col("url").alias("c"), host_col("url").alias("h")
    ).collect()
    for (u, canon, host), r in zip(CASES, rows):
        assert r["c"] == canon, u
        assert r["h"] == host, u


def test_canonicalize_battery_duckdb():
    con = duckdb.connect()
    for u, canon, host in CASES:
        got_c, got_h = con.sql(
            f"SELECT {sql_canonical_url(f'$${u}$$')}, {sql_host(f'$${u}$$')}"
        ).fetchone()
        assert got_c == canon, u
        assert got_h == host, u


def test_host_suffixes_both_engines(spark):
    want = ["cdn.d7.example.com", "d7.example.com", "example.com", "com"]
    got_spark = (
        spark.range(1)
        .select(host_suffixes_col(F.lit("cdn.d7.example.com")).alias("s"))
        .first()["s"]
    )
    got_duck = duckdb.sql(
        f"SELECT {sql_host_suffixes(chr(39) + 'cdn.d7.example.com' + chr(39))}"
    ).fetchone()[0]
    assert got_spark == want
    assert got_duck == want


def test_synth_url_cross_engine_parity(spark):
    n = 600
    duck = (
        duckdb.sql(
            f"SELECT i, {sql_synth_url('i')} AS url "
            f"FROM (SELECT unnest(range({n})) AS i) ORDER BY i"
        )
        .df()["url"]
        .tolist()
    )
    got = (
        spark.range(n)
        .select("id", synth_url_col("id").alias("url"))
        .orderBy("id")
        .toPandas()["url"]
        .tolist()
    )
    assert got == duck


def test_canonical_is_idempotent_over_synth_corpus(spark):
    canon = spark.range(900).select(
        canonical_url_col(synth_url_col("id")).alias("c")
    )
    bad = canon.filter(canonical_url_col("c") != F.col("c")).count()
    assert bad == 0


def test_url_dedup_groups_are_structural(spark):
    n = 900
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), synth_url_col("id").alias("url")
    )
    out = url_dedup(df).toPandas()
    # PAGE_GROUP consecutive ids share a page -> exactly n/PAGE_GROUP
    # groups, each of size PAGE_GROUP with keep_id = the group's min
    assert len(out) == n // PAGE_GROUP
    assert set(out["n_dups"]) == {PAGE_GROUP}
    assert sorted(out["keep_id"]) == list(range(0, n, PAGE_GROUP))


def test_domain_gate_decisions(spark):
    df = spark.createDataFrame(
        [
            (0, "https://www.d7.example.com/x?a=1"),  # blocked exactly
            (1, "http://cdn.d7.example.com/x"),  # blocked via suffix
            (2, "https://clean.com/p/?utm_source=t&b=1"),  # keep (min id)
            (3, "http://www.Clean.COM/p?b=1#frag"),  # same canon -> dup
            (4, "https://sub.clean.com/q"),  # clean subdomain keeps
        ],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: r["decision"]
        for r in domain_gate(df, ["d7.example.com"]).collect()
    }
    assert out == {
        0: "blocked_domain",
        1: "blocked_domain",
        2: "keep",
        3: "dup_url",
        4: "keep",
    }


def test_domain_gate_counts_partition_the_corpus(spark):
    n = 900
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), synth_url_col("id").alias("url")
    )
    out = (
        domain_gate(df, ["d7.example.com", "d23.example.com"])
        .groupBy("decision")
        .count()
        .toPandas()
        .set_index("decision")["count"]
        .to_dict()
    )
    assert sum(out.values()) == n
    # blocked pages: page%50 in {7,23} over pages 0..299 -> 12 pages,
    # PAGE_GROUP docs each (cdn. pages of d7/d23 also carry the suffix)
    assert out["blocked_domain"] == 12 * PAGE_GROUP
    clean_pages = n // PAGE_GROUP - 12
    assert out["keep"] == clean_pages
    assert out["dup_url"] == clean_pages * (PAGE_GROUP - 1)


def test_canonicalize_differential_fuzz(spark):
    """Seeded 1000-string differential sweep over an adversarial URL-ish
    alphabet (doubled delimiters, mid-string scheme fragments, %, ~, ::):
    the Spark expressions and the DuckDB twins must agree byte-for-byte
    on every input — the cross-engine contract the oracles lean on
    (style of the reference's seeded SplitterTests battery)."""
    import random

    random.seed(0x5EED)
    alpha = list("abcXYZ09._-/?&=#:%~+") + [
        "http://", "https://", "www.", "utm_", "ref=", "&&", "//", "??", "##",
    ]
    cases = [
        "".join(random.choice(alpha) for _ in range(random.randint(0, 12)))
        for _ in range(1000)
    ]
    rows = [(i, c) for i, c in enumerate(cases)]
    con = duckdb.connect()
    con.sql("CREATE TABLE t(i BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = con.sql(
        f"SELECT i, {sql_canonical_url('u')} AS c, {sql_host('u')} AS h "
        "FROM t ORDER BY i"
    ).df()
    sp = (
        spark.createDataFrame(rows, "i long, u string")
        .select("i", canonical_url_col("u").alias("c"), host_col("u").alias("h"))
        .orderBy("i")
        .toPandas()
    )
    assert duck["c"].tolist() == sp["c"].tolist()
    assert duck["h"].tolist() == sp["h"].tolist()


def test_gate_plan_has_no_python_stage(spark):
    """The whole URL family must stay JVM-side: no ArrowEvalPython /
    BatchEvalPython anywhere in the gate's plan."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), synth_url_col("id").alias("url")
    )
    plan = domain_gate(df, ["d7.example.com"])._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
