"""Passage-level dedup: differential vs the scalar ground truth, edge
cases, and the plan-shape contract (groupBy-min, no window over phash)."""

from __future__ import annotations

import random

import pytest

from openccnet_spark.operators.passages import (
    PASSAGE_WORDS,
    passage_dedup,
    passage_dedup_py,
    passage_occurrences,
)


def _run(spark, docs, k=PASSAGE_WORDS):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_passages"], r["n_kept"], r["text_dedup"])
        for r in passage_dedup(df, k).collect()
    }
    return out


def test_differential_random_corpus(spark):
    """200 docs built from a tiny word pool so passages collide organically
    (within and across docs); Spark must equal the plain-Python rule."""
    rng = random.Random(7)
    pool = [f"w{i}" for i in range(6)]
    docs = [
        (i, " ".join(rng.choice(pool) for _ in range(rng.randrange(0, 40))))
        for i in range(200)
    ]
    got = _run(spark, docs, k=3)
    want = passage_dedup_py(docs, k=3)
    assert got == want


def test_exact_copy_fully_removed(spark):
    text = " ".join(f"t{i}" for i in range(20))
    got = _run(spark, [(1, text), (2, text)])
    assert got[1][2] == text
    assert got[2] == (got[1][0], 0, "")


def test_within_doc_repeat_removed(spark):
    block = " ".join(f"b{i}" for i in range(PASSAGE_WORDS))
    text = f"{block} {block}"
    got = _run(spark, [(5, text)])
    assert got[5] == (2, 1, block)


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in passage_dedup(df).collect()}
    # '' splits to [''] in both engines: one passage, first doc wins it
    assert rows[1]["n_passages"] == 1 and rows[1]["n_kept"] == 1
    assert rows[2]["n_kept"] == 0 and rows[2]["text_dedup"] == ""
    assert rows[3]["n_kept"] == 0


def test_short_final_passage_distinct_from_full(spark):
    """A short tail passage must not collide with a longer one sharing the
    prefix (hash covers the exact joined text)."""
    got = _run(spark, [(1, "a b c d"), (2, "a b c")], k=4)
    assert got[1] == (1, 1, "a b c d")
    assert got[2] == (1, 1, "a b c")


def test_occurrence_hashes_match_python(spark):
    """The 60-bit hash family matches int(md5[:15],16) — the cross-engine
    contract the DuckDB oracle relies on."""
    import hashlib

    df = spark.createDataFrame([(1, "x y z q r")], "doc_id long, text string")
    rows = passage_occurrences(df, k=2).collect()
    for r in rows:
        want = int(hashlib.md5(f"psg:{r['ptext']}".encode()).hexdigest()[:15], 16)
        assert r["phash"] == want


def test_plan_uses_partial_aggregation_not_window(spark):
    """The winner election must be a groupBy (map-side combine absorbs
    mega-duplicated boilerplate skew), never a window over phash."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = passage_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan
