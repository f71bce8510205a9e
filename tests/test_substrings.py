"""Duplicated-substring dedup: differential vs the scalar ground truth,
edge cases, hash-family contract, and the plan-shape contract
(groupBy-min winner, no window over ghash, no Python stages)."""

from __future__ import annotations

import random

from openccnet_spark.operators.substrings import (
    WINDOW_TOKENS,
    kgram_occurrences,
    substring_dedup,
    substring_dedup_py,
)


def _run(spark, docs, k=WINDOW_TOKENS):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_dup_positions"], r["text_pruned"])
        for r in substring_dedup(df, k).collect()
    }


def test_differential_random_corpus(spark):
    """200 docs from a tiny word pool so k-grams collide organically
    (within and across docs, at arbitrary offsets); Spark must equal the
    plain-Python rule."""
    rng = random.Random(11)
    pool = [f"w{i}" for i in range(5)]
    docs = [
        (i, " ".join(rng.choice(pool) for _ in range(rng.randrange(0, 30))))
        for i in range(200)
    ]
    assert _run(spark, docs, k=3) == substring_dedup_py(docs, k=3)


def test_exact_copy_fully_removed(spark):
    text = " ".join(f"t{i}" for i in range(20))
    got = _run(spark, [(1, text), (2, text)])
    assert got[1] == (20, 0, text)
    assert got[2] == (20, 20, "")


def test_unaligned_repeat_removed(spark):
    """A duplicated run at a DIFFERENT offset in the second doc — the case
    fixed-boundary passage dedup structurally misses — must be covered."""
    run = " ".join(f"r{i}" for i in range(WINDOW_TOKENS))
    d1 = run + " tail1 tail2"
    d2 = "head1 head2 head3 " + run + " other"
    got = _run(spark, [(1, d1), (2, d2)])
    assert got[1] == (WINDOW_TOKENS + 2, 0, d1)
    # doc 2 loses exactly the duplicated run, keeps its unique flanks
    assert got[2] == (WINDOW_TOKENS + 4, WINDOW_TOKENS, "head1 head2 head3 other")


def test_within_doc_repeat_keeps_first(spark):
    block = " ".join(f"b{i}" for i in range(WINDOW_TOKENS))
    got = _run(spark, [(5, f"{block} {block}")])
    assert got[5] == (2 * WINDOW_TOKENS, WINDOW_TOKENS, block)


def test_short_docs_and_null_text(spark):
    """Docs shorter than k tokens yield no windows; null text behaves as
    ''. Identical short docs must both survive untouched."""
    got = _run(spark, [(1, "a b c"), (2, "a b c"), (3, None), (4, "")])
    assert got[1] == (3, 0, "a b c")
    assert got[2] == (3, 0, "a b c")
    assert got[3] == (1, 0, "")
    assert got[4] == (1, 0, "")


def test_occurrence_hashes_match_python(spark):
    """The 60-bit hash family matches int(md5[:15],16) — the cross-engine
    contract the DuckDB oracle relies on."""
    import hashlib

    df = spark.createDataFrame([(1, "x y z q r")], "doc_id long, text string")
    rows = kgram_occurrences(df, k=2).collect()
    toks = "x y z q r".split(" ")
    assert len(rows) == 4
    for r in rows:
        gtext = " ".join(toks[r["pos"] - 1 : r["pos"] + 1])
        want = int(hashlib.md5(f"sub:{gtext}".encode()).hexdigest()[:15], 16)
        assert r["ghash"] == want


def test_plan_groupby_min_no_window_no_python(spark):
    """Winner election must be a partial-aggregated groupBy (map-side
    combine absorbs mega-duplicated boilerplate skew), never a window
    over ghash; the whole operator stays JVM-side."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = substring_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
