"""As-of and range joins: differential vs naive Python, boundary
semantics, and the nested-loop-free plan contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators.temporal import asof_join, range_join


def _frames(spark, rng, n_left=80, n_right=120, n_keys=7):
    left = [(i, rng.randrange(n_keys), rng.randrange(0, 1000)) for i in range(n_left)]
    right = [
        (1000 + i, rng.randrange(n_keys), rng.randrange(0, 1000), i * 3 % 97)
        for i in range(n_right)
    ]
    # unique (key, ts) on the right: drop later duplicates
    seen, uniq = set(), []
    for r in right:
        if (r[1], r[2]) not in seen:
            seen.add((r[1], r[2]))
            uniq.append(r)
    ldf = spark.createDataFrame(left, "lid long, k long, t long").repartition(5)
    rdf = spark.createDataFrame(uniq, "rid long, k long, t long, val long").repartition(3)
    return left, uniq, ldf, rdf


def test_asof_backward_matches_naive(spark):
    rng = random.Random(5)
    left, right, ldf, rdf = _frames(spark, rng)
    got = {
        r["lid"]: (r["r_rid"], r["r_val"])
        for r in asof_join(ldf, rdf, keys=["k"], ts_col="t").collect()
    }
    for lid, k, t in left:
        cands = [r for r in right if r[1] == k and r[2] <= t]
        want = max(cands, key=lambda r: r[2]) if cands else None
        assert got[lid] == ((want[0], want[3]) if want else (None, None)), lid


def test_asof_forward_and_tie_inclusive(spark):
    ldf = spark.createDataFrame([(1, 0, 100), (2, 0, 50)], "lid long, k long, t long")
    rdf = spark.createDataFrame(
        [(10, 0, 100, 7), (11, 0, 120, 8)], "rid long, k long, t long, val long"
    )
    back = {r["lid"]: r["r_rid"] for r in
            asof_join(ldf, rdf, ["k"], "t", "backward").collect()}
    fwd = {r["lid"]: r["r_rid"] for r in
           asof_join(ldf, rdf, ["k"], "t", "forward").collect()}
    assert back == {1: 10, 2: None}  # equal ts matches (inclusive)
    assert fwd == {1: 10, 2: 10}


def test_asof_tolerance(spark):
    ldf = spark.createDataFrame([(1, 0, 100)], "lid long, k long, t long")
    rdf = spark.createDataFrame([(10, 0, 60, 7)], "rid long, k long, t long, val long")
    ok = asof_join(ldf, rdf, ["k"], "t", tolerance=F.lit(40)).collect()[0]
    far = asof_join(ldf, rdf, ["k"], "t", tolerance=F.lit(39)).collect()[0]
    assert ok["r_rid"] == 10 and far["r_rid"] is None


def test_asof_plan_has_no_join_node(spark):
    ldf = spark.createDataFrame([(1, 0, 1)], "lid long, k long, t long")
    rdf = spark.createDataFrame([(2, 0, 1, 1)], "rid long, k long, t long, val long")
    plan = asof_join(ldf, rdf, ["k"], "t")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window carry, never a join


def test_range_join_matches_naive_and_boundaries(spark):
    rng = random.Random(9)
    _, right, _, rdf = _frames(spark, rng)
    # anchors chosen to hit bucket edges exactly (width 64)
    anchors = [(i, i % 7, s, s + w) for i, (s, w) in
               enumerate([(0, 64), (64, 64), (63, 2), (100, 128), (500, 1)])]
    adf = spark.createDataFrame(anchors, "aid long, k long, s long, e long")
    pairs = range_join(adf, rdf, keys=["k"], start_col="s", end_col="e",
                       ts_col="t", bucket_width=64)
    got = sorted((r["aid"], r["r_rid"]) for r in pairs.collect())
    want = sorted(
        (aid, rid)
        for aid, k, s, e in anchors
        for rid, rk, t, _ in right
        if rk == k and s <= t < e
    )
    assert got == want and len(want) > 0


def test_range_join_empty_interval_and_collision_guard(spark):
    adf = spark.createDataFrame([(1, 0, 10, 10)], "aid long, k long, s long, e long")
    rdf = spark.createDataFrame([(2, 0, 10, 1)], "rid long, k long, t long, val long")
    assert range_join(adf, rdf, ["k"], "s", "e", "t", 64).count() == 0
    bad = spark.createDataFrame([(1, 0, 5)], "aid long, k long, t long")
    with pytest.raises(ValueError, match="rename"):
        range_join(bad, rdf, ["k"], "aid", "aid", "t", 64)


def test_range_join_plan_is_nested_loop_free(spark):
    adf = spark.createDataFrame([(1, 0, 0, 64)], "aid long, k long, s long, e long")
    rdf = spark.createDataFrame([(2, 0, 10, 1)], "rid long, k long, t long, val long")
    plan = range_join(adf, rdf, ["k"], "s", "e", "t", 64)
    txt = plan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in txt and "CartesianProduct" not in txt
