"""CMS sketch: overestimate guarantee, exact-on-no-collision, merge
associativity. HLL sketch: register exactness vs scalar replay, merge =
elementwise max (idempotent), estimator error bounds. Hypertable
cascade: level nesting, cascade == direct."""

from __future__ import annotations

import datetime
import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators.hll import (
    HLL_M,
    HLL_WINDOW,
    hll_estimate,
    hll_histogram,
    hll_merge,
    hll_registers,
)
from openccnet_spark.operators.hypertable import base_level, coarsen, rollup_cascade
from openccnet_spark.operators.sketch import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_estimate,
    heavy_hitters,
    word_frequencies,
)


def test_cms_overestimates_never_under(spark):
    rng = random.Random(2)
    pool = [f"tok{i}" for i in range(3000)]  # >> W: collisions guaranteed
    docs = [(i, " ".join(rng.choice(pool) for _ in range(30))) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = heavy_hitters(df, k=100).collect()
    assert len(rows) == 100
    assert all(r["est_count"] >= r["exact_count"] for r in rows)


def test_cms_exact_for_tiny_vocab(spark):
    # vocab << W and D=4 rows: overestimate only on a (rare) 60-bit-hash
    # bucket collision in ALL 4 rows — with 3 words, est == exact
    df = spark.createDataFrame([(1, "a a a b b c")], "doc_id long, text string")
    rows = {r["word"]: r for r in heavy_hitters(df, k=10).collect()}
    assert {w: r["exact_count"] for w, r in rows.items()} == {"a": 3, "b": 2, "c": 1}
    assert all(r["est_count"] == r["exact_count"] for r in rows.values())


def test_cms_merge_is_elementwise_sum(spark):
    """Sketch of the union == elementwise sum of the parts' sketches —
    the property that makes CMS distributable/incremental."""
    d1 = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    d2 = spark.createDataFrame([(2, "y z")], "doc_id long, text string")
    both = d1.unionByName(d2)
    merged = (
        cms_build(word_frequencies(d1))
        .unionByName(cms_build(word_frequencies(d2)))
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(word_frequencies(both))
    a = {(r["r"], r["bucket"]): r["cnt"] for r in merged.collect()}
    b = {(r["r"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert a == b and len(b) <= CMS_D * 3


def _hll_py_regs(values, salt="hll:"):
    """Scalar ground-truth register file (same 60-bit md5 family)."""
    out: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5((salt + v).encode()).hexdigest()[:15], 16)
        reg, low = divmod(h, 1 << HLL_WINDOW)
        rho = HLL_WINDOW + 1 if low == 0 else HLL_WINDOW + 1 - low.bit_length()
        out[reg] = max(out.get(reg, 0), rho)
    return out


def _words(spark, prefix, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("w")
    )


def test_hll_registers_match_scalar_replay(spark):
    vals = [f"tok{i}" for i in range(400)]
    got = {
        r["reg"]: r["rank"]
        for r in hll_registers(_words(spark, "tok", 0, 400), "w").collect()
    }
    assert got == _hll_py_regs(vals)


def test_hll_merge_is_elementwise_max_of_union(spark):
    """Sketch of the union == elementwise max of the parts' sketches —
    duplicates across parts collapse (unlike the CMS sum)."""
    a = _words(spark, "a", 0, 300)
    b = _words(spark, "a", 150, 450)  # 150-word overlap with a
    direct = hll_registers(a.unionByName(b), "w")
    merged = hll_merge(hll_registers(a, "w"), hll_registers(b, "w"))
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_merge_idempotent(spark):
    s = hll_registers(_words(spark, "x", 0, 100), "w")
    assert sorted(map(tuple, s.collect())) == sorted(
        map(tuple, hll_merge(s, s).collect())
    )


def test_hll_estimate_error_bound(spark):
    n = 20000
    regs = [
        (r["reg"], r["rank"])
        for r in hll_registers(_words(spark, "v", 0, n), "w").collect()
    ]
    est = hll_estimate(regs)
    # HLL standard error is ~1.04/sqrt(m); assert within 3 sigma
    assert abs(est - n) / n < 3 * 1.04 / math.sqrt(HLL_M)


def test_hll_linear_counting_small_cardinality(spark):
    regs = [
        (r["reg"], r["rank"])
        for r in hll_registers(_words(spark, "s", 0, 40), "w").collect()
    ]
    # 40 << m: the linear-counting fallback is near-exact
    assert abs(hll_estimate(regs) - 40) <= 4


def test_hll_histogram_covers_all_registers(spark):
    regs = hll_registers(_words(spark, "h", 0, 500), "w")
    hist = hll_histogram(regs)
    n_regs = regs.count()
    assert hist.agg(F.sum("n_registers")).first()[0] == n_regs <= HLL_M


def _events(spark, n=500):
    rng = random.Random(4)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            t0 + datetime.timedelta(seconds=rng.randrange(0, 5 * 86400)),
            rng.randrange(5),
            rng.choice(["click", "view"]),
            rng.random() * 100,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_cascade_equals_direct(spark):
    ev = _events(spark)
    daily_cascaded = rollup_cascade(ev)[-1]
    daily_direct = base_level(ev, 86400)
    a = sorted(map(tuple, daily_cascaded.collect()))
    b = sorted(map(tuple, daily_direct.collect()))
    assert a == b and len(a) > 0


def test_cascade_rejects_non_nesting_levels(spark):
    ev = _events(spark, n=10)
    with pytest.raises(ValueError, match="nest"):
        coarsen(base_level(ev, 900), 900, 1000)


def test_cascade_levels_are_consistent(spark):
    ev = _events(spark, n=300)
    lv15, lv1h, lv1d = rollup_cascade(ev)
    n15 = lv15.agg(F.sum("n_events")).first()[0]
    n1h = lv1h.agg(F.sum("n_events")).first()[0]
    n1d = lv1d.agg(F.sum("n_events")).first()[0]
    assert n15 == n1h == n1d == 300
