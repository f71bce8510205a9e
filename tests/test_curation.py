"""Curation operator tests: n-gram decontamination, deterministic
stratified sampling, and token-budget prefix selection (including the
histogram-decomposition == naive-window equivalence)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators.curation import (
    budget_select,
    decontaminate,
    key60_col,
    ngram_hashes_col,
    stratified_sample,
    top_fraction_select,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g h", "en"),
        (1, "c d e f g h i j", "en"),  # shares 3-grams with doc 0
        (2, "x y z", "en"),  # shorter than n=4: no 4-grams
        (3, "p q r s t u v w", "zh"),
        (4, "a b c d x y z w", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_ngram_hashes_distinct_and_short_doc_guard(spark, docs):
    out = {
        r.doc_id: r.h
        for r in docs.select(
            "doc_id", ngram_hashes_col("text", 4).alias("h")
        ).collect()
    }
    assert out[2] == []  # 3 words < n=4 -> empty, not sequence(1, 0)
    assert out[0] == [
        _h60(" ".join(["a", "b", "c", "d", "e", "f", "g", "h"][i : i + 4]))
        for i in range(5)
    ]
    rep = spark.createDataFrame([(9, "a b a b a b")], "doc_id long, text string")
    (row,) = rep.select(ngram_hashes_col("text", 2).alias("h")).collect()
    assert sorted(row.h) == sorted({_h60("a b"), _h60("b a")})  # distinct


def test_decontaminate_counts_and_broadcast_plan(spark, docs):
    bench = spark.createDataFrame([("c d e f g h",)], "text string")
    res = decontaminate(docs, bench, n=4)
    hits = {r.doc_id: r.n_hits for r in res.collect()}
    # bench 4-grams: "c d e f", "d e f g", "e f g h" — docs 0 and 1 carry
    # all three; nothing else overlaps
    assert hits == {0: 3, 1: 3}
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_stratified_sample_rates_and_determinism(spark, docs):
    none = stratified_sample(docs, {}, default_ppm=0).collect()
    assert none == []
    everything = stratified_sample(docs, {}, default_ppm=1_000_000).collect()
    assert len(everything) == 5
    picked = stratified_sample(
        docs, {"en": 1_000_000, "zh": 0}, default_ppm=0
    ).collect()
    assert sorted(r.doc_id for r in picked) == [0, 1, 2]
    for r in picked:
        assert r.sample_ppm == _h60(f"strat:{r.doc_id}") % 1_000_000
    again = stratified_sample(
        docs, {"en": 1_000_000, "zh": 0}, default_ppm=0
    ).collect()
    assert sorted(map(tuple, picked)) == sorted(map(tuple, again))


def _naive_budget(rows, budgets):
    """The spec: per-stratum (hkey, id) order, maximal prefix <= budget."""
    kept = []
    by_lang = {}
    for doc_id, text, lang in rows:
        by_lang.setdefault(lang, []).append((doc_id, len(text.split(" "))))
    for lang, docs_ in by_lang.items():
        budget = budgets.get(lang, 0)
        cum = 0
        for doc_id, toks in sorted(
            docs_, key=lambda d: (_h60(f"budget:{d[0]}"), d[0])
        ):
            cum += toks
            if cum > budget:
                break
            kept.append((doc_id, lang, toks))
    return sorted(kept)


@pytest.mark.parametrize("n_buckets", [1, 7, 4096])
def test_budget_select_matches_naive_for_any_bucketing(spark, n_buckets):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range((i * 13) % 9 + 1)), ["en", "zh", "fr"][i % 3])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    budgets = {"en": 40, "zh": 11, "de": 100}  # fr absent -> dropped
    got = sorted(
        (r.doc_id, r.lang, r.n_tokens)
        for r in budget_select(df, budgets, n_buckets=n_buckets).collect()
    )
    assert got == _naive_budget(rows, budgets)
    assert all(lang != "fr" for _, lang, _ in got)


def test_budget_select_prefix_not_knapsack(spark):
    """A crossing document drops itself AND everything after it, even if a
    later small document would still fit."""
    texts = {1: "a", 2: "a b c d e f g h", 3: "a"}
    df = spark.createDataFrame(
        [(i, texts[i], "en") for i in (1, 2, 3)], "doc_id long, text string, lang string"
    )
    order = sorted(texts, key=lambda d: (_h60(f"budget:{d}"), d))
    toks = {1: 1, 2: 8, 3: 1}
    budget = {"en": 3}
    kept, cum = [], 0
    for d in order:
        cum += toks[d]
        if cum > 3:
            break
        kept.append(d)
    got = sorted(r.doc_id for r in budget_select(df, budget).collect())
    assert got == sorted(kept)
    assert len(got) < 3  # the 8-token doc crosses somewhere


def _naive_top_fraction(rows, frac_ppm):
    """The spec: per-stratum (score DESC, id ASC) rank, keep the integer-ceil
    quota; frac_ppm above 1e6 clamps to keep-all."""
    by_lang = {}
    for doc_id, lang, score in rows:
        by_lang.setdefault(lang, []).append((doc_id, score))
    kept = []
    for lang, ds in by_lang.items():
        n = len(ds)
        quota = min(n, (n * frac_ppm + 999_999) // 1_000_000)
        order = sorted(ds, key=lambda t: (-t[1], t[0]))
        kept += [(d, lang, s) for d, s in order[:quota]]
    return sorted(kept)


@pytest.fixture(scope="module")
def scored_docs(spark):
    # heavy score ties (domain 0..4) so the cutoff tie group is exercised
    # in every stratum, plus a singleton stratum for the quota=ceil edge
    rows = [(i, ["en", "zh", "fr"][i % 3], (i * 7) % 5) for i in range(61)] + [
        (999, "solo", 3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    return rows, df


@pytest.mark.parametrize("frac_ppm", [0, 1, 300_000, 500_000, 999_999, 1_000_000])
def test_top_fraction_matches_naive_rank(spark, scored_docs, frac_ppm):
    rows, df = scored_docs
    got = sorted(
        (r.doc_id, r.lang, r.score)
        for r in top_fraction_select(
            df, frac_ppm, score_col=F.col("score")
        ).collect()
    )
    assert got == _naive_top_fraction(rows, frac_ppm)
    if frac_ppm == 1:
        # ceil semantics: every non-empty stratum keeps at least one doc
        assert {lang for _, lang, _ in got} == {"en", "zh", "fr", "solo"}


def test_top_fraction_clamps_over_million(spark, scored_docs):
    rows, df = scored_docs
    got = top_fraction_select(df, 2_000_000, score_col=F.col("score")).collect()
    assert len(got) == len(rows)  # without the least(n, ...) clamp: 0 rows


def test_top_fraction_tie_break_is_id_order(spark):
    df = spark.createDataFrame(
        [(i, "en", 7) for i in (5, 3, 9, 1, 4)], "doc_id long, lang string, score long"
    )
    got = sorted(
        r.doc_id
        for r in top_fraction_select(df, 400_000, score_col=F.col("score")).collect()
    )
    assert got == [1, 3]  # quota=2, all-tied stratum -> lowest ids win


def test_top_fraction_carry_cols(spark, scored_docs):
    rows, df = scored_docs
    df2 = df.withColumn("payload", F.concat(F.lit("p"), F.col("doc_id")))
    got = top_fraction_select(
        df2, 500_000, score_col=F.col("score"), carry_cols=("payload",)
    ).collect()
    assert got and all(r.payload == f"p{r.doc_id}" for r in got)
    plain = top_fraction_select(df, 500_000, score_col=F.col("score")).collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in plain)


def test_mixture_quotas_integer_math():
    from openccnet_spark.operators.curation import mixture_quotas

    counts = {"web": 100, "code": 30, "wiki": 9}
    target = {"web": 500_000, "code": 300_000, "wiki": 200_000}
    # N = min(100e6//5e5, 30e6//3e5, 9e6//2e5) = min(200, 100, 45) = 45
    assert mixture_quotas(counts, target) == {"web": 22, "code": 13, "wiki": 9}
    # a target source absent from the corpus forces everything to zero
    assert mixture_quotas({"web": 100}, {"web": 500_000, "gone": 500_000}) == {
        "web": 0,
        "gone": 0,
    }
    # zero-rate strata are dropped, not constraining
    assert mixture_quotas(counts, {"web": 1_000_000, "wiki": 0}) == {
        "web": 100,
        "wiki": 0,
    }


def test_mixture_rebalance_matches_naive(spark):
    from openccnet_spark.operators.curation import mixture_quotas, mixture_rebalance

    rows = [
        (i, ["web", "code", "wiki"][0 if i < 40 else (1 if i < 55 else 2)])
        for i in range(64)
    ]  # 40 web, 15 code, 9 wiki
    df = spark.createDataFrame(rows, "doc_id long, source string")
    target = {"web": 500_000, "code": 300_000, "wiki": 200_000}
    got = sorted(
        (r.doc_id, r.source) for r in mixture_rebalance(df, target).collect()
    )
    counts = {"web": 40, "code": 15, "wiki": 9}
    quotas = mixture_quotas(counts, target)
    want = []
    for src, q in quotas.items():
        ids = [d for d, s in rows if s == src]
        ids.sort(key=lambda d: (_h60(f"mix:{d}"), d))
        want += [(d, src) for d in ids[:q]]
    assert got == sorted(want)
    by_src = {s: sum(1 for _, s2 in got if s2 == s) for s in counts}
    assert by_src == quotas  # the achieved mixture IS the quota vector


def test_key60_matches_python(spark):
    df = spark.createDataFrame([(17,), (42,)], "doc_id long")
    for r in df.select("doc_id", key60_col("k:", "doc_id").alias("h")).collect():
        assert r.h == _h60(f"k:{r.doc_id}")


# --------------------------------------------------------------------------
# leakage_safe_split
# --------------------------------------------------------------------------


def _labels(spark, n_docs=600, docs_per_cluster=3):
    rows = [(i, i // docs_per_cluster) for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id long, component long")


def test_split_clusters_are_atomic(spark):
    from openccnet_spark.operators.curation import leakage_safe_split

    out = leakage_safe_split(_labels(spark)).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())


def test_split_rates_approximate(spark):
    from openccnet_spark.operators.curation import leakage_safe_split

    out = leakage_safe_split(_labels(spark, n_docs=3000, docs_per_cluster=1)).collect()
    n = len(out)
    train = sum(1 for r in out if r["split"] == "train") / n
    assert 0.87 <= train <= 0.93  # 90% +- sampling noise over 3000 draws
    assert {r["split"] for r in out} == {"train", "val", "test"}


def test_split_rejects_bad_rates(spark):
    from openccnet_spark.operators.curation import leakage_safe_split

    with pytest.raises(ValueError, match="1e6"):
        leakage_safe_split(_labels(spark), {"train": 1, "val": 2})


def test_split_depends_only_on_cluster_id(spark):
    """A new member joining an existing cluster inherits its split —
    the incremental-run stability contract."""
    from openccnet_spark.operators.curation import leakage_safe_split

    base = {r["component"]: r["split"]
            for r in leakage_safe_split(_labels(spark, 30)).collect()}
    grown = spark.createDataFrame(
        [(1000 + i, i // 2) for i in range(20)], "doc_id long, component long"
    )  # clusters 0-9: all present in base (30 docs / 3 per cluster)
    for r in leakage_safe_split(grown).collect():
        assert r["split"] == base[r["component"]]


def test_split_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    from openccnet_spark.operators.curation import (
        leakage_safe_split,
        sql_leakage_safe_split,
    )

    rows = [(i, i // 4) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, component long")
    got = sorted(map(tuple, leakage_safe_split(df).collect()))
    duckdb.register("split_t", pd.DataFrame(rows, columns=["doc_id", "component"]))
    want = sorted(map(tuple, duckdb.sql(sql_leakage_safe_split("split_t")).fetchall()))
    assert got == want
