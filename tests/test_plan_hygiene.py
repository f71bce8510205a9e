"""Physical-plan hygiene: the scale properties this engine claims are
pinned as assertions on `.explain()` output, so a regression that makes a
plan silently worse (a lost pushdown, a flipped broadcast side, a second
Python stage, a sort-window guard) fails CI rather than only showing up
as a 100 TB incident.

Each test documents WHY the property matters at scale.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plan(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_filter_project_pushes_down_and_prunes(spark):
    """Predicate pushdown + column pruning must reach the parquet scan:
    at 100 TB the difference is reading 2 columns of matching row groups
    vs the whole table."""
    plan = _plan(entry_mod.queries()["filter_project"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # at least one real filter pushed (not the empty list)
    assert "PushedFilters: []" not in plan
    scan = plan[plan.index("Scan parquet") :]
    read_schema = scan[scan.index("ReadSchema") : scan.index("ReadSchema") + 400]
    assert "l_extendedprice" in read_schema
    # untouched wide columns must NOT be read
    assert "l_comment" not in read_schema


def test_broadcast_join_broadcasts_the_dimension(spark):
    """The nation/customer dims must broadcast; the fact side must not
    shuffle for them."""
    plan = _plan(entry_mod.queries()["broadcast_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_cosine_topk_broadcasts_queries_never_corpus(spark):
    """similarity_topk must broadcast the QUERY set over a nested-loop
    join — replicating the corpus is impossible at 100 TB."""
    df = entry_mod.queries()["similarity_topk"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin BuildLeft" in plan.replace(
        "BroadcastNestedLoopJoin BuildRight", ""
    ) or "BuildLeft" in plan


def test_lsh_guard_is_not_a_sort_window(spark):
    """The oversized-bucket guard must be an aggregate + anti-join, never
    a Window.partitionBy(band_key) — the window sort-shuffles every
    exploded band row (the round-2 dedup_minhash 48 s plan)."""
    from openccnet_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(lsh_candidate_pairs(minhash_signatures(docs)))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_pipeline_has_exactly_one_python_stage(spark):
    """The fused quality-filter UDF must stay ONE ArrowEvalPython stage:
    each extra stage spawns its own Python worker per task (local[32]
    thrashes at 2x workers) and pays an extra Arrow round-trip."""
    from openccnet_spark.operators.pipeline import quality_filter

    df = quality_filter(spark.read.parquet(f"{SF_DIR}/../sf0.001/documents.parquet").selectExpr(
        "cast(doc_id as string) conv_id",
        "cast(doc_id as int) turn_idx",
        "'user' role",
        "text",
        "'' tool",
        "current_timestamp() ts",
    ))
    # "simple" mode: one line per node ("formatted" lists each node twice
    # — tree + detail section — which would double the count)
    plan = _plan(df, "simple")
    assert plan.count("ArrowEvalPython") == 1


def test_exact_dedup_prehash_partial_aggregates(spark):
    """The prehash groupBy must show two-phase (partial then final)
    hash aggregation — map-side combine is what keeps the shuffle at
    one row per distinct key per task."""
    plan = _plan(entry_mod.queries()["dedup_exact_prehash"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "xxhash64" in plan


def test_quality_quantiles_has_no_window(spark):
    """Per-language percentiles must come from the bounded-domain histogram
    (groupBy(lang, q) + linear fold over <= 1001 rows/lang), never a
    row_number sort window — the window funnels each language's ENTIRE
    corpus into one reducer task at 100 TB."""
    plan = _plan(entry_mod.queries()["quality_quantiles"](spark, SF_DIR))
    assert "Window" not in plan
    # the histogram must be a real two-phase aggregate (map-side combined)
    assert plan.count("HashAggregate") >= 2


def test_ann_candidate_distinct_carries_no_vectors(spark):
    """The candidate-dedup distinct in the ANN/LSH family must key on
    scalars only (ids + cos_milli): a distinct keyed on the embedding
    arrays pushes ~1 KB of vector per candidate row through its hash
    exchange — ~50x the bytes of the ids (the r03 bench regression).
    A distinct is a HashAggregate with functions=[]; its exchange output
    equals its keys, so scalar keys <=> scalar exchange."""
    import re

    for name in (
        "similarity_ann",
        "similarity_ivf",
        "dedup_embedding_lsh",
        "decontaminate_semantic",
    ):
        plan = _plan(entry_mod.queries()[name](spark, SF_DIR), "simple")
        distincts = re.findall(
            r"HashAggregate\(keys=\[([^\]]*)\], functions=\[\]", plan
        )
        assert distincts, f"{name}: expected a candidate-dedup distinct"
        for keys in distincts:
            assert not re.search(r"\b(qv|nv|va|vb|embedding)#", keys), (
                f"{name}: distinct keyed on a vector column: [{keys}]"
            )


def test_salted_join_carries_salt_in_join_keys(spark):
    """The salted join must actually join on (key, salt) — otherwise the
    hot key still lands on one reducer."""
    from pyspark.sql import functions as F

    from openccnet_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    df = salted_join(li, orders, ["o_orderkey"], F.col("l_linenumber"), n_salt=4)
    plan = _plan(df)
    assert "_salt" in plan


def test_url_family_is_pure_jvm_with_one_exchange(spark):
    """The URL curation family must stay pure JVM string expressions:
    canonicalize is a zero-exchange projection (runs inside the scan
    stage at 100 TB), and the gate/dedup pay exactly ONE data shuffle
    (hashpartitioning on canon_url). A Python stage or a second
    exchange here would re-shuffle every crawled URL."""
    qs = entry_mod.queries()
    canon = _plan(qs["url_canonicalize"](spark, SF_DIR), "simple")
    assert "Exchange" not in canon
    assert "EvalPython" not in canon and "MapInPandas" not in canon
    for name in ("url_domain_gate", "url_dedup"):
        plan = _plan(qs[name](spark, SF_DIR), "simple")
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "EvalPython" not in plan and "MapInPandas" not in plan, name


def test_conv_fold_is_one_conv_shuffle_no_window(spark):
    """conv_fold_tools must be a single hashpartitioning(conv_id)
    exchange feeding a JVM aggregate fold — never a Window over turns
    (which would sort-shuffle every turn row) and never a Python stage.
    State stays conversation-bounded."""
    plan = _plan(entry_mod.queries()["conv_fold_tools"](spark, SF_DIR), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # the fold itself must be the JVM higher-order aggregate, partial-agg'd
    assert "aggregate(" in plan and "collect_list" in plan


def test_lm_score_has_no_window_and_broadcast_token_joins(spark):
    """lm_score: per-token model lookups must be broadcast hash joins
    (the n-gram model is bounded; the corpus side must never
    sort-merge-shuffle per token), and the per-document mean must be a
    two-phase aggregate, not a Window."""
    plan = _plan(entry_mod.queries()["lm_score"](spark, SF_DIR), "simple")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_no_rowwise_python_in_any_query(spark):
    """GLOBAL invariant: no driver query may contain a row-at-a-time
    Python UDF stage (BatchEvalPython) — Python is allowed only as
    Arrow-vectorized stages (ArrowEvalPython / mapInPandas). Row-wise
    Python is the canonical 10-100x hot-path slowdown at scale."""
    import __spark_entry__ as entry_mod

    offenders = []
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = _plan(df, "simple")
        except Exception as exc:  # a broken builder is its own failure
            offenders.append((name, f"builder failed: {exc}"))
            continue
        # builders may persist-with-handles; release the (unmaterialized)
        # registrations so the sweep leaves the CacheManager clean
        for h in getattr(df, "_persist_handles", ()):
            h.unpersist()
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython stage"))
    assert not offenders, offenders
