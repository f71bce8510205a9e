"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality-filter pipeline at sf0.001;
``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent the driver compares against at sf0.01 (row-count + schema +
order-insensitive value-hash).

Float discipline: computed doubles never cross the comparison boundary raw —
they are floored to integer milli/cent units (identical IEEE inputs =>
identical floors in both engines). Pass-through parquet doubles are safe.
"""

from __future__ import annotations

import atexit
import json
import math
import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Self-arm: make the package importable no matter how the driver loaded this
# file (direct importlib from an arbitrary cwd included).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from openccnet_spark import Converter
from openccnet_spark.fixtures import CONVERT_GOLDENS, ZHO_CHECK_GOLDENS
from openccnet_spark.functions import convert_cols_udf, zho_check_udf
from openccnet_spark.operators import quality as Q
from openccnet_spark.operators.pipeline import quality_filter, reference_label
from openccnet_spark.sources.transcripts import (
    POOL,
    n_conv_for_sf,
    pool_text,
    spark_transcripts,
    transcripts_sql,
)

_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


_SHIPPED_SESSIONS: set = set()


def _ensure_workers(spark: SparkSession) -> None:
    """Ship the package to executors (addPyFile) once per SparkContext, so
    UDF queries work even when the session's workers don't inherit this
    repo on their import path (e.g. driver launched from another cwd)."""
    sc = spark.sparkContext
    # applicationId, NOT id(sc): a stopped context's recycled object
    # address could otherwise silently skip addPyFile for a NEW context
    key = sc.applicationId
    if key in _SHIPPED_SESSIONS:
        return
    from tools.package_pyfiles import build

    zip_path = os.path.join(tempfile.mkdtemp(prefix="openccnet_pyfiles_"), "openccnet_spark.zip")
    sc.addPyFile(str(build(__import__("pathlib").Path(zip_path))))
    _SHIPPED_SESSIONS.add(key)


def _armed(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_workers(spark)
        return fn(spark, sf_dir)

    return wrapper


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full keep/drop + scrub pipeline over the synthetic
    transcripts table at sf0.001 scale (~5k turns)."""
    _ensure_workers(spark)
    df = spark_transcripts(spark, n_conv_for_sf("sf0.001"))
    out = quality_filter(df, config="t2s", salt_partitions=8)
    return out.select(
        "conv_id", "turn_idx", "role", "keep", "drop_reason", "lang",
        "text_converted", "text_scrubbed",
        F.floor(F.col("ppl") * 1000).cast("long").alias("ppl_milli"),
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def _q_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline (conversion + langid + ppl + heuristics + scrub) over
    the deterministic transcripts table; per-turn output."""
    df = spark_transcripts(spark, n_conv_for_sf(sf_dir))
    out = quality_filter(df, config="t2s", salt_partitions=32)
    return out.select(
        "conv_id", "turn_idx", "keep", "drop_reason", "lang",
        "text_converted", "text_scrubbed",
        F.floor(F.col("ppl") * 1000).cast("long").alias("ppl_milli"),
    )


def _q_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic gate over the documents table — dual-computed (the oracle
    re-derives every metric in SQL, no precomputed labels)."""
    df = _read(spark, sf_dir, "documents").withColumn(
        "text_converted", F.coalesce(F.col("text"), F.lit(""))
    )
    df = Q.with_quality_columns(df, "text_converted")
    return df.select(
        "doc_id",
        F.col("char_len").cast("long").alias("char_len"),
        F.col("word_cnt").cast("long").alias("word_cnt"),
        F.floor(F.col("uniq_ratio") * 1000).cast("long").alias("uniq_milli"),
        F.floor(F.col("symbol_ratio") * 1000).cast("long").alias("symbol_milli"),
        Q.drop_reason_expr(ppl_col=None).alias("drop_reason"),
        Q.lang_simple_col(F.col("text_converted")).alias("lang_simple"),
        Q.scrub_col(F.col("text_converted")).alias("text_scrubbed"),
    )


def _q_convert_goldens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 20 conversion configs over the reference golden fixtures."""
    rows = [(i, c, p, t) for i, (c, p, t, _e) in enumerate(CONVERT_GOLDENS)]
    df = spark.createDataFrame(rows, "case_id int, config string, punct boolean, input string")
    return df.select(
        "case_id", "config",
        convert_cols_udf()("config", "punct", "input").alias("output"),
    )


_ZSTD_BUNDLE = "/root/reference/OpenccNetLib/dicts/dictionary_maxlength.zstd"


def _q_bundle_zstd_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's published Zstd-compressed bundle, decoded by the
    pure-Python RFC 8878 decompressor (zstd_decode.py) INSIDE the Spark
    workers, must convert the golden set identically to the compiled
    bundle — the whole zstd + bundle-interop path, driver-checked."""
    from openccnet_spark.functions import convert_udf

    rows = [
        (i, c, p, t) for i, (c, p, t, _e) in enumerate(CONVERT_GOLDENS)
    ]
    df = spark.createDataFrame(rows, "case_id int, config string, punct boolean, input string")
    # one UDF per config (the bundle-path converter is config-static);
    # goldens are few, so a CASE over per-config UDF columns is fine
    out = None
    # only the (config, punct) combos that actually occur — half of the
    # full product is provably empty and would just pad the plan
    for config, punct in sorted({(c, p) for _i, c, p, _t in rows}):
        sub = df.filter((F.col("config") == config) & (F.col("punct") == F.lit(punct)))
        conv = sub.select(
            "case_id", "config",
            convert_udf(config, punct=punct, bundle_path=_ZSTD_BUNDLE)("input").alias("output"),
        )
        out = conv if out is None else out.unionByName(conv)
    return out


def _q_zho_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [(i, t) for i, (t, _e) in enumerate(ZHO_CHECK_GOLDENS)]
    df = spark.createDataFrame(rows, "case_id int, input string")
    return df.select("case_id", zho_check_udf()("input").alias("zho"))


def _q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation (the metrics-rollup stage of SURVEY §2.2).

    Money sums are floored to integer cents per-row before summing so both
    engines add exact integers (order-independent)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_cents"),
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter + project with predicate/column pushdown to parquet."""
    li = _read(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey", "l_linenumber",
        F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100)
        .cast("long").alias("revenue_cents"),
    )


def _q_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders x customer x nation with explicit broadcast of the dims."""
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
        )
    )


def _q_window_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable-ordering window (row_number per customer by date, tiebreak key)."""
    from pyspark.sql.window import Window

    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
    )


def _q_antijoin_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpoint-resume anti-join pattern: customers with no order
    since 1997 ("pending buckets" = keys absent from the done-set)."""
    cust = _read(spark, sf_dir, "customer")
    recent = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01")
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 100000))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents + planted exact copies."""
    from openccnet_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_doubled_docs(spark, sf_dir))


def _q_dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style passage-level dedup: fixed 8-word passages, globally
    first occurrence wins (min (doc_id, pidx)), documents rebuilt from
    survivors. Doubled docs plant guaranteed full-document repeats; the
    corpus' template-generated text supplies organic partial overlaps.
    Oracle = the naive window form of the same rule."""
    from openccnet_spark.operators.passages import passage_dedup

    handles: list = []
    out = passage_dedup(_doubled_docs(spark, sf_dir), persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_url_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots gating over the synthetic crawl: per-host rule
    sets broadcast as bounded arrays, the longest-match/allow-ties fold
    runs JVM-side per URL, the corpus never shuffles. The oracle decides
    the same rule RELATIONALLY (rank by prefix length desc, allow desc)
    so fold bugs and rank bugs cannot cancel."""
    from openccnet_spark.operators.robots import (
        path_col,
        robots_gate,
        synth_robots_rules,
    )
    from openccnet_spark.operators.urls import host_col, synth_url_col

    urls = (
        _read(spark, sf_dir, "documents")
        .select("doc_id", synth_url_col("doc_id").alias("url"))
        .select(
            "doc_id", host_col("url").alias("host"), path_col("url").alias("path")
        )
    )
    return robots_gate(urls, synth_robots_rules(spark))


def _q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-table semantics end-to-end: build a fresh versioned
    table (v1 append docs%3==0, v2 append %3==1, v3 OVERWRITE %3==2),
    then probe time travel (read v2), incremental read ((1,2]) and the
    current snapshot, emitting (probe, n_rows, id_digest) — the digest
    is the order-free bit_xor of 60-bit doc-id hashes, so the oracle
    fully value-checks which FILES each read resolved to."""
    import shutil

    from openccnet_spark.sources.snapshots import (
        read_incremental,
        read_snapshot,
        write_snapshot,
    )

    tbl = "/tmp/openccnet_snapshot_q"
    shutil.rmtree(tbl, ignore_errors=True)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    write_snapshot(docs.filter(F.col("doc_id") % 3 == 0), tbl)
    write_snapshot(docs.filter(F.col("doc_id") % 3 == 1), tbl)
    write_snapshot(docs.filter(F.col("doc_id") % 3 == 2), tbl, mode="overwrite")
    probes = [
        ("time_travel_v2", read_snapshot(spark, tbl, 2)),
        ("incremental_1_2", read_incremental(spark, tbl, after=1, until=2)),
        ("current_v3", read_snapshot(spark, tbl)),
    ]
    out = None
    for name, df in probes:
        agg = df.agg(
            F.lit(name).alias("probe"),
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(
                F.expr(
                    "CAST(conv(substr(md5(concat('snap:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
                )
            ).alias("id_digest"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def _q_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level decontamination: corpus vectors within cos >= 0.99
    of any eval vector (eval = vec_id % 37 == 5, the n-gram query's
    split; planted contamination = exact eval copies at +100000). The
    cross-set LSH bucket join — the eval side is bounded, the corpus
    never cross-joins — shares the near-dup family's recall argument, so
    the oracle is the brute-force cosine join."""
    from openccnet_spark.operators.similarity import semantic_decontaminate

    embs = _read(spark, sf_dir, "embeddings")
    eval_df = embs.filter(F.col("vec_id") % 37 == 5)
    corpus = embs.filter(F.col("vec_id") % 37 != 5).unionByName(
        eval_df.withColumn("vec_id", F.col("vec_id") + 100000)
    )
    handles: list = []
    out = semantic_decontaminate(corpus, eval_df, persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_html_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText-lite boilerplate removal: synthesized multi-block pages
    (nav + content paragraph + cookie banner + link footer) classified
    block-by-block with link-density + text-mass rules, pure JVM
    expressions, zero shuffles. Oracle replays the identical constants
    in DuckDB."""
    from openccnet_spark.operators.boilerplate import extract_main_text, sql_synth_page

    pages = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(sql_synth_page("coalesce(text, '')")).alias("html")
    )
    return extract_main_text(pages)


def _q_conv_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-integrity context packing: whole conversations into
    2048-token bins via the exact distributed prefix sum at conversation
    grain — an SFT sample never splits across training sequences. One
    conv_id shuffle for the token sums, then the bucketed-prefix-sum
    placement (4096 reducers, no global sort)."""
    from openccnet_spark.operators.conversations import conversation_pack

    return conversation_pack(
        spark_transcripts(spark, n_conv_for_sf(sf_dir)), window=2048
    )


def _q_url_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank over the synthetic host-link graph (forward ring
    + hub funnel edges derived from the documents table), 3 rounds,
    damping 85% — the crawl-prioritization side-computation whose output
    broadcasts into the URL gate. All arithmetic is floored integer so
    the DuckDB chained-CTE replay is exact at any partitioning."""
    from openccnet_spark.operators.hostrank import host_rank, synth_host_edges

    handles: list = []
    out = host_rank(
        synth_host_edges(_read(spark, sf_dir, "documents")),
        persist=True,
        handles=handles,
    )
    out._persist_handles = handles
    return out


def _q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier budget: 1,000,000 fetch slots apportioned over
    hosts by their PageRank weight via the exact largest-remainder
    method (sum(quota) == budget bit-exactly). The top-L remainder
    selection uses the histogram-cutoff decomposition — only the
    boundary remainder bucket pays a sort."""
    from openccnet_spark.operators.hostrank import (
        apportion_budget,
        host_rank,
        synth_host_edges,
    )

    handles: list = []
    ranks = host_rank(
        synth_host_edges(_read(spark, sf_dir, "documents")),
        persist=True,
        handles=handles,
    )
    out = apportion_budget(ranks, budget=1_000_000, persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring removal (Lee et al. 2022, sliding-window
    form): every 8-token window hashed at stride 1, globally first
    occurrence wins (min (doc_id, pos)), every token covered by a later
    occurrence dropped, documents rebuilt. Doubled docs plant guaranteed
    whole-document repeats; the corpus' template-generated text supplies
    organic partial overlaps that cross passage boundaries (the case
    dedup_passage structurally misses). Oracle = the naive window form
    of the same rule."""
    from openccnet_spark.operators.substrings import substring_dedup

    handles: list = []
    out = substring_dedup(_doubled_docs(spark, sf_dir), persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _mutant_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + near-duplicates (each doc minus its last word); the
    mutation expression lives in dedup.append_word_dropped_mutants so the
    bench's scaled family measures the identical shape."""
    from openccnet_spark.operators.dedup import append_word_dropped_mutants

    return append_word_dropped_mutants(_read(spark, sf_dir, "documents"))


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs verified by exact Jaccard; the oracle
    recomputes ALL >= threshold pairs brute-force, so this also checks LSH
    recall at the configured banding."""
    from openccnet_spark.operators.dedup import minhash_near_duplicates

    handles: list = []
    out = minhash_near_duplicates(_mutant_docs(spark, sf_dir), persist=True, handles=handles)
    # unpersist contract: set on the FINAL frame (any further transform
    # would drop the attribute); bench._run_to_noop releases these after
    # materialization so cached frames don't pile up across a shared session
    out._persist_handles = handles
    return out


def _q_dedup_exact_prehash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via the 64-bit prehash grouping (the 100 TB form);
    output — and oracle — identical to dedup_exact."""
    from openccnet_spark.operators.dedup import exact_duplicates_prehash

    return exact_duplicates_prehash(_doubled_docs(spark, sf_dir))


def _q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dups — the BRUTE-FORCE verification
    baseline (row-count-guarded O(n^2) join; never the production path) —
    must equal the MinHash+LSH output on this corpus, shares its oracle."""
    from openccnet_spark.operators.dedup import ngram_jaccard_pairs_bruteforce

    return ngram_jaccard_pairs_bruteforce(_mutant_docs(spark, sf_dir))


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups; md5-60bit features are recomputed in the DuckDB
    oracle, and 4x15-bit pigeonhole banding is total for hamming <= 3, so
    this is a full value-checked query."""
    from openccnet_spark.operators.dedup import simhash_near_duplicates

    handles: list = []
    out = simhash_near_duplicates(_mutant_docs(spark, sf_dir), persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _doubled_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + planted exact copies (+100000 ids) — the corpus BOTH
    embedding near-dup queries and their shared oracle assume; change the
    planting here and in _dedup_embedding_oracle together."""
    embs = _read(spark, sf_dir, "embeddings")
    return embs.unionByName(embs.withColumn("vec_id", F.col("vec_id") + 100000))


def _q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over embeddings + planted copies."""
    from openccnet_spark.operators.similarity import embedding_near_duplicates

    return embedding_near_duplicates(_doubled_embeddings(spark, sf_dir), threshold_milli=990)


def _q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dups via the LSH bucket join (the 100 TB path) —
    must equal the brute-force cross join's output on this corpus (recall
    at cos>=0.99 is ~1-1.5e-6 per pair), so it shares its oracle."""
    from openccnet_spark.operators.similarity import lsh_near_duplicates

    handles: list = []
    out = lsh_near_duplicates(
        _doubled_embeddings(spark, sf_dir), threshold_milli=990,
        persist=True, handles=handles,
    )
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash near-dup pairs: the
    clustering step that turns pairwise output into per-document dedup
    groups. Iterative min-label propagation (localCheckpoint per round);
    the oracle recomputes the transitive closure with a DuckDB recursive
    CTE over the identical pair list, so components value-match."""
    from openccnet_spark.operators.components import connected_components
    from openccnet_spark.operators.dedup import minhash_near_duplicates

    pair_handles: list = []
    comp_handles: list = []
    pairs = minhash_near_duplicates(_mutant_docs(spark, sf_dir), persist=True, handles=pair_handles)
    # reliable=True: real checkpoint() (not executor-local blocks), so a
    # lost executor mid-iteration replays from durable storage — the
    # setting a multi-hour 100 TB run needs. checkpoint_interval=4 keeps
    # recompute-on-failure bounded at 4 rounds while writing ~1/4 the
    # checkpoint I/O (A/B in BENCH.md); the mid-interval cached round
    # frames surface via comp_handles for post-materialization release.
    out = connected_components(pairs, reliable=True, checkpoint_interval=4, handles=comp_handles)
    for h in pair_handles:  # the iteration has materialized everything already
        h.unpersist()
    out._persist_handles = comp_handles
    return out


def _q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same components contract via alternating large-star/small-star
    (Kiveris et al.) — O(log n) rounds regardless of component diameter,
    the variant for adversarial/long-chain duplicate graphs where
    propagation's O(diameter) bound breaks. Shares the recursive-CTE
    oracle with `dedup_components` (identical output by definition)."""
    from openccnet_spark.operators.components import connected_components_star
    from openccnet_spark.operators.dedup import minhash_near_duplicates

    handles: list = []
    pairs = minhash_near_duplicates(_mutant_docs(spark, sf_dir), persist=True, handles=handles)
    # interval=1 (NOT the propagation queries' 4): star runs O(log n)
    # rounds, so per-round durable checkpoints are already cheap — and its
    # bushy per-round plan (union + 2 joins + 2 distincts) makes
    # persist-only rounds pay more in nested-plan analysis than the
    # checkpoint I/O they save (solo A/B at sf0.1: 23.4 s vs 7.1 s)
    out = connected_components_star(pairs, reliable=True, checkpoint_interval=1)
    for h in handles:
        h.unpersist()
    return out


def _q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus dedup decision: near-dup pairs -> components ->
    one canonical doc per cluster + membership counts, singletons
    included. The keep-set a real pipeline would write."""
    from openccnet_spark.operators.components import canonical_documents
    from openccnet_spark.operators.dedup import minhash_near_duplicates

    docs = _mutant_docs(spark, sf_dir)
    pair_handles: list = []
    comp_handles: list = []
    pairs = minhash_near_duplicates(docs, persist=True, handles=pair_handles)
    out = canonical_documents(
        pairs, docs, reliable=True, checkpoint_interval=4, handles=comp_handles
    )
    for h in pair_handles:
        h.unpersist()
    out._persist_handles = comp_handles
    return out


def _q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a PERSISTED corpus index — the daily
    operation of a production pipeline: batch 2 deduped against batch 1's
    stored MinHash signature table, not a one-shot corpus self-dedup.
    Batch 1 (even doc_ids) is signed and written to a parquet index; the
    operator reads the index back and dedups a new batch of (fresh odd
    docs) + (mutants of indexed docs → 'index' dups) + (mutants of the
    fresh docs → 'batch' dups, greedy smaller-id-wins). The oracle
    recomputes both duplicate sets brute-force from the two tables."""
    import shutil

    from openccnet_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
        word_dropped_mutants,
    )

    docs = _read(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)    # batch 1: already ingested
    fresh = docs.filter(F.col("doc_id") % 2 == 1)  # genuinely new content
    batch = (
        fresh
        .unionByName(word_dropped_mutants(old))  # +100000: near-dup of index
        .unionByName(word_dropped_mutants(fresh, id_offset=200_000))  # +200000: near-dup within batch
    )
    # the index is PERSISTED state: signatures written to parquet and read
    # back, so the operator consumes exactly what a daily run would
    idx_dir = tempfile.mkdtemp(prefix="openccnet-minhash-index-")
    atexit.register(shutil.rmtree, idx_dir, ignore_errors=True)
    minhash_signatures(old).write.mode("overwrite").parquet(idx_dir)
    index_sigs = spark.read.parquet(idx_dir)
    handles: list = []
    out = incremental_minhash_dedup(
        batch, index_sigs, old, persist=True, handles=handles
    )
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_skew_join_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defeating salted join: lineitem (skewed side, salted on its
    line number so a hot order spreads over 8 reducers) joined to orders,
    revenue cents per order priority. Salting changes the shuffle layout,
    not the semantics — the oracle is the PLAIN join + aggregate."""
    from openccnet_spark.operators.skew import salted_join

    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = _read(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders,
        on=["o_orderkey"],
        salt_from=F.col("l_linenumber"),
        n_salt=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                    "long"
                )
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors 0..4."""
    from openccnet_spark.operators.similarity import cosine_topk

    return cosine_topk(_read(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5)


def _q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5. Approximate vs EXACT search, but
    fully deterministic: the oracle replays the identical hyperplane sign
    fold in DuckDB (same float64 literals, same left-to-right order), so
    buckets — and the final top-k — value-match. Recall vs the exact path
    is separately asserted in tests."""
    from openccnet_spark.operators.similarity import lsh_ann_topk

    # no persist: the corpus tagging is single-use now (the query side
    # tags its own filtered rows), so caching it would be pure overhead
    return lsh_ann_topk(_read(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5)


#: (case_id, pages, builder kwargs, pdf_to_text kwargs, expected) — the PDF
#: frontend driven end-to-end: parse -> extract -> reflow -> convert
#: (reference PdfCommand.cs:211-247; expected strings hand-verified)
_PDF_GOLDENS = [
    (0, [["他走在路上，忽然看见", "一个熟悉的身影。"], ["第二页内容。"]],
     {}, {"config": "s2t", "reflow": True},
     "他走在路上，忽然看見一個熟悉的身影。\n\n第二頁內容。"),
    (1, [["hello world", "line two"]],
     {"cjk": False, "compress": False}, {},
     "hello world\nline two\n\n"),
    (2, [["第一章 初遇", "章节正文从这里开始，", "跨行续写完毕。"]],
     {}, {"config": "t2s", "reflow": True},
     "第一章 初遇\n\n章节正文从这里开始，跨行续写完毕。"),
]


def _q_pdf_reflow_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized PDFs through the full pdf pipeline (extract -> reflow ->
    convert) as a distributed mapInPandas pass over binary rows."""
    import pandas as pd

    from openccnet_spark.sources.pdf import pdf_to_text
    from openccnet_spark.sources.pdf_synth import build_pdf

    rows = [
        (i, build_pdf(pages, **bkw), json.dumps(pkw))
        for i, pages, bkw, pkw, _e in _PDF_GOLDENS
    ]
    df = spark.createDataFrame(rows, "case_id int, content binary, params string")

    def _run(batches):
        for pdf in batches:
            out = [
                pdf_to_text(bytes(c), **json.loads(p))
                for c, p in zip(pdf["content"], pdf["params"])
            ]
            yield pd.DataFrame({"case_id": pdf["case_id"], "text": out})

    return df.mapInPandas(_run, "case_id int, text string")


#: (case_id, fmt, part_name, part_xml, config, keep_font, expected_xml) —
#: office container conversion driven end-to-end (zip -> convert -> unzip)
_OFFICE_GOLDENS = [
    (0, "docx", "word/document.xml",
     '<w:document><w:rFonts w:eastAsia="宋体"/><w:t>简体正文</w:t></w:document>',
     "s2t", True,
     '<w:document><w:rFonts w:eastAsia="宋体"/><w:t>簡體正文</w:t></w:document>'),
    (1, "xlsx", "xl/worksheets/sheet1.xml",
     '<worksheet><c r="A1" t="inlineStr"><is><t>简体行内</t></is></c>'
     "<c r=\"B1\"><f>简体('x')</f></c></worksheet>",
     "s2t", False,
     '<worksheet><c r="A1" t="inlineStr"><is><t>簡體行內</t></is></c>'
     "<c r=\"B1\"><f>简体('x')</f></c></worksheet>"),
    (2, "pptx", "ppt/slideLayouts/slideLayout1.xml",
     "<p:sp><a:t>简体版式文字</a:t></p:sp>",
     "s2t", False,
     "<p:sp><a:t>簡體版式文字</a:t></p:sp>"),
    (3, "epub", "OEBPS/ch1.xhtml",
     "<html><body>简体章节内容</body></html>",
     "s2t", False,
     "<html><body>簡體章節內容</body></html>"),
]


def _q_office_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Office/EPUB containers through the full zip->convert->rezip path as a
    distributed pass over binary rows; output is the converted target part."""
    import io
    import zipfile

    import pandas as pd

    from openccnet_spark.sources.office import convert_office_bytes

    def _container(fmt: str, name: str, xml: str) -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            if fmt == "epub":
                info = zipfile.ZipInfo("mimetype")
                info.compress_type = zipfile.ZIP_STORED
                z.writestr(info, "application/epub+zip")
            z.writestr(name, xml)
        return buf.getvalue()

    rows = [
        (i, fmt, name, _container(fmt, name, xml), config, keep_font)
        for i, fmt, name, xml, config, keep_font, _e in _OFFICE_GOLDENS
    ]
    df = spark.createDataFrame(
        rows, "case_id int, fmt string, part string, content binary, config string, keep_font boolean"
    )

    def _run(batches):
        import zipfile as zf

        for pdf in batches:
            out = []
            for fmt, part, blob, config, keep_font in zip(
                pdf["fmt"], pdf["part"], pdf["content"], pdf["config"], pdf["keep_font"]
            ):
                converted = convert_office_bytes(
                    bytes(blob), fmt, config, keep_font=bool(keep_font)
                )
                out.append(zf.ZipFile(io.BytesIO(converted)).read(part).decode("utf-8"))
            yield pd.DataFrame({"case_id": pdf["case_id"], "part_xml": out})

    return df.mapInPandas(_run, "case_id int, part_xml string")


#: (case_id, encoding, text_lines) — legacy-encoding file decode; expected
#: rows are (case_id, line_no, text) for every line of every file
_TEXTFILE_GOLDENS = [
    (0, "utf-8", ["简体第一行", "第二行 second line"]),
    (1, "gbk", ["汉字内容", "第二行"]),
    (2, "big5", ["繁體內容"]),
    (3, "utf-16", ["混合 content 行"]),
    (4, "shift_jis", ["日本語テキスト"]),
]


_TEXTFILES_QDIR: str | None = None


def _q_textfiles_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy-encoding text files decoded through the binaryFile + Arrow
    source; line numbers must be exact per file."""
    import tempfile as _tf
    from pathlib import Path

    from openccnet_spark.sources.textfiles import read_text_files

    # one private mkdtemp per PROCESS, cached and reused across
    # invocations: no per-call leak, and no shared /tmp name that another
    # process (or user) could race or squat
    global _TEXTFILES_QDIR
    if _TEXTFILES_QDIR is None:
        _TEXTFILES_QDIR = _tf.mkdtemp(prefix="openccnet_textfiles_q_")
    base = Path(_TEXTFILES_QDIR)
    frames = []
    for i, enc, lines in _TEXTFILE_GOLDENS:
        p = base / f"case{i}.txt"
        p.write_bytes("\n".join(lines).encode(enc))
        df = read_text_files(spark, str(p), encoding=enc).select(
            F.lit(i).alias("case_id"), F.col("line_no").cast("int"), "text"
        )
        frames.append(df)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted-file) approximate top-5 — the second scale
    path beside the LSH buckets. Deterministic seeded-sample centroids, so
    the oracle rebuilds the identical index in DuckDB and value-matches.
    NB: the oracle's centroids come from the driver contract's sf0.01
    tables (override with SPARK_GRAFT_ORACLE_SF_DIR, which must match the
    tables the oracle views read); this query samples from ``sf_dir``, so
    the value comparison is only meaningful when the two agree — sf0.01 in
    the driver's run."""
    from openccnet_spark.operators.similarity import ivf_topk

    return ivf_topk(_read(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5)


def _q_similarity_ivf_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with ``sample_mod=4`` — the knob that bounds training cost as
    the corpus grows (train on the deterministic id%4==0 slice, index and
    search the FULL corpus). This is the 100 TB story's load-bearing cost
    bound, exercised end-to-end: the oracle replays the sampled training
    bit-exactly (same slice, same integer partial sums), so a knob
    regression hash-fails like any other query."""
    from openccnet_spark.operators.similarity import ivf_topk

    return ivf_topk(
        _read(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=5,
        sample_mod=4,
    )


def _q_similarity_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of BOTH approximate indexes (hyperplane-LSH ANN and IVF)
    against the exact top-k, as driver-checked values: per query,
    recall_milli = floor(|approx ∩ exact| * 1000 / k). The oracle rebuilds
    all three result sets in DuckDB, so the recall itself is pinned —
    an index regression (or a drifted centroid/bucket fold) fails the
    hash check rather than just a local pytest assertion. NB the sf
    corpora are UNIFORM-RANDOM vectors — the adversarial case for any ANN
    index (true top-k cosines sit near 0.3, where hyperplane buckets carry
    little signal) — so modest absolute recall here is the honest value;
    tests/test_training_ops.py separately asserts high recall on planted
    near-neighbors, the workload these indexes exist for."""
    from openccnet_spark.operators.similarity import cosine_topk, ivf_topk, lsh_ann_topk

    emb = _read(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    k = 5
    exact = cosine_topk(emb, qids, k=k).select("query_id", "neighbor_id")
    ann = (
        lsh_ann_topk(emb, qids, k=k)
        .select("query_id", "neighbor_id")
        .withColumn("ann_hit", F.lit(1))
    )
    ivf = (
        ivf_topk(emb, qids, k=k)
        .select("query_id", "neighbor_id")
        .withColumn("ivf_hit", F.lit(1))
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.floor(F.count("ann_hit") * 1000 / k).cast("long").alias("ann_recall_milli"),
            F.floor(F.count("ivf_hit") * 1000 / k).cast("long").alias("ivf_recall_milli"),
        )
    )


def _planted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings + planted NEAR-neighbors at vec_id+100000: each copy has
    its last element zeroed — a deterministic perturbation both engines
    reproduce EXACTLY (no float arithmetic, just element replacement), so
    cos(original, copy) ~ 0.99 instead of the degenerate 1.0 of an exact
    duplicate. This is the workload an ANN index exists for; the uniform-
    random sf vectors in `similarity_recall` are its adversarial floor."""
    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 63), F.array(F.lit(0.0).cast("float"))
        ).alias("embedding"),
    )
    return emb.unionByName(pert)


def _q_similarity_recall_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-neighbor recall: for each query, is its planted near-copy
    (cos ~ 0.99) in the ANN top-5 and the IVF top-5? The oracle replays
    both indexes over the same planted corpus AND asserts the floor as a
    literal (`floor_met` = TRUE): if either index ever misses a planted
    neighbor, the Spark side computes FALSE and the driver's hash check
    fails — the recall the index exists to deliver is pinned, not just
    reported."""
    from openccnet_spark.operators.similarity import ivf_topk, lsh_ann_topk

    corpus = _planted_embeddings(spark, sf_dir)
    qids = [0, 1, 2, 3, 4]
    hit = F.max(
        F.when(F.col("neighbor_id") == F.col("query_id") + 100000, 1).otherwise(0)
    )
    ann = (
        lsh_ann_topk(corpus, qids, k=5)
        .groupBy("query_id")
        .agg(hit.cast("long").alias("ann_hit"))
    )
    ivf = (
        ivf_topk(corpus, qids, k=5)
        .groupBy("query_id")
        .agg(hit.cast("long").alias("ivf_hit"))
    )
    base = spark.createDataFrame([(q,) for q in qids], "query_id long")
    return (
        base.join(ann, "query_id", "left")
        .join(ivf, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("ann_hit", F.lit(0)).alias("ann_hit"),
            F.coalesce("ivf_hit", F.lit(0)).alias("ivf_hit"),
        )
        .withColumn(
            "floor_met", (F.col("ann_hit") + F.col("ivf_hit")) == 2
        )
    )


def _q_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts, quality score, fingerprint over documents."""
    from openccnet_spark.operators import textstats as T

    t = F.coalesce(F.col("text"), F.lit(""))
    return _read(spark, sf_dir, "documents").select(
        "doc_id",
        T.whitespace_token_count(t).cast("long").alias("ws_tokens"),
        T.regex_token_count(t).cast("long").alias("re_tokens"),
        T.quality_score_milli(t).alias("quality_milli"),
        T.fingerprint64(t).alias("fingerprint"),
    )


def _q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-50 (word -> count): the canonical heavy
    shuffle — explode words, groupBy with map-side partial aggregation,
    then distributed top-k (orderBy+limit = TakeOrdered, never a global
    single-partition sort of the vocabulary)."""
    from pyspark.sql.window import Window

    docs = _read(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("w")
    ).filter(F.col("w") != "")
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("w")).limit(50)
    wnd = Window.orderBy(F.desc("n"), F.asc("w"))  # 50 rows: trivial window
    return top.withColumn("rank", F.row_number().over(wnd).cast("int"))


def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table (operators/bpe.py): the corpus-sized work
    is ONE map-side-combined word count; the driver transfer is the
    v_max-bounded top-vocab (deterministic count-desc/word-asc order);
    merge learning is greedy with a total-order tie-break, so the result
    is bit-stable at any partitioning. The oracle retrains from scratch
    in a self-contained naive Python implementation reading the same
    parquet — a distributed-count error, tie-break drift or top-V cut
    mismatch changes learned merges and hash-fails."""
    from openccnet_spark.operators.bpe import bpe_train

    docs = _read(spark, sf_dir, "documents")
    out, _ = bpe_train(docs)
    return out


def _q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-serve: per-document token counts under the learned
    merges, tokenized worker-side with a per-batch word memo (work is
    bounded by distinct words per task — the Zipf head, not the token
    stream). Serving merges lowest-rank-first; the oracle tokenizes by
    SEQUENTIAL rank-order application — the two strategies are provably
    equal (a rank-k merge only creates pairs of rank > k), so agreement
    here pins that proof corpus-wide."""
    from openccnet_spark.operators.bpe import bpe_train, token_counts

    docs = _read(spark, sf_dir, "documents")
    _, merges = bpe_train(docs)
    return token_counts(docs, merges)


def _q_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quality-score percentiles (p50/p90/p99) via the
    rank-at-ceil(p*n) definition — integer-exact in both engines (no
    float interpolation to drift).

    Scale plan: the naive form (row_number over a per-language sort window)
    funnels each language's ENTIRE corpus into one reducer task — a
    scale-killer at 100 TB. The score domain is bounded (integer milli units
    in [0, 1000]), so the exact same percentiles come window-free from a
    histogram: groupBy(lang, q).count() is map-side combined down to <= 1001
    rows per language, a second groupBy collects each language's sorted
    (q, cnt) array (bounded, never the corpus), and a linear JVM fold reads
    off q-at-rank-ceil(p*n) as the smallest q whose cumulative count reaches
    the target rank — identical to the sorted-rank definition because rows
    tied on q share the same q by construction. No Window anywhere in the
    plan (pinned by test_plan_hygiene). Plan built by
    `textstats.quality_quantiles_frame` — shared with tools/ab_round4.py
    so the A/B always measures the shipped plan."""
    from openccnet_spark.operators.textstats import quality_quantiles_frame

    return quality_quantiles_frame(_read(spark, sf_dir, "documents"))


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing over NON-image payloads (UTF-8 text bytes):
    the decoder must take the documented ``opaque`` fallback — NULL image
    fields, byte length preserved. checksum is crc32 (not SQL-expressible)
    => excluded."""
    from openccnet_spark.operators.multimodal import (
        extract_image_features,
        with_binary_payload,
    )

    feats = extract_image_features(with_binary_payload(_read(spark, sf_dir, "documents")))
    return feats.select("doc_id", "n_bytes", "format", "mode", "width", "height")


def _q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (imagecodec: pure-Python PNG inflate+unfilter, BMP
    BI_RGB): deterministic synthetic PNG-RGB / PNG-gray / BMP payloads are
    materialized per doc_id in a distributed mapInPandas (pixel value =
    (doc_id*7+3x+5y+11c) mod 256, PNG row filter = doc_id%5), then decoded
    by the same `extract_image_features` operator a production binary
    column takes. The oracle recomputes width/height/channels/mode and the
    exact per-channel pixel sums in closed-form SQL — a wrong decode (bad
    filter reversal, palette/BGR mixup, row-order flip) hash-fails."""
    from openccnet_spark.operators.multimodal import (
        extract_image_features,
        with_synth_image_payload,
    )

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    feats = extract_image_features(with_synth_image_payload(docs))
    return feats.select(
        "doc_id", "format", "mode", "width", "height", "channels",
        "sum_r", "sum_g", "sum_b",
    )


def _q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest end-to-end (sources/warc.py, ISO 28500): documents are
    packed distributedly into multi-record WARC blobs — one per
    doc_id%32 bucket, odd buckets as per-record gzip members (the Common
    Crawl layout) — then parsed back and HTML-extracted in ONE Python
    stage. The oracle recomputes url/status/date/n_chars and the 60-bit
    text hash straight from the documents table, so a header misparse,
    gzip member boundary error, Content-Length off-by-one or entity
    unescape bug hash-fails. Reference: OpenccNet/Program.cs reads plain
    files; WARC is the training-pipeline member of that source family."""
    from openccnet_spark.operators.bloom import hash60_expr
    from openccnet_spark.sources.warc import records_from_blobs, synth_warc_blobs

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    recs = records_from_blobs(synth_warc_blobs(docs), extract_text=True)
    return recs.filter(F.col("warc_type") == "response").select(
        F.split("target_uri", "/").getItem(4).cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        "http_status",
        "warc_date",
        F.length("text").cast("long").alias("n_chars"),
        hash60_expr("text").alias("text_h60"),
    )


def _q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (audiocodec: pure-Python RIFF/WAVE PCM parser):
    deterministic synthetic 8/16-bit mono/stereo WAVs are materialized per
    doc_id in a distributed mapInPandas (sample value = closed-form in
    (doc_id, frame, channel)), then decoded by the same
    `extract_audio_features` operator a production binary column takes.
    The oracle recomputes sample_rate/channels/bits/n_samples and the
    exact per-channel sample sums in closed-form SQL — a wrong decode
    (sign mixup, channel de-interleave error, header misparse)
    hash-fails."""
    from openccnet_spark.operators.multimodal import (
        extract_audio_features,
        with_synth_audio_payload,
    )

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 5)
    feats = extract_audio_features(with_synth_audio_payload(docs))
    return feats.select(
        "doc_id", "format", "sample_rate", "channels", "bits", "n_samples",
        "sum_ch0", "sum_ch1",
    )


def _q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame decode (videocodec: pure-Python GIF87a/89a LZW +
    palette compositing): deterministic synthetic animated GIFs are
    materialized per doc_id in a distributed mapInPandas (palette index =
    (doc_id+3x+5y+7f) mod 16, channel value affine in the index), then
    frame-sampled (every 2nd frame) and feature-extracted by
    `sample_video_frames` — the same operator a production binary video
    column takes. The oracle recomputes frame count/size and the exact
    per-sampled-frame RGB channel sums in closed-form SQL, so a wrong LZW
    decode, palette lookup, frame offset or sampling stride hash-fails."""
    from openccnet_spark.operators.multimodal import (
        sample_video_frames,
        with_synth_video_payload,
    )

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 3)
    return sample_video_frames(with_synth_video_payload(docs), every_n=2)


#: per-stratum sampling rates / token budgets for the curation queries —
#: chosen so every code path is exercised at sf0.01: partially-filled
#: strata (en, zh), a fully-kept stratum (fr), a small-budget stratum
#: (es) and an absent stratum (de -> default/dropped)
_STRAT_RATES_PPM = {"en": 200_000, "zh": 500_000, "ja": 800_000}
_STRAT_DEFAULT_PPM = 100_000
_TOKEN_BUDGETS = {"en": 6_000, "zh": 2_000, "fr": 99_999_999, "es": 500}
_TOP_FRAC_PPM = 300_000
_MIX_TARGET_PPM = {"src0": 400_000, "src1": 300_000, "src2": 200_000, "src3": 100_000}
#: domain blocklist for the URL-gate query — hosts of the synthesized
#: crawl (operators/urls.py synth: d{page%50}.example.com, every 11th
#: page behind a cdn. sub-label, so suffix semantics are exercised:
#: blocking d44.example.com also catches cdn.d44.example.com)
_BLOCKED_DOMAINS = ["d7.example.com", "d23.example.com", "d44.example.com"]


def _q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (stage 1 of C4/RefinedWeb/FineWeb-style web
    curation): per-document messy crawl URL -> normalized host +
    canonical form (fragment/scheme/www stripped, host lowercased,
    tracking params dropped, survivors sorted, trailing slash trimmed).
    Pure JVM string expressions — no UDF, no shuffle; the oracle rebuilds
    both the messy URL and the canonical form from the same pattern
    constants."""
    from openccnet_spark.operators.urls import (
        canonical_url_col,
        host_col,
        synth_url_col,
    )

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", synth_url_col("doc_id").alias("url")
    ).select(
        "doc_id",
        "url",
        host_col("url").alias("host"),
        canonical_url_col("url").alias("canon_url"),
    )


def _q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup: one row per canonical URL with the surviving
    fetch (min doc_id) and the duplicate count. The synthesized crawl
    plants exactly PAGE_GROUP messy spellings per logical page, so every
    group's n_dups is structural, not accidental. Plan: narrow
    canonicalization -> groupBy on the bounded-length canonical key with
    map-side partial aggregation."""
    from openccnet_spark.operators.urls import synth_url_col, url_dedup

    docs = _read(spark, sf_dir, "documents")
    return url_dedup(
        docs.select("doc_id", synth_url_col("doc_id").alias("url"))
    )


def _q_url_domain_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist + URL dedup as one per-document keep/drop
    decision: 'blocked_domain' if any dot-suffix of the host is
    blocklisted (literal-array arrays_overlap — zero joins), else 'keep'
    for the min-id fetch of each canonical URL, else 'dup_url'. ONE
    shuffle total (the election window on canon_url)."""
    from openccnet_spark.operators.urls import domain_gate, synth_url_col

    docs = _read(spark, sf_dir, "documents")
    return domain_gate(
        docs.select("doc_id", synth_url_col("doc_id").alias("url")),
        _BLOCKED_DOMAINS,
    )


def _lm_model(spark: SparkSession, sf_dir: str):
    from openccnet_spark.operators.lm import lm_train

    docs = _read(spark, sf_dir, "documents")
    trusted = docs.filter(F.col("doc_id") % 13 == 3)
    return docs, lm_train(trusted)


def _q_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed stupid-backoff LM training (CCNet shape, Brants et
    al. 2007): bigram/unigram counts over the trusted subset (doc_id %
    13 == 3) as order-free integer aggregations; emits the bigram score
    table with ppm = (c(ab) * 1e6) DIV c(a) — pure integer division, so
    the oracle recomputes the model bit-exactly."""
    docs, (bigram_ppm, _) = _lm_model(spark, sf_dir)
    return bigram_ppm


def _q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus fluency scoring against the trained LM: explode to
    bigrams, LEFT-join bigram ppm then unigram backoff ppm (OOV -> 0),
    integer mean per document. Two equi-joins on bounded token keys +
    one map-side-combinable aggregate; the corpus never collects."""
    from openccnet_spark.operators.lm import lm_score

    docs, (bigram_ppm, backoff_ppm) = _lm_model(spark, sf_dir)
    return lm_score(docs, bigram_ppm, backoff_ppm)


def _q_lm_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing per language: top 10% by LM
    score -> head, next 30% -> middle, rest -> tail, with exact integer
    quotas and (score DESC, doc_id ASC) tie-breaks via two
    top_fraction_select decompositions; the oracle is the naive
    per-language rank, so the decomposition must equal it exactly."""
    from openccnet_spark.operators.lm import ccnet_buckets, lm_score

    docs, (bigram_ppm, backoff_ppm) = _lm_model(spark, sf_dir)
    scored = lm_score(docs, bigram_ppm, backoff_ppm).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    # the scored frame feeds BOTH top_fraction decompositions and the
    # final tag join — persist so the scoring pipeline runs once; the
    # driver/bench release via _persist_handles (house rule)
    scored = scored.persist()
    out = ccnet_buckets(scored)
    out._persist_handles = [scored]
    return out


def _q_lm_score_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-faithful variant: one LM PER LANGUAGE (every count, total
    and score join carries lang; per-language totals stay a distributed
    frame — no driver scalar), each document scored against its own
    language's model."""
    from openccnet_spark.operators.lm import lm_score, lm_train

    docs = _read(spark, sf_dir, "documents")
    trusted = docs.filter(F.col("doc_id") % 13 == 3)
    bigram_ppm, backoff_ppm = lm_train(trusted, strata_col="lang")
    return lm_score(docs, bigram_ppm, backoff_ppm, strata_col="lang")


def _q_lm_score_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-order stupid backoff (the production order): tokens after
    the second score S(c|ab) = trigram ppm if seen else (2 * S(c|b)) DIV
    5 — the 0.4 backoff as an exact integer step recursing into the
    bigram score; each document's first transition scores at bigram
    order, so n_bigrams matches lm_score's row domain exactly."""
    from openccnet_spark.operators.lm import lm_score3, lm_train3

    docs = _read(spark, sf_dir, "documents")
    trusted = docs.filter(F.col("doc_id") % 13 == 3)
    trigram_ppm, bigram_ppm, backoff_ppm = lm_train3(trusted)
    return lm_score3(docs, trigram_ppm, bigram_ppm, backoff_ppm)


def _sql_lm_cte() -> str:
    """Shared oracle CTE chain: trusted counts -> model ppm tables ->
    per-document corpus scores (the exact integer pipeline of
    operators/lm.py)."""
    return """
tr AS (SELECT text FROM documents WHERE doc_id % 13 = 3),
tw AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w FROM tr),
bg AS (SELECT w[i] AS a, w[i+1] AS b FROM
        (SELECT w, unnest(generate_series(1, len(w)-1)) AS i FROM tw
         WHERE len(w) >= 2)),
bc AS (SELECT a, b, count(*)::BIGINT AS cnt_ab FROM bg GROUP BY 1, 2),
uni AS (SELECT unnest(w) AS a FROM tw),
uc AS (SELECT a, count(*)::BIGINT AS cnt_a FROM uni GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS t FROM uni),
bpm AS (SELECT bc.a, bc.b, ((cnt_ab * 1000000) // cnt_a)::BIGINT AS ppm
        FROM bc JOIN uc USING (a)),
bo AS (SELECT a AS b,
              ((2 * cnt_a * 1000000) // (5 * (SELECT t FROM tot)))::BIGINT
                AS ppm
       FROM uc),
cw AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
         AS w FROM documents),
cbg AS (SELECT doc_id, w[i] AS a, w[i+1] AS b FROM
         (SELECT doc_id, w, unnest(generate_series(1, len(w)-1)) AS i
          FROM cw WHERE len(w) >= 2)),
tok AS (SELECT doc_id, coalesce(bpm.ppm, bo.ppm, 0) AS tok_ppm
        FROM cbg LEFT JOIN bpm USING (a, b) LEFT JOIN bo USING (b)),
sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
              (sum(tok_ppm)::BIGINT // count(*))::BIGINT AS score_ppm
       FROM tok GROUP BY 1)
"""


def _sql_url_canonicalize() -> str:
    from openccnet_spark.operators.urls import (
        sql_canonical_url,
        sql_host,
        sql_synth_url,
    )

    return f"""
WITH d AS (SELECT doc_id, {sql_synth_url('doc_id')} AS url FROM documents)
SELECT doc_id, url, {sql_host('url')} AS host,
       {sql_canonical_url('url')} AS canon_url
FROM d
"""


def _sql_url_dedup() -> str:
    from openccnet_spark.operators.urls import sql_canonical_url, sql_synth_url

    return f"""
WITH d AS (SELECT doc_id, {sql_synth_url('doc_id')} AS url FROM documents)
SELECT {sql_canonical_url('url')} AS canon_url,
       min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_dups
FROM d
GROUP BY 1
"""


def _sql_url_domain_gate() -> str:
    from openccnet_spark.operators.urls import (
        sql_canonical_url,
        sql_host,
        sql_host_suffixes,
        sql_synth_url,
    )

    blocked = ", ".join(f"'{d}'" for d in sorted(set(_BLOCKED_DOMAINS)))
    return f"""
WITH d AS (SELECT doc_id, {sql_synth_url('doc_id')} AS url FROM documents),
b AS (SELECT doc_id, {sql_host('url')} AS host,
             {sql_canonical_url('url')} AS canon_url FROM d),
f AS (SELECT *, list_has_any({sql_host_suffixes('host')}, [{blocked}])
        AS blocked FROM b),
w AS (SELECT *, min(doc_id) OVER (PARTITION BY canon_url) AS elect FROM f)
SELECT doc_id, host, canon_url,
       CASE WHEN blocked THEN 'blocked_domain'
            WHEN doc_id = elect THEN 'keep'
            ELSE 'dup_url' END AS decision
FROM w
"""


def _q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/PaLM-style 13-gram overlap): the
    'benchmark' table is the first 30 words of every doc_id % 37 == 5
    document; any corpus document sharing a 13-gram with it is flagged
    with its distinct-hit count. The benchmark n-gram set is broadcast —
    the corpus (the 100 TB side) never shuffles; only hits (8-byte hash +
    id) reach the per-document aggregate. Hashes are the cross-engine
    md5-prefix family, so the oracle recomputes the full decision."""
    from openccnet_spark.operators.curation import decontaminate

    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 5).select(
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 30), " ").alias("text")
    )
    return decontaminate(docs, bench, n=13).select("doc_id", "n_hits")


def _q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sampling (domain-mixing
    primitive): keep iff md5-keyed draw mod 1e6 falls under the stratum's
    ppm rate; unknown strata take the default. Pure narrow filter — no
    shuffle, no RNG — and the oracle replays the draw exactly."""
    from openccnet_spark.operators.curation import stratified_sample

    docs = _read(spark, sf_dir, "documents")
    return stratified_sample(
        docs, _STRAT_RATES_PPM, default_ppm=_STRAT_DEFAULT_PPM
    ).select("doc_id", "lang", "sample_ppm")


def _q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget prefix selection ("give me N tokens per
    language, deterministically"): docs ordered by the 60-bit key, maximal
    prefix with running token total <= budget. The Spark plan is the
    bounded-domain histogram decomposition (cutoff bucket + boundary-only
    exact window — no per-stratum global sort); the oracle is the naive
    full-window spec, so the decomposition must equal it exactly."""
    from openccnet_spark.operators.curation import budget_select

    docs = _read(spark, sf_dir, "documents")
    handles: list = []
    out = budget_select(docs, _TOKEN_BUDGETS, persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_quality_top_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality gate (C4/FineWeb shape): keep the top 30% of each
    language by quality score, exact rank semantics with deterministic
    (score DESC, doc_id) tie-breaks and pure-integer ppm quotas. The
    Spark plan is the bounded-domain histogram decomposition (cutoff
    score from a <=1001-rows-per-lang histogram, strictly-better docs via
    broadcast join, ONLY the cutoff tie group pays a row_number window);
    the oracle is the naive per-language rank, so the decomposition must
    equal it exactly."""
    from openccnet_spark.operators.curation import top_fraction_select

    docs = _read(spark, sf_dir, "documents")
    handles: list = []
    out = top_fraction_select(docs, frac_ppm=_TOP_FRAC_PPM, persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


_PACK_WINDOW = 256


def _q_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline in ONE plan: Gopher repetition gate
    (narrow Arrow pass, lang/text carried through so no join back) ->
    per-language top-30% quality gate (histogram cutoff + tie window) ->
    sequence packing of the survivors (distributed exact prefix sum).
    The oracle chains the same three specs as CTEs, so the composition —
    not just each stage — is value-checked end to end."""
    from openccnet_spark.operators.curation import top_fraction_select
    from openccnet_spark.operators.packing import pack_chunks
    from openccnet_spark.operators.repetition import repetition_signals

    docs = _read(spark, sf_dir, "documents")
    handles: list = []
    rep = repetition_signals(docs, carry_cols=("lang", "text")).filter(
        F.col("keep") == 1
    )
    # both persists: the repetition Arrow stage + score expr otherwise
    # re-evaluate per branch of each downstream decomposition (3x in the
    # top-fraction select, 2x more in pack_chunks)
    gated = top_fraction_select(
        rep, frac_ppm=_TOP_FRAC_PPM, carry_cols=("text",),
        persist=True, handles=handles,
    )
    out = pack_chunks(gated, _PACK_WINDOW, persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concat-and-chop every document into
    256-token windows in deterministic (hash, id) order. The exact global
    prefix sum of token counts runs as the bucket decomposition (tiny
    per-bucket histogram + broadcast below-offsets + per-bucket windows —
    4096 parallel reducers, never one global sort); the oracle is the
    naive single-window prefix sum over the same order."""
    from openccnet_spark.operators.packing import pack_chunks

    docs = _read(spark, sf_dir, "documents")
    handles: list = []
    out = pack_chunks(docs, _PACK_WINDOW, persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


_SHARD_TOKENS = 1000


def _q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + manifest
    (operators/shards.py): shard = the packing chunk of each doc's exact
    global start offset (doc-granular, same-membership on any
    partitioning — the property a resumable training loader needs);
    manifest digests are order-free bit_xor of 60-bit doc hashes. The
    oracle is the naive single-window prefix sum grouped identically."""
    from openccnet_spark.operators.shards import shard_manifest

    docs = _read(spark, sf_dir, "documents")
    return shard_manifest(docs, _SHARD_TOKENS)


_BLOOM_M_BITS = 1 << 10  # deliberately tiny so false positives are
# actually exercised at sf0.01 (~62% fill, ~24% FP) and the oracle must
# reproduce every one; the operator's scale default is 2^20


def _q_dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental dedup with a broadcast-Bloom prefilter: batch =
    all documents, index = the 2/3 with doc_id % 3 != 0. bloom_hit is the
    deterministic bitmap answer (the oracle replays every bit via IN-tests
    on the index's position set — false positives included), is_new the
    exact verdict; bloom misses are proven new with zero shuffle and only
    the hit sliver touches the index (broadcast semi-join, index never
    shuffles)."""
    from openccnet_spark.operators.bloom import incremental_exact_dedup

    docs = _read(spark, sf_dir, "documents")
    handles: list = []
    out = incremental_exact_dedup(
        docs,
        docs.filter(F.col("doc_id") % 3 != 0),
        m_bits=_BLOOM_M_BITS,
        persist=True,
        handles=handles,
    )
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture rebalancing: subsample so the output
    is 40/30/20/10% of four sources — the largest total honoring every
    proportion, each stratum's prefix in (60-bit hash, id) order. The
    only collect is the per-source count rollup (bounded by #sources);
    selection reuses budget_select's histogram decomposition with unit
    weights. Oracle recomputes quotas and the hash-order ranks in SQL."""
    from openccnet_spark.operators.curation import mixture_rebalance

    docs = _read(spark, sf_dir, "documents")
    handles: list = []
    out = mixture_rebalance(docs, _MIX_TARGET_PPM, persist=True, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): per-doc
    char mass of repeated word n-grams as integer ppm (top 2/3/4-gram,
    duplicate 5/10-gram) plus the threshold keep flag. One narrow
    mapInPandas pass, zero shuffle; the oracle recomputes every n-gram's
    count and char mass by exploding in SQL."""
    from openccnet_spark.operators.repetition import repetition_signals

    docs = _read(spark, sf_dir, "documents")
    return repetition_signals(docs)


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distilled quality classifier: distributed deterministic training
    (one integer-EXACT normal-equations pass + 3 quantized Newton/IRLS
    rounds — every cross-partition reduction an order-free int64 sum, so
    the weights are bit-identical at any partitioning) of a linear
    student imitating the heuristic quality gate on the doc_id %% 2
    slice, then a pure-JVM integer scoring pass over EVERY document
    (explode -> broadcast weight table -> map-side combined sum). The
    oracle replays training bit-exactly in numpy and recomputes the
    integer scores in closed-form SQL. NB: like the IVF oracles, the
    replay trains on the sf0.01 tables (SPARK_GRAFT_ORACLE_SF_DIR)."""
    from openccnet_spark.operators.quality_model import (
        quantize_weights,
        score_frame,
        train_distributed,
    )

    docs = _read(spark, sf_dir, "documents")
    handles: list = []
    wq = quantize_weights(train_distributed(docs, sample_mod=2, handles=handles))
    out = score_frame(docs, wq)
    out._persist_handles = handles  # released by bench after materialization
    return out


#: (case_id, op, input, expected) for the St/Ts char-only goldens (O10)
_ST_TS_GOLDENS = [
    (0, "st", "发", "發"),
    (1, "st", "A发😀台!", "A發😀臺!"),
    (2, "ts", "發髮後臺", "发发后台"),
    (3, "ts", "A發😀臺!", "A发😀台!"),
    (4, "st", "", ""),
]

#: custom DeTofu layer for the goldens: a file-format entry (overrides the
#: builtin 𣭲->氄) plus a direct pair (overrides the builtin 𬴂->騑) —
#: reference DeTofuWithCustomFile/Pairs semantics (Opencc.cs:2373-2451)
_DETOFU_CUSTOM_TEXT = "𣭲\t氂\tB\n"
_DETOFU_CUSTOM_PAIRS = {"𬴂": "訂"}

#: (case_id, input, normalized, detofu_b, detofu_custom)
#: — O12 pre-pass, O13 post-pass, O13 custom-override post-pass
_NORM_DETOFU_GOLDENS = [
    (0, "豈更", "豈更", "豈更", "豈更"),   # compat ideographs -> canonical
    (1, "骖𬴂", "骖𬴂", "骖騑", "骖訂"),    # ExtB fallback; custom pair wins
    (2, "plain 文本", "plain 文本", "plain 文本", "plain 文本"),
    (3, "\U0002f800", "丽", "丽", "丽"),
    (4, "𣭲毛", "𣭲毛", "氄毛", "氂毛"),    # custom file entry overrides builtin
]

#: (case_id, input, preserve_on, preserve_off) — O14 IDS preservation (t2s)
_IDS_GOLDENS = [
    (0, "⿰口馬", "⿰口馬", "⿰口马"),
    (1, "漢字結構：⿰氵漢（漢）", "汉字结构：⿰氵漢（汉）", "汉字结构：⿰氵汉（汉）"),
    (2, "沒有結構符", "没有结构符", "没有结构符"),
]

_CUSTOM_DICT_TEXT = "软件\t軟體X\n自定义词\t自訂義詞\n"
#: (case_id, input, expected) with st_phrases append of the above (O15)
_CUSTOM_GOLDENS = [
    (0, "软件", "軟體X"),
    (1, "自定义词测试", "自訂義詞測試"),
    (2, "几千只", "幾千隻"),  # base lexicon still applies
]


def _q_st_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openccnet_spark.functions import st_udf, ts_udf

    df = spark.createDataFrame(
        [(i, op, t) for i, op, t, _e in _ST_TS_GOLDENS],
        "case_id int, op string, input string",
    )
    return df.select(
        "case_id", "op",
        F.when(F.col("op") == "st", st_udf()("input"))
        .otherwise(ts_udf()("input")).alias("output"),
    )


def _q_normalize_detofu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openccnet_spark.functions import detofu_udf, normalize_compat_udf

    df = spark.createDataFrame(
        [(i, t) for i, t, _n, _d, _c in _NORM_DETOFU_GOLDENS],
        "case_id int, input string",
    )
    return df.select(
        "case_id",
        normalize_compat_udf()("input").alias("normalized"),
        detofu_udf(0)(normalize_compat_udf()("input")).alias("detofu_b"),
        detofu_udf(
            0, custom_text=_DETOFU_CUSTOM_TEXT, custom_pairs=_DETOFU_CUSTOM_PAIRS
        )(normalize_compat_udf()("input")).alias("detofu_custom"),
    )


def _q_ids_preserve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openccnet_spark.functions import convert_udf

    df = spark.createDataFrame(
        [(i, t) for i, t, _on, _off in _IDS_GOLDENS], "case_id int, input string"
    )
    return df.select(
        "case_id",
        convert_udf("t2s", preserve_ids=True)("input").alias("preserve_on"),
        convert_udf("t2s", preserve_ids=False)("input").alias("preserve_off"),
    )


def _q_custom_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openccnet_spark.functions import convert_udf

    df = spark.createDataFrame(
        [(i, t) for i, t, _e in _CUSTOM_GOLDENS], "case_id int, input string"
    )
    custom = [("st_phrases", "append", _CUSTOM_DICT_TEXT)]
    return df.select(
        "case_id", convert_udf("s2t", custom=custom)("input").alias("output")
    )


def _q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup over the events stream table (SURVEY §2.2)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp("window_start").alias("window_epoch"),
            "event_type", "n_events", "value_cents",
        )
    )


def _q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (operators/temporal.py): each purchase gets the user's
    most recent prior-or-simultaneous view. No join node in the plan —
    one shuffle on user_id, then a running last(ignorenulls) carry down
    each user's merged timeline (kdb aj / DuckDB ASOF semantics,
    parallel per key). The oracle IS DuckDB's native ASOF LEFT JOIN."""
    from openccnet_spark.operators.temporal import asof_join

    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t_us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"), "user_id", "t_us",
        F.col("v_milli").alias("view_value_milli"),
    )
    j = asof_join(purchases, views, keys=["user_id"], ts_col="t_us")
    return j.select(
        "event_id", "user_id",
        F.col("r_view_event_id").alias("view_event_id"),
        F.col("r_view_value_milli").alias("view_value_milli"),
        (F.col("t_us") - F.col("r_t_us")).alias("gap_us"),
    )


def _q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join (operators/temporal.py): all of a user's events inside
    [signup, signup + 15 min), rolled up per anchor. The naive form is an
    inequality join (broadcast nested loop — a 100 TB scale-killer);
    here the anchor interval explodes to its <= 2 covered 15-minute
    buckets and candidates come from a plain shuffled equi-join on
    (user_id, bucket) with the exact predicate as a residual filter —
    plan-pinned nested-loop-free in tests. Sum is per-row-floored milli
    (integer, order-free); the oracle is the naive inequality join."""
    from openccnet_spark.operators.temporal import range_join

    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
    )
    win_us = 15 * 60 * 1_000_000
    anchors = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("anchor_id"), "user_id",
        F.col("t_us").alias("s_us"), (F.col("t_us") + win_us).alias("e_us"),
    )
    pairs = range_join(
        anchors, ev.drop("event_type"), keys=["user_id"],
        start_col="s_us", end_col="e_us", ts_col="t_us", bucket_width=win_us,
    ).filter(F.col("r_event_id") != F.col("anchor_id"))
    agg = pairs.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("r_v_milli").alias("sum_v"),
        F.max(F.col("r_t_us") - F.col("s_us")).alias("max_gap_us"),
    )
    return anchors.join(agg, "anchor_id", "left").select(
        "anchor_id", "user_id",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_v", F.lit(0)).cast("long").alias("sum_value_milli"),
        F.col("max_gap_us").cast("long").alias("max_gap_us"),
    )


def _q_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (operators/sketch.py): the sketch
    ingests weight-compressed distinct words, its counter table is
    d*w-bounded (4096 cells regardless of corpus size — sketch merging
    is the same elementwise sum), point estimates broadcast the sketch.
    The oracle rebuilds identical counters via the shared 60-bit hash
    family; est >= exact is the CMS guarantee, asserted in tests."""
    from openccnet_spark.operators.sketch import heavy_hitters

    return heavy_hitters(_read(spark, sf_dir, "documents"))


def _q_sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-word sketch (operators/hll.py): registers are
    built per corpus half and MERGED (elementwise max) while the oracle
    computes the register file directly from all words — a merge that is
    not union-equivalent hash-fails. Ingest pre-aggregates to the
    512-register grain (map-side combine bounds every exchange at m rows
    per partition regardless of corpus size); the returned histogram pins
    every register's content via an order-free xor digest, not just the
    final estimate."""
    from openccnet_spark.operators.hll import hll_histogram, hll_merge, hll_registers

    docs = _read(spark, sf_dir, "documents")

    def words(d: DataFrame) -> DataFrame:
        return d.select(
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("w")
        ).filter(F.col("w") != "")

    h0 = hll_registers(words(docs.filter(F.col("doc_id") % 2 == 0)), "w")
    h1 = hll_registers(words(docs.filter(F.col("doc_id") % 2 == 1)), "w")
    return hll_histogram(hll_merge(h0, h1))


def _q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-dup pairs -> components ->
    cluster-keyed deterministic 90/5/5 draw, so a document and its
    near-duplicates can never straddle splits (the eval-leakage bug).
    The oracle walks the same components via the recursive CTE and
    replays the hash draw — a single doc split apart from its mutant
    hash-fails."""
    from openccnet_spark.operators.components import canonical_documents
    from openccnet_spark.operators.curation import leakage_safe_split
    from openccnet_spark.operators.dedup import minhash_near_duplicates

    docs = _mutant_docs(spark, sf_dir)
    pair_handles: list = []
    comp_handles: list = []
    pairs = minhash_near_duplicates(docs, persist=True, handles=pair_handles)
    lab = canonical_documents(
        pairs, docs, reliable=True, checkpoint_interval=4, handles=comp_handles
    )
    out = leakage_safe_split(lab).select("doc_id", "component", "split")
    for h in pair_handles:
        h.unpersist()
    out._persist_handles = comp_handles
    return out


_DSIR_FRAC_PPM = 250000


def _q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/dsir.py): carve the
    zh-like quarter out of the corpus. Feature counts are bucket-bounded
    aggregations (two <=4096-row collects), the log-ratio weight solve is
    driver-side milli-quantized integers both engines consume, scoring is
    a broadcast-join integer dot, and the selection is the exact-rank
    top-fraction over the clamped bounded-domain average. The oracle
    recounts features independently in Python and replays everything."""
    from openccnet_spark.operators.dsir import (
        bucket_counts,
        dsir_select,
        dsir_weights,
    )

    docs = _read(spark, sf_dir, "documents")
    raw = {r["bucket"]: r["cnt"] for r in bucket_counts(docs).collect()}
    tgt = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(docs.filter(F.col("lang") == "zh")).collect()
    }
    return dsir_select(docs, dsir_weights(tgt, raw), frac_ppm=_DSIR_FRAC_PPM)


def _q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-scoped embedding dedup over the planted
    doubled corpus (every vector has an exact copy at id+100000, so a
    wrong cluster assignment, missed pair or wrong smallest-id election
    hash-fails). Training is the distributed deterministic k-means; the
    oracle replays it bit-exactly and re-derives clusters, guard, and
    carried-norm cosine in SQL."""
    from openccnet_spark.operators.similarity import semantic_dedup

    emb = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    )
    handles: list = []
    out = semantic_dedup(doubled, threshold_milli=990, handles=handles)
    out._persist_handles = handles  # released by bench after materialization
    return out


def _q_conv_fold_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-turn folding (operators/conversations.py): tool turns merge
    into the assistant and consecutive same-role runs collapse via ONE
    JVM aggregate fold over the per-conv sorted array — the text payload
    shuffles exactly once on conv_id (conversation-bounded state). The
    oracle is the independent lag-window/string_agg formulation."""
    from openccnet_spark.operators.conversations import fold_tool_turns

    return fold_tool_turns(spark_transcripts(spark, n_conv_for_sf(sf_dir)))


def _q_conv_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level quality gate: per-turn keep labels from the
    real pipeline aggregate to a per-conv decision (integer-exact kept
    fraction, no-assistant beats low-fraction). Pure groupBy counters —
    the exchange carries four scalars per conversation."""
    from openccnet_spark.operators.conversations import conversation_gate

    df = spark_transcripts(spark, n_conv_for_sf(sf_dir))
    labeled = quality_filter(df, config="t2s", salt_partitions=32).select(
        "conv_id", "role", "keep"
    )
    return conversation_gate(labeled)


def _q_conv_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact conversation dedup: ordered length-prefixed (role, text)
    serialization -> 60-bit fingerprint -> min-conv_id election. After
    the one conv_id shuffle everything exchanged is scalar-per-conv; the
    synthetic corpus is heavily duplicated (~3000 convs -> ~600 distinct
    at sf0.01), so a wrong ordering or serialization hash-fails loudly."""
    from openccnet_spark.operators.conversations import conversation_fingerprints

    return conversation_fingerprints(spark_transcripts(spark, n_conv_for_sf(sf_dir)))


def _q_conv_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: fold tool turns, then serialize each conversation to
    one <|role|>-tagged training string (the packing.pack_chunks input).
    The oracle nests the fold SQL inside the render SQL."""
    from openccnet_spark.operators.conversations import (
        fold_tool_turns,
        render_chat_template,
    )

    folded = fold_tool_turns(spark_transcripts(spark, n_conv_for_sf(sf_dir)))
    return render_chat_template(folded)


def _q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (operators/hypertable.py): raw events
    aggregate ONCE at 15-min grain; hourly re-aggregates the 15-min
    OUTPUT, daily the hourly — each cascade input is bucket-count-sized,
    never corpus-sized. Values floor to integer milli at the base level
    so every level is order-free; the oracle computes the DAILY level
    directly from raw events, pinning re-aggregation associativity."""
    from openccnet_spark.operators.hypertable import rollup_cascade

    daily = rollup_cascade(_read(spark, sf_dir, "events"))[-1]
    return daily.select(
        (F.col("bucket") * 86400).cast("long").alias("day_epoch"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_v_milli").cast("long").alias("sum_v_milli"),
        F.col("min_v_milli").cast("long").alias("min_v_milli"),
        F.col("max_v_milli").cast("long").alias("max_v_milli"),
    )


def _q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user via windows."""
    from pyspark.sql.window import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_s", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_s").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _replay_n_conv(sf_dir: str) -> int:
    """Conversation count for the streaming replay fixture — a slice of the
    transcripts scale so the stream stays a few-second job at bench SF."""
    return max(n_conv_for_sf(sf_dir) // 5, 60)


def _q_streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming replay dedup END TO END, driver-visible: the deterministic
    transcripts table is written TWICE (an at-least-once upstream's
    replayed batch), read back as a file stream in multiple micro-batches
    (maxFilesPerTrigger=8 over 10 files), deduplicated on
    (conv_id, turn_idx) by `streaming_dedup_turns`'s watermark state, and
    written to a parquet sink with an availableNow trigger. The returned
    frame is the FINAL SINK TABLE; the oracle regenerates the transcripts
    in SQL — exactly-once output means sink == one copy of the source.
    The watermark is sized past the fixture's event-time span so replayed
    whole-history batches are deduplicated, not dropped as late."""
    import shutil

    from openccnet_spark.streaming import replay_dedup_run

    n_conv = _replay_n_conv(sf_dir)
    base = spark_transcripts(spark, n_conv)
    root = tempfile.mkdtemp(prefix="openccnet-replay-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    src = os.path.join(root, "src")
    base.repartition(6).write.parquet(os.path.join(src, "a"))
    base.repartition(4).write.parquet(os.path.join(src, "b"))
    watermark_days = n_conv * 211 // 86_400 + 2  # > max event-time span
    final = replay_dedup_run(
        spark,
        src + "/*",
        os.path.join(root, "sink"),
        os.path.join(root, "ckpt"),
        watermark=f"{watermark_days} days",
    )
    return final.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


def _q_streaming_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tier's CORE pipeline (conversion + langid + ppl + heuristics +
    scrub) run INCREMENTALLY: the deterministic transcripts table is
    written as 8 parquet files, read back as a file stream in multiple
    micro-batches (maxFilesPerTrigger=4 -> 2 batches; fewer, larger
    micro-batches amortize the per-batch scheduler + sink-commit cost,
    the streaming analog of guide §2.2's fewer-larger-partitions rule,
    while still exercising incremental execution), passed through the SAME
    `quality_filter` the batch query uses (the gate is stateless per
    turn, so it lifts to streaming unchanged), and appended to a parquet
    sink under an availableNow trigger with a streaming checkpoint. The
    returned frame is the FINAL SINK TABLE and the oracle is the batch
    pipeline's pool-literal oracle UNCHANGED — incremental execution must
    produce byte-identical per-turn output to the batch plan."""
    import shutil

    from openccnet_spark.streaming import (
        read_transcripts_stream,
        streaming_quality_filter,
    )

    base = spark_transcripts(spark, n_conv_for_sf(sf_dir))
    root = tempfile.mkdtemp(prefix="openccnet-sqf-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    src = os.path.join(root, "src")
    base.repartition(8).write.parquet(src)
    stream = read_transcripts_stream(spark, src, max_files_per_trigger=4)
    out = streaming_quality_filter(stream, config="t2s").select(
        "conv_id", "turn_idx", "keep", "drop_reason", "lang",
        "text_converted", "text_scrubbed",
        F.floor(F.col("ppl") * 1000).cast("long").alias("ppl_milli"),
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", os.path.join(root, "sink"))
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(root, "sink"))


def _q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + filtered agg + deterministic top-10."""
    cust = _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _read(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_cents")
        )
        .select(
            "l_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "revenue_cents",
        )
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join -> per-nation revenue."""
    region = _read(spark, sf_dir, "region")
    nation = _read(spark, sf_dir, "nation")
    cust = _read(spark, sf_dir, "customer")
    supp = _read(spark, sf_dir, "supplier")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(supp.s_nationkey == cust.c_nationkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic top-k (order/limit with total tiebreak)."""
    orders = _read(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("spend_cents"))
        .orderBy(F.desc("spend_cents"), F.asc("o_custkey"))
        .limit(10)
    )


def _q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: AUTOMOBILE customers EXCEPT those with an open order,
    INTERSECTed with customers holding a positive balance."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    positive = cust.filter(F.col("c_acctbal") > 0).select("c_custkey")
    return auto.exceptAll(open_cust).distinct().intersect(positive)


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping id."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n", "sum_qty",
        )
    )


def _q_zho_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script detection (O11) at table scale over synthesized transcripts."""
    from openccnet_spark.functions import zho_check_udf

    df = spark_transcripts(spark, n_conv_for_sf(sf_dir))
    return (
        df.withColumn("zho", zho_check_udf()("text"))
        .groupBy("zho")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's CORRECTNESS gate checks the FIRST 50
    # keys in definition order. The first-50 window therefore rotates per
    # round to prioritize (a) queries that have never had a driver entry,
    # (b) queries whose implementation changed this round, then (c) one
    # representative per long-green family. Everything past position 50 is
    # still covered by tests/test_entry_contract.py's oracle replay.
    return {
        # -- flagship + conversion representatives (long-green) ------------
        "pipeline_transcripts": _armed(_q_pipeline),
        "convert_goldens": _armed(_q_convert_goldens),
        **(
            {"bundle_zstd_convert": _armed(_q_bundle_zstd_convert)}
            if os.path.exists(_ZSTD_BUNDLE)
            else {}
        ),
        # -- never driver-checked (registered at r7 tail positions 88-95;
        #    rotated in per the r7 verdict's standing fix) ------------------
        "dedup_substring": _armed(_q_dedup_substring),
        "url_host_rank": _armed(_q_url_host_rank),
        "conv_pack": _armed(_q_conv_pack),
        "html_boilerplate": _armed(_q_html_boilerplate),
        "decontaminate_semantic": _armed(_q_decontaminate_semantic),
        "snapshot_time_travel": _armed(_q_snapshot_time_travel),
        "url_robots_gate": _armed(_q_url_robots_gate),
        "crawl_budget": _armed(_q_crawl_budget),
        # -- operators whose internals changed in round 8 (persists,
        #    band-key packing, fused Arrow passes, components init,
        #    LSH pair-first verify) — the driver must re-certify these ----
        "dedup_minhash": _armed(_q_dedup_minhash),
        "dedup_simhash": _armed(_q_dedup_simhash),
        "dedup_passage": _armed(_q_dedup_passage),
        "dedup_components": _armed(_q_dedup_components),
        "dedup_components_star": _armed(_q_dedup_components_star),
        "dedup_canonical": _armed(_q_dedup_canonical),
        "split_leakage_safe": _armed(_q_split_leakage_safe),
        "dedup_incremental": _armed(_q_dedup_incremental),
        "dedup_embedding_lsh": _armed(_q_dedup_embedding_lsh),
        "similarity_ann": _armed(_q_similarity_ann),
        "similarity_recall": _armed(_q_similarity_recall),
        "dedup_semantic": _armed(_q_dedup_semantic),
        "quality_top_fraction": _armed(_q_quality_top_fraction),
        "budget_select": _armed(_q_budget_select),
        "mixture_rebalance": _armed(_q_mixture_rebalance),
        "pack_chunks": _armed(_q_pack_chunks),
        "curation_e2e": _armed(_q_curation_e2e),
        "streaming_quality_filter": _armed(_q_streaming_quality_filter),
        "streaming_dedup_replay": _armed(_q_streaming_dedup_replay),
        # -- per-turn shared-code consumers (langid/ppl/scrub micro-opts;
        #    outputs bit-identical but the driver should prove it) ---------
        "quality_documents": _armed(_q_quality_documents),
        "conv_fold_tools": _armed(_q_conv_fold_tools),
        "conv_gate": _armed(_q_conv_gate),
        "conv_dedup_exact": _armed(_q_conv_dedup_exact),
        "conv_render": _armed(_q_conv_render),
        # -- long-green family representatives ------------------------------
        "lm_train": _armed(_q_lm_train),
        "lm_score": _armed(_q_lm_score),
        "lm_bucket": _armed(_q_lm_bucket),
        "lm_score_lang": _armed(_q_lm_score_lang),
        "lm_score_trigram": _armed(_q_lm_score_trigram),
        "url_canonicalize": _armed(_q_url_canonicalize),
        "url_dedup": _armed(_q_url_dedup),
        "url_domain_gate": _armed(_q_url_domain_gate),
        "dedup_exact": _armed(_q_dedup_exact),
        "similarity_ivf": _armed(_q_similarity_ivf),
        "quality_classifier": _armed(_q_quality_classifier),
        "dedup_bloom_prefilter": _armed(_q_dedup_bloom_prefilter),
        "warc_extract": _armed(_q_warc_extract),
        "pdf_reflow_convert": _armed(_q_pdf_reflow_convert),
        "office_convert": _armed(_q_office_convert),
        # ======================= position 50 cutoff ========================
        # Everything below has driver-green history (r5-r7) and stays pinned
        # by tests/test_entry_contract.py's oracle replay.
        "zho_check_goldens": _armed(_q_zho_check),
        "st_ts_goldens": _armed(_q_st_ts),
        "normalize_detofu_goldens": _armed(_q_normalize_detofu),
        "textfiles_encodings": _armed(_q_textfiles_encodings),
        "ids_preserve_goldens": _armed(_q_ids_preserve),
        "custom_dict_convert": _armed(_q_custom_dict),
        "events_window": _armed(_q_events_window),
        "events_sessionize": _armed(_q_events_sessionize),
        "events_asof_join": _armed(_q_events_asof_join),
        "events_range_join": _armed(_q_events_range_join),
        "sketch_heavy_hitters": _armed(_q_sketch_heavy_hitters),
        "sketch_hll_distinct": _armed(_q_sketch_hll_distinct),
        "hypertable_rollup": _armed(_q_hypertable_rollup),
        "shard_manifest": _armed(_q_shard_manifest),
        "zho_check_transcripts": _armed(_q_zho_transcripts),
        "topk_customers": _armed(_q_topk_customers),
        "shipping_priority": _armed(_q_shipping_priority),
        "nation_volume": _armed(_q_nation_volume),
        "set_ops": _armed(_q_set_ops),
        "grouping_sets": _armed(_q_grouping_sets),
        "metrics_rollup": _armed(_q_metrics_rollup),
        "filter_project": _armed(_q_filter_project),
        "broadcast_join": _armed(_q_broadcast_join),
        "window_first_order": _armed(_q_window_first_order),
        "antijoin_resume": _armed(_q_antijoin_resume),
        "dedup_exact_prehash": _armed(_q_dedup_exact_prehash),
        "dedup_ngram_jaccard": _armed(_q_dedup_ngram_jaccard),
        "skew_join_priority": _armed(_q_skew_join_priority),
        "dedup_embedding": _armed(_q_dedup_embedding),
        "similarity_topk": _armed(_q_similarity_topk),
        "similarity_ivf_sampled": _armed(_q_similarity_ivf_sampled),
        "similarity_recall_planted": _armed(_q_similarity_recall_planted),
        "textstats": _armed(_q_textstats),
        "vocab_topk": _armed(_q_vocab_topk),
        "bpe_train": _armed(_q_bpe_train),
        "bpe_tokenize": _armed(_q_bpe_tokenize),
        "quality_quantiles": _armed(_q_quality_quantiles),
        "multimodal_features": _armed(_q_multimodal_features),
        "multimodal_decode": _armed(_q_multimodal_decode),
        "multimodal_audio": _armed(_q_multimodal_audio),
        "multimodal_video": _armed(_q_multimodal_video),
        "decontaminate_ngram": _armed(_q_decontaminate_ngram),
        "dsir_select": _armed(_q_dsir_select),
        "sample_stratified": _armed(_q_sample_stratified),
        "quality_repetition": _armed(_q_quality_repetition),
    }


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _pipeline_oracle(sf_dir_sf: str = "sf0.01") -> str:
    """Pool-literal oracle: regenerate the identical transcripts table in
    SQL, then look up the expected label of each turn by pool index. The
    labels are computed by the pure-Python *reference path* — this is the
    F1/byte-exactness gate of BASELINE.json, executed by the driver."""
    cc = Converter()
    keeps, reasons, langs, convs, scrubs, ppls, reps = [], [], [], [], [], [], []
    for i, (base, rep) in enumerate(POOL):
        full = reference_label(pool_text(i), "t2s", converter=cc)
        keeps.append("true" if full["keep"] else "false")
        reasons.append(_sq(full["drop_reason"]))
        langs.append(_sq(full["lang"]) if full["lang"] is not None else "NULL")
        ppls.append(
            str(math.floor(full["ppl"] * 1000)) if full["ppl"] is not None else "NULL"
        )
        reps.append(str(rep))
        if full["text_converted"] is None:
            convs.append("NULL")
            scrubs.append("NULL")
            continue
        # converted/scrubbed of (base*rep) must equal (converted/scrubbed of
        # base)*rep so the SQL can use repeat(); guaranteed because every
        # rep>1 entry ends with a delimiter (no cross-junction match) —
        # assert here so a pool edit can't silently break the oracle.
        base_ref = reference_label(base, "t2s", converter=cc)
        assert full["text_converted"] == base_ref["text_converted"] * rep, i
        assert full["text_scrubbed"] == base_ref["text_scrubbed"] * rep, i
        convs.append(_sq(base_ref["text_converted"]))
        scrubs.append(_sq(base_ref["text_scrubbed"]))
    n_conv = n_conv_for_sf(sf_dir_sf)
    return f"""
WITH t AS ({transcripts_sql(n_conv)})
SELECT conv_id, turn_idx,
       ([{', '.join(keeps)}])[pool_idx + 1] AS keep,
       ([{', '.join(reasons)}])[pool_idx + 1] AS drop_reason,
       ([{', '.join(langs)}])[pool_idx + 1] AS lang,
       repeat(([{', '.join(convs)}])[pool_idx + 1],
              ([{', '.join(reps)}])[pool_idx + 1]) AS text_converted,
       repeat(([{', '.join(scrubs)}])[pool_idx + 1],
              ([{', '.join(reps)}])[pool_idx + 1]) AS text_scrubbed,
       ([{', '.join(ppls)}])[pool_idx + 1]::BIGINT AS ppl_milli
FROM t
"""


def _convert_goldens_oracle() -> str:
    rows = ", ".join(
        f"({i}, {_sq(c)}, {_sq(e)})" for i, (c, _p, _t, e) in enumerate(CONVERT_GOLDENS)
    )
    return (
        "SELECT case_id::INT AS case_id, config, output "
        f"FROM (VALUES {rows}) AS v(case_id, config, output)"
    )


def _zho_oracle() -> str:
    rows = ", ".join(f"({i}, {e})" for i, (_t, e) in enumerate(ZHO_CHECK_GOLDENS))
    return f"SELECT case_id::INT AS case_id, zho::INT AS zho FROM (VALUES {rows}) AS v(case_id, zho)"


def _quality_documents_oracle() -> str:
    t = "coalesce(text, '')"
    return f"""
SELECT doc_id,
       length({t})::BIGINT AS char_len,
       len(string_split({t}, ' '))::BIGINT AS word_cnt,
       floor({Q.sql_uniq_ratio(t)} * 1000)::BIGINT AS uniq_milli,
       floor({Q.sql_symbol_ratio(t)} * 1000)::BIGINT AS symbol_milli,
       {Q.sql_drop_reason(t)} AS drop_reason,
       {Q.sql_lang_simple(t)} AS lang_simple,
       {Q.sql_scrub(t)} AS text_scrubbed
FROM documents
"""


def oracle_sql() -> dict[str, str]:
    return {
        "pipeline_transcripts": _pipeline_oracle("sf0.01"),
        # incremental execution must equal the batch plan byte-for-byte,
        # so the streaming query shares the batch pipeline's oracle
        "streaming_quality_filter": _pipeline_oracle("sf0.01"),
        "quality_documents": _quality_documents_oracle(),
        "convert_goldens": _convert_goldens_oracle(),
        # the zstd-loaded bundle must produce the SAME goldens (the
        # expected literals ARE the independent check — they were written
        # against the reference's own outputs)
        **(
            {"bundle_zstd_convert": _convert_goldens_oracle()}
            if os.path.exists(_ZSTD_BUNDLE)
            else {}
        ),
        "zho_check_goldens": _zho_oracle(),
        "metrics_rollup": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(floor(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_base_cents,
       sum(floor(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "filter_project": """
SELECT l_orderkey, l_linenumber,
       floor(l_extendedprice * l_discount * 100)::BIGINT AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_quantity < 24
""",
        "broadcast_join": """
SELECT n_name, c_mktsegment,
       count(*) AS n_orders,
       sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, c_mktsegment
""",
        "window_first_order": """
SELECT o_custkey, first_orderkey FROM (
  SELECT o_custkey, o_orderkey AS first_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
""",
        "antijoin_resume": """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1997-01-01')
""",
        "dedup_exact": """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents
)
SELECT min(doc_id) AS canonical_id, count(*)::BIGINT AS n_copies
FROM d GROUP BY text
""",
        "dedup_passage": _passage_oracle(),
        "dedup_substring": _substring_oracle(),
        "url_host_rank": _host_rank_oracle(),
        "conv_pack": _conv_pack_oracle("sf0.01"),
        "html_boilerplate": _boilerplate_oracle(),
        "decontaminate_semantic": _decontaminate_semantic_oracle(),
        "snapshot_time_travel": _snapshot_oracle(),
        "url_robots_gate": _robots_oracle(),
        "crawl_budget": _crawl_budget_oracle(),
        "dedup_minhash": _dedup_minhash_oracle(),
        "dedup_ngram_jaccard": _dedup_minhash_oracle(),
        "dedup_components": _dedup_components_oracle(),
        "split_leakage_safe": _split_leakage_oracle(),
        "dedup_components_star": _dedup_components_oracle(),
        "dedup_canonical": _dedup_canonical_oracle(),
        "dedup_incremental": _dedup_incremental_oracle(),
        "skew_join_priority": """
SELECT o.o_orderpriority,
       sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100)::BIGINT)::BIGINT
         AS revenue_cents,
       count(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
        "dedup_embedding": _dedup_embedding_oracle(),
        "dedup_embedding_lsh": _dedup_embedding_oracle(),
        "similarity_topk": _similarity_topk_oracle(),
        "textstats": _textstats_oracle(),
        "vocab_topk": _vocab_topk_oracle(),
        "quality_quantiles": _quality_quantiles_oracle(),
        "multimodal_features": """
SELECT doc_id,
       octet_length(encode(coalesce(text, '')))::BIGINT AS n_bytes,
       'opaque' AS format,
       NULL::VARCHAR AS mode,
       NULL::INT AS width,
       NULL::INT AS height
FROM documents
""",
        # closed-form replay of multimodal.synth_image_payload + decode:
        # dims/format/mode from doc_id, per-channel sums by folding the
        # pixel formula over a bounded (x, y, c) grid. Gray images
        # replicate channel 0 (channel_sums contract).
        "multimodal_decode": """
WITH imgs AS (
  SELECT doc_id,
         (16 + doc_id % 93)::INT AS width,
         (12 + doc_id % 61)::INT AS height,
         CASE WHEN doc_id % 3 = 2 THEN 'bmp' ELSE 'png' END AS format,
         CASE WHEN doc_id % 3 = 1 THEN 'L' ELSE 'RGB' END AS mode,
         CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END::INT AS channels
  FROM documents WHERE doc_id % 13 = 0
),
sums AS (
  SELECT i.doc_id, c.c,
         sum((i.doc_id * 7 + 3 * x.x + 5 * y.y + 11 * c.c) % 256)::BIGINT AS s
  FROM imgs i
  CROSS JOIN generate_series(0, 108) AS x(x)
  CROSS JOIN generate_series(0, 72) AS y(y)
  CROSS JOIN generate_series(0, 2) AS c(c)
  WHERE x.x < i.width AND y.y < i.height AND c.c < i.channels
  GROUP BY 1, 2
)
SELECT i.doc_id, i.format, i.mode, i.width, i.height, i.channels,
       r.s AS sum_r,
       coalesce(g.s, r.s) AS sum_g,
       coalesce(b.s, r.s) AS sum_b
FROM imgs i
JOIN sums r ON r.doc_id = i.doc_id AND r.c = 0
LEFT JOIN sums g ON g.doc_id = i.doc_id AND g.c = 1
LEFT JOIN sums b ON b.doc_id = i.doc_id AND b.c = 2
""",
        # closed-form replay of multimodal.synth_audio_payload + decode:
        # metadata from doc_id, per-channel sums by folding the sample
        # formula over a bounded (frame, channel) grid. Mono replicates
        # channel 0 (channel_sums contract, like gray images).
        "warc_extract": r"""
WITH d AS (
  SELECT doc_id, coalesce(lang, 'und') AS lang,
         trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')) AS t
  FROM documents
)
SELECT doc_id,
       'http://sf.test/' || lang || '/' || doc_id AS url,
       200 AS http_status,
       printf('2026-01-%02dT00:00:%02dZ', doc_id % 28 + 1, doc_id % 60)
           AS warc_date,
       length(t)::BIGINT AS n_chars,
       ('0x' || substr(md5(t), 1, 15))::BIGINT AS text_h60
FROM d
""",
        "multimodal_audio": """
WITH au AS (
  SELECT doc_id,
         (200 + doc_id % 331)::BIGINT AS n_samples,
         (8000 + (doc_id % 5) * 1000)::INT AS sample_rate,
         (1 + doc_id % 2)::INT AS channels,
         (CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END)::INT AS bits
  FROM documents WHERE doc_id % 11 = 5
),
sums AS (
  SELECT a.doc_id, c.c,
         sum(CASE WHEN a.bits = 8
                  THEN (a.doc_id * 13 + 7 * i.i + 11 * c.c) % 256
                  ELSE (a.doc_id * 13 + 7 * i.i + 11 * c.c) % 4096 - 2048
             END)::BIGINT AS s
  FROM au a
  CROSS JOIN generate_series(0, 530) AS i(i)
  CROSS JOIN generate_series(0, 1) AS c(c)
  WHERE i.i < a.n_samples AND c.c < a.channels
  GROUP BY 1, 2
)
SELECT a.doc_id, 'wav' AS format, a.sample_rate, a.channels, a.bits,
       a.n_samples,
       s0.s AS sum_ch0,
       coalesce(s1.s, s0.s) AS sum_ch1
FROM au a
JOIN sums s0 ON s0.doc_id = a.doc_id AND s0.c = 0
LEFT JOIN sums s1 ON s1.doc_id = a.doc_id AND s1.c = 1
""",
        # closed-form replay of multimodal.synth_video_payload + GIF decode
        # + every-2nd-frame sampling: geometry/frame count from doc_id,
        # per-frame RGB sums by folding palette(idx) over the (x, y) grid.
        # Palette channels are affine-mod-256 in the index (17i, 29i, 43i).
        "multimodal_video": """
WITH vids AS (
  SELECT doc_id,
         (8 + doc_id % 9)::INT AS width,
         (6 + doc_id % 5)::INT AS height,
         (4 + doc_id % 7)::INT AS n_frames
  FROM documents WHERE doc_id % 17 = 3
),
frames AS (
  SELECT v.doc_id, v.width, v.height, v.n_frames, f.f::INT AS frame_idx
  FROM vids v CROSS JOIN generate_series(0, 9) AS f(f)
  WHERE f.f < v.n_frames AND f.f % 2 = 0
),
sums AS (
  SELECT fr.doc_id, fr.frame_idx,
         sum((17 * ((fr.doc_id + 3 * x.x + 5 * y.y + 7 * fr.frame_idx) % 16)) % 256)::BIGINT AS sum_r,
         sum((29 * ((fr.doc_id + 3 * x.x + 5 * y.y + 7 * fr.frame_idx) % 16)) % 256)::BIGINT AS sum_g,
         sum((43 * ((fr.doc_id + 3 * x.x + 5 * y.y + 7 * fr.frame_idx) % 16)) % 256)::BIGINT AS sum_b
  FROM frames fr
  CROSS JOIN generate_series(0, 15) AS x(x)
  CROSS JOIN generate_series(0, 9) AS y(y)
  WHERE x.x < fr.width AND y.y < fr.height
  GROUP BY 1, 2
)
SELECT fr.doc_id, 'gif' AS format, fr.n_frames, fr.width, fr.height,
       fr.frame_idx, 4::INT AS delay_cs, s.sum_r, s.sum_g, s.sum_b
FROM frames fr
JOIN sums s ON s.doc_id = fr.doc_id AND s.frame_idx = fr.frame_idx
""",
        # full replay of curation.decontaminate: same 13-grams, same
        # md5-prefix 60-bit hashes, same distinct-hit counts
        "decontaminate_ngram": """
WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bench AS (SELECT string_split(text, ' ')[1:30] AS w
          FROM documents WHERE doc_id % 37 = 5),
bp AS (SELECT w, unnest(generate_series(1, len(w) - 12)) AS i FROM bench),
bng AS (SELECT DISTINCT
          ('0x' || substr(md5(array_to_string(w[i:i+12], ' ')), 1, 15))::BIGINT AS ng
        FROM bp),
cp AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 12)) AS i FROM corpus),
cng AS (SELECT DISTINCT doc_id,
          ('0x' || substr(md5(array_to_string(w[i:i+12], ' ')), 1, 15))::BIGINT AS ng
        FROM cp)
SELECT c.doc_id, count(*)::BIGINT AS n_hits
FROM cng c JOIN bng b USING (ng)
GROUP BY 1
""",
        # the URL family rebuilds the messy URL and every normalization
        # step from the same pattern constants as the Spark side
        # (operators/urls.py sql_* twins)
        "url_canonicalize": _sql_url_canonicalize(),
        "url_dedup": _sql_url_dedup(),
        "url_domain_gate": _sql_url_domain_gate(),
        # the LM family recomputes training counts, the integer model
        # tables and every corpus score from scratch (operators/lm.py)
        "lm_train": f"WITH {_sql_lm_cte()} SELECT a, b, ppm FROM bpm",
        "lm_score": f"WITH {_sql_lm_cte()} "
        "SELECT doc_id, n_bigrams, score_ppm FROM sc",
        "lm_score_lang": """
WITH tr AS (SELECT lang, text FROM documents WHERE doc_id % 13 = 3),
tw AS (SELECT lang, list_filter(string_split(text, ' '), x -> x <> '')
         AS w FROM tr),
bg AS (SELECT lang, w[i] AS a, w[i+1] AS b FROM
        (SELECT lang, w, unnest(generate_series(1, len(w)-1)) AS i
         FROM tw WHERE len(w) >= 2)),
bc AS (SELECT lang, a, b, count(*)::BIGINT AS cnt_ab FROM bg
       GROUP BY 1, 2, 3),
uni AS (SELECT lang, unnest(w) AS a FROM tw),
uc AS (SELECT lang, a, count(*)::BIGINT AS cnt_a FROM uni GROUP BY 1, 2),
tot AS (SELECT lang, count(*)::BIGINT AS t FROM uni GROUP BY 1),
bpm AS (SELECT bc.lang, bc.a, bc.b,
               ((cnt_ab * 1000000) // cnt_a)::BIGINT AS ppm
        FROM bc JOIN uc USING (lang, a)),
bo AS (SELECT uc.lang, a AS b,
              ((2 * cnt_a * 1000000) // (5 * t))::BIGINT AS ppm
       FROM uc JOIN tot USING (lang)),
cw AS (SELECT doc_id, lang,
              list_filter(string_split(text, ' '), x -> x <> '') AS w
       FROM documents),
cbg AS (SELECT doc_id, lang, w[i] AS a, w[i+1] AS b FROM
         (SELECT doc_id, lang, w, unnest(generate_series(1, len(w)-1)) AS i
          FROM cw WHERE len(w) >= 2)),
tok AS (SELECT doc_id, cbg.lang, coalesce(bpm.ppm, bo.ppm, 0) AS tok_ppm
        FROM cbg LEFT JOIN bpm USING (lang, a, b)
                 LEFT JOIN bo USING (lang, b))
SELECT doc_id, lang, count(*)::BIGINT AS n_bigrams,
       (sum(tok_ppm)::BIGINT // count(*))::BIGINT AS score_ppm
FROM tok GROUP BY 1, 2
""",
        # trigram order reuses the shared chain's trusted counts (bc),
        # model tables (bpm, bo) and tokenized corpus (cw); unreferenced
        # tail CTEs (tok, sc) are dead and never evaluated
        "lm_score_trigram": f"""
WITH {_sql_lm_cte()},
tc AS (SELECT a, b, c, count(*)::BIGINT AS cnt_abc FROM
        (SELECT w[i] AS a, w[i+1] AS b, w[i+2] AS c FROM
          (SELECT w, unnest(generate_series(1, len(w)-2)) AS i
           FROM tw WHERE len(w) >= 3))
       GROUP BY 1, 2, 3),
tpm AS (SELECT tc.a, tc.b, tc.c,
               ((cnt_abc * 1000000) // cnt_ab)::BIGINT AS ppm
        FROM tc JOIN bc USING (a, b)),
cfp AS (SELECT doc_id, w[1] AS a, w[2] AS b FROM cw WHERE len(w) >= 2),
tok1 AS (SELECT doc_id, coalesce(bpm.ppm, bo.ppm, 0) AS tok_ppm
         FROM cfp LEFT JOIN bpm USING (a, b) LEFT JOIN bo USING (b)),
ctg AS (SELECT doc_id, w[i] AS a, w[i+1] AS b, w[i+2] AS c FROM
         (SELECT doc_id, w, unnest(generate_series(1, len(w)-2)) AS i
          FROM cw WHERE len(w) >= 3)),
tok3 AS (SELECT doc_id,
                coalesce(tpm.ppm,
                         (2 * coalesce(p2.ppm, p1.ppm, 0)) // 5) AS tok_ppm
         FROM ctg LEFT JOIN tpm USING (a, b, c)
                  LEFT JOIN bpm p2 ON p2.a = ctg.b AND p2.b = ctg.c
                  LEFT JOIN bo p1 ON p1.b = ctg.c),
u AS (SELECT * FROM tok1 UNION ALL SELECT * FROM tok3)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       (sum(tok_ppm)::BIGINT // count(*))::BIGINT AS score_ppm
FROM u GROUP BY 1
""",
        "lm_bucket": f"""
WITH {_sql_lm_cte()},
sl AS (SELECT sc.doc_id, d.lang, sc.score_ppm
       FROM sc JOIN documents d USING (doc_id)),
r AS (SELECT *,
        row_number() OVER (PARTITION BY lang
                           ORDER BY score_ppm DESC, doc_id) AS rn,
        count(*) OVER (PARTITION BY lang) AS n
      FROM sl)
SELECT doc_id, lang, score_ppm,
       CASE WHEN rn <= least(n, (n * 100000 + 999999) // 1000000)
              THEN 'head'
            WHEN rn <= least(n, (n * 400000 + 999999) // 1000000)
              THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r
""",
        # exact replay of the deterministic per-stratum Bernoulli draw
        "sample_stratified": f"""
WITH d AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('strat:' || doc_id), 1, 15))::BIGINT % 1000000
           AS sample_ppm
  FROM documents
)
SELECT doc_id, lang, sample_ppm FROM d
WHERE sample_ppm < CASE lang
  {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_STRAT_RATES_PPM.items()))}
  ELSE {_STRAT_DEFAULT_PPM} END
""",
        # the NAIVE full-window spec of budget_select — the Spark side's
        # histogram/cutoff-bucket decomposition must equal it exactly
        "budget_select": f"""
WITH d AS (
  SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tokens,
         ('0x' || substr(md5('budget:' || doc_id), 1, 15))::BIGINT AS hkey,
         (CASE lang
            {' '.join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_TOKEN_BUDGETS.items()))}
            ELSE 0 END)::BIGINT AS budget
  FROM documents
),
c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY hkey, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum FROM d)
SELECT doc_id, lang, n_tokens FROM c WHERE cum <= budget
""",
        "quality_top_fraction": _top_fraction_oracle(),
        "quality_repetition": _repetition_oracle(),
        "mixture_rebalance": _mixture_oracle(),
        "dedup_bloom_prefilter": _bloom_oracle(),
        "pack_chunks": _pack_oracle(),
        "shard_manifest": _shard_manifest_oracle(),
        "curation_e2e": _curation_e2e_oracle(),
        "st_ts_goldens": _values_oracle(
            [(i, op, e) for i, op, _t, e in _ST_TS_GOLDENS],
            "case_id::INT AS case_id, op, output",
            "case_id, op, output",
        ),
        "normalize_detofu_goldens": _values_oracle(
            [(i, n, d, c) for i, _t, n, d, c in _NORM_DETOFU_GOLDENS],
            "case_id::INT AS case_id, normalized, detofu_b, detofu_custom",
            "case_id, normalized, detofu_b, detofu_custom",
        ),
        "ids_preserve_goldens": _values_oracle(
            [(i, on, off) for i, _t, on, off in _IDS_GOLDENS],
            "case_id::INT AS case_id, preserve_on, preserve_off",
            "case_id, preserve_on, preserve_off",
        ),
        "custom_dict_convert": _values_oracle(
            [(i, e) for i, _t, e in _CUSTOM_GOLDENS],
            "case_id::INT AS case_id, output",
            "case_id, output",
        ),
        "events_asof_join": """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
     v AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       v.event_id AS view_event_id,
       floor(v.value * 1000)::BIGINT AS view_value_milli,
       (epoch_us(p.ts) - epoch_us(v.ts))::BIGINT AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""",
        "sketch_heavy_hitters": _sketch_heavy_hitters_oracle(),
        "sketch_hll_distinct": _sketch_hll_oracle(),
        "hypertable_rollup": """
SELECT ((floor(epoch(ts))::BIGINT // 86400) * 86400)::BIGINT AS day_epoch,
       event_type,
       count(*)::BIGINT AS n_events,
       sum(floor(value * 1000)::BIGINT)::BIGINT AS sum_v_milli,
       min(floor(value * 1000)::BIGINT)::BIGINT AS min_v_milli,
       max(floor(value * 1000)::BIGINT)::BIGINT AS max_v_milli
FROM events GROUP BY 1, 2
""",
        "events_range_join": """
WITH a AS (SELECT event_id AS anchor_id, user_id, ts FROM events
           WHERE event_type = 'signup')
SELECT a.anchor_id, a.user_id,
       count(e.event_id)::BIGINT AS n_events,
       coalesce(sum(floor(e.value * 1000)::BIGINT), 0)::BIGINT
           AS sum_value_milli,
       max(epoch_us(e.ts) - epoch_us(a.ts))::BIGINT AS max_gap_us
FROM a LEFT JOIN events e
  ON e.user_id = a.user_id AND e.ts >= a.ts
 AND e.ts < a.ts + INTERVAL 15 MINUTE AND e.event_id != a.anchor_id
GROUP BY a.anchor_id, a.user_id
""",
        "events_window": """
SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts))::BIGINT AS window_epoch,
       event_type,
       count(*) AS n_events,
       sum(floor(value * 100)::BIGINT)::BIGINT AS value_cents
FROM events GROUP BY 1, 2
""",
        "events_sessionize": """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   -- floor() each side: the Spark query computes the gap
                   -- from unix_timestamp (whole-second truncation), so the
                   -- oracle must truncate identically or a gap straddling
                   -- the 1800 s boundary by a sub-second fraction
                   -- hash-mismatches (computed values never cross the
                   -- comparison raw)
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, sum(new_s)::BIGINT AS n_sessions, count(*) AS n_events
FROM g GROUP BY user_id
""",
        "streaming_dedup_replay": _streaming_replay_oracle("sf0.01"),
        "zho_check_transcripts": _zho_transcripts_oracle("sf0.01"),
        "conv_fold_tools": _conv_fold_oracle("sf0.01"),
        "conv_gate": _conv_gate_oracle("sf0.01"),
        "conv_dedup_exact": _conv_dedup_oracle("sf0.01"),
        "conv_render": _conv_render_oracle("sf0.01"),
        "shipping_priority": """
SELECT l_orderkey,
       epoch(o_orderdate)::BIGINT AS orderdate_epoch,
       sum(floor(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey ASC LIMIT 10
""",
        "nation_volume": """
SELECT r_name, n_name,
       sum(floor(l_extendedprice * (1 - l_discount) * 100)::BIGINT)::BIGINT AS revenue_cents,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE s_nationkey = c_nationkey
GROUP BY r_name, n_name
""",
        "topk_customers": """
SELECT o_custkey, sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS spend_cents
FROM orders GROUP BY o_custkey
ORDER BY spend_cents DESC, o_custkey ASC LIMIT 10
""",
        # NB: INTERSECT binds tighter than EXCEPT in SQL — parenthesize so
        # the oracle evaluates (A EXCEPT B) INTERSECT C like the Spark side.
        "set_ops": """
SELECT c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
  EXCEPT
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
)
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 0
""",
        "grouping_sets": """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
        "dedup_exact_prehash": """
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents
)
SELECT min(doc_id) AS canonical_id, count(*)::BIGINT AS n_copies
FROM d GROUP BY text
""",
        "pdf_reflow_convert": _values_oracle(
            [(i, e) for i, _p, _b, _k, e in _PDF_GOLDENS],
            "case_id::INT AS case_id, text",
            "case_id, text",
        ),
        "office_convert": _values_oracle(
            [(i, e) for i, _f, _n, _x, _c, _k, e in _OFFICE_GOLDENS],
            "case_id::INT AS case_id, part_xml",
            "case_id, part_xml",
        ),
        "textfiles_encodings": _values_oracle(
            [
                (i, ln, line)
                for i, _enc, lines in _TEXTFILE_GOLDENS
                for ln, line in enumerate(lines)
            ],
            "case_id::INT AS case_id, line_no::INT AS line_no, text",
            "case_id, line_no, text",
        ),
        "dedup_simhash": _dedup_simhash_oracle(),
        "similarity_ann": _similarity_ann_oracle(),
        **_optional_oracles(),
    }


def _dsir_select_oracle() -> str:
    """Independent replay: recount features from the parquet in scalar
    Python, rebuild the identical integer weight table, re-derive scores
    and the exact-rank selection in SQL."""
    import duckdb

    from openccnet_spark.operators.dsir import (
        dsir_weights,
        py_bucket_counts,
        sql_dsir_select,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    raw = py_bucket_counts([t for _l, t in rows])
    tgt = py_bucket_counts([t for l, t in rows if l == "zh"])
    return sql_dsir_select("documents", dsir_weights(tgt, raw), _DSIR_FRAC_PPM)


def _dedup_semantic_oracle() -> str:
    """Replay the distributed k-means on the doubled corpus, then
    re-derive cluster assignment, guard, and carried-norm cosine pairs in
    SQL (sql_semantic_dedup)."""
    import duckdb
    import numpy as np

    from openccnet_spark.operators.similarity import (
        ivf_centroids_replay,
        sql_semantic_dedup,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    base = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in base] + [r[0] + 100000 for r in base]
    vecs = [list(r[1]) for r in base] * 2
    centroids = ivf_centroids_replay(ids, np.array(vecs, dtype=np.float64))
    src = (
        "(SELECT vec_id, embedding FROM embeddings "
        "UNION ALL SELECT vec_id + 100000, embedding FROM embeddings) e"
    )
    return sql_semantic_dedup(src, centroids, threshold_milli=990)


def _optional_oracles() -> dict[str, str]:
    """Oracles whose BUILDERS need local data (the IVF centroids come from
    the sf0.01 parquet itself). If that read fails — fixtures elsewhere,
    different host — the entry is omitted (driver records a rows-only
    check) instead of poisoning every other oracle."""
    out: dict[str, str] = {}
    for name, builder in (
        ("similarity_ivf", _similarity_ivf_oracle),
        ("similarity_ivf_sampled", lambda: _similarity_ivf_oracle(sample_mod=4)),
        ("dedup_semantic", _dedup_semantic_oracle),
        ("dsir_select", _dsir_select_oracle),
        ("similarity_recall", _similarity_recall_oracle),
        ("similarity_recall_planted", _similarity_recall_planted_oracle),
        ("quality_classifier", _quality_classifier_oracle),
        ("bpe_train", _bpe_train_oracle),
        ("bpe_tokenize", _bpe_tokenize_oracle),
    ):
        try:
            out[name] = builder()
        except (OSError, ImportError) as exc:  # pragma: no cover - env-specific
            # only the expected I/O-class failures are tolerated; a genuine
            # builder bug must surface, not silently demote the check
            print(f"{name} oracle unavailable: {exc}", file=sys.stderr)
        except Exception as exc:
            if type(exc).__module__.startswith("duckdb"):
                print(f"{name} oracle unavailable: {exc}", file=sys.stderr)
            else:
                raise
    return out


def _bpe_replay():
    """Shared input for both BPE oracles: doc rows + the self-contained
    naive retraining (operators/bpe.py train_replay_py — no code shared
    with the Spark path's counting, tie-break or application)."""
    import duckdb

    from openccnet_spark.operators.bpe import train_replay_py

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    merges, tokens_of = train_replay_py([t for _, t in rows])
    return rows, merges, tokens_of


def _bpe_train_oracle() -> str:
    """Independent naive retrain emitted as literals — a distributed-count
    error, top-V cut or tie-break drift changes the merge table."""
    _, merges, _ = _bpe_replay()
    return _values_oracle(
        merges,
        "merge_rank::INT AS merge_rank, lhs, rhs, pair_count::BIGINT AS pair_count",
        "merge_rank, lhs, rhs, pair_count",
    )


def _bpe_tokenize_oracle() -> str:
    """Per-doc token counts under the naive replay's merges, tokenized by
    sequential rank-order application (vs serving's lowest-rank-first)."""
    rows, _, tokens_of = _bpe_replay()
    vals = []
    for doc_id, text in rows:
        ws = [w for w in text.split(" ") if w]
        vals.append((int(doc_id), len(ws), sum(tokens_of(w) for w in ws)))
    return _values_oracle(
        vals,
        "doc_id::BIGINT AS doc_id, n_words::BIGINT AS n_words, "
        "n_tokens::BIGINT AS n_tokens",
        "doc_id, n_words, n_tokens",
    )


def _quality_classifier_oracle() -> str:
    """Replays the distilled-classifier training bit-exactly in numpy
    (same integer features — the milli columns come from the engine-parity
    DuckDB SQL — same exact/quantized order-free sums, same shared driver
    solves) and emits the quantized weights as literals; the per-document
    integer score is then recomputed in closed-form SQL, so a wrong
    gradient, a partition-order leak or a scoring mismatch hash-fails."""
    import duckdb

    from openccnet_spark.operators.quality_model import (
        QM_DIM,
        QM_TEACHER_MILLI,
        classifier_replay,
        quantize_weights,
        sql_milli_features,
    )
    from openccnet_spark.operators.textstats import sql_quality_score_milli

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    mf = sql_milli_features("text")
    q = sql_quality_score_milli("text")
    rows = duckdb.sql(
        f"""
SELECT doc_id, text,
       CASE WHEN {q} >= {QM_TEACHER_MILLI} THEN 1 ELSE 0 END,
       {mf['lm']}, {mf['uq']}, {mf['sm']}
FROM '{sf_dir}/documents.parquet' ORDER BY doc_id
"""
    ).fetchall()
    wq = quantize_weights(
        classifier_replay(
            [r[0] for r in rows],
            [r[1] for r in rows],
            [r[2] for r in rows],
            [r[3] for r in rows],
            [r[4] for r in rows],
            [r[5] for r in rows],
            sample_mod=2,
        )
    )
    case = " ".join(f"WHEN {i} THEN {int(wq[i])}" for i in range(QM_DIM))
    return f"""
WITH wsum AS (
  SELECT doc_id,
         sum(CASE ('0x' || substr(md5(word), 1, 15))::BIGINT % {QM_DIM}
             {case} END)::BIGINT AS hs
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) u
  GROUP BY 1
),
s AS (
  SELECT d.doc_id,
         (CASE WHEN {q} >= {QM_TEACHER_MILLI} THEN 1 ELSE 0 END)::INT AS label,
         (ws.hs + {mf['lm']} * ({int(wq[QM_DIM])})
                + {mf['uq']} * ({int(wq[QM_DIM + 1])})
                + {mf['sm']} * ({int(wq[QM_DIM + 2])})
                + 1000 * ({int(wq[QM_DIM + 3])}))::BIGINT AS score_q
  FROM documents d JOIN wsum ws USING (doc_id)
)
SELECT doc_id, label, score_q,
       (CASE WHEN score_q >= 0 THEN 1 ELSE 0 END)::INT AS pred
FROM s
"""


def _similarity_recall_planted_oracle() -> str:
    """Replays ANN + IVF over the planted corpus (original vectors plus
    zeroed-last-element copies at vec_id+100000 — element replacement, so
    the perturbed float32 arrays are bit-identical across engines) and
    pins the recall floor: ``floor_met`` is the LITERAL true, so a missed
    planted neighbor on the Spark side hash-mismatches instead of being
    silently reported as lower recall."""
    planted = (
        "SELECT vec_id, embedding FROM embeddings "
        "UNION ALL "
        "SELECT vec_id + 100000 AS vec_id, embedding[1:63] || [0.0::FLOAT] AS embedding "
        "FROM embeddings"
    )
    ann = _similarity_ann_oracle(src="p")
    ivf = _similarity_ivf_oracle(src="p", planted=True)
    return f"""
WITH p AS ({planted}),
ann AS (SELECT query_id, neighbor_id FROM ({ann})),
ivf AS (SELECT query_id, neighbor_id FROM ({ivf}))
SELECT v.query_id::BIGINT AS query_id,
       coalesce(max(CASE WHEN a.neighbor_id = v.query_id + 100000 THEN 1 END), 0)::BIGINT AS ann_hit,
       coalesce(max(CASE WHEN i.neighbor_id = v.query_id + 100000 THEN 1 END), 0)::BIGINT AS ivf_hit,
       TRUE AS floor_met
FROM (VALUES (0), (1), (2), (3), (4)) v(query_id)
LEFT JOIN ann a ON a.query_id = v.query_id
LEFT JOIN ivf i ON i.query_id = v.query_id
GROUP BY v.query_id
"""


def _similarity_recall_oracle() -> str:
    """Recall@5 of the ANN and IVF indexes vs the exact top-k, rebuilt
    entirely in DuckDB from the three underlying oracles. A left join from
    the exact set counts the non-null (hit) approximate neighbors; top-k
    outputs are unique per (query_id, neighbor_id), so no fan-out."""
    return f"""
WITH exact AS (SELECT query_id, neighbor_id FROM ({_similarity_topk_oracle()})),
ann AS (SELECT query_id, neighbor_id FROM ({_similarity_ann_oracle()})),
ivf AS (SELECT query_id, neighbor_id FROM ({_similarity_ivf_oracle()}))
SELECT e.query_id,
       floor(count(a.neighbor_id) * 1000 / 5)::BIGINT AS ann_recall_milli,
       floor(count(i.neighbor_id) * 1000 / 5)::BIGINT AS ivf_recall_milli
FROM exact e
LEFT JOIN ann a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
LEFT JOIN ivf i ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY e.query_id
"""


def _values_oracle(rows: list, select: str, names: str) -> str:
    formatted = ", ".join(
        "(" + ", ".join(_sq(v) if isinstance(v, str) else str(v) for v in row) + ")"
        for row in rows
    )
    return f"SELECT {select} FROM (VALUES {formatted}) AS v({names})"


def _streaming_replay_oracle(sf_dir_sf: str) -> str:
    """Exactly-once contract: the final sink table of the replayed stream
    equals ONE copy of the deterministic transcripts source."""
    n_conv = _replay_n_conv(sf_dir_sf)
    return f"""
WITH t AS ({transcripts_sql(n_conv)})
SELECT conv_id, turn_idx, role, text, tool,
       floor(epoch(ts))::BIGINT AS ts_epoch
FROM t
"""


def _zho_transcripts_oracle(sf_dir_sf: str) -> str:
    cc = Converter()
    zhos = [str(cc.zho_check(pool_text(i))) for i in range(len(POOL))]
    n_conv = n_conv_for_sf(sf_dir_sf)
    return f"""
WITH t AS ({transcripts_sql(n_conv)})
SELECT ([{', '.join(zhos)}])[pool_idx + 1]::INT AS zho,
       count(*) AS n_turns
FROM t GROUP BY 1
"""


def _sketch_heavy_hitters_oracle() -> str:
    from openccnet_spark.operators.sketch import sql_heavy_hitters

    return sql_heavy_hitters()


def _conv_fold_oracle(sf_dir_sf: str) -> str:
    from openccnet_spark.operators.conversations import sql_fold_tool_turns

    t = f"(SELECT * FROM ({transcripts_sql(n_conv_for_sf(sf_dir_sf))}) raw) tt"
    return sql_fold_tool_turns(t)


def _conv_gate_oracle(sf_dir_sf: str) -> str:
    """Pool-literal per-turn keep labels (the reference path) aggregated
    to the gate decision in SQL — replays conversation_gate exactly."""
    cc = Converter()
    keeps = [
        "true" if reference_label(pool_text(i), "t2s", converter=cc)["keep"] else "false"
        for i in range(len(POOL))
    ]
    n_conv = n_conv_for_sf(sf_dir_sf)
    return f"""
WITH t AS ({transcripts_sql(n_conv)}),
lab AS (
  SELECT conv_id,
         ([{', '.join(keeps)}])[pool_idx + 1] AS keep,
         turn_idx % 3 = 1 AS is_assistant
  FROM t
), agg AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns,
         sum(keep::INT)::BIGINT AS n_kept,
         sum((keep AND is_assistant)::INT)::BIGINT AS n_assistant_kept
  FROM lab GROUP BY conv_id
)
SELECT conv_id, n_turns, n_kept, n_assistant_kept,
       (n_kept * 1000 // n_turns)::BIGINT AS kept_milli,
       CASE WHEN n_assistant_kept < 1 THEN false
            WHEN n_kept * 1000 // n_turns < 600 THEN false
            ELSE true END AS conv_keep,
       CASE WHEN n_assistant_kept < 1 THEN 'no_assistant'
            WHEN n_kept * 1000 // n_turns < 600 THEN 'low_kept_fraction'
            ELSE 'none' END AS drop_reason
FROM agg
"""


def _conv_dedup_oracle(sf_dir_sf: str) -> str:
    from openccnet_spark.operators.conversations import sql_conversation_fingerprints

    t = f"(SELECT * FROM ({transcripts_sql(n_conv_for_sf(sf_dir_sf))}) raw) tt"
    return sql_conversation_fingerprints(t)


def _conv_render_oracle(sf_dir_sf: str) -> str:
    """Render SQL nested over the fold SQL — same composition as the
    Spark query."""
    from openccnet_spark.operators.conversations import (
        sql_fold_tool_turns,
        sql_render_chat_template,
    )

    t = f"(SELECT * FROM ({transcripts_sql(n_conv_for_sf(sf_dir_sf))}) raw) tt"
    return sql_render_chat_template(f"({sql_fold_tool_turns(t)}) folded")


def _sketch_hll_oracle() -> str:
    """Direct (unmerged) register file from ALL words — pins the Spark
    side's two-half merge as union-equivalent."""
    from openccnet_spark.operators.hll import sql_hll_histogram

    words = (
        "(SELECT w FROM (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w"
        " FROM documents) u WHERE w <> '') s"
    )
    return sql_hll_histogram("w", words)


def _passage_oracle() -> str:
    """Naive window form of passage dedup over the doubled corpus."""
    from openccnet_spark.operators.passages import sql_passage_dedup

    doubled = (
        "(SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 100000, text FROM documents)"
    )
    return sql_passage_dedup(doubled)


def _robots_oracle() -> str:
    """Relational longest-match replay of the robots decision."""
    from openccnet_spark.operators.robots import sql_path, sql_synth_robots_rules
    from openccnet_spark.operators.urls import sql_host, sql_synth_url

    url = sql_synth_url("doc_id")
    return f"""
WITH u AS (SELECT doc_id, {url} AS url FROM documents),
h AS (SELECT doc_id, {sql_host("url")} AS host, {sql_path("url")} AS path FROM u),
m AS (
  SELECT h.doc_id, r.allow,
         row_number() OVER (PARTITION BY h.doc_id
                            ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
  FROM h JOIN {sql_synth_robots_rules()} r
    ON r.host = h.host AND starts_with(h.path, r.prefix)
)
SELECT h.doc_id, h.host, h.path,
       coalesce(m.allow, true) AS robots_allowed
FROM h LEFT JOIN (SELECT doc_id, allow FROM m WHERE rn = 1) m USING (doc_id)
"""


def _snapshot_oracle() -> str:
    """The three snapshot probes resolve to doc_id predicates on the
    source table (v2 live set = %3 in (0,1); the (1,2] increment = %3==1;
    v3 overwrote to %3==2) — the digests pin the exact file sets."""
    digest = "bit_xor(('0x' || substr(md5('snap:' || doc_id), 1, 15))::BIGINT)::BIGINT"
    return f"""
SELECT 'time_travel_v2' AS probe, count(*)::BIGINT AS n_rows, {digest} AS id_digest
FROM documents WHERE doc_id % 3 IN (0, 1)
UNION ALL
SELECT 'incremental_1_2', count(*)::BIGINT, {digest}
FROM documents WHERE doc_id % 3 = 1
UNION ALL
SELECT 'current_v3', count(*)::BIGINT, {digest}
FROM documents WHERE doc_id % 3 = 2
"""


def _decontaminate_semantic_oracle() -> str:
    """Brute-force cosine join of the same corpus/eval split."""
    from openccnet_spark.operators.similarity import sql_cosine

    cos = sql_cosine("c.embedding", "ev.embedding")
    return f"""
WITH ev AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 37 = 5),
c AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 37 <> 5
  UNION ALL SELECT vec_id + 100000, embedding FROM ev
),
p AS (
  SELECT c.vec_id, floor({cos} * 1000)::BIGINT AS cos_milli
  FROM c, ev
  WHERE floor({cos} * 1000) >= 990
)
SELECT vec_id, count(*)::BIGINT AS n_matches, max(cos_milli)::BIGINT AS max_cos_milli
FROM p GROUP BY vec_id
"""


def _boilerplate_oracle() -> str:
    """Block classifier replayed in DuckDB over the same synth pages."""
    from openccnet_spark.operators.boilerplate import (
        sql_extract_main_text,
        sql_synth_page,
    )

    page = sql_synth_page("coalesce(text, '')")
    return sql_extract_main_text(f"(SELECT doc_id, {page} AS html FROM documents)")


def _conv_pack_oracle(sf_dir_sf: str) -> str:
    """Naive single-window prefix-sum replay of the conversation packer
    over the identical synthesized transcripts."""
    from openccnet_spark.operators.conversations import sql_conversation_pack

    return sql_conversation_pack(2048, f"({transcripts_sql(n_conv_for_sf(sf_dir_sf))})")


def _host_rank_oracle() -> str:
    """Chained-CTE integer PageRank replay over the same synthetic
    host-link graph."""
    from openccnet_spark.operators.hostrank import sql_host_rank, sql_synth_host_edges

    return sql_host_rank(sql_synth_host_edges("documents"))


def _crawl_budget_oracle() -> str:
    """Naive global-rank largest-remainder replay over the replayed
    PageRank weights (CTEs nest inside the parenthesized subquery)."""
    from openccnet_spark.operators.hostrank import (
        sql_apportion_budget,
        sql_host_rank,
        sql_synth_host_edges,
    )

    hr = sql_host_rank(sql_synth_host_edges("documents"))
    return sql_apportion_budget(f"({hr})", budget=1_000_000)


def _substring_oracle() -> str:
    """Naive window form of duplicated-substring removal over the
    doubled corpus."""
    from openccnet_spark.operators.substrings import sql_substring_dedup

    doubled = (
        "(SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 100000, text FROM documents)"
    )
    return sql_substring_dedup(doubled)


def _dedup_minhash_oracle() -> str:
    """Brute-force exact-Jaccard >= 0.7 pairs over the same mutant corpus.
    Matching this also proves LSH recall is total at the configured banding."""
    from openccnet_spark.operators.dedup import JACCARD_THRESHOLD

    return f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         substring(text, 1, length(text) - length(string_split(text, ' ')[-1]) - 1)
  FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
            generate_series(1, greatest(len(w) - 2, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d)
), ne AS (SELECT * FROM sh WHERE len(s) > 0)
SELECT a.doc_id AS a, b.doc_id AS b,
       floor(len(list_intersect(a.s, b.s))::DOUBLE
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) * 1000)::BIGINT
         AS jaccard_milli
FROM ne a JOIN ne b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {JACCARD_THRESHOLD}
"""


def _dedup_incremental_oracle() -> str:
    """Brute-force recompute of the incremental decision from the two
    tables: batch 1 = even doc_ids (the persisted index's content),
    batch 2 = odd docs + mutants of evens (+100000) + mutants of odds
    (+200000). 'index' dups = any >=threshold pair against batch 1;
    'batch' dups = any >=threshold pair against a SMALLER-id batch-2 doc
    (the operator's greedy rule); 'index' wins when both apply. Matching
    this also proves the banded index join's recall, same as
    dedup_minhash."""
    from openccnet_spark.operators.dedup import JACCARD_THRESHOLD

    mut = "substring(text, 1, length(text) - length(string_split(text, ' ')[-1]) - 1)"
    shingle = """
  SELECT doc_id,
         list_distinct(list_transform(
            generate_series(1, greatest(len(w) - 2, 0)),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {src})"""
    jacc = (
        "len(list_intersect(a.s, b.s))::DOUBLE"
        " / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))"
    )
    return f"""
WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 100000, {mut} FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id + 200000, {mut} FROM documents WHERE doc_id % 2 = 1
),
sh_o AS (SELECT * FROM ({shingle.format(src='old')}) WHERE len(s) > 0),
sh_b AS (SELECT * FROM ({shingle.format(src='batch')}) WHERE len(s) > 0),
di AS (
  SELECT DISTINCT a.doc_id FROM sh_b a JOIN sh_o b ON {jacc} >= {JACCARD_THRESHOLD}
),
db AS (
  SELECT DISTINCT a.doc_id FROM sh_b a
  JOIN sh_b b ON a.doc_id > b.doc_id AND {jacc} >= {JACCARD_THRESHOLD}
)
SELECT bd.doc_id,
       (di.doc_id IS NULL AND db.doc_id IS NULL) AS keep,
       CASE WHEN di.doc_id IS NOT NULL THEN 'index'
            WHEN db.doc_id IS NOT NULL THEN 'batch' END AS dup_src
FROM batch bd
LEFT JOIN di ON bd.doc_id = di.doc_id
LEFT JOIN db ON bd.doc_id = db.doc_id
"""


def _components_walk_sql() -> str:
    """Shared recursive-CTE body: MinHash pair list -> symmetric edges ->
    transitive closure (walk) -> min reachable id per node. UNION (not
    UNION ALL) dedups rows so the recursion terminates on the finite
    closure."""
    return f"""
p AS (SELECT a, b FROM ({_dedup_minhash_oracle()})),
edges AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON w.node = e.dst
),
comp AS (SELECT node, min(label)::BIGINT AS component FROM walk GROUP BY node)
"""


def _dedup_components_oracle() -> str:
    return f"""
WITH RECURSIVE {_components_walk_sql()}
SELECT node, component FROM comp
"""


def _dedup_canonical_oracle() -> str:
    return f"""
WITH RECURSIVE {_components_walk_sql()},
d AS (SELECT doc_id FROM documents UNION ALL SELECT doc_id + 100000 FROM documents),
lab AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM d LEFT JOIN comp c ON d.doc_id = c.node
),
sizes AS (SELECT component, count(*) AS n, min(doc_id) AS canon
          FROM lab GROUP BY component)
SELECT l.doc_id, l.component, (l.doc_id = s.canon) AS is_canonical,
       s.n::BIGINT AS n_members
FROM lab l JOIN sizes s ON l.component = s.component
"""


def _split_leakage_oracle() -> str:
    from openccnet_spark.operators.curation import sql_leakage_safe_split

    lab = f"""(
WITH RECURSIVE {_components_walk_sql()},
d AS (SELECT doc_id FROM documents UNION ALL SELECT doc_id + 100000 FROM documents)
SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
FROM d LEFT JOIN comp c ON d.doc_id = c.node
) lab"""
    return sql_leakage_safe_split(lab)


def _dedup_simhash_oracle(banded: bool = True) -> str:
    """Recompute the 60-bit md5-based SimHash per document in DuckDB.

    ``banded=True`` (the driver oracle) replays the Spark side's 4x15-bit
    pigeonhole banding INCLUDING the SIMHASH_MAX_BUCKET degenerate-bucket
    guard, so the oracle stays hash-identical at ANY oracle scale — even
    one where a band bucket exceeds the cap and whole buckets are dropped.
    ``banded=False`` emits ALL pairs with hamming <= 3 brute-force; the
    two are equal whenever no bucket is oversized (pigeonhole totality:
    a hamming<=3 pair leaves at least one of the 4 bands untouched) —
    pinned at test scale by
    tests/test_training_ops.py::test_simhash_banded_oracle_equals_brute."""
    from openccnet_spark.operators.dedup import (
        SIMHASH_BANDS,
        SIMHASH_BITS,
        SIMHASH_MAX_BUCKET,
    )

    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> "
        f"CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    band_mask = (1 << band_bits) - 1
    base = f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         substring(text, 1, length(text) - length(string_split(text, ' ')[-1]) - 1)
  FROM documents
), hashed AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')),
                        w -> ('0x' || substr(md5(w), 1, 15))::BIGINT) AS hs
  FROM d
), sigs AS (
  SELECT doc_id, ({bit_terms})::BIGINT AS sig FROM hashed
)"""
    if not banded:
        return base + """
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.sig, b.sig))::INT AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""
    return base + f""",
bands AS (
  SELECT s.doc_id, s.sig, i.i AS band_i,
         (s.sig >> (i.i * {band_bits})) & {band_mask} AS band_v
  FROM sigs s CROSS JOIN generate_series(0, {SIMHASH_BANDS - 1}) AS i(i)
),
surv AS (
  SELECT * FROM bands
  QUALIFY count(*) OVER (PARTITION BY band_i, band_v) <= {SIMHASH_MAX_BUCKET}
)
SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.sig, b.sig))::INT AS hamming
FROM surv a JOIN surv b ON a.band_i = b.band_i AND a.band_v = b.band_v
                       AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


def _similarity_ann_oracle(src: str = "embeddings") -> str:
    """The ANN bucket fold, replayed exactly in DuckDB: the hyperplanes are
    deterministic float64 literals and each projection is the same
    left-to-right double fold as the Spark expression (cf. ``sql_dot``), so
    sign bits — and therefore candidate buckets — match bit-for-bit.
    ``src``: the (vec_id, embedding) relation to index — a view name or a
    CTE name (the planted-recall oracle passes its planted corpus)."""
    from openccnet_spark.operators.similarity import (
        N_HYPERPLANES,
        N_TABLES,
        _hyperplanes,
        sql_cosine,
    )

    planes = _hyperplanes(64)

    def key_expr(t: int) -> str:
        bits = []
        for j in range(N_HYPERPLANES):
            terms = " + ".join(
                f"embedding[{i + 1}]::DOUBLE * {float(planes[t, j, i])!r}"
                for i in range(64)
            )
            bits.append(f"(CASE WHEN ({terms}) >= 0 THEN {1 << j} ELSE 0 END)")
        return "(" + " + ".join(bits) + ")"

    keys = ",\n         ".join(f"{key_expr(t)} AS k{t}" for t in range(N_TABLES))
    bucket_match = " OR ".join(f"q.k{t} = c.k{t}" for t in range(N_TABLES))
    cos = sql_cosine("qv", "nv")
    return f"""
WITH b AS (
  SELECT vec_id, embedding,
         {keys}
  FROM {src}
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS qv, c.embedding AS nv
  FROM b q JOIN b c ON q.vec_id <> c.vec_id
  WHERE q.vec_id IN (0, 1, 2, 3, 4) AND ({bucket_match})
), s AS (
  SELECT query_id, neighbor_id, floor({cos} * 1000)::BIGINT AS cos_milli FROM cand
), r AS (
  SELECT query_id, neighbor_id, cos_milli,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_milli DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cos_milli, rank::INT AS rank FROM r WHERE rank <= 5
"""


def _similarity_ivf_oracle(
    src: str = "embeddings", planted: bool = False, sample_mod: int = 1
) -> str:
    """Rebuild the IVF index in DuckDB: the centroids come from
    `ivf_centroids_replay` — the bit-exact numpy replay of the DISTRIBUTED
    trainer (quantized order-independent int sums + fold-ordered per-row
    arithmetic); each per-centroid dot in the SQL is the same
    left-to-right fold, and cluster/probe selection uses the same
    first-max / fewer-than-nprobe rules — so candidates and the final
    top-k value-match."""
    import duckdb
    import numpy as np

    from openccnet_spark.operators.similarity import (
        IVF_CLUSTERS,
        IVF_NPROBE,
        ivf_centroids_replay,
        sql_cosine,
    )

    # the driver registers its views over sf0.01; the training corpus MUST
    # come from the same tables the views read or the oracle is silently
    # wrong rather than omitted. SPARK_GRAFT_ORACLE_SF_DIR re-points both
    # when the comparison runs against a different scale factor.
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/embeddings.parquet"
    base = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in base]
    vecs = [list(r[1]) for r in base]
    if planted:
        # replay training over the PLANTED corpus (originals +
        # zeroed-last-element copies at vec_id+100000)
        ids = ids + [i + 100000 for i in ids]
        vecs = vecs + [v[:63] + [0.0] for v in vecs]
    centroids = ivf_centroids_replay(
        ids, np.array(vecs, dtype=np.float64), sample_mod=sample_mod
    )

    def dot(i: int) -> str:
        terms = " + ".join(
            f"embedding[{d + 1}]::DOUBLE * {float(centroids[i, d])!r}" for d in range(64)
        )
        return f"({terms})"

    ds = ",\n         ".join(dot(i) for i in range(IVF_CLUSTERS))
    cos = sql_cosine("qv", "nv")
    return f"""
WITH b AS (
  SELECT vec_id, embedding,
         list_value({ds}) AS ds
  FROM {src}
), t AS (
  SELECT vec_id, embedding, ds, list_indexof(ds, list_max(ds)) AS cluster FROM b
), q AS (
  SELECT t.vec_id AS query_id, t.embedding AS qv, g.j AS cluster
  FROM t, generate_series(1, {IVF_CLUSTERS}) AS g(j)
  WHERE t.vec_id IN (0, 1, 2, 3, 4)
    AND len(list_filter(t.ds, x -> x > t.ds[g.j])) < {IVF_NPROBE}
), cand AS (
  SELECT DISTINCT q.query_id, q.qv, c.vec_id AS neighbor_id, c.embedding AS nv
  FROM q JOIN t c ON q.cluster = c.cluster
  WHERE q.query_id <> c.vec_id
), s AS (
  SELECT query_id, neighbor_id, floor({cos} * 1000)::BIGINT AS cos_milli FROM cand
), r AS (
  SELECT query_id, neighbor_id, cos_milli,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_milli DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, cos_milli, rank::INT AS rank FROM r WHERE rank <= 5
"""


def _dedup_embedding_oracle() -> str:
    from openccnet_spark.operators.similarity import sql_cosine

    cos = sql_cosine("a.embedding", "b.embedding")
    return f"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings
)
SELECT a.vec_id AS a, b.vec_id AS b,
       floor({cos} * 1000)::BIGINT AS cos_milli
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE floor({cos} * 1000) >= 990
"""


def _similarity_topk_oracle() -> str:
    from openccnet_spark.operators.similarity import sql_cosine

    cos = sql_cosine("qv", "nv")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN (0, 1, 2, 3, 4)),
c AS (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings),
s AS (SELECT query_id, neighbor_id, floor({cos} * 1000)::BIGINT AS cos_milli
      FROM q JOIN c ON query_id <> neighbor_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_milli DESC, neighbor_id ASC) AS rank
      FROM s)
SELECT query_id, neighbor_id, cos_milli, rank::INT AS rank FROM r WHERE rank <= 5
"""


def _vocab_topk_oracle() -> str:
    return """
WITH w AS (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w FROM documents),
c AS (SELECT w, count(*)::BIGINT AS n FROM w WHERE w <> '' GROUP BY w),
r AS (SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rank FROM c)
SELECT w, n, rank::INT AS rank FROM r WHERE rank <= 50
"""


def _quality_quantiles_oracle() -> str:
    from openccnet_spark.operators import textstats as T

    q = T.sql_quality_score_milli("coalesce(text, '')")
    return f"""
WITH s AS (SELECT lang, {q} AS q, doc_id FROM documents),
r AS (SELECT lang, q,
             row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM s)
SELECT lang,
       min(CASE WHEN rn = ceil(0.5 * n) THEN q END)::BIGINT AS p50_milli,
       min(CASE WHEN rn = ceil(0.9 * n) THEN q END)::BIGINT AS p90_milli,
       min(CASE WHEN rn = ceil(0.99 * n) THEN q END)::BIGINT AS p99_milli
FROM r GROUP BY lang
"""


def _top_fraction_oracle() -> str:
    """The NAIVE spec of curation.top_fraction_select: rank each language
    by (score DESC, doc_id) and keep rank <= ceil(n * frac / 1e6), the
    ceil in pure integer arithmetic. The Spark side's histogram/cutoff
    decomposition must equal this exactly at any partitioning."""
    from openccnet_spark.operators import textstats as T

    q = T.sql_quality_score_milli("coalesce(text, '')")
    return f"""
WITH d AS (SELECT doc_id, lang, ({q})::BIGINT AS score FROM documents),
r AS (SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM d)
SELECT doc_id, lang, score FROM r
WHERE rn <= least(n, (n * {_TOP_FRAC_PPM} + 999999) // 1000000)
"""


def _shard_manifest_oracle() -> str:
    from openccnet_spark.operators.shards import sql_shard_manifest

    return sql_shard_manifest(_SHARD_TOKENS)


def _pack_oracle() -> str:
    from openccnet_spark.operators.packing import sql_pack_chunks

    return sql_pack_chunks(_PACK_WINDOW)


def _curation_e2e_oracle() -> str:
    """The three stage specs chained as CTEs: repetition keep -> naive
    per-language top-fraction rank -> naive single-window prefix sum."""
    from openccnet_spark.operators import textstats as T
    from openccnet_spark.operators.repetition import sql_repetition_signals

    q = T.sql_quality_score_milli("coalesce(text, '')")
    return f"""
WITH rep AS ({sql_repetition_signals("documents")}),
kept AS (SELECT d.doc_id, d.lang, d.text
         FROM documents d JOIN rep ON rep.doc_id = d.doc_id AND rep.keep = 1),
sc AS (SELECT doc_id, lang, ({q})::BIGINT AS score,
              len(string_split(text, ' '))::BIGINT AS n_tokens,
              ('0x' || substr(md5('pack:' || doc_id), 1, 15))::BIGINT AS hkey
       FROM kept),
r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM sc),
sel AS (SELECT doc_id, n_tokens, hkey FROM r
        WHERE rn <= least(n, (n * {_TOP_FRAC_PPM} + 999999) // 1000000)),
c AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY hkey, doc_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0)::BIGINT AS start_offset
      FROM sel WHERE n_tokens > 0)
SELECT doc_id, n_tokens, start_offset,
       (start_offset // {_PACK_WINDOW})::BIGINT AS first_chunk,
       ((start_offset + n_tokens - 1) // {_PACK_WINDOW})::BIGINT AS last_chunk,
       ((start_offset + n_tokens - 1) // {_PACK_WINDOW}
        - start_offset // {_PACK_WINDOW} + 1)::BIGINT AS n_chunks
FROM c
"""


def _bloom_oracle() -> str:
    from openccnet_spark.operators.bloom import sql_incremental_exact

    return sql_incremental_exact(
        batch_where="TRUE",
        index_where="doc_id % 3 <> 0",
        m_bits=_BLOOM_M_BITS,
    )


def _mixture_oracle() -> str:
    """Replay of curation.mixture_rebalance: integer quota math + the
    per-source (hash, id) rank selection, naive-window form."""
    vals = ", ".join(
        f"('{s}', {f})" for s, f in sorted(_MIX_TARGET_PPM.items())
    )
    return f"""
WITH t(source, f) AS (VALUES {vals}),
cnt AS (SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source),
ntot AS (SELECT min((coalesce(c.n, 0) * 1000000) // t.f)::BIGINT AS n_total
         FROM t LEFT JOIN cnt c USING (source) WHERE t.f > 0),
q AS (SELECT t.source,
             (((SELECT n_total FROM ntot) * t.f) // 1000000)::BIGINT AS quota
      FROM t WHERE t.f > 0),
d AS (SELECT doc_id, source,
             ('0x' || substr(md5('mix:' || doc_id), 1, 15))::BIGINT AS hkey
      FROM documents),
r AS (SELECT d.doc_id, d.source, q.quota,
             row_number() OVER (PARTITION BY d.source ORDER BY d.hkey, d.doc_id) AS rn
      FROM d JOIN q USING (source))
SELECT doc_id, source FROM r WHERE rn <= quota
"""


def _repetition_oracle() -> str:
    from openccnet_spark.operators.repetition import sql_repetition_signals

    return sql_repetition_signals("documents")


def _textstats_oracle() -> str:
    from openccnet_spark.operators import textstats as T

    t = "coalesce(text, '')"
    return f"""
SELECT doc_id,
       len(string_split({t}, ' '))::BIGINT AS ws_tokens,
       {T.sql_regex_token_count(t)}::BIGINT AS re_tokens,
       {T.sql_quality_score_milli(t)} AS quality_milli,
       {T.sql_fingerprint64(t)}::BIGINT AS fingerprint
FROM documents
"""
