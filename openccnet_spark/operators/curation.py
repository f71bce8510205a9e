"""Training-data curation operators: benchmark decontamination,
deterministic stratified sampling, and per-stratum token-budget selection.

These are the corpus-curation steps a production LLM pipeline runs after
quality filtering and dedup (reference repo laisuk/OpenccNet has no
counterpart — this module serves the LLM-pipeline brief, sibling of
``dedup.py`` / ``textstats.py``):

* ``decontaminate`` — flag corpus documents sharing any word n-gram with a
  benchmark/eval table (GPT-3/PaLM-style 13-gram decontamination). The
  benchmark side is tiny by nature and is **broadcast**, so the corpus —
  the 100 TB side — is never shuffled: n-gram generation is a narrow
  projection and the membership test a map-side hash join; only the rare
  hits shuffle (8-byte hash + id) into the per-document count.
* ``stratified_sample`` — keep each row iff a deterministic 60-bit md5
  hash of its id, taken mod 1e6, falls under the stratum's ppm rate. Zero
  shuffle, zero state: the exact shape of "sample 2% of English, 10% of
  Thai" at any scale, reproducible across engines and reruns (the same
  md5-prefix hash DuckDB and Python can recompute — see
  ``dedup.simhash_signatures`` provenance note).
* ``budget_select`` — take documents per stratum, in deterministic
  hash order, until a token budget is filled ("give me 10B tokens per
  language"). Implemented scale-first with the same bounded-domain
  histogram trick as ``textstats.quality_quantiles_frame``: a map-side
  combined per-(stratum, bucket) token histogram finds each stratum's
  cutoff bucket (≤ n_buckets rows per stratum ever shuffle), docs in
  buckets strictly below the cutoff are kept by a broadcast join, and
  only the single boundary bucket per stratum — ~1/n_buckets of the data
  — pays an exact cumulative-sum window. Results are identical to the
  full per-stratum ordered window at any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ngram_hashes_col",
    "decontaminate",
    "key60_col",
    "stratified_sample",
    "budget_select",
    "leakage_safe_split",
    "sql_leakage_safe_split",
    "top_fraction_select",
    "mixture_quotas",
    "mixture_rebalance",
]


def ngram_hashes_col(text_col: str, n: int) -> Column:
    """Array of DISTINCT 60-bit hashes of the text's word ``n``-grams.

    Hash = first 15 hex chars of md5(n-gram joined by ' ') — exactly
    recomputable in DuckDB (``('0x'||substr(md5(g),1,15))::BIGINT``) and
    Python, so decontamination is fully oracle-checkable.

    The split is hoisted through the one-element ``transform`` binding
    (``ws``): higher-order lambda bodies get no subexpression
    elimination, so an inline ``split`` would re-split the document per
    n-gram position (O(words²) — see dedup.shingles_col).
    ``sequence(1, k)`` is guarded by the CASE: k < 1 would descend.
    """
    return F.expr(
        f"""
        element_at(transform(array(split({text_col}, ' ')), ws ->
          CASE WHEN size(ws) >= {n}
            THEN array_distinct(transform(
                   sequence(1, size(ws) - {n} + 1),
                   i -> CAST(conv(substr(md5(array_join(slice(ws, i, {n}), ' ')), 1, 15), 16, 10) AS BIGINT)))
            ELSE CAST(array() AS array<bigint>)
          END), 1)
        """
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark contamination: ``(id_col, n_hits)`` for every
    corpus document sharing ≥ 1 word ``n``-gram with any ``bench`` row.

    ``n_hits`` counts the document's distinct contaminated n-grams. The
    benchmark n-gram set (small by nature: eval sets are KBs–MBs against
    a 100 TB corpus) is distinct-ed and **broadcast**; the corpus side is
    a narrow explode into a map-side hash join — the corpus never
    shuffles, and the join output (hits only) carries just the 8-byte
    hash and the id into the final per-document aggregate.
    """
    bench_ngrams = (
        bench.select(F.explode(ngram_hashes_col(bench_text_col, n)).alias("ng"))
        .distinct()
    )
    corpus_ngrams = docs.select(
        F.col(id_col), F.explode(ngram_hashes_col(text_col, n)).alias("ng")
    )
    return (
        corpus_ngrams.join(F.broadcast(bench_ngrams), "ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def key60_col(prefix: str, id_col: str) -> Column:
    """Deterministic 60-bit sampling/ordering key: md5 of ``prefix || id``,
    top 15 hex chars — the cross-engine-reproducible hash family."""
    return F.expr(
        f"CAST(conv(substr(md5(concat('{prefix}', CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )


def stratified_sample(
    df: DataFrame,
    rates_ppm: dict,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_ppm: int = 0,
    salt: str = "strat:",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep a row iff
    ``key60(salt, id) % 1e6 < rates_ppm[stratum]`` (parts-per-million).

    This is the domain/language-mixing primitive: no shuffle, no state,
    no RNG — a pure narrow filter whose decision any engine (or a later
    incremental run) reproduces exactly. Unknown strata fall back to
    ``default_ppm``. Emits the input columns plus ``sample_ppm`` (the
    row's draw) so downstream audits can verify the decision.
    """
    rate = None
    for stratum, ppm in sorted(rates_ppm.items()):
        cond = F.col(strata_col) == stratum
        rate = F.when(cond, F.lit(int(ppm))) if rate is None else rate.when(cond, F.lit(int(ppm)))
    rate = F.lit(int(default_ppm)) if rate is None else rate.otherwise(F.lit(int(default_ppm)))
    draw = F.pmod(key60_col(salt, id_col), F.lit(1_000_000))
    return df.withColumn("sample_ppm", draw).filter(F.col("sample_ppm") < rate)


def leakage_safe_split(
    labels: DataFrame,
    rates_ppm: dict | None = None,
    cluster_col: str = "component",
    salt: str = "split:",
) -> DataFrame:
    """Duplicate-cluster-aware train/val/test assignment: the Bernoulli
    draw keys on the CLUSTER id, not the document id, so a document and
    its near-duplicates land in the SAME split by construction — the
    eval-leakage bug (val answers sitting in train as near-dups) is
    impossible rather than merely unlikely.

    ``rates_ppm`` is an ordered {split_name: ppm} summing to 1e6
    (default 90/5/5). Zero shuffle and zero state: the draw is a pure
    projection of the cross-engine 60-bit hash of the cluster id, so the
    assignment is reproducible by any engine, on any partitioning, and
    by later incremental runs (a new member joining an existing cluster
    inherits the cluster's split). Emits the input columns plus
    ``split``. Compose downstream of ``components.canonical_documents``
    (near-dup clusters) or ``conversations.conversation_fingerprints``
    (exact-dup clusters).
    """
    if rates_ppm is None:
        rates_ppm = {"train": 900_000, "val": 50_000, "test": 50_000}
    total = sum(rates_ppm.values())
    if total != 1_000_000:
        raise ValueError(f"rates_ppm must sum to 1e6, got {total}")
    draw = F.pmod(key60_col(salt, cluster_col), F.lit(1_000_000))
    cum, col = 0, None
    for name, ppm in rates_ppm.items():
        cum += int(ppm)
        cond = draw < F.lit(cum)
        col = F.when(cond, name) if col is None else col.when(cond, name)
    return labels.withColumn("split", col)


def sql_leakage_safe_split(
    from_clause: str,
    rates_ppm: dict | None = None,
    cluster_col: str = "component",
    salt: str = "split:",
) -> str:
    """DuckDB replay: identical hash draw and cumulative boundaries.
    Returns the CASE select list fragmentized as a full query emitting
    ``*, split``."""
    if rates_ppm is None:
        rates_ppm = {"train": 900_000, "val": 50_000, "test": 50_000}
    d = f"('0x' || substr(md5('{salt}' || {cluster_col}), 1, 15))::BIGINT % 1000000"
    cum, arms = 0, []
    for name, ppm in rates_ppm.items():
        cum += int(ppm)
        arms.append(f"WHEN {d} < {cum} THEN '{name}'")
    return f"SELECT *, CASE {' '.join(arms)} END AS split FROM {from_clause}"


def budget_select(
    df: DataFrame,
    budgets: dict,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
    n_buckets: int = 4096,
    salt: str = "budget:",
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Per-stratum token-budget prefix selection: order each stratum's
    documents by the deterministic 60-bit key, keep the maximal prefix
    whose running token total stays ≤ ``budgets[stratum]`` (a document
    that would cross the budget — and everything after it — is dropped:
    strict prefix semantics, so the result is a total-order contract, not
    a knapsack).

    Scale shape (the reason this is not one big window): a per-stratum
    ordered window is a single reducer per stratum — a non-starter when
    one language holds 40 TB. Instead:

    1. bucket the key's top bits into ``n_buckets`` ranges and build a
       map-side combined ``(stratum, bucket) -> sum(tokens)`` histogram —
       at most ``n_buckets`` rows per stratum ever shuffle;
    2. a tiny window over the histogram finds each stratum's cutoff
       bucket and the tokens already spent below it;
    3. buckets strictly below the cutoff are kept via a broadcast
       semi-join (narrow); **only the boundary bucket** — ~1/n_buckets
       of the stratum — pays the exact cumulative-sum window, seeded
       with the spent-below total.

    Strata absent from ``budgets`` are dropped (budget 0). Emits
    ``id_col, strata_col, n_tokens`` for the selected documents.
    """
    if tokens_col is None:
        tokens_col = F.size(F.split(F.col("text"), " "))
    budget = None
    for stratum, b in sorted(budgets.items()):
        cond = F.col(strata_col) == stratum
        budget = F.when(cond, F.lit(int(b))) if budget is None else budget.when(cond, F.lit(int(b)))
    budget = F.lit(0) if budget is None else budget.otherwise(F.lit(0))

    keyed = df.select(
        F.col(id_col),
        F.col(strata_col),
        tokens_col.cast("long").alias("n_tokens"),
        key60_col(salt, id_col).alias("hkey"),
        budget.cast("long").alias("budget"),
    ).withColumn(
        # integer division: hkey spans the full 60-bit range, which double
        # division (53-bit mantissa) would mis-bucket at the boundaries
        "bucket",
        F.expr(f"CAST(hkey DIV {(1 << 60) // n_buckets} AS INT)"),
    )
    if persist and handles is not None:
        # keyed (md5 key + token count over the input subtree) feeds the
        # histogram AND both output branches — persist so the input
        # evaluates once; release via the caller's handles (house rule)
        keyed = keyed.persist()
        handles.append(keyed)

    hist = keyed.groupBy(strata_col, "bucket", "budget").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cut = (
        hist.withColumn("below", F.coalesce(F.sum("bucket_tokens").over(w), F.lit(0)))
        # the cutoff bucket: first whose cumulative total crosses the
        # budget; everything below it fits entirely
        .withColumn("fits", F.col("below") + F.col("bucket_tokens") <= F.col("budget"))
        .withColumn("starts_within", F.col("below") <= F.col("budget"))
    )
    cutoff = (
        cut.filter(~F.col("fits") & F.col("starts_within"))
        .groupBy(strata_col)
        .agg(F.min("bucket").alias("cut_bucket"))
    )
    spent = (
        cut.join(cutoff, strata_col, "left")
        .filter(F.col("fits") & (F.col("bucket") < F.coalesce(F.col("cut_bucket"), F.lit(n_buckets))))
        .groupBy(strata_col)
        .agg(F.sum("bucket_tokens").alias("spent_below"), F.max("bucket").alias("max_kept"))
    )
    bounds = (
        cutoff.join(spent, strata_col, "outer")
        .select(
            strata_col,
            F.coalesce(F.col("cut_bucket"), F.lit(n_buckets)).alias("cut_bucket"),
            F.coalesce(F.col("spent_below"), F.lit(0)).alias("spent_below"),
        )
    )

    tagged = keyed.join(F.broadcast(bounds), strata_col, "inner")
    kept_whole = tagged.filter(F.col("bucket") < F.col("cut_bucket"))
    wexact = (
        Window.partitionBy(strata_col)
        .orderBy("hkey", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = (
        tagged.filter(F.col("bucket") == F.col("cut_bucket"))
        .withColumn("cum", F.col("spent_below") + F.sum("n_tokens").over(wexact))
        .filter(F.col("cum") <= F.col("budget"))
    )
    cols = [id_col, strata_col, "n_tokens"]
    return kept_whole.select(*cols).unionByName(boundary.select(*cols))


def mixture_quotas(counts: dict, target_ppm: dict) -> dict:
    """Per-stratum document quotas realizing a target mixture exactly.

    Given corpus counts ``n_s`` and target proportions ``f_s`` (ppm), the
    largest total whose composition can honor every proportion is
    ``N = min over {s : f_s > 0} of (n_s * 1e6) // f_s``; each stratum
    then contributes ``quota_s = (N * f_s) // 1e6`` documents (all
    integer, so any engine reproduces it). A target stratum absent from
    the corpus forces ``N = 0`` — you cannot have 20% of a source that
    does not exist; strata not in ``target_ppm`` get quota 0.
    """
    quotas = {}
    n_total = None
    for s, f in target_ppm.items():
        if f <= 0:
            continue
        cap = (counts.get(s, 0) * 1_000_000) // int(f)
        n_total = cap if n_total is None else min(n_total, cap)
    for s, f in target_ppm.items():
        quotas[s] = ((n_total or 0) * int(f)) // 1_000_000 if f > 0 else 0
    return quotas


def mixture_rebalance(
    df: DataFrame,
    target_ppm: dict,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix:",
    n_buckets: int = 4096,
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Rebalance the corpus to a target source mixture ("50% web, 30%
    code, 20% wiki") by deterministic subsampling: compute the per-stratum
    quotas via :func:`mixture_quotas` and keep each stratum's first
    ``quota`` documents in (60-bit hash, id) order.

    Scale shape: the count pass is a map-side combined per-stratum
    aggregate whose result is **bounded by the number of sources** — the
    one ``collect`` here is the same ≤-dozens-row rollup shape as
    ``metrics.py`` — and the selection reuses ``budget_select``'s
    histogram/boundary-bucket decomposition with weight 1 per document
    (count quotas ARE token budgets with unit tokens), so no stratum-wide
    window ever runs. Emits ``id_col, strata_col``.
    """
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    quotas = mixture_quotas(counts, target_ppm)
    picked = budget_select(
        df,
        {s: q for s, q in quotas.items() if q > 0},
        strata_col=strata_col,
        id_col=id_col,
        tokens_col=F.lit(1),
        n_buckets=n_buckets,
        salt=salt,
        persist=persist,
        handles=handles,
    )
    return picked.select(id_col, strata_col)


def top_fraction_select(
    df: DataFrame,
    frac_ppm: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    score_col: Column | None = None,
    carry_cols: tuple = (),
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Per-stratum top-fraction selection ("keep the best 30% of each
    language by quality score" — the C4/FineWeb-style adaptive gate):
    rank each stratum's documents by (score DESC, id ASC) and keep
    rank <= quota, quota = ceil(n * frac_ppm / 1e6) computed in pure
    integer arithmetic (a float `ceil(0.3 * n)` rounds differently
    across engines; `(n * ppm + 999999) DIV 1e6` cannot).

    Scale shape: the score domain is BOUNDED (quality_score_milli is
    0..1000), so a map-side combined ``(stratum, score) -> count``
    histogram (<= 1001 rows per stratum ever shuffle) finds each
    stratum's cutoff score and how much of the quota the strictly-better
    scores consume; docs strictly above the cutoff are kept via a
    broadcast join (narrow), and ONLY the cutoff-score tie group — the
    docs sharing that one score value — pays an exact row_number window.
    Identical to the naive per-stratum rank at any partitioning.

    ``score_col`` defaults to ``textstats.quality_score_milli(text)``.
    Emits ``id_col, strata_col, score`` plus any ``carry_cols`` (input
    columns passed through both branches so downstream stages need no
    join back).
    """
    from .textstats import quality_score_milli

    if score_col is None:
        score_col = quality_score_milli(F.coalesce(F.col("text"), F.lit("")))
    scored = df.select(
        F.col(id_col),
        F.col(strata_col),
        score_col.cast("long").alias("score"),
        *[F.col(c) for c in carry_cols],
    )
    if persist and handles is not None:
        # scored is consumed THREE times (histogram subtree inside the
        # broadcast cut, the kept_above branch, the tie branch) — when the
        # score expression is expensive (quality_score_milli's JVM regex,
        # or an upstream Arrow stage like repetition_signals) each branch
        # re-evaluated it. Persist only with a release channel.
        scored = scored.persist()
        handles.append(scored)
    hist = scored.groupBy(strata_col, "score").agg(F.count(F.lit(1)).alias("cnt"))
    w_above = (
        Window.partitionBy(strata_col)
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(strata_col)
    cut = (
        hist.withColumn("above", F.coalesce(F.sum("cnt").over(w_above), F.lit(0)))
        .withColumn("n", F.sum("cnt").over(w_all))
        .withColumn(
            # least(n, ...) clamps frac_ppm > 1e6 to "keep all": without it
            # no histogram row satisfies above + cnt >= quota and the cut
            # frame comes back EMPTY, silently dropping the whole stratum
            "quota",
            F.expr(f"least(n, (n * {int(frac_ppm)} + 999999) DIV 1000000)"),
        )
        .filter((F.col("above") < F.col("quota")) & (F.col("above") + F.col("cnt") >= F.col("quota")))
        .select(
            strata_col,
            F.col("score").alias("cut_score"),
            (F.col("quota") - F.col("above")).alias("tie_quota"),
        )
    )
    tagged = scored.join(F.broadcast(cut), strata_col, "inner")
    kept_above = tagged.filter(F.col("score") > F.col("cut_score"))
    w_tie = Window.partitionBy(strata_col).orderBy(id_col)
    ties = (
        tagged.filter(F.col("score") == F.col("cut_score"))
        .withColumn("rn", F.row_number().over(w_tie))
        .filter(F.col("rn") <= F.col("tie_quota"))
    )
    cols = [id_col, strata_col, "score", *carry_cols]
    return kept_above.select(*cols).unionByName(ties.select(*cols))
