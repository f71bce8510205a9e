"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: cross join restricted to the
  query set, JVM-side fold for the dot product (no Python), window top-k.
  The baseline and the verifier for approximate variants.
* ``lsh_ann_topk`` — random-hyperplane LSH buckets as the scale path:
  candidates = vectors sharing a bucket with the query in any of several
  hash tables, then exact re-rank within candidates. At 100 TB the bucket
  join replaces the cross join — the shuffle carries (bucket_key, id,
  vector) instead of the full N x Q product.
* ``embedding_near_duplicates`` — pairs with cosine >= threshold via the
  same machinery (dedup use case).

Numeric discipline: elements are cast float32 -> float64 BEFORE any
arithmetic and accumulated left-to-right (``F.aggregate`` fold), which is
bit-reproducible across engines — the DuckDB oracle writes the same fold
explicitly, so similarity values compare exactly (floored to milli units).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import oversized_bucket_filter

N_HYPERPLANES = 8
N_TABLES = 8


def _dot(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    sq = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.sqrt(sq)


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase per-query top-k over (query_id, neighbor_id, cos_milli).

    Phase 1 keeps each scan partition's local top-k (window keyed on
    (query_id, partition_id) — Q x P distinct keys, so the one full shuffle
    of scores is spread evenly instead of funneling the whole corpus into Q
    reducer tasks). Phase 2 re-ranks the surviving k x P rows per query.
    Vectors are projected away BEFORE any shuffle: only 3 scalar columns
    move. The same total order (cos desc, neighbor_id asc) at both phases
    makes the result identical to a single global window.
    """
    order = (F.desc("cos_milli"), F.asc("neighbor_id"))
    w_local = Window.partitionBy("query_id", "pid").orderBy(*order)
    w_final = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.select("query_id", "neighbor_id", "cos_milli")
        .withColumn("pid", F.spark_partition_id())
        .withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= k)
        .withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_milli", F.col("rank").cast("int").alias("rank")
        )
    )


def cosine_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours for each query id (excluding self).

    Output: (query_id, neighbor_id, cos_milli, rank). Tie-break on
    neighbor_id so ordering is total and engine-independent.
    """
    queries = df.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    corpus = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    # Broadcast the QUERY SET (a handful of rows), never the corpus: at
    # 100 TB the corpus cannot be replicated, while the small query side
    # streams past every corpus partition in place (BroadcastNestedLoopJoin
    # with the tiny side replicated — no shuffle of the corpus at all).
    scored = (
        F.broadcast(queries).join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_milli", F.floor(cosine_col("qv", "nv") * 1000).cast("long"))
    )
    return _topk(scored, k)


def _hyperplanes(dim: int, seed: int = 0xC0FFEE) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (LCG -> uniform [-1, 1))."""
    n = N_TABLES * N_HYPERPLANES * dim
    state = seed
    vals = np.empty(n, dtype=np.float64)
    for i in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        vals[i] = state / float(1 << 62) - 1.0
    return vals.reshape(N_TABLES, N_HYPERPLANES, dim)


def lsh_bucket_col(vec_col, planes: np.ndarray, table: int):
    """Sign-bucket key of one hash table, as a JVM expression."""
    bits = []
    for j in range(planes.shape[1]):
        coeffs = F.array(*[F.lit(float(c)) for c in planes[table, j]])
        proj = F.aggregate(
            F.zip_with(vec_col, coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (1 << j))
    key = bits[0]
    for b in bits[1:]:
        key = key + b
    return F.concat_ws("_", F.lit(table), key)


def lsh_tagged_compact(
    df: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """(id, vector, norm, buckets array<string>) — ONE row per vector,
    all ``N_TABLES`` bucket keys in a single array column.

    This is the Arrow-efficient core of ``lsh_tagged_frame``: the old
    exploded form shipped every vector ``N_TABLES`` (8) times across the
    Python->JVM Arrow boundary (the dominant bytes of the tagging stage —
    each 64-float vector is ~50x its id). The compact form crosses once
    per vector; consumers that need the exploded (id, bucket) rows derive
    them with a JVM-side ``explode`` of the slim columns only, and attach
    the vector/norm payload AFTER candidate pairs are deduplicated
    (guide §8: decide with small rows, move heavy rows once). Bucket
    math is unchanged (same cumsum fold, same keys).
    """
    import pandas as pd

    planes = _hyperplanes(dim)
    n_tables, n_planes = planes.shape[0], planes.shape[1]
    vec_type = dict(df.dtypes)[vec_col]

    def _tag(batches):
        for pdf in batches:
            if not len(pdf):  # np.stack raises on an empty batch
                continue
            xs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = len(xs)
            # fold-ordered norm: cumsum accumulates left-to-right like the
            # F.aggregate fold / the oracle's sql_norm — bit-identical
            norms = np.sqrt(np.cumsum(xs * xs, axis=1)[:, -1])
            keys = np.empty((n_tables, n), dtype=np.int64)
            for t in range(n_tables):
                prods = xs[:, None, :] * planes[t][None, :, :]
                proj = np.cumsum(prods, axis=2)[:, :, -1]
                keys[t] = ((proj >= 0).astype(np.int64) << np.arange(n_planes)).sum(
                    axis=1
                )
            buckets = [
                [f"{t}_{keys[t, i]}" for t in range(n_tables)] for i in range(n)
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: list(pdf[vec_col]),
                    "norm": norms,
                    "buckets": buckets,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        _tag,
        f"{id_col} long, {vec_col} {vec_type}, norm double, buckets array<string>",
    )


def lsh_tagged_frame(
    df: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """(id, vector, norm, bucket) exploded over all hash tables, computed
    in ONE vectorized Arrow stage instead of the equivalent JVM tree.

    ``norm`` is the vector's fold-ordered float64 norm (np.cumsum of
    squares == the ``_norm`` JVM fold == the oracle's ``sql_norm`` —
    bit-identical), precomputed ONCE per vector so the per-candidate-pair
    cosine downstream is dot/(na*nb): one 64-element fold per pair instead
    of three (the r5 `dedup_embedding_lsh` x6 watch item's named fix).

    The expression form (``lsh_bucket_col`` x N_TABLES, kept for the
    oracle's documentation of the fold) builds a ~4,096-literal tree
    (8 tables x 8 planes x 64 coefficients) whose Catalyst analysis +
    codegen costs seconds PER QUERY — dominant at bench scale, pure
    overhead at any scale. The numpy path is bucket-for-bucket identical:
    ``np.cumsum`` accumulates sequentially, so each projection carries the
    same left-to-right float64 rounding as the ``F.aggregate`` fold the
    DuckDB oracle replays (same argument as ``ivf_centroids_replay``),
    and the sign/bit/key assembly is integer-exact.

    Note: a filter on ``id_col`` cannot push BELOW a mapInPandas stage —
    callers that need a tagged subset (the ANN query side) must filter
    the input BEFORE calling this, not the output.

    Implementation: a JVM-side explode of ``lsh_tagged_compact`` — the
    vector payload crosses the Arrow boundary once per vector instead of
    once per (vector, table); the exploded rows are identical."""
    compact = lsh_tagged_compact(df, id_col, vec_col, dim)
    return compact.select(
        F.col(id_col), F.col(vec_col), F.col("norm"),
        F.explode("buckets").alias("bucket"),
    )


def lsh_ann_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidate buckets + exact re-rank.

    The QUERY side tags only the filtered query rows (an id filter cannot
    push below the Arrow bucket stage, so tagging-then-filtering would
    bucket the whole corpus twice); the corpus side is tagged once. Each
    tagging is therefore single-use and needs no persist — ``persist``/
    ``handles`` are accepted for callers that want the corpus tagging
    cached across several probes of the same index."""
    tagged = lsh_tagged_frame(df, id_col, vec_col, dim)
    if persist and handles is not None:
        # persist only with a release channel — an unreleasable persist
        # leaks into the shared session's CacheManager (CLAUDE.md)
        tagged = tagged.persist()
        handles.append(tagged)
    q = lsh_tagged_frame(
        df.filter(F.col(id_col).isin(list(query_ids))), id_col, vec_col, dim
    ).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("norm").alias("qn"), "bucket",
    )
    c = tagged.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        F.col("norm").alias("nn"), "bucket",
    )
    # Score BEFORE distinct — deliberately NOT the pair-first shape
    # lsh_near_duplicates uses: the query side is a handful of rows, so
    # the candidate volume is tiny (|Q| x bucketmates) and the dominant
    # cost is evaluating the corpus tagging, which this shape does ONCE
    # (a pair-first rewrite was measured ~1.5x slower here — it needs the
    # corpus subtree twice, for buckets and for the vector attach).
    # Duplicate candidate rows (<= N_TABLES per pair) produce identical
    # cos_milli and collapse under the scalar-only distinct — the
    # exchange carries 3 scalars, never the vectors. Carried-norm cosine:
    # dot/(qn*nn), one 64-element fold per candidate row instead of three.
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_milli",
            F.floor(_dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")) * 1000).cast("long"),
        )
        .select("query_id", "neighbor_id", "cos_milli")
        .distinct()
    )
    return _topk(scored, k)


IVF_CLUSTERS = 16
IVF_NPROBE = 2
IVF_ITERS = 8
#: fixed-point scale for the distributed Lloyd partial sums: per-element
#: floor(xn * 2^20) BEFORE summation makes every per-cluster sum an exact
#: int64 — order-INDEPENDENT, so the distributed aggregation is bit-
#: deterministic regardless of partitioning AND exactly replayable by the
#: oracle builder in numpy. (Float partial sums would round differently
#: per partition order — non-deterministic run to run.)
IVF_QUANT = 1 << 20
#: training rows with fold-norm below this are excluded (a zero-ish vector
#: divided by the 1e-12 norm clamp would overflow the quantization)
IVF_MIN_NORM = 1e-6


def _normalized_col(vec_col):
    """array<double> of the unit-normalized vector. The norm is hoisted
    through a 1-element transform binding — an inline ``_norm`` inside the
    division lambda would be re-evaluated PER ELEMENT (no subexpression
    elimination in higher-order-function lambdas: O(dim^2) per row)."""
    norm = F.greatest(_norm(vec_col), F.lit(1e-12))
    return F.element_at(
        F.transform(
            F.array(norm),
            lambda n: F.transform(vec_col, lambda x: x.cast("double") / n),
        ),
        1,
    )


def _fold_dots_np(xn: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(n, k) dots with the SAME sequential left-to-right float64 rounding
    as the Spark ``F.aggregate`` fold. np.cumsum accumulates strictly in
    order (unlike np.dot/np.sum's pairwise/SIMD regrouping), so its last
    element equals the fold bit-for-bit."""
    prods = xn[:, None, :] * centroids[None, :, :]
    return np.cumsum(prods, axis=2)[:, :, -1]


def _normalize_np(x: np.ndarray) -> np.ndarray:
    """Replays ``_normalized_col`` in numpy: fold-ordered sum of squares,
    sqrt, clamp, per-element divide."""
    sq = np.cumsum(x * x, axis=1)[:, -1]
    norm = np.maximum(np.sqrt(sq), 1e-12)
    return x / norm[:, None], norm


def _update_centroids(old: np.ndarray, agg: dict) -> np.ndarray:
    """Shared driver-side Lloyd update (Spark path AND oracle replay call
    THIS function, so only the per-row map needs cross-engine parity).
    ``agg``: 1-based cluster -> (count, [int64 quantized sums per dim]).
    An emptied cluster keeps its old centroid."""
    c = old.copy()
    for j in range(old.shape[0]):
        cnt, sums = agg.get(j + 1, (0, None))
        if not cnt:
            continue
        m = np.asarray(sums, dtype=np.float64) / (float(cnt) * IVF_QUANT)
        norm = float(np.linalg.norm(m))
        if norm > 0:
            c[j] = m / norm
    return c


def ivf_train_distributed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = IVF_CLUSTERS,
    iters: int = IVF_ITERS,
    sample_mod: int = 1,
    handles: list | None = None,
) -> np.ndarray:
    """Distributed deterministic spherical k-means: the training scan is a
    Spark aggregation — the corpus NEVER collects to the driver.

    Per round: assignment = argmax of the per-centroid float64 fold over
    the normalized vector (first index wins ties), then one
    groupBy(cluster) producing (count, per-dimension int64 sums of
    floor(xn * 2^20)) — k rows to the driver, where ``_update_centroids``
    renormalizes. Integer sums are order-independent, so the result is
    bit-deterministic at ANY partitioning/cluster size and exactly
    replayable by ``ivf_centroids_replay`` (the oracle side). Init = the
    ``n_clusters`` smallest-id training vectors (a bounded k-row collect).
    ``sample_mod`` trains on the deterministic slice id %% sample_mod == 0
    — the knob that keeps training cost fixed as the corpus grows (the
    index over 100 TB does not need every vector to place centroids).
    """
    import pandas as pd

    train = df
    if sample_mod > 1:
        train = train.filter(F.col(id_col) % sample_mod == 0)
    xn = _normalized_col(F.col(vec_col))
    tdf = (
        train.filter(_norm(F.col(vec_col)) > IVF_MIN_NORM)
        .select(F.col(id_col).alias("_id"), xn.alias("xn"))
        .persist()
    )
    try:
        init_rows = tdf.orderBy("_id").limit(n_clusters).select("xn").collect()
    except Exception:
        tdf.unpersist()
        raise
    if not init_rows:
        tdf.unpersist()
        raise ValueError("ivf_train_distributed: no usable training vectors")
    # appended only after the empty-training check: on the raise above the
    # frame is already released, and a stale reference in the CALLER's
    # handles would double-unpersist it later
    if handles is not None:
        handles.append(tdf)
    c = np.array([r[0] for r in init_rows], dtype=np.float64)
    for _ in range(iters):
        centroids = c  # capture per-iteration value for the closure

        def _partials(batches):
            # vectorized per-partition map: the SAME numpy arithmetic as
            # ivf_centroids_replay (cumsum fold + first-max argmax +
            # quantized int sums), so Spark path == oracle replay by
            # construction — and one small Arrow stage replaces a
            # 16x64-term codegen fold that recompiled every round
            for pdf in batches:
                if not len(pdf):  # np.stack raises on an empty batch
                    continue
                xs = np.stack(pdf["xn"].to_numpy())
                q = np.floor(xs * float(IVF_QUANT)).astype(np.int64)
                assign = np.argmax(_fold_dots_np(xs, centroids), axis=1)
                rows = [
                    (int(j) + 1, int((assign == j).sum()), q[assign == j].sum(axis=0).tolist())
                    for j in np.unique(assign)
                ]
                yield pd.DataFrame(rows, columns=["cluster", "cnt", "sums"])

        # <= n_clusters rows per PARTITION reach the driver (bounded by
        # partitions x k, a few KB); the final reduce is exact integer
        # adds — order-independent, so the result is deterministic at any
        # partitioning
        agg: dict = {}
        for r in tdf.select("xn").mapInPandas(
            _partials, "cluster int, cnt long, sums array<long>"
        ).collect():
            cnt, sums = agg.get(r.cluster, (0, None))
            if sums is None:
                agg[r.cluster] = (r.cnt, list(r.sums))
            else:
                agg[r.cluster] = (cnt + r.cnt, [a + b for a, b in zip(sums, r.sums)])
        c = _update_centroids(c, agg)
    if handles is None:
        tdf.unpersist()
    return c


def ivf_centroids_replay(
    ids,
    vectors,
    n_clusters: int = IVF_CLUSTERS,
    iters: int = IVF_ITERS,
    sample_mod: int = 1,
) -> np.ndarray:
    """Exact numpy replay of ``ivf_train_distributed`` for the oracle
    builder: same slice, same norm filter, same fold-ordered per-row
    arithmetic (cumsum = the Spark fold), same quantized order-free sums,
    same shared ``_update_centroids``. Bit-identical centroids."""
    ids = np.asarray(ids, dtype=np.int64)
    x = np.asarray(vectors, dtype=np.float64)
    if sample_mod > 1:
        keep = ids % sample_mod == 0
        ids, x = ids[keep], x[keep]
    xn, norm = _normalize_np(x)
    keep = norm > IVF_MIN_NORM
    ids, xn = ids[keep], xn[keep]
    if not len(ids):
        raise ValueError("ivf_centroids_replay: no usable training vectors")
    q = np.floor(xn * float(IVF_QUANT)).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    c = xn[order[:n_clusters]].copy()
    for _ in range(iters):
        assign = np.argmax(_fold_dots_np(xn, c), axis=1)  # first max, like Spark
        agg = {}
        for j in range(c.shape[0]):
            members = q[assign == j]
            if len(members):
                agg[j + 1] = (len(members), members.sum(axis=0, dtype=np.int64))
        c = _update_centroids(c, agg)
    return c


def _ivf_dots_col(vec_col, centroids: np.ndarray):
    """array<double> of the query/corpus vector's dot with each centroid —
    the same left-to-right float64 fold as ``_dot`` so the DuckDB oracle
    reproduces every value bit-for-bit."""
    cols = []
    for row in centroids:
        coeffs = F.array(*[F.lit(float(v)) for v in row])
        cols.append(
            F.aggregate(
                F.zip_with(vec_col, coeffs, lambda x, c: x.cast("double") * c),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return F.array(*cols)


def _ivf_tagged_frame(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    with_norm: bool = False,
) -> DataFrame:
    """(id, vector, cluster) in ONE vectorized Arrow stage — the
    expression form (``_ivf_dots_col``, kept as the oracle's documentation
    of the fold) is a ~1,024-literal tree with per-query compile cost.
    Same parity argument as ``lsh_tagged_frame``: cumsum == the fold the
    oracle's SQL replays, so cluster ids are identical. ``cluster`` is
    the 1-based first-max index. Probe sets are NOT computed here — only
    the handful of query rows need them (``_ivf_probe_frame``); an
    every-row O(k^2) probe computation would be discarded corpus-wide."""
    import pandas as pd

    vec_type = dict(df.dtypes)[vec_col]

    def _tag(batches):
        for pdf in batches:
            if not len(pdf):  # np.stack raises on an empty batch
                continue
            xs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ds = _fold_dots_np(xs, centroids)  # (n, k)
            cluster = np.argmax(ds, axis=1) + 1  # first max, like the SQL
            out = {
                id_col: pdf[id_col],
                vec_col: list(pdf[vec_col]),
                "cluster": cluster,
            }
            if with_norm:
                # fold-ordered norm (cumsum == the F.aggregate fold ==
                # sql_norm) — carried so per-pair cosine downstream is
                # dot/(na*nb), same as lsh_tagged_frame
                out["norm"] = np.sqrt(np.cumsum(xs * xs, axis=1)[:, -1])
            yield pd.DataFrame(out)

    norm_field = ", norm double" if with_norm else ""
    return df.select(id_col, vec_col).mapInPandas(
        _tag, f"{id_col} long, {vec_col} {vec_type}, cluster long{norm_field}"
    )


def _ivf_probe_frame(
    df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray, nprobe: int
) -> DataFrame:
    """(query_id, qv, cluster) with one row per probed cluster, over an
    ALREADY-FILTERED query frame (filter the input before this — it
    cannot push below the Arrow stage). Probe rule: every cluster whose
    dot is exceeded by fewer than ``nprobe`` others — identical floats to
    the oracle's ``len(list_filter(ds, x -> x > ds[j])) < nprobe``."""
    import pandas as pd

    vec_type = dict(df.dtypes)[vec_col]

    def _probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            xs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ds = _fold_dots_np(xs, centroids)
            n_greater = (ds[:, None, :] > ds[:, :, None]).sum(axis=2)  # (n, k)
            ids, vecs, clusters = [], [], []
            for i in range(len(xs)):
                for j in np.nonzero(n_greater[i] < nprobe)[0]:
                    ids.append(pdf[id_col].iloc[i])
                    vecs.append(pdf[vec_col].iloc[i])
                    clusters.append(int(j) + 1)
            yield pd.DataFrame(
                {"query_id": ids, "qv": vecs, "cluster": clusters}
            )

    return df.select(id_col, vec_col).mapInPandas(
        _probe, f"query_id long, qv {vec_type}, cluster long"
    )


def ivf_topk(
    df: DataFrame,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = IVF_CLUSTERS,
    nprobe: int = IVF_NPROBE,
    iters: int = IVF_ITERS,
    sample_mod: int = 1,
    handles: list | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their nearest
    k-means centroid (the inverted file); each query probes its ``nprobe``
    best clusters and re-ranks exactly within them.

    Scale shape: training is DISTRIBUTED (``ivf_train_distributed`` — the
    corpus never collects; each Lloyd round ships k rows of exact integer
    partial sums to the driver, ``sample_mod`` bounds training cost as the
    corpus grows); cluster assignment is a JVM expression over broadcast
    centroid literals; the candidate join is an equi-join on cluster id,
    so only (cluster, id, vector-of-candidates) shuffles — never the
    N x Q product. Cluster membership counts are data-dependent; probing
    more clusters trades cost for recall like any IVF index.

    Cluster id = 1-based position of the max dot (first occurrence on
    ties) — the same rule the oracle's ``list_indexof(ds, list_max(ds))``
    applies. A query's probe set = every cluster j whose dot is exceeded
    by fewer than ``nprobe`` other clusters (identical floats => identical
    sets in both engines; the oracle replays training bit-exactly via
    ``ivf_centroids_replay``).
    """
    centroids = ivf_train_distributed(
        df, id_col, vec_col, n_clusters, iters, sample_mod, handles=handles
    )
    # fewer training rows than requested clusters -> fewer centroids; probe
    # indices must match across engines
    n_clusters = centroids.shape[0]
    nprobe = min(nprobe, n_clusters)
    corpus = _ivf_tagged_frame(df, id_col, vec_col, centroids).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "cluster"
    )
    # the query side probes only the FILTERED rows (a handful) — filtering
    # the tagged corpus instead would re-run the Arrow stage corpus-wide
    # (no pushdown through mapInPandas)
    queries = _ivf_probe_frame(
        df.filter(F.col(id_col).isin(list(query_ids))),
        id_col, vec_col, centroids, nprobe,
    )
    # score-then-distinct: dedupe multi-probe candidates on scalars only so
    # the exchange never carries embedding vectors (see lsh_ann_topk)
    scored = (
        queries.join(corpus, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_milli", F.floor(cosine_col("qv", "nv") * 1000).cast("long"))
        .select("query_id", "neighbor_id", "cos_milli")
        .distinct()
    )
    return _topk(scored, k)


def embedding_near_duplicates(
    df: DataFrame,
    threshold_milli: int = 990,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    guard_max_rows: int | None = 100_000,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    Brute force at test scale; the LSH bucket join above is the 100 TB path
    (same verify step, candidate generation swapped). Like
    ``dedup.ngram_jaccard_pairs_bruteforce`` this is VERIFICATION-ONLY:
    ``guard_max_rows`` raises before the O(n^2) cross join is built if the
    input is production-sized. Pass ``None`` only for bounded per-bucket use.
    """
    if guard_max_rows is not None:
        # bounded probe, not a full count: scan stops after the first
        # guard_max_rows+1 rows instead of materializing the whole input
        # just to decide the guard
        if df.limit(guard_max_rows + 1).count() > guard_max_rows:
            raise ValueError(
                f"embedding_near_duplicates is O(n^2): input exceeds "
                f"guard_max_rows={guard_max_rows}. Use lsh_near_duplicates "
                "at scale, or pass guard_max_rows=None for per-bucket use."
            )
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cos_milli", F.floor(cosine_col("va", "vb") * 1000).cast("long"))
        .filter(F.col("cos_milli") >= threshold_milli)
        .select("a", "b", "cos_milli")
    )


def lsh_near_duplicates(
    df: DataFrame,
    threshold_milli: int = 990,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via hyperplane-LSH buckets — the 100 TB
    form of ``embedding_near_duplicates``: candidates come from the bucket
    equi-join (only (bucket, id, vector) shuffles) instead of the O(n^2)
    cross join; the exact-cosine verification is identical.

    Recall at ``threshold_milli=990`` (angle <= ~8.1 deg): a random
    hyperplane separates such a pair with p ~= 0.026, so missing all
    ``N_TABLES`` 8-bit buckets has probability ~(1 - 0.974^8)^8 ~= 1.5e-6
    — effectively total, which is why this can share the brute-force
    oracle on the test corpus.
    """
    compact = lsh_tagged_compact(df, id_col, vec_col, dim)
    if persist and handles is not None:
        # the compact tagging (one Arrow stage, ONE row per vector) is
        # consumed by the bucket explode, the guard count and both vector
        # attach sides — persist so it evaluates once; only with a release
        # channel (caller unpersists via ``handles`` — an unreleasable
        # persist leaks, CLAUDE.md). The footprint is 1/N_TABLES of the
        # old exploded persist.
        compact = compact.persist()
        handles.append(compact)
    # Candidate generation on SLIM rows (guide §8): only (bucket, id)
    # flows through the self-join and the pair distinct — the old plan
    # carried both 64-float vectors through the bucket join and paid the
    # cosine fold once per shared bucket (<= N_TABLES recomputes per
    # pair). Deduplicating first means each surviving pair is scored
    # exactly once, and the distinct's exchange carries two longs.
    buckets = compact.select(F.col(id_col), F.explode("buckets").alias("bucket"))
    # degenerate-bucket guard (same rationale as dedup.lsh_candidate_pairs
    # MAX_BUCKET): a hot bucket — zero-norm or identical-direction vectors
    # en masse — would otherwise re-create the O(n^2) join this operator
    # exists to avoid. Aggregate + broadcast anti-join, not a sort-window.
    sized = oversized_bucket_filter(buckets, "bucket")
    pairs = (
        sized.select("bucket", F.col(id_col).alias("a"))
        .join(sized.select("bucket", F.col(id_col).alias("b")), "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # attach payloads once per pair side and score once per pair; the
    # carried norms make the cosine dot/(na*nb) — one 64-element fold,
    # bit-identical to the oracle's inline sql_norm (cumsum == the fold)
    va = compact.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), F.col("norm").alias("na")
    )
    vb = compact.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), F.col("norm").alias("nb")
    )
    return (
        pairs.join(va, "a")
        .join(vb, "b")
        .withColumn(
            "cos_milli",
            F.floor(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")) * 1000).cast("long"),
        )
        .filter(F.col("cos_milli") >= threshold_milli)
        .select("a", "b", "cos_milli")
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold_milli: int = 990,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    persist: bool = False,
    handles: list | None = None,
) -> DataFrame:
    """Embedding-level benchmark decontamination: flag every corpus
    vector within ``threshold_milli`` cosine of ANY eval-set vector.

    N-gram decontamination (``curation.decontaminate``) misses
    paraphrased contamination; this is its semantic sibling — the
    cross-SET form of ``lsh_near_duplicates``: both sides are tagged
    once in the shared Arrow bucket stage (carried fold-ordered norms),
    candidates come from the bucket equi-join of the bounded eval side
    against the corpus (the 100 TB side never cross-joins and only
    (bucket, id, vector) shuffles), the corpus side is guarded against
    degenerate buckets, and the exact-cosine verify is identical to the
    near-dup family — so it shares the brute-force oracle's recall
    argument (missing all 8 buckets at cos >= 0.99 is ~1.5e-6).

    Output: ``(id_col, n_matches, max_cos_milli)`` — contaminated corpus
    rows only (downstream anti-joins the ids away).
    """
    compact_c = lsh_tagged_compact(corpus, id_col, vec_col, dim)
    compact_e = lsh_tagged_compact(eval_df, id_col, vec_col, dim)
    if persist and handles is not None:
        # the corpus tagging is consumed by the bucket explode, the guard
        # count and the vector attach — persist only with a release
        # channel (CLAUDE.md); eval side is bounded but also reused twice
        compact_c = compact_c.persist()
        handles.append(compact_c)
        compact_e = compact_e.persist()
        handles.append(compact_e)
    # slim candidate generation (guide §8): the cross-set bucket join and
    # the pair distinct carry ids only; the corpus-side 100 TB payload
    # attaches to the deduplicated pairs, so each pair is scored exactly
    # once (the old plan carried both vectors through the bucket join and
    # re-scored per shared bucket, <= N_TABLES times)
    c_buckets = oversized_bucket_filter(
        compact_c.select(F.col(id_col).alias("cid"), F.explode("buckets").alias("bucket")),
        "bucket",
    )
    e_buckets = compact_e.select(
        F.col(id_col).alias("eid"), F.explode("buckets").alias("bucket")
    )
    cand = c_buckets.join(e_buckets, "bucket").select("cid", "eid").distinct()
    cv = compact_c.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("vc"), F.col("norm").alias("nc")
    )
    ev = compact_e.select(
        F.col(id_col).alias("eid"), F.col(vec_col).alias("ve"), F.col("norm").alias("ne")
    )
    pairs = (
        cand.join(cv, "cid")
        .join(ev, "eid")
        .withColumn(
            "cos_milli",
            F.floor(
                _dot(F.col("vc"), F.col("ve")) / (F.col("nc") * F.col("ne")) * 1000
            ).cast("long"),
        )
        .filter(F.col("cos_milli") >= threshold_milli)
        .select("cid", "eid", "cos_milli")
    )
    return pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.max("cos_milli").alias("max_cos_milli"),
    ).select(F.col("cid").alias(id_col), "n_matches", "max_cos_milli")


def semantic_dedup(
    df: DataFrame,
    threshold_milli: int = 950,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = IVF_CLUSTERS,
    iters: int = IVF_ITERS,
    sample_mod: int = 1,
    max_cluster_rows: int = 8192,
    handles: list | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means-cluster-scoped
    embedding near-dup removal (Abbas et al. 2023, "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication").

    Where LSH buckets catch near-IDENTICAL directions (cos >= ~0.99),
    cluster scoping works at lower thresholds (0.90-0.95) that an
    8-bit hyperplane bucket would shatter: candidates are all pairs
    within the same IVF cluster, so semantically-similar-but-not-
    colinear pairs still meet. Pipeline:

    1. centroids = the repo's distributed deterministic spherical
       k-means (order-free integer sums; ``sample_mod`` bounds training
       cost at corpus scale).
    2. ONE Arrow tagging pass assigns every vector its first-max
       cluster and carries the fold-ordered norm.
    3. Within-cluster self-join on the cluster id (the only join key —
       never all-pairs); ``max_cluster_rows`` guards a degenerate
       cluster from re-creating O(n^2), same aggregate + broadcast
       anti-join shape as the LSH hot-bucket guard (a guarded-out
       cluster keeps its rows, just unpaired — the oracle replicates).
    4. Verify = dot/(na*nb) (one fold per pair), greedy smaller-id-wins:
       a row is a duplicate iff some smaller id in its cluster scores
       >= threshold; ``dup_of`` = the smallest such id.

    Scale shape: the exchanges carry (cluster, id, vec, norm) once for
    the join and scalars after scoring; every id lands in EXACTLY one
    cluster (unlike the 8-table LSH explode) so no distinct is needed.
    Output: (id, cluster, is_dup, dup_of).
    """
    centroids = ivf_train_distributed(
        df,
        id_col=id_col,
        vec_col=vec_col,
        n_clusters=n_clusters,
        iters=iters,
        sample_mod=sample_mod,
        handles=handles,
    )
    # tagged feeds the guard count, both join sides and the final output
    # join — persist so the Arrow stage runs once. ONLY when the caller
    # supplied a release channel: an unconditional persist with
    # handles=None would leak into the shared session's CacheManager
    # (measured 2-4x degradation of later queries — CLAUDE.md).
    tagged = _ivf_tagged_frame(df, id_col, vec_col, centroids, with_norm=True)
    if handles is not None:
        tagged = tagged.persist()
        handles.append(tagged)
    sized = oversized_bucket_filter(tagged, "cluster", max_cluster_rows)
    a = sized.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
        F.col("norm").alias("na"), "cluster",
    )
    b = sized.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"), "cluster",
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cos_milli",
            F.floor(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")) * 1000
            ).cast("long"),
        )
        .filter(F.col("cos_milli") >= threshold_milli)
        .groupBy("b")
        .agg(F.min("a").alias("dup_of"))
        .withColumnRenamed("b", id_col)
    )
    return (
        tagged.select(id_col, "cluster")
        .join(dups, id_col, "left")
        .select(
            id_col,
            F.col("cluster").cast("long").alias("cluster"),
            F.col("dup_of").isNotNull().alias("is_dup"),
            F.col("dup_of").cast("long").alias("dup_of"),
        )
    )


def sql_semantic_dedup(
    src: str,
    centroids: np.ndarray,
    threshold_milli: int = 950,
    max_cluster_rows: int = 8192,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    """DuckDB replay of ``semantic_dedup`` given the replayed centroids
    (``ivf_centroids_replay``): same first-max cluster rule
    (list_indexof/list_max over the identical left-to-right dot folds),
    same guard, same carried-norm cosine, same smallest-id election."""

    def dot(i: int) -> str:
        terms = " + ".join(
            f"{vec_col}[{d + 1}]::DOUBLE * {float(centroids[i, d])!r}"
            for d in range(dim)
        )
        return f"({terms})"

    ds = ",\n         ".join(dot(i) for i in range(centroids.shape[0]))
    pair_dot = sql_dot(f"x.{vec_col}", f"y.{vec_col}", dim)
    return f"""
WITH b AS (
  SELECT {id_col}, {vec_col}, list_value({ds}) AS ds FROM {src}
), t AS (
  SELECT {id_col}, {vec_col},
         list_indexof(ds, list_max(ds)) AS cluster,
         {sql_norm(vec_col, dim)} AS norm
  FROM b
), sized AS (
  SELECT * FROM t WHERE cluster IN (
    SELECT cluster FROM t GROUP BY cluster
    HAVING count(*) <= {max_cluster_rows})
), d AS (
  SELECT y.{id_col} AS dup_id, min(x.{id_col})::BIGINT AS dup_of
  FROM sized x JOIN sized y
    ON x.cluster = y.cluster AND x.{id_col} < y.{id_col}
  WHERE floor({pair_dot} / (x.norm * y.norm) * 1000) >= {threshold_milli}
  GROUP BY y.{id_col}
)
SELECT t.{id_col}, t.cluster::BIGINT AS cluster,
       d.dup_of IS NOT NULL AS is_dup, d.dup_of
FROM t LEFT JOIN d ON t.{id_col} = d.dup_id
"""


def sql_dot(a: str, b: str, dim: int = 64) -> str:
    """The identical left-to-right fold as DuckDB SQL (oracle side)."""
    terms = " + ".join(f"{a}[{i}]::DOUBLE * {b}[{i}]::DOUBLE" for i in range(1, dim + 1))
    return "(" + terms + ")"


def sql_norm(a: str, dim: int = 64) -> str:
    terms = " + ".join(f"{a}[{i}]::DOUBLE * {a}[{i}]::DOUBLE" for i in range(1, dim + 1))
    return f"sqrt({terms})"


def sql_cosine(a: str, b: str, dim: int = 64) -> str:
    return f"({sql_dot(a, b, dim)} / ({sql_norm(a, dim)} * {sql_norm(b, dim)}))"
