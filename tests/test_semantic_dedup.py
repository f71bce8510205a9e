"""SemDeDup-style cluster-scoped embedding dedup: planted near-dups
flagged with smallest-id election, non-dups kept, oversized-cluster
guard keeps rows unpaired, and full DuckDB replay parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from openccnet_spark.operators.similarity import (
    ivf_centroids_replay,
    semantic_dedup,
    sql_semantic_dedup,
)

DIM = 64


def _corpus():
    """4 well-separated direction clusters x 28 points + 8 planted
    near-dups (float32-exact values so Spark's array<float> storage and
    the numpy replay see identical bits)."""
    rng = np.random.RandomState(7)
    bases = rng.randn(4, DIM)
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows = []
    for i in range(112):
        b = bases[i % 4]
        v = b + 0.25 * rng.randn(DIM)
        rows.append(v)
    x = np.array(rows)
    ids = list(range(112))
    # planted near-dups: tiny perturbation of existing points, ids 1000+
    for j in range(8):
        ids.append(1000 + j)
        x = np.vstack([x, x[j * 13] * 1.0005])
    x32 = x.astype(np.float32)
    return ids, x32


def _spark_df(spark, ids, x32):
    rows = [(int(i), [float(v) for v in vec]) for i, vec in zip(ids, x32)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_flags_planted_dups(spark):
    ids, x32 = _corpus()
    handles: list = []
    out = semantic_dedup(
        _spark_df(spark, ids, x32), threshold_milli=990, handles=handles
    )
    got = {r["vec_id"]: r for r in out.collect()}
    for h in handles:
        h.unpersist()
    assert len(got) == len(ids)
    for j in range(8):
        r = got[1000 + j]
        assert r["is_dup"] and r["dup_of"] == j * 13, r
        # originals are the smaller ids: never flagged by their copies
        assert not got[j * 13]["is_dup"]
    # most non-planted rows survive (same-cluster noise is way below 0.99)
    kept = sum(1 for r in got.values() if not r["is_dup"])
    assert kept >= 100


def test_semantic_dedup_guard_keeps_rows_unpaired(spark):
    ids, x32 = _corpus()
    handles: list = []
    out = semantic_dedup(
        _spark_df(spark, ids, x32),
        threshold_milli=990,
        max_cluster_rows=2,  # every cluster oversized -> no pairs anywhere
        handles=handles,
    )
    rows = out.collect()
    for h in handles:
        h.unpersist()
    assert len(rows) == len(ids)
    assert all(not r["is_dup"] and r["dup_of"] is None for r in rows)


def test_semantic_dedup_matches_duckdb_replay(spark):
    ids, x32 = _corpus()
    handles: list = []
    out = semantic_dedup(
        _spark_df(spark, ids, x32), threshold_milli=990, handles=handles
    )
    got = sorted(map(tuple, out.collect()))
    for h in handles:
        h.unpersist()
    centroids = ivf_centroids_replay(ids, x32.astype(np.float64))
    duckdb.register(
        "sem_t",
        pd.DataFrame(
            {"vec_id": ids, "embedding": [list(map(float, v)) for v in x32]}
        ),
    )
    sql = sql_semantic_dedup("sem_t", centroids, threshold_milli=990)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_semantic_decontaminate_flags_planted_and_only_planted(spark):
    """Exact eval copies planted in the corpus must be flagged with
    cos_milli = 1000 and matched at least against their source; clean
    orthogonal corpus rows must not appear."""
    import numpy as np
    from pyspark.sql import functions as F

    from openccnet_spark.operators.similarity import semantic_decontaminate

    rng = np.random.default_rng(5)
    dim = 64
    evals = [(i, rng.normal(size=dim).tolist()) for i in range(3)]
    # corpus: the 3 planted copies + 20 random (almost surely < 0.99 cos)
    corpus = [(100 + i, v) for i, v in evals] + [
        (200 + j, rng.normal(size=dim).tolist()) for j in range(20)
    ]
    schema = "vec_id long, embedding array<double>"
    handles: list = []
    out = semantic_decontaminate(
        spark.createDataFrame(corpus, schema),
        spark.createDataFrame(evals, schema),
        persist=True,
        handles=handles,
    )
    rows = {r["vec_id"]: (r["n_matches"], r["max_cos_milli"]) for r in out.collect()}
    for h in handles:
        h.unpersist()
    assert set(rows) == {100, 101, 102}
    # identical vectors: cos = dot/(sqrt(s)*sqrt(s)) can land one ulp
    # under 1.0, so the milli floor is 999 or 1000 (oracle floors alike)
    assert all(v[1] >= 999 for v in rows.values())


def test_semantic_decontaminate_pair_distinct_not_per_bucket(spark):
    """A pair sharing several LSH buckets must count as ONE match (the
    scalar distinct collapses bucket copies)."""
    from openccnet_spark.operators.similarity import semantic_decontaminate

    v = [1.0] * 64
    schema = "vec_id long, embedding array<double>"
    out = semantic_decontaminate(
        spark.createDataFrame([(7, v)], schema),
        spark.createDataFrame([(1, v), (2, v)], schema),
    ).collect()
    assert len(out) == 1
    assert out[0]["n_matches"] == 2 and out[0]["max_cos_milli"] == 1000
