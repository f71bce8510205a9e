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
