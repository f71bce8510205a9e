"""Shard writer: membership determinism across partitionings, manifest
consistency with the written files, doc-granularity, sink round trip."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from openccnet_spark.operators.shards import (
    assign_shards,
    shard_manifest,
    write_shards,
)


def _docs(spark, n=200, parts=4, seed=6):
    rng = random.Random(seed)
    rows = [
        (i, " ".join(f"w{rng.randrange(40)}" for _ in range(rng.randrange(1, 60))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)


def test_membership_invariant_to_partitioning(spark):
    a = {(r["doc_id"], r["shard_id"])
         for r in assign_shards(_docs(spark, parts=1), 500).collect()}
    b = {(r["doc_id"], r["shard_id"])
         for r in assign_shards(_docs(spark, parts=17), 500).collect()}
    assert a == b and len(a) == 200


def test_shards_are_token_bounded_doc_granular(spark):
    """Each shard holds >= cap tokens only via its LAST doc straddling
    the boundary (assignment by start offset, docs never split)."""
    asg = assign_shards(_docs(spark), 500).collect()
    by_shard: dict[int, int] = {}
    for r in asg:
        by_shard[r["shard_id"]] = by_shard.get(r["shard_id"], 0) + r["n_tokens"]
    max_doc = max(r["n_tokens"] for r in asg)
    # start-offset rule: a shard's token mass < cap + its largest doc
    assert all(v < 500 + max_doc for v in by_shard.values())
    assert sorted(by_shard) == list(range(len(by_shard)))  # contiguous ids


def test_write_shards_round_trip(spark, tmp_path):
    docs = _docs(spark, n=120)
    path = str(tmp_path / "shards")
    manifest = {r["shard_id"]: r for r in
                write_shards(docs, path, 400).collect()}
    data = spark.read.parquet(f"{path}/data")
    got = (
        data.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.collect_list("doc_id").alias("ids"))
        .collect()
    )
    assert {r["shard_id"] for r in got} == set(manifest)
    for r in got:
        assert r["n"] == manifest[r["shard_id"]]["n_docs"]
    stored = {r["shard_id"]: r for r in
              spark.read.parquet(f"{path}/_manifest").collect()}
    assert stored.keys() == manifest.keys()
    assert all(stored[k]["doc_digest"] == manifest[k]["doc_digest"]
               for k in stored)
    # full corpus present exactly once
    assert data.count() == 120 and data.select("doc_id").distinct().count() == 120


def test_manifest_digest_detects_membership_change(spark):
    docs = _docs(spark, n=50)
    m1 = {r["shard_id"]: r["doc_digest"]
          for r in shard_manifest(docs, 300).collect()}
    tweaked = docs.withColumn(
        "doc_id", F.when(F.col("doc_id") == 7, 7777).otherwise(F.col("doc_id"))
    )
    m2 = {r["shard_id"]: r["doc_digest"]
          for r in shard_manifest(tweaked, 300).collect()}
    assert m1 != m2
