"""Checkpoint-resume: kill after partial completion, re-run, assert the
pending buckets are processed exactly once and output has no duplicates
(SURVEY §5 Spark-side test plan item 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openccnet_spark.operators.metrics import (
    N_BUCKETS,
    checkpointed_quality_filter,
    completed_buckets,
    with_partition_id,
)
from openccnet_spark.sources.transcripts import spark_transcripts

N_CONV = 40


def test_checkpoint_resume(spark, tmp_path):
    out_dir = str(tmp_path / "ckpt")
    src = spark_transcripts(spark, N_CONV)
    n_total = src.count()
    buckets = with_partition_id(src, 8)

    # --- run 1: simulate a crash by only feeding half the buckets ---------
    partial = buckets.filter(F.col("partition_id") < 4).drop("partition_id")
    r1 = checkpointed_quality_filter(
        spark, partial, out_dir, run_id="r1", n_buckets=8, with_ppl=True
    )
    assert r1["skipped"] == []
    assert set(r1["processed"]) <= set(range(4))
    done_after_1 = completed_buckets(spark, f"{out_dir}/metrics")
    assert done_after_1 == set(r1["processed"])

    # --- run 2: full input; completed buckets must be skipped -------------
    r2 = checkpointed_quality_filter(
        spark, src, out_dir, run_id="r2", n_buckets=8, with_ppl=True
    )
    assert set(r2["skipped"]) == done_after_1
    assert set(r2["processed"]).isdisjoint(done_after_1)

    # --- output complete, no duplicates ------------------------------------
    turns = spark.read.parquet(f"{out_dir}/turns")
    assert turns.count() == n_total
    dups = (
        turns.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count()
    )
    assert dups == 0

    # --- run 3: everything done -> no-op -----------------------------------
    r3 = checkpointed_quality_filter(
        spark, src, out_dir, run_id="r3", n_buckets=8, with_ppl=True
    )
    assert r3["processed"] == []
    assert len(r3["skipped"]) == 8 or set(r3["skipped"]) == done_after_1 | set(
        r2["processed"]
    )

    # --- metrics sanity -----------------------------------------------------
    m = spark.read.parquet(f"{out_dir}/metrics")
    agg = m.agg(F.sum("turns_seen").alias("n")).collect()[0]
    assert agg.n == n_total
    row = m.limit(1).collect()[0]
    for col in ("kept", "converted", "scrubbed", "dropped_too_short"):
        assert col in m.columns
