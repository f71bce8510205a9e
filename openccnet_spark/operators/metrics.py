"""Per-partition lineage + metrics and checkpoint-resume.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". Mechanism:

* Work is bucketed by ``partition_id = pmod(xxhash64(conv_id), n_buckets)``
  — deterministic, conversation-aligned (a conversation never splits
  across buckets, so a resume can't half-process one).
* The output is written **partitioned by partition_id** with dynamic
  partition overwrite, so reprocessing a bucket is idempotent
  (exactly-once per bucket). On Iceberg this maps to
  ``df.writeTo(tbl).overwritePartitions()``; this sandbox has no Iceberg
  runtime jars, so the same semantics run on parquet via
  ``spark.sql.sources.partitionOverwriteMode=dynamic``.
* After the data commit, one row per completed bucket is appended to a
  metrics table: ``(run_id, partition_id, turns_seen, kept, converted,
  scrubbed, dropped_<rule>..., status)``. Metrics are written AFTER data:
  a crash mid-run leaves buckets absent from the metrics table and they
  are simply reprocessed on resume.
* Resume = anti-join of all buckets against completed metrics rows
  (``status = 'done'``), the SURVEY §2.2 "Resume" stage.

The metrics counters are the analog of the reference's per-chunk
accounting in its parallel convert path (``Opencc.cs:1246-1267``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .quality import DROP_RULES

N_BUCKETS = 64


def with_partition_id(df: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    return df.withColumn(
        "partition_id", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, metrics_path: str) -> set:
    """Buckets already marked done in the metrics table (empty if none)."""
    try:
        rows = (
            spark.read.parquet(metrics_path)
            .filter(F.col("status") == "done")
            .select("partition_id")
            .distinct()
            .collect()
        )
    except Exception:
        return set()
    return {r.partition_id for r in rows}


def bucket_metrics(out: DataFrame) -> DataFrame:
    """Per-bucket counters from the pipeline output (one aggregation)."""
    aggs = [
        F.count(F.lit(1)).alias("turns_seen"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum(
            (F.col("text_converted") != F.col("text")).cast("long")
        ).alias("converted"),
        F.sum(
            (F.col("text_scrubbed") != F.col("text_converted")).cast("long")
        ).alias("scrubbed"),
    ]
    for rule in DROP_RULES:
        aggs.append(
            F.sum((F.col("drop_reason") == rule).cast("long")).alias(f"dropped_{rule}")
        )
    return out.groupBy("partition_id").agg(*aggs)


def checkpointed_quality_filter(
    spark: SparkSession,
    src: DataFrame,
    out_dir: str,
    run_id: str,
    n_buckets: int = N_BUCKETS,
    **pipeline_kwargs,
) -> dict:
    """Run the quality filter with bucket-level checkpoint-resume.

    Returns {"processed": [...buckets run now], "skipped": [...already done]}.
    """
    from .pipeline import quality_filter

    data_path = os.path.join(out_dir, "turns")
    metrics_path = os.path.join(out_dir, "metrics")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    src = with_partition_id(src, n_buckets)
    done = completed_buckets(spark, metrics_path)
    pending_df = src.filter(~F.col("partition_id").isin(sorted(done))) if done else src

    # Which buckets actually have pending data (anti-join vs metrics)?
    pending = sorted(
        r.partition_id
        for r in pending_df.select("partition_id").distinct().collect()
    )
    if not pending:
        return {"processed": [], "skipped": sorted(done)}

    out = quality_filter(pending_df, **pipeline_kwargs)
    # Data first (idempotent dynamic partition overwrite)...
    out.write.mode("overwrite").partitionBy("partition_id").parquet(data_path)
    # ...then the lineage/metrics commit marks the buckets done.
    written = spark.read.parquet(data_path).filter(
        F.col("partition_id").isin(pending)
    )
    m = bucket_metrics(written).withColumn("run_id", F.lit(run_id)).withColumn(
        "status", F.lit("done")
    )
    m.write.mode("append").parquet(metrics_path)
    return {"processed": pending, "skipped": sorted(done)}