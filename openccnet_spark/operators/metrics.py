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
    """Buckets already marked done in the metrics table (empty if none).

    Only the missing-table case (first run: the metrics path does not
    exist yet) maps to "nothing done"; any OTHER read failure — transient
    FS error, permissions, corrupt footer — must raise, or a resume would
    silently reprocess every bucket of a multi-hour run and append
    duplicate lineage rows."""
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.parquet(metrics_path)
            .filter(F.col("status") == "done")
            .select("partition_id")
            .distinct()
            .collect()
        )
    except AnalysisException as exc:
        # Prefer the structured error class (stable API contract) over
        # message text, which Spark rewords across versions. Fall back to
        # the known message shapes only when no class is exposed.
        cond = None
        for probe in ("getCondition", "getErrorClass"):
            fn = getattr(exc, probe, None)
            if fn is not None:
                try:
                    cond = fn()
                except Exception:
                    cond = None
                if cond:
                    break
        # a non-matching structured class must still FALL THROUGH to the
        # message probe: some Spark versions raise missing-path through a
        # legacy error class whose message is the only stable signal
        if cond == "PATH_NOT_FOUND" or (
            "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc)
        ):
            return set()
        raise
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
    # candidate buckets = the bucket-id complement — pure driver-side
    # arithmetic. (A distinct-collect over the source to enumerate which
    # of <= n_buckets small integers hold data would cost a FULL extra
    # scan of the corpus; instead, which candidates actually had rows is
    # read off the <= n_buckets-row metrics frame after the run.) A
    # candidate with no source rows THIS run writes no metrics row and
    # stays pending — data for it arriving later is still processed.
    pending = sorted(set(range(n_buckets)) - done)
    if not pending:
        return {"processed": [], "skipped": sorted(done)}
    pending_df = src.filter(F.col("partition_id").isin(pending)) if done else src

    out = quality_filter(pending_df, **pipeline_kwargs)
    # Data first (idempotent dynamic partition overwrite)...
    out.write.mode("overwrite").partitionBy("partition_id").parquet(data_path)
    # ...then the lineage/metrics commit marks the buckets done. Collect
    # the tiny per-bucket frame ONCE (<= n_buckets rows) and append the
    # collected rows, so the aggregation is not recomputed for the write.
    written = spark.read.parquet(data_path).filter(
        F.col("partition_id").isin(pending)
    )
    m = bucket_metrics(written).withColumn("run_id", F.lit(run_id)).withColumn(
        "status", F.lit("done")
    )
    m_rows = m.collect()
    if m_rows:
        spark.createDataFrame(m_rows, m.schema).write.mode("append").parquet(
            metrics_path
        )
    processed = sorted(r["partition_id"] for r in m_rows)
    return {"processed": processed, "skipped": sorted(done)}