"""Structured Streaming variant of the quality-filter pipeline.

The batch pipeline is purely columnar (stateless per turn), so it lifts to
a streaming DataFrame unchanged: ``readStream`` on the transcripts source
-> the same fused-UDF + built-in gate -> ``writeStream``. Late turns are
handled by an event-time watermark on ``ts``; the windowed metrics stream
mirrors the batch metrics table (SURVEY §2.2 metrics stage).

At production scale the source is a Kafka topic or an Iceberg
streaming-read; the sandbox tests use the file source over the same
parquet schema. Stateful extensions (e.g. per-conversation session
aggregation) would use ``applyInPandasWithState`` — not required by the
reference's semantics, which are strictly per-turn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pipeline import quality_filter

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def read_transcripts_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def streaming_quality_filter(stream: DataFrame, **pipeline_kwargs) -> DataFrame:
    """The batch pipeline applied to a streaming DataFrame (no repartition —
    streaming micro-batches already parallelize by source file splits)."""
    pipeline_kwargs.setdefault("salt_partitions", None)
    return quality_filter(stream, **pipeline_kwargs)


def streaming_metrics(
    out: DataFrame, window: str = "10 minutes", watermark: str = "20 minutes"
) -> DataFrame:
    """Windowed drop-reason counts with late-data watermark."""
    return (
        out.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "drop_reason")
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
        )
    )
