"""Streaming pipeline: file-source stream through the same gate must agree
with the batch pipeline row-for-row; windowed metrics respect watermarking."""

from __future__ import annotations

from pyspark.sql import functions as F

from openccnet_spark.operators.pipeline import quality_filter
from openccnet_spark.sources.transcripts import spark_transcripts
from openccnet_spark.streaming import (
    read_transcripts_stream,
    streaming_metrics,
    streaming_quality_filter,
)

N_CONV = 30


def test_streaming_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    spark_transcripts(spark, N_CONV).repartition(6).write.parquet(src_dir)

    stream = read_transcripts_stream(spark, src_dir, max_files_per_trigger=2)
    out = streaming_quality_filter(stream, config="t2s")
    q = (
        out.select("conv_id", "turn_idx", "keep", "drop_reason", "lang", "text_scrubbed")
        .writeStream.format("memory")
        .queryName("stream_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.conv_id, r.turn_idx): (r.keep, r.drop_reason, r.lang, r.text_scrubbed)
        for r in spark.sql("select * from stream_out").collect()
    }
    batch = quality_filter(spark.read.parquet(src_dir), config="t2s")
    want = {
        (r.conv_id, r.turn_idx): (r.keep, r.drop_reason, r.lang, r.text_scrubbed)
        for r in batch.collect()
    }
    assert got == want


def test_streaming_windowed_metrics(spark, tmp_path):
    src_dir = str(tmp_path / "src2")
    spark_transcripts(spark, N_CONV).repartition(4).write.parquet(src_dir)

    stream = read_transcripts_stream(spark, src_dir)
    metrics = streaming_metrics(streaming_quality_filter(stream, with_ppl=False))
    q = (
        metrics.writeStream.format("memory")
        .queryName("stream_metrics")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from stream_metrics").collect()
    assert rows, "no metric windows emitted"
    total = sum(r.turns for r in rows)
    assert total >= spark.read.parquet(src_dir).count()  # update mode may re-emit
    reasons = {r.drop_reason for r in rows}
    assert "none" in reasons and "too_short" in reasons


def test_streaming_conversation_state(spark, tmp_path):
    """applyInPandasWithState sessionizer: a conversation idle past the
    event-time timeout is emitted once with its accumulated counters."""
    import datetime as dt

    from openccnet_spark.streaming import streaming_conversation_state

    src_dir = str(tmp_path / "src3")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(conv, n, start_min, kept_mask):
        rows = [
            (conv, i, bool(kept_mask[i]), base + dt.timedelta(minutes=start_min, seconds=30 * i))
            for i in range(n)
        ]
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, keep boolean, ts timestamp"
        ).repartition(1).write.mode("append").parquet(src_dir)

    write_batch("a", 3, 0, [True, False, True])
    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, keep boolean, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sessions = streaming_conversation_state(
        stream, watermark="0 seconds", idle_timeout_ms=60_000
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("conv_sessions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b", 2, 60, [True, True])   # advances watermark past a's timeout
        q.processAllAvailable()
        write_batch("c", 1, 120, [True])        # triggers a's timeout evaluation
        q.processAllAvailable()
        rows = {r.conv_id: r for r in spark.sql("select * from conv_sessions").collect()}
    finally:
        q.stop()
    assert "a" in rows, f"expected conversation a emitted, got {list(rows)}"
    a = rows["a"]
    assert a.n_turns == 3 and a.n_kept == 2
    assert a.first_ts.replace(tzinfo=None) == base
    assert a.last_ts.replace(tzinfo=None) == base + dt.timedelta(seconds=60)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicated source files (an at-least-once upstream replay) must
    come out exactly once per (conv_id, turn_idx) when the duplicates
    arrive inside the watermark."""
    from openccnet_spark.streaming import streaming_dedup_turns

    src_dir = tmp_path / "dup_src"
    src_dir.mkdir()
    base = spark_transcripts(spark, 10)
    n_unique = base.count()
    # the same data written twice = a replayed batch
    base.repartition(2).write.mode("overwrite").parquet(str(src_dir / "a"))
    base.repartition(3).write.mode("overwrite").parquet(str(src_dir / "b"))

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(str(src_dir / "*"))
    )
    out = streaming_dedup_turns(stream)
    q = (
        out.select("conv_id", "turn_idx")
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select conv_id, turn_idx from stream_dedup").collect()
    assert len(rows) == n_unique
    assert len({(r.conv_id, r.turn_idx) for r in rows}) == n_unique


def test_replay_dedup_run_checkpoint_makes_reruns_exactly_once(spark, tmp_path):
    """replay_dedup_run's checkpoint is the stream's exactly-once ledger:
    re-running over the SAME source with the SAME checkpoint must process
    nothing new and leave the sink table unchanged; new source files added
    before a third run are picked up incrementally (and deduplicated)."""
    from openccnet_spark.streaming import replay_dedup_run

    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    base = spark_transcripts(spark, 12)
    n_unique = base.count()
    base.repartition(2).write.parquet(str(src / "a"))
    base.repartition(3).write.parquet(str(src / "b"))

    t1 = replay_dedup_run(spark, str(src / "*"), sink, ckpt, watermark="365 days")
    assert t1.count() == n_unique
    # identical re-run: the checkpoint remembers every processed file
    t2 = replay_dedup_run(spark, str(src / "*"), sink, ckpt, watermark="365 days")
    assert t2.count() == n_unique
    # a THIRD copy arrives (another replay): still nothing new to emit
    base.repartition(2).write.parquet(str(src / "c"))
    t3 = replay_dedup_run(spark, str(src / "*"), sink, ckpt, watermark="365 days")
    assert t3.count() == n_unique
    rows = t3.select("conv_id", "turn_idx").collect()
    assert len({(r.conv_id, r.turn_idx) for r in rows}) == n_unique
