"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a small metadata
struct. The Spark-side machinery — schema, Arrow batch shape, partitioning,
``mapInPandas`` signature — is real and tested; the actual codec step is
STUBBED (this container has no image/audio libraries) behind
``decode_image_stub``, which derives deterministic fake dimensions from the
payload bytes. Swap ``_decode_one`` for a real decoder (PIL/ffmpeg) in a
production image; nothing else changes.

Scale notes: payloads never shuffle — feature extraction is a narrow
``mapInPandas`` over the scan; ``spark.sql.files.maxPartitionBytes`` sizes
tasks, and Arrow batches cap worker memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, width int, height int, mode string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: derive a binary payload column from text (UTF-8 bytes).

    Real pipelines read payloads from ``spark.read.format('binaryFile')``
    or an Iceberg table with a binary column; this adapter exists so the
    plumbing is exercisable on the driver's text-only tables.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _decode_one(payload: bytes) -> tuple:
    """STUB decoder. Deterministic fake: dimensions derived from payload
    size and checksum. A real implementation would do
    ``PIL.Image.open(io.BytesIO(payload))`` — import guarded:

    >>> raise NotImplementedError("real image decode not available here")
    """
    n = len(payload)
    crc = zlib.crc32(payload)
    return n, crc, n % 640, n % 480, "stub"


def extract_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Narrow mapInPandas pass: payload -> (size, checksum, width, height).

    One Arrow round-trip; no shuffle; output is a slim typed frame that IS
    safe to shuffle/join downstream (payloads stay columnar in the scan).
    """

    def _extract(batches):
        for pdf in batches:
            rows = [
                (did, *(_decode_one(p if p is not None else b"")))
                for did, p in zip(pdf[id_col], pdf["payload"])
            ]
            out = pd.DataFrame(
                rows,
                columns=[id_col, "n_bytes", "checksum", "width", "height", "mode"],
            )
            yield out

    return df.select(id_col, "payload").mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling plumbing: expand (doc_id, n_frames) into
    sampled frame indexes WITHOUT decoding (pure column math); the decode
    of selected frames would be a second gated mapInPandas. n_frames is
    stubbed from payload length."""
    return (
        df.withColumn("n_frames", (F.length("payload") % 300 + 1).cast("int"))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("doc_id", "n_frames", "frame_idx")
    )
