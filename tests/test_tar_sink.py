"""WebDataset tar sink: byte determinism, membership parity with
assign_shards, loader round-trip, and manifest integrity."""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

from pyspark.sql import functions as F

from openccnet_spark.operators.shards import assign_shards
from openccnet_spark.operators.tar_sink import (
    webdataset_tar_bytes,
    write_webdataset,
)


def _docs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text body "), F.col("id").cast("string")).alias("text"),
    )


def test_bytes_deterministic_and_scalar_replayable(spark, tmp_path):
    """Writing twice (second run repartitioned differently) produces
    identical bytes, equal to the scalar ground-truth builder fed the
    oracle-checked shard assignment."""
    docs = _docs(spark)
    m1 = {
        r["shard_id"]: r["tar_md5"]
        for r in write_webdataset(docs, str(tmp_path / "a"), 60).collect()
    }
    m2 = {
        r["shard_id"]: r["tar_md5"]
        for r in write_webdataset(
            docs.repartition(7), str(tmp_path / "b"), 60
        ).collect()
    }
    assert m1 == m2
    assign = assign_shards(docs, 60).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_shard: dict[int, list] = {}
    for r in assign:
        by_shard.setdefault(r["shard_id"], []).append(
            (r["doc_id"], texts[r["doc_id"]])
        )
    want = {
        s: hashlib.md5(webdataset_tar_bytes(ms)).hexdigest()
        for s, ms in by_shard.items()
    }
    assert m1 == want


def test_loader_round_trip(spark, tmp_path):
    """A plain tarfile consumer (what a WebDataset loader does) must
    recover every document's exact text under its zero-padded key."""
    docs = _docs(spark, 25)
    out = str(tmp_path / "t")
    write_webdataset(docs, out, 50).collect()
    got = {}
    for fname in sorted(os.listdir(out)):
        assert fname.startswith("shard-") and fname.endswith(".tar")
        with tarfile.open(os.path.join(out, fname)) as tar:
            for m in tar.getmembers():
                assert m.mtime == 0 and m.uid == 0 and m.mode == 0o644
                got[int(m.name.removesuffix(".txt"))] = (
                    tar.extractfile(m).read().decode()
                )
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == want


def test_manifest_counts_and_sizes(spark, tmp_path):
    docs = _docs(spark, 30)
    out = str(tmp_path / "m")
    man = {r["shard_id"]: r for r in write_webdataset(docs, out, 40).collect()}
    assert sum(r["n_docs"] for r in man.values()) == 30
    for sid, r in man.items():
        blob = open(os.path.join(out, f"shard-{sid:06d}.tar"), "rb").read()
        assert len(blob) == r["n_bytes"]
        assert hashlib.md5(blob).hexdigest() == r["tar_md5"]
