"""WebDataset tar sink: byte-deterministic training shards.

``shards.write_shards`` emits parquet; real data loaders
(WebDataset / torchdata) stream numbered ``.tar`` files of
``<key>.<ext>`` members. This sink writes that format with EVERY byte
pinned: USTAR headers with mtime=0, uid=gid=0, mode 0644, empty
uname/gname, members sorted by doc id, shard membership from
``shards.assign_shards``' exact distributed prefix sum — so the same
corpus produces the same tar bytes on any cluster, any partitioning,
any day (the property that makes resumable training loaders safe), and
a manifest row per shard carries the md5 of those bytes for integrity
checks.

Plan shape: one shuffle (repartition by shard id) + a within-partition
sort bounded by the shard size; each task streams its shards' members
in order and writes whole tar files (a shard never splits across
tasks). The destination must be a filesystem all executors can reach —
local in this sandbox, a shared mount/object store in production.

Like ``tools/dictgen.py``, this is a SINK verified by pytest (tar bytes
are not SQL-expressible, so there is deliberately no driver oracle
query; shard MEMBERSHIP is already oracle-checked via
``shard_manifest``).

The reference repo (laisuk/OpenccNet) has no counterpart; LLM-pipeline
brief (training-shard exports).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .shards import assign_shards

__all__ = ["write_webdataset", "webdataset_tar_bytes"]


def webdataset_tar_bytes(members: list[tuple[int, str]]) -> bytes:
    """Deterministic tar bytes for one shard: ``members`` = [(doc_id,
    text)] — sorted here so callers cannot get order wrong. This same
    function is the scalar ground truth the tests replay."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
        for doc_id, text in sorted(members):
            data = (text or "").encode("utf-8")
            info = tarfile.TarInfo(name=f"{doc_id:012d}.txt")
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.mode = 0o644
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def write_webdataset(
    df: DataFrame,
    path: str,
    shard_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Write ``shard-%06d.tar`` files under ``path``; returns the
    manifest frame ``(shard_id, n_docs, n_bytes, tar_md5)`` (collected
    from the writing tasks — one scalar row per shard)."""
    os.makedirs(path, exist_ok=True)
    a = assign_shards(df, shard_tokens, id_col, tokens_col)
    rows = (
        df.select(id_col, text_col)
        .join(a.select(id_col, "shard_id"), id_col)
        .repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", id_col)
    )

    def _write(part):
        out = []
        cur_shard, members = None, []

        def flush():
            if cur_shard is None:
                return
            blob = webdataset_tar_bytes(members)
            fname = os.path.join(path, f"shard-{cur_shard:06d}.tar")
            tmp = fname + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, fname)
            out.append(
                (cur_shard, len(members), len(blob), hashlib.md5(blob).hexdigest())
            )

        for r in part:
            if r["shard_id"] != cur_shard:
                flush()
                cur_shard, members = r["shard_id"], []
            members.append((r[id_col], r[text_col]))
        flush()
        return iter(out)

    # mapPartitions is the sanctioned imperative-sink escape hatch here:
    # whole tar files must be streamed member-by-member by one task
    return df.sparkSession.createDataFrame(
        rows.rdd.mapPartitions(_write),
        "shard_id long, n_docs long, n_bytes long, tar_md5 string",
    )
