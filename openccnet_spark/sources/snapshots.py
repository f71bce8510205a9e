"""Versioned snapshot tables: parquet data + JSON manifests (Iceberg
semantics on plain files).

The north-star table format is Iceberg; this sandbox has no Iceberg
runtime jars (carried environment constraint), so this module
implements the SEMANTICS the pipeline needs from it — atomic-enough
versioned commits, time travel, and incremental (CDC-style) reads —
on plain parquet plus JSON manifests, mapping 1:1 onto the Iceberg
calls a production deployment would swap in:

==========================  =================================
here                        Iceberg
==========================  =================================
``write_snapshot(append)``  ``df.writeTo(t).append()``
``write_snapshot(overwrite)`` ``df.writeTo(t).overwritePartitions()`` / replace
``read_snapshot(id=N)``     ``spark.read.option("snapshot-id", N)``
``read_incremental(a, b)``  incremental scan start/end-snapshot-id
``snapshot_history``        ``t.snapshots`` metadata table
==========================  =================================

Layout::

    <table>/data/s<N>/part-*.parquet   -- files written by snapshot N
    <table>/_snapshots/v<N>.json       -- manifest of snapshot N

A manifest records ``(snapshot_id, parent, operation, files, n_rows)``
with file paths RELATIVE to the table root (the table directory is
relocatable). A snapshot's live file set = its own files plus every
ancestor's back to (and including) the most recent ``overwrite``.
Commit order: data files first, manifest last — a crash between the
two leaves an orphan data directory that no manifest references, which
readers never see (the Iceberg commit rule). Single-writer by design
(documented; Iceberg's optimistic-concurrency CAS needs a catalog this
layer deliberately does not have).

Scale shape: manifests are O(files) JSON read on the DRIVER — the data
itself is only ever touched by ``spark.read.parquet(*files)``, so
time travel and incremental reads prune at FILE granularity before any
executor sees a byte (the point of the format). ``n_rows`` comes from
one count pass at commit (metadata-only for parquet footers).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_snapshot",
    "read_snapshot",
    "read_incremental",
    "snapshot_history",
    "current_snapshot_id",
]

_SNAP_DIR = "_snapshots"


def _manifest_path(table: str, sid: int) -> str:
    return os.path.join(table, _SNAP_DIR, f"v{sid}.json")


def snapshot_history(table: str) -> list[dict]:
    """All manifests, snapshot_id ascending; [] for a fresh table."""
    d = os.path.join(table, _SNAP_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda m: m["snapshot_id"])


def current_snapshot_id(table: str) -> int | None:
    hist = snapshot_history(table)
    return hist[-1]["snapshot_id"] if hist else None


def write_snapshot(df: DataFrame, table: str, mode: str = "append") -> int:
    """Commit ``df`` as the next snapshot; returns its id (1-based).

    ``append`` adds files to the live set; ``overwrite`` replaces it.
    Data is written before the manifest (readers of the previous
    snapshot are never disturbed; a crash strands only unreferenced
    files).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    parent = current_snapshot_id(table)
    sid = (parent or 0) + 1
    rel_dir = os.path.join("data", f"s{sid}")
    abs_dir = os.path.join(table, rel_dir)
    df.write.mode("error").parquet(abs_dir)
    files = sorted(
        os.path.join(rel_dir, f)
        for f in os.listdir(abs_dir)
        if f.endswith(".parquet")
    )
    n_rows = df.sparkSession.read.parquet(abs_dir).count()
    manifest = {
        "snapshot_id": sid,
        "parent": parent,
        "operation": mode,
        "files": files,
        "n_rows": n_rows,
    }
    os.makedirs(os.path.join(table, _SNAP_DIR), exist_ok=True)
    tmp = _manifest_path(table, sid) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, _manifest_path(table, sid))  # the atomic commit point
    return sid


def _live_files(table: str, snapshot_id: int) -> list[str]:
    """Live file set of a snapshot: walk ancestors up to the nearest
    overwrite (inclusive)."""
    by_id = {m["snapshot_id"]: m for m in snapshot_history(table)}
    if snapshot_id not in by_id:
        raise ValueError(f"unknown snapshot {snapshot_id} in {table}")
    files: list[str] = []
    sid: int | None = snapshot_id
    while sid is not None:
        m = by_id[sid]
        files = m["files"] + files
        if m["operation"] == "overwrite":
            break
        sid = m["parent"]
    return [os.path.join(table, f) for f in files]


def read_snapshot(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read the table as of ``snapshot_id`` (default: current)."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table)
    if sid is None:
        raise ValueError(f"{table} has no snapshots")
    return spark.read.parquet(*_live_files(table, sid))


def read_incremental(
    spark: SparkSession, table: str, after: int, until: int | None = None
) -> DataFrame:
    """Files APPENDED in snapshots ``(after, until]`` — the incremental
    processing feed. Raises if the range crosses an overwrite (an
    overwrite is not an increment; the caller must reprocess)."""
    hist = snapshot_history(table)
    until = until if until is not None else (hist[-1]["snapshot_id"] if hist else 0)
    picked = [m for m in hist if after < m["snapshot_id"] <= until]
    if any(m["operation"] == "overwrite" for m in picked):
        raise ValueError(
            f"snapshots ({after}, {until}] of {table} contain an overwrite; "
            "incremental reads cannot cross it"
        )
    files = [os.path.join(table, f) for m in picked for f in m["files"]]
    if not files:
        return spark.createDataFrame([], read_snapshot(spark, table, until).schema)
    return spark.read.parquet(*files)
