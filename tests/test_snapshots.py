"""Snapshot table layer: commit/read/time-travel/incremental semantics,
crash-safety of the commit order, and re-run determinism."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from openccnet_spark.sources.snapshots import (
    current_snapshot_id,
    read_incremental,
    read_snapshot,
    snapshot_history,
    write_snapshot,
)


@pytest.fixture
def table(tmp_path):
    return str(tmp_path / "tbl")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_append_and_time_travel(spark, table):
    s1 = write_snapshot(spark.range(0, 3), table)
    s2 = write_snapshot(spark.range(3, 5), table)
    assert (s1, s2) == (1, 2)
    assert _ids(read_snapshot(spark, table, 1)) == [0, 1, 2]
    assert _ids(read_snapshot(spark, table, 2)) == [0, 1, 2, 3, 4]
    assert _ids(read_snapshot(spark, table)) == [0, 1, 2, 3, 4]
    assert current_snapshot_id(table) == 2


def test_overwrite_replaces_live_set_old_reads_intact(spark, table):
    write_snapshot(spark.range(0, 3), table)
    write_snapshot(spark.range(10, 12), table, mode="overwrite")
    assert _ids(read_snapshot(spark, table)) == [10, 11]
    # time travel to before the overwrite still sees the old data
    assert _ids(read_snapshot(spark, table, 1)) == [0, 1, 2]
    ops = [m["operation"] for m in snapshot_history(table)]
    assert ops == ["append", "overwrite"]


def test_incremental_reads_only_new_files(spark, table):
    write_snapshot(spark.range(0, 3), table)
    write_snapshot(spark.range(3, 5), table)
    write_snapshot(spark.range(5, 6), table)
    assert _ids(read_incremental(spark, table, after=1)) == [3, 4, 5]
    assert _ids(read_incremental(spark, table, after=1, until=2)) == [3, 4]
    assert _ids(read_incremental(spark, table, after=3)) == []


def test_incremental_refuses_to_cross_overwrite(spark, table):
    write_snapshot(spark.range(0, 3), table)
    write_snapshot(spark.range(9, 10), table, mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        read_incremental(spark, table, after=0)


def test_unreferenced_data_is_invisible(spark, table):
    """The commit rule: data files land before the manifest, so a crash
    between the two (simulated: delete the manifest) leaves readers on
    the previous snapshot."""
    write_snapshot(spark.range(0, 3), table)
    write_snapshot(spark.range(3, 6), table)
    os.remove(os.path.join(table, "_snapshots", "v2.json"))
    assert current_snapshot_id(table) == 1
    assert _ids(read_snapshot(spark, table)) == [0, 1, 2]
    # the next commit reuses the orphaned id and must not collide
    shutil.rmtree(os.path.join(table, "data", "s2"))
    write_snapshot(spark.range(7, 8), table)
    assert _ids(read_snapshot(spark, table)) == [0, 1, 2, 7]


def test_row_counts_in_manifest(spark, table):
    write_snapshot(spark.range(0, 42), table)
    assert snapshot_history(table)[0]["n_rows"] == 42
