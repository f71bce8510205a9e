"""Hypertable-style cascaded rollup (continuous-aggregate semantics).

TimescaleDB's continuous aggregates / Druid's rollup keep multi-
resolution summaries where each coarser level re-aggregates the FINER
level, never the raw events. That decomposition is what makes a 100 TB
event store queryable: raw data is touched exactly once (at the finest
grain), every coarser level's input is the previous level's output —
bucket-count-sized, not corpus-sized — and level maintenance is an
incremental map-side-combinable aggregation.

The correctness burden is that the summary functions must be
re-aggregable: count/sum by summing, min/max by min/max. Value sums are
per-row floored to integer milli at the BASE level (order-free integer
addition from then on — the repo's float discipline), so the cascade is
bit-deterministic at any partitioning and any level split, and a DuckDB
oracle computing the coarsest level DIRECTLY from raw events must match
bit-for-bit — which is exactly what the `hypertable_rollup` driver
query pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default cascade: 15 min -> 1 h -> 1 d (seconds)
LEVELS = (900, 3600, 86400)


def base_level(
    ev: DataFrame,
    width_s: int,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Finest grain from raw events — the only corpus-sized aggregation.
    Buckets via integer DIV on epoch seconds; values floored to milli
    per row BEFORE summing (integer sums are order-free)."""
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    milli = F.floor(F.col(value_col) * 1000).cast("long")
    return (
        ev.select(
            F.expr(f"unix_timestamp(cast({ts_col} as timestamp)) DIV {width_s}")
            .alias("bucket"),
            *key_cols,
            milli.alias("v_milli"),
        )
        .groupBy("bucket", *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_milli").alias("sum_v_milli"),
            F.min("v_milli").alias("min_v_milli"),
            F.max("v_milli").alias("max_v_milli"),
        )
    )


def coarsen(
    fine: DataFrame, fine_width_s: int, coarse_width_s: int,
    key_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """One cascade step: re-aggregate the finer level's OUTPUT. The input
    is bucket-count-sized; widths must nest (coarse % fine == 0)."""
    if coarse_width_s % fine_width_s != 0:
        raise ValueError(
            f"levels must nest: {coarse_width_s} not a multiple of {fine_width_s}"
        )
    ratio = coarse_width_s // fine_width_s
    return (
        fine.withColumn("bucket", F.expr(f"bucket DIV {ratio}"))
        .groupBy("bucket", *key_cols)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_v_milli").alias("sum_v_milli"),
            F.min("min_v_milli").alias("min_v_milli"),
            F.max("max_v_milli").alias("max_v_milli"),
        )
    )


def rollup_cascade(
    ev: DataFrame,
    levels: tuple[int, ...] = LEVELS,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> list[DataFrame]:
    """All levels, finest first; level i>0 derives from level i-1."""
    out = [base_level(ev, levels[0], ts_col, key_cols, value_col)]
    for fine_w, coarse_w in zip(levels, levels[1:]):
        out.append(coarsen(out[-1], fine_w, coarse_w, key_cols))
    return out
