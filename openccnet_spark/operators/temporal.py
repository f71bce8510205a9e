"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are staples of event-log feature engineering (attach the most
recent prior signal; collect everything inside a window after an
anchor) and both have a naive form that is a scale-killer: an
inequality join, which Catalyst can only execute as a broadcast
nested loop or cartesian product. These operators re-express the
semantics as shuffle-partitionable plans:

- **as-of join** = union the two sides, ONE shuffle on the join keys,
  and carry the last-seen right payload down each key's timeline with
  a running `last(..., ignorenulls)` window. No join node at all: the
  matching is a linear scan of each key's merged, sorted event
  sequence — exactly the algorithm a single-node engine (DuckDB's
  ASOF JOIN, kdb's aj) uses, but per key in parallel. Per-task memory
  is one carried payload; per-key work is O(events log events) for
  the sort. Skew: a mega-key funnels its own events into one task —
  at 100 TB pair this with the key-salting rollup for degenerate keys
  (same guidance as operators/skew.py); ordinary user-shaped keys are
  fine by construction.
- **range join** = integer bucketing: the left interval [start, end)
  explodes to the (at most ceil(W_interval/W_bucket)+1, typically 2)
  buckets it covers, the right timestamp maps to its single bucket,
  and candidates come from a plain equi-join on (keys..., bucket)
  with the exact predicate as a residual filter. The shuffle carries
  each right row once and each left row per covered bucket; no
  nested loop anywhere (plan-pinned in tests). Bucket width tunes
  the explode factor vs candidate selectivity — set it to the
  typical interval width.

Bucket arithmetic uses integer DIV on int64 microseconds (double
division mis-buckets at boundaries — CLAUDE.md hkey lesson).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _payload_type(df: DataFrame, cols: list[str]):
    return df.select(F.struct(*cols).alias("_s")).schema["_s"].dataType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    direction: str = "backward",
    tolerance: Column | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, the single right row with the greatest
    ``ts <= left.ts`` (backward, inclusive) / smallest ``ts >= left.ts``
    (forward) sharing ``keys``. Right rows must be unique per
    (keys, ts) — the deterministic contract (true of any event log with
    a unique event id folded into ts ordering upstream).

    Output: every left column, plus every right column prefixed
    ``right_prefix`` (null where no match / outside ``tolerance``,
    with ``tolerance`` compared on the two ts columns' difference).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns]
    ltype, rtype = _payload_type(left, lcols), _payload_type(right, rcols)

    u = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_prio"),  # right sorts before left at equal ts
        F.lit(None).cast(ltype).alias("_lpay"),
        F.struct(*rcols).alias("_rpay"),
    ).unionByName(
        left.select(
            *keys,
            F.col(ts_col).alias("_ts"),
            F.lit(1).alias("_prio"),
            F.struct(*lcols).alias("_lpay"),
            F.lit(None).cast(rtype).alias("_rpay"),
        )
    )
    order = [F.col("_ts").asc(), F.col("_prio").asc()] if direction == "backward" \
        else [F.col("_ts").desc(), F.col("_prio").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_rpay", ignorenulls=True).over(w)
    out = (
        u.withColumn("_m", carried)
        .filter(F.col("_prio") == 1)
        .withColumn(
            "_m",
            F.when(
                F.lit(tolerance is None)
                | (F.abs(F.col("_ts") - F.col(f"_m.{ts_col}")) <= (tolerance if tolerance is not None else F.lit(0))),
                F.col("_m"),
            ),
        )
    )
    sel = [F.col(f"_lpay.{c}").alias(c) for c in lcols]
    sel += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rcols]
    return out.select(*sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_width: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner pairs (left row, right row) with the same ``keys`` and
    ``start <= ts < end`` — via bucket explosion + equi-join, never a
    nested loop. ``start_col``/``end_col``/``ts_col`` must be int64 in
    the same unit (e.g. microseconds); empty intervals yield nothing."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(left.columns) & set(right.columns) - set(keys)
    if overlap:
        raise ValueError(f"rename overlapping non-key columns first: {sorted(overlap)}")
    lb = left.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_b",
        F.explode(
            F.expr(
                f"sequence({start_col} DIV {bucket_width}, "
                f"({end_col} - 1) DIV {bucket_width})"
            )
        ),
    )
    rb = right.select(
        *keys,
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c not in keys],
    ).withColumn("_b", F.expr(f"{right_prefix}{ts_col} DIV {bucket_width}"))
    pts = F.col(f"{right_prefix}{ts_col}")
    return (
        lb.join(rb, [*keys, "_b"])
        .filter((pts >= F.col(start_col)) & (pts < F.col(end_col)))
        .drop("_b")
    )
