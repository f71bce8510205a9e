"""Deterministic HyperLogLog distinct-count sketch (sketch #2).

Distinct counting is the other classic bounded-memory problem of a
100 TB corpus (vocabulary size, unique URLs, unique users). Spark's
`approx_count_distinct` is a JVM HLL whose register content isn't
reproducible cross-engine; this one is built from the repo's 60-bit
md5 hash family, so a DuckDB oracle rebuilds the IDENTICAL register
file and the driver hash-check pins every register, not just the final
estimate.

Layout: m=512 registers; a value's register is the hash's top 9 bits,
its rank contribution rho = (leading zeros of the low-51-bit window)+1,
computed integer-exactly as `52 - bitlen(low)` via binary-string length
(`conv(_,10,2)` / `to_base(_,2)`) — NEVER floating log2, whose floor
misrounds near powers of two (~n/2^16 expected errors at corpus size).

Scale shape mirrors the CMS: ingest pre-aggregates to the register
grain immediately (groupBy(reg).max(rho) — map-side combine collapses
each partition to <= m rows before the shuffle, so the exchange is
m-bounded regardless of corpus size); merging sketches across corpora
is elementwise MAX (associative, idempotent — pinned in tests). The
estimator (bias-corrected harmonic mean + linear counting fallback)
runs driver-side on m rows; tests bound its error against the exact
count at the theoretical ~1.04/sqrt(m) = 4.6% standard error.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import hash60_expr

#: registers (index = top 9 of the 60 hash bits) and rho window width
HLL_M = 512
HLL_WINDOW = 51


def hll_registers(df: DataFrame, value_sql: str, salt: str = "hll:") -> DataFrame:
    """Register file (reg, rank): rank = max rho per register. The
    map-side combine bounds every exchange at m rows per partition."""
    hdf = df.select(
        hash60_expr(f"concat('{salt}', {value_sql})").alias("h")
    )
    # integer DIV/% only — h/2^51 in double would misplace registers for
    # values past 2^53 (the CLAUDE.md hkey-bucketing rule)
    low = F.expr(f"h % {1 << HLL_WINDOW}")
    rho = F.when(low == F.lit(0), F.lit(HLL_WINDOW + 1)).otherwise(
        F.lit(HLL_WINDOW + 1) - F.length(F.conv(low.cast("string"), 10, 2))
    )
    return (
        hdf.select(
            F.expr(f"h DIV {1 << HLL_WINDOW}").alias("reg"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union of the underlying sets = elementwise max of registers."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("reg").agg(F.max("rank").alias("rank"))


def hll_histogram(registers: DataFrame) -> DataFrame:
    """Driver-checkable register summary: per rank value, how many
    registers hold it and an order-free digest of WHICH ones — a wrong
    register assignment cannot hide in the histogram."""
    return (
        registers.groupBy(F.col("rank").alias("rank_val"))
        .agg(
            F.count(F.lit(1)).alias("n_registers"),
            F.bit_xor(hash60_expr("concat('hllreg:', reg)")).alias("reg_digest"),
        )
    )


def hll_estimate(registers: list[tuple[int, int]], m: int = HLL_M) -> int:
    """Standard HLL estimator on a collected register file (m rows):
    bias-corrected harmonic mean, linear-counting fallback when many
    registers are empty. Driver-side by design — the sketch is tiny."""
    ranks = {reg: rank for reg, rank in registers}
    zeros = m - len(ranks)
    s = zeros * 1.0 + sum(2.0 ** -r for r in ranks.values())
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(est)


def sql_hll_histogram(
    value_sql: str, from_clause: str, salt: str = "hll:"
) -> str:
    """DuckDB oracle: identical registers via the same integer-exact
    bitlen (to_base) — no float log anywhere."""
    w = HLL_WINDOW
    return f"""
WITH h AS (
  SELECT ('0x' || substr(md5('{salt}' || {value_sql}), 1, 15))::BIGINT AS h
  FROM {from_clause}
), rr AS (
  SELECT h // {1 << w} AS reg,
         CASE WHEN h % {1 << w} = 0 THEN {w + 1}
              ELSE {w + 1} - length(to_base(h % {1 << w}, 2)) END AS rho
  FROM h
), regs AS (
  SELECT reg, max(rho) AS rank_val FROM rr GROUP BY reg
)
SELECT rank_val::INT AS rank_val, count(*)::BIGINT AS n_registers,
       bit_xor(('0x' || substr(md5('hllreg:' || reg), 1, 15))::BIGINT)::BIGINT
           AS reg_digest
FROM regs GROUP BY rank_val
"""
