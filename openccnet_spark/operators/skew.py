"""Skew-defeating salted equi-join.

A hot join key (one conversation with millions of turns, one order with a
pathological line count) funnels all its rows into a single reducer task;
AQE's skew-join split helps for sort-merge joins but only at
post-shuffle-read time. Salting fixes the layout at the source:

* the SKEWED side gets a deterministic salt in ``[0, n_salt)`` derived
  from columns that VARY WITHIN a key group (so one hot key's rows spread
  over ``n_salt`` reducers);
* the other side is replicated ``n_salt`` times (explode over the salt
  range — at 100 TB you salt against the SMALLER side, so the replication
  is the cheap part);
* the join runs on ``(keys..., _salt)`` and the salt column is dropped.

The output is EXACTLY the plain equi-join's output (every (left, right)
key match meets in exactly one salt bucket), which is why the driver
query's oracle is the plain join — the salt changes physics, not
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt_from: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on ``on``, spreading each hot
    key across ``n_salt`` reducers. ``salt_from`` must vary within a key
    group (e.g. a line number / turn index) — a constant would put the
    whole group back in one bucket, correct but unspread.

    Only inner and left joins are safe to salt this way (a right/outer
    join would duplicate unmatched replicated rows); others raise.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    l = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_from), F.lit(n_salt)).cast("int")
    )
    r = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, [*on, "_salt"], how).drop("_salt")
