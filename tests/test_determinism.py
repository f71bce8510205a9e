"""Same-session determinism sweep: every driver query runs TWICE and must
produce an identical canonical value hash.

The engine's oracle story leans on bit-determinism (order-free integer
partial sums in IVF training, fold-ordered float arithmetic, integer
milli/cent flooring before any comparison). A single oracle run cannot
catch a NONdeterministic float aggregation or a partition-order leak —
the first run might agree with the oracle while a rerun drifts. This
sweep pins it: run 1 hash == run 2 hash for all queries, in one shared
session (thread scheduling varies between runs, so partial-aggregation
order genuinely differs — the leak this would catch is real).

Marked slow: it executes the whole queries() surface twice at sf0.001.
Deselect with `-m "not slow"`.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive canonical hash: columns sorted by name, values
    stringified, rows sorted — the driver-comparison shape."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if pd.isna(v) else str(v))
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return hashlib.md5(
        df.to_csv(index=False).encode("utf-8", "surrogatepass")
    ).hexdigest()


def _run(q, spark) -> str:
    df = q(spark, SF_DIR)
    pdf = df.toPandas()
    for h in getattr(df, "_persist_handles", ()):
        h.unpersist()
    return _value_hash(pdf)


@pytest.mark.slow
def test_every_query_is_deterministic_within_a_session(spark):
    queries = entry_mod.queries()
    drifted = {}
    for name, q in sorted(queries.items()):
        h1 = _run(q, spark)
        h2 = _run(q, spark)
        if h1 != h2:
            drifted[name] = (h1, h2)
    assert not drifted, f"nondeterministic queries: {drifted}"
