"""Gopher-style intra-document repetition signals for quality filtering.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) filter web
documents by the character mass of repeated word n-grams: the fraction of
characters covered by the single most frequent n-gram (n = 2..4) and by
all n-grams occurring more than once (n = 5..10). This module implements
a deterministic integer variant of those signals (the reference repo
laisuk/OpenccNet has no counterpart — LLM-pipeline brief, sibling of
``quality.py`` / ``curation.py``):

* every signal is parts-per-million via **integer** arithmetic
  (``mass * 1e6 // len(text)``), so DuckDB, Python, and Spark agree
  bit-for-bit — no float fraction ever crosses an engine boundary;
* "character mass" of an n-gram is ``count * len(gram)`` with the gram
  joined by single spaces; overlapping occurrences are NOT position-
  deduplicated (Gopher dedups positions; counting mass keeps the oracle
  closed-form), so the ppm is clamped at 1e6;
* tie-breaks vanish by construction: the top signal is
  ``max(count * len)`` over distinct grams, not "chars of the argmax";
* only grams occurring >= 2 times count toward EITHER signal — a short
  fully-unique document scores 0 everywhere instead of len(gram)/len(text)
  (Gopher's corpora are long enough that it never cared).

Scale shape: the whole computation is per-document — ONE narrow
``mapInPandas`` pass (CPython string handling beats Spark string
expressions ~50x on this corpus; see working notes), zero shuffle, zero
state. At 100 TB this is embarrassingly parallel and reads only
(id, text).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "REP_NS",
    "REP_THRESHOLDS_PPM",
    "repetition_signals_py",
    "repetition_signals",
    "repetition_keep_expr",
]

# (top-mass ns, dup-mass ns) — the Gopher table uses top 2..4 and dup
# 5..10; we carry the two dup endpoints (5 and 10) which dominate the
# filter in practice and keep the oracle SQL bounded.
REP_NS = ((2, 3, 4), (5, 10))

# Gopher §A1.1 thresholds, in ppm (top2 < 0.20, top3 < 0.18, top4 < 0.16,
# dup5 < 0.15; dup10's published 0.10 band). keep = all signals <= cap.
REP_THRESHOLDS_PPM = {
    "top2_ppm": 200_000,
    "top3_ppm": 180_000,
    "top4_ppm": 160_000,
    "dup5_ppm": 150_000,
    "dup10_ppm": 100_000,
}

_SIGNAL_COLS = tuple(REP_THRESHOLDS_PPM)


def repetition_signals_py(text: str) -> dict[str, int]:
    """Scalar ground truth: signal name -> ppm (plus ``keep`` 0/1)."""
    text = text or ""
    words = text.split(" ")
    total = len(text)
    # prefix sums of word lengths: gram chars = span + (n-1) inner spaces
    pre = [0]
    for w in words:
        pre.append(pre[-1] + len(w))

    def masses(n: int) -> tuple[int, int]:
        if len(words) < n or total == 0:
            return 0, 0
        cnt = Counter(
            tuple(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        top = dup = 0
        for g, c in cnt.items():
            if c < 2:
                # a count-1 gram is not repetition: without this, a short
                # fully-unique doc scores len(gram)/len(text) and can trip
                # the filter on nothing
                continue
            glen = sum(len(w) for w in g) + n - 1  # == len(" ".join(g))
            mass = c * glen
            top = max(top, mass)
            dup += mass
        return top, dup

    out: dict[str, int] = {}
    for n in REP_NS[0]:
        top, _ = masses(n)
        out[f"top{n}_ppm"] = min(1_000_000, top * 1_000_000 // total) if total else 0
    for n in REP_NS[1]:
        _, dup = masses(n)
        out[f"dup{n}_ppm"] = min(1_000_000, dup * 1_000_000 // total) if total else 0
    out["keep"] = int(
        all(out[k] <= cap for k, cap in REP_THRESHOLDS_PPM.items())
    )
    return out


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple = (),
) -> DataFrame:
    """Per-document repetition signals: one narrow Arrow pass, no shuffle.

    Emits ``id_col`` + ``top{2,3,4}_ppm`` + ``dup{5,10}_ppm`` (BIGINT ppm)
    + ``keep`` (INT 0/1 under :data:`REP_THRESHOLDS_PPM`). ``carry_cols``
    pass through unchanged (so a downstream stage can consume the kept
    rows without a join back to the source — the composition stays
    narrow).
    """
    sig_cols = list(_SIGNAL_COLS)
    carry_types = {
        f.name: f.dataType.simpleString()
        for f in df.schema.fields
        if f.name in carry_cols
    }
    out_schema = (
        f"{id_col} long, "
        + ", ".join(f"{c} long" for c in sig_cols)
        + ", keep int"
        + "".join(f", {c} {carry_types[c]}" for c in carry_cols)
    )

    def _signals(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {c: [] for c in (id_col, *sig_cols, "keep")}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                s = repetition_signals_py(text)
                rows[id_col].append(did)
                for c in sig_cols:
                    rows[c].append(s[c])
                rows["keep"].append(s["keep"])
            out = pd.DataFrame(rows)
            for c in carry_cols:
                out[c] = pdf[c].to_numpy() if c != text_col else list(pdf[c])
            yield out

    in_cols = [id_col, text_col] + [c for c in carry_cols if c not in (id_col, text_col)]
    return df.select(*in_cols).mapInPandas(_signals, out_schema)


def repetition_keep_expr(prefix: str = "") -> Column:
    """0/1 keep flag over already-computed signal columns."""
    cond = None
    for c, cap in REP_THRESHOLDS_PPM.items():
        this = F.col(prefix + c) <= F.lit(cap)
        cond = this if cond is None else (cond & this)
    return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("int")


def sql_repetition_signals(table: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB replay of :func:`repetition_signals` — the full naive
    explode/group recomputation of every n-gram's count and char mass.

    NB the correlated series must be ``unnest(generate_series(...))`` in
    the SELECT list (DuckDB's binder rejects LATERAL column args in FROM),
    and the clamp/floor arithmetic is all-integer so it equals the Python
    side exactly.
    """
    tops = ", ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN least(1000000, topmass * 1000000 // total) END), 0)::BIGINT AS top{n}_ppm"
        for n in REP_NS[0]
    )
    dups = ", ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN least(1000000, dupmass * 1000000 // total) END), 0)::BIGINT AS dup{n}_ppm"
        for n in REP_NS[1]
    )
    keep = " AND ".join(
        f"coalesce(f.{c}, 0) <= {cap}" for c, cap in REP_THRESHOLDS_PPM.items()
    )
    sig_sel = ", ".join(
        f"coalesce(f.{c}, 0)::BIGINT AS {c}" for c in _SIGNAL_COLS
    )
    ns = ", ".join(f"({n})" for ns_ in REP_NS for n in ns_)
    return f"""
WITH d AS (SELECT {id_col}, string_split(coalesce(text, ''), ' ') AS w,
                  len(coalesce(text, ''))::BIGINT AS total FROM {table}),
p AS (SELECT {id_col}, total, ns.n, w,
             unnest(generate_series(1, len(w) - ns.n + 1)) AS i
      FROM d CROSS JOIN (VALUES {ns}) AS ns(n)
      WHERE len(w) >= ns.n AND total > 0),
g AS (SELECT {id_col}, total, n,
             array_to_string(w[i:i+n-1], ' ') AS gram FROM p),
c AS (SELECT {id_col}, total, n, len(gram)::BIGINT AS glen,
             count(*)::BIGINT AS cnt
      FROM g GROUP BY {id_col}, total, n, gram),
s AS (SELECT {id_col}, total, n,
             coalesce(max(CASE WHEN cnt > 1 THEN cnt * glen END), 0)::BIGINT AS topmass,
             coalesce(sum(CASE WHEN cnt > 1 THEN cnt * glen END), 0)::BIGINT AS dupmass
      FROM c GROUP BY 1, 2, 3),
f AS (SELECT {id_col}, {tops}, {dups} FROM s GROUP BY {id_col})
SELECT t.{id_col}, {sig_sel},
       (CASE WHEN {keep} THEN 1 ELSE 0 END)::INT AS keep
FROM {table} t LEFT JOIN f USING ({id_col})
"""
