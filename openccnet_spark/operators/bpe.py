"""Learned BPE tokenizer: distributed counting, deterministic training,
memoized distributed serving.

The brief's "token counting" tier is a whitespace/regex heuristic
(`operators/textstats.py`); this is the real thing — byte-pair-encoding
merges LEARNED from the corpus, then applied corpus-wide.

Scale shape (the 100 TB story), mirroring how production BPE trainers
(GPT-2's original, SentencePiece's BPE mode) actually run:

- **The corpus-sized pass is one aggregation.** BPE training never needs
  the corpus — it needs the word-frequency table. `word_counts` is a
  single explode → map-side-combined groupBy; the shuffle carries
  (word, partial count) pairs, never documents.
- **The driver transfer is vocab-bounded, not corpus-bounded.**
  `top_vocab` caps the table at the V most frequent words
  (deterministic order: count desc, word asc), so at 100 TB the collect
  is V rows regardless of corpus size — the same cap every production
  trainer applies. Merge learning on V words is pure CPU, O(n_merges ·
  total chars in vocab), independent of corpus size.
- **Serving is embarrassingly parallel and memoized.** `token_counts`
  broadcasts the merge ranks (n_merges small) and tokenizes worker-side
  with a per-batch memo keyed by word: per-task work is bounded by
  DISTINCT words seen, not token count — on natural-language corpora
  that is the Zipf head, a tiny fraction of the token stream.

Determinism: the merge choice is `min((-count, pair))` — total order,
no dict-iteration dependence; ties break to the lexicographically
smallest pair. Rank-order sequential application (training, the DuckDB
oracle's replay) and lowest-rank-first iterative application (serving)
provably agree: a merge at rank k can only create pairs whose rank
exceeds k (the merged symbol did not exist before rank k), so ascending
rank passes never miss a lower-rank opportunity.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: training defaults — bounded regardless of corpus size
N_MERGES = 48
V_MAX = 4096


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) via one map-side-combined aggregation."""
    return (
        df.select(
            F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_vocab(wc: DataFrame, v_max: int = V_MAX) -> list[tuple[str, int]]:
    """The V most frequent words, deterministically ordered (cnt desc,
    word asc — ties cannot reorder across partitionings). This is the
    ONLY driver transfer in training and it is v_max-bounded."""
    rows = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(v_max).collect()
    return [(r["word"], r["cnt"]) for r in rows]


def _merge_all(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """One left-to-right pass replacing every adjacent (a, b) with a+b."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_merges(
    vocab: list[tuple[str, int]], n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Greedy BPE on the word-frequency table: (rank, left, right,
    pair_count) per learned merge. Stops early when no pair remains."""
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w), c) for w, c in vocab
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, cnt))
        words = [(_merge_all(s, left, right), c) for s, c in words]
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = N_MERGES,
    v_max: int = V_MAX,
    text_col: str = "text",
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """Distributed count → bounded collect → deterministic merge learning.
    Returns (merge-table DataFrame, merges list for serving)."""
    spark = df.sparkSession
    merges = train_merges(top_vocab(word_counts(df, text_col), v_max), n_merges)
    # lhs/rhs/merge_rank: LEFT/RIGHT/RANK are SQL keywords in the oracle
    out = spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count long"
    )
    return out, merges


def tokenize_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word under the learned merges: iteratively merge
    the lowest-rank adjacent pair (all its occurrences, left to right)."""
    syms: tuple[str, ...] = tuple(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        syms = _merge_all(syms, best_pair[0], best_pair[1])
    return len(syms)


def token_counts(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_tokens) per document — one narrow Arrow stage with
    a per-batch word→count memo (work bounded by distinct words)."""
    ranks = {(l, r): rank for rank, l, r, _ in merges}

    def _count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = memo[w] = tokenize_word(w, ranks)
            return n

        for pdf in batches:
            n_words, n_tokens = [], []
            for text in pdf[text_col]:
                ws = [w for w in (text or "").split(" ") if w]
                n_words.append(len(ws))
                n_tokens.append(sum(word_tokens(w) for w in ws))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_words": n_words, "n_tokens": n_tokens}
            )

    return df.select(id_col, text_col).mapInPandas(
        _count, f"{id_col} long, n_words long, n_tokens long"
    )


# ------------------------------------------------------------ replay side


def train_replay_py(texts: list[str], n_merges: int = N_MERGES, v_max: int = V_MAX):
    """Self-contained single-process replay for oracles/tests. Shares NO
    code with the Spark path: naive Counter word table → explicit-scan
    best-pair selection → in-place list rewriting → rank-order SEQUENTIAL
    tokenization (the other member of the provably equal application
    pair — a divergence between the strategies, the counting paths, or
    the tie-break orders surfaces as an oracle mismatch)."""
    from collections import Counter

    wc = Counter(w for t in texts for w in (t or "").split(" ") if w)
    vocab = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:v_max]
    table: list[list] = [[list(w), c] for w, c in vocab]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for syms, c in table:
            for j in range(len(syms) - 1):
                pc[(syms[j], syms[j + 1])] += c
        if not pc:
            break
        best_pair, best_cnt = None, -1
        for pair, c in pc.items():
            if c > best_cnt or (c == best_cnt and pair < best_pair):
                best_pair, best_cnt = pair, c
        a, b = best_pair
        merges.append((rank, a, b, best_cnt))
        for row in table:
            syms, out, j = row[0], [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            row[0] = out

    def tokens_sequential(word: str) -> int:
        syms = list(word)
        for _, left, right, _ in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    out.append(left + right)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return len(syms)

    return merges, tokens_sequential
