"""BPE trainer/serving: hand-computed merges, tie-break determinism,
application-strategy equivalence, partitioning invariance, OOV serving."""

from __future__ import annotations

import random

import pytest

from openccnet_spark.operators.bpe import (
    bpe_train,
    token_counts,
    tokenize_word,
    top_vocab,
    train_merges,
    train_replay_py,
    word_counts,
)


def test_hand_computed_merges():
    # 'aab' x3, 'ab' x2: pair counts round 1: (a,a)=3, (a,b)=5 -> merge ab
    vocab = [("aab", 3), ("ab", 2)]
    merges = train_merges(vocab, n_merges=2)
    assert merges[0] == (0, "a", "b", 5)
    # after: ('a','ab') x3, ('ab',) x2 -> pair (a,ab)=3
    assert merges[1] == (1, "a", "ab", 3)


def test_tie_break_lexicographic():
    # (x,y) and (a,b) both count 2 -> 'a','b' wins the tie
    merges = train_merges([("xy", 2), ("ab", 2)], n_merges=1)
    assert merges[0][:3] == (0, "a", "b")


def test_early_stop_when_no_pairs():
    assert train_merges([("a", 5), ("b", 3)], n_merges=10) == []


def test_application_strategies_agree_incl_oov():
    """Serving (lowest-rank-first iterative) == oracle (sequential
    rank-order) on every corpus word AND on OOV words over the same
    alphabet — the provable equivalence, exercised."""
    rng = random.Random(11)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randrange(1, 9)))
             for _ in range(120)]
    texts = [" ".join(words[:60]), " ".join(words[60:])]
    merges, tokens_seq = train_replay_py(texts, n_merges=20)
    ranks = {(l, r): k for k, l, r, _ in merges}
    oov = ["dcba", "aaaaaaaaaa", "bdca" * 3, "z", "zaz"]
    for w in set(words) | set(oov):
        assert tokenize_word(w, ranks) == tokens_seq(w), w


def test_spark_train_matches_replay(spark):
    rng = random.Random(3)
    docs = [
        (i, " ".join(rng.choice(["spark", "batch", "part", "sort", "scan"])
                     for _ in range(rng.randrange(0, 12))))
        for i in range(100)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out, merges = bpe_train(df, n_merges=16)
    want, _ = train_replay_py([t for _, t in docs], n_merges=16)
    assert merges == want
    assert [tuple(r) for r in out.orderBy("merge_rank").collect()] == want


def test_top_vocab_partitioning_invariant(spark):
    docs = [(i, "aa bb aa cc") for i in range(50)]
    a = top_vocab(word_counts(spark.createDataFrame(docs, "doc_id long, text string").repartition(1)))
    b = top_vocab(word_counts(spark.createDataFrame(docs, "doc_id long, text string").repartition(13)))
    assert a == b == [("aa", 100), ("bb", 50), ("cc", 50)]


def test_v_max_cut_is_deterministic_and_oov_serves(spark):
    """Words cut by top-V still tokenize at serving time (merges just
    apply less); the cut order is (cnt desc, word asc)."""
    docs = [(1, "aa aa aa bb bb cc")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    _, merges = bpe_train(df, n_merges=4, v_max=1)  # vocab = ['aa'] only
    assert all(m[1] == "a" for m in merges[:1])
    ranks = {(l, r): k for k, l, r, _ in merges}
    assert tokenize_word("cc", ranks) == 2  # untouched by 'aa' merges


def test_token_counts_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab ab")], "doc_id long, text string"
    )
    _, merges = bpe_train(df, n_merges=2)
    rows = {r["doc_id"]: r for r in token_counts(df, merges).collect()}
    assert (rows[1]["n_words"], rows[1]["n_tokens"]) == (0, 0)
    assert (rows[2]["n_words"], rows[2]["n_tokens"]) == (0, 0)
    assert rows[3]["n_words"] == 2 and rows[3]["n_tokens"] == 2  # 'ab' merged
