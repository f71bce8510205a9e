"""Conversation-level curation: fold/merge semantics + idempotence,
gate thresholds + reason precedence, fingerprint order sensitivity,
render goldens — plus DuckDB parity for the ordered aggregations."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from openccnet_spark.operators.conversations import (
    conversation_fingerprints,
    conversation_gate,
    fold_tool_turns,
    render_chat_template,
    sql_conversation_fingerprints,
    sql_fold_tool_turns,
    sql_render_chat_template,
)

_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _conv(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_fold_merges_tool_runs(spark):
    df = _conv(
        spark,
        [
            ("c0", 0, "user", "hi"),
            ("c0", 1, "assistant", "let me check"),
            ("c0", 2, "tool", "result: 42"),
            ("c0", 3, "tool", "result: 43"),
            ("c0", 4, "user", "thanks"),
        ],
    )
    got = sorted(map(tuple, fold_tool_turns(df).collect()))
    assert got == [
        ("c0", 0, "user", "hi", 1),
        ("c0", 1, "assistant", "let me check\nresult: 42\nresult: 43", 3),
        ("c0", 2, "user", "thanks", 1),
    ]


def test_fold_no_adjacent_runs_is_identity(spark):
    rows = [("c1", i, r, f"t{i}") for i, r in enumerate(["user", "assistant"] * 3)]
    got = sorted(map(tuple, fold_tool_turns(_conv(spark, rows)).collect()))
    assert got == [(c, i, r, t, 1) for c, i, r, t in rows]


def test_fold_is_idempotent(spark):
    rows = [
        ("c2", i, r, f"x{i}")
        for i, r in enumerate(["user", "tool", "tool", "assistant", "assistant"])
    ]
    once = fold_tool_turns(_conv(spark, rows))
    twice = fold_tool_turns(once.select("conv_id", "turn_idx", "role", "text"))
    a = sorted(map(tuple, once.select("conv_id", "turn_idx", "role", "text").collect()))
    b = sorted(map(tuple, twice.select("conv_id", "turn_idx", "role", "text").collect()))
    assert a == b


def test_fold_matches_duckdb_window_form(spark):
    rows = [
        (f"c{c}", t, ["user", "tool", "assistant", "tool"][(c + t) % 4], f"w{c}-{t}")
        for c in range(6)
        for t in range(c + 2)
    ]
    got = sorted(map(tuple, fold_tool_turns(_conv(spark, rows)).collect()))
    duckdb.register("fold_t", pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]))
    want = sorted(map(tuple, duckdb.sql(sql_fold_tool_turns("fold_t")).fetchall()))
    assert got == want


def test_gate_thresholds_and_precedence(spark):
    rows = [
        # c0: all kept, has assistant -> keep
        ("c0", 0, "user", True),
        ("c0", 1, "assistant", True),
        # c1: assistant turn dropped -> no_assistant (beats low fraction)
        ("c1", 0, "user", True),
        ("c1", 1, "assistant", False),
        ("c1", 2, "user", False),
        # c2: assistant kept but 1/3 kept = 333 milli < 600 -> low_kept_fraction
        ("c2", 0, "user", False),
        ("c2", 1, "assistant", True),
        ("c2", 2, "user", False),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, keep boolean")
    got = {r["conv_id"]: r for r in conversation_gate(df).collect()}
    assert got["c0"]["conv_keep"] and got["c0"]["drop_reason"] == "none"
    assert not got["c1"]["conv_keep"] and got["c1"]["drop_reason"] == "no_assistant"
    assert not got["c2"]["conv_keep"] and got["c2"]["drop_reason"] == "low_kept_fraction"
    assert got["c2"]["kept_milli"] == 333


def test_fingerprints_detect_exact_dups_and_order(spark):
    rows = [
        ("a", 0, "user", "q"), ("a", 1, "assistant", "r"),
        ("b", 0, "user", "q"), ("b", 1, "assistant", "r"),  # dup of a
        ("c", 0, "assistant", "r"), ("c", 1, "user", "q"),  # same turns, other order
    ]
    got = {r["conv_id"]: r for r in conversation_fingerprints(_conv(spark, rows)).collect()}
    assert got["a"]["fingerprint"] == got["b"]["fingerprint"]
    assert got["a"]["fingerprint"] != got["c"]["fingerprint"]
    assert got["a"]["is_canonical"] and not got["b"]["is_canonical"]
    assert got["c"]["is_canonical"]


def test_fingerprint_length_prefix_blocks_resplit(spark):
    # same concatenated bytes, different turn split: must differ
    rows = [
        ("a", 0, "user", "xy"), ("a", 1, "user", "z"),
        ("b", 0, "user", "x"), ("b", 1, "user", "yz"),
    ]
    got = {r["conv_id"]: r["fingerprint"]
           for r in conversation_fingerprints(_conv(spark, rows)).collect()}
    assert got["a"] != got["b"]


def test_fingerprints_match_duckdb(spark):
    rows = [(f"c{c}", t, ["user", "assistant"][t % 2], f"text {c % 3}:{t}")
            for c in range(8) for t in range(4)]
    got = sorted(map(tuple, conversation_fingerprints(_conv(spark, rows)).collect()))
    duckdb.register("fp_t", pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]))
    want = sorted(map(tuple, duckdb.sql(sql_conversation_fingerprints("fp_t")).fetchall()))
    assert got == want


def test_render_golden(spark):
    df = _conv(spark, [("c0", 0, "user", "hi"), ("c0", 1, "assistant", "hello")])
    row = render_chat_template(df).first()
    expected = "<|user|>\nhi<|end|>\n<|assistant|>\nhello<|end|>\n"
    assert row["text"] == expected
    assert row["n_turns"] == 2 and row["n_chars"] == len(expected)


def test_render_matches_duckdb(spark):
    rows = [(f"c{c}", t, ["user", "assistant", "tool"][t % 3], f"b'{c}\n{t}")
            for c in range(5) for t in range(5)]
    got = sorted(map(tuple, render_chat_template(_conv(spark, rows)).collect()))
    duckdb.register("rd_t", pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]))
    want = sorted(map(tuple, duckdb.sql(sql_render_chat_template("rd_t")).fetchall()))
    assert got == want


def test_conversation_pack_integrity_and_capacity(spark):
    """Every conversation lands in exactly one bin; a bin exceeds the
    window by at most one conversation's overhang; the placement is
    identical under a different input partitioning (determinism)."""
    from openccnet_spark.operators.conversations import conversation_pack

    rows = [(f"c{c}", t, "user", " ".join(["w"] * (3 + (c * 7 + t) % 9)))
            for c in range(40) for t in range((c % 5) + 1)]
    df = _conv(spark, rows)
    out = {r["conv_id"]: (r["n_tokens"], r["start_offset"], r["bin_id"])
           for r in conversation_pack(df, window=50).collect()}
    assert len(out) == 40  # one row per conversation, never split
    # bin load = sum of member tokens; only the straddling conv overhangs
    loads: dict[int, int] = {}
    for n, off, b in out.values():
        loads[b] = loads.get(b, 0) + n
        assert off // 50 == b
    max_conv = max(n for n, _, _ in out.values())
    assert all(load < 50 + max_conv for load in loads.values())
    out2 = {r["conv_id"]: (r["n_tokens"], r["start_offset"], r["bin_id"])
            for r in conversation_pack(df.repartition(13), window=50).collect()}
    assert out == out2
