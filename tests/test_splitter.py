"""Splitter / whole-string-equivalence property tests.

Models the reference's SplitterTests.cs differential strategy (500 random
seeded strings, SURVEY.md §5): our conversion path skips delimiter splitting
(keys never contain delimiters — dictgen audit), so prove byte-equality
between whole-string conversion and split-then-convert on random inputs.
"""

from __future__ import annotations

import random

from openccnet_spark import Converter
from openccnet_spark.convert import FULL_DELIMITERS, get_split_ranges, run_round
from openccnet_spark.plans import get_plan

CC = Converter()

_POOL = (
    "汉字文化圈的发展历史软件龙马精神几千只"
    "漢字文化圈的發展歷史軟體龍馬精神幾千隻"
    "abcXYZ 0189"
    "，。！？；：“”「」"
    "😀𬴂𱁬"
    "\t\n"
)


def _random_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(_POOL) for _ in range(n))


def test_ranges_cover_input():
    rng = random.Random(0x5EED)
    for _ in range(200):
        s = _random_text(rng, rng.randint(0, 60))
        ranges = get_split_ranges(s, inclusive=True)
        # inclusive ranges tile the string exactly
        pos = 0
        for a, b in ranges:
            assert a == pos and b > a
            pos = b
        assert pos == len(s)


def test_delimiters_attached_to_preceding_segment():
    ranges = get_split_ranges("你好，世界。", inclusive=True)
    assert ranges == [(0, 3), (3, 6)]


def test_whole_string_equals_split_convert():
    rng = random.Random(0x5EED)
    plan = get_plan(CC.bundle, "s2t", punct=True)
    for _ in range(500):
        s = _random_text(rng, rng.randint(0, 80))
        whole = CC.convert(s, "s2t", punct=True)
        parts = []
        for a, b in get_split_ranges(s, inclusive=True):
            seg = s[a:b]
            for rnd in plan.rounds:
                seg = run_round(seg, rnd)
            parts.append(seg)
        assert "".join(parts) == whole


def test_ids_ranges_isolated():
    ranges = get_split_ranges("字⿰口馬字", inclusive=True, preserve_ids=True)
    assert ranges == [(0, 1), (1, 4), (4, 5)]


def test_delimiter_set_matches_reference_size():
    # Opencc.cs:705-706 enumerates the full set; pin a few members
    for c in " \t\n,。？！【】～：":
        assert c in FULL_DELIMITERS
    assert "好" not in FULL_DELIMITERS
    assert "“" not in FULL_DELIMITERS  # curly quotes are NOT delimiters
