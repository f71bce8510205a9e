"""Property-based tests (hypothesis) for the conversion core.

Mirrors the reference's randomized splitter strategy (SplitterTests.cs:
500 seeded random strings incl. surrogate-adjacent cases) with stronger
guarantees: the fast trie-regex/translate matcher must be byte-equal to
the scalar ground-truth matcher on arbitrary unicode, and conversion must
be total (never throws, never changes length class unexpectedly)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# derandomize: the suite must be reproducible across rounds/machines
settings.register_profile("repo", settings(derandomize=True, deadline=None))
settings.load_profile("repo")

from openccnet_spark import Converter
from openccnet_spark.convert import get_split_ranges, run_round, run_round_scalar
from openccnet_spark.plans import CONFIGS, get_plan

CC = Converter()
_PLANS = [get_plan(CC.bundle, c, p) for c in CONFIGS for p in (False, True)]

# text alphabet: CJK blocks that actually hit the lexicons, ASCII, punct,
# astral chars, and arbitrary unicode noise
_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E6F),
        st.characters(min_codepoint=0x9F00, max_codepoint=0x9FAF),
        st.sampled_from("软件龙马精神几千只隐私权資訊軟體裡面发髮着著的了吗"),
        st.sampled_from("abz019 ,.!“”「」，。！？"),
        st.sampled_from("😀𬴂𱁬⿰⿳氵口馬"),
        st.characters(min_codepoint=0x20, max_codepoint=0x2FFFF),
    ),
    max_size=80,
)


@given(_text, st.integers(min_value=0, max_value=len(_PLANS) - 1))
@settings(max_examples=400)
def test_fast_matcher_equals_scalar(text, plan_idx):
    for rnd in _PLANS[plan_idx].rounds:
        assert run_round(text, rnd) == run_round_scalar(text, rnd)


@given(_text)
@settings(max_examples=200)
def test_conversion_total_and_stable(text):
    out = CC.convert(text, "t2s")
    assert isinstance(out, str)
    # idempotence: converting Simplified output again is a no-op
    assert CC.convert(out, "t2s") == out


@given(_text)
@settings(max_examples=200)
def test_split_ranges_tile_exactly(text):
    pos = 0
    for a, b in get_split_ranges(text, inclusive=True):
        assert a == pos and b > a
        pos = b
    assert pos == len(text)


@given(_text)
@settings(max_examples=200)
def test_preserve_ids_never_throws(text):
    out = CC.convert(text, "t2s", preserve_ids=True)
    assert isinstance(out, str)


@given(st.lists(_text, max_size=10), st.integers(min_value=0, max_value=len(CONFIGS) - 1))
@settings(max_examples=300)
def test_convert_many_equals_per_text(texts, cfg_idx):
    """The NUL-megastring batch path must be byte-identical to per-text
    conversion on arbitrary unicode (incl. astral chars, NULs via the
    fallback, and delimiter-dense text)."""
    cfg = CONFIGS[cfg_idx]
    assert CC.convert_many(texts, cfg) == [CC.convert(t, cfg) for t in texts]


@given(st.lists(st.text(alphabet=st.sampled_from("软\x00件资\x00讯"), max_size=8), max_size=5))
@settings(max_examples=100)
def test_convert_many_nul_inputs_fall_back(texts):
    assert CC.convert_many(texts, "s2t") == [CC.convert(t, "s2t") for t in texts]
