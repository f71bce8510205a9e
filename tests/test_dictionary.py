"""Dictionary parsing / metadata / plan-composition tests.

Models the reference's DictionaryLibTests.cs (SURVEY.md §5): parser contract,
custom-dict precedence, plan composition, slot inventory.
"""

from __future__ import annotations

from openccnet_spark import Converter, load_bundle, parse_dict_text, plan_slots
from openccnet_spark.dictionary import SLOTS, build_round_index


def test_parser_contract():
    text = "\n".join(
        [
            "# comment line",
            "",
            "㐹\t㑶 㐹",  # alias after space dropped -> first token wins
            "a\tb",
            "a\tc",  # duplicate key: last wins
            "empty\t",  # empty value skipped
            "\tval",  # empty key skipped
            "notab_line",
            "k\tv extra tokens here",
        ]
    )
    d = parse_dict_text(text)
    assert d == {"㐹": "㑶", "a": "c", "k": "v"}


def test_bundle_slot_inventory():
    b = load_bundle()
    assert set(b.slots) == set(SLOTS)
    # sizes from SURVEY.md §2.5 (entries ≈ unique keys after dup-resolution)
    assert len(b["st_phrases"]) > 48000
    assert len(b["ts_characters"]) > 4000
    assert len(b["st_characters"]) > 3900
    assert len(b["st_punctuations"]) == 4
    assert len(b["ts_punctuations"]) == 4
    # barrier audit: whole-string matching == split-then-convert
    assert b.meta.get("delimiter_free_keys") is True


def test_char_dicts_single_codepoint():
    # zho_check's _char_conversion_changes relies on this invariant
    b = load_bundle()
    for slot in ("st_characters", "ts_characters"):
        assert max(len(k) for k in b[slot]) == 1


def test_round_index_first_dict_wins():
    d1 = {"ab": "X", "a": "1"}
    d2 = {"ab": "Y", "cd": "Z"}
    ri = build_round_index([d1, d2])
    assert ri.table["ab"] == "X"  # first dict wins on conflict
    assert ri.table["cd"] == "Z"
    cap, mn, mask = ri.starters["a"]
    assert cap == 2 and mn == 1 and mask == 0b110


def test_plan_composition():
    # variant-phrases before char variants (DictionaryLibTests.cs:847-950)
    assert plan_slots("s2tw") == (
        ("st_phrases", "st_characters"),
        ("tw_variants_phrases", "tw_variants"),
    )
    assert plan_slots("t2jp") == (("jps_characters_rev",),)
    assert plan_slots("jp2t") == (("jps_phrases", "jps_characters"),)
    assert plan_slots("tw2sp", punct=True) == (
        ("tw_phrases_rev", "tw_variants_rev_phrases", "tw_variants_rev"),
        ("ts_phrases", "ts_characters", "ts_punctuations"),
    )
    # T->T regional: punct-only second round iff punct requested
    assert plan_slots("t2tw") == (("tw_variants_phrases", "tw_variants"),)
    assert plan_slots("t2tw", punct=True) == (
        ("tw_variants_phrases", "tw_variants"),
        ("st_punctuations",),
    )


def test_custom_dict_append_and_override():
    # reference O15: append = late-comer wins; override = replace slot
    base = load_bundle()
    cc = Converter(base)
    assert cc.convert("软件", "s2t") == "軟件"

    appended = base.with_custom(appends={"st_phrases": {"软件": "軟體TEST"}})
    assert Converter(appended).convert("软件", "s2t") == "軟體TEST"
    # original bundle untouched (atomic swap semantics)
    assert cc.convert("软件", "s2t") == "軟件"

    overridden = base.with_custom(overrides={"st_phrases": {"软件": "OVR"}})
    cc2 = Converter(overridden)
    assert cc2.convert("软件", "s2t") == "OVR"
    # the rest of st_phrases is gone; single chars still convert
    assert cc2.convert("几", "s2t") == "幾"


def test_jp_round_trip():
    cc = Converter()
    t = "傳統漢字"
    jp = cc.convert(t, "t2jp")
    assert cc.convert(jp, "jp2t") == t
