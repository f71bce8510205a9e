"""Golden conversion tests ported from the reference test suite.

Sources: OpenccNetTests/OpenccNetTests.cs (cited per case in FIXTURES.md §3-5).
These pin the pure-Python matcher; the Spark path is pinned separately in
test_spark_functions.py by running the same fixtures through pandas UDFs.
"""

from __future__ import annotations

import pytest

from openccnet_spark import CONFIGS, Converter

CC = Converter()

GOLDENS = [
    # (config, punct, input, expected)
    ("s2t", False, "俨骖𬴂于上路，访风景于崇阿；临帝子之长洲，得天人之旧馆。",
     "儼驂騑於上路，訪風景於崇阿；臨帝子之長洲，得天人之舊館。"),
    ("s2t", False, "几千只", "幾千隻"),
    ("s2t", True, "你好“世界”！“龙马精神”", "你好「世界」！「龍馬精神」"),
    ("t2s", False, "美麗", "美丽"),
    ("t2s", True, "你好「世界」！", "你好“世界”！"),
    ("s2twp", False, "软件", "軟體"),
    ("s2twp", False, "软件为", "軟體為"),
    ("s2hkp", False, "别随便录影侵犯个人隐私权", "別隨便錄影侵犯個人私隱權"),
    ("tw2sp", False, "軟體", "软件"),
    ("hk2sp", False, "別隨便錄影侵犯個人私隱權", "别随便录影侵犯个人隐私权"),
    ("t2hkp", False, "別隨便錄影侵犯個人隱私權", "別隨便錄影侵犯個人私隱權"),
    ("hk2tp", False, "別隨便錄影侵犯個人私隱權", "別隨便錄影侵犯個人隱私權"),
    ("s2hk", False, "电台", "電台"),
    ("hk2s", False, "資訊", "资讯"),
    ("t2tw", False, "娘惹糉子", "娘惹粽子"),
    ("tw2t", False, "針核裡才吃著灶煙", "針核裡才吃著灶煙"),
    ("hk2t", False, "針核裡才吃著灶煙", "針核裡才吃著灶煙"),
    # empty / passthrough
    ("s2t", False, "", ""),
    ("s2t", False, "no cjk at all", "no cjk at all"),
]


@pytest.mark.parametrize("config,punct,inp,expected", GOLDENS)
def test_golden(config, punct, inp, expected):
    assert CC.convert(inp, config, punct) == expected


def test_invalid_config_falls_back_to_s2t():
    # reference: invalid config -> s2t with recorded error (Opencc.cs:650-695)
    assert CC.convert("测试", "not_a_config") == "測試"


def test_all_20_configs_run():
    for cfg in CONFIGS:
        out = CC.convert("汉字文化圈", cfg)
        assert isinstance(out, str) and out


@pytest.mark.parametrize("inp,expected", [("发", "發"), ("A发😀台!", "A發😀臺!")])
def test_st(inp, expected):
    assert CC.st(inp) == expected


@pytest.mark.parametrize("inp,expected", [("發髮後臺", "发发后台"), ("A發😀臺!", "A发😀台!")])
def test_ts(inp, expected):
    assert CC.ts(inp) == expected


@pytest.mark.parametrize(
    "inp,expected",
    [
        ("这是简体字。", 2),
        ("这是一个简体中文文本。", 2),
        ("這是繁體字。", 1),
        ("這是一個繁體中文文本。", 1),
        ("汉漢", 1),  # ts_characters probed first (Opencc.cs:2197)
        ("English 😀 123!", 0),
        ("This is some English text.", 0),
        ("", 0),
    ],
)
def test_zho_check(inp, expected):
    assert CC.zho_check(inp) == expected


def test_normalize_compat():
    # U+F900 (compat) -> U+8C48
    assert CC.normalize_compat("豈") == "豈"
    assert CC.normalize_compat("plain 文本") == "plain 文本"
    # astral compat block U+2F800 -> U+4E3D
    assert CC.normalize_compat("\U0002f800") == "丽"


def test_detofu():
    # ExtB: 𬴂 (U+2CD02) -> 騑; unmapped astral preserved
    assert CC.detofu("骖𬴂") == "骖騑"
    assert CC.detofu("𱁬") == "𱁬"
    # ExtI-only level disables ExtB mappings
    assert CC.detofu("𬴂", level=7) == "𬴂"


def test_detofu_with_custom_file(tmp_path):
    # reference TestDeTofuWithCustomFileOverridesBuiltin
    # (OpenccNetTests.cs:399-423): custom file entry overrides builtin
    p = tmp_path / "tofu.txt"
    p.write_text("𣭲\t氂\tB\n", encoding="utf-8")
    assert CC.detofu_with_custom_file("𣭲毛", 0, p) == "氂毛"
    # builtin alone maps 𣭲 differently
    assert CC.detofu("𣭲毛") == "氄毛"


def test_detofu_custom_file_extension_gating(tmp_path):
    # a custom entry tagged B is ignored at threshold ExtI (7); legacy and
    # dashed spellings both parse (DeTofu.cs:128-195)
    p = tmp_path / "tofu.txt"
    p.write_text("𣭲\t氂\tExtB\n# comment\n\n𬴂\t訂\text-i\n", encoding="utf-8")
    out = CC.detofu_with_custom_file("𣭲𬴂", 7, p)
    assert out == "𣭲訂"  # ExtB entry gated out; ext-i entry applies


def test_detofu_with_custom_pairs():
    # reference TestDeTofuWithCustomPairsOverridesBuiltin
    # (OpenccNetTests.cs:441-459); pairs apply regardless of level
    out = CC.detofu_with_custom_pairs("𣭲毛 骖𬴂", 0, {"𣭲": "氂", "𬴂": "騑"})
    assert out == "氂毛 骖騑"
    assert CC.detofu_with_custom_pairs("𬴂", 7, {"𬴂": "訂"}) == "訂"


def test_detofu_builtin_clone_isolation():
    # reference TestDeTofuBuiltinReturnsIndependentMutableClone +
    # CloneCannotMutateStaticCache (OpenccNetTests.cs:461-496)
    from openccnet_spark.detofu import DeTofuMap

    first = DeTofuMap.builtin(CC.bundle, 0).with_custom_pairs({"𬴂": "訂"})
    second = DeTofuMap.builtin(CC.bundle, 0)
    assert first.convert("𬴂") == "訂"
    assert second.convert("𬴂") == "騑"
    assert CC.detofu("骖𬴂") == "骖騑"  # shared bundle table untouched


def test_invalid_config_falls_back_and_records_error():
    # reference Convert_WithInvalidConfig_ReturnsOriginalTextAndSetsLastError
    # (OpenccNetTests.cs:186-194)
    from openccnet_spark.convert import Converter

    cc = Converter()
    assert cc.convert("测试", "invalid_config") == "測試"  # s2t fallback
    assert cc.get_last_error() is not None
    assert "invalid_config" in cc.get_last_error()
    assert cc.convert("测试", "s2t") == "測試"
    assert cc.get_last_error() is None  # valid config clears the error


def test_invalid_config_strict_raises():
    import pytest

    from openccnet_spark.convert import Converter

    with pytest.raises(ValueError, match="invalid_config"):
        Converter(strict=True).convert("测试", "invalid_config")


def test_ids_preservation():
    assert CC.convert("⿰口馬", "t2s") == "⿰口马"
    assert CC.convert("⿰口馬", "t2s", preserve_ids=True) == "⿰口馬"
    assert (
        CC.convert("漢字結構：⿰氵漢（漢）", "t2s", preserve_ids=True)
        == "汉字结构：⿰氵漢（汉）"
    )


def test_round_trips():
    # north_star round-trip fixtures: s2t/t2s and s2tw/tw2sp pairs
    simp = "别随便录影侵犯个人隐私权，软件为你服务。"
    trad = CC.convert(simp, "s2t")
    assert CC.convert(trad, "t2s") == simp
    tw = CC.convert("软件", "s2twp")
    assert CC.convert(tw, "tw2sp") == "软件"


def test_punctuation_round_trip():
    s = "你好“世界”！"
    t = CC.convert(s, "s2t", punct=True)
    assert t == "你好「世界」！"
    assert CC.convert(t, "t2s", punct=True) == s


def test_zho_check_utf16_sampling_boundary():
    # reference samples the first 500 UTF-16 units, clamped to a full code
    # point (Opencc.cs:2186-2190): an astral char straddling the boundary
    # must be excluded, not split.
    filler = "a" * 499
    # 499 units + astral (2 units) would exceed 500: astral clamped away,
    # and the remaining sample strips to nothing -> 0
    assert CC.zho_check(filler + "\U0002b74f" + "汉" * 50) == 0
    # 498 units + astral fits exactly: the astral char survives but is not
    # a convertible char either way; trailing Simplified chars are beyond
    # the sample window -> still 0
    assert CC.zho_check("a" * 498 + "\U0002b74f" + "汉" * 50) == 0
    # Simplified content inside the window is detected
    assert CC.zho_check("a" * 490 + "汉字" + "a" * 100) == 2


def test_instance_config_like_reference():
    """`Converter(config=...)` mirrors `new Opencc("s2t")`: the instance
    holds the config, convert() without an argument uses it, an invalid
    name records the error at construction and falls back to s2t."""
    from openccnet_spark.convert import Converter

    assert Converter(config="t2s").convert("繁體轉簡") == "繁体转简"
    bad = Converter(config="invalid_config")
    assert bad.convert("测试") == "測試"
    assert "invalid_config" in bad.get_last_error()
    # per-call config still overrides the instance one
    assert Converter(config="t2s").convert("软件", "s2twp") == "軟體"
