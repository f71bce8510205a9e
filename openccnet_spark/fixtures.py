"""Golden fixtures shared by tests and the driver-contract oracles.

Ported from the reference test suite (OpenccNetTests/OpenccNetTests.cs,
citations in FIXTURES.md §3-4).
"""

from __future__ import annotations

#: (config, punct, input, expected)
CONVERT_GOLDENS = [
    ("s2t", False, "俨骖𬴂于上路，访风景于崇阿；临帝子之长洲，得天人之旧馆。",
     "儼驂騑於上路，訪風景於崇阿；臨帝子之長洲，得天人之舊館。"),
    ("s2t", False, "几千只", "幾千隻"),
    ("s2t", True, "你好“世界”！“龙马精神”", "你好「世界」！「龍馬精神」"),
    ("t2s", False, "美麗", "美丽"),
    ("t2s", True, "你好「世界」！", "你好“世界”！"),
    ("s2tw", False, "着装污染虚伪发泄", "著裝汙染虛偽發洩"),
    ("tw2s", False, "著裝汙染虛偽發洩", "着装污染虚伪发泄"),
    ("s2twp", False, "软件", "軟體"),
    ("s2twp", False, "软件为", "軟體為"),
    ("s2twp", False, "U盘里的软件", "隨身碟裡的軟體"),
    ("tw2sp", False, "軟體", "软件"),
    ("tw2sp", False, "隨身碟裡的軟體", "U盘里的软件"),
    ("s2hk", False, "电台", "電台"),
    ("hk2s", False, "資訊", "资讯"),
    ("s2hkp", False, "别随便录影侵犯个人隐私权", "別隨便錄影侵犯個人私隱權"),
    ("hk2sp", False, "別隨便錄影侵犯個人私隱權", "别随便录影侵犯个人隐私权"),
    ("t2tw", False, "娘惹糉子", "娘惹粽子"),
    ("t2twp", False, "U盤裡的軟件", "隨身碟裡的軟體"),
    ("tw2t", False, "針核裡才吃著灶煙", "針核裡才吃著灶煙"),
    ("tw2tp", False, "隨身碟", "U盤"),
    ("t2hk", False, "說話", "説話"),
    ("t2hkp", False, "別隨便錄影侵犯個人隱私權", "別隨便錄影侵犯個人私隱權"),
    ("hk2t", False, "針核裡才吃著灶煙", "針核裡才吃著灶煙"),
    ("hk2tp", False, "別隨便錄影侵犯個人私隱權", "別隨便錄影侵犯個人隱私權"),
    ("t2jp", False, "傳統漢字舊字體", "伝統漢字旧字体"),
    ("jp2t", False, "伝統漢字旧字体", "傳統漢字舊字體"),
]

#: (input, expected) for ZhoCheck
ZHO_CHECK_GOLDENS = [
    ("这是简体字。", 2),
    ("这是一个简体中文文本。", 2),
    ("這是繁體字。", 1),
    ("這是一個繁體中文文本。", 1),
    ("汉漢", 1),
    ("English 😀 123!", 0),
    ("This is some English text.", 0),
    ("", 0),
]
