"""Conversion-plan table: config name -> ordered dictionary rounds.

Reproduces the reference's plan builder exactly
(``OpenccNetLib/ConversionPlanCache.cs:269-469`` BuildPlan and ``:566-681``
BuildDicts; table documented in SURVEY.md §2.5). A plan is 1-3 sequential
rounds; each round is an ordered tuple of slot names merged first-dict-wins
into one ``RoundIndex`` by ``DictionaryBundle.round_index``.

``(config, punct)`` -> plan resolution is memoized per bundle, the analog of
the reference's ``ConversionPlanCache`` (``:161-216``); shared sub-rounds
(e.g. the S2T union used by s2t/s2tw/s2twp/s2hk/s2hkp) are deduplicated by
the bundle's round cache keyed on the slot tuple (``:520-530``).
"""

from __future__ import annotations

from ..dictionary import DictionaryBundle

#: Canonical config names (reference Opencc.cs:146-165).
CONFIGS = (
    "s2t", "t2s", "s2tw", "tw2s", "s2twp", "tw2sp", "s2hk", "hk2s",
    "s2hkp", "hk2sp", "t2tw", "t2twp", "tw2t", "tw2tp", "t2hk", "t2hkp",
    "hk2t", "hk2tp", "t2jp", "jp2t",
)

_S2T = ("st_phrases", "st_characters")
_S2T_P = ("st_phrases", "st_characters", "st_punctuations")
_T2S = ("ts_phrases", "ts_characters")
_T2S_P = ("ts_phrases", "ts_characters", "ts_punctuations")
_TW_PAIR = ("tw_variants_phrases", "tw_variants")
_TW_REV_PAIR = ("tw_variants_rev_phrases", "tw_variants_rev")
_TW_TRIPLE = ("tw_phrases", "tw_variants_phrases", "tw_variants")
_TW_REV_TRIPLE = ("tw_phrases_rev", "tw_variants_rev_phrases", "tw_variants_rev")
_HK_PAIR = ("hk_variants_phrases", "hk_variants")
_HK_REV_PAIR = ("hk_variants_rev_phrases", "hk_variants_rev")
_HK_TRIPLE = ("hk_phrases", "hk_variants_phrases", "hk_variants")
_HK_REV_TRIPLE = ("hk_phrases_rev", "hk_variants_rev_phrases", "hk_variants_rev")
_ST_PUNCT_ONLY = ("st_punctuations",)


def plan_slots(config: str, punct: bool = False) -> tuple:
    """Rounds (as slot-name tuples) for a config, per ConversionPlanCache.cs.

    Unknown configs fall back to ``s2t`` — the reference records a parse
    error and proceeds with S2T (``Opencc.cs:650-695``); callers that want
    strictness should check ``config in CONFIGS`` first.
    """
    s2t = _S2T_P if punct else _S2T
    t2s = _T2S_P if punct else _T2S
    # T->T regional configs convert S-style punct in a second round only
    # when punctuation is requested (ConversionPlanCache.cs:343-355).
    tpunct = (_ST_PUNCT_ONLY,) if punct else ()
    table = {
        "s2t": (s2t,),
        "t2s": (t2s,),
        "s2tw": (s2t, _TW_PAIR),
        "tw2s": (_TW_REV_PAIR, t2s),
        "s2twp": (s2t, _TW_TRIPLE),
        "tw2sp": (_TW_REV_TRIPLE, t2s),
        "s2hk": (s2t, _HK_PAIR),
        "hk2s": (_HK_REV_PAIR, t2s),
        "s2hkp": (s2t, _HK_TRIPLE),
        "hk2sp": (_HK_REV_TRIPLE, t2s),
        "t2tw": (_TW_PAIR,) + tpunct,
        "t2twp": (_TW_TRIPLE,) + tpunct,
        "tw2t": (_TW_REV_PAIR,) + tpunct,
        "tw2tp": (_TW_REV_TRIPLE,) + tpunct,
        "t2hk": (_HK_PAIR,) + tpunct,
        "t2hkp": (_HK_TRIPLE,) + tpunct,
        "hk2t": (_HK_REV_PAIR,) + tpunct,
        "hk2tp": (_HK_REV_TRIPLE,) + tpunct,
        "t2jp": (("jps_characters_rev",),),
        "jp2t": (("jps_phrases", "jps_characters"),),
    }
    return table.get(config, table["s2t"])


class ConversionPlan:
    """Resolved plan: a list of ``RoundIndex`` applied sequentially (O3)."""

    __slots__ = ("config", "punct", "rounds")

    def __init__(self, bundle: DictionaryBundle, config: str, punct: bool = False):
        self.config = config
        self.punct = punct
        self.rounds = [bundle.round_index(slots) for slots in plan_slots(config, punct)]


def get_plan(bundle: DictionaryBundle, config: str, punct: bool = False) -> ConversionPlan:
    """Memoized plan resolution (per-bundle cache)."""
    cache = getattr(bundle, "_plan_cache", None)
    if cache is None:
        cache = {}
        bundle._plan_cache = cache
    key = (config, punct)
    plan = cache.get(key)
    if plan is None:
        plan = ConversionPlan(bundle, config, punct)
        cache[key] = plan
    return plan
