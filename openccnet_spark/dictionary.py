"""Dictionary bundle loading and per-round match indexes.

The reference models each lexicon as ``DictWithMaxLength`` (a hash map plus
length/starter metadata, ``OpenccNetLib/DictionaryLib.cs:20-139``) and unions
1-3 of them per conversion round behind a ``StarterUnion`` acceleration index
(``OpenccNetLib/StarterUnion.cs:11-25``).

The Spark engine collapses each round's dictionary list into ONE merged
``dict[str, str]``: the reference probes candidate lengths longest-first and,
within a length, the round's dictionaries in declaration order with the first
hit winning (``OpenccNetLib/Opencc.cs:1449-1475``) — so merging with
first-dict-wins-per-key precedence is semantically identical and roughly
halves Python-side probe cost. The ``StarterUnion`` equivalent is a per-first-
code-point ``(cap, min_len, length_bitmask)`` index, recomputed here in *code
points* (never copied from the reference's UTF-16-unit metadata; Python
strings are code-point sequences, see SURVEY.md §7).

All of this is driver-side; the resulting ``DictionaryBundle`` is broadcast
once per SparkSession and shared by every stage (SURVEY.md §4 P1-P3).
"""

from __future__ import annotations

import gzip
import json
import re
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

_BUNDLE_PATH = Path(__file__).resolve().parent / "data" / "dictionary_bundle.json.gz"

#: The 21 active dictionary slots (reference DictSlotExtensions.cs:20-43).
SLOTS = (
    "st_characters", "st_phrases", "st_punctuations",
    "ts_characters", "ts_phrases", "ts_punctuations",
    "tw_phrases", "tw_phrases_rev", "tw_variants", "tw_variants_phrases",
    "tw_variants_rev", "tw_variants_rev_phrases",
    "hk_phrases", "hk_phrases_rev", "hk_variants", "hk_variants_phrases",
    "hk_variants_rev", "hk_variants_rev_phrases",
    "jps_characters", "jps_characters_rev", "jps_phrases",
)


@dataclass(frozen=True)
class RoundIndex:
    """One conversion round: merged lookup table + starter acceleration.

    ``starters[first_char] = (cap, min_len, mask)`` where ``mask`` has bit L
    set iff some key of code-point length L starts with ``first_char``
    (reference StarterUnion.cs:196-305, recomputed in code points).
    ``starter_set`` backs an O(len) C-speed disjointness fast path for text
    containing no convertible characters at all.

    Two execution paths share this index:
    * the reference scalar matcher (``convert.run_round_scalar``) — the
      semantic ground truth, used by tests;
    * the compiled fast path: a trie regex over the multi-char keys
      (longest-match by construction) + ``str.translate`` for the 1-char
      keys — both C loops. Built lazily (regex compilation costs ~1 s for
      the 50k-phrase S2T round) and cached per process, i.e. once per Spark
      Python worker.
    """

    table: dict
    starters: dict
    starter_set: frozenset

    def convertible(self, text: str) -> bool:
        return not self.starter_set.isdisjoint(text)

    @property
    def fast(self):
        ri = self.__dict__.get("_fast")
        if ri is None:
            ri = _build_fast_round(self.table)
            object.__setattr__(self, "_fast", ri)
        return ri


def _char_class(chars) -> str:
    return "[" + "".join(re.escape(c) for c in sorted(chars)) + "]"


def _build_fast_round(table: dict):
    """(starter_re, singles_translate, multi_lengths) for the fast path.

    ``starter_re`` is a single character class of every first char of a
    multi-char key — CPython compiles a class to a bitmap, so scanning for
    candidate phrase positions is a C loop. ``multi_lengths[c]`` lists the
    candidate key lengths (descending) for probes at those positions.
    Everything between candidates has only 1-char keys -> str.translate.
    """
    singles = {}
    multi_lengths: dict = {}
    for k in table:
        if len(k) == 1:
            singles[ord(k)] = table[k]
        else:
            c = k[0]
            lens = multi_lengths.setdefault(c, set())
            lens.add(len(k))
    multi_lengths = {
        c: tuple(sorted(lens, reverse=True)) for c, lens in multi_lengths.items()
    }
    pattern = re.compile(_char_class(multi_lengths)) if multi_lengths else None
    return (pattern, singles, multi_lengths)


def build_round_index(dicts: list[dict]) -> RoundIndex:
    """Merge a round's dictionaries (first dict wins per key) and index it."""
    merged: dict[str, str] = {}
    for d in reversed(dicts):
        merged.update(d)  # earlier dicts overwrite later ones => first wins
    starters: dict[str, tuple[int, int, int]] = {}
    for key in merged:
        c = key[0]
        n = len(key)
        prev = starters.get(c)
        if prev is None:
            starters[c] = (n, n, 1 << n)
        else:
            cap, mn, mask = prev
            starters[c] = (max(cap, n), min(mn, n), mask | (1 << n))
    return RoundIndex(merged, starters, frozenset(starters))


class DictionaryBundle:
    """All 21 slots + compat-ideograph and DeTofu tables, parsed and typed.

    One instance is built on the driver and broadcast; ``RoundIndex`` objects
    are built lazily per (config, punct) plan and cached (the analog of the
    reference's ``ConversionPlanCache`` UnionKey cache,
    ``ConversionPlanCache.cs:57-147``).
    """

    def __init__(self, slots: dict, compat_ideographs: dict, detofu: dict, meta: dict | None = None):
        self.slots = slots
        self.meta = meta or {}
        # int code point -> replacement string, for str.translate (O12)
        self.compat_table = {ord(k): v for k, v in compat_ideographs.items() if len(k) == 1}
        # char -> (fallback, ext_level 0..7) (O13)
        self.detofu = {k: (v[0], int(v[1])) for k, v in detofu.items()}
        self._round_cache: dict = {}
        self._detofu_tables: dict = {}

    def __getitem__(self, slot: str) -> dict:
        return self.slots[slot]

    def round_index(self, slot_names: tuple) -> RoundIndex:
        ri = self._round_cache.get(slot_names)
        if ri is None:
            ri = build_round_index([self.slots[s] for s in slot_names])
            self._round_cache[slot_names] = ri
        return ri

    def detofu_table(self, level: int) -> dict:
        """``str.translate`` table for DeTofu at the given level.

        Level semantics (reference DeTofu.cs:23-64): selecting ExtX enables
        mappings tagged ExtX *and every later extension* — i.e. an entry is
        active iff its ext level >= selected level... inverted: ExtB(0)
        enables everything, ExtI(7) only ExtI entries.
        """
        t = self._detofu_tables.get(level)
        if t is None:
            t = {ord(k): v for k, (v, ext) in self.detofu.items() if ext >= level and len(k) == 1}
            self._detofu_tables[level] = t
        return t

    def with_custom(self, overrides: dict | None = None, appends: dict | None = None) -> "DictionaryBundle":
        """Custom-dictionary support (reference O15, DictionaryLib.cs:1399-1516).

        ``overrides[slot]`` replaces the slot wholesale; ``appends[slot]``
        merges on top with late-comer-wins. Returns a NEW bundle (the analog
        of the reference's atomic provider swap, DictionaryLib.cs:464-477);
        callers re-broadcast it.
        """
        slots = {s: dict(t) for s, t in self.slots.items()}
        for slot, table in (overrides or {}).items():
            if slot not in slots:
                raise KeyError(f"unknown dictionary slot: {slot}")
            slots[slot] = dict(table)
        for slot, table in (appends or {}).items():
            if slot not in slots:
                raise KeyError(f"unknown dictionary slot: {slot}")
            slots[slot].update(table)
        return DictionaryBundle(
            slots,
            {chr(k): v for k, v in self.compat_table.items()},
            {k: [v, e] for k, (v, e) in self.detofu.items()},
            dict(self.meta),
        )


@lru_cache(maxsize=1)
def load_bundle(path: str | None = None) -> DictionaryBundle:
    """Load the compiled bundle (built by ``tools/dictgen.py``).

    Reads via importlib.resources so it works when the package ships as a
    ``--py-files`` zip on executors (a plain open() of the module-relative
    path fails with NotADirectoryError inside a zipimport)."""
    if path:
        with gzip.open(Path(path), "rb") as f:
            raw = json.loads(f.read().decode("utf-8"))
    else:
        from importlib import resources

        blob = (
            resources.files("openccnet_spark")
            .joinpath("data/dictionary_bundle.json.gz")
            .read_bytes()
        )
        raw = json.loads(gzip.decompress(blob).decode("utf-8"))
    missing = [s for s in SLOTS if s not in raw["slots"]]
    if missing:
        raise ValueError(f"bundle missing slots: {missing}")
    return DictionaryBundle(raw["slots"], raw["compat_ideographs"], raw["detofu"], raw.get("meta"))


def parse_custom_spec(spec: str) -> tuple:
    """Parse a ``<slot>:<append|override>:<path>`` custom-dictionary spec
    (reference ``CustomDictSpec.cs:33-140`` / dictgen ``-D`` flag).

    Returns (slot, mode, path). Path may contain ':' (split limited)."""
    parts = spec.split(":", 2)
    if len(parts) != 3:
        raise ValueError(f"bad custom dict spec (want slot:mode:path): {spec!r}")
    slot, mode, path = parts[0].strip(), parts[1].strip().lower(), parts[2].strip()
    if slot not in SLOTS:
        raise ValueError(f"unknown dictionary slot: {slot!r}")
    if mode not in ("append", "override"):
        raise ValueError(f"mode must be append|override: {mode!r}")
    if not path:
        raise ValueError(f"empty path in spec: {spec!r}")
    return slot, mode, path


def load_custom_specs(specs) -> list:
    """Read spec files into the [(slot, mode, dict_text), ...] form used by
    ``functions.convert_udf(custom=...)`` (text is shipped in the closure so
    executors never need driver-local paths)."""
    out = []
    for spec in specs:
        slot, mode, path = parse_custom_spec(spec)
        with open(path, encoding="utf-8") as f:
            out.append((slot, mode, f.read()))
    return out


def parse_dict_text(text: str) -> dict:
    """Parse lexicon text per the reference contract (DictionaryLib.cs:1232-1325).

    Exposed for custom-dictionary files (O15) and tests: ``key<TAB>value
    [ aliases...]``; first value token wins; ``#``/blank skipped; duplicate
    key -> last wins.
    """
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        tab = line.find("\t")
        if tab < 0:
            continue
        key = line[:tab]
        rest = line[tab + 1 :]
        sp = rest.find(" ")
        value = rest if sp < 0 else rest[:sp]
        if key and value:
            out[key] = value
    return out
