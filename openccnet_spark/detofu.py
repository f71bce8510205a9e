"""DeTofu custom fallback maps (O13 full surface).

Reference: ``OpenccNetLib/DeTofu.cs`` — ``DeTofuMap`` (``:477-610``),
``ParseEntries`` (``:224-256``), ``TryParseLevel`` (``:128-195``), and the
``Opencc.DeTofuWithCustomFile/Pairs`` wrappers (``Opencc.cs:2373-2451``).

Semantics preserved:

* ``builtin(level)`` copies the bundle's built-in table for that threshold
  (an entry is active iff its extension level >= the selected level), so
  customizations on one map never leak into another (clone isolation,
  reference tests ``OpenccNetTests.cs:364-496``).
* Custom FILE entries carry an extension column (compact ``B``-``I``,
  legacy ``ExtB``-``ExtI``, dashed ``ext-b``, or ``all``; case-insensitive)
  and are applied only when eligible for the map's threshold; later
  mappings win.
* Custom PAIRS carry no extension column and are ALWAYS added. Only the
  first Unicode scalar of each key/value is used; empty entries ignored.
* Unmapped characters are preserved unchanged — never replaced with ``?``
  or placeholders.
"""

from __future__ import annotations

from pathlib import Path

#: textual level name -> threshold int (reference TryParseLevel,
#: DeTofu.cs:128-195). "all" == ExtB == everything.
_LEVEL_NAMES: dict[str, int] = {"all": 0}
for _i, _letter in enumerate("bcdefghi"):
    _LEVEL_NAMES[_letter] = _i
    _LEVEL_NAMES[f"ext{_letter}"] = _i
    _LEVEL_NAMES[f"ext-{_letter}"] = _i


def parse_level(value: str) -> int:
    """Parse ``all``/``b``/``ExtB``/``ext-b`` etc. into a 0..7 threshold."""
    key = (value or "").strip().lower()
    if key not in _LEVEL_NAMES:
        raise ValueError(
            "Supported deTofu levels: all, ext-b, ext-c, ext-d, ext-e, "
            f"ext-f, ext-g, ext-h, ext-i (got {value!r})"
        )
    return _LEVEL_NAMES[key]


def parse_entries(text: str) -> list[tuple[int, str, int]]:
    """Parse ``tofu<TAB>fallback<TAB>extension`` lines into
    ``(tofu_codepoint, fallback_char, ext_level)`` entries.

    Blank lines / ``#`` comments skipped; malformed lines skipped (reference
    ParseEntries, DeTofu.cs:224-256). Only the first Unicode scalar of the
    tofu and fallback fields is used (Python chars ARE scalars, so that is
    ``field[0]``).
    """
    entries: list[tuple[int, str, int]] = []
    for raw in (text or "").splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) < 3:
            continue
        tofu_s, fallback_s = parts[0].strip(), parts[1].strip()
        if not tofu_s or not fallback_s:
            continue
        try:
            ext = parse_level(parts[2])
        except ValueError:
            continue
        entries.append((ord(tofu_s[0]), fallback_s[0], ext))
    return entries


class DeTofuMap:
    """A reusable, customizable fallback map (reference DeTofuMap)."""

    def __init__(self, level: int, table: dict[int, str]):
        self.level = level
        self._table = table

    @classmethod
    def builtin(cls, bundle, level: int = 0) -> "DeTofuMap":
        """Fresh map seeded with the bundle's built-in entries at/above
        ``level``. The bundle's cached table is COPIED — custom entries on
        this map never mutate the shared bundle (clone isolation)."""
        return cls(level, dict(bundle.detofu_table(level)))

    def with_custom_file(self, path: str | Path) -> "DeTofuMap":
        with open(path, encoding="utf-8") as f:
            return self.with_custom_text(f.read())

    def with_custom_text(self, text: str) -> "DeTofuMap":
        """Apply file-format entries; only those whose extension level
        satisfies this map's threshold; later entries win."""
        for tofu, fallback, ext in parse_entries(text):
            if ext >= self.level:
                self._table[tofu] = fallback
        return self

    def with_custom_pairs(self, pairs) -> "DeTofuMap":
        """Apply direct pairs — no extension column, so always added.
        ``pairs``: mapping or iterable of (tofu, fallback) strings."""
        items = pairs.items() if hasattr(pairs, "items") else pairs
        for key, value in items:
            if key and value:
                self._table[ord(key[0])] = value[0]
        return self

    def convert(self, text: str) -> str:
        """Replace mapped scalars; everything unmapped preserved."""
        if not text or not self._table:
            return text or ""
        return text.translate(self._table)


__all__ = ["DeTofuMap", "parse_entries", "parse_level"]
