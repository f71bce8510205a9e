#!/usr/bin/env python
"""Compile raw OpenCC lexicon text files into a single gzipped-JSON bundle.

This is the analog of the reference's ``dictgen`` CLI
(``OpenccNet/DictgenCommand.cs:101-189``): parse the 21 active dictionary
slots plus the CJK-compatibility-ideograph and DeTofu tables, and persist
one artifact (``openccnet_spark/data/dictionary_bundle.json.gz``) that the
Spark engine loads on the driver and ships to executors as a broadcast.

Parser contract (reference ``OpenccNetLib/DictionaryLib.cs:1232-1325``):
  * UTF-8 lines, trimmed; blank lines and ``#`` comments skipped
  * split on the FIRST tab: ``key<TAB>value[ space-separated aliases]``
  * the value is the text before the first space (aliases dropped)
  * lines with empty key or value skipped
  * duplicate key -> last one wins

The bundle stores raw ``{key: value}`` maps only. All length/starter
metadata is recomputed at load time in *code points* (Python's native
string unit), never copied from the reference's UTF-16-unit numbers
(see SURVEY.md §7 "What's hard").

The lexicon .txt files are Apache-2.0 data (OpenCC project lexicons,
redistributed by the reference under ``OpenccNetLib/dicts/LICENSE.txt``).

Usage:
    python tools/dictgen.py [--src DIR] [--out FILE]
"""

from __future__ import annotations

import argparse
import gzip
import json
import sys
from pathlib import Path

# file name -> slot name; the 21 active slots
# (reference DictionaryLib.cs:807-831, DictSlotExtensions.cs:20-43)
SLOT_FILES = {
    "st_characters": "STCharacters.txt",
    "st_phrases": "STPhrases.txt",
    "st_punctuations": "STPunctuations.txt",
    "ts_characters": "TSCharacters.txt",
    "ts_phrases": "TSPhrases.txt",
    "ts_punctuations": "TSPunctuations.txt",
    "tw_phrases": "TWPhrases.txt",
    "tw_phrases_rev": "TWPhrasesRev.txt",
    "tw_variants": "TWVariants.txt",
    "tw_variants_phrases": "TWVariantsPhrases.txt",
    "tw_variants_rev": "TWVariantsRev.txt",
    "tw_variants_rev_phrases": "TWVariantsRevPhrases.txt",
    "hk_phrases": "HKPhrases.txt",
    "hk_phrases_rev": "HKPhrasesRev.txt",
    "hk_variants": "HKVariants.txt",
    "hk_variants_phrases": "HKVariantsPhrases.txt",
    "hk_variants_rev": "HKVariantsRev.txt",
    "hk_variants_rev_phrases": "HKVariantsRevPhrases.txt",
    "jps_characters": "JPShinjitaiCharacters.txt",
    "jps_characters_rev": "JPShinjitaiCharactersRev.txt",
    "jps_phrases": "JPShinjitaiPhrases.txt",
}

# Delimiter set (reference Opencc.cs:705-706). Used here only for the
# barrier-equivalence audit: if no dictionary key contains a delimiter,
# whole-string greedy matching is byte-identical to the reference's
# split-at-delimiters-then-convert strategy for inputs of any size.
FULL_DELIMITERS = (
    " \t\n\r!\"#$%&'()*+,-./:;<=>?@[\\]^_{}|~＝、。﹁﹂—－（）《》〈〉？！…／＼"
    "︒︑︔︓︿﹀︹︺︙︐［﹇］﹈︕︖︰︳︴︽︾︵︶｛︷｝︸﹃﹄【︻】︼　～．，；："
)


def parse_dict_lines(lines) -> dict[str, str]:
    """Parse one lexicon file per the reference contract (single source of
    truth: openccnet_spark.dictionary.parse_dict_text)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from openccnet_spark.dictionary import parse_dict_text

    return parse_dict_text("\n".join(lines) if isinstance(lines, list) else "".join(lines))


def parse_compat_ideographs(lines) -> dict[str, str]:
    """``CJK_Compatibility_Ideographs.txt``: compat_char<TAB>normalized."""
    return parse_dict_lines(lines)


def parse_detofu(lines) -> dict[str, list]:
    """``TSCharactersTofu.txt``: tofu_char<TAB>fallback<TAB>ext level.

    Reference format per ``Opencc.cs:2373-2378``. Returns
    ``{char: [fallback, ext_level_int]}`` with ExtB=0 .. ExtI=7.
    """
    levels = {f"Ext{c}": i for i, c in enumerate("BCDEFGHI")}
    levels.update({c: i for i, c in enumerate("BCDEFGHI")})  # compact form
    out: dict[str, list] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) < 3:
            continue
        char, fallback, ext = parts[0], parts[1], parts[2].strip()
        if not char or not fallback or ext not in levels:
            continue
        out[char] = [fallback, levels[ext]]
    return out


def build_bundle(src: Path) -> dict:
    slots = {}
    for slot, fname in SLOT_FILES.items():
        with open(src / fname, encoding="utf-8") as f:
            slots[slot] = parse_dict_lines(f)

    with open(src / "CJK_Compatibility_Ideographs.txt", encoding="utf-8") as f:
        compat = parse_compat_ideographs(f)
    with open(src / "TSCharactersTofu.txt", encoding="utf-8") as f:
        detofu = parse_detofu(f)

    # Barrier-equivalence audit (see FULL_DELIMITERS docstring).
    delims = set(FULL_DELIMITERS)
    offenders = []
    for slot, table in slots.items():
        for k in table:
            if len(k) > 1 and any(c in delims for c in k):
                offenders.append((slot, k))
    meta = {
        "format": 1,
        "source": "OpenCC lexicons (Apache-2.0), via laisuk/OpenccNet dicts/",
        "delimiter_free_keys": not offenders,
        "slot_sizes": {s: len(t) for s, t in slots.items()},
    }
    if offenders:
        meta["delimiter_offenders"] = [f"{s}:{k}" for s, k in offenders[:20]]
    return {"meta": meta, "slots": slots, "compat_ideographs": compat, "detofu": detofu}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/OpenccNetLib/dicts")
    ap.add_argument(
        "--out",
        default=None,
        help="output file (default: the committed json.gz artifact for "
        "-f bundle, dictionary_maxlength.<ext> for reference formats)",
    )
    ap.add_argument(
        "-f", "--format", default="bundle",
        choices=("bundle", "zstd", "cbor", "json"),
        help="bundle = this engine's own json.gz artifact (default); "
        "zstd|cbor|json = the reference's serialized formats "
        "(DictgenCommand.cs -f flag values)",
    )
    ap.add_argument(
        "-u", "--unescape", action="store_true",
        help="json format only: write readable Unicode instead of \\uXXXX "
        "escapes (reference DictgenCommand --unescape)",
    )
    ap.add_argument(
        "-D", "--custom", action="append", default=[],
        help="custom dict spec slot:append|override:path (repeatable; "
        "reference DictgenCommand -D flag)",
    )
    args = ap.parse_args()
    if args.unescape and args.format != "json":
        ap.error("--unescape can only be used with --format json")

    bundle = build_bundle(Path(args.src))
    if args.custom:
        import sys as _sys

        _sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from openccnet_spark.dictionary import parse_custom_spec, parse_dict_text

        for spec in args.custom:
            slot, mode, path = parse_custom_spec(spec)
            with open(path, encoding="utf-8") as f:
                table = parse_dict_text(f.read())
            if mode == "override":
                bundle["slots"][slot] = table
            else:
                bundle["slots"][slot].update(table)  # late-comer wins
        bundle["meta"]["custom_specs"] = list(args.custom)
        bundle["meta"]["slot_sizes"] = {s: len(t) for s, t in bundle["slots"].items()}
    if args.format != "bundle":
        # reference-format writers (zstd default in the reference CLI;
        # our default stays the engine's own artifact)
        import sys as _sys

        _sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from openccnet_spark.reference_bundle import write_reference_bundle

        out = Path(args.out or f"dictionary_maxlength.{args.format}")
        write_reference_bundle(bundle["slots"], out, args.format, unescape=args.unescape)
        print(f"wrote {out} ({out.stat().st_size} bytes, reference {args.format} format)")
        return 0
    out = Path(
        args.out
        or Path(__file__).resolve().parent.parent / "openccnet_spark" / "data" / "dictionary_bundle.json.gz"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    payload = json.dumps(bundle, ensure_ascii=False, separators=(",", ":")).encode("utf-8")
    with open(out, "wb") as raw:
        # filename="" keeps the gzip FNAME header empty so the artifact is
        # byte-identical regardless of output path (mtime=0 likewise)
        with gzip.GzipFile("", "wb", 9, raw, mtime=0) as f:
            f.write(payload)
    m = bundle["meta"]
    print(f"wrote {out} ({out.stat().st_size} bytes)")
    print(f"slots: {sum(m['slot_sizes'].values())} entries across {len(m['slot_sizes'])} slots")
    print(f"compat_ideographs: {len(bundle['compat_ideographs'])}  detofu: {len(bundle['detofu'])}")
    print(f"delimiter_free_keys: {m['delimiter_free_keys']}")
    if not m["delimiter_free_keys"]:
        print("WARNING: some keys contain delimiters:", m.get("delimiter_offenders"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
