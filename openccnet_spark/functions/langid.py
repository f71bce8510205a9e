"""Self-contained fastText-style language identification.

The reference's only language detection is Chinese-script detection
(``ZhoCheck``, Opencc.cs:2184-2200); the north_rule extends the gate to a
general language ID. No pretrained binaries exist in this sandbox, so this
is a compact reimplementation of the fastText *idea* — character n-gram
features against per-language profiles — with profiles built at import time
from small embedded seed corpora. Fully deterministic.

Classification:
1. Han-script ratio >= HAN_RATIO -> ``zh`` (subsumes ZhoCheck's role; the
   Traditional/Simplified split stays with ``zho_check`` itself).
2. Otherwise score each language by weighted overlap between the text's
   hashed character-trigram multiset and the language profile; best wins.
3. No letters at all -> ``und``.
"""

from __future__ import annotations

import math
import re
import zlib
from collections import Counter
from functools import lru_cache

HAN_RATIO = 0.05

_HAN_RE = re.compile(
    "[㐀-䶿一-鿿豈-﫿"
    "\U00020000-\U0002ebef\U00030000-\U000323af]"
)


def han_count(text: str) -> int:
    return len(_HAN_RE.findall(text))


# Seed corpora: a few hundred chars of ordinary prose per language.
_SEEDS = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "this is a simple english sentence about data processing at scale "
        "we should filter the documents and keep only the good ones for "
        "training because quality matters more than quantity in the end "
        "please let me know what you think about this approach and whether "
        "it works for your use case with large tables of text "
        "tool output rows returned in ms from partition scan action search "
        "query spark shuffle partitions running the test suite now all "
        "checks passed without any errors send the report before friday"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et puis "
        "il s'enfuit c'est une phrase simple en français sur le traitement "
        "des données à grande échelle nous devrions filtrer les documents "
        "et ne garder que les bons pour l'entraînement parce que la qualité "
        "compte plus que la quantité s'il vous plaît dites moi ce que vous "
        "en pensez et si cela fonctionne pour votre cas d'usage"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und dann "
        "läuft er weg dies ist ein einfacher deutscher satz über die "
        "datenverarbeitung im großen maßstab wir sollten die dokumente "
        "filtern und nur die guten für das training behalten weil qualität "
        "wichtiger ist als quantität bitte lassen sie mich wissen was sie "
        "davon halten und ob es für ihren anwendungsfall funktioniert"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y luego se "
        "escapa esta es una frase sencilla en español sobre el procesamiento "
        "de datos a gran escala deberíamos filtrar los documentos y quedarnos "
        "solo con los buenos para el entrenamiento porque la calidad importa "
        "más que la cantidad por favor dime qué piensas de este enfoque y si "
        "funciona para tu caso de uso con tablas grandes de texto"
    ),
}

_LANGS = tuple(_SEEDS)
_HASH_BUCKETS = 4096


def _trigrams(text: str):
    t = f"  {text.lower()} ".encode("utf-8")
    for i in range(len(t) - 2):
        yield zlib.crc32(t[i : i + 3]) % _HASH_BUCKETS


def hash_trigram(g: str) -> int:
    return zlib.crc32(g.encode("utf-8")) % _HASH_BUCKETS


@lru_cache(maxsize=1)
def _profiles():
    """lang -> {bucket: log-frequency weight} built from the seed corpora."""
    out = {}
    for lang, seed in _SEEDS.items():
        counts = Counter(_trigrams(seed))
        total = sum(counts.values())
        out[lang] = {b: math.log1p(c / total * 1000) for b, c in counts.items()}
    return out


@lru_cache(maxsize=1)
def _combined_profile():
    """bucket -> (w_lang0, w_lang1, ...) — one dict probe per trigram."""
    profiles = _profiles()
    buckets = set().union(*profiles.values())
    return {
        b: tuple(profiles[lang].get(b, 0.0) for lang in _LANGS) for b in buckets
    }

SAMPLE_CHARS = 240


def detect_language(text: str) -> str:
    if not text or not text.strip():
        return "und"
    sample = text[:SAMPLE_CHARS]
    n = len(sample)
    if han_count(sample) >= HAN_RATIO * n:
        return "zh"
    if not any(c.isalpha() for c in sample):
        return "und"
    combined = _combined_profile()
    get = combined.get
    scores = [0.0] * len(_LANGS)
    for b in _trigrams(sample):
        w = get(b)
        if w is not None:
            for i, wi in enumerate(w):
                if wi:
                    scores[i] += wi
    best = max(range(len(_LANGS)), key=scores.__getitem__)
    return _LANGS[best] if scores[best] > 0 else "und"
