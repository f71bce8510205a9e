"""Self-contained fastText-style language identification.

The reference's only language detection is Chinese-script detection
(``ZhoCheck``, Opencc.cs:2184-2200); the north_rule extends the gate to a
general language ID. No pretrained binaries exist in this sandbox, so this
is a compact reimplementation of the fastText *idea* — character n-gram
features against per-language profiles — with profiles built at import time
from small embedded seed corpora. Fully deterministic.

Implementation is numpy-vectorized: byte trigrams are hashed with a
polynomial rolling hash over the UTF-8 bytes (vectorized shifts), and all
language scores come from one fancy-indexed sum over a (n_langs, buckets)
weight matrix.

Classification:
1. Han-script ratio >= HAN_RATIO -> ``zh`` (subsumes ZhoCheck's role; the
   Traditional/Simplified split stays with ``zho_check`` itself).
2. Otherwise best weighted trigram-profile score wins.
3. No letters at all -> ``und``.
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

import numpy as np

HAN_RATIO = 0.05
SAMPLE_CHARS = 240

_HAN_RE = re.compile(
    "[㐀-䶿一-鿿豈-﫿"
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


def _tri_hashes(text: str) -> np.ndarray:
    """Vectorized polynomial hash of every UTF-8 byte trigram."""
    b = np.frombuffer(f"  {text.lower()} ".encode("utf-8"), dtype=np.uint8).astype(
        np.int64
    )
    if b.size < 3:
        return np.empty(0, dtype=np.int64)
    return (b[:-2] * 961 + b[1:-1] * 31 + b[2:]) % _HASH_BUCKETS


def hash_trigram(g: str) -> int:
    h = _tri_hashes(g)
    return int(h[1]) if h.size > 2 else int(h[0])


@lru_cache(maxsize=1)
def _profile_matrix() -> np.ndarray:
    """(n_langs, buckets) log-frequency weights from the seed corpora."""
    w = np.zeros((len(_LANGS), _HASH_BUCKETS), dtype=np.float64)
    for i, lang in enumerate(_LANGS):
        counts = np.bincount(_tri_hashes(_SEEDS[lang]), minlength=_HASH_BUCKETS)
        total = counts.sum()
        nz = counts > 0
        w[i, nz] = np.log1p(counts[nz] / total * 1000)
    return w


_ALPHA_RE = re.compile(r"[^\W\d_]")  # any unicode letter


def detect_language(text: str) -> str:
    if not text or not text.strip():
        return "und"
    sample = text[:SAMPLE_CHARS]
    n = len(sample)
    if han_count(sample) >= HAN_RATIO * n:
        return "zh"
    if _ALPHA_RE.search(sample) is None:
        return "und"
    scores = _profile_matrix()[:, _tri_hashes(sample)].sum(axis=1)
    best = int(np.argmax(scores))
    return _LANGS[best] if scores[best] > 0 else "und"
