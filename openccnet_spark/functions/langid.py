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
1. Kana ratio >= SCRIPT_RATIO -> ``ja`` (kanji-heavy Japanese still carries
   kana, so this must run BEFORE the Han rule); Hangul -> ``ko``.
2. Han-script ratio >= SCRIPT_RATIO -> ``zh`` (subsumes ZhoCheck's role;
   the Traditional/Simplified split stays with ``zho_check`` itself).
3. Otherwise best weighted trigram-profile score wins (en/fr/de/es + the
   ja/ko seeds for romanization-free mixed text).
4. No letters at all -> ``und``.
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

import numpy as np

HAN_RATIO = 0.05
SCRIPT_RATIO = HAN_RATIO
SAMPLE_CHARS = 240

_HAN_RE = re.compile(
    "[㐀-䶿一-鿿豈-﫿"
    "\U00020000-\U0002ebef\U00030000-\U000323af]"
)
#: Hiragana + Katakana (incl. phonetic extensions + halfwidth katakana)
_KANA_RE = re.compile("[぀-ヿㇰ-ㇿｦ-ﾟ]")
#: Hangul syllables, jamo, and compatibility jamo
_HANGUL_RE = re.compile("[가-힯ᄀ-ᇿ㄰-㆏]")


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
    "ja": (
        "すばやい茶色の狐はのろまな犬を飛び越えてそれから逃げていきました "
        "これは大規模なデータ処理についての簡単な日本語の文章です "
        "学習のためには文書をフィルタリングして良いものだけを残すべきです "
        "なぜなら量よりも質のほうが大切だからです "
        "この方法についてどう思うか教えてください "
        "大きなテキストの表でうまくいくかどうかも知りたいです"
    ),
    "ko": (
        "빠른 갈색 여우가 게으른 개를 뛰어넘고 나서 도망갔습니다 "
        "이것은 대규모 데이터 처리에 관한 간단한 한국어 문장입니다 "
        "학습을 위해서는 문서를 필터링하고 좋은 것만 남겨야 합니다 "
        "왜냐하면 양보다 질이 더 중요하기 때문입니다 "
        "이 접근 방식에 대해 어떻게 생각하는지 알려 주세요 "
        "큰 텍스트 테이블에서도 잘 작동하는지 궁금합니다"
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
    # ASCII fast path (exact): kana/hangul/han counts are 0 for pure-ASCII
    # text and the thresholds are > 0 (n >= 1 here), so all three script
    # rules are decided false without running their regex scans — a large
    # share of web/transcript turns take this branch (isascii is a C scan)
    if not sample.isascii():
        # kana first: kanji-heavy Japanese would otherwise trip the Han rule
        if len(_KANA_RE.findall(sample)) >= SCRIPT_RATIO * n:
            return "ja"
        if len(_HANGUL_RE.findall(sample)) >= SCRIPT_RATIO * n:
            return "ko"
        if han_count(sample) >= HAN_RATIO * n:
            return "zh"
    if _ALPHA_RE.search(sample) is None:
        return "und"
    scores = _profile_matrix()[:, _tri_hashes(sample)].sum(axis=1)
    best = int(np.argmax(scores))
    return _LANGS[best] if scores[best] > 0 else "und"
