"""Deterministic synthetic transcripts table (BASELINE input_hint shape).

``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` — multi-turn conversation transcripts with
skewed conversation lengths (90% of conversations 2-10 turns, 10% 50-200
turns, FIXTURES.md §1) and text drawn from a fixed pool that exercises
every pipeline rule: Simplified/Traditional conversion triggers, PII,
repetition, symbol density, gibberish, too-short/too-long.

Everything is **pure integer arithmetic on the row index** — no RNG state —
so the exact same table can be produced by three independent engines:

* ``spark_transcripts``  — Spark-native (``spark.range`` + column exprs;
  no driver-side loops, scales to any row count)
* ``transcripts_sql``    — a DuckDB SQL string (used by the driver's oracle
  to re-derive the input AND the expected pipeline labels)
* ``py_rows``            — plain Python rows (unit tests)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z

#: (base_text, repeat_count). Entry index == pool_idx. Do not reorder —
#: oracle literals embed positions.
POOL: list[tuple[str, int]] = [
    # fluent Simplified (keep; s2t/t2s conversion triggers)
    ("数据质量对大规模语言模型训练非常重要，我们需要过滤掉低质量的文本。", 1),
    ("今天天气很好，我们一起去公园散步吧。", 1),
    ("他说这个软件的功能设计得很合理，用户体验也不错。", 1),
    ("科学技术是第一生产力，经济发展需要创新驱动。", 1),
    ("这本书的内容很有意思，作者用简单的语言解释了复杂的概念。", 1),
    ("互联网改变了人们的生活方式，信息传播的速度越来越快。", 1),
    ("俨骖𬴂于上路，访风景于崇阿；临帝子之长洲，得天人之旧馆。", 1),
    ("你好“世界”！“龙马精神”是一个成语。", 1),
    # fluent Traditional (keep; t2s conversion changes these)
    ("數據質量對大規模語言模型訓練非常重要，我們需要過濾掉低質量的文本。", 1),
    ("他說這個軟體的功能設計得很合理，使用者體驗也不錯。", 1),
    ("別隨便錄影侵犯個人私隱權，這是基本的尊重。", 1),
    ("互聯網改變了人們的生活方式，資訊傳播的速度越來越快。", 1),
    # mixed CJK + ASCII
    ("请运行 spark submit 提交任务，然后查看 log 输出。", 1),
    ("The model said 你好世界 and then continued in English.", 1),
    # pure English (keep)
    ("Please summarize the document and list the key findings for review.", 1),
    ("The quick brown fox jumps over the lazy dog near the river bank.", 1),
    ("Let me check the database schema and get back to you shortly.", 1),
    ("Running the test suite now, all checks passed without any errors.", 1),
    # too_short triggers
    ("", 1),
    (" ", 1),
    ("好", 1),
    ("你好", 1),
    ("ok", 1),
    # repetitive (word-level): 2 unique words x 40 -> uniq_ratio 0.025
    ("spark table ", 40),
    ("check the log and retry ", 12),  # 60 words, 5 unique -> repetitive
    # symbol dense
    ("!!!###$$$%%%^^^&&&***", 8),
    # PII (keep, scrubbed)
    ("联系我 user@example.com 或 +86 138 0013 8000，谢谢。", 1),
    ("我的身份证号是 110101199003078515，请帮我登记一下。", 1),
    ("Send the report to alice.wang@corp.example.org before Friday please.", 1),
    # gibberish Chinese (shuffled chars -> high_ppl)
    ("鞋镜数吃跑杯山快飞纸喝跳慢车书水牛词桌绿红门高楼矮灯冷热风雪雷电字马", 1),
    # too_long: 32 chars x 200 = 6400 > MAX_CHARS
    ("这是一段会被重复很多次用来触发长度上限规则的测试文本内容。", 200),
    # tool-ish / agent turns
    ("{\"action\": \"search\", \"query\": \"spark shuffle partitions\"}", 1),
    ("Tool output: 3 rows returned in 42 ms from partition scan.", 1),
]

POOL_N = len(POOL)
_ROLES = ("user", "assistant", "tool")
_TOOLS = ("search", "python", "browser")

# turn-count mixing constants (see module docstring; plain integer arith)
_MIX_A = 2654435761
_MIX_MOD = 2147483648
_TEXT_A = 1000003
_TEXT_B = 7919


def n_conv_for_sf(sf_dir: str) -> int:
    """Scale factor -> conversation count (~18 turns/conv on average).

    sf0.001 -> 300 convs (~5k turns), sf0.01 -> 3k (~54k), sf0.1 -> 30k (~540k).
    """
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return max(int(sf * 300_000), 10)


def pool_text(idx: int) -> str:
    base, reps = POOL[idx]
    return base * reps


def _turns_for_conv(c: int) -> int:
    m = (c * _MIX_A) % _MIX_MOD
    return 50 + m % 151 if c % 10 == 0 else 2 + m % 9


def _pool_idx(c: int, t: int) -> int:
    return (c * _TEXT_A + t * _TEXT_B) % POOL_N


def spark_transcripts(spark: SparkSession, n_conv: int, partitions: int | None = None) -> DataFrame:
    """Spark-native generation: spark.range -> sequence/explode -> column math.

    No data leaves the executors; generation parallelism = range partitions.
    """
    conv = spark.range(0, n_conv, 1, partitions or spark.sparkContext.defaultParallelism)
    c = F.col("id")
    m = (c * _MIX_A) % _MIX_MOD
    conv = conv.withColumn(
        "turns",
        F.when(c % 10 == 0, 50 + m % 151).otherwise(2 + m % 9),
    )
    df = conv.select(
        c.alias("c"),
        F.explode(F.sequence(F.lit(0), (F.col("turns") - 1).cast("int"))).alias("turn_idx"),
    )
    c = F.col("c")
    t = F.col("turn_idx")
    texts = F.array(*[F.lit(b) for b, _ in POOL])
    reps = F.array(*[F.lit(r) for _, r in POOL])
    pool_idx = (c * _TEXT_A + t * _TEXT_B) % POOL_N
    role = F.element_at(F.array(*[F.lit(r) for r in _ROLES]), (t % 3 + 1).cast("int"))
    return df.select(
        F.format_string("conv%08d", c).alias("conv_id"),
        t.cast("int").alias("turn_idx"),
        role.alias("role"),
        F.repeat(
            F.element_at(texts, (pool_idx + 1).cast("int")),
            F.element_at(reps, (pool_idx + 1).cast("int")),
        ).alias("text"),
        F.when(
            role == "tool",
            F.element_at(F.array(*[F.lit(x) for x in _TOOLS]), ((c + t) % 3 + 1).cast("int")),
        ).alias("tool"),
        F.timestamp_seconds(F.lit(EPOCH_2026) + c * 211 + t * 7).alias("ts"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def transcripts_sql(n_conv: int) -> str:
    """DuckDB SQL producing the identical table (same arithmetic)."""
    texts = "[" + ", ".join(_sql_quote(b) for b, _ in POOL) + "]"
    reps = "[" + ", ".join(str(r) for _, r in POOL) + "]"
    roles = "['user', 'assistant', 'tool']"
    tools = "['search', 'python', 'browser']"
    return f"""
WITH conv AS (
    SELECT c,
           CASE WHEN c % 10 = 0 THEN 50 + (c * {_MIX_A}) % {_MIX_MOD} % 151
                ELSE 2 + (c * {_MIX_A}) % {_MIX_MOD} % 9 END AS turns
    FROM (SELECT range AS c FROM range({n_conv}))
), turn AS (
    SELECT c, unnest(generate_series(0, (turns - 1)::INT)) AS turn_idx FROM conv
)
SELECT printf('conv%08d', c) AS conv_id,
       turn_idx::INT AS turn_idx,
       ({roles})[turn_idx % 3 + 1] AS role,
       repeat(({texts})[(c * {_TEXT_A} + turn_idx * {_TEXT_B}) % {POOL_N} + 1],
              ({reps})[(c * {_TEXT_A} + turn_idx * {_TEXT_B}) % {POOL_N} + 1]) AS text,
       CASE WHEN turn_idx % 3 + 1 = 3
            THEN ({tools})[(c + turn_idx) % 3 + 1] END AS tool,
       to_timestamp({EPOCH_2026} + c * 211 + turn_idx * 7) AS ts,
       (c * {_TEXT_A} + turn_idx * {_TEXT_B}) % {POOL_N} AS pool_idx
FROM turn
"""


def py_rows(n_conv: int):
    """Pure-Python rows (conv_id, turn_idx, role, text, tool, ts_epoch, pool_idx)."""
    for c in range(n_conv):
        for t in range(_turns_for_conv(c)):
            role = _ROLES[t % 3]
            yield (
                f"conv{c:08d}",
                t,
                role,
                pool_text(_pool_idx(c, t)),
                _TOOLS[(c + t) % 3] if role == "tool" else None,
                EPOCH_2026 + c * 211 + t * 7,
                _pool_idx(c, t),
            )
