"""Conversation-level curation operators for chat-transcript corpora.

A transcript pipeline's unit of retention is the CONVERSATION, not the
turn: an SFT sample with half its turns gutted is worthless, and chat
training serializes whole conversations. These operators lift the
repo's turn-level signals (quality_filter keep/drop) to conversation
decisions and prepare kept conversations for training:

- ``fold_tool_turns``     — reassign tool turns to the assistant and
  run-length-merge consecutive same-role turns (the classic ShareGPT
  cleanup); re-indexes turns.
- ``conversation_gate``   — aggregate per-turn keep into a per-conv
  keep/drop with integer-exact kept fraction and reason precedence.
- ``conversation_fingerprints`` — exact conversation dedup: an ordered,
  length-prefixed serialization of (role, text) per conversation is
  hashed with the repo's cross-engine 60-bit family; smallest conv_id
  per fingerprint survives.
- ``render_chat_template`` — deterministic ``<|role|>``-tagged
  serialization of a conversation into one training string (feeds
  ``operators/packing.py``).

Scale shape: each operator shuffles the text payload ONCE on conv_id
(``groupBy(conv_id).agg(collect_list(...))``), then works JVM-side on
the collected array. Per-group state is conversation-bounded — the
input contract caps conversations at ~200 turns (FIXTURES.md §1) — so
the arrays are bounded regardless of corpus size; everything after the
collect is scalar-per-conversation (fingerprints, gate counters) and
exchanges only scalars. ``collect_list`` order is partition-arbitrary,
so every ordered use goes through ``array_sort`` on a struct whose
LEADING field is turn_idx (struct sort = lexicographic on fields).

Reference scope note: the reference engine (laisuk/OpenccNet) converts
text and has no conversation model; these operators are part of the
LLM-training-pipeline surface of the brief, oracle-checked against
window/string_agg SQL formulations of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import hash60_expr

#: unit separator — joins turn serializations inside a fingerprint. The
#: serialization is additionally length-prefixed (see below), so a text
#: containing the separator cannot alias a different turn split.
FP_SEP = "\x1e"


def _sorted_turns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One shuffle on conv_id -> per-conv array of turn structs in
    turn_idx order (turn_idx is the struct's leading field)."""
    return df.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", *[c for c in cols]))
        ).alias("ts")
    )


# --------------------------------------------------------------------------
# fold_tool_turns
# --------------------------------------------------------------------------


def fold_tool_turns(
    df: DataFrame, fold_role: str = "tool", into: str = "assistant", sep: str = "\n"
) -> DataFrame:
    """Fold ``fold_role`` turns into ``into`` and merge consecutive
    same-role runs; turns re-index densely from 0.

    The merge is a single JVM ``aggregate`` fold over the per-conv
    sorted array (conversation-bounded, <= ~200 elements), so the text
    payload is shuffled exactly once. The last accumulator element is
    extended in place via slice+concat — O(runs) copies of a bounded
    array. Output: conv_id, turn_idx, role, text, n_src_turns.
    """
    remapped = df.withColumn(
        "role",
        F.when(F.col("role") == fold_role, F.lit(into)).otherwise(F.col("role")),
    )
    grouped = _sorted_turns(remapped, ["role", "text"])
    sep_sql = sep.replace("\\", "\\\\").replace("'", "\\'").replace("\n", "\\n")
    merged = F.expr(
        f"""
        aggregate(
          ts,
          cast(array() as array<struct<role:string,text:string,n_src:int>>),
          (acc, x) -> CASE
            WHEN size(acc) > 0 AND element_at(acc, -1).role = x.role THEN
              concat(
                slice(acc, 1, size(acc) - 1),
                array(named_struct(
                  'role', x.role,
                  'text', concat(element_at(acc, -1).text, '{sep_sql}', x.text),
                  'n_src', element_at(acc, -1).n_src + 1)))
            ELSE
              concat(acc, array(named_struct(
                'role', x.role, 'text', x.text, 'n_src', 1)))
          END)
        """
    )
    return (
        grouped.select("conv_id", F.posexplode(merged).alias("turn_idx", "m"))
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.col("m.role").alias("role"),
            F.col("m.text").alias("text"),
            F.col("m.n_src").alias("n_src_turns"),
        )
    )


def sql_fold_tool_turns(
    from_clause: str,
    fold_role: str = "tool",
    into: str = "assistant",
    sep: str = "\n",
) -> str:
    """DuckDB oracle in the CLASSIC formulation — lag-window run breaks,
    run-id cumulative sum, string_agg ORDER BY — so the Spark fold is
    checked against an independent shape of the same semantics."""
    sep_sql = sep.replace("'", "''").replace(chr(10), "' || chr(10) || '")
    return f"""
WITH r AS (
  SELECT conv_id, turn_idx,
         CASE WHEN role = '{fold_role}' THEN '{into}' ELSE role END AS role,
         text
  FROM {from_clause}
), b AS (
  SELECT *, CASE WHEN lag(role) OVER w = role THEN 0 ELSE 1 END AS brk
  FROM r WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS seg
  FROM b
)
SELECT conv_id, (seg - 1)::INT AS turn_idx, role,
       string_agg(text, '{sep_sql}' ORDER BY turn_idx) AS text,
       count(*)::INT AS n_src_turns
FROM s GROUP BY conv_id, seg, role
"""


# --------------------------------------------------------------------------
# conversation_gate
# --------------------------------------------------------------------------


def conversation_gate(
    turn_labels: DataFrame,
    min_kept_milli: int = 600,
    min_assistant_kept: int = 1,
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-conversation keep decision from per-turn ``keep`` labels.

    Pure groupBy aggregates (map-side combine; the exchange carries four
    counters per conversation). The kept fraction is integer-exact
    (``n_kept * 1000 DIV n_turns``) so the decision is reproducible
    cross-engine. Reason precedence: no kept assistant turn beats a low
    kept fraction (a conversation with no assistant content is useless
    regardless of how clean its user turns are).
    """
    agg = turn_labels.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(
            (F.col("keep") & (F.col("role") == assistant_role)).cast("long")
        ).alias("n_assistant_kept"),
    )
    kept_milli = F.expr("n_kept * 1000 DIV n_turns")
    reason = (
        F.when(F.col("n_assistant_kept") < min_assistant_kept, "no_assistant")
        .when(kept_milli < min_kept_milli, "low_kept_fraction")
        .otherwise("none")
    )
    return agg.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_assistant_kept").cast("long").alias("n_assistant_kept"),
        kept_milli.cast("long").alias("kept_milli"),
        (reason == "none").alias("conv_keep"),
        reason.alias("drop_reason"),
    )


# --------------------------------------------------------------------------
# conversation fingerprints / exact dedup
# --------------------------------------------------------------------------


def conversation_fingerprints(df: DataFrame) -> DataFrame:
    """(conv_id, fingerprint, n_turns, is_canonical): exact conversation
    identity over the ORDERED (role, text) sequence.

    The text payload is shuffled once into the per-conv sorted array;
    after hashing, everything is scalar-per-conversation — the
    fingerprint groupBy and the min-conv_id election exchange ~24 bytes
    per conversation no matter how large the turns were.
    """
    grouped = _sorted_turns(df, ["role", "text"])
    # role:len(text):text — the length prefix means a text containing
    # FP_SEP or ':' cannot re-split into a different turn sequence with
    # the same bytes. F.concat (not concat_ws) so a null text poisons
    # the serialization exactly as SQL || does.
    ser = F.array_join(
        F.transform(
            F.col("ts"),
            lambda s: F.concat(
                s.role, F.lit(":"), F.length(s.text).cast("string"), F.lit(":"), s.text
            ),
        ),
        FP_SEP,
    )
    per_conv = grouped.select(
        "conv_id",
        ser.alias("ser"),
        F.size("ts").cast("long").alias("n_turns"),
    ).select(
        "conv_id",
        hash60_expr("ser").alias("fingerprint"),
        "n_turns",
    )
    canon = per_conv.groupBy("fingerprint").agg(
        F.min("conv_id").alias("canonical_conv_id")
    )
    return per_conv.join(canon, "fingerprint").select(
        "conv_id",
        "fingerprint",
        "n_turns",
        (F.col("conv_id") == F.col("canonical_conv_id")).alias("is_canonical"),
    )


def sql_conversation_fingerprints(from_clause: str) -> str:
    """DuckDB oracle: identical serialization via string_agg ORDER BY."""
    return f"""
WITH ser AS (
  SELECT conv_id,
         string_agg(role || ':' || length(text) || ':' || text,
                    chr(30) ORDER BY turn_idx) AS s,
         count(*)::BIGINT AS n_turns
  FROM {from_clause} GROUP BY conv_id
), fp AS (
  SELECT conv_id, n_turns,
         ('0x' || substr(md5(s), 1, 15))::BIGINT AS fingerprint
  FROM ser
)
SELECT conv_id, fingerprint, n_turns,
       conv_id = min(conv_id) OVER (PARTITION BY fingerprint) AS is_canonical
FROM fp
"""


# --------------------------------------------------------------------------
# render_chat_template
# --------------------------------------------------------------------------


def render_chat_template(
    df: DataFrame, turn_open: str = "<|{role}|>\n", turn_close: str = "<|end|>\n"
) -> DataFrame:
    """Serialize each conversation to ONE training string:
    ``<|role|>\\ntext<|end|>\\n`` per turn, in turn order. Output
    (conv_id, text, n_turns, n_chars) feeds ``packing.pack_chunks``.

    ``turn_open`` must contain the literal ``{role}`` placeholder.
    """
    pre, post = turn_open.split("{role}")
    grouped = _sorted_turns(df, ["role", "text"])
    rendered = F.array_join(
        F.transform(
            F.col("ts"),
            lambda s: F.concat(
                F.lit(pre), s.role, F.lit(post), s.text, F.lit(turn_close)
            ),
        ),
        "",
    )
    return grouped.select(
        "conv_id",
        rendered.alias("text"),
        F.size("ts").cast("long").alias("n_turns"),
    ).withColumn("n_chars", F.length("text").cast("long"))


def sql_render_chat_template(
    from_clause: str, turn_open: str = "<|{role}|>\n", turn_close: str = "<|end|>\n"
) -> str:
    """DuckDB oracle via string_agg ORDER BY turn_idx."""
    pre, post = turn_open.split("{role}")

    def q(s: str) -> str:
        return s.replace("'", "''").replace(chr(10), "' || chr(10) || '")

    piece = f"'{q(pre)}' || role || '{q(post)}' || text || '{q(turn_close)}'"
    return f"""
SELECT conv_id,
       string_agg({piece}, '' ORDER BY turn_idx) AS text,
       count(*)::BIGINT AS n_turns,
       length(string_agg({piece}, '' ORDER BY turn_idx))::BIGINT AS n_chars
FROM {from_clause} GROUP BY conv_id
"""


# --------------------------------------------------------------------------
# conversation_pack
# --------------------------------------------------------------------------


def conversation_pack(
    df: DataFrame, window: int, text_col: str = "text"
) -> DataFrame:
    """Pack whole conversations into fixed token-capacity context bins.

    SFT packing must never split a conversation across training
    sequences, so the unit here is the conversation: one conv_id shuffle
    sums whitespace token counts per conversation, then
    ``packing.pack_chunks``' exact distributed prefix sum (canonical
    (60-bit md5 key, conv_id) order) places each conversation, and its
    bin is the chunk its start offset falls in — conversations land
    whole, bins run over the cap by at most one conversation (the same
    doc-granular rule ``shards.assign_shards`` uses). Deterministic at
    any partitioning.

    Output: ``(conv_id, n_tokens, start_offset, bin_id)``.
    """
    from .packing import pack_chunks

    convs = df.groupBy("conv_id").agg(
        F.sum(F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")))
        .cast("long")
        .alias("conv_tokens")
    )
    packed = pack_chunks(
        convs, window, id_col="conv_id", tokens_col=F.col("conv_tokens")
    )
    return packed.select(
        "conv_id", "n_tokens", "start_offset", F.col("first_chunk").alias("bin_id")
    )


def sql_conversation_pack(window: int, from_clause: str) -> str:
    """DuckDB replay: per-conv token sums -> the naive single-window
    global prefix sum over the same (md5 key, conv_id) order."""
    return f"""
WITH turns AS (SELECT conv_id, text FROM {from_clause}),
c AS (
  SELECT conv_id,
         sum(len(string_split(coalesce(text, ''), ' ')))::BIGINT AS n_tokens,
         ('0x' || substr(md5('pack:' || conv_id), 1, 15))::BIGINT AS hkey
  FROM turns GROUP BY conv_id
),
p AS (
  SELECT conv_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY hkey, conv_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS start_offset
  FROM c WHERE n_tokens > 0
)
SELECT conv_id, n_tokens, start_offset,
       (start_offset // {int(window)})::BIGINT AS bin_id
FROM p
"""
