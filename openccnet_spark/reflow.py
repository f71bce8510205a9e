"""CJK paragraph reflow for extracted PDF/OCR text.

Reimplements the reference CLI's reflow stage — ``OpenccNet/ReflowHelper.cs``
(main loop ``:163-510``, heading/metadata heuristics ``:515-640``, repeated-
segment collapsing ``:645-760``), with the punctuation/bracket machinery of
``OpenccNet/PunctSets.cs`` and the CJK classifiers of
``OpenccNet/CjkText.cs``. PDF text extraction breaks paragraphs at page
width; this stage re-joins continuation lines into paragraphs using
sentence-final punctuation, dialog-quote balance, bracket balance, heading/
metadata/list/divider detection, and page markers.

Everything is scalar Python string logic (the payload operator pattern of
``convert.py``); Spark integration wraps ``reflow_cjk_paragraphs`` in the
PDF source's ``mapInPandas`` pass (``sources/pdf.py``).
"""

from __future__ import annotations

import re

# --- PunctSets (PunctSets.cs) ------------------------------------------------

DIALOG_OPENERS = frozenset("“‘「『﹁﹃")
DIALOG_CLOSERS = frozenset("”’」』﹂﹄")
_COMMA_LIKE = frozenset("，,、")
_STRONG_END = frozenset("。！？!?")
_CLAUSE_OR_END = frozenset("。！？；：…—”」’』）】》〗〕］｝＞〉>.):!?")
_BRACKET_PAIRS = {
    "（": "）", "(": ")", "[": "]", "［": "］", "{": "}", "｛": "｝",
    "<": ">", "＜": "＞", "〈": "〉", "【": "】", "《": "》",
    "〔": "〕", "〖": "〗",
}
_OPEN_BRACKETS = frozenset(_BRACKET_PAIRS)
_CLOSE_BRACKETS = frozenset(_BRACKET_PAIRS.values())
_METADATA_SEPARATORS = frozenset(":：　·・")
_ASCII_DIVIDERS = frozenset("-=_~～")
_STAR_DIVIDERS = frozenset("*＊★☆")
#: quote closers that balance against “ (PunctSets.cs HasUnclosedDialogQuote)
_DOUBLE_QUOTE_CLOSERS = frozenset("”〞〟")

is_dialog_opener = DIALOG_OPENERS.__contains__
is_dialog_closer = DIALOG_CLOSERS.__contains__
is_comma_like = _COMMA_LIKE.__contains__
is_strong_sentence_end = _STRONG_END.__contains__
is_clause_or_end_punct = _CLAUSE_OR_END.__contains__


def is_colon_like(ch: str) -> bool:
    return ch in "：:"


def is_allowed_postfix_closer(ch: str) -> bool:
    return ch in "）)"


def last_non_whitespace(s: str) -> tuple[int, str]:
    """(index, char) of the last non-whitespace, or (-1, '')."""
    for i in range(len(s) - 1, -1, -1):
        if not s[i].isspace():
            return i, s[i]
    return -1, ""


def prev_non_whitespace(s: str, before: int) -> tuple[int, str]:
    for i in range(before - 1, -1, -1):
        if not s[i].isspace():
            return i, s[i]
    return -1, ""


def begins_with_dialog_opener(s: str) -> bool:
    for ch in s:
        if ch.isspace():
            continue
        return ch in DIALOG_OPENERS
    return False


def ends_with_strong_sentence_end(s: str) -> bool:
    _, last = last_non_whitespace(s)
    return last in _STRONG_END


def ends_with_colon_like(s: str) -> bool:
    _, last = last_non_whitespace(s)
    return bool(last) and is_colon_like(last)


def ends_with_allowed_postfix_closer(s: str) -> bool:
    _, last = last_non_whitespace(s)
    return bool(last) and is_allowed_postfix_closer(last)


def ends_with_ellipsis(s: str) -> bool:
    idx, last = last_non_whitespace(s)
    if not last:
        return False
    return last == "…" or (last == "." and idx > 0 and s[idx - 1] == ".")


def contains_comma_like(s: str) -> bool:
    return any(ch in _COMMA_LIKE for ch in s)


def has_unclosed_bracket(s: str) -> bool:
    """True iff bracket nesting is broken (PunctSets.cs:299-352): unmatched
    closer, mismatched pair, or leftover opens — but only when the string
    contains any bracket at all."""
    stack: list[str] = []
    seen = False
    for ch in s:
        if ch in _OPEN_BRACKETS:
            seen = True
            stack.append(ch)
        elif ch in _CLOSE_BRACKETS:
            seen = True
            if not stack or _BRACKET_PAIRS[stack.pop()] != ch:
                return True
    return seen and bool(stack)


def has_unclosed_dialog_quote(s: str) -> bool:
    """Per-quote-type balance; an unmatched closer is also 'unclosed'."""
    balance = [0] * 6
    openers = "“‘「『﹁﹃"
    for ch in s:
        k = openers.find(ch)
        if k >= 0:
            balance[k] += 1
            continue
        if ch in _DOUBLE_QUOTE_CLOSERS:
            k = 0
        elif ch == "’":
            k = 1
        elif ch == "」":
            k = 2
        elif ch == "』":
            k = 3
        elif ch == "﹂":
            k = 4
        elif ch == "﹄":
            k = 5
        else:
            continue
        if balance[k] > 0:
            balance[k] -= 1
        else:
            return True
    return any(balance)


def is_matching_bracket(open_ch: str, close_ch: str) -> bool:
    return _BRACKET_PAIRS.get(open_ch) == close_ch


def is_wrapped_by_matching_bracket(s: str, last_ch: str, min_len: int = 3) -> bool:
    return len(s) >= min_len and is_matching_bracket(s[0], last_ch)


def is_bracket_type_balanced(s: str, open_ch: str) -> bool:
    close_ch = _BRACKET_PAIRS.get(open_ch)
    if close_ch is None:
        return True
    depth = 0
    for ch in s:
        if ch == open_ch:
            depth += 1
        elif ch == close_ch:
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


_LIST_NUMBERS = frozenset("0123456789０１２３４５６７８９一二三四五六七八九十")
_BULLETS = frozenset("-*＊•‧▪◦○●※")


def begins_with_simple_list_starter(s: str) -> bool:
    """Bullet / '1)' / '（一）' / '12.' style list starts (PunctSets.cs:58-130)."""
    s = s.lstrip()
    if len(s) >= 2 and s[0] in _BULLETS and s[1].isspace():
        return True
    n = len(s)
    if n >= 3 and s[0] == "(" and s[1] in _LIST_NUMBERS:
        if s[2] == ")":
            return True
        if n >= 4 and s[2] in _LIST_NUMBERS and s[3] == ")":
            return True
    if n >= 3 and s[0] == "（" and s[1] in _LIST_NUMBERS:
        if s[2] == "）":
            return True
        if n >= 4 and s[2] in _LIST_NUMBERS and s[3] == "）":
            return True
    if n < 2 or s[0] not in _LIST_NUMBERS:
        return False
    if s[1] in ")）、":
        return True
    if s[1] == ".":
        return n >= 3 and (s[2] == " " or is_cjk(s[2]))
    if n < 3 or s[1] not in _LIST_NUMBERS:
        return False
    if s[2] in ")）、":
        return True
    if s[2] == ".":
        return n >= 4 and (s[3] == " " or is_cjk(s[3]))
    return False


def simple_list_has_unclosed_bracket(s: str) -> bool:
    """Skip a leading 'N)' marker so its lone ')' doesn't read as unmatched."""
    s = s.lstrip()
    start = 0
    if len(s) >= 2 and s[0] in _LIST_NUMBERS:
        if s[1] in ")）":
            start = 2
        elif len(s) >= 3 and s[1] in _LIST_NUMBERS and s[2] in ")）":
            start = 3
    return has_unclosed_bracket(s[start:])


def is_visual_divider_line(s: str, min_visual: int = 3) -> bool:
    if not s:
        return False
    count = 0
    for ch in s:
        if ch.isspace():
            continue
        if not (
            "─" <= ch <= "╿" or ch in _ASCII_DIVIDERS or ch in _STAR_DIVIDERS
        ):
            return False
        count += 1
    return count >= min_visual


# --- CjkText (CjkText.cs) -----------------------------------------------------


def is_cjk(ch: str) -> bool:
    c = ord(ch)
    return (
        0x3400 <= c <= 0x4DBF or 0x4E00 <= c <= 0x9FFF or 0xF900 <= c <= 0xFAFF
    )


def is_all_ascii(s: str) -> bool:
    return bool(s) and all(ord(ch) <= 0x7F for ch in s)


_NEUTRAL_PUNCT = frozenset(" -/:.—–…·・～―‐‑、：")


def is_mixed_cjk_ascii(s: str) -> bool:
    has_cjk = has_ascii = False
    for ch in s:
        if ch in _NEUTRAL_PUNCT:
            continue
        if ord(ch) <= 0x7F:
            if ch.isalnum():
                has_ascii = True
            else:
                return False
        elif "０" <= ch <= "９":
            has_ascii = True
        elif is_cjk(ch):
            has_cjk = True
        else:
            return False
        if has_cjk and has_ascii:
            return True
    return False


def is_all_cjk(s: str, allow_whitespace: bool = False) -> bool:
    seen = False
    for ch in s:
        if ch.isspace():
            if not allow_whitespace:
                return False
            continue
        seen = True
        if not is_cjk(ch):
            return False
    return seen


def is_mostly_cjk(s: str) -> bool:
    cjk = ascii_letters = 0
    for ch in s:
        if ch.isspace():
            continue
        if "0" <= ch <= "9" or "０" <= ch <= "９":
            continue
        if is_cjk(ch):
            cjk += 1
            continue
        if ord(ch) <= 0x7F and ch.isalpha():
            ascii_letters += 1
            if ascii_letters > cjk + 4:
                return False
    return cjk > 0 and cjk >= ascii_letters


def contains_any_cjk(s: str) -> bool:
    return any(is_cjk(ch) for ch in s)


def _ends_with_cjk_ellipsis(s: str) -> bool:
    if not s or not is_mostly_cjk(s):
        return False
    i = len(s) - 1
    while i >= 0 and s[i].isspace():
        i -= 1
    if i < 0:
        return False
    if s[i] == "…":
        return True
    return i >= 2 and s[i] == "." and s[i - 1] == "." and s[i - 2] == "."


def _is_ocr_punct_at_line_end(s: str, last_idx: int) -> bool:
    return last_idx > 0 and is_cjk(s[last_idx - 1]) and is_mostly_cjk(s)


def _is_at_end_allowing_closers(s: str, index: int) -> bool:
    for ch in s[index + 1 :]:
        if ch.isspace() or ch in DIALOG_CLOSERS or ch in _CLOSE_BRACKETS:
            continue
        return False
    return True


def _is_ocr_punct_before_closers(s: str, index: int) -> bool:
    if not _is_at_end_allowing_closers(s, index):
        return False
    _, prev = prev_non_whitespace(s, index)
    return bool(prev) and is_cjk(prev) and is_mostly_cjk(s)


def ends_with_sentence_boundary(s: str, level: int = 2) -> bool:
    """CjkText.EndsWithSentenceBoundary: level 1 = also ；： ; level 2 =
    strong end / closer-after-strong / CJK ：/ellipsis; level 3 = strictest
    (adds OCR '.'/':' after a CJK char)."""
    if not s or s.isspace():
        return False
    last_idx, last = last_non_whitespace(s)
    if not last:
        return False
    if is_strong_sentence_end(last):
        return True
    if level >= 3 and last in ".:" and _is_ocr_punct_at_line_end(s, last_idx):
        return True
    prev_idx, prev = prev_non_whitespace(s, last_idx)
    if (last in DIALOG_CLOSERS or is_allowed_postfix_closer(last)) and prev_idx >= 0:
        if is_strong_sentence_end(prev):
            return True
        if prev == "." and _is_ocr_punct_before_closers(s, prev_idx):
            return True
    if level >= 3:
        return False
    if last == "：" and is_mostly_cjk(s):
        return True
    if _ends_with_cjk_ellipsis(s):
        return True
    if level >= 2:
        return False
    return last in "；：;:"


def ends_with_cjk_bracket_boundary(s: str) -> bool:
    if not s or s.isspace():
        return False
    s = s.strip()
    if len(s) < 2:
        return False
    open_ch, close_ch = s[0], s[-1]
    if not is_matching_bracket(open_ch, close_ch):
        return False
    inner = s[1:-1].strip()
    if not inner or not is_mostly_cjk(inner):
        return False
    if open_ch in "([" and not contains_any_cjk(inner):
        return False
    return is_bracket_type_balanced(s, open_ch)


# --- ReflowHelper (ReflowHelper.cs) -------------------------------------------

_TITLE_HEADING_RE = re.compile(
    r"^(?!.{20,}[,，])(?=.{0,50}$)"
    r"(目录|目錄|前言|序章|楔子|终章|尾声|尾聲|后记|後記|番外.{0,15}"
    r"|.{0,10}?第.{0,5}?([章节部卷節回][^分合的])"
    r"|(?:卷|章)[一二三四五六七八九十](?:$|.{0,20}?))"
)
_INDENT_RE = re.compile(r"^[\s　]{2,}")

_METADATA_KEYS = frozenset(
    """書名 书名 作者 原著 譯者 译者 校訂 校订 出版社 出版時間 出版时间 出版日期
    版權 版权 版權頁 版权页 版權信息 版权信息 責任編輯 责任编辑 編輯 编辑 責編 责编
    定價 定价 簡介 简介 前言 序章 終章 终章 尾聲 尾声 後記 后记 品牌方 出品方
    授權方 授权方 電子版權 数字版权 掃描 扫描 發行 发行 OCR CIP 在版編目 在版编目
    分類號 分类号 主題詞 主题词 類型 类型 標簽 标签 系列 發行日 发行日 初版 ISBN""".split()
)
_MAX_METADATA_KEY_LEN = max(len(k) for k in _METADATA_KEYS)


class _DialogState:
    """Running balance of the six dialog-quote pairs (ReflowHelper.cs:96-160)."""

    __slots__ = ("bal",)
    _OPEN = "“‘「『﹁﹃"
    _CLOSE = "”’」』﹂﹄"

    def __init__(self):
        self.bal = [0] * 6

    def reset(self):
        self.bal = [0] * 6

    def update(self, s: str):
        for ch in s:
            k = self._OPEN.find(ch)
            if k >= 0:
                self.bal[k] += 1
                continue
            k = self._CLOSE.find(ch)
            if k >= 0 and self.bal[k] > 0:
                self.bal[k] -= 1

    @property
    def is_unclosed(self) -> bool:
        return any(self.bal)


def _strip_halfwidth_indent(s: str) -> str:
    """Leading ASCII spaces removed; full-width U+3000 indent KEPT."""
    i = 0
    while i < len(s) and s[i] == " ":
        i += 1
    return s[i:]


def _collapse_repeated_word_sequences(parts: list[str]) -> list[str]:
    """Collapse >= 3 consecutive repeats of a short phrase (headers leaking
    into every page) to one occurrence (ReflowHelper.cs:680-745)."""
    min_repeats, max_phrase = 3, 8
    n = len(parts)
    if n < min_repeats:
        return parts
    for start in range(n):
        for plen in range(1, max_phrase + 1):
            if start + plen > n:
                break
            count = 1
            while True:
                nxt = start + count * plen
                if nxt + plen > n or parts[start : start + plen] != parts[nxt : nxt + plen]:
                    break
                count += 1
            if count >= min_repeats:
                return parts[:start] + parts[start : start + plen] + parts[start + count * plen :]
    return parts


def _collapse_repeated_token(token: str) -> str:
    if not 4 <= len(token) <= 100:
        return token
    for unit_len in range(4, 11):
        if unit_len > len(token) // 3:
            break
        if len(token) % unit_len:
            continue
        unit = token[:unit_len]
        if token == unit * (len(token) // unit_len):
            return unit
    return token


def _collapse_repeated_segments(line: str) -> str:
    if not line:
        return line
    parts = [p for p in re.split(r"[ \t]+", line) if p]
    if not parts:
        return line
    parts = _collapse_repeated_word_sequences(parts)
    return " ".join(_collapse_repeated_token(p) for p in parts)


def _is_heading_like(s: str) -> bool:
    """Short standalone headings (ReflowHelper.cs:515-585)."""
    s = s.strip()
    if not s:
        return False
    if s.startswith("=== ") and s.endswith("==="):
        return False
    if has_unclosed_bracket(s) or has_unclosed_dialog_quote(s):
        return False
    last_idx, last = last_non_whitespace(s)
    if not last:
        return False
    if is_wrapped_by_matching_bracket(s, last) and is_mostly_cjk(s):
        return True
    max_len = 16 if (is_all_ascii(s) or is_mixed_cjk_ascii(s)) else 8
    n = len(s)
    if is_colon_like(last) and n <= max_len and last_idx > 0 and is_all_cjk(s[:last_idx]):
        return True
    if is_allowed_postfix_closer(last) and not contains_comma_like(s):
        return True
    if is_clause_or_end_punct(last):
        return False
    if contains_comma_like(s):
        return False
    if n > max_len:
        return False
    has_non_ascii = False
    all_ascii = True
    has_letter = False
    all_ascii_digits = True
    for ch in s:
        if ord(ch) > 0x7F:
            has_non_ascii = True
            all_ascii = False
            all_ascii_digits = False
            continue
        if not ch.isdigit():
            all_ascii_digits = False
        if ch.isalpha():
            has_letter = True
    if all_ascii_digits:
        return True
    if has_non_ascii and last not in _COMMA_LIKE:
        return True
    return all_ascii and has_letter


def _is_metadata_line(line: str) -> bool:
    """'作者：…' style front-matter key/value lines (ReflowHelper.cs:590-640)."""
    if not line:
        return False
    first = 0
    while first < len(line) and line[first].isspace():
        first += 1
    if first >= len(line) or len(line) > 30:
        return False
    idx = j = -1
    for i in range(first, len(line)):
        if line[i] in _METADATA_SEPARATORS:
            idx = i
            j = i + 1
            while j < len(line) and line[j].isspace():
                j += 1
            break
    if idx < 0 or j < 0 or j >= len(line):
        return False
    key = line[first:idx].strip()
    if not 0 < len(line[first:idx]) <= _MAX_METADATA_KEY_LEN:
        return False
    if key not in _METADATA_KEYS:
        return False
    return line[j] not in DIALOG_OPENERS


def reflow_cjk_paragraphs(text: str, add_pdf_page_header: bool = False, compact: bool = False) -> str:
    """Re-join hard-wrapped CJK lines into paragraphs (ReflowHelper.cs:163-510).

    ``add_pdf_page_header``: the text carries ``=== [Page x/y] ===`` markers
    (kept as standalone segments; blank lines then always break paragraphs).
    ``compact``: single newline between segments instead of a blank line.
    """
    if not text or text.isspace():
        return ""
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    segments: list[str] = []
    buffer: list[str] = []  # list of appended chunks; joined with ""
    dialog = _DialogState()

    def buffer_text() -> str:
        return "".join(buffer)

    def flush():
        if buffer:
            segments.append(buffer_text())
            buffer.clear()
            dialog.reset()

    for raw_line in lines:
        stripped = _strip_halfwidth_indent(raw_line.rstrip())
        probe = stripped.lstrip(" 　")

        if is_visual_divider_line(probe):
            flush()
            segments.append(stripped)
            continue

        stripped = _collapse_repeated_segments(stripped)
        probe = stripped.lstrip(" 　")

        is_title = bool(_TITLE_HEADING_RE.match(probe))
        is_short_heading = _is_heading_like(probe)
        is_metadata = _is_metadata_line(probe)

        # per-line lazy caches (match the C# laziness: computed on the
        # buffer as it stood at line start)
        btext = buffer_text() if buffer else ""
        b_unclosed_bracket = has_unclosed_bracket(btext) if buffer else False

        if not stripped:
            if not add_pdf_page_header and buffer:
                if dialog.is_unclosed or b_unclosed_bracket:
                    continue  # blank line inside an open quote/bracket: noise
                _, last = last_non_whitespace(btext)
                if last and not is_strong_sentence_end(last):
                    continue  # mid-sentence blank line: noise
            flush()
            continue

        if stripped.startswith("=== ") and stripped.endswith("==="):
            flush()
            segments.append(stripped)
            continue

        if is_title or is_metadata:
            flush()
            segments.append(stripped)
            continue

        if is_short_heading:
            if not buffer:
                split_as_heading = True
            elif b_unclosed_bracket:
                split_as_heading = False
            else:
                _, last = last_non_whitespace(btext)
                if not last:
                    split_as_heading = True
                else:
                    prev_comma = is_comma_like(last)
                    prev_sentence = is_clause_or_end_punct(last)
                    continuation = (
                        is_all_cjk(stripped, allow_whitespace=True)
                        or ends_with_colon_like(stripped)
                        or ends_with_allowed_postfix_closer(stripped)
                    )
                    if prev_comma:
                        split_as_heading = False
                    elif continuation and not prev_sentence:
                        split_as_heading = False
                    else:
                        split_as_heading = True
            if split_as_heading:
                flush()
                segments.append(stripped)
                continue

        is_dialog_start = begins_with_dialog_opener(stripped)
        is_list_start = begins_with_simple_list_starter(stripped)
        closer_idx, closer_ch = last_non_whitespace(stripped)
        ends_with_closer = bool(closer_ch) and is_dialog_closer(closer_ch)
        s_unclosed_bracket = (
            simple_list_has_unclosed_bracket(stripped)
            if is_list_start
            else has_unclosed_bracket(stripped)
        )
        s_unclosed_quote = has_unclosed_dialog_quote(stripped)
        s_strong_end = ends_with_strong_sentence_end(stripped)
        s_standalone = (
            s_strong_end or ends_with_colon_like(stripped) or ends_with_ellipsis(stripped)
        )

        if is_dialog_start or is_list_start:
            if is_dialog_start and ends_with_closer and not s_unclosed_bracket and not s_unclosed_quote:
                if buffer:
                    segments.append(btext)
                    buffer.clear()
                segments.append(stripped)
                dialog.reset()
                continue
            if is_list_start and s_standalone and not s_unclosed_bracket and not s_unclosed_quote:
                if buffer:
                    segments.append(btext)
                    buffer.clear()
                segments.append(stripped)
                continue
            _, last = last_non_whitespace(btext)
            should_flush_prev = bool(buffer) and (
                (is_list_start and begins_with_simple_list_starter(btext))
                or (
                    bool(last)
                    and not is_comma_like(last)
                    and not is_cjk(last)
                    and not dialog.is_unclosed
                    and not b_unclosed_bracket
                )
            )
            if should_flush_prev:
                segments.append(btext)
                buffer.clear()
            buffer.append(stripped)
            if is_dialog_start:
                dialog.reset()
            dialog.update(stripped)
            continue

        if (
            buffer
            and not dialog.is_unclosed
            and not ends_with_closer
            and (len(btext) > 120 or not b_unclosed_bracket)
            and not s_unclosed_quote
            and s_standalone
        ):
            buffer.append(stripped)
            segments.append(buffer_text())
            buffer.clear()
            dialog.reset()
            continue
        if not buffer:
            if (
                not dialog.is_unclosed
                and not ends_with_closer
                and not s_unclosed_bracket
                and not s_unclosed_quote
                and s_standalone
            ):
                segments.append(stripped)
                dialog.reset()
            else:
                buffer.append(stripped)
                dialog.reset()
                dialog.update(stripped)
            continue

        if ends_with_closer:
            p_idx, prev_ch = prev_non_whitespace(stripped, closer_idx)
            if p_idx < 0:
                _, prev_ch = last_non_whitespace(btext)
            strong_before_closer = bool(prev_ch) and is_clause_or_end_punct(prev_ch)
            buffer.append(stripped)
            dialog.update(stripped)
            if (
                not dialog.is_unclosed
                and strong_before_closer
                and (not b_unclosed_bracket or s_unclosed_bracket or len(buffer_text()) > 120)
            ):
                segments.append(buffer_text())
                buffer.clear()
                dialog.reset()
            continue

        if not dialog.is_unclosed and (
            (ends_with_sentence_boundary(btext, level=2) and not b_unclosed_bracket)
            or ends_with_cjk_bracket_boundary(btext)
            or (buffer and _INDENT_RE.match(raw_line))
        ):
            segments.append(btext)
            buffer.clear()
            buffer.append(stripped)
            dialog.reset()
            dialog.update(stripped)
            continue

        buffer.append(stripped)
        dialog.update(stripped)

    if buffer:
        segments.append(buffer_text())

    return ("\n" if compact else "\n\n").join(segments)


__all__ = [
    "ends_with_sentence_boundary",
    "has_unclosed_bracket",
    "has_unclosed_dialog_quote",
    "is_cjk",
    "is_mostly_cjk",
    "reflow_cjk_paragraphs",
]
