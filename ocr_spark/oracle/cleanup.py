"""T5 cleanup normalization, plain and offset-preserving.

Reference semantics (``services/ocr_service/helpers/text_extractor.py:258-277``):

    text = re.sub(r'\\n\\s*\\n\\s*\\n+', '\\n\\n', text)   # 3+ blank-ish lines -> one blank line
    text = re.sub(r'[ \\t]+', ' ', text)                # space/tab runs -> single space
    text = text.strip()

``clean_text`` is the literal spec. ``clean_text_with_spans`` computes the
same output string *plus* character-span provenance: for every output
character we track the half-open interval of the raw input it derives
from; the returned spans are the merged maximal intervals of raw input
that contributed to the output. This is what the engine's ``spans``
column carries (the reference has no span concept; the north rule
requires one, so the contract is frozen here).
"""

from __future__ import annotations

import re

_RE_BLANKLINES = re.compile(r"\n\s*\n\s*\n+")
_RE_SPACERUNS = re.compile(r"[ \t]+")


def clean_text(text: str) -> str:
    """Cleanup normalization, exactly the reference's regex chain."""
    if not text:
        return ""
    text = _RE_BLANKLINES.sub("\n\n", text)
    text = _RE_SPACERUNS.sub(" ", text)
    return text.strip()


def _sub_mapped(pattern: re.Pattern, repl: str, chars: list, srcs: list):
    """Regex-substitute over a (char, source-interval) parallel pair of lists.

    Replacement characters inherit the union interval of the matched run,
    so provenance is never lost by a collapse.
    """
    s = "".join(chars)
    out_chars: list = []
    out_srcs: list = []
    pos = 0
    for m in pattern.finditer(s):
        out_chars.extend(chars[pos : m.start()])
        out_srcs.extend(srcs[pos : m.start()])
        seg = srcs[m.start() : m.end()]
        lo = min(iv[0] for iv in seg)
        hi = max(iv[1] for iv in seg)
        for c in repl:
            out_chars.append(c)
            out_srcs.append((lo, hi))
        pos = m.end()
    out_chars.extend(chars[pos:])
    out_srcs.extend(srcs[pos:])
    return out_chars, out_srcs


def _merge_intervals(intervals):
    """Merge overlapping/adjacent (start, end) half-open intervals."""
    if not intervals:
        return []
    ordered = sorted(intervals)
    merged = [list(ordered[0])]
    for lo, hi in ordered[1:]:
        if lo <= merged[-1][1]:
            if hi > merged[-1][1]:
                merged[-1][1] = hi
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def clean_text_with_spans(text: str, base_srcs=None):
    """Cleanup with provenance.

    Returns ``(cleaned, spans)`` where ``cleaned == clean_text(text)`` and
    ``spans`` is a list of merged ``(start, end)`` half-open offsets into
    the *raw* input whose characters contributed to the output.

    ``base_srcs`` optionally supplies a pre-existing source interval per
    input character (used by the HTML stripper, whose input text is
    already an extraction of a larger raw string).
    """
    if not text:
        return "", []
    chars = list(text)
    if base_srcs is None:
        srcs = [(i, i + 1) for i in range(len(chars))]
    else:
        srcs = list(base_srcs)
        if len(srcs) != len(chars):
            raise ValueError("base_srcs length mismatch")
    chars, srcs = _sub_mapped(_RE_BLANKLINES, "\n\n", chars, srcs)
    chars, srcs = _sub_mapped(_RE_SPACERUNS, " ", chars, srcs)
    # strip(): drop leading/trailing whitespace chars (and their provenance)
    start = 0
    end = len(chars)
    while start < end and chars[start].isspace():
        start += 1
    while end > start and chars[end - 1].isspace():
        end -= 1
    chars = chars[start:end]
    srcs = srcs[start:end]
    return "".join(chars), _merge_intervals(srcs)
