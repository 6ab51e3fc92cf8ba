"""T8 HTML boilerplate stripping (main-content extraction).

The reference service contains **no** HTML handling (see SURVEY.md scope
note); the north rule demands "DOM text-density heuristics (link-density,
block-level tag scoring)". The semantics below are therefore frozen here
from the published literature — block segmentation at block-level tags
with link-density scoring in the style of Boilerpipe (Kohlschütter et
al., WSDM 2010) and jusText (Pomikálek, 2011) — and this function *is*
the golden spec the Spark pipeline must match.

Rules (frozen):

- Subtrees under ``script style noscript template svg iframe`` are
  dropped (invisible), and subtrees under ``nav header footer aside
  form button`` are dropped (boilerplate containers).
- The document is segmented into blocks at block-level tags
  (``p div h1-h6 li td th blockquote pre article section main table tr
  ul ol body html``); character data accumulates into the current block.
- Per block: ``link_density = chars inside <a> / non-space chars``.
  A block is kept iff its whitespace-normalized text is at least
  ``MIN_BLOCK_CHARS`` (25) long with ``link_density < 0.33``, or it is a
  heading (h1-h6) at least ``MIN_HEADING_CHARS`` (8) long with
  ``link_density < 0.2``.
- Kept blocks are whitespace-normalized (runs -> single space, strip)
  and joined with a blank line; the final text is passed through the T5
  cleanup for consistency with every other extraction path.
- Spans are the merged raw-HTML offsets of the character data of kept
  blocks (entity references span their ``&name;`` source text).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

from ocr_spark.oracle.cleanup import clean_text, _merge_intervals

DROP_TAGS = frozenset(
    "script style noscript template svg iframe nav header footer aside form button".split()
)
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th blockquote pre article section main table tr ul ol body html".split()
)
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())
VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

MIN_BLOCK_CHARS = 25
MIN_HEADING_CHARS = 8
MAX_LINK_DENSITY = 0.33
MAX_HEADING_LINK_DENSITY = 0.2

_RE_WS = re.compile(r"\s+")


class _Block:
    __slots__ = ("tag", "chunks", "link_chars")

    def __init__(self, tag: str):
        self.tag = tag
        # chunks: list of (text, raw_start, raw_end) with raw offsets into the html
        self.chunks: list = []
        self.link_chars = 0


class _Extractor(HTMLParser):
    def __init__(self, raw: str):
        # convert_charrefs=False so every data chunk's getpos() maps cleanly
        # to a raw offset and entity refs carry their own source spans.
        super().__init__(convert_charrefs=False)
        self.raw = raw
        # line-start offsets for getpos() -> absolute offset conversion
        self.line_starts = [0]
        for m in re.finditer("\n", raw):
            self.line_starts.append(m.end())
        self.drop_depth = 0
        self.anchor_depth = 0
        self.blocks: list[_Block] = []
        self.current = _Block("body")

    def _abs(self) -> int:
        line, col = self.getpos()
        return self.line_starts[line - 1] + col

    def _flush(self, next_tag: str) -> None:
        if self.current.chunks:
            self.blocks.append(self.current)
        self.current = _Block(next_tag)

    def handle_starttag(self, tag, attrs):
        if tag in DROP_TAGS:
            if tag not in VOID_TAGS:
                self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.anchor_depth += 1
        if tag in BLOCK_TAGS:
            self._flush(tag)

    def handle_endtag(self, tag):
        if tag in DROP_TAGS:
            if self.drop_depth:
                self.drop_depth -= 1
            return
        if self.drop_depth:
            return
        if tag == "a" and self.anchor_depth:
            self.anchor_depth -= 1
        if tag in BLOCK_TAGS:
            self._flush(self.current.tag)

    def handle_startendtag(self, tag, attrs):
        # <br/> and friends never open a drop scope
        if self.drop_depth or tag in DROP_TAGS:
            return
        if tag in BLOCK_TAGS:
            self._flush(tag)

    def _add_text(self, text: str, start: int, end: int) -> None:
        if self.drop_depth or not text:
            return
        self.current.chunks.append((text, start, end))
        if self.anchor_depth:
            self.current.link_chars += sum(1 for c in text if not c.isspace())

    def handle_data(self, data):
        start = self._abs()
        self._add_text(data, start, start + len(data))

    def handle_entityref(self, name):
        start = self._abs()
        self._add_text(unescape(f"&{name};"), start, start + len(name) + 2)

    def handle_charref(self, name):
        start = self._abs()
        self._add_text(unescape(f"&#{name};"), start, start + len(name) + 3)


def _block_keep(block: _Block) -> bool:
    text = "".join(c[0] for c in block.chunks)
    norm = _RE_WS.sub(" ", text).strip()
    if not norm:
        return False
    nonspace = sum(1 for c in text if not c.isspace())
    link_density = block.link_chars / nonspace if nonspace else 1.0
    if block.tag in HEADING_TAGS:
        return len(norm) >= MIN_HEADING_CHARS and link_density < MAX_HEADING_LINK_DENSITY
    return len(norm) >= MIN_BLOCK_CHARS and link_density < MAX_LINK_DENSITY


def strip_html(raw: str):
    """Extract main content from an HTML string.

    Returns ``(text, spans)``: the cleaned main-content text (kept blocks
    whitespace-normalized and joined with a blank line, then T5-cleaned)
    and the merged (start, end) raw-HTML offsets of kept character data.
    """
    if not raw:
        return "", []
    parser = _Extractor(raw)
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        # malformed HTML: fall back to keeping nothing rather than failing
        return "", []
    parser._flush(parser.current.tag)
    kept = [b for b in parser.blocks if _block_keep(b)]
    parts = []
    intervals = []
    for b in kept:
        text = "".join(c[0] for c in b.chunks)
        parts.append(_RE_WS.sub(" ", text).strip())
        intervals.extend((c[1], c[2]) for c in b.chunks)
    return clean_text("\n\n".join(parts)), _merge_intervals(intervals)
