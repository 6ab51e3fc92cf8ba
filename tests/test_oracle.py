"""Unit tests for the frozen oracle (no Spark)."""

import json
import re

import pytest

from ocr_spark.oracle import (
    aggregate_conversation,
    classify_turn,
    clean_text,
    clean_text_with_spans,
    extract_turn,
    parse_ocr_lines,
    parse_pdf_blocks,
    strip_html,
)
from ocr_spark.oracle.payloads import filter_by_confidence, line_stats


# --- T5 cleanup (text_extractor.py:258-277 semantics) ----------------------

class TestCleanup:
    def test_matches_reference_regex_chain(self):
        cases = [
            "",
            "plain",
            "a  b",
            "a\t\tb",
            "a\n\n\n\nb",
            "a\n \t\n  \n\nb",
            "  leading and trailing \t ",
            "one\ntwo\n\nthree\n\n\nfour",
            "tabs\tand  spaces \t mixed\n\n\n\n\nend",
        ]
        for s in cases:
            expected = re.sub(r"\n\s*\n\s*\n+", "\n\n", s)
            expected = re.sub(r"[ \t]+", " ", expected).strip()
            assert clean_text(s) == expected, repr(s)

    def test_spans_version_same_text(self):
        cases = [
            "a  b\t\tc\n\n\n\nd   ",
            "\n\n\nx\n\n\n",
            "   ",
            "word",
            "a \t\n \n\t \n b",
        ]
        for s in cases:
            cleaned, spans = clean_text_with_spans(s)
            assert cleaned == clean_text(s), repr(s)
            for lo, hi in spans:
                assert 0 <= lo < hi <= len(s)
            # spans are disjoint and ordered
            for (a, b), (c, d) in zip(spans, spans[1:]):
                assert b < c

    def test_idempotent(self):
        for s in ["a  b\n\n\n\nc", "  x  ", "a\tb"]:
            assert clean_text(clean_text(s)) == clean_text(s)


# --- T1/T2 pdf blocks -------------------------------------------------------

class TestPdfBlocks:
    def _payload(self, blocks):
        return json.dumps({"blocks": blocks})

    def test_type_filter_and_span_concat(self):
        payload = self._payload(
            [
                {"type": 1, "bbox": [0, 0, 1, 1], "lines": [{"spans": [{"text": "img"}]}]},
                {"type": 0, "bbox": [0, 10, 5, 12],
                 "lines": [{"spans": [{"text": "he"}, {"text": "llo"}]},
                           {"spans": [{"text": " world "}]}]},
                {"type": 0, "bbox": [0, 20, 5, 22], "lines": [{"spans": [{"text": "   "}]}]},
            ]
        )
        blocks, text, ok, err = parse_pdf_blocks(payload)
        assert ok and err is None
        assert len(blocks) == 1  # image block + whitespace-only block dropped
        assert blocks[0]["text"] == "hello world"  # concat then strip
        assert text == "hello world"

    def test_reading_order(self):
        # same row (y within 0.05), left-to-right; then next row
        payload = self._payload(
            [
                {"type": 0, "bbox": [300.0, 100.0, 400, 112], "lines": [{"spans": [{"text": "right"}]}]},
                {"type": 0, "bbox": [10.0, 200.0, 100, 212], "lines": [{"spans": [{"text": "below"}]}]},
                {"type": 0, "bbox": [10.0, 100.02, 100, 112], "lines": [{"spans": [{"text": "left"}]}]},
            ]
        )
        _, text, ok, _ = parse_pdf_blocks(payload)
        assert ok
        assert text == "left\nright\nbelow"

    def test_malformed(self):
        for bad in ['{"blocks": [{', "[]", '{"nope": 1}', '{"blocks": 3}']:
            blocks, text, ok, err = parse_pdf_blocks(bad)
            assert not ok and blocks == [] and text == "" and err


# --- T3/F2 ocr lines --------------------------------------------------------

class TestOcrLines:
    def test_confidence_filter_and_flatten(self):
        payload = json.dumps(
            {
                "rec_texts": ["keep", "drop", "", "also"],
                "rec_scores": [0.9, 0.4, 0.8, 0.5],
                "dt_polys": [[[1, 2], [3, 2], [3, 4], [1, 4]]] * 4,
            }
        )
        lines, text, ok, err = parse_ocr_lines(payload, 0.5)
        assert ok
        assert [ln["text"] for ln in lines] == ["keep", "", "also"]
        assert lines[0]["bbox"] == [1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 1.0, 4.0]
        # dict path joins kept texts including blanks (text_extractor.py:51-74)
        assert text == "keep\n\nalso"

    def test_missing_polys_tail(self):
        payload = json.dumps({"rec_texts": ["a", "b"], "rec_scores": [1, 1], "dt_polys": []})
        lines, text, ok, _ = parse_ocr_lines(payload)
        assert ok and [ln["bbox"] for ln in lines] == [[], []]

    def test_malformed(self):
        for bad in ["{", '["rec_texts"]', '{"rec_texts": [1]}', "null"]:
            lines, text, ok, err = parse_ocr_lines(bad)
            assert not ok and err

    def test_filter_by_confidence_monotone(self):
        lines = [{"text": str(i), "confidence": i / 10, "bbox": []} for i in range(10)]
        prev = len(lines)
        for c in [0.0, 0.3, 0.5, 0.9, 1.1]:
            kept = filter_by_confidence(lines, c)
            assert len(kept) <= prev
            prev = len(kept)

    def test_line_stats(self):
        lines = [
            {"text": "ab", "confidence": 0.4, "bbox": []},
            {"text": "cdef", "confidence": 0.8, "bbox": []},
        ]
        s = line_stats(lines)
        assert s["total_lines"] == 2
        assert s["total_characters"] == 6
        assert s["low_confidence_lines"] == 1
        assert s["min_confidence"] == 0.4
        assert line_stats([])["total_lines"] == 0


# --- T8 html ----------------------------------------------------------------

class TestHtmlStrip:
    def test_boilerplate_dropped_content_kept(self):
        html = (
            "<html><body>"
            '<nav><a href="/a">home</a> <a href="/b">about us page</a></nav>'
            "<script>var x = 1;</script>"
            "<p>This is the real main content paragraph of the page.</p>"
            "<footer>copyright twenty twenty six all rights reserved</footer>"
            "</body></html>"
        )
        text, spans = strip_html(html)
        assert "real main content" in text
        assert "home" not in text
        assert "var x" not in text
        assert "copyright" not in text
        # spans point at the kept content in the raw html
        assert spans and all(0 <= a < b <= len(html) for a, b in spans)
        joined = " ".join(html[a:b] for a, b in spans)
        assert "real main content" in joined

    def test_link_density_drops_linkfarm_div(self):
        html = (
            "<div><a href='1'>aaaa bbbb cccc dddd</a> <a href='2'>eeee ffff gggg hhhh</a></div>"
            "<p>Normal long paragraph with plenty of plain words in it here.</p>"
        )
        text, _ = strip_html(html)
        assert "aaaa" not in text
        assert "Normal long paragraph" in text

    def test_short_block_dropped_heading_kept(self):
        html = "<p>tiny</p><h2>A heading here</h2><p>A paragraph that is long enough to keep.</p>"
        text, _ = strip_html(html)
        assert "tiny" not in text
        assert "A heading here" in text

    def test_entities(self):
        html = "<p>fish &amp; chips cost &#163;5 at the good old corner shop</p>"
        text, spans = strip_html(html)
        assert "fish & chips" in text
        assert "£" in text

    def test_empty_and_junk(self):
        assert strip_html("") == ("", [])
        assert strip_html("just plain text, no tags, long enough to keep here")[0] != ""


# --- classify / extract dispatch -------------------------------------------

class TestClassifyExtract:
    def test_classify(self):
        assert classify_turn("hello world", "") == "text"
        assert classify_turn("<p>hi</p>", "") == "html"
        assert classify_turn("x", '{"rec_texts": [], "rec_scores": []}') == "ocr_lines"
        assert classify_turn("x", '{"blocks": []}') == "pdf_blocks"
        assert classify_turn("x", "{broken") == "error"
        assert classify_turn("x", '{"weird": 1}') == "error"

    def test_error_rows_never_raise(self):
        row = extract_turn("caption", "{truncated")
        assert row["kind"] == "error" and not row["parse_ok"] and row["error"]
        assert row["extracted_text"] == ""

    def test_payload_kinds_have_empty_spans(self):
        row = extract_turn("cap", '{"blocks": [{"type": 0, "bbox": [0,0,1,1], "lines": [{"spans": [{"text": "x y z"}]}]}]}')
        assert row["kind"] == "pdf_blocks" and row["spans"] == []

    def test_aggregate_conversation(self):
        turns = [
            (2, "ocr_lines", "ocr text"),
            (0, "text", "first"),
            (1, "error", ""),
            (3, "html", "  "),
        ]
        agg = aggregate_conversation(turns)
        assert agg["full_text"] == "first\n\nocr text"
        assert agg["n_turns"] == 4
        assert agg["n_text"] == 2  # text + html
        assert agg["n_ocr"] == 1


def test_rowwise_band_keys_match_wide_signature(spark):
    """Cross-implementation consistency: the per-row streaming-path
    signature (rowwise_band_keys: higher-order array functions) must
    produce exactly the band keys the batch explode+groupBy path
    (minhash_signatures at the same k) produces — same shingles, same
    Carter-Wegman permutations, two independent constructions."""
    from pyspark.sql import functions as F

    from ocr_spark import dedup

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words describing spark shuffles here"),
            (3, "hi"),  # <3 tokens: self-keyed on the rowwise path
            (4, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        ],
        "doc_id bigint, text string",
    )
    rowwise = {
        (r["doc_id"], r["band"]): r["band_key"]
        for r in dedup.rowwise_band_keys(
            docs, self_key="doc_id", bands=8, rows_per_band=2
        ).collect()
    }
    wide = dedup.minhash_signatures(docs, k=16)
    stacked = wide.selectExpr(
        "doc_id",
        "stack(8, " + ", ".join(
            f"{b}, concat({b}, ':', concat_ws('_', cast(m{2 * b} as string),"
            f" cast(m{2 * b + 1} as string)))"
            for b in range(8)
        ) + ") as (band, band_key)",
    )
    batch = {
        (r["doc_id"], r["band"]): r["band_key"] for r in stacked.collect()
    }
    # docs with shingles: every band key identical across constructions
    for key, val in batch.items():
        assert rowwise[key] == val, key
    # identical texts share all band keys; distinct texts share none
    assert all(rowwise[(1, b)] == rowwise[(4, b)] for b in range(8))
    assert all(rowwise[(1, b)] != rowwise[(2, b)] for b in range(8))
    # the short doc self-keys every band (absent from the wide path)
    assert all(rowwise[(3, b)].startswith("short:3:") for b in range(8))
