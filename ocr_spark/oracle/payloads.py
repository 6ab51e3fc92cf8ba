"""Tool-payload parsers: PDF text blocks (T1/T2) and OCR line results (T3).

These re-express, over JSON payload strings, the reference's
post-inference relational semantics:

- ``parse_pdf_blocks`` ≙ block extraction + reading-order text:
  keep blocks with ``type == 0`` (text, not image) and concatenate every
  ``span.text`` across the block's lines with no separator, strip, skip
  empties (``services/pdf_hybrid_service/helpers/block_extractor.py:26-38``);
  page text is the blocks sorted in reading order — PyMuPDF
  ``get_text("text", sort=True)`` orders top-to-bottom then
  left-to-right (``services/pdf_hybrid_service/helpers/text_extractor.py:24``),
  frozen here as the sort key ``(round(y0, 1), x0, original_index)`` —
  joined with newlines.

- ``parse_ocr_lines`` ≙ PaddleOCR Pipeline-dict normalization
  (``services/ocr_service/helpers/text_extractor.py:51-74``): zip
  ``rec_texts``/``rec_scores``, keep ``score >= min_confidence``
  (production ``DROP_SCORE`` default 0.5 — ``config.py:43``), flatten the
  matching 4-point ``dt_polys`` polygon to 8 floats
  (``text_extractor.py:61-67``), join kept texts with ``"\\n"``
  (``text_extractor.py:193``). Note the dict path appends kept texts to
  the full text *without* a blank-skip (unlike the legacy detection
  path) — frozen faithfully.

Malformed payloads never raise: they return ``parse_ok=False`` with an
error string (≙ per-page error isolation,
``tasks/pdf_hybrid_tasks.py:189-195``).
"""

from __future__ import annotations

import json

DEFAULT_MIN_CONFIDENCE = 0.5


def parse_pdf_blocks(payload: str, doc=None):
    """Parse a PyMuPDF ``get_text("dict")``-shaped JSON payload.

    Returns ``(blocks, text, parse_ok, error)`` where blocks is a list of
    ``{"type": "text", "text": str, "bbox": [x0, y0, x1, y1]}`` in
    reading order and ``text`` is their newline-join.

    ``doc``: optionally the already-``json.loads``-ed payload — the
    classify step has parsed it once; re-parsing here would double the
    JSON cost of the payload path (byte-identical results either way).
    """
    try:
        if doc is None:
            doc = json.loads(payload)
        raw_blocks = doc["blocks"]
        if not isinstance(raw_blocks, list):
            raise ValueError("blocks is not a list")
        kept = []
        for seq, block in enumerate(raw_blocks):
            if not isinstance(block, dict) or block.get("type") != 0:
                continue
            text = ""
            for line in block.get("lines", []):
                for span in line.get("spans", []):
                    text += span.get("text", "")
            if not text.strip():
                continue
            bbox = block.get("bbox", [0.0, 0.0, 0.0, 0.0])
            bbox = [float(v) for v in bbox]
            kept.append((seq, bbox, text.strip()))
        # reading order: top-to-bottom then left-to-right, stable on input order
        kept.sort(key=lambda item: (round(item[1][1], 1), item[1][0], item[0]))
        blocks = [{"type": "text", "text": t, "bbox": b} for _, b, t in kept]
        return blocks, "\n".join(b["text"] for b in blocks), True, None
    except Exception as exc:  # malformed payload -> error row, never a failure
        return [], "", False, f"pdf_blocks parse error: {exc}"


def parse_ocr_lines(payload: str, min_confidence: float = DEFAULT_MIN_CONFIDENCE, doc=None):
    """Parse a PaddleOCR Pipeline-dict-shaped JSON payload.

    Returns ``(lines, text, parse_ok, error)`` where lines is a list of
    ``{"text": str, "confidence": float, "bbox": [8 floats]}`` for
    detections at or above ``min_confidence``.

    ``doc``: optionally the already-parsed payload (see parse_pdf_blocks).
    """
    try:
        if doc is None:
            doc = json.loads(payload)
        if not isinstance(doc, dict) or "rec_texts" not in doc or "rec_scores" not in doc:
            raise ValueError("not a rec_texts/rec_scores dict")
        rec_texts = doc["rec_texts"]
        rec_scores = doc["rec_scores"]
        dt_polys = doc.get("dt_polys", [])
        lines = []
        text_parts = []
        for i, (text, score) in enumerate(zip(rec_texts, rec_scores)):
            score = float(score)
            if score < min_confidence:
                continue
            bbox = []
            if i < len(dt_polys):
                bbox = [float(coord) for point in dt_polys[i] for coord in point]
            text = str(text)
            lines.append({"text": text, "confidence": score, "bbox": bbox})
            text_parts.append(text)
        return lines, "\n".join(text_parts), True, None
    except Exception as exc:
        return [], "", False, f"ocr_lines parse error: {exc}"


def filter_by_confidence(lines, min_confidence: float):
    """F2 standalone confidence filter (``text_extractor.py:196-207``)."""
    return [ln for ln in lines if ln.get("confidence", 0.0) >= min_confidence]


def line_stats(lines):
    """T9 per-unit line statistics (``text_extractor.py:219-240``)."""
    if not lines:
        return {
            "total_lines": 0,
            "total_characters": 0,
            "average_confidence": 0.0,
            "min_confidence": 0.0,
            "max_confidence": 0.0,
            "low_confidence_lines": 0,
        }
    confs = [ln["confidence"] for ln in lines]
    return {
        "total_lines": len(lines),
        "total_characters": sum(len(ln["text"]) for ln in lines),
        "average_confidence": sum(confs) / len(confs),
        "min_confidence": min(confs),
        "max_confidence": max(confs),
        "low_confidence_lines": sum(1 for c in confs if c < 0.5),
    }
