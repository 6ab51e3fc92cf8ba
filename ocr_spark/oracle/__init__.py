"""Frozen pure-Python oracle for the extraction engine.

Each function here re-expresses a data-transforming behavior of the
reference service (cited by file:line in the docstrings) as a pure,
deterministic, single-process Python function. This module is the
*specification*: golden test outputs are whatever these functions
return, and the Spark pipeline must match them byte-for-byte.

No Spark, pandas, or numpy imports here — stdlib only — so the same
module runs identically on the driver and inside executor Python
workers (shipped via --py-files / the package itself).
"""

from ocr_spark.oracle.cleanup import clean_text, clean_text_with_spans
from ocr_spark.oracle.html_strip import strip_html
from ocr_spark.oracle.payloads import parse_ocr_lines, parse_pdf_blocks
from ocr_spark.oracle.extract import (
    classify_turn,
    extract_turn,
    aggregate_conversation,
)

__all__ = [
    "clean_text",
    "clean_text_with_spans",
    "strip_html",
    "parse_ocr_lines",
    "parse_pdf_blocks",
    "classify_turn",
    "extract_turn",
    "aggregate_conversation",
]
