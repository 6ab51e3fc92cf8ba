"""Reusable column expressions (the engine's scalar-function surface).

Every function here returns a pyspark ``Column`` built from JVM-side
builtins — no UDFs — so they compose into any batch OR streaming plan
unchanged and stay inside whole-stage codegen. The batch query registry
(``ocr_spark.queries``) and the streaming twins both build on these;
``tests/test_streaming.py`` proves a gate built from them produces
identical rows under ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the engine-wide convention)."""
    return F.split(F.trim(F.col(text) if isinstance(text, str) else text), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def quality_score(text: Column | str) -> Column:
    """Length/punctuation quality heuristic in [0, 1] (round 6)."""
    col = F.col(text) if isinstance(text, str) else text
    length = F.length(col)
    punct_ratio = (
        length - F.length(F.regexp_replace(col, r"[.,;:!?]", ""))
    ) / length
    return F.round(
        F.least(length, F.lit(400)).cast("double") / 400.0 * (1.0 - punct_ratio), 6
    )


def hashed_bigram_score(toks_col: str) -> Column:
    """fastText-style hashed-bigram linear score (sigmoid of the mean
    integer bucket weight; see queries.q_hashed_ngram_classifier). Takes
    the NAME of an array<string> token column (SQL lambda expressions
    can't close over arbitrary Column objects); null for inputs with
    fewer than two tokens."""
    if not toks_col.replace("_", "").isalnum():
        raise ValueError(f"not a plain column name: {toks_col!r}")
    t = toks_col
    wsum = F.expr(
        f"aggregate(transform(sequence(1, size({t}) - 1),"
        f" i -> concat(element_at({t}, i), '_', element_at({t}, i + 1))),"
        " 0L, (acc, g) -> acc +"
        " (cast(conv(substr(md5(g), 1, 4), 16, 10) as bigint) * 2654435761) % 1048576"
        " - 524288)"
    )
    n = F.size(F.col(t)) - 1
    return F.when(
        n >= 1,
        F.round(1.0 / (1.0 + F.exp(-(wsum.cast("double") / (n * 1048576.0)))), 6),
    )


def stopword_ratio(text: Column | str) -> Column:
    """' the '/' a ' stopword density (the lang-id heuristic's core)."""
    col = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    the_hits = (
        F.length(padded) - F.length(F.regexp_replace(padded, " the ", " "))
    ) / 4.0
    a_hits = (F.length(padded) - F.length(F.regexp_replace(padded, " a ", " "))) / 2.0
    return F.round((the_hits + a_hits) / token_count(col), 6)


def split_bucket(doc_id: Column | str, text: Column | str) -> Column:
    """Content-keyed 0-99 bucket for deterministic dataset splits:
    md5(doc_id ':' text) first 8 hex digits mod 100. Stable under corpus
    growth and identical across batch and streaming (single source of
    truth — the oracle mirrors this exact formula)."""
    d = (F.col(doc_id) if isinstance(doc_id, str) else doc_id).cast("string")
    t = F.col(text) if isinstance(text, str) else text
    return (
        F.conv(F.substring(F.md5(F.concat(d, F.lit(":"), t).cast("binary")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )


def split_assign(doc_id: Column | str, text: Column | str) -> Column:
    """train/val/test label from split_bucket (<90/<95/else)."""
    bucket = split_bucket(doc_id, text)
    return (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
