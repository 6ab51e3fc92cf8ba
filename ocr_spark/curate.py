"""Corpus curation: the composed training-data pipeline.

One declarative plan chains the engine's curation stages over an
extracted corpus — quality gate, language gate, exact near-dup removal,
deterministic train/val/test split — and the stage funnel (how many
documents each gate dropped) is computed by Observation nodes INSIDE the
same plan, so materializing the curated output produces the funnel as a
side effect: one pass over the corpus, no counting jobs.

Stage shapes (all covered individually by the query registry + oracles;
this module only composes them):

- gates: scalar builtin expressions (``ocr_spark.functions``) — narrow,
  whole-stage codegen, identical under streaming;
- exact dedup: ``sha2(text)`` keep-first via a single groupBy with a
  lexicographic struct-min (the chunk-dedup pattern — no composite-key
  arithmetic, no second shuffle);
- split: content-keyed md5 bucket (stable under corpus growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from ocr_spark.functions import (
    quality_score,
    split_assign,
    stopword_ratio,
    token_count,
)

DEFAULT_MIN_QUALITY = 0.1
DEFAULT_MIN_STOPWORD = 0.0
DEFAULT_MIN_TOKENS = 5


def gate_corpus(
    corpus: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_stopword: float = DEFAULT_MIN_STOPWORD,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """The curation gate, shared by batch ``curate`` and the streaming
    twin (single source of truth — a threshold or score added here
    applies to both): scores every document and keeps rows passing the
    length / quality / stopword thresholds. Output columns:
    (doc_id, text, *keep, n_tokens, quality)."""
    scored = corpus.select(
        "doc_id",
        "text",
        *keep,
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
        stopword_ratio("text").alias("stopword"),
    )
    return scored.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality") >= min_quality)
        & (F.col("stopword") >= min_stopword)
    ).drop("stopword")


def curate(
    corpus: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_stopword: float = DEFAULT_MIN_STOPWORD,
    min_tokens: int = DEFAULT_MIN_TOKENS,
) -> tuple[DataFrame, dict[str, Observation]]:
    """corpus(doc_id, text) -> (curated, observations).

    ``curated``: (doc_id, text, n_tokens, quality, split) — one row per
    surviving document. ``observations``: name -> Observation; read
    ``obs.get`` AFTER an action on ``curated`` for the funnel counts.
    """
    obs = {name: Observation(name) for name in ("input", "gated", "deduped")}

    observed_in = corpus.observe(obs["input"], F.count(F.lit(1)).alias("n"))
    gated = gate_corpus(
        observed_in,
        min_quality=min_quality,
        min_stopword=min_stopword,
        min_tokens=min_tokens,
    ).observe(obs["gated"], F.count(F.lit(1)).alias("n"))

    # exact dedup, keep-first: one shuffle, lexicographic struct-min
    keyed = gated.withColumn("sha", F.sha2(F.col("text").cast("binary"), 256))
    deduped = (
        keyed.groupBy("sha")
        .agg(
            F.min(
                F.struct("doc_id", "text", "n_tokens", "quality")
            ).alias("r")
        )
        .select("r.*")
        .observe(obs["deduped"], F.count(F.lit(1)).alias("n"))
    )

    return deduped.withColumn("split", split_assign("doc_id", "text")), obs


def funnel(observations: dict[str, Observation]) -> dict[str, int]:
    """Stage counts, readable after one action on the curated frame."""
    return {name: int(o.get["n"]) for name, o in observations.items()}


def ngram_novelty(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty): per-document fraction of
    distinct 3-gram shingles no EARLIER doc (doc_id order) contains —
    the data-pruning curation signal that down-weights near-boilerplate.
    Deterministic (no rng); registry query ``ngram_novelty``
    value-checks this exact function against the DuckDB oracle.

    Scale shape: one partial-aggregated groupBy(shingle).min(doc_id)
    for the first-seeing doc, an equi-join back on the gram key, one
    partial-aggregated per-doc rollup. Both gram-key shuffles are
    combiner-friendly."""
    from ocr_spark.dedup import shingles

    sh = shingles(docs)
    first_seen = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first_seen, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


def ngram_novelty_vs_corpus(batch: DataFrame, corpus: DataFrame) -> DataFrame:
    """Ingest-time novelty: each batch doc scored against a FROZEN
    corpus's gram set (the production crawl case — the corpus reduction
    is computed once and reusable across every future ingest if
    materialized). Never batch x corpus: the batch's distinct shingles
    LEFT-join the corpus gram set on the gram key. Registry query
    ``ngram_novelty_incremental`` value-checks this function."""
    from ocr_spark.dedup import shingles

    corpus_grams = (
        shingles(corpus).select("shingle").distinct().withColumn("in_corpus", F.lit(1))
    )
    marked = shingles(batch).join(corpus_grams, "shingle", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.expr("if(in_corpus is null, 1, 0)"))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
        )
    )
