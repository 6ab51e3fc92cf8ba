"""End-to-end composed curation run (jobs/full_pipeline.py) at sf0.001.

The committed DATASET_CARD.md artifact is produced by the same ``run()``
at sf0.1; this test reruns the identical chain at sf0.001 and pins the
properties that make the funnel trustworthy: monotone non-increasing
survivor counts, decontamination that catches exactly the verbatim
benchmark leaks (and none of the scrambled decoys), token-budget
enforcement, and packing that conserves the train split's tokens.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from jobs.full_pipeline import run
from ocr_spark.queries import doc_transcripts

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 20000


@pytest.fixture(scope="module")
def card(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("fullpipe"))
    doc_transcripts(spark, SF_DIR).write.mode("overwrite").parquet(
        f"{base}/transcripts"
    )
    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # benchmark set: 2 VERBATIM corpus docs (true leaks the decontam
    # stage must catch) + token-scrambled decoys (near-zero 13-gram
    # overlap -> must NOT be flagged)
    verbatim = doc.filter("doc_id % 250 = 7").select("doc_id", "text")
    scrambled = doc.filter("doc_id % 25 = 3").select(
        "doc_id",
        F.array_join(F.reverse(F.split("text", " ")), " eval ").alias("text"),
    )
    verbatim.unionByName(scrambled).write.mode("overwrite").parquet(
        f"{base}/eval"
    )
    out = run(
        spark,
        f"{base}/transcripts",
        f"{base}/eval",
        f"{base}/dataset",
        train_token_budget=BUDGET,
    )
    out["_base"] = base
    return out


def test_funnel_is_monotone_and_complete(card):
    f = card["funnel"]
    assert f["turns_extracted"] == 500
    assert f["conversations"] == 20
    # each stage can only remove documents
    assert f["gate_input"] == f["conversations"]
    assert f["gate_gated"] <= f["gate_input"]
    assert f["gate_deduped"] <= f["gate_gated"]
    assert f["near_dedup_kept"] <= f["gate_deduped"]
    assert f["decontam_kept"] <= f["near_dedup_kept"]
    assert f["decontam_kept"] + f["decontam_flagged"] == f["near_dedup_kept"]
    assert f["train_docs_final"] <= f["decontam_kept"]


def test_decontam_catches_verbatim_only(spark, card):
    """The two conversations containing the verbatim benchmark docs are
    flagged; the scrambled decoys flag nothing else."""
    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    leaked_convs = {
        r["source"] for r in doc.filter("doc_id % 250 = 7").select("source").collect()
    }
    flagged = {
        r["doc_id"]
        for r in spark.read.parquet(
            f"{card['_base']}/dataset/decontam_flagged"
        ).collect()
    }
    assert flagged == leaked_convs


def test_token_budget_enforced(spark, card):
    train = spark.read.parquet(f"{card['_base']}/dataset/train")
    assert train.agg(F.sum("n_tokens")).collect()[0][0] <= BUDGET
    # the trim is quality-ranked: every kept doc's quality is >= the
    # best quality among cut docs OR the budget simply admitted everyone
    clean = spark.read.parquet(f"{card['_base']}/dataset/clean").filter(
        "split = 'train'"
    )
    cut = clean.join(train.select("doc_id"), "doc_id", "left_anti")
    if cut.count():
        min_kept = train.agg(F.min("quality")).collect()[0][0]
        max_cut = cut.agg(F.max("quality")).collect()[0][0]
        assert min_kept >= max_cut


def test_packing_conserves_train_tokens(spark, card):
    train = spark.read.parquet(f"{card['_base']}/dataset/train")
    packed = spark.read.parquet(f"{card['_base']}/dataset/packed")
    train_tokens = train.agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == train_tokens
    assert packed.agg(F.max("n_tokens")).collect()[0][0] <= card["packed"]["seq_len"]


def test_card_artifacts_written(card):
    base = card["_base"]
    with open(os.path.join(base, "dataset", "card.json")) as fh:
        on_disk = json.load(fh)
    assert on_disk["funnel"] == card["funnel"]
    md = open(os.path.join(base, "dataset", "DATASET_CARD.md")).read()
    assert "## Stage funnel" in md
    assert str(card["funnel"]["turns_extracted"]) in md
