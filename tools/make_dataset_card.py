#!/usr/bin/env python
"""Produce the committed DATASET_CARD.md: run the composed curation
chain (jobs/full_pipeline.py) end-to-end at sf0.1 and copy the card
artifacts into the repo.

    python tools/make_dataset_card.py [--sf-dir /root/testdata/sf0.1]

Input synthesis is deterministic and self-contained: transcripts come
from the same documents->conversations adapter the oracle harness
value-checks (ocr_spark.queries.doc_transcripts), and the held-out
benchmark set mixes verbatim corpus docs (true leaks decontamination
must catch) with token-scrambled decoys (near-zero 13-gram overlap —
must NOT be flagged), mirroring tests/test_full_pipeline.py at 100x
the rows.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # `python tools/make_dataset_card.py` puts tools/ first
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--train-token-budget", type=int, default=150_000)
    ap.add_argument("--turns-per-conv", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import Window, functions as F

    from jobs.full_pipeline import run
    from ocr_spark.session import build_session

    spark = build_session(master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dataset_card_")
    try:
        doc = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        # Same (conv_id, turn_idx, role, text, tool, ts) shape as the
        # oracle-checked doc_transcripts adapter, but at conversation
        # granularity --turns-per-conv so the card's funnel operates on a
        # corpus of hundreds of conversations, not one per source.
        k = args.turns_per_conv
        # Rank within source (doc_ids are strided across sources, so a raw
        # doc_id/k would never merge two docs of the same source), then take
        # consecutive k-blocks of that rank as one conversation.
        rank_w = Window.partitionBy("source").orderBy("doc_id")
        renamed = doc.select(
            "source", "doc_id", "text", (F.row_number().over(rank_w) - 1).alias("_rk")
        ).select(
            F.concat_ws(
                "_", "source", (F.col("_rk") / k).cast("int").cast("string")
            ).alias("conv_id"),
            "doc_id",
            "text",
        )
        w = Window.partitionBy("conv_id").orderBy("doc_id")
        turns = renamed.select(
            "conv_id",
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.col("text"),
            F.lit("").alias("tool"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        )
        # Deterministic duplicate injection so the card's dedup stages are
        # demonstrative (mirrors the verbatim-leak/decoy injection below for
        # decontam): one VERBATIM copy per source (caught by the gate's
        # exact sha dedup) and one NEAR copy per source with turn 0
        # perturbed (passes exact dedup, caught by MinHash/LSH near-dedup).
        exact_dups = turns.filter(F.col("conv_id").endswith("_1")).withColumn(
            "conv_id", F.concat(F.col("conv_id"), F.lit("_xdup"))
        )
        near_dups = (
            turns.filter(F.col("conv_id").endswith("_2"))
            .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_ndup")))
            .withColumn(
                "text",
                F.when(
                    F.col("turn_idx") == 0, F.concat(F.lit("nearly "), F.col("text"))
                ).otherwise(F.col("text")),
            )
        )
        turns.unionByName(exact_dups).unionByName(near_dups).write.mode(
            "overwrite"
        ).parquet(f"{base}/transcripts")
        verbatim = doc.filter("doc_id % 250 = 7").select("doc_id", "text")
        scrambled = doc.filter("doc_id % 25 = 3").select(
            "doc_id",
            F.array_join(F.reverse(F.split("text", " ")), " eval ").alias("text"),
        )
        verbatim.unionByName(scrambled).write.mode("overwrite").parquet(
            f"{base}/eval"
        )
        card = run(
            spark,
            f"{base}/transcripts",
            f"{base}/eval",
            f"{base}/dataset",
            train_token_budget=args.train_token_budget,
        )
        card["input"] = {
            "sf_dir": args.sf_dir,
            "benchmark_docs": {
                "verbatim_leaks": verbatim.count(),
                "scrambled_decoys": scrambled.count(),
            },
        }
        with open(os.path.join(REPO, "DATASET_CARD.json"), "w") as fh:
            json.dump(card, fh, indent=1, sort_keys=True)
        shutil.copy(
            os.path.join(base, "dataset", "DATASET_CARD.md"),
            os.path.join(REPO, "DATASET_CARD.md"),
        )
        print(json.dumps(card))
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
