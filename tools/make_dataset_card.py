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
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--train-token-budget", type=int, default=2_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jobs.full_pipeline import run
    from ocr_spark.queries import doc_transcripts
    from ocr_spark.session import build_session

    spark = build_session(master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="dataset_card_")
    try:
        doc_transcripts(spark, args.sf_dir).write.mode("overwrite").parquet(
            f"{base}/transcripts"
        )
        doc = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
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
