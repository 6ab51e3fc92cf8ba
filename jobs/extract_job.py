#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (north rule:
"launched via spark-submit --py-files on multi-executor clusters").

    spark-submit --master <cluster> --py-files ocr_spark.zip \
        jobs/extract_job.py --input /path/transcripts_parquet \
        --output /path/out --salt-partitions 512

Runs the resumable snapshot pipeline (anti-join against committed
snapshots -> salted vectorized extraction -> atomic snapshot commit with
per-partition lineage/metrics) and then the ordered conversation rollup
to ``<output>/conv_text``. Re-running after a kill resumes from the last
committed snapshot. Prints a one-line JSON summary on completion.

Package the py-files zip with:  python tools/make_pyfiles.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet dir")
    ap.add_argument("--output", required=True, help="output root (snapshots+rollup)")
    ap.add_argument("--salt-partitions", type=int, default=0,
                    help="salted repartition width (0 = scan partitioning)")
    ap.add_argument("--auto-salt", type=int, default=0, metavar="N",
                    help="probe for conversation skew (logged in summary) and "
                         "repartition to N only if the source is "
                         "under-parallelized; skew itself is handled at the "
                         "salted rollup, never by shuffling raw payloads")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--tree-store", action="store_true",
                    help="input is a branching message store "
                         "(msg_id, parent_id, role, text, tool, ts — "
                         "fork/regeneration-capable chat stores persist "
                         "conversations as trees): resolve the forest and "
                         "linearize every root-to-leaf path into a "
                         "(conv_id, turn_idx) transcript before extraction "
                         "(conv_id = 'thread<leaf msg_id>', turn_idx = "
                         "root-first position)")
    ap.add_argument("--bucketed-output", type=int, default=0, metavar="N",
                    help="also publish extracted + conv_text as managed "
                         "tables bucketed by conv_id into N buckets "
                         "(bucketBy + sortBy via saveAsTable), so every "
                         "downstream conv_id join between them is "
                         "shuffle-free; pick N ~ total_size/256MB, same N "
                         "for every table joined on conv_id")
    ap.add_argument("--bucketed-prefix", default="ocr",
                    help="table-name prefix for --bucketed-output")
    args = ap.parse_args()

    # spark-submit provides master/conf; build on whatever it gives us.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("ocr_spark_extract")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from ocr_spark.operators.aggregate import conv_text_salted
    from ocr_spark.operators.extract import maybe_salt, salt_repartition
    from ocr_spark.pipeline import read_metrics, run_resumable

    t0 = time.time()
    transcripts = spark.read.parquet(args.input)
    forest_issues = None
    msgs_unreached = None
    if args.tree_store:
        # tree -> flat threads: validate the closed-forest precondition
        # FIRST (a store we don't control can carry duplicate ids,
        # self/reciprocal parent cycles, or dangling parents from hard
        # deletes — without the gate the doubling join would silently
        # drop the chains hanging off them), quarantine flagged rows to
        # a side output, then pointer-doubling linearization (O(log
        # depth) hash-join rounds) and the payload columns join back on
        # the 8-byte msg_id; the flat (conv_id, turn_idx) pipeline
        # takes over. Cycles of length >= 3 still fail loudly inside
        # the resolver rather than mislabeling. Shared-prefix
        # duplication across sibling threads is inherent to
        # linearization; downstream dedup/novelty ops price and mask it.
        from pyspark.sql import functions as F

        from ocr_spark import rollouts

        msgs = transcripts
        issues = rollouts.validate_forest(msgs.select("msg_id", "parent_id"))
        forest_issues = issues.count()
        if forest_issues:
            issues.write.mode("overwrite").parquet(
                os.path.join(args.output, "forest_issues")
            )
            msgs = msgs.join(issues.select("msg_id").distinct(), "msg_id", "left_anti")
        threads = rollouts.linearize_threads(msgs.select("msg_id", "parent_id"))
        if forest_issues:
            # chains hanging under quarantined rows drop out of
            # linearization — report the loss instead of hiding it
            msgs_unreached = (
                msgs.count() - threads.select("msg_id").distinct().count()
            )
        transcripts = threads.join(msgs.drop("parent_id"), "msg_id").select(
            F.concat(F.lit("thread"), F.col("thread_id").cast("string")).alias(
                "conv_id"
            ),
            F.col("seq").cast("int").alias("turn_idx"),
            "role",
            "text",
            "tool",
            "ts",
        )
    salted = False
    skew_detected = False
    if args.auto_salt:
        raw = transcripts
        transcripts, skew_detected = maybe_salt(raw, args.auto_salt)
        # 'salted' reports whether a repartition was actually applied
        # (under-parallelized source); 'skew_detected' is the probe flag —
        # skew itself is neutralized at the salted rollup, not here
        salted = transcripts is not raw
    elif args.salt_partitions:
        transcripts = salt_repartition(transcripts, args.salt_partitions)
        salted = True
    snap_root = os.path.join(args.output, "extracted")
    committed = run_resumable(spark, transcripts, snap_root, run_id=args.run_id)
    rollup_dir = os.path.join(args.output, "conv_text")
    rollup = conv_text_salted(committed)
    rollup.write.mode("overwrite").parquet(rollup_dir)

    bucketed_tables = []
    bucketed_join_exchanges = None
    if args.bucketed_output:
        from ocr_spark.operators.bucketing import bucketed_join, write_bucketed

        ext_table = f"{args.bucketed_prefix}_extracted"
        conv_table = f"{args.bucketed_prefix}_conv_text"
        write_bucketed(committed, ext_table, args.bucketed_output)
        write_bucketed(
            spark.read.parquet(rollup_dir),
            conv_table,
            args.bucketed_output,
            sort_cols=("conv_id",),
        )
        bucketed_tables = [ext_table, conv_table]
        # co-location proof, recorded in the job summary: count Exchange
        # nodes in the physical plan of the conv_id join between the two
        # tables with broadcast disabled (the shape the 100 TB join takes)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, ext_table, conv_table)
            plan_str = joined._jdf.queryExecution().executedPlan().toString()
            bucketed_join_exchanges = plan_str.count("Exchange")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    metrics = read_metrics(spark, snap_root)
    conversations = spark.read.parquet(rollup_dir).count()
    summary = {
        "turns_committed": committed.count(),
        "conversations": conversations,
        "parse_failures": (
            metrics.groupBy().sum("parse_failures").collect()[0][0] if metrics else None
        ),
        "wall_s": round(time.time() - t0, 1),
        "salted": salted,
        "skew_detected": skew_detected,
        # every linearized thread becomes exactly one rollup conversation,
        # so no separate distinct-count job is spent on this number
        "linearized_threads": conversations if args.tree_store else None,
        "forest_issues": forest_issues,
        "messages_unreached": msgs_unreached,
        "output": args.output,
        "bucketed_tables": bucketed_tables,
        "bucketed_join_exchanges": bucketed_join_exchanges,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
