"""End-to-end pipeline: transcripts -> extracted + conv_text + metrics.

Spark recast of the reference's flagship hybrid-extract lifecycle
(SURVEY §3 E3): scan -> classify/route/extract (narrow, vectorized) ->
snapshot write (the checkpoint) -> ordered rollup. The shuffle is the
barrier; the committed snapshot is the cache; resume is an anti-join
against already-committed keys (≙ the sha256 Redis result cache,
``services/redis_service.py:135-202``, minus the TTL).

Snapshot layout: each run appends ``snapshot=N`` subdirectories of
parquet under the output root, with a ``_COMMITTED`` marker written only
after the parquet job succeeds — readers ignore uncommitted snapshots, so
a killed run never corrupts the table (Iceberg would give us this
atomically; the marker is the no-dependency stand-in with the same
reader-visible semantics).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from ocr_spark.operators.aggregate import conv_text_salted, partition_metrics
from ocr_spark.operators.extract import extract, extract_deduped, salt_repartition


def run_extraction(
    transcripts: DataFrame,
    dedupe: bool = True,
    salt_partitions: int | None = None,
) -> DataFrame:
    """transcripts -> extracted (lazy; no action triggered)."""
    df = transcripts
    if salt_partitions:
        df = salt_repartition(df, salt_partitions)
    return extract_deduped(df) if dedupe else extract(df)


def run_pipeline(transcripts: DataFrame, dedupe: bool = True):
    """Returns (extracted, conv_text, metrics) DataFrames, all lazy."""
    extracted = run_extraction(transcripts, dedupe=dedupe)
    rollup = conv_text_salted(extracted)
    metrics = partition_metrics(extracted, run_id=uuid.uuid4().hex[:12])
    return extracted, rollup, metrics


# ---------------------------------------------------------------------------
# Resumable snapshot store
# ---------------------------------------------------------------------------

_MARKER = "_COMMITTED"


def _committed_snapshots(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if name.startswith("snapshot=") and os.path.exists(
            os.path.join(root, name, _MARKER)
        ):
            out.append(os.path.join(root, name))
    return out


def read_snapshots(spark: SparkSession, root: str) -> DataFrame | None:
    paths = _committed_snapshots(root)
    if not paths:
        return None
    return spark.read.parquet(*paths)


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    out_root: str,
    run_id: str | None = None,
) -> DataFrame:
    """Extract only the turns not yet in a committed snapshot, then append.

    Returns the full committed ``extracted`` table after the run. Running
    twice on the same input is a no-op the second time; a run killed
    before commit leaves no visible partial state (marker-gated reads).

    Each committed snapshot also gets a per-partition lineage/metrics
    table under ``<out_root>/metrics/snapshot=N`` (run_id, snapshot,
    partition_id, turns in/out, bytes in/out, parse failures — ≙ the
    reference's stats + progress rows, SURVEY §1.3), computed from the
    committed parquet so the numbers describe exactly what readers see.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    existing = read_snapshots(spark, out_root)
    todo = transcripts
    if existing is not None:
        done_keys = existing.select("conv_id", "turn_idx")
        todo = transcripts.join(done_keys, ["conv_id", "turn_idx"], "left_anti")
    snap_idx = len(_committed_snapshots(out_root))
    snap_dir = os.path.join(out_root, f"snapshot={snap_idx}")
    extracted = run_extraction(todo)
    extracted.write.mode("overwrite").parquet(snap_dir)
    metrics = partition_metrics(
        spark.read.parquet(snap_dir), run_id=run_id
    ).withColumn("snapshot", F.lit(snap_idx))
    metrics.write.mode("overwrite").parquet(
        os.path.join(out_root, "metrics", f"snapshot={snap_idx}")
    )
    # job succeeded -> publish the snapshot
    with open(os.path.join(snap_dir, _MARKER), "w") as fh:
        fh.write("ok\n")
    return read_snapshots(spark, out_root)


def compact_snapshots(
    spark: SparkSession, out_root: str, target_partitions: int | None = None
) -> int:
    """Maintenance: rewrite all committed snapshots into one.

    Incremental runs accumulate `snapshot=N` directories whose file
    counts grow without bound — the classic small-files problem that
    degrades scan planning and shuffle fan-in at 100 TB (Iceberg's
    `rewrite_data_files` compaction; here the marker-store equivalent).
    The compacted snapshot is written and committed FIRST, then the old
    directories are dropped, so a crash at any point leaves a readable
    table (worst case: duplicate snapshots, resolved by the next
    compaction — readers of `read_snapshots` would double-count, so the
    old dirs are unpublished by deleting their markers before removal).
    Returns the number of snapshots compacted away.
    """
    import shutil

    paths = _committed_snapshots(out_root)
    if len(paths) <= 1:
        return 0
    df = spark.read.parquet(*paths)
    if target_partitions:
        df = df.repartition(target_partitions, "conv_id")
    tmp_dir = os.path.join(out_root, "_compact_tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp_dir)
    # unpublish old snapshots before the new one becomes visible so no
    # reader ever sees rows twice
    for p in paths:
        os.remove(os.path.join(p, _MARKER))
    next_idx = 1 + max(
        int(os.path.basename(p).split("=", 1)[1]) for p in paths
    )
    final_dir = os.path.join(out_root, f"snapshot={next_idx}")
    os.rename(tmp_dir, final_dir)
    with open(os.path.join(final_dir, _MARKER), "w") as fh:
        fh.write("ok\n")
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    return len(paths)


def vacuum_uncommitted(out_root: str) -> list[str]:
    """Maintenance: drop snapshot directories a crashed run left behind
    (no ``_COMMITTED`` marker — invisible to readers, but they hold disk
    and slow directory listings). Returns the removed paths."""
    import shutil

    removed = []
    if not os.path.isdir(out_root):
        return removed
    for name in sorted(os.listdir(out_root)):
        path = os.path.join(out_root, name)
        if (
            name.startswith("snapshot=")
            and os.path.isdir(path)
            and not os.path.exists(os.path.join(path, _MARKER))
        ):
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    if os.path.isdir(os.path.join(out_root, "_compact_tmp")):
        shutil.rmtree(os.path.join(out_root, "_compact_tmp"), ignore_errors=True)
        removed.append(os.path.join(out_root, "_compact_tmp"))
    return removed


def read_metrics(spark: SparkSession, out_root: str) -> DataFrame | None:
    """All lineage/metrics rows for committed snapshots under out_root."""
    paths = [
        os.path.join(out_root, "metrics", os.path.basename(p))
        for p in _committed_snapshots(out_root)
        if os.path.isdir(os.path.join(out_root, "metrics", os.path.basename(p)))
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)
