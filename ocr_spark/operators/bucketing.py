"""Bucketed-table co-located joins: the 100 TB join strategy.

Joining ``extracted`` back to ``transcripts`` (or ``conv_text`` to any
per-conversation dimension) on ``conv_id`` shuffles both sides unless
the tables share a bucketing. Writing both tables bucketed by
``conv_id`` (``bucketBy(n, 'conv_id')`` + ``sortBy``) makes every such
join shuffle-free forever after: Spark matches bucket files pairwise and
sort-merge-joins within buckets with no Exchange (asserted in
tests/test_bucketing.py). At 100 TB this converts the dominant repeated
shuffle into a one-time layout cost at write time — the same trade
Iceberg's bucket partition transform makes.

Bucket count guidance: ~(total size / 256 MB) rounded to a power of two,
fixed across all tables that join on the key; both sides must agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str = "conv_id",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> None:
    """Persist as a bucketed+sorted managed table (saveAsTable is required
    — bucket metadata lives in the catalog, plain parquet paths lose it)."""
    spark = df.sparkSession
    if (
        not spark.catalog.tableExists(table)
        and "." not in table
        and spark.catalog.currentDatabase() == "default"
    ):
        # an in-memory catalog forgets tables across JVMs but the managed
        # location survives; saveAsTable then refuses LOCATION_ALREADY_EXISTS.
        # Only an ORPHANED location is cleared — a catalog-known table goes
        # through mode("overwrite")'s normal transactional replace. A real
        # (Hive/Iceberg) catalog never hits this branch. The cleanup is
        # deliberately restricted to UNQUALIFIED names in the default
        # database: <warehouse>/<name> is only the managed location there
        # (db-qualified tables live at <warehouse>/<db>.db/<name>, so a
        # path built from 'db.tbl' would miss the orphan — or worse,
        # with a non-default currentDatabase, delete default.<name>'s
        # live data while the catalog still references it).
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str = "conv_id") -> DataFrame:
    """Join two same-bucketed tables on their bucket key: zero exchanges."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
