"""Bucketed co-located join: correctness + the shuffle-free plan shape."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from ocr_spark import fixtures
from ocr_spark.operators.bucketing import bucketed_join, write_bucketed
from ocr_spark.operators.extract import extract


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    t = fixtures.transcripts_df(spark, 15)
    write_bucketed(t.select("conv_id", "turn_idx", "role", "ts"), "t_turns", 4)
    write_bucketed(extract(t), "t_extracted", 4)
    yield ("t_turns", "t_extracted")
    spark.sql("DROP TABLE IF EXISTS t_turns")
    spark.sql("DROP TABLE IF EXISTS t_extracted")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the planner exercises the bucketed path (at
    # real scale neither side fits in a broadcast; here both do)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right)
        p = _plan(joined)
        import re

        assert not re.findall(r"^\(\d+\) Exchange", p, flags=re.MULTILINE), p
        assert "SortMergeJoin" in p
        assert "Bucketed: true" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right)
    # transcripts joined to extracted on conv_id: every turn pairs with
    # every extracted row of its conversation
    want = (
        spark.table(left)
        .groupBy("conv_id")
        .count()
        .withColumn("sq", F.col("count") * F.col("count"))
        .agg(F.sum("sq"))
        .collect()[0][0]
    )
    assert joined.count() == want


def test_bucketed_layout_audit_registry_row(spark):
    """The registry-visible audit (VERDICT r03 #6): one row proving the
    conv_id-bucketed extracted<->conv_text join planned AND executed with
    zero Exchange at the driver's data, via the registered callable."""
    import ocr_spark.queries as Q

    try:
        row = Q.q_bucketed_layout_audit(spark, "/root/testdata/sf0.001").collect()[0]
    finally:
        spark.sql("DROP TABLE IF EXISTS audit_extracted_b")
        spark.sql("DROP TABLE IF EXISTS audit_conv_text_b")
    assert row.join_exchanges == 0
    assert row.sort_merge_join
    assert row.joined_turns > 0
