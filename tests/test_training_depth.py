"""Depth-robustness of the in-engine training loops (VERDICT r03 #5).

The registered bpe_train/kmeans_train/logreg_train/pagerank queries run
at demo depths from ``ocr_spark.params`` with DuckDB oracles unrolled in
lockstep by generator functions. These tests prove the unrolling is
depth-AGNOSTIC — a much deeper configuration (BPE 24 merges, k-means 5
Lloyd rounds) stays value-identical between the iterative Spark loop and
a freshly generated oracle — so deepening a loop for a real run is a
parameter change, not new code.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import ocr_spark.queries as Q
from ocr_spark.oracles import (
    _bpe_train_sql,
    _kcore_sql,
    _kmeans_train_sql,
    _logreg_train_sql,
    _pagerank_sql,
)

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _assert_same(sdf: pd.DataFrame, odf: pd.DataFrame, keys: list[str]) -> None:
    s = sdf.sort_values(keys).reset_index(drop=True)
    o = odf.sort_values(keys).reset_index(drop=True)
    assert len(s) == len(o)
    pd.testing.assert_frame_equal(
        s[sorted(s.columns)], o[sorted(o.columns)], check_dtype=False
    )


def test_bpe_train_24_merges_matches_oracle(spark, duck):
    sdf = Q.q_bpe_train(spark, SF_DIR, steps=24).toPandas()
    odf = duck.execute(_bpe_train_sql(24)).df()
    assert len(sdf) == 24  # the corpus really sustains 24 merges
    _assert_same(sdf, odf, ["step"])


def test_kmeans_train_5_iters_matches_oracle(spark, duck):
    sdf = Q.q_kmeans_train(spark, SF_DIR, iters=5).toPandas()
    odf = duck.execute(_kmeans_train_sql(5)).df()
    _assert_same(sdf, odf, ["cluster"])


def test_logreg_train_8_steps_matches_oracle(spark, duck):
    """8 full-batch gradient steps (vs the registered demo depth of 3):
    the Spark loop and a freshly unrolled oracle stay value-identical,
    so deepening the optimizer for a real run is a parameter change."""
    sdf = Q.q_logreg_train(spark, SF_DIR, rounds=8).toPandas()
    odf = duck.execute(_logreg_train_sql(8)).df()
    _assert_same(sdf, odf, ["y_true", "pred"])


def test_pagerank_8_rounds_matches_oracle(spark, duck):
    """8 damped power iterations (vs the registered 3): deeper lineage
    exercises the localCheckpoint cadence, and ranks must still match
    the lockstep-unrolled oracle to 6 decimals."""
    sdf = Q.q_pagerank(spark, SF_DIR, rounds=8).toPandas()
    odf = duck.execute(_pagerank_sql(8)).df()
    _assert_same(sdf, odf, ["doc_id"])


def test_kcore_peel_deeper_and_stricter_matches_oracle(spark, duck):
    """6 peel rounds at k=3 (vs the registered 3 rounds at k=2): a
    stricter core over the same pair graph, proving the peel unrolling
    is depth- AND threshold-agnostic."""
    sdf = Q.q_kcore_peel(spark, SF_DIR, rounds=6, k=3).toPandas()
    odf = duck.execute(_kcore_sql(6, 3)).df()
    _assert_same(sdf, odf, ["doc_id"])


def test_registered_depths_come_from_params(spark):
    """The registry's oracle text must embed exactly the shared demo
    depths — a drift between params and the generated SQL would silently
    decouple the two engines."""
    from ocr_spark import params
    from ocr_spark.oracles import ORACLES

    assert f"b{params.BPE_TRAIN_STEPS - 1}" in ORACLES["bpe_train"]
    assert f"b{params.BPE_TRAIN_STEPS}" not in ORACLES["bpe_train"]
    assert f"FROM a{params.KMEANS_ITERS}" in ORACLES["kmeans_train"]
    assert f"wl{params.LOGREG_ROUNDS} w" in ORACLES["logreg_train"]
    assert f"FROM r{params.PAGERANK_ROUNDS}" in ORACLES["pagerank"]
