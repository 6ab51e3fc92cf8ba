"""Large-star/small-star connected components (ocr_spark.dedup
.connected_components_two_phase) vs the min-label propagation twin.

The two implementations share one output contract — (doc_id,
cluster_id = component min, one row per node appearing in a pair) — so
they adjudicate each other on any graph; the DuckDB recursive-CTE
oracle adjudicates both at the harness level (cc_two_phase registry
entry reuses the dedup_clusters oracle).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ocr_spark.dedup import connected_components, connected_components_two_phase


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a: long, doc_b: long"
    )


def _collect(df):
    return sorted((r.doc_id, r.cluster_id) for r in df.collect())


def test_two_phase_matches_min_label_on_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    pairs = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
        )
        if a != b
    }
    df = _pairs_df(spark, sorted(pairs))
    assert _collect(connected_components_two_phase(df)) == _collect(
        connected_components(df)
    )


def test_two_phase_converges_on_high_diameter_chain(spark):
    # a 40-node path: diameter 39 — min-label propagation needs ~39
    # rounds, the two-phase algorithm's O(log^2 n) must finish inside
    # its default 12-round budget and still label everything with 0
    chain = [(i, i + 1) for i in range(39)]
    out = _collect(connected_components_two_phase(_pairs_df(spark, chain)))
    assert out == [(i, 0) for i in range(40)]


def test_two_phase_star_and_isolated_pairs(spark):
    # hot-node star (0 joined to 1..20) + two disjoint pairs
    pairs = [(0, i) for i in range(1, 21)] + [(100, 101), (200, 201)]
    out = dict(_collect(connected_components_two_phase(_pairs_df(spark, pairs))))
    assert all(out[i] == 0 for i in range(21))
    assert out[100] == out[101] == 100
    assert out[200] == out[201] == 200


def test_two_phase_plan_has_no_cartesian(spark):
    import io
    from contextlib import redirect_stdout

    df = _pairs_df(spark, [(0, 1), (1, 2), (5, 6)])
    out = connected_components_two_phase(df)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(mode="formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_near_dedup_two_phase_plumbs_through(spark):
    """near_dedup(cc=...) must yield identical kept/cluster sets under
    either component algorithm, and reject unknown names."""
    import pytest

    from ocr_spark.dedup import near_dedup
    from ocr_spark.functions import quality_score

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    scores = docs.select("doc_id", quality_score("text").alias("quality"))
    kept_a, clus_a, _ = near_dedup(docs, scores, cc="min-label")
    kept_b, clus_b, _ = near_dedup(docs, scores, cc="two-phase")
    assert sorted(r.doc_id for r in kept_a.select("doc_id").collect()) == sorted(
        r.doc_id for r in kept_b.select("doc_id").collect()
    )
    assert _collect(clus_a) == _collect(clus_b)
    with pytest.raises(ValueError):
        near_dedup(docs, scores, cc="nope")


def test_kcore_deeper_rounds_stay_consistent(spark):
    """Depth-agnosticism of the k-core unrolling: at 6 rounds (double
    the demo depth) the sf0.001 pair graph's core set must be a
    FIXPOINT — identical to 7 rounds — and every in_core node keeps
    degree >= k within the core subgraph."""
    import ocr_spark.queries as Q

    sf = "/root/testdata/sf0.001"
    six = {
        (r.doc_id, r.degree, r.in_core)
        for r in Q.q_kcore_peel(spark, sf, rounds=6).collect()
    }
    seven = {
        (r.doc_id, r.degree, r.in_core)
        for r in Q.q_kcore_peel(spark, sf, rounds=7).collect()
    }
    assert six == seven  # converged: extra peels change nothing
    for _, degree, in_core in six:
        assert in_core == (degree >= 2)


def test_min_label_raises_on_exhausted_rounds(spark):
    """Silent non-convergence would split a component and leak
    duplicates past representatives(); the loop must fail loudly when
    the round budget is exhausted (diameter > max_iters), and the
    two-phase algorithm must handle the same graph fine."""
    import pytest

    chain = _pairs_df(spark, [(i, i + 1) for i in range(39)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=5)
    out = _collect(connected_components_two_phase(chain))
    assert out == [(i, 0) for i in range(40)]
