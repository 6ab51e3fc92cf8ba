"""Agent-trajectory hygiene + RL-rollout reduction operators (round 5).

Behavioral pins independent of the DuckDB oracles: the pass@k estimator
is re-derived with exact math.comb combinatorics from the (n, c) counts
the query itself reports; the loop detector's run-length algebra is
re-derived in pure Python from the adapter rows; the rollout-dedup
counts must conserve conversations.
"""

from __future__ import annotations

import math

import ocr_spark.queries as Q

SF_DIR = "/root/testdata/sf0.01"


def test_pass_at_k_matches_exact_combinatorics(spark):
    rows = Q.q_pass_at_k(spark, SF_DIR).collect()
    assert rows, "no prompt groups"
    saw_interior = saw_one = False
    for r in rows:
        n, c = r["n_rollouts"], r["n_success"]
        assert 0 <= c <= n
        assert r["pass_at_1"] == round(c / n, 6)
        if n < 4:
            assert r["pass_at_4"] is None
            continue
        expected = 1.0 - math.comb(n - c, 4) / math.comb(n, 4) if n - c >= 4 else 1.0
        assert r["pass_at_4"] == round(expected, 6), (n, c, r["pass_at_4"])
        if r["pass_at_4"] == 1.0:
            saw_one = True
        elif r["pass_at_4"] is not None:
            saw_interior = True
    # the sf0.01 adapter data must exercise both estimator branches
    assert saw_interior and saw_one


def test_agent_loop_detector_matches_pure_python_runs(spark):
    turns = (
        Q.doc_transcripts(spark, SF_DIR)
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    import hashlib

    by_conv: dict[str, list[tuple[int, int]]] = {}
    for r in turns:
        tmpl = int(hashlib.md5(r["text"].encode()).hexdigest()[:8], 16) % 4
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], tmpl))
    expected = {}
    for conv, seq in by_conv.items():
        seq.sort()
        runs, cur = [], 0
        prev = object()
        for _, tmpl in seq:
            if tmpl == prev:
                cur += 1
            else:
                if cur:
                    runs.append(cur)
                cur = 1
                prev = tmpl
        runs.append(cur)
        expected[conv] = (len(seq), len(runs), max(runs), max(runs) >= 3)
    got = {
        r["conv_id"]: (r["n_turns"], r["n_runs"], r["max_run"], r["stuck"])
        for r in Q.q_agent_loop_detector(spark, SF_DIR).collect()
    }
    assert got == expected
    # data must exercise both flag values
    flags = {v[3] for v in got.values()}
    assert flags == {True, False}


def test_prompt_rollout_dedup_conserves_conversations(spark):
    n_convs = Q.doc_transcripts(spark, SF_DIR).select("conv_id").distinct().count()
    rows = Q.q_prompt_rollout_dedup(spark, SF_DIR).collect()
    assert sum(r["n_rollouts"] for r in rows) == n_convs
    for r in rows:
        assert 1 <= r["n_unique_completions"] <= r["n_rollouts"]
        assert r["n_dropped"] == r["n_rollouts"] - r["n_unique_completions"]
        assert r["first_conv"] is not None
