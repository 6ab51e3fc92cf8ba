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


def test_best_of_n_winner_and_gain_rederived(spark):
    rewards = {
        (r["prompt_bucket"], r["conv_id"]): r["reward"]
        for r in Q.q_grpo_advantages(spark, SF_DIR).collect()
    }
    by_bucket: dict[int, list[tuple[float, str]]] = {}
    for (b, conv), rew in rewards.items():
        by_bucket.setdefault(b, []).append((rew, conv))
    for r in Q.q_best_of_n_selection(spark, SF_DIR).collect():
        group = by_bucket[r["prompt_bucket"]]
        # winner = max reward, conv_id ascending tiebreak
        best = max(group, key=lambda t: (t[0], [-ord(c) for c in t[1]]))
        assert r["best_conv"] == best[1]
        assert r["n_rollouts"] == len(group)
        assert abs(r["best_reward"] - best[0]) < 1e-6
        mean = sum(t[0] for t in group) / len(group)
        assert abs(r["mean_reward"] - mean) < 1e-5
        assert abs(r["selection_gain"] - (best[0] - mean)) < 1e-5
        assert r["selection_gain"] >= 0


def test_grpo_advantages_are_group_standardized(spark):
    rows = Q.q_grpo_advantages(spark, SF_DIR).collect()
    by_bucket: dict[int, list[float]] = {}
    for r in rows:
        by_bucket.setdefault(r["prompt_bucket"], []).append(r["advantage"])
    assert by_bucket
    for advs in by_bucket.values():
        if len(advs) < 2:
            continue
        mean = sum(advs) / len(advs)
        var = sum((a - mean) ** 2 for a in advs) / len(advs)
        assert abs(mean) < 1e-4
        assert abs(var - 1.0) < 1e-3


def test_rollout_divergence_is_monotone_and_bounded(spark):
    rows = Q.q_rollout_divergence_profile(spark, SF_DIR).collect()
    by_bucket: dict[int, list[tuple[int, int, int]]] = {}
    for r in rows:
        assert 1 <= r["n_branches"] <= r["n_alive"]
        assert r["diverged"] == (r["n_branches"] > 1)
        by_bucket.setdefault(r["prompt_bucket"], []).append(
            (r["turn_idx"], r["n_branches"], r["n_alive"])
        )
    saw_fanout = False
    for seq in by_bucket.values():
        seq.sort()
        assert [d for d, _, _ in seq] == list(range(8))
        # prefixes only refine: once branches split they never re-merge
        # (alive count is constant on this data, so monotone holds)
        branches = [b for _, b, _ in seq]
        assert branches == sorted(branches)
        if branches[-1] > branches[0]:
            saw_fanout = True
    assert saw_fanout


def test_dpo_pairs_margin_and_extremes_rederived(spark):
    rewards: dict[int, list[tuple[float, str]]] = {}
    for r in Q.q_grpo_advantages(spark, SF_DIR).collect():
        rewards.setdefault(r["prompt_bucket"], []).append(
            (r["reward"], r["conv_id"])
        )
    pairs = {r["prompt_bucket"]: r for r in Q.q_dpo_pairs(spark, SF_DIR).collect()}
    kept = dropped = 0
    for bucket, group in rewards.items():
        gap = max(t[0] for t in group) - min(t[0] for t in group)
        if len(group) < 2 or gap < 0.6 - 1e-6:
            assert bucket not in pairs
            dropped += 1
            continue
        kept += 1
        r = pairs[bucket]
        # chosen = lexicographic max (reward, conv); rejected = min
        assert r["chosen_conv"] == max(group)[1]
        assert r["rejected_conv"] == min(group)[1]
        assert abs(r["reward_gap"] - gap) < 1e-5
        assert r["chosen_reward"] > r["rejected_reward"]
    # the 0.6 margin must demonstrably fire on the sf0.01 data
    assert kept >= 1 and dropped >= 1


def test_length_debiased_reward_matches_ols_rederivation(spark):
    rows = Q.q_length_debiased_reward(spark, SF_DIR).collect()
    assert len(rows) == 20
    xs = [float(r["n_chars"]) for r in rows]
    ys = [r["reward"] for r in rows]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    for r in rows:
        assert abs(r["bias_slope"] - beta) < 1e-5
        expected = r["reward"] - (my + beta * (r["n_chars"] - mx))
        assert abs(r["debiased_reward"] - expected) < 1e-4
    # residuals of an OLS fit with intercept sum to ~zero
    assert abs(sum(r["debiased_reward"] for r in rows)) < 1e-3


def _prefixed_rows(spark):
    return (
        Q._prompt_grouped_transcripts(spark, SF_DIR)
        .select("conv_id", "turn_idx", "text")
        .collect()
    )


def test_prefix_cache_savings_matches_full_set_lcp(spark):
    """Pure-python re-derivation that computes the set-LCP over ALL group
    members (os.path.commonprefix), not the lexicographic extremes the
    Spark plan keeps — independently validating the min/max-LCP trick."""
    import hashlib
    import os

    rows = _prefixed_rows(spark)
    by_conv: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    groups: dict[str, list[str]] = {}
    for conv, seq in by_conv.items():
        seq.sort()
        full = "\x1f".join(t for _, t in seq)
        key = hashlib.md5(seq[0][1].encode()).hexdigest()
        groups.setdefault(key, []).append(full)
    expected = {}
    for key, fulls in groups.items():
        n = len(fulls)
        lcp = len(os.path.commonprefix(fulls))
        total = sum(len(f) for f in fulls)
        expected[key] = (
            n, lcp, total, (n - 1) * lcp, round((n - 1) * lcp / total, 6)
        )
    got = {
        r["prompt_group"]: (
            r["n_rollouts"], r["lcp_chars"], r["chars_total"],
            r["chars_saved"], r["saved_frac"],
        )
        for r in Q.q_prefix_cache_savings(spark, SF_DIR).collect()
    }
    assert got == expected
    # the adapter's 3 canonical prompt turns must give every bucket a
    # real shared prefix — otherwise the operator is vacuously green
    assert all(v[1] > 0 and v[0] >= 2 for v in got.values())


def test_prefix_trie_profile_matches_pure_python_trie(spark):
    import hashlib

    rows = _prefixed_rows(spark)
    by_conv: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    from collections import Counter

    node_counts: Counter = Counter()
    for conv, seq in by_conv.items():
        seq.sort()
        hashes = [
            hashlib.md5(f"user|{t}".encode()).hexdigest() for _, t in seq
        ]
        for depth in range(1, len(hashes) + 1):
            node = hashlib.md5("|".join(hashes[:depth]).encode()).hexdigest()
            node_counts[(depth, node)] += 1
    per_depth: dict[int, list[int]] = {}
    for (depth, _), c in node_counts.items():
        per_depth.setdefault(depth, []).append(c)
    expected = {
        d: (
            len(cs), sum(cs), sum(c - 1 for c in cs),
            round(sum(c - 1 for c in cs) / sum(cs), 6),
        )
        for d, cs in per_depth.items()
    }
    got = {
        r["depth"]: (r["n_nodes"], r["n_convs"], r["cache_hits"], r["shared_frac"])
        for r in Q.q_prefix_trie_profile(spark, SF_DIR).collect()
    }
    assert got == expected
    # shared prefix turns must produce real trie sharing at depths 1-3
    # and full branching below
    assert got[1][2] > 0 and got[2][2] > 0 and got[3][2] > 0
    assert got[4][2] == 0


def test_self_consistency_matches_pure_python_vote(spark):
    import hashlib
    import math
    from collections import Counter

    rows = (
        Q.doc_transcripts(spark, SF_DIR)
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    by_conv: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    groups: dict[int, Counter] = {}
    for conv, seq in by_conv.items():
        seq.sort()
        first, last = seq[0][1], seq[-1][1]
        grp = int(hashlib.md5(first.encode()).hexdigest()[:8], 16) % 4
        ans = "ans_%d" % (int(hashlib.md5(last.encode()).hexdigest()[:8], 16) % 3)
        groups.setdefault(grp, Counter())[ans] += 1
    expected = {}
    for grp, votes in groups.items():
        n = sum(votes.values())
        # plurality, ties to lexicographically smallest answer
        top_ans, top_v = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        entropy = math.log(n) - sum(v * math.log(v) for v in votes.values()) / n
        expected[grp] = (
            n, len(votes), top_ans, top_v, round(top_v / n, 6), round(entropy, 6)
        )
    got = {
        r["prompt_group"]: (
            r["n_rollouts"], r["n_answers"], r["consensus_answer"],
            r["consensus_count"], r["consensus_frac"], r["vote_entropy"],
        )
        for r in Q.q_self_consistency_vote(spark, SF_DIR).collect()
    }
    assert got == expected
    # the adapter data must produce a real plurality somewhere: a group
    # whose consensus has >1 vote but is NOT unanimous
    assert any(v[0] > v[3] > 1 for v in got.values())


def test_lcp_fold_block_boundaries_and_multibyte(spark):
    """The two-level 64-char-block LCP fold must agree with python's
    os.path.commonprefix at every block boundary, on equal/empty/
    prefix-contained strings, and on multibyte text (both sides count
    CHARACTERS, not bytes). One DataFrame evaluates all cases."""
    import os

    from pyspark.sql import functions as F

    from ocr_spark.rollouts import _lcp_col

    cases = []
    for k in (0, 1, 2, 63, 64, 65, 127, 128, 129, 200):
        common = "x" * k
        cases += [
            (common + "aZZZ", common + "bYYY"),   # diverge right after k
            (common, common + "tail"),            # prefix containment
            (common, common),                     # equal
        ]
    cases += [
        ("", ""), ("", "a"), ("abc", "abd"),
        ("héllo wörld", "héllo wárld"),           # 2-byte chars
        ("中文分词测试中文", "中文分词不同中文"),      # 3-byte chars
        ("a" * 63 + "é" + "Q", "a" * 63 + "é" + "R"),  # multibyte at boundary
        ("😀😀😀abc", "😀😀😀abd"),                 # surrogate pairs
    ]
    df = spark.createDataFrame(cases, "a: string, b: string").select(
        "a", "b", _lcp_col(F.col("a"), F.col("b")).alias("lcp")
    )
    for r in df.collect():
        expected = len(os.path.commonprefix([r["a"], r["b"]]))
        assert r["lcp"] == expected, (r["a"][:20], r["b"][:20], r["lcp"], expected)
