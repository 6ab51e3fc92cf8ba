"""Sequence packing materialization: pure-python golden parity and
consistency with the oracle-checked packing plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.packing import pack_sequences


def _corpus(spark, n_docs=40):
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range((i * 7) % 23 + 1)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pack_matches_pure_python(spark):
    seq_len, n_shards = 16, 4
    got = {
        (r["shard"], r["seq_idx"]): (r["n_tokens"], r["text"])
        for r in pack_sequences(_corpus(spark), seq_len, n_shards).collect()
    }

    rows = sorted(_corpus(spark).collect(), key=lambda r: r["doc_id"])
    shards: dict[int, list[str]] = {}
    for r in rows:
        shards.setdefault(r["doc_id"] % n_shards, []).extend(r["text"].split())
    want = {}
    for shard, toks in shards.items():
        for i in range(0, len(toks), seq_len):
            chunk = toks[i : i + seq_len]
            want[(shard, i // seq_len)] = (len(chunk), " ".join(chunk))
    assert got == want
    # every sequence except a shard's last is exactly seq_len
    last = {s: max(i for (sh, i) in got if sh == s) for s in {sh for sh, _ in got}}
    for (sh, i), (n, _) in got.items():
        assert n == seq_len or i == last[sh]


def test_pack_consistent_with_plan_offsets(spark):
    """The materialized sequences agree with q_sequence_packing's
    oracle-checked offsets: each doc's first/last sequence index in the
    packed output equals the plan's first_seq/last_seq."""
    import ocr_spark.queries as Q

    sf_dir = "/root/testdata/sf0.001"
    seq_len, n_shards = 2048, 64
    plan = {
        r["doc_id"]: (r["shard"], r["first_seq"], r["last_seq"])
        for r in Q.q_sequence_packing(spark, sf_dir).collect()
    }
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    packed = pack_sequences(corpus, seq_len, n_shards)
    # reconstruct each doc's span by walking tokens per shard
    rows = sorted(corpus.collect(), key=lambda r: r["doc_id"])
    offset: dict[int, int] = {}
    for r in rows:
        sh = r["doc_id"] % n_shards
        start = offset.get(sh, 0)
        n = len(r["text"].strip().split())
        offset[sh] = start + n
        want_first, want_last = start // seq_len, (start + n - 1) // seq_len
        got_shard, got_first, got_last = plan[r["doc_id"]]
        assert (got_shard, got_first, got_last) == (sh, want_first, want_last)
    # and the packed output's per-shard token totals match the walk
    totals = {
        r["shard"]: r["n"]
        for r in packed.groupBy("shard").agg(F.sum("n_tokens").alias("n")).collect()
    }
    assert totals == offset


def test_ffd_bins_match_pure_python_and_invariants(spark):
    """pack_bins_ffd parity with a pure-python FFD over the same shards,
    plus the packing invariants: every doc exactly once, no bin over
    capacity unless it holds a single oversized doc, bin ids contiguous
    from 0, and FFD never beats the ceil(total/capacity) lower bound."""
    from ocr_spark.operators.packing import pack_bins_ffd

    cap, n_shards = 64, 4
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    got = pack_bins_ffd(corpus, capacity=cap, n_shards=n_shards).collect()

    # pure-python oracle over the identical shard split + tie-break
    docs = [
        (r["doc_id"], len(r["text"].strip().split()))
        for r in corpus.collect()
    ]
    want: dict[int, tuple[int, int]] = {}
    for sh in range(n_shards):
        members = sorted(
            ((d, n) for d, n in docs if d % n_shards == sh),
            key=lambda t: (-t[1], t[0]),
        )
        fills: list[int] = []
        for d, n in members:
            for b, fill in enumerate(fills):
                if fill + n <= cap:
                    fills[b] = fill + n
                    break
            else:
                b = len(fills)
                fills.append(n)
            want[d] = (sh, b)
    assert {r["doc_id"]: (r["shard"], r["bin_id"]) for r in got} == want
    assert len(got) == len(docs)  # every doc exactly once

    from collections import defaultdict

    fills, counts = defaultdict(int), defaultdict(int)
    for r in got:
        fills[(r["shard"], r["bin_id"])] += r["n_tokens"]
        counts[(r["shard"], r["bin_id"])] += 1
    for key, fill in fills.items():
        assert fill <= cap or counts[key] == 1  # oversize => dedicated bin
    per_shard_tokens, per_shard_bins = defaultdict(int), defaultdict(set)
    for r in got:
        per_shard_tokens[r["shard"]] += min(r["n_tokens"], cap)
        per_shard_bins[r["shard"]].add(r["bin_id"])
    for sh, bins in per_shard_bins.items():
        assert bins == set(range(len(bins)))  # contiguous ids from 0
        assert len(bins) >= -(-per_shard_tokens[sh] // cap)  # >= LP bound
