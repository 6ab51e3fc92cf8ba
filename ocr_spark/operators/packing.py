"""Sequence packing: materialize fixed-length training sequences.

``q_sequence_packing`` (oracle-checked) computes the packing PLAN —
per-document token offsets within a shard. This operator executes it:
documents are concatenated in deterministic (shard, doc_id) order and
re-sliced into exactly ``seq_len``-token sequences, the standard
concat-and-chunk used for LLM pretraining shards.

Distributed shape: one shuffle keyed on ``shard = doc_id % n_shards``
(documents of a shard must meet to be concatenated — that is the
operator's semantics), then a grouped-map ``applyInPandas`` per shard
performs the ordered concat + slicing with a token count bounded by the
shard, not the corpus. n_shards is the parallelism/memory knob: pick
~(corpus tokens / 10^8) so a shard's token stream fits an executor. The
trailing partial sequence of each shard is emitted with
``n_tokens < seq_len`` (callers drop or pad); sequences never span
shards by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PACK_SCHEMA = "shard int, seq_idx bigint, n_tokens int, text string"


def _pack_fn_factory(seq_len: int):
    import pandas as pd

    def pack(pdf):
        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0])
        toks: list[str] = []
        for text in pdf["text"]:
            if not text:  # null/empty docs contribute no tokens (matches
                continue  # the plan's whitespace token_count semantics)
            toks.extend(str(text).strip().split())
        rows = []
        for i in range(0, len(toks), seq_len):
            chunk = toks[i : i + seq_len]
            rows.append((shard, i // seq_len, len(chunk), " ".join(chunk)))
        return pd.DataFrame(rows, columns=["shard", "seq_idx", "n_tokens", "text"])

    return pack


def pack_sequences(
    corpus: DataFrame, seq_len: int = 2048, n_shards: int = 64
) -> DataFrame:
    """corpus(doc_id: bigint, text) -> (shard, seq_idx, n_tokens, text).

    Token order inside a shard is the concatenation of its documents in
    doc_id order (identical to the q_sequence_packing plan's offsets);
    whitespace tokenization matches the engine-wide convention.
    """
    sharded = corpus.select(
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        "doc_id",
        "text",
    )
    return sharded.groupBy("shard").applyInPandas(
        _pack_fn_factory(seq_len), _PACK_SCHEMA
    )


_FFD_SCHEMA = "shard int, bin_id int, doc_id bigint, n_tokens int"


def _ffd_fn_factory(capacity: int):
    import pandas as pd

    def pack(pdf):
        shard = int(pdf["shard"].iloc[0])
        # first-fit-DECREASING: longest docs place first (classic 11/9 OPT
        # bound); doc_id breaks length ties so the packing is deterministic
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        fills: list[int] = []  # current fill per bin, index = bin_id
        rows = []
        for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            for b, fill in enumerate(fills):
                if fill + n <= capacity:
                    fills[b] = fill + n
                    break
            else:
                b = len(fills)
                # an oversized doc (> capacity) still gets its own bin;
                # callers truncate at sequence build time
                fills.append(n)
            rows.append((shard, b, int(doc_id), n))
        return pd.DataFrame(rows, columns=["shard", "bin_id", "doc_id", "n_tokens"])

    return pack


def pack_bins_ffd(
    corpus: DataFrame, capacity: int = 2048, n_shards: int = 64
) -> DataFrame:
    """First-fit-decreasing SAMPLE packing: whole documents into
    fixed-capacity bins, never splitting a document across bins — the
    attention-mask-friendly complement of ``pack_sequences``'
    concat-and-slice (no cross-document token bleed; each bin becomes
    one training sequence of independently-attended segments).

    corpus(doc_id: bigint, text) -> (shard, bin_id, doc_id, n_tokens).

    Distributed shape: FFD is inherently sequential, so it runs
    PER-SHARD — one shuffle keyed ``doc_id % n_shards``, then a
    grouped-map ``applyInPandas`` packs each shard independently (the
    fill-state loop touches shard-sized data only; n_shards is the
    parallelism/memory knob exactly as in pack_sequences). Sharding
    costs a bounded packing-quality loss vs a global FFD (each shard
    wastes at most its own tail bins) and buys linear scale-out — the
    trade every production sample-packing implementation makes.
    Documents longer than ``capacity`` get a dedicated overflow bin."""
    # empty/whitespace-only docs are 0 tokens, not 1: split(trim('')) is
    # [''] (size 1), which would give empty docs a phantom token in bin
    # fills and break parity with the pinned pure-python oracle's
    # len(text.strip().split()) == 0.
    n_tokens = F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    toks = corpus.select(
        (F.col("doc_id") % n_shards).cast("int").alias("shard"),
        "doc_id",
        n_tokens.alias("n_tokens"),
    )
    return toks.groupBy("shard").applyInPandas(_ffd_fn_factory(capacity), _FFD_SCHEMA)
