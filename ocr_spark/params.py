"""Shared depths for the in-engine iterative training loops.

Both the Spark loops (``ocr_spark.queries``) and the DuckDB oracle
generators (``ocr_spark.oracles``) derive from THESE constants, so the
two sides cannot drift: deepening a loop is a one-line change here and
the driver's value-hash compare still holds. The unrolling itself is
depth-agnostic — ``tests/test_training_depth.py`` proves a much deeper
configuration (BPE 24 merges, k-means 5 Lloyd rounds) green end-to-end
against freshly generated oracles.

Values are demo depths sized for the sf0.01 correctness gate; a real
training run sets them per job (the Spark loops take the depth as a
parameter; the oracle generators regenerate in lockstep).
"""

BPE_TRAIN_STEPS = 6  # merge rounds learned by bpe_train / applied by bpe_encode
SEMDEDUP_TAU = 0.35  # semdedup within-cluster cosine threshold
SEMDEDUP_MAX_CLUSTER = 32  # semdedup skew guard: hash-split clusters above this
KMEANS_ITERS = 3  # Lloyd iterations in kmeans_train
LOGREG_ROUNDS = 3  # full-batch gradient steps in logreg_train
PAGERANK_ROUNDS = 3  # damped power iterations in pagerank

# Johnson-Lindenstrauss random projection (rp_recall_report): project the
# 64-dim embeddings onto RP_K Rademacher (+1/-1) directions. The sign
# matrix is derived from md5 so both engines embed the SAME literals.
RP_DIM = 64
RP_K = 16

# Deterministic corpus shuffle/shard (corpus_shard_plan)
SHARD_COUNT = 64

# k-core peeling (kcore_peel): peel rounds and the core threshold. Demo
# depth for the sf0.01 gate; the Spark loop takes rounds as a parameter
# and the oracle generator unrolls the identical rounds.
KCORE_K = 2
KCORE_ROUNDS = 3

# Evaluation / label-aggregation loop depths (ocr_spark.evaluation):
# Dawid-Skene EM rounds and Bradley-Terry MM rounds. Demo depths for the
# sf0.01 gate; both the Spark loops and the DuckDB oracle generators
# (_dawid_skene_sql / _bradley_terry_sql) unroll from THESE constants.
DS_ROUNDS = 3
BT_ROUNDS = 8

# Embedding-based decontamination (semantic_decontam): flag corpus docs
# whose max cosine vs any eval embedding reaches this. 0.15 is tuned to
# the synthetic random embeddings (max observed candidate cosine 0.24);
# real text embeddings would use ~0.9.
SEM_DECONTAM_TAU = 0.15


def rp_signs(d: int = RP_DIM, k: int = RP_K) -> list[list[int]]:
    """k rows of d Rademacher signs; sign(i,j) = +1 iff the first hex
    digit of md5('rp|j|i') is even. Deterministic, engine-independent."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"rp|{j}|{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            for i in range(d)
        ]
        for j in range(k)
    ]

# context-budget audit: the context-window sizes the capacity card
# evaluates (context_budget_audit's Spark plan AND its DuckDB oracle are
# generated from this same tuple, so they cannot diverge)
CTX_BUDGETS = (2048, 8192, 32768, 131072)
# sandbox-scale budgets for the registry adapter: sf0.01 conversations
# run 1136-1553 tokens, so the production 2k-128k ladder never binds
# there; this ladder straddles the distribution so every branch of the
# audit (none/some/most over; partial truncation) is value-checked.
# Oracle SQL is generated from this same tuple.
CTX_BUDGETS_ADAPTER = (1200, 1350, 1450, 2048)
