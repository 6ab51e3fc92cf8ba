"""Evaluation & label-aggregation reductions — the judge/arena passes a
transcript-curation pipeline runs AFTER rollouts are scored: multi-judge
label aggregation (majority vote, Cohen's kappa, Krippendorff's alpha,
Dawid-Skene EM) and pairwise model comparison (win-rate matrix,
Bradley-Terry strengths via Hunter's MM iteration).

These are the production DataFrame -> DataFrame functions behind the
registry's evaluation queries (queries.py derives content-keyed judge
labels and battle outcomes from the sandbox documents table and calls
THESE, so the driver's DuckDB oracle checks the exact code a real
labels/battles table runs — production wires in its real judge columns
instead).

Input shapes:
- labels:  ``(item_id: string, judge_id: string, label: string)`` —
  one row per (item, judge) verdict.
- battles: ``(item_id: string, model_a: string, model_b: string,
  winner: string)`` — one pairwise comparison per row, winner is one of
  the two model names.

Scale contract: everything heavy is item-keyed (one hash-partitioned
Exchange per rollup; the kappa self-join is an item-keyed equi-join);
all model-level state (marginals, confusion matrices, strengths,
pair-count cells) is judge×class or model×model sized — tiny — and
moves through broadcast joins or driver-side round state exactly like
the k-means centroid loop (queries.py kmeans_train), never through a
big-table shuffle.

Reference scope note: the reference service (Aizen-Agency/OCR) has no
evaluation module — this family is part of the "operations a
large-scale training-data pipeline needs" surface the brief adds on top
of reference parity, same as the dedup/rollout families.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Row, functions as F
from pyspark.sql.window import Window

from ocr_spark import params as _params


# --------------------------------------------------------------------------
# Majority vote
# --------------------------------------------------------------------------


def majority_vote(labels: DataFrame) -> DataFrame:
    """Per-item plurality label with a deterministic tiebreak
    (highest vote count, then lexicographically smallest label), plus
    agreement diagnostics.

    Shape: two partial-aggregated groupBys — (item, label) counts, then
    an item rollup whose winner pick is a ``min_by`` over the composite
    (-count, label) struct (no window, no join). Two Exchanges, both
    item-keyed; the second reuses the first's partitioning prefix.
    """
    counts = labels.groupBy("item_id", "label").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    return (
        counts.groupBy("item_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_votes"),
            F.count("*").cast("bigint").alias("n_distinct_labels"),
            F.expr("min_by(label, struct(-cnt, label))").alias("vote_label"),
            F.max("cnt").cast("bigint").alias("vote_count"),
        )
        .select(
            "item_id",
            "n_votes",
            "n_distinct_labels",
            "vote_label",
            "vote_count",
            F.round(F.col("vote_count") / F.col("n_votes"), 6).alias("agreement"),
            (F.col("n_distinct_labels") == 1).alias("unanimous"),
        )
    )


# --------------------------------------------------------------------------
# Cohen's kappa (all judge pairs)
# --------------------------------------------------------------------------


def cohen_kappa_pairs(labels: DataFrame) -> DataFrame:
    """Chance-corrected inter-judge agreement for every unordered judge
    pair: kappa = (po - pe) / (1 - pe) with pe from the two judges'
    marginal label distributions (Cohen 1960).

    Shape: ONE big op — the item-keyed self-join pairing each item's
    two verdicts — then judge-pair-sized aggregates. The marginal table
    is judges×labels (tiny) and the pe computation joins it to itself
    broadcast; the final obs⋈pe join is pair-count-sized.
    """
    a = labels.select(
        F.col("item_id"),
        F.col("judge_id").alias("judge_a"),
        F.col("label").alias("label_a"),
    )
    b = labels.select(
        F.col("item_id"),
        F.col("judge_id").alias("judge_b"),
        F.col("label").alias("label_b"),
    )
    obs = (
        a.join(b, "item_id")
        .filter(F.col("judge_a") < F.col("judge_b"))
        .groupBy("judge_a", "judge_b")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.avg((F.col("label_a") == F.col("label_b")).cast("double")).alias("po"),
        )
    )
    marg = (
        labels.groupBy("judge_id", "label")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn(
            "frac",
            F.col("cnt")
            / F.sum("cnt").over(Window.partitionBy("judge_id")),
        )
    )
    ma = marg.select(
        F.col("judge_id").alias("judge_a"),
        F.col("label"),
        F.col("frac").alias("frac_a"),
    )
    mb = marg.select(
        F.col("judge_id").alias("judge_b"),
        F.col("label"),
        F.col("frac").alias("frac_b"),
    )
    pe = (
        ma.join(F.broadcast(mb), "label")
        .filter(F.col("judge_a") < F.col("judge_b"))
        .groupBy("judge_a", "judge_b")
        .agg(F.sum(F.col("frac_a") * F.col("frac_b")).alias("pe"))
    )
    return obs.join(F.broadcast(pe), ["judge_a", "judge_b"]).select(
        "judge_a",
        "judge_b",
        "n_items",
        F.round("po", 6).alias("po"),
        F.round("pe", 6).alias("pe"),
        F.round((F.col("po") - F.col("pe")) / (1.0 - F.col("pe")), 6).alias("kappa"),
    )


# --------------------------------------------------------------------------
# Krippendorff's alpha (nominal)
# --------------------------------------------------------------------------


def krippendorff_alpha(labels: DataFrame) -> DataFrame:
    """Krippendorff's alpha for nominal data over any number of judges,
    tolerant of missing ratings: alpha = (Ao - Ae) / (1 - Ae) where Ao
    is the within-item pairwise agreement rate (items with >= 2 ratings)
    and Ae the chance rate from pooled label totals.

    Shape: one (item, label) count rollup, one item-sized agreement
    pass, then 1-row corpus totals crossJoined back — the corpus-totals
    broadcast pattern (same as length_debiased_reward). Returns ONE row.
    """
    nuc = labels.groupBy("item_id", "label").agg(
        F.count("*").cast("bigint").alias("nuc")
    )
    per_item = nuc.groupBy("item_id").agg(
        F.sum("nuc").cast("bigint").alias("mu"),
        F.sum(F.col("nuc") * (F.col("nuc") - F.lit(1))).alias("agree_pairs"),
    ).filter(F.col("mu") >= 2)
    # pooled label totals over pairable items only
    pooled = (
        nuc.join(per_item.select("item_id"), "item_id")
        .groupBy("label")
        .agg(F.sum("nuc").cast("bigint").alias("nc"))
    )
    totals = per_item.agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("mu").cast("bigint").alias("n_ratings"),
        F.sum(F.col("agree_pairs") / (F.col("mu") - F.lit(1))).alias("ao_num"),
    )
    chance = pooled.agg(
        F.sum(F.col("nc") * (F.col("nc") - F.lit(1))).alias("ae_num")
    )
    return (
        totals.crossJoin(F.broadcast(chance))
        .select(
            "n_items",
            "n_ratings",
            (F.col("ao_num") / F.col("n_ratings")).alias("ao"),
            (
                F.col("ae_num")
                / (F.col("n_ratings") * (F.col("n_ratings") - F.lit(1)))
            ).alias("ae"),
        )
        .select(
            "n_items",
            "n_ratings",
            F.round("ao", 6).alias("ao"),
            F.round("ae", 6).alias("ae"),
            F.round((F.col("ao") - F.col("ae")) / (1.0 - F.col("ae")), 6).alias(
                "alpha"
            ),
        )
    )


# --------------------------------------------------------------------------
# Dawid-Skene EM
# --------------------------------------------------------------------------


def dawid_skene(
    labels: DataFrame,
    rounds: int | None = None,
    smooth: float = 0.1,
) -> DataFrame:
    """Dawid-Skene (1979) noisy-judge label inference, EM with ``rounds``
    iterations: per-judge confusion matrices and class priors are
    re-estimated from soft item posteriors, posteriors from the
    confusions; returns the per-item MAP label with its posterior
    probability (deterministic tiebreak: probability desc, label asc).

    Round r state (priors pi_c, confusions theta_{j,c,k}) is
    judges×classes² — tiny — so it is collected to the driver each round
    and re-broadcast as a literal DataFrame, exactly the k-means
    centroid-loop pattern: posteriors stay distributed, the big labels
    table is touched once per round by an item-keyed rollup, and no
    lineage chain survives across rounds (each E-step restarts from
    ``labels`` + literal state). Confusion cells get Laplace ``smooth``
    mass so unseen (judge, class, label) cells stay positive.

    Initialization: posteriors = per-item vote fractions (the standard
    majority-vote seed from the paper §3).
    """
    if rounds is None:
        rounds = _params.DS_ROUNDS
    spark = labels.sparkSession
    classes = sorted(r["label"] for r in labels.select("label").distinct().collect())
    n_classes = len(classes)

    # ---- round 1 state from the vote-fraction seed, computed in one
    # pass over (item,judge,label) rows joined to per-item vote counts.
    nuc = labels.groupBy("item_id", "label").agg(F.count("*").alias("nuc"))
    mu = nuc.groupBy("item_id").agg(F.sum("nuc").alias("mu"))
    # p0(item, cls) — only observed classes carry mass in the seed
    p0 = (
        nuc.join(mu, "item_id")
        .select(
            "item_id",
            F.col("label").alias("cls"),
            (F.col("nuc") / F.col("mu")).alias("p"),
        )
    )

    def m_step(post: DataFrame):
        """Collect (priors, confusion) literals from posteriors."""
        pri_rows = (
            post.groupBy("cls").agg(F.sum("p").alias("mass")).collect()
        )
        total = sum(r["mass"] for r in pri_rows)
        priors = {r["cls"]: r["mass"] / total for r in pri_rows}
        for c in classes:
            priors.setdefault(c, 0.0)
        conf_rows = (
            labels.join(post, "item_id")
            .groupBy("judge_id", "cls", "label")
            .agg(F.sum("p").alias("mass"))
            .collect()
        )
        den: dict[tuple, float] = {}
        num: dict[tuple, float] = {}
        for r in conf_rows:
            num[(r["judge_id"], r["cls"], r["label"])] = r["mass"]
            den[(r["judge_id"], r["cls"])] = (
                den.get((r["judge_id"], r["cls"]), 0.0) + r["mass"]
            )
        judges = sorted({j for j, _, _ in num})
        theta = [
            (
                j,
                c,
                k,
                (num.get((j, c, k), 0.0) + smooth)
                / (den.get((j, c), 0.0) + smooth * n_classes),
            )
            for j in judges
            for c in classes
            for k in classes
        ]
        return priors, theta

    def e_step(priors: dict, theta: list) -> DataFrame:
        """Distributed posteriors from literal round state: per (item,
        cls) sum of log-theta over the item's verdicts, plus log-prior,
        exp-normalized within the item (one item-keyed window)."""
        theta_df = spark.createDataFrame(
            [(j, c, k, math.log(th)) for j, c, k, th in theta],
            "judge_id string, cls string, label string, log_theta double",
        )
        pri_expr = F.create_map(
            *[x for c in classes for x in (F.lit(c), F.lit(math.log(priors[c]) if priors[c] > 0 else -745.0))]
        )
        lods = (
            labels.join(F.broadcast(theta_df), ["judge_id", "label"])
            .groupBy("item_id", "cls")
            .agg(F.sum("log_theta").alias("ll"))
            .withColumn("ll", F.col("ll") + pri_expr[F.col("cls")])
        )
        w = Window.partitionBy("item_id")
        return (
            lods.withColumn("mx", F.max("ll").over(w))
            .withColumn("wgt", F.exp(F.col("ll") - F.col("mx")))
            .withColumn("p", F.col("wgt") / F.sum("wgt").over(w))
            .select("item_id", "cls", "p")
        )

    post = p0
    priors, theta = m_step(post)
    for _ in range(rounds - 1):
        post = e_step(priors, theta)
        priors, theta = m_step(post)
    final = e_step(priors, theta)
    w = Window.partitionBy("item_id").orderBy(F.col("p").desc(), F.col("cls").asc())
    return (
        final.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "item_id",
            F.col("cls").alias("map_label"),
            F.round("p", 6).alias("p_map"),
        )
    )


# --------------------------------------------------------------------------
# Pairwise win-rate
# --------------------------------------------------------------------------


def pairwise_winrate(battles: DataFrame) -> DataFrame:
    """Win-rate matrix over canonicalized model pairs: per unordered
    pair (lo < hi), battle count, lo's wins, and lo's win rate.

    Shape: one narrow projection + one partial-aggregated groupBy on
    the (lo, hi) pair key — model²-sized output, no joins."""
    canon = battles.select(
        F.least("model_a", "model_b").alias("model_lo"),
        F.greatest("model_a", "model_b").alias("model_hi"),
        (F.col("winner") == F.least("model_a", "model_b"))
        .cast("int")
        .alias("lo_won"),
    )
    return canon.groupBy("model_lo", "model_hi").agg(
        F.count("*").cast("bigint").alias("n_battles"),
        F.sum("lo_won").cast("bigint").alias("lo_wins"),
        F.round(F.sum("lo_won") / F.count("*"), 6).alias("lo_winrate"),
    )


# --------------------------------------------------------------------------
# Bradley-Terry strengths (Hunter's MM)
# --------------------------------------------------------------------------


def bradley_terry(battles: DataFrame, rounds: int | None = None) -> DataFrame:
    """Bradley-Terry strength fit over pairwise battles via Hunter's
    (2004) MM iteration: p_i <- W_i / sum_j n_ij / (p_i + p_j), then
    normalized to mean 1 each round. Returns per-model strength and
    dense rank (strength desc, model asc tiebreak).

    Precondition: every model has at least one win (standard BT
    identifiability; zero-win models drive their strength to 0 and the
    rank remains correct as long as no PAIR is entirely winless).

    Shape: battles reduce once to a model²-sized pair-count cell table
    and a model-sized win vector; each MM round joins the pair cells to
    the literal strengths of the previous round (k-means centroid
    pattern: tiny state collected per round, the battle table itself is
    touched exactly once). The final round stays distributed and
    returns a DataFrame."""
    if rounds is None:
        rounds = _params.BT_ROUNDS
    spark = battles.sparkSession
    canon = battles.select(
        F.least("model_a", "model_b").alias("lo"),
        F.greatest("model_a", "model_b").alias("hi"),
        (F.col("winner") == F.least("model_a", "model_b"))
        .cast("long")
        .alias("lo_won"),
    )
    cells = canon.groupBy("lo", "hi").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("lo_won").cast("long").alias("w_lo"),
    )
    cell_rows = cells.collect()
    models = sorted({r["lo"] for r in cell_rows} | {r["hi"] for r in cell_rows})
    wins = {m: 0.0 for m in models}
    games: dict[tuple, float] = {}
    for r in cell_rows:
        games[(r["lo"], r["hi"])] = float(r["n"])
        wins[r["lo"]] += float(r["w_lo"])
        wins[r["hi"]] += float(r["n"] - r["w_lo"])

    strength = {m: 1.0 for m in models}
    for _ in range(rounds):
        raw = {}
        for m in models:
            denom = 0.0
            for (lo, hi), n in sorted(games.items()):
                if m == lo:
                    denom += n / (strength[lo] + strength[hi])
                elif m == hi:
                    denom += n / (strength[lo] + strength[hi])
            raw[m] = wins[m] / denom if denom > 0 else 0.0
        mean = sum(raw.values()) / len(models)
        strength = {m: raw[m] / mean for m in models}

    result = spark.createDataFrame(
        [Row(model=m, n_wins=int(wins[m]), strength=strength[m]) for m in models]
    )
    n_battles = canon.groupBy().agg(F.count("*").cast("bigint").alias("total"))
    w = Window.orderBy(F.col("strength").desc(), F.col("model").asc())
    return (
        result.crossJoin(F.broadcast(n_battles))
        .select(
            "model",
            F.col("n_wins").cast("bigint").alias("n_wins"),
            F.col("total").alias("n_battles_total"),
            F.round("strength", 6).alias("strength"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


# --------------------------------------------------------------------------
# Per-judge confusion vs consensus
# --------------------------------------------------------------------------


def consensus_confusion(labels: DataFrame) -> DataFrame:
    """Per-judge confusion matrix against the majority-vote consensus:
    for each (judge, consensus label, reported label) cell, the count
    and the judge-row fraction (share of that judge's verdicts on items
    with that consensus). The judge-quality audit read before weighting
    or dropping judges — the non-iterative complement of dawid_skene's
    fitted confusions.

    Shape: majority_vote's two item-keyed rollups, an item-keyed
    broadcast-eligible join back to the verdicts (consensus is
    item-sized, smaller than labels), then one partial-aggregated
    groupBy to judge x classes^2 cells; the row-fraction window runs on
    that tiny cell table."""
    consensus = majority_vote(labels).select(
        "item_id", F.col("vote_label").alias("consensus")
    )
    cells = (
        labels.join(consensus, "item_id")
        .groupBy("judge_id", "consensus", "label")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("judge_id", "consensus")
    return cells.select(
        "judge_id",
        "consensus",
        "label",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("frac"),
    )
