"""Production near-duplicate deduplication over a document corpus.

DataFrame -> DataFrame functions for the full MinHash/LSH dedup chain a
training-data pipeline runs before mixing (Broder 1997 resemblance;
Leskovec/Rajaraman/Ullman ch.3 banding; GPT-3/C4-style fuzzy dedup):

    shingles -> minhash_signatures -> lsh_candidate_pairs ->
    verified_pairs -> connected_components -> representatives

The registry queries in ``ocr_spark.queries`` (``minhash_signature``,
``minhash_lsh_pairs``, ``dedup_clusters``,
``dedup_cluster_representatives``) call THESE functions, so the DuckDB
oracle harness value-checks the production code path, and
``jobs/dedup_job.py`` composes it end-to-end under spark-submit.

Scale notes (each pinned by a plan test in ``tests/test_plans.py``):
- one md5 per shingle; K permutations are derived Carter-Wegman integer
  arithmetic inside whole-stage codegen, partial-aggregated to ONE
  shuffle carrying a single (doc_id, m0..m127) row per doc per map task;
- candidates come from equi-joining band buckets — never a cross join —
  and exact-Jaccard verification joins shingles onto the CANDIDATES, so
  verify cost scales with |candidates|, not |docs|^2;
- connected components is iterative min-label propagation with bounded
  plan lineage (localCheckpoint every 5 rounds); dedup components have
  tiny diameter so it converges in a handful of rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

MINHASH_K = 128  # permutations (16 bands x 8 rows)
MINHASH_P = 999999999999999989  # largest prime < 10^18; sums stay < 2^62
LSH_BANDS = 16
LSH_ROWS = MINHASH_K // LSH_BANDS


def minhash_ab(j: int) -> tuple[int, int]:
    """Deterministic Carter-Wegman coefficients for permutation j, kept
    < 2^28 so a*h1 + b*h2 with 32-bit h never overflows a signed 64-bit
    int on either engine (DuckDB raises on BIGINT overflow)."""
    return (
        1 + 2 * ((j * 2654435761) % 134217728),
        1 + 2 * ((j * 2246822519) % 134217728),
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct n-word shingles per document. Docs
    with fewer than n tokens have none and drop out (they cannot be
    fuzzy duplicates of anything at this granularity)."""
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"case when size(toks) >= {n} then"
                f" array_distinct(transform(sequence(1, size(toks) - {n - 1}),"
                " i -> concat_ws(' ', "
                + ", ".join(f"element_at(toks, i + {d})" for d in range(n))
                + "))) else cast(array() as array<string>) end"
            )
        ).alias("shingle"),
    )


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, m0..m{k-1}): wide MinHash signature rows — the table a
    production dedup pipeline materializes."""
    return minhash_signatures_from_shingles(shingles(docs), k)


def minhash_signatures_from_shingles(
    sh: DataFrame, k: int = MINHASH_K
) -> DataFrame:
    """Signatures from a PRE-COMPUTED (doc_id, shingle) stream, so a
    caller that already shingled the corpus (e.g. for exact-Jaccard
    verification or the exact-gram decontam rule) never pays the
    tokenize+shingle scan twice — at 100 TB that second pass over the
    full training corpus is the dominant avoidable cost."""
    hashed = sh.select(
        "doc_id",
        F.expr("cast(conv(substr(md5(shingle), 1, 8), 16, 10) as bigint)").alias("h1"),
        F.expr("cast(conv(substr(md5(shingle), 9, 8), 16, 10) as bigint)").alias("h2"),
    )
    aggs = []
    for j in range(k):
        a, b = minhash_ab(j)
        aggs.append(
            F.min(
                (F.lit(a) * F.col("h1") + F.lit(b) * F.col("h2")) % F.lit(MINHASH_P)
            ).alias(f"m{j}")
        )
    return hashed.groupBy("doc_id").agg(*aggs)


def band_keys(
    sig: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> DataFrame:
    """(doc_id, band, band_key): the LSH banding of a wide signature
    table — one stack() per row, no shuffle. Shared by the doc-vs-doc
    candidate join and the train-vs-eval decontamination join."""
    stack_args = []
    for b in range(bands):
        key = "concat_ws('_', " + ", ".join(
            f"m{b * rows + r}" for r in range(rows)
        ) + ")"
        stack_args.append(f"{b}, {key}")
    return sig.selectExpr(
        "doc_id",
        f"stack({bands}, " + ", ".join(stack_args) + ") as (band, band_key)",
    )


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs from band-bucket equi-joins over a
    wide signature table; doc_a < doc_b, distinct."""
    banded = band_keys(sig, bands, rows)
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def verified_pairs(
    docs: DataFrame, min_jaccard: float = 0.25, k: int = MINHASH_K
) -> DataFrame:
    """(doc_a, doc_b, jaccard): LSH candidates verified by exact shingle
    Jaccard — shingles join onto candidates (candidate-first), never
    doc x doc."""
    cand = lsh_candidate_pairs(minhash_signatures(docs, k))
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("b_doc"), F.col("shingle").alias("sh_b"))
    inter = (
        cand.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("b_doc")) & (F.col("sh_a") == F.col("sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_shingles", "na"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_shingles", "nb"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """(doc_id, cluster_id): connected components over the pair graph by
    iterative min-label propagation — the distributed union-find for
    dedup graphs. Only docs that appear in a pair get a row."""
    edges = (
        pairs.select("doc_a", "doc_b")
        .union(pairs.select("doc_b", "doc_a"))
        .toDF("src", "dst")
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .cache()
    )
    converged = False
    try:
        for it in range(max_iters):
            neigh = edges.join(labels, edges.dst == labels.node).select(
                F.col("src").alias("node"), "label"
            )
            new_labels = (
                labels.union(neigh).groupBy("node").agg(F.min("label").alias("label"))
            )
            # truncate lineage every few rounds so plan depth stays bounded
            # (20 stacked joins would bloat optimization + task binaries at
            # scale); localCheckpoint materializes, so it doubles as cache
            if (it + 1) % 5 == 0:
                new_labels = new_labels.localCheckpoint(eager=True)
            else:
                new_labels = new_labels.cache()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter("n.label != o.label")
                .limit(1)
                .count()
            )
            labels.unpersist()  # superseded this round; new_labels is live
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            # min-label needs O(diameter) rounds; returning the
            # intermediate labels would silently SPLIT a component and
            # leak duplicates past representatives() into the kept corpus
            labels.unpersist()  # failing job must not leak executor storage
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} "
                "rounds (component diameter exceeds the budget); raise "
                "max_iters or use connected_components_two_phase "
                "(O(log^2 n) rounds)"
            )
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
    finally:
        edges.unpersist()


def _cc_large_star(e: DataFrame) -> DataFrame:
    """One large-star phase over an (u, v) edge set: link every
    strictly-larger neighbor of u to min(N(u) ∪ {u}). One
    partial-aggregated groupBy(min) + one equi-join; module-level so
    plan audits (tools/gen_plans.py) can explain a single phase."""
    bidir = e.union(e.select(F.col("v"), F.col("u")))
    mins = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    )
    return (
        bidir.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter("u <> v")
        .distinct()
    )


def _cc_small_star(e: DataFrame) -> DataFrame:
    """One small-star phase: orient each edge large→small, link every
    smaller-or-equal neighbor (and u itself) to the minimum."""
    directed = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    rooted = mins.select(F.col("u"), F.col("m").alias("v"))
    return relinked.union(rooted).filter("u <> v").distinct()


def connected_components_two_phase(
    pairs: DataFrame, max_iters: int = 12
) -> DataFrame:
    """(doc_id, cluster_id): connected components by alternating
    large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — the O(log^2 n)-round
    alternative to plain min-label propagation for graphs whose
    diameter is NOT tiny (chained near-dup clusters, link graphs).

    Per round both phases are one partial-aggregated groupBy(min) plus
    one equi-join — no collect_list, so a web-scale hot node (a
    boilerplate doc connected to millions) never materializes its
    neighbor list in one task; its min flows through the partial agg
    and its edge fan-out stays a join. Same output contract as
    :func:`connected_components` (only docs appearing in a pair get a
    row; label = min doc_id of the component), so the two
    implementations cross-check each other.
    """
    # localCheckpoint (not cache) at BOTH the input and every round:
    # each phase references its input 2-3 times, so un-truncated lineage
    # re-embeds the upstream plan (e.g. the whole MinHash-LSH pair
    # pipeline) ~6x per round — the logical plan grows exponentially in
    # rounds and the driver OOMs just *printing* it. Checkpointing makes
    # every round's plan O(1); the convergence count below materializes
    # each round anyway, so the eager checkpoint adds no extra pass.
    edges = (
        pairs.selectExpr("doc_a as u", "doc_b as v")
        .filter("u <> v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = edges
    converged = False
    for it in range(max_iters):
        nxt = _cc_small_star(_cc_large_star(cur)).localCheckpoint(eager=True)
        # symmetric-difference emptiness as ONE job (both exceptAll
        # sides unioned under a single limit), not two per round
        changed = (
            nxt.exceptAll(cur).union(cur.exceptAll(nxt)).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            converged = True
            break
    if not converged:
        # an unconverged star forest would label some nodes with a
        # non-root — silently splitting components; fail loudly instead
        raise RuntimeError(
            f"connected_components_two_phase did not converge in "
            f"{max_iters} alternations; raise max_iters (O(log^2 n) "
            "rounds suffice for any graph this size bound admits)"
        )
    # converged: edges are (node -> component-min root) stars; checkpoint
    # blocks are released when the intermediate DataFrames are GC'd
    roots = cur.select(F.col("v").alias("u"), F.col("v"))
    return (
        cur.union(roots)
        .distinct()
        .select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    )


def representatives(clusters: DataFrame, scores: DataFrame) -> DataFrame:
    """(cluster, rep_doc_id, rep_quality, n_members): one canonical
    member per cluster — highest score, doc_id breaks ties. Dedup
    clusters are tiny, so the cluster-keyed window has no hot key."""
    joined = clusters.join(scores, "doc_id").select(
        F.col("cluster_id").alias("cluster"), "doc_id", "quality"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    size_w = Window.partitionBy("cluster")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(size_w).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select(
            "cluster",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("quality").alias("rep_quality"),
            "n_members",
        )
    )


def exact_decontam_report(
    train_shingles: DataFrame, eval_shingles: DataFrame
) -> DataFrame:
    """EXACT-gram benchmark decontamination (GPT-3 appendix C / Gopher
    §A.3): one row per training doc with >=1 gram — ``(doc_id, n_grams,
    n_hits, contaminated)`` where contaminated means the doc shares ANY
    word n-gram with the eval set. Takes pre-computed (doc_id, shingle)
    streams (``shingles(df, n=width)``) so the gram width is the
    caller's knob and a caller that shingled for other rules reuses the
    stream. The ONE production implementation: the registry query
    ``benchmark_decontam`` (DuckDB value-checked) and
    ``jobs/decontam_job.py`` both call this, so the job can never drift
    from the oracle-verified semantics.

    Distributed shape: the eval set's distinct grams are an external,
    fixed-size benchmark artifact (KBs-MBs at any corpus scale), so they
    BROADCAST and the training gram stream joins map-side with no
    shuffle of the big side; per-doc hit counts partial-aggregate."""
    ev = (
        eval_shingles.select(F.col("shingle").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        train_shingles.withColumnRenamed("shingle", "g")
        .join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.count("hit").cast("bigint").alias("n_hits"),
            (F.count("hit") > 0).alias("contaminated"),
        )
    )


def fuzzy_decontam_report(
    train: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.25,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """MinHash-band FUZZY benchmark decontamination — the near-dup
    complement of the exact-gram rule (GPT-3 appendix C / Gopher §A.3):
    a training document is contaminated if it is a near-duplicate of any
    eval document, not merely if it shares one n-gram. Returns one row
    per train doc with >=1 shingle: ``(doc_id, n_eval_candidates,
    max_eval_jaccard, contaminated)``.

    Distributed shape: the eval set's band keys are an external,
    fixed-size benchmark artifact (|eval| x bands rows at any corpus
    scale), so they BROADCAST and the corpus-side banded stream joins
    map-side — the training corpus never shuffles for candidate
    generation. Exact-Jaccard verification joins shingles onto the
    (train, eval) CANDIDATES only (cost ~ |candidates|, never
    |train| x |eval|). Same verify-after-bucket discipline as
    lsh_candidate_pairs/verified_pairs, pointed across two corpora."""
    sh_t, sh_e = shingles(train), shingles(evalset)
    # signatures derive from the SAME shingle streams the verify pass
    # uses (minhash_signatures_from_shingles), not a second independent
    # shingles(train) — one tokenize+shingle lineage per corpus.
    banded_t = band_keys(minhash_signatures_from_shingles(sh_t, k), bands, rows)
    eval_keys = (
        band_keys(minhash_signatures_from_shingles(sh_e, k), bands, rows)
        .select("band", "band_key", F.col("doc_id").alias("eval_id"))
        .distinct()
    )
    cand = (
        banded_t.join(F.broadcast(eval_keys), ["band", "band_key"])
        .select("doc_id", "eval_id")
        .distinct()
    )
    sizes_t = sh_t.groupBy("doc_id").agg(F.count("*").alias("n_t"))
    sizes_e = sh_e.groupBy(F.col("doc_id").alias("eval_id")).agg(
        F.count("*").alias("n_e")
    )
    inter = (
        cand.join(sh_t, "doc_id")
        .join(
            sh_e.select(
                F.col("doc_id").alias("e_doc"), F.col("shingle").alias("e_sh")
            ),
            (F.col("eval_id") == F.col("e_doc"))
            & (F.col("shingle") == F.col("e_sh")),
        )
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_common"))
    )
    jac = (
        inter.join(sizes_t, "doc_id")
        .join(sizes_e, "eval_id")
        .select(
            "doc_id",
            F.round(
                F.col("n_common") / (F.col("n_t") + F.col("n_e") - F.col("n_common")),
                6,
            ).alias("j"),
        )
    )
    best = jac.groupBy("doc_id").agg(F.max("j").alias("max_j"))
    cand_counts = cand.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_eval_candidates")
    )
    return (
        sizes_t.join(cand_counts, "doc_id", "left")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_eval_candidates", F.lit(0).cast("bigint")).alias(
                "n_eval_candidates"
            ),
            F.round(F.coalesce("max_j", F.lit(0.0)), 6).alias("max_eval_jaccard"),
            (F.coalesce("max_j", F.lit(0.0)) >= F.lit(threshold)).alias(
                "contaminated"
            ),
        )
    )


def near_dedup(
    docs: DataFrame,
    scores: DataFrame,
    min_jaccard: float = 0.25,
    cc: str = "min-label",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """End-to-end fuzzy dedup: returns ``(kept, clusters, pairs)`` where
    ``kept`` is the corpus with every non-representative near-duplicate
    removed (docs outside any cluster are kept untouched), ``clusters``
    maps clustered docs to cluster ids, and ``pairs`` is the verified
    pair graph (the audit trail).

    ``cc`` picks the component algorithm: ``min-label`` (default; right
    for tiny-diameter near-dup clusters) or ``two-phase``
    (large-star/small-star, O(log^2 n) rounds — right when duplicates
    chain into high-diameter components, e.g. template families)."""
    pairs = verified_pairs(docs, min_jaccard=min_jaccard)
    if cc not in ("min-label", "two-phase"):
        raise ValueError(f"unknown cc algorithm: {cc!r}")
    cc_fn = (
        connected_components
        if cc == "min-label"
        else connected_components_two_phase
    )
    clusters = cc_fn(pairs)
    reps = representatives(clusters, scores)
    drop = clusters.join(
        reps.select(F.col("rep_doc_id").alias("doc_id")), "doc_id", "left_anti"
    ).select("doc_id")
    kept = docs.join(drop, "doc_id", "left_anti")
    return kept, clusters, pairs


def rowwise_band_keys(
    df: DataFrame, self_key: str, bands: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Per-ROW MinHash band keys: explode each input row into ``bands``
    (band, band_key) rows whose signature is computed entirely inside
    higher-order array functions — no explode-groupBy — so the stage is
    NARROW and legal as the stateless prefix of a streaming plan (a
    grouped signature aggregation would be a second stateful operator).

    Rows with <3 tokens have no shingles and get self-keyed bands
    (``short:<self_key>:<band>``) they trivially own, so they are never
    dropped and never collide. ``self_key`` is a SQL expression unique
    per input row (e.g. ``doc_id`` or ``concat(conv_id, ':', turn_idx)``).
    """
    k = bands * rows_per_band
    out = df.withColumn("_toks", F.split(F.trim(F.col("text")), r"\s+"))
    out = out.withColumn(
        "_sh",
        F.expr(
            "case when size(_toks) >= 3 then"
            " array_distinct(transform(sequence(1, size(_toks) - 2),"
            " i -> concat_ws(' ', element_at(_toks, i), element_at(_toks, i + 1),"
            " element_at(_toks, i + 2))))"
            " else cast(array() as array<string>) end"
        ),
    )
    out = out.withColumn(
        "_hp",
        F.expr(
            "transform(_sh, s -> named_struct("
            "'h1', cast(conv(substr(md5(s), 1, 8), 16, 10) as bigint),"
            "'h2', cast(conv(substr(md5(s), 9, 8), 16, 10) as bigint)))"
        ),
    )
    mins = []
    for j in range(k):
        a, b = minhash_ab(j)
        mins.append(
            f"array_min(transform(_hp, x -> ({a} * x.h1 + {b} * x.h2) % {MINHASH_P}))"
        )
    out = out.withColumn("_sig", F.expr("array(" + ", ".join(mins) + ")"))
    out = out.withColumn("band", F.explode(F.expr(f"sequence(0, {bands - 1})")))
    key = (
        f"case when size(_sh) = 0 then concat('short:', {self_key}, ':', band)"
        f" else concat(band, ':', concat_ws('_',"
        f" transform(slice(_sig, band * {rows_per_band} + 1, {rows_per_band}),"
        " v -> cast(v as string)))) end"
    )
    return out.withColumn("band_key", F.expr(key)).drop(
        "_toks", "_sh", "_hp", "_sig"
    )


def rowwise_grams(df: DataFrame, self_key: str, n: int = 3) -> DataFrame:
    """Per-ROW distinct n-word grams: explode each input row into
    (original cols..., gram) rows computed entirely inside higher-order
    array functions — narrow and stateless, so legal as the prefix of a
    streaming plan (the streaming novelty gate) and reusable in batch.

    Rows with <n tokens have no grams and fall back to ONE self-keyed
    gram (``short:<self_key>``): with ``self_key`` = normalized whole
    text on BOTH the stream and the corpus side, the fallback becomes an
    exact-text novelty check for short rows (a short row equal to a
    short corpus doc is non-novel; a unique short row is fully novel).
    """
    out = df.withColumn("_toks", F.split(F.trim(F.col("text")), r"\s+"))
    gram_arr = (
        f"case when size(_toks) >= {n} then"
        f" array_distinct(transform(sequence(1, size(_toks) - {n - 1}),"
        " i -> concat_ws(' ', "
        + ", ".join(f"element_at(_toks, i + {d})" for d in range(n))
        + ")))"
        f" else array(concat('short:', {self_key})) end"
    )
    return out.withColumn("gram", F.explode(F.expr(gram_arr))).drop("_toks")
