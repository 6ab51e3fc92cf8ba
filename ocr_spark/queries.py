"""Registered operator queries over the driver's parquet tables.

One function per implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators: dedup, similarity search, text
analysis). Each takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names/values match the DuckDB oracle in ``ocr_spark.oracles``.

Conventions (so the driver's order-insensitive value-hash matches):
- every computed column is aliased identically to the oracle SQL
- doubles are rounded explicitly (round 4-6) on both sides
- counts/sums are cast to bigint on both sides
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# documents — extraction-semantics operators
# ---------------------------------------------------------------------------

# deterministic whitespace noise so the T5 regex chain has something to chew
# on (the driver's documents.text is single-spaced): inject a tab+double-space
# run and a blank-line run, then clean.
def q_t5_cleanup_normalize(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    noisy = F.regexp_replace(
        F.regexp_replace(F.col("text"), " value ", "  value\t "),
        " table ",
        " table\n\n\n\n",
    )
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(noisy, r"\n\s*\n\s*\n+", "\n\n"), r"[ \t]+", " "
        )
    )
    return doc.select("doc_id", cleaned.alias("cleaned"))


def q_f1_page_classifier(spark, sf_dir):
    # the reference rule (page_classifier.py:47): 'image' iff
    # len(strip(text)) < 30; applied to a deterministic per-doc prefix so
    # both branches occur on the driver data.
    doc = _t(spark, sf_dir, "documents")
    page_text = F.expr("substr(text, 1, cast((doc_id * 7) % 80 as int))")
    kind = F.when(F.length(F.trim(page_text)) < 30, "image").otherwise("text")
    return doc.select("doc_id", kind.alias("kind"))


def q_f3_empty_text_filter(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    page_text = F.expr("substr(text, 1, cast((doc_id * 7) % 80 as int))")
    return (
        doc.select("doc_id", page_text.alias("page_text"))
        .filter(F.trim(F.col("page_text")) != "")
        .select("doc_id")
    )


def q_s3_content_hash(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return doc.select("doc_id", F.sha2(F.col("text"), 256).alias("sha"))


def q_a6_dedup_exact(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return (
        doc.groupBy(F.sha2(F.col("text"), 256).alias("sha"))
        .agg(
            F.count("*").cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("rep_doc_id"),
        )
    )


def q_t9_stats_projection(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.min(F.length("text")).cast("bigint").alias("min_chars"),
        F.max(F.length("text")).cast("bigint").alias("max_chars"),
        F.expr("count_if(n_chars < 100)").cast("bigint").alias("short_docs"),
    )


def q_a3_ordered_concat(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return doc.groupBy("source").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(doc_id, text))),"
            " x -> x.text), '\\n\\n')"
        ).alias("full_text"),
        F.count("*").cast("bigint").alias("n_docs"),
    )


def q_a2_ordered_gather(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("first_doc_id"),
        F.max("doc_id").cast("bigint").alias("last_doc_id"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


def q_a8_top_k(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        doc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))
    )


def q_f7_limit_predicate(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return doc.filter(F.col("doc_id") < 50).select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    )


def q_token_count(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
    )


def q_doc_fingerprint(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return doc.select("doc_id", F.md5(norm).alias("fingerprint"))


def q_lang_id_heuristic(spark, sf_dir):
    # n-gram-free stopword heuristic: density of English function words
    doc = _t(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))

    def occurrences(word):
        needle = f" {word} "
        return (
            (F.length(padded) - F.length(F.regexp_replace(padded, needle, " ")))
            / (F.length(F.lit(needle)) - 1)
        )

    hits = occurrences("the") + occurrences("a")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    ratio = F.round(hits / n_tokens, 6)
    guess = F.when(ratio >= 0.05, "en-like").otherwise("other")
    return doc.select("doc_id", ratio.alias("stopword_ratio"), guess.alias("lang_guess"))


def q_quality_score(spark, sf_dir):
    doc = _t(spark, sf_dir, "documents")
    length = F.length("text")
    punct_ratio = (
        length - F.length(F.regexp_replace(F.col("text"), r"[.,;:!?]", ""))
    ) / length
    score = F.round(
        F.least(length, F.lit(400)).cast("double") / 400.0 * (1.0 - punct_ratio), 6
    )
    return doc.select("doc_id", score.alias("quality"))


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Near-dup candidates: 3-word-shingle Jaccard between document pairs.

    Distributed shape: explode shingles -> self-equi-join on shingle value
    (never a cross join) -> per-pair intersection counts -> Jaccard via
    inclusion-exclusion. Top-20 pairs, deterministic ordering.
    """
    doc = _t(spark, sf_dir, "documents")
    toks = doc.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(toks) >= 3 then array_distinct(transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),"
                " element_at(toks, i + 2)))) else cast(array() as array<string>) end"
            )
        ).alias("shingle"),
    )
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    joined = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6),
        )
    )
    w = Window.orderBy(F.col("jaccard").desc(), F.col("doc_a").asc(), F.col("doc_b").asc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_a", "doc_b", "jaccard")
    )


_MINHASH_K = 4


def q_minhash_signature(spark, sf_dir):
    """MinHash signatures over 3-word shingles (portable md5-based hashes)."""
    doc = _t(spark, sf_dir, "documents")
    toks = doc.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    shingled = toks.select(
        "doc_id",
        F.expr(
            "case when size(toks) >= 3 then array_distinct(transform(sequence(1, size(toks) - 2),"
            " i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),"
            " element_at(toks, i + 2)))) else cast(array() as array<string>) end"
        ).alias("shingles"),
    )
    cols = ["doc_id"]
    out = shingled
    for j in range(_MINHASH_K):
        # portable 60-bit hash: first 15 hex chars of md5("<j>|<shingle>")
        out = out.withColumn(
            f"h{j}",
            F.expr(
                f"array_min(transform(shingles, s ->"
                f" cast(conv(substr(md5(concat('{j}', '|', s)), 1, 15), 16, 10) as bigint)))"
            ),
        )
        cols.append(f"h{j}")
    return out.select(*cols)


# ---------------------------------------------------------------------------
# events — windows / chunking / ordered aggregation
# ---------------------------------------------------------------------------

def q_w1_running_count(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", F.count("*").over(w).cast("bigint").alias("running")
    )


def q_w2_stable_event_order(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ts, event_id, event_type))),"
            " x -> x.event_type), ',')"
        ).alias("type_seq")
    )


def q_p1_chunk_split(spark, sf_dir):
    # fixed-width chunking ≙ pdf_hybrid_service.py:43-58 (50 units/chunk)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("chunk_id", F.floor((F.col("rn") - 1) / 50).cast("bigint"))
        .groupBy("user_id", "chunk_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("event_id").cast("bigint").alias("first_event"),
            F.max("event_id").cast("bigint").alias("last_event"),
        )
    )


def q_a4_batch_summary(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").cast("bigint").alias("total_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.expr("count_if(event_type = 'error')").cast("bigint").alias("n_errors"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def q_f5_validation_predicates(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("value") >= 0) & (F.col("value") <= 50))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_valid"))
    )


def q_sessionize(spark, sf_dir):
    # 30-minute-gap sessionization (window-function-shaped logic, SURVEY §2.6)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-safe epoch micros (interpret wall time as UTC, like DuckDB epoch_us)
    epoch = F.expr("unix_micros(to_utc_timestamp(ts, 'UTC'))")
    prev = F.lag(epoch).over(w)
    new_sess = F.when(prev.isNull() | ((epoch - prev) > 1800000000), 1).otherwise(0)
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count("*").cast("bigint").alias("n_events"),
    )


def q_event_type_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.expr("count_if(event_type = 'click')").cast("bigint").alias("n_click"),
        F.expr("count_if(event_type = 'view')").cast("bigint").alias("n_view"),
        F.expr("count_if(event_type = 'error')").cast("bigint").alias("n_error"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# TPC-H-ish relational coverage
# ---------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


def q_tpch_q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


def q_tpch_q3(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-03-15"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-03-15"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def q_dim_broadcast_join(spark, sf_dir):
    # small-dimension join: always broadcast (SURVEY §4 "Catalyst gives us")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count("*").cast("bigint").alias("n_nations"))
    )


def q_semi_join_exists(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_discount") > 0.09).select("l_orderkey")
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# embeddings — similarity search
# ---------------------------------------------------------------------------

def _cosine_expr(a: str, b: str) -> str:
    # double-cast fold in element order on both engines
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
        f" / (sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v))"
        f" * sqrt(aggregate(transform({b}, x -> cast(x as double) * cast(x as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)))"
    )


def q_embedding_norms(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(
            F.expr(
                "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
                " cast(0.0 as double), (acc, v) -> acc + v))"
            ),
            4,
        ).alias("l2_norm"),
    )


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 query vector (ANN baseline)."""
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(query))
        .withColumn(
            "cosine", F.round(F.expr(_cosine_expr("embedding", "q_embedding")), 4)
        )
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("vec_id", "cosine")
    )


def q_lsh_sign_buckets(spark, sf_dir):
    """Sign-LSH bucketing on the first 8 dimensions (the ANN scale path:
    candidates come from one bucket instead of a full scan)."""
    emb = _t(spark, sf_dir, "embeddings")
    bucket = F.expr(
        "array_join(transform(slice(embedding, 1, 8),"
        " x -> case when x >= 0 then '1' else '0' end), '')"
    )
    return emb.groupBy(bucket.alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.min("vec_id").cast("bigint").alias("min_vec_id"),
    )


def q_ann_bucketed_topk(spark, sf_dir):
    """ANN via sign-LSH: top-5 cosine within the query's bucket only."""
    emb = _t(spark, sf_dir, "embeddings")
    bucket = F.expr(
        "array_join(transform(slice(embedding, 1, 8),"
        " x -> case when x >= 0 then '1' else '0' end), '')"
    )
    with_bucket = emb.withColumn("bucket", bucket)
    query = with_bucket.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding"), F.col("bucket").alias("q_bucket")
    )
    scored = (
        with_bucket.filter(F.col("vec_id") != 0)
        .join(F.broadcast(query), F.col("bucket") == F.col("q_bucket"))
        .withColumn(
            "cosine", F.round(F.expr(_cosine_expr("embedding", "q_embedding")), 4)
        )
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("vec_id", "cosine")
    )
