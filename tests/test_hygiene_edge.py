"""Edge and invariant tests for the corpus-hygiene operators.

PII-scrub regex edges run against a crafted adversarial corpus
(``docs_dir``); the decontam/packing/BPE invariant tests run against the
sf0.001 parquet tables (they pin cross-row structural invariants, which
need a realistic corpus rather than a 3-row edge fixture).

On the PII edge: the email pattern contains ``\\.`` before the TLD.
Passing it through
``F.expr`` string interpolation lets Spark's SQL literal parser eat the
backslash, silently turning ``\\.`` into ``.`` (match-any) for the COUNT
columns only — so counts and scrubbed text disagree on inputs like
``a@b_cd``. q_pii_scrub now passes the pattern as a Column literal
(F.lit); these tests pin that the counts use the same pattern as the
scrub, and that Spark agrees with the DuckDB oracle on the edge corpus.
"""

import re

import duckdb
import pytest

from ocr_spark import queries as Q
from ocr_spark.oracles import ORACLES

# text crafted so the broken (backslash-eaten) pattern diverges:
#  - "a@b_cd" matches [a-zA-Z0-9.-]+ . [a-zA-Z]{2,} with `.` = any char,
#    but NOT with a literal dot -> broken counted 1, correct counts 0
#  - "x@y.com" is a real email either way
DOCS = [
    (1, "reach me at x@y.com or not at a@b_cd today", "en", "web", 44),
    (2, "no addresses here, just value and data words", "en", "web", 45),
    (3, "double hit p.q-r@s.t.co and u@v_wx trailing", "en", "web", 43),
]


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pii_docs")
    df = spark.createDataFrame(
        DOCS, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.parquet(str(root / "documents.parquet"))
    return str(root)


def test_email_count_uses_literal_dot(spark, docs_dir):
    rows = {r["doc_id"]: r for r in Q.q_pii_scrub(spark, docs_dir).collect()}
    # doc 1: only x@y.com counts; a@b_cd must NOT (literal-dot pattern)
    assert rows[1]["n_emails"] == 1
    # doc 3: only the dotted address counts, not u@v_wx
    assert rows[3]["n_emails"] == 1


def test_counts_match_scrub_replacements(spark, docs_dir):
    for r in Q.q_pii_scrub(spark, docs_dir).collect():
        assert r["n_emails"] == r["scrubbed"].count("<EMAIL>"), r["doc_id"]
        assert r["n_phones"] == r["scrubbed"].count("<PHONE>"), r["doc_id"]
        # nothing the scrub left behind should still look like PII
        assert not re.search(Q._EMAIL_RE, r["scrubbed"]), r["doc_id"]


SF_DIR = "/root/testdata/sf0.001"


def test_decontam_eval_docs_excluded_and_flag_consistent(spark):
    rows = Q.q_benchmark_decontam(spark, SF_DIR).collect()
    assert rows, "decontam returned nothing"
    for r in rows:
        assert r["doc_id"] % Q._DECON_EVAL_MOD != 0, "eval doc leaked into output"
        assert 0 <= r["n_hits"] <= r["n_grams"], r
        assert r["contaminated"] == (r["n_hits"] > 0), r


def test_sequence_packing_spans_are_contiguous_per_shard(spark):
    rows = Q.q_sequence_packing(spark, SF_DIR).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rs:
            assert r["tok_start"] == offset, (shard, r)
            assert r["tok_end"] == offset + r["n_tokens"], (shard, r)
            assert r["first_seq"] == r["tok_start"] // Q._PACK_SEQ_LEN
            assert r["last_seq"] == (r["tok_end"] - 1) // Q._PACK_SEQ_LEN
            offset = r["tok_end"]


def test_bpe_top_merges_ordering_and_shape(spark):
    rows = Q.q_bpe_top_merges(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    keys = [(-r["n"], r["pair"]) for r in rows]
    assert keys == sorted(keys), "top-k not in (count desc, pair asc) order"
    assert all(len(r["pair"]) == 2 for r in rows)


def test_matches_duckdb_oracle_on_edge_corpus(spark, docs_dir):
    spark_rows = sorted(
        (r["doc_id"], r["n_emails"], r["n_phones"], r["scrubbed"])
        for r in Q.q_pii_scrub(spark, docs_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{docs_dir}/documents.parquet/*.parquet')"
    )
    oracle_rows = sorted(tuple(t) for t in con.execute(ORACLES["pii_scrub"]).fetchall())
    assert spark_rows == oracle_rows


def test_bloom_decontam_is_superset_of_exact(spark):
    """Bloom membership has NO false negatives: every gram the exact
    decontam join flags must also be flagged by the filter, per doc —
    so n_maybe >= n_hits and exact-contaminated implies bloom-flagged.
    (False positives are allowed; that's the m/k trade.)"""
    sf = "/root/testdata/sf0.001"
    exact = {
        r["doc_id"]: r
        for r in Q.q_benchmark_decontam(spark, sf).collect()
    }
    bloom = {r["doc_id"]: r for r in Q.q_bloom_decontam(spark, sf).collect()}
    assert set(exact) == set(bloom)
    for did, e in exact.items():
        b = bloom[did]
        assert b["n_grams"] == e["n_grams"]
        assert b["n_maybe"] >= e["n_hits"], did
        if e["contaminated"]:
            assert b["bloom_contaminated"], did


def test_countmin_estimate_never_undercounts(spark):
    """CM one-sided error across the WHOLE bigram vocabulary (not just
    the emitted top-20): min-over-rows >= true count for every item."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    doc = spark.read.parquet(f"{sf}/documents.parquet")
    toks = doc.select(F.split(F.trim(F.col("text")), r"\s+").alias("t"))
    grams = toks.select(
        F.explode(
            F.expr(
                "case when size(t) >= 2 then transform(sequence(1, size(t) - 1),"
                " i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
                " else cast(array() as array<string>) end"
            )
        ).alias("g")
    )
    vocab = grams.groupBy("g").agg(F.count("*").alias("c"))
    rows = vocab.select(
        "g",
        "c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(
                            f"cast(conv(substr(md5(concat('{j}:', g)), 1, 4), 16, 10)"
                            f" as bigint) % {Q._CM_WIDTH}"
                        ).alias("pos"),
                    )
                    for j in range(Q._CM_DEPTH)
                ]
            )
        ).alias("x"),
    ).select("g", "c", "x.j", "x.pos")
    sketch = rows.groupBy("j", "pos").agg(F.sum("c").alias("counter"))
    est = (
        rows.join(sketch, ["j", "pos"])
        .groupBy("g", "c")
        .agg(F.min("counter").alias("est"))
    )
    bad = est.filter(F.col("est") < F.col("c")).count()
    assert bad == 0
    # and the sketch really is constant-size: at most d*w counters
    assert sketch.count() <= Q._CM_DEPTH * Q._CM_WIDTH


def test_approx_distinct_within_hll_error_bound(spark):
    """HLL++ at rsd=0.05 must land within 3*rsd of the exact distinct
    count for every source (3 sigma; deterministic for a fixed input)."""
    rows = Q.q_approx_distinct_grams(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert abs(r["n_approx"] - r["n_exact"]) <= max(3, 0.15 * r["n_exact"]), r


def test_fuzzy_decontam_semantics_on_known_corpus(spark):
    """Exact copies of an eval doc must flag with jaccard 1.0; disjoint
    docs must not flag; every verified hit implies a band candidate."""
    from ocr_spark.dedup import fuzzy_decontam_report

    eval_text = "the quick brown fox jumps over the lazy dog again today"
    rows = [
        (1, eval_text),                                   # exact eval copy
        (2, eval_text + " extra trailing words here now"),  # near-dup superset
        (3, "completely different tokens nothing shared at all everwhere"),
    ]
    train = spark.createDataFrame(rows, "doc_id bigint, text string")
    evalset = spark.createDataFrame([(100, eval_text)], "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in fuzzy_decontam_report(train, evalset).collect()}
    assert got[1]["contaminated"] and got[1]["max_eval_jaccard"] == 1.0
    assert got[2]["contaminated"]  # shares a long prefix: high jaccard
    assert not got[3]["contaminated"] and got[3]["n_eval_candidates"] == 0
    for r in got.values():  # a verified score requires a band candidate
        assert r["max_eval_jaccard"] == 0.0 or r["n_eval_candidates"] >= 1
