"""Driver-contract registry invariants.

The driver samples ~50 of the registered queries per round and compares
each against its DuckDB oracle; correctness history accumulates across
rounds BY NAME. Renaming or dropping a query silently discards its green
history and shows up as churn in the next round's rotation — so the
registered name set may only GROW.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every name that has ever appeared in a driver CORRECTNESS round —
# these must stay registered under the same names forever
_HISTORICAL_ROUNDS = (
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r02.json",
    "CORRECTNESS_r03.json",
)


def test_registered_names_superset_of_history():
    names = set(entrymod.queries())
    for fname in _HISTORICAL_ROUNDS:
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            continue
        missing = set(json.load(open(path))) - names
        assert not missing, f"{fname}: renamed/dropped queries {sorted(missing)}"


def test_every_oracle_has_a_query():
    queries = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    orphaned = oracles - queries
    assert not orphaned, f"oracles without a query: {sorted(orphaned)}"


def test_rows_only_queries_are_documented():
    """Queries without an oracle are the non-SQL-expressible set; keep it
    small and intentional (each needs a docstring explaining why)."""
    queries = entrymod.queries()
    oracles = set(entrymod.oracle_sql())
    rows_only = {n for n in queries if n not in oracles}
    # the intentional set: vectorized-UDF extraction paths + metrics
    allowed = {
        "extract_pipeline",
        "extract_udf_text_parity",
        "rollup_text_parity",
        "conv_rollup",
        "partition_metrics",
        "turn_gap_stats",
        "stateful_conv_progress",
        "mm_feature_extract",
        # HLL sketch estimates differ between engines by design; the
        # bounded-relative-error contract is pinned in test_hygiene_edge
        "approx_distinct_grams",
        # physical-plan introspection (Exchange count of the bucketed
        # join) is not SQL-expressible; pinned in test_bucketing.py
        "bucketed_layout_audit",
        # FFD is a sequential fold; pure-python parity in test_packing.py
        "bin_packing_ffd",
    }
    unexpected = rows_only - allowed
    assert not unexpected, f"undocumented rows-only queries: {sorted(unexpected)}"


def test_spark_sql_interface_matches_dataframe_api(spark):
    """The engine's SQL surface: the same plans are reachable through
    spark.sql over registered views — a pure-SQL twin of a scan-agg
    (tpch_q6 shape) and a per-row text op (token_count shape) must
    return exactly what the DataFrame-API queries return."""
    import ocr_spark.queries as Q

    sf_dir = "/root/testdata/sf0.001"
    for name in ("lineitem", "documents"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(
            name
        )

    sql_q6 = spark.sql(
        """
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """
    ).collect()
    df_q6 = Q.q_tpch_q6(spark, sf_dir).collect()
    assert [r.asDict() for r in sql_q6] == [r.asDict() for r in df_q6]

    sql_tc = {
        (r.doc_id, r.n_tokens)
        for r in spark.sql(
            "SELECT doc_id, CAST(size(split(trim(text), '\\\\s+')) AS BIGINT)"
            " AS n_tokens FROM documents"
        ).collect()
    }
    df_tc = {
        (r.doc_id, r.n_tokens)
        for r in Q.q_token_count(spark, sf_dir).collect()
    }
    assert sql_tc == df_tc
