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
_HISTORICAL_ROUNDS = ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json")


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
    }
    unexpected = rows_only - allowed
    assert not unexpected, f"undocumented rows-only queries: {sorted(unexpected)}"
