"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` counterpart on DuckDB over the same parquet, then
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, values canonicalized, rows sorted).

Usage:  python tests/harness_check.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from ocr_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Deliberately do NOT collapse 32.0 -> 32: the driver's canonicalizer
        # distinguishes float64 from int64, so an oracle that returns HUGEINT
        # (pandas float64) where Spark returns BIGINT must show up red here too.
        # Keep 9-sig-fig tolerance for genuine double math, but tag float-ness.
        s = f"{v:.9g}"
        if "." not in s and "e" not in s and "n" not in s:
            s += ".0"
        return s
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in canon_rows:
        h.update(row.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(only=None):
    spark = build_session(app_name="harness", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        else:
            sh = value_hash(s_cols, s_rows)
            dh = value_hash(d_cols, d_rows)
            if sh != dh:
                problems.append("value hash mismatch")
                # show first differing canonical row for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                a = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in s_rows)
                b = sorted("\x1f".join(canon(r[i]) for i in order_d) for r in d_rows)
                for x, y in zip(a, b):
                    if x != y:
                        problems.append(f"  spark : {x[:250]}")
                        problems.append(f"  duckdb: {y[:250]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"ok   {name}: {len(s_rows)} rows match")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all pairs match")
    spark.stop()


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
