"""Diagnose which stage of the minhash job stops scaling local[2]->local[8].

Usage: python tools/minhash_scale_probe.py <cpus> <variant>
variants: shingle (explode+count), md5 (explode+md5+sum), agg (full wide agg),
          full (signature posexplode + noop)
Prints one JSON line with wall seconds (best of 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BENCH_TMP, _build, _force  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    variant = sys.argv[2]
    rep = int(os.environ.get("SPARK_GRAFT_MINHASH_REPLICATE", "128"))
    big = os.path.join(BENCH_TMP, f"minhash_docs_{rep}")
    spark = _build(cpus)

    import ocr_spark.queries as Q
    from pyspark.sql import functions as F

    doc = Q._t_spread(spark, big, "documents")
    toks = doc.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
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
    if variant == "shingle":
        df = shingles.groupBy().agg(F.count("*").alias("n"))
    elif variant == "md5":
        df = shingles.select(
            F.expr("cast(conv(substr(md5(shingle), 1, 8), 16, 10) as bigint)").alias("h1")
        ).groupBy().agg(F.sum("h1").alias("s"))
    elif variant == "agg":
        df = Q._minhash_wide(spark, big)
    else:
        df = Q.q_minhash_signature(spark, big)

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _force(df)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    spark.stop()
    print(json.dumps({"cpus": cpus, "variant": variant, "sec": round(best, 3)}))


if __name__ == "__main__":
    main()
