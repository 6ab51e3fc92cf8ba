"""Per-stage diagnosis of minhash scaling: event-log stage metrics.

Runs q_minhash_signature (the long, driver-compare form — deliberately
the WORST case: it includes the 128x posexplode row materialization) on
the replicated bench table at a given core count with Spark event
logging on, then parses the event log to print per-stage wall, executor
run time, CPU time, GC time, task count, and shuffle bytes.

This is the tool that established (round 3):
- the map stage (shingle + md5 + 128 partial mins) scales ~0.87-0.89
  from 2 to 8 cores;
- the reduce stage of the LONG form (final agg + posexplode + sink)
  is memory-bandwidth-bound: its total CPU time TRIPLES going from
  2 to 8 concurrent threads in one JVM (26 -> 89 core-s on the same
  329 MB shuffle input), which is why the long form anti-scales and
  why bench.py's shuffle probe measures the production WIDE form.

Usage: python tools/minhash_stage_diag.py <cpus>
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BENCH_TMP, _force  # noqa: E402


def _read_eventlog_lines(evdir: str):
    """Yield JSON-decodable lines from a v1 or v2 (rolling, possibly
    zstd-compressed) Spark event log directory."""
    paths = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
        and not os.path.basename(p).startswith(".")
    ]
    for path in paths:
        if path.endswith(".zstd"):
            data = subprocess.run(
                ["zstd", "-dc", path], capture_output=True, check=True
            ).stdout
        else:
            with open(path, "rb") as fh:
                data = fh.read()
        yield from data.decode(errors="replace").splitlines()


def parse_stages(evdir: str) -> dict:
    stages: dict = {}
    for line in _read_eventlog_lines(evdir):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            s = stages.setdefault(si["Stage ID"], _blank())
            s["name"] = si["Stage Name"].split()[0]
            s["tasks"] = si["Number of Tasks"]
            s["wall_s"] = round(
                (si["Completion Time"] - si["Submission Time"]) / 1000, 2
            )
        elif ev.get("Event") == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            s = stages.setdefault(ev["Stage ID"], _blank())
            s["run_s"] += m.get("Executor Run Time", 0) / 1000
            s["gc_s"] += m.get("JVM GC Time", 0) / 1000
            s["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
            sr = m.get("Shuffle Read Metrics") or {}
            s["shuf_read_mb"] += (
                sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
            ) / 1e6
            sw = m.get("Shuffle Write Metrics") or {}
            s["shuf_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
    return stages


def _blank() -> dict:
    return {
        "name": "?",
        "tasks": 0,
        "wall_s": 0.0,
        "run_s": 0.0,
        "gc_s": 0.0,
        "cpu_s": 0.0,
        "shuf_read_mb": 0.0,
        "shuf_write_mb": 0.0,
    }


def main() -> None:
    cpus = int(sys.argv[1])
    rep = int(os.environ.get("SPARK_GRAFT_MINHASH_REPLICATE", "128"))
    big = os.path.join(BENCH_TMP, f"minhash_docs_{rep}")
    evdir = os.path.join(BENCH_TMP, f"evlog_{cpus}")
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from ocr_spark.session import build_session

    spark = build_session(
        app_name=f"diag-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
        max_partition_bytes=4 * 1024 * 1024,
        extra_conf={
            "spark.local.dir": os.path.join(BENCH_TMP, "spark-local"),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import ocr_spark.queries as Q

    df = Q.q_minhash_signature(spark, big)
    # one warm-up + one measured run (both land in the event log;
    # compare same-shape stage pairs and read the warm one)
    for i in range(2):
        t0 = time.perf_counter()
        _force(df)
        print(f"run {i}: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    spark.stop()

    stages = parse_stages(evdir)
    for sid in sorted(stages):
        s = stages[sid]
        print(json.dumps({"stage": sid, **{
            k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in s.items()
        }}))


if __name__ == "__main__":
    main()
