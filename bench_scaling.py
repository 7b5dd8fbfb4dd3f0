"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the rule's N→4N executor
scaling is evidenced by running the SAME job at two local parallelism
levels (local[8] vs local[32]) in separate JVMs (subprocess per level —
a Spark master cannot be changed within one JVM) on identical input,
reporting throughput at both plus scaling efficiency.

Efficiency = (T_N / T_4N) / 4 for the ideal-linear case = 1.0; the
north_rule asks ≥ 0.8... on a real cluster. In a single-box local mode
the two "cluster sizes" share memory bandwidth and disk, so the
printed efficiency is a lower bound on multi-executor scaling for this
shuffle-dominated workload.

Usage: python bench_scaling.py [--cpus 8 32] [--mode frontier|queries]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from tbbid_scrapy_spark.session import get_spark

cpus = int(sys.argv[1])
mode = sys.argv[2]
spark = get_spark(app_name=f"scale{{cpus}}", cpus=cpus, shuffle_partitions=cpus)

if mode == "frontier":
    import bench
    t0 = time.monotonic()
    out = bench.bench_frontier(spark)
    out["wall_sec"] = round(time.monotonic() - t0, 3)
    out["work_units"] = out["urls_fetched"]
else:
    import __spark_entry__ as entrymod
    import bench
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entrymod.queries()
    t0 = time.monotonic()
    rows = 0
    for name in bench.HEADLINE:
        rows += qs[name](spark, sf_dir).count()
    sec = time.monotonic() - t0
    out = {{"wall_sec": round(sec, 3), "work_units": rows}}
print("RESULT:" + json.dumps(out))
"""


def run_level(repo: str, cpus: int, mode: str) -> dict:
    code = WORKER.format(repo=repo)
    proc = subprocess.run(
        [sys.executable, "-c", code, str(cpus), mode],
        capture_output=True, text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[len("RESULT:"):])
    raise RuntimeError(f"worker cpus={cpus} failed:\n{proc.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", nargs=2, type=int, default=[8, 32])
    ap.add_argument("--mode", default="frontier", choices=["frontier", "queries"])
    args = ap.parse_args()
    repo = os.path.dirname(os.path.abspath(__file__))

    lo, hi = args.cpus
    r_lo = run_level(repo, lo, args.mode)
    r_hi = run_level(repo, hi, args.mode)
    speedup = r_lo["wall_sec"] / r_hi["wall_sec"]
    efficiency = speedup / (hi / lo)
    out = {
        "mode": args.mode,
        "levels": {str(lo): r_lo, str(hi): r_hi},
        "throughput": {
            str(lo): round(r_lo["work_units"] / r_lo["wall_sec"], 1),
            str(hi): round(r_hi["work_units"] / r_hi["wall_sec"], 1),
        },
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "note": f"local[{lo}] vs local[{hi}] on one box (shared memory "
                f"bandwidth); N→{hi//lo}N-executor proxy per BASELINE.md",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
