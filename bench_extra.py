"""Per-query iteration bench (supplementary — bench.py is the frozen
driver contract; this file exists so optimization work can isolate one
query per guide §1.4 without touching it).

Usage: python bench_extra.py [--repeats N] [--noop] [query ...]

Methodology matches bench.py's timed loop: warm each requested query
once at sf0.001 (codegen knee out of the recording), then time each
query cold-cache (scratch.release + clearCache between runs) inside the
warm JVM. --noop materializes every column via the noop sink (guide
§1.4) instead of .count(); default is .count() for parity with the
frozen bench. Jobs are labeled via setJobDescription (guide §1.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_SF_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from tbbid_scrapy_spark.operators import scratch
    from tbbid_scrapy_spark.session import get_spark

    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    repeats = 3
    noop = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        elif args[i] == "--noop":
            noop = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    queries = entrymod.queries()
    if not names:
        names = list(queries)

    spark = get_spark(app_name="bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext

    for name in names:
        sc.setJobDescription(f"warmup: {name}")
        try:
            queries[name](spark, WARMUP_SF_DIR).count()
        except Exception as e:
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
        scratch.release()
        spark.catalog.clearCache()

    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for r in range(repeats):
            sc.setJobDescription(f"{name} [{r}]")
            t0 = time.monotonic()
            df = queries[name](spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            samples.append(round(time.monotonic() - t0, 3))
            scratch.release()
            spark.catalog.clearCache()
        out[name] = samples
        print(f"# {name}: min={min(samples)} samples={samples} rows={n} "
              f"load={os.getloadavg()[0]:.1f}", file=sys.stderr)
    print(json.dumps({"queries_min": {k: min(v) for k, v in out.items()},
                      "samples": out, "noop": noop, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
