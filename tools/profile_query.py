"""Per-job/stage timing profile for one query run (guide §1.1/§7.1).

Usage: python tools/profile_query.py <query> [<query> ...]

Warm the query at sf0.001 and once at sf0.1, then run it once more
cold-cache (scratch.release + clearCache) and dump every job and stage
of that run with wall times via the UI REST API. Supplementary tooling
only — bench.py stays frozen.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_SF_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _get(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}", timeout=30) as r:
        return json.loads(r.read())


def main() -> None:
    from tbbid_scrapy_spark.operators import scratch
    from tbbid_scrapy_spark.session import get_spark

    import __spark_entry__ as entrymod

    names = sys.argv[1:]
    queries = entrymod.queries()
    spark = get_spark(
        app_name="profile_query", cpus=CPUS, shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext

    for name in names:
        sc.setJobDescription(f"warmup: {name}")
        queries[name](spark, WARMUP_SF_DIR).count()
        scratch.release()
        spark.catalog.clearCache()
        queries[name](spark, SF_DIR).count()
        scratch.release()
        spark.catalog.clearCache()

        before_jobs = {j["jobId"] for j in _get(spark, "jobs")}
        sc.setJobDescription(f"measured: {name}")
        t0 = time.time()
        queries[name](spark, SF_DIR).count()
        wall = time.time() - t0
        scratch.release()
        spark.catalog.clearCache()

        jobs = [j for j in _get(spark, "jobs") if j["jobId"] not in before_jobs]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        prev_end = None
        for j in jobs:
            sub = time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")) + float(j["submissionTime"][20:23]) / 1000
            end = time.mktime(time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")) + float(j["completionTime"][20:23]) / 1000
            gap = "" if prev_end is None else f" gap {sub - prev_end:+.3f}s"
            prev_end = end
            print(
                f"  job {j['jobId']}: {end - sub:.3f}s, {j['numCompletedStages']} stages"
                f" ({j['numTasks']} tasks){gap}  [{j.get('description', '')[:60]}]"
            )
        stages = _get(spark, "stages?status=complete")
        sids = {s for j in jobs for s in j["stageIds"]}
        st = [s for s in stages if s["stageId"] in sids]
        st.sort(key=lambda s: s["stageId"])
        for s in st:
            print(
                f"    stage {s['stageId']}: {s['executorRunTime']/1000:.3f}s task-time,"
                f" {s['numCompleteTasks']} tasks, {s['name'].splitlines()[0][:70]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
