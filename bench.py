"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus a "frontier" section with URL-frontier throughput
(urls scheduled+deduped per second — the BASELINE.json target metric)}.

Scaling-efficiency evidence (N vs 4N cores) is produced by
bench_scaling.py (separate JVMs per parallelism level) and recorded in
BASELINE.md / BENCH notes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "pricing_summary",
    "broadcast_dim_join",
    "parent_child_join",
    "window_topk",
    "explode_split",
    "dedup_exact",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash",
    "text_stats",
    "lang_id",
    "cosine_topk",
    "merge_upsert",
]

# frontier bench sizing: wide site (shallow, politeness lifted) so the
# measurement is engine throughput, not the simulated 2s/host politeness
FRONTIER_LISTING_PAGES = 4
FRONTIER_PROJECTS_PER_LISTING = 400
FRONTIER_BUDGET = 10**6


def bench_frontier(spark) -> dict:
    from pyspark.sql import types as T

    from tbbid_scrapy_spark import schemas
    from tbbid_scrapy_spark.fixtures import sitegen
    from tbbid_scrapy_spark.operators.bloom import BloomSpec
    from tbbid_scrapy_spark.plans.crawl import CrawlConfig, CrawlEngine

    site = sitegen.build_site(
        n_listing_pages=FRONTIER_LISTING_PAGES,
        projects_per_listing=FRONTIER_PROJECTS_PER_LISTING,
        seed=42,
    )
    schema = T.StructType(
        list(schemas.DOCUMENTS.fields)
        + [T.StructField("fail_first", T.IntegerType(), False)]
    )
    site_df = spark.createDataFrame(sitegen.site_to_rows(site), schema).cache()
    site_df.count()
    pol = spark.createDataFrame(
        sitegen.default_politeness(FRONTIER_BUDGET, FRONTIER_BUDGET), schemas.POLITENESS
    )
    rob = spark.createDataFrame(sitegen.default_robots(), schemas.ROBOTS)
    spec = BloomSpec.for_capacity(expected_n=10_000_000, fp_rate=0.01, n_shards=64)
    eng = CrawlEngine(
        spark, site_df, sitegen.default_seeds(), pol, rob,
        CrawlConfig(max_waves=50, seen_mode="hybrid", bloom_spec=spec),
    )
    t0 = time.monotonic()
    st = eng.run()
    sec = time.monotonic() - t0
    n_fetched = st.fetch_log.count()
    n_seen = st.seen.count()
    return {
        "pages": len(site),
        "urls_fetched": int(n_fetched),
        "urls_seen": int(n_seen),
        "waves": int(st.wave),
        "sec": round(sec, 3),
        "urls_per_sec": round(n_fetched / sec, 1),
    }


def main() -> None:
    from tbbid_scrapy_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", cpus=CPUS, shuffle_partitions=CPUS)
    queries = entrymod.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        n = df.count()  # materialize fully
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    frontier = bench_frontier(spark)
    print(f"# frontier: {frontier}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "frontier": frontier,
        "cpus": CPUS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
