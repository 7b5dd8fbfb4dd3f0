"""spark-submit entry point.

    spark-submit --py-files tbbid_scrapy_spark.zip -m tbbid_scrapy_spark ...
    # or locally:
    python -m tbbid_scrapy_spark crawl --checkpoint /tmp/ck --max-waves 20
    python -m tbbid_scrapy_spark resume --checkpoint /tmp/ck
    python -m tbbid_scrapy_spark bench

The crawl/resume commands run the frontier engine against the synthetic
site fixture (a real deployment swaps the site table for an HTTP fetch
stage with the same row contract — plans/crawl.py step 3). On a cluster,
drop the --cpus flag and let spark-submit's --master/--num-executors
govern parallelism; the engine reads the active SparkSession.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tbbid_scrapy_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    crawl = sub.add_parser("crawl", help="run the frontier crawl")
    crawl.add_argument("--checkpoint", default=None)
    crawl.add_argument("--max-waves", type=int, default=100)
    crawl.add_argument("--seen-mode", default="hybrid",
                       choices=["exact", "bloom", "hybrid", "cuckoo"])
    crawl.add_argument("--listings", type=int, default=4)
    crawl.add_argument("--projects", type=int, default=400)
    crawl.add_argument("--budget", type=int, default=4)
    crawl.add_argument("--cpus", type=int, default=None)

    res = sub.add_parser("resume", help="resume a checkpointed crawl")
    res.add_argument("--checkpoint", required=True)
    res.add_argument("--max-waves", type=int, default=100)
    res.add_argument("--cpus", type=int, default=None)
    # the fixture site is rebuilt deterministically at resume, so these
    # must match the original crawl's values or pending URLs point at
    # pages the rebuilt site doesn't carry
    res.add_argument("--seen-mode", default="hybrid",
                     choices=["exact", "bloom", "hybrid", "cuckoo"])
    res.add_argument("--listings", type=int, default=4)
    res.add_argument("--projects", type=int, default=400)
    res.add_argument("--budget", type=int, default=4)

    sub.add_parser("bench", help="run bench.py main")

    args = ap.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from pyspark.sql import types as T

    from tbbid_scrapy_spark import schemas
    from tbbid_scrapy_spark.fixtures import sitegen
    from tbbid_scrapy_spark.operators.bloom import BloomSpec
    from tbbid_scrapy_spark.plans.crawl import CrawlConfig, CrawlEngine
    from tbbid_scrapy_spark.session import get_spark

    spark = get_spark(app_name=f"tbbid_{args.cmd}", cpus=args.cpus)
    site_schema = T.StructType(
        list(schemas.DOCUMENTS.fields)
        + [T.StructField("fail_first", T.IntegerType(), False)]
    )
    if args.cmd == "crawl":
        site = sitegen.build_site(args.listings, args.projects, seed=42)
        site_df = spark.createDataFrame(sitegen.site_to_rows(site), site_schema)
        pol = spark.createDataFrame(
            sitegen.default_politeness(args.budget, args.budget), schemas.POLITENESS
        )
        rob = spark.createDataFrame(sitegen.default_robots(), schemas.ROBOTS)
        from tbbid_scrapy_spark.operators.cuckoo import CuckooSpec

        spec = BloomSpec.for_capacity(10_000_000, 0.01, 64)
        cuckoo = (
            CuckooSpec.for_capacity(10_000_000, 64)
            if args.seen_mode == "cuckoo"
            else None
        )
        eng = CrawlEngine(
            spark, site_df, sitegen.default_seeds(), pol, rob,
            CrawlConfig(max_waves=args.max_waves, seen_mode=args.seen_mode,
                        bloom_spec=spec, cuckoo_spec=cuckoo,
                        checkpoint_dir=args.checkpoint),
        )
        st = eng.run()
    else:
        site = sitegen.build_site(args.listings, args.projects, seed=42)
        site_df = spark.createDataFrame(sitegen.site_to_rows(site), site_schema)
        pol = spark.createDataFrame(
            sitegen.default_politeness(args.budget, args.budget), schemas.POLITENESS
        )
        rob = spark.createDataFrame(sitegen.default_robots(), schemas.ROBOTS)
        from tbbid_scrapy_spark.operators.cuckoo import CuckooSpec

        spec = BloomSpec.for_capacity(10_000_000, 0.01, 64)
        cuckoo = (
            CuckooSpec.for_capacity(10_000_000, 64)
            if args.seen_mode == "cuckoo"
            else None
        )
        eng = CrawlEngine(
            spark, site_df, sitegen.default_seeds(), pol, rob,
            CrawlConfig(max_waves=args.max_waves, seen_mode=args.seen_mode,
                        bloom_spec=spec, cuckoo_spec=cuckoo,
                        checkpoint_dir=args.checkpoint),
        )
        st = eng.run(resume=True)

    summary = {
        "waves": st.wave,
        "fetched": st.fetch_log.count(),
        "seen": st.seen.count(),
        "extracted_spans": st.extracted.count(),
        # st.metrics is the THIS-process wave log (empty right after a
        # resume that ran no waves); the durable per-(wave, partition,
        # host) lineage lives in the metrics delta table
        "metrics": st.metrics,
        "metric_rows_total": st.metrics_table.count(),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
