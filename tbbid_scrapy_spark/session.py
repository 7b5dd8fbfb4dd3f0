"""SparkSession construction.

One place for every config knob so tests, bench, and the entry point agree.
Defaults are sized for the sandbox (local[N], single JVM) but chosen to be
the same settings we would ship to a 1000-executor cluster: AQE on
(runtime re-planning + skew-join splitting), Arrow on (every pandas UDF
crosses the JVM/Python boundary in columnar batches), shuffle partitions
matched to parallelism instead of the legacy 200.

Timezone is Asia/Shanghai because the reference stores naive local
datetimes (/root/reference/xizang/spiders/bid_info.py:18 uses
datetime.now() in CST context); pinning the session TZ makes timestamp
semantics deterministic across machines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tbbid_scrapy_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` controls ``local[N]``; ``shuffle_partitions`` defaults to the
    same N so a local run has one shuffle partition per core — on a real
    cluster this would instead be ~2-3x total executor cores (set via
    ``extra_conf``), and AQE coalesces the excess at runtime.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "Asia/Shanghai")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # ANSI off: the reference's float()/None coercions (SURVEY.md §2.8
        # F3) rely on permissive casts; try_* functions are used where the
        # distinction matters.
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
