"""Simulated politeness clock — post-crawl analytics over the fetch log.

The reference spaces same-domain requests by DOWNLOAD_DELAY (2 s,
settings.py:26) with ≤4 concurrent per domain (:29). The wave model
enforces the same budget structurally (≤ budget fetches/host/wave); the
simulated wall-clock a real polite crawler would have spent is derived
AFTER the crawl from the fetch log:

    wave_duration = max over hosts of
        ceil(fetches(host, wave) / concurrency) × delay_s

    total = Σ wave_duration

This keeps the hot loop free of clock bookkeeping while still reporting
the politeness-faithful timeline (BASELINE.md's 1-4 req/s ceiling
comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simulated_clock(
    fetch_log: DataFrame,
    politeness: DataFrame,
    default_delay_s: float = 2.0,
    concurrency: int = 4,
) -> DataFrame:
    """Per-wave simulated duration; one row per wave:
    (wave, fetches, sim_duration_s)."""
    per_host = (
        fetch_log.withColumn(
            "host", F.lower(F.parse_url(F.col("url_norm"), F.lit("HOST")))
        )
        .groupBy("wave", "host")
        .agg(F.count("*").alias("n"))
        # min-aggregate, not dropDuplicates: duplicate politeness rows
        # for one host would otherwise pick a shuffle-dependent delay
        # (politeness_rank defends the same hazard, frontier.py). No
        # broadcast hint either — a per-host table is unbounded at crawl
        # scale and a forced broadcast OOMs the driver; let AQE decide.
        .join(politeness.groupBy("host").agg(F.min("delay_s").alias("delay_s")),
              "host", "left")
        .withColumn("delay_s", F.coalesce(F.col("delay_s"), F.lit(default_delay_s)))
        .withColumn(
            "host_duration",
            F.ceil(F.col("n") / F.lit(concurrency)) * F.col("delay_s"),
        )
    )
    return (
        per_host.groupBy("wave")
        .agg(
            F.sum("n").alias("fetches"),
            F.max("host_duration").alias("sim_duration_s"),
        )
        .orderBy("wave")
    )
