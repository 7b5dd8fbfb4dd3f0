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

from tbbid_scrapy_spark.functions.urls import host_col


def simulated_clock(
    fetch_log: DataFrame,
    politeness: DataFrame,
    default_delay_s: float = 2.0,
    concurrency: int = 4,
) -> DataFrame:
    """Per-wave simulated duration; one row per wave:
    (wave, fetches, sim_duration_s).

    Per-host concurrency comes from the politeness table's
    ``budget_per_wave`` (the budget IS per-domain concurrency in the
    reference mapping, settings.py:29); the ``concurrency`` parameter is
    only the fallback for hosts without a politeness row — a host
    crawled at budget 8 must be modeled at divisor 8, not a global 4."""
    per_host = (
        # host via the SAME canonical helper politeness enforcement uses
        # (functions.urls.host_col) — an inline re-derivation here would
        # silently diverge from enforced hosts if host_col ever changes
        fetch_log.withColumn("host", host_col(F.col("url_norm")))
        .groupBy("wave", "host")
        .agg(F.count("*").alias("n"))
        # min-aggregate, not dropDuplicates: duplicate politeness rows
        # for one host would otherwise pick a shuffle-dependent delay
        # (politeness_rank defends the same hazard, frontier.py). No
        # broadcast hint either — a per-host table is unbounded at crawl
        # scale and a forced broadcast OOMs the driver; let AQE decide.
        .join(
            politeness.groupBy("host").agg(
                F.min("delay_s").alias("delay_s"),
                F.min("budget_per_wave").alias("_budget"),
            ),
            "host", "left",
        )
        .withColumn("delay_s", F.coalesce(F.col("delay_s"), F.lit(default_delay_s)))
        .withColumn("_conc", F.coalesce(F.col("_budget"), F.lit(concurrency)))
        .withColumn(
            "host_duration",
            F.ceil(F.col("n") / F.col("_conc")) * F.col("delay_s"),
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
