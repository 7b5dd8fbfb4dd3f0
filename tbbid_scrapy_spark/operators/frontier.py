"""Frontier operators: dedup, robots enforcement, politeness budgeting,
priority-ranked wave selection, skew salting.

Maps the reference's implicit Scrapy scheduler semantics
(/root/reference/xizang/settings.py:23-30 concurrency + delay;
SURVEY.md §2.11) onto declarative DataFrame ops:

- seen-dedup       → left_anti join (exact) / bloom prefilter (scale)
- robots           → broadcast anti-join on (host, path_prefix, allow)
- politeness       → window rank per host, keep rank ≤ budget_per_wave
- priority queue   → the same window's ORDER BY (priority desc, then
                     discovery order) — Scrapy's priority queue semantics
                     as a rank expression, fully shuffle-parallel
- host skew        → salted repartition before the parse stage so one hot
                     host (≥80% of URLs in the fixture) spreads over all
                     executor cores instead of one task
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(candidates: DataFrame, seen: DataFrame,
                hash_col: str = "url_hash") -> DataFrame:
    """candidates − seen via left_anti on the 64-bit hash, after in-batch
    dropDuplicates (a URL discovered twice in one wave enters once —
    matching the reference dupefilter, which fingerprints at enqueue time).
    In-batch ties resolve to the FIRST discovery (min seq), matching the
    single-threaded reference: first enqueue wins."""
    w_cols = candidates.columns
    in_batch = (
        candidates.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(hash_col).orderBy(
                    *([F.col("seq")] if "seq" in w_cols else [F.col(hash_col)])
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return in_batch.join(seen.select(hash_col), on=hash_col, how="left_anti")


def robots_allow_expr(rules: list[tuple[str, str, bool]]) -> "Column":
    """Zero-shuffle robots check: the (tiny, per-host-prefix) rule table is
    folded into a literal map host → array<struct(prefix, allow)> with
    prefixes pre-sorted longest-first, so longest-prefix-wins resolution is
    a per-row expression (element_at + filter + head) — no join, no window,
    constant-folded where possible. Hosts with no rule default to allow.

    Expects columns ``url_norm`` and ``host`` on the frame it is applied
    to. This is the engine's hot-path robots operator; the DataFrame-join
    variant below exists for rule tables too large to inline (requires
    them broadcastable either way)."""
    by_host: dict[str, list[tuple[str, bool]]] = {}
    for host, prefix, allow in rules:
        by_host.setdefault(host, []).append((prefix, allow))
    entries = []
    for host, rs in by_host.items():
        rs.sort(key=lambda r: -len(r[0]))  # longest prefix first
        arr = F.array(
            *[
                F.struct(F.lit(p).alias("prefix"), F.lit(a).alias("allow"))
                for p, a in rs
            ]
        )
        entries.extend([F.lit(host), arr])
    if not entries:
        return F.lit(True)
    rules_map = F.create_map(*entries)
    path = F.parse_url(F.col("url_norm"), F.lit("PATH"))
    host_rules = F.element_at(rules_map, F.col("host"))
    matched = F.filter(host_rules, lambda r: path.startswith(r["prefix"]))
    first = F.element_at(matched, 1)
    return F.when(host_rules.isNull() | (F.size(matched) == 0), F.lit(True)).otherwise(
        first["allow"]
    )


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop URLs whose (host, longest-matching path_prefix) rule is
    disallow. The rules table is tiny (per-host prefixes) → broadcast.

    Longest-prefix-wins like real robots matchers: join all matching
    prefixes, keep the longest, require allow. Hosts with no rule default
    to allow. (The reference ships with ROBOTSTXT_OBEY commented out —
    settings.py:19-20; the engine enforces rules, and parity fixtures use
    allow-all rules.)"""
    path = F.parse_url(F.col("url_norm"), F.lit("PATH"))
    matched = (
        frontier.withColumn("_path", path)
        .join(
            F.broadcast(robots).withColumnRenamed("host", "_rhost"),
            on=[F.col("host") == F.col("_rhost"),
                F.col("_path").startswith(F.col("path_prefix"))],
            how="left",
        )
    )
    w = Window.partitionBy("url_hash").orderBy(F.length("path_prefix").desc_nulls_last())
    return (
        matched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("allow").isNull() | F.col("allow"))
        .drop("_rn", "_path", "_rhost", "path_prefix", "allow")
    )


def politeness_rank(pending: DataFrame, politeness: DataFrame,
                    default_budget: int = 4) -> DataFrame:
    """Select this wave's fetch batch: per-host window rank by
    (priority desc, discovery wave, seq, url_hash), keep rank ≤ host
    budget. Budget table is broadcast (one row per host).

    default_budget=4 mirrors CONCURRENT_REQUESTS_PER_DOMAIN
    (/root/reference/xizang/settings.py:29). The deterministic tiebreak
    (wave, seq) reproduces the reference skeleton's FIFO-within-priority
    order, making crawl ordering reproducible run-to-run — the property
    the ordering oracle checks."""
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("wave"), F.col("seq"), F.col("url_hash")
    )
    ranked = pending.withColumn("_rank", F.row_number().over(w))
    budgeted = ranked.join(
        F.broadcast(politeness.select("host", "budget_per_wave")), on="host", how="left"
    ).withColumn(
        "budget_per_wave", F.coalesce(F.col("budget_per_wave"), F.lit(default_budget))
    )
    return budgeted.filter(F.col("_rank") <= F.col("budget_per_wave")).drop(
        "_rank", "budget_per_wave"
    )


def salted_repartition(df: DataFrame, n_partitions: int, salt_buckets: int = 64,
                       host_col: str = "host", hash_col: str = "url_hash") -> DataFrame:
    """Spread a skewed host across ``salt_buckets`` partitions: partition
    key = (host, url_hash mod salt). With ≥80% of URLs on one host
    (fixture requirement), an unsalted repartition(host) puts 80% of the
    fetch/parse work in one task; salting bounds any host to
    1/salt_buckets of a partition's share."""
    return df.repartition(
        n_partitions, F.col(host_col), F.pmod(F.col(hash_col), F.lit(salt_buckets))
    )
