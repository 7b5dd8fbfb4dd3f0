"""Cuckoo-filter seen-set (VERDICT r1 missing #3): bloom-interface parity
(FP-only, no FN), DELETION (the capability bloom lacks), sizing at 10^10
without allocation, and crawl parity as seen_mode='cuckoo'."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tbbid_scrapy_spark.fixtures import sitegen
from tbbid_scrapy_spark.operators.cuckoo import (
    SLOTS,
    CuckooSpec,
    cuckoo_delete,
    cuckoo_insert,
    cuckoo_test,
    empty_cuckoo_shards,
)
from tbbid_scrapy_spark.plans.crawl import CrawlConfig, CrawlEngine

SPEC = CuckooSpec.for_capacity(expected_n=20_000, n_shards=8)


def _hashes(spark, lo, hi):
    return spark.range(lo, hi).select(F.xxhash64("id").alias("url_hash"))


def test_no_false_negatives_and_bounded_fp(spark):
    inserted = _hashes(spark, 0, 10_000)
    shards = cuckoo_insert(inserted, empty_cuckoo_shards(spark, SPEC), SPEC)
    # every inserted key must test positive
    hits = cuckoo_test(inserted, shards, SPEC).filter("maybe_seen").count()
    assert hits == 10_000
    # fresh keys: FP rate within ~4x of the 2*SLOTS/2^16 bound
    fresh = _hashes(spark, 1_000_000, 1_020_000)
    fp = cuckoo_test(fresh, shards, SPEC).filter("maybe_seen").count() / 20_000
    assert fp <= 4 * SPEC.fp_rate, fp


def test_delete_reopens_membership(spark):
    keys = _hashes(spark, 0, 5_000)
    shards = cuckoo_insert(keys, empty_cuckoo_shards(spark, SPEC), SPEC)
    victims = _hashes(spark, 0, 500)
    after = cuckoo_delete(victims, shards, SPEC)
    # deleted keys test negative again (modulo FP on OTHER keys' prints)
    still = cuckoo_test(victims, after, SPEC).filter("maybe_seen").count()
    assert still <= 4 * SPEC.fp_rate * 500 + 1
    # untouched keys keep testing positive — deletion is surgical
    kept = _hashes(spark, 500, 5_000)
    assert cuckoo_test(kept, after, SPEC).filter("maybe_seen").count() == 4_500
    # re-admission: inserting the victims again flips them back
    readded = cuckoo_insert(victims, after, SPEC)
    assert cuckoo_test(victims, readded, SPEC).filter("maybe_seen").count() == 500


def test_sizing_at_1e10_without_allocation():
    spec = CuckooSpec.for_capacity(expected_n=10_000_000_000, n_shards=4096)
    per_shard = spec.buckets_per_shard * SLOTS
    assert per_shard * 4096 >= 10_000_000_000  # capacity holds
    assert spec.buckets_per_shard & (spec.buckets_per_shard - 1) == 0
    # ~2 bytes/entry ⇒ tens of GB total, ~5-8 MB per shard-task
    assert spec.total_bytes < 60 * 2**30
    assert spec.fp_rate < 0.001


def test_crawl_parity_with_cuckoo_seen_mode(spark, site, site_df, politeness_df,
                                            robots_df):
    from tbbid_scrapy_spark.fixtures.simulator import simulate_crawl

    st = CrawlEngine(
        spark, site_df, sitegen.default_seeds(), politeness_df, robots_df,
        CrawlConfig(max_waves=50, seen_mode="cuckoo",
                    cuckoo_spec=CuckooSpec.for_capacity(10_000, n_shards=8)),
    ).run()
    sim = simulate_crawl(
        site,
        sitegen.default_seeds(),
        [(r.host, r.budget_per_wave, r.delay_s) for r in politeness_df.collect()],
        robots=sitegen.default_robots(),
        max_waves=50,
    )
    eng_order = [
        (r.wave, r.url_norm)
        for r in st.fetch_log.orderBy("wave", "fetch_pos").collect()
    ]
    assert eng_order == sim.fetch_log
    assert {r.url_norm for r in st.seen.collect()} == sim.seen
