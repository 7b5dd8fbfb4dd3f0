"""Checkpoint/resume: kill after wave k, resume, final state equals the
uninterrupted run (SURVEY.md §5d; north-star C7)."""

from __future__ import annotations

from tbbid_scrapy_spark.fixtures import sitegen
from tbbid_scrapy_spark.plans.crawl import CrawlConfig, CrawlEngine


def _order(state):
    return [
        (r.wave, r.url_norm)
        for r in state.fetch_log.orderBy("wave", "fetch_pos").collect()
    ]


def test_resume_equals_uninterrupted(spark, site_df, politeness_df, robots_df, tmp_path):
    seeds = sitegen.default_seeds()

    full = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df, CrawlConfig(max_waves=50)
    ).run()

    ck = str(tmp_path / "ck")
    partial_engine = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=4, checkpoint_dir=ck),
    )
    partial = partial_engine.run()
    assert partial.wave == 4  # "killed" mid-crawl

    resumed_engine = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=50, checkpoint_dir=ck),
    )
    resumed = resumed_engine.run(resume=True)

    assert _order(resumed) == _order(full)
    assert (
        {r.url_norm for r in resumed.seen.collect()}
        == {r.url_norm for r in full.seen.collect()}
    )
    f_full = {(r.url_norm, r.state, r.attempts) for r in full.frontier.collect()}
    f_res = {(r.url_norm, r.state, r.attempts) for r in resumed.frontier.collect()}
    assert f_res == f_full


def test_snapshot_table_atomicity(spark, tmp_path):
    from tbbid_scrapy_spark.sources.sink import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df1 = spark.range(5)
    v1 = t.commit(df1)
    assert t.read().count() == 5
    v2 = t.commit(spark.range(10))
    assert v2 == v1 + 1 and t.read().count() == 10
    t.rollback_to(v1)
    assert t.read().count() == 5
