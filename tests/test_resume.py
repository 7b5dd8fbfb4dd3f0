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


def test_fresh_run_refuses_committed_checkpoint_dir(spark, site_df, politeness_df,
                                                    robots_df, tmp_path):
    """run(resume=False) into a dir holding a committed manifest must
    refuse: delta part names are deterministic per wave, so starting over
    would overwrite parquet the live manifest still references (a crash
    mid-first-commit would then corrupt the only resume point)."""
    import pytest

    seeds = sitegen.default_seeds()
    ck = str(tmp_path / "ck")
    CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=2, checkpoint_dir=ck),
    ).run()
    again = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=2, checkpoint_dir=ck),
    )
    with pytest.raises(ValueError, match="resume=True"):
        again.run()
    # resume=True remains the supported way in
    st = again.run(resume=True)
    assert st.wave >= 2


def test_snapshot_commit_respects_manifest_versions(spark, tmp_path):
    """SnapshotTable.commit and write_version share one v-directory
    namespace: commit() must allocate past directory versions written in
    manifest mode (pointer never flipped), not overwrite them."""
    from tbbid_scrapy_spark.sources.sink import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df1 = spark.range(3)
    v1 = t.write_version(df1)          # manifest mode — no pointer
    v2 = t.write_version(spark.range(5))
    assert (v1, v2) == (1, 2)
    v3 = t.commit(spark.range(7))      # legacy pointer mode
    assert v3 == 3                     # NOT 1 — v1/v2 stay intact
    assert t.read_version(v1).count() == 3
    assert t.read_version(v2).count() == 5
    assert t.read().count() == 7


def test_durable_replace_atomic_and_clean(tmp_path):
    from tbbid_scrapy_spark.sources.sink import _durable_replace

    target = str(tmp_path / "_PTR")
    _durable_replace(str(tmp_path), target, "41")
    _durable_replace(str(tmp_path), target, "42")
    with open(target) as f:
        assert f.read() == "42"
    # no temp litter left behind
    leftovers = [n for n in __import__("os").listdir(tmp_path) if "tmp" in n]
    assert leftovers == []
