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


def test_resume_rebuilds_shards_on_seen_format_mismatch(
    spark, site_df, politeness_df, robots_df, tmp_path
):
    """A checkpoint whose manifest carries a DIFFERENT seen-structure
    format tag (probe-math version bump, spec change, or a pre-stamp
    manifest with no tag at all) must NOT reuse the persisted bitsets —
    they'd return silent false negatives (seen URLs refetched). The
    engine rebuilds shards from the exact seen table; the resumed run
    must still equal the uninterrupted one bit for bit."""
    import json
    import os

    from tbbid_scrapy_spark.operators.bloom import BloomSpec

    seeds = sitegen.default_seeds()
    spec = BloomSpec.for_capacity(expected_n=10_000, fp_rate=1e-6, n_shards=8)

    full = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=50, seen_mode="bloom", bloom_spec=spec),
    ).run()

    ck = str(tmp_path / "ck")
    CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=3, checkpoint_dir=ck, seen_mode="bloom",
                    bloom_spec=spec),
    ).run()

    # simulate a checkpoint written by pre-stamp code: drop the tag
    mpath = os.path.join(ck, "_MANIFEST")
    with open(mpath) as f:
        manifest = json.load(f)
    assert manifest["seen_format"] == spec.format_tag()  # stamped at commit
    del manifest["seen_format"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    resumed = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=50, checkpoint_dir=ck, seen_mode="bloom",
                    bloom_spec=spec),
    ).run(resume=True)

    assert _order(resumed) == _order(full)
    assert (
        {r.url_norm for r in resumed.seen.collect()}
        == {r.url_norm for r in full.seen.collect()}
    )


def test_resume_rebuilds_cuckoo_shards_on_format_mismatch(
    spark, site_df, politeness_df, robots_df, tmp_path
):
    """Cuckoo-mode twin of the bloom rebuild test: a pre-stamp manifest
    forces _rebuild_shards down the cuckoo_insert branch (re-inserting
    every committed url_hash into fresh tables under the current
    FP_FORMAT); the resumed run must equal the uninterrupted one."""
    import json
    import os

    from tbbid_scrapy_spark.operators.cuckoo import CuckooSpec

    seeds = sitegen.default_seeds()
    spec = CuckooSpec.for_capacity(10_000, n_shards=8)

    full = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=50, seen_mode="cuckoo", cuckoo_spec=spec),
    ).run()

    ck = str(tmp_path / "ck")
    CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=3, checkpoint_dir=ck, seen_mode="cuckoo",
                    cuckoo_spec=spec),
    ).run()

    mpath = os.path.join(ck, "_MANIFEST")
    with open(mpath) as f:
        manifest = json.load(f)
    assert manifest["seen_format"] == spec.format_tag()
    assert ":fp48-63-xormix-v1:" in manifest["seen_format"]  # cuckoo's OWN version
    del manifest["seen_format"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    resumed = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=50, checkpoint_dir=ck, seen_mode="cuckoo",
                    cuckoo_spec=spec),
    ).run(resume=True)

    assert _order(resumed) == _order(full)
    assert (
        {r.url_norm for r in resumed.seen.collect()}
        == {r.url_norm for r in full.seen.collect()}
    )


def test_resume_reuses_shards_on_matching_format(
    spark, site_df, politeness_df, robots_df, tmp_path
):
    """Same-format resume takes the fast path: shards read back from the
    snapshot version, not rebuilt (rebuild is O(|seen|) — fine once,
    wrong as a tax on every clean resume)."""
    from tbbid_scrapy_spark.operators.bloom import BloomSpec

    seeds = sitegen.default_seeds()
    spec = BloomSpec.for_capacity(expected_n=10_000, fp_rate=1e-6, n_shards=8)
    ck = str(tmp_path / "ck")
    CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=3, checkpoint_dir=ck, seen_mode="bloom",
                    bloom_spec=spec),
    ).run()
    eng = CrawlEngine(
        spark, site_df, seeds, politeness_df, robots_df,
        CrawlConfig(max_waves=3, checkpoint_dir=ck, seen_mode="bloom",
                    bloom_spec=spec),
    )
    calls = []
    orig = eng._rebuild_shards
    eng._rebuild_shards = lambda seen: calls.append(1) or orig(seen)
    st = eng.resume()
    assert calls == []  # matching tag → no rebuild
    assert st.shards is not None and st.shards.count() == spec.n_shards


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
