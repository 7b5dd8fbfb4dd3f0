"""JVM-free pins for the stage-split evidence path (stagemetrics.py):
the scaling projection is built on these numbers, so parsing and
accumulation bugs corrupt the north-rule artifact silently."""

from __future__ import annotations

import os
import time

from tbbid_scrapy_spark import stagemetrics


def test_parse_ts_is_utc_not_local(monkeypatch):
    """Spark REST timestamps are GMT; parsing them as local time shifts
    every stage wall by the UTC offset (and corrupts walls across a DST
    transition). Pin: the epoch of a known GMT instant is
    TZ-independent."""
    # 2026-08-16T18:37:35.123 UTC == epoch 1786905455.123
    want = 1786905455.123
    got = stagemetrics._parse_ts("2026-08-16T18:37:35.123GMT")
    assert abs(got - want) < 1e-6
    # and unchanged under a different local TZ (the bug this pins)
    old = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        assert abs(stagemetrics._parse_ts("2026-08-16T18:37:35.123GMT") - want) < 1e-6
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time.tzset()


def test_stage_split_accumulates_raw_then_rounds_once(monkeypatch):
    """Rounding inside the accumulation loop discarded every stage whose
    term was below the rounding quantum — 100 shuffle stages of 40 KB
    each reported shuffle_read_mb 0.0 while n_shuffle_stages said 100
    (internally inconsistent evidence)."""
    stages = [
        {
            "stageId": i,
            "attemptId": 0,
            "submissionTime": "2026-08-16T18:00:00.000GMT",
            "firstTaskLaunchedTime": "2026-08-16T18:00:00.000GMT",
            "completionTime": "2026-08-16T18:00:00.010GMT",  # 10 ms each
            "executorRunTime": 1,  # 1 ms
            "shuffleReadBytes": 40_000,  # 0.04 MB — below the 0.05 quantum
            "shuffleWriteBytes": 40_000,
        }
        for i in range(100)
    ]
    monkeypatch.setattr(stagemetrics, "fetch_stages", lambda spark: stages)
    out = stagemetrics.stage_split(None)
    assert out["n_shuffle_stages"] == 100
    assert out["shuffle_read_mb"] == 4.0  # 100 × 0.04, not 0.0
    assert out["shuffle_write_mb"] == 4.0
    assert out["shuffle_wall_sec"] == 1.0  # 100 × 10 ms survives rounding
    assert out["map_wall_fraction"] == 0.0


def test_stage_split_excludes_and_classes(monkeypatch):
    stages = [
        {"stageId": 1, "attemptId": 0,
         "submissionTime": "2026-08-16T18:00:00.000GMT",
         "firstTaskLaunchedTime": "2026-08-16T18:00:00.000GMT",
         "completionTime": "2026-08-16T18:00:02.000GMT",
         "executorRunTime": 4000, "shuffleReadBytes": 0,
         "shuffleWriteBytes": 1_000_000},
        {"stageId": 2, "attemptId": 0,
         "submissionTime": "2026-08-16T18:00:02.000GMT",
         "firstTaskLaunchedTime": "2026-08-16T18:00:02.000GMT",
         "completionTime": "2026-08-16T18:00:03.000GMT",
         "executorRunTime": 2000, "shuffleReadBytes": 1_000_000,
         "shuffleWriteBytes": 0},
        {"stageId": 0, "attemptId": 0,  # excluded warmup
         "submissionTime": "2026-08-16T17:59:00.000GMT",
         "firstTaskLaunchedTime": "2026-08-16T17:59:00.000GMT",
         "completionTime": "2026-08-16T17:59:59.000GMT",
         "executorRunTime": 999_000, "shuffleReadBytes": 5,
         "shuffleWriteBytes": 5},
    ]
    monkeypatch.setattr(stagemetrics, "fetch_stages", lambda spark: stages)
    out = stagemetrics.stage_split(None, exclude={(0, 0)})
    assert out["n_map_stages"] == 1 and out["n_shuffle_stages"] == 1
    assert out["map_wall_sec"] == 2.0 and out["shuffle_wall_sec"] == 1.0
    assert out["map_task_sec"] == 4.0 and out["shuffle_task_sec"] == 2.0
    assert out["shuffle_read_mb"] == 1.0 and out["shuffle_write_mb"] == 1.0
    assert out["map_wall_fraction"] == round(2.0 / 3.0, 3)
