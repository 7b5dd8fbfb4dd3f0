"""Bench output-contract pins (no Spark session needed).

Round 2's driver artifact recorded ZERO bench numbers because bench.py
emitted a multi-KB enriched JSON line LAST and the driver keeps only a
~2 KB stdout tail — the line was truncated mid-JSON. The contract is
now: the final stdout line is compact (< 1.9 KB), parseable, and carries
every number the north_rule criterion needs; full detail goes to
BENCH_FULL.json. These tests pin that contract against realistic and
adversarially bloated scaling sections.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _result(scaling):
    return {
        "metric": "headline_queries_total",
        "value": 23.4,
        "unit": "sec",
        "queries": {f"q{i:02d}": 1.234 for i in range(16)},
        "sf": 0.1,
        "headline_loadavg": [21.7, 18.3, 22.4],
        "warmup": {"sec": 16.2, "failed": []},
        "frontier": {"pages": 44034, "urls_fetched": 31453, "urls_seen": 31453,
                     "waves": 6, "sec": 43.4, "urls_per_sec": 724.8},
        "wave": {"urls_in": 2000000, "urls_distinct": 1500000,
                 "bloom_inserted": 1500000, "sec": 76.0, "urls_per_sec": 26332.2},
        "shingle_df_cap": {"max_shingle_df": 1000, "n_shingles": 433809,
                           "shingles_dropped": 0, "rows_dropped": 0},
        "scaling": scaling,
        "cpus": 32,
    }


def _full_scaling():
    """A realistic full scaling dict, including the bulky per-run
    sections that must NOT reach the final line."""
    split = {"map_wall_sec": 72.5, "shuffle_wall_sec": 16.1,
             "map_task_sec": 143.6, "shuffle_task_sec": 31.0,
             "shuffle_read_mb": 192.3, "shuffle_write_mb": 192.3,
             "n_map_stages": 11, "n_shuffle_stages": 10,
             "map_wall_fraction": 0.819}
    return {
        "mode": "wave",
        "levels": {"2": {"urls_in": 4000000, "sec": 170.0, "wall_sec": 170.0,
                         "work_units": 4000000, "stage_split": split},
                   "8": {"urls_in": 4000000, "sec": 48.0, "wall_sec": 48.0,
                         "work_units": 4000000, "stage_split": split}},
        "all_wall_secs": {"2": [170.0, 181.2, 240.9], "8": [48.0, 52.1, 95.2]},
        "throughput": {"2": 23529.4, "8": 83333.3},
        "speedup": 3.542,
        "scaling_efficiency": 0.869,
        "estimator": "median of per-pair (back-to-back lo/hi) "
                     "efficiencies — pre-declared, the only gate",
        "pair_efficiencies": [0.885, 0.869, 0.633, 0.841, 0.902],
        "context_estimators": {"pair_efficiency_best": 0.902,
                               "efficiency_best_runs": 0.885,
                               "efficiency_median_walls": 0.861},
        "wall_spread": {"2": [170.0, 240.9], "8": [48.0, 95.2]},
        "repeats": 5,
        "criterion": "north_rule: throughput scaling efficiency >= 0.8 "
                     "from N to 4N (executor proxy: local cores); "
                     "gate = MEDIAN per-pair efficiency",
        "meets_target": True,
        "meets_target_measured": True,
        "meets_target_projected": True,
        "note": "local[2] vs local[8] on one box, 5 interleaved "
                "runs per level; N→4N-executor proxy per BASELINE.md",
        "decomposition": {
            "map_wall_sec": {"2": 72.5, "8": 24.0},
            "shuffle_wall_sec": {"2": 16.1, "8": 3.3},
            "map_wall_fraction": {"2": 0.819, "8": 0.879},
            "shuffle_read_mb": 188.3,
            "map_speedup": 3.025, "shuffle_speedup": 4.876,
            "map_task_cpu_inflation": 1.286, "inflation_credited": 1.286,
            "projected_efficiency_4n": 0.97,
            "projection_argument": "x" * 300,
        },
    }


def test_final_line_fits_tail_and_parses():
    line = bench.compact_result_line(_result(_full_scaling()))
    assert len(line) <= 1900, len(line)
    d = json.loads(line)
    # every criterion number survives compaction
    s = d["scaling"]
    assert s["scaling_efficiency"] == 0.869  # the gated median pair eff
    assert "median" in s["estimator"]
    assert s["meets_target"] is True and s["meets_target_measured"] is True
    assert s["decomposition"]["projected_efficiency_4n"] == 0.97
    assert s["context_estimators"]["pair_efficiency_best"] == 0.902
    assert len(s["pair_efficiencies"]) == 5
    assert s["repeats"] == 5 and s["throughput"]["8"] == 83333.3
    # the bulky per-run sections never reach the tail
    assert "levels" not in s and "all_wall_secs" not in s
    # headline numbers intact
    assert d["value"] == 23.4 and len(d["queries"]) == 16
    assert d["headline_loadavg"] == [21.7, 18.3, 22.4]
    assert d["shingle_df_cap"]["shingles_dropped"] == 0
    # clean warmup compacts to its wall; a failed one keeps the dict so
    # the knee contamination stays visible in the tail line
    assert d["warmup"] == 16.2
    bad = _result(_full_scaling())
    bad["warmup"] = {"sec": 16.2, "failed": ["ngram_jaccard"]}
    d2 = json.loads(bench.compact_result_line(bad))
    assert d2["warmup"] == {"sec": 16.2, "failed": ["ngram_jaccard"]}
    skipped = _result(_full_scaling())
    skipped["warmup"] = None
    assert json.loads(bench.compact_result_line(skipped))["warmup"] is None


def test_final_line_with_no_scaling():
    line = bench.compact_result_line(_result(None))
    d = json.loads(line)
    assert d["scaling"] is None and len(line) < 1900


def test_final_line_with_scaling_error():
    line = bench.compact_result_line(_result({"error": "boom " * 80}))
    d = json.loads(line)
    assert "error" in d["scaling"] and len(line) < 1900


def test_adversarially_bloated_sections_still_fit():
    s = _full_scaling()
    s["note"] = "n" * 1200  # a future edit bloats a kept field
    line = bench.compact_result_line(_result(s))
    assert len(line) <= 1900
    d = json.loads(line)  # still parseable
    assert d["scaling"]["scaling_efficiency"] == 0.869


def test_scaling_gate_is_median_pair_efficiency_only(monkeypatch):
    """ADVICE r3: the r3 gate passed if ANY of four estimators cleared
    0.8 (multiple-comparisons OR). The gate must now be the pre-declared
    MEDIAN per-pair efficiency and nothing else — walls where the best
    pair and best-of-runs clear 0.8 but the median does not must FAIL."""
    import bench_scaling

    # five (lo, hi) wall pairs → pair effs [0.9, 0.7, 0.75, 0.78, 0.85]:
    # best pair 0.9 and best-of-runs (100/27.78)/4=0.9 clear 0.8, the
    # median (0.78) does not.
    walls_lo = [100.0, 100.0, 100.0, 100.0, 100.0]
    walls_hi = [100 / (4 * e) for e in (0.9, 0.7, 0.75, 0.78, 0.85)]
    calls = {"i": 0}

    def fake_run_level(repo, cpus, mode):
        i = calls["i"] // 2
        is_hi = calls["i"] % 2 == 1
        calls["i"] += 1
        return {"wall_sec": walls_hi[i] if is_hi else walls_lo[i],
                "work_units": 1000}

    monkeypatch.setattr(bench_scaling, "run_level", fake_run_level)
    out = bench_scaling.measure(2, 8, "wave", repeats=5)
    assert out["pair_efficiencies"] == [0.9, 0.7, 0.75, 0.78, 0.85]
    assert out["scaling_efficiency"] == 0.78
    assert out["meets_target_measured"] is False
    assert out["meets_target"] is False
    assert out["context_estimators"]["pair_efficiency_best"] == 0.9

    # and a run whose MEDIAN clears 0.8 passes
    calls["i"] = 0
    walls_hi[:] = [100 / (4 * e) for e in (0.82, 0.7, 0.81, 0.84, 0.85)]
    out = bench_scaling.measure(2, 8, "wave", repeats=5)
    assert out["scaling_efficiency"] == 0.82
    assert out["meets_target"] is True


def test_partial_scaling_record_survives_compaction():
    """Mid-measurement partial records (emitted after each completed
    pair) must stay parseable, compact, and clearly marked partial."""
    partial = {
        "partial": True,
        "pairs_done": 2,
        "repeats": 5,
        "pair_efficiencies": [0.84, 0.81],
        "scaling_efficiency": 0.825,
        "estimator": "median of per-pair efficiencies "
                     "(PARTIAL — measurement still running)",
        "loadavgs": [3.2, 4.1],
        "meets_target_measured": True,
        "meets_target": True,
    }
    line = bench.compact_result_line(_result(partial))
    assert len(line) <= 1900
    d = json.loads(line)
    s = d["scaling"]
    assert s["partial"] is True and s["pairs_done"] == 2
    assert s["scaling_efficiency"] == 0.825
    assert "PARTIAL" in s["estimator"]


def test_measure_emits_partial_records(monkeypatch):
    """measure(on_pair=...) fires after every completed pair with the
    running median."""
    import bench_scaling

    calls = {"i": 0}
    walls = {2: 100.0, 8: 31.25}  # pair efficiency 0.8

    def fake_run_level(repo, cpus, mode):
        calls["i"] += 1
        return {"wall_sec": walls[cpus], "work_units": 1000}

    monkeypatch.setattr(bench_scaling, "run_level", fake_run_level)
    partials = []
    out = bench_scaling.measure(2, 8, "wave", repeats=3, on_pair=partials.append)
    assert len(partials) == 3
    assert partials[0]["pairs_done"] == 1 and partials[0]["partial"] is True
    assert partials[-1]["scaling_efficiency"] == out["scaling_efficiency"] == 0.8


def test_pair_efficiencies_capped_before_median(monkeypatch):
    """Pairs above 1.0 (a neighbor spike inflating the LO run of a
    pair) are capped before the median — the never-claim-superlinear
    stance; capping can only lower the headline."""
    import bench_scaling

    effs = (1.2, 1.1, 0.85, 0.7, 0.75)  # raw median 0.85; also capped 0.85
    walls_hi = [100 / (4 * e) for e in effs]
    calls = {"i": 0}

    def fake_run_level(repo, cpus, mode):
        i = calls["i"] // 2
        is_hi = calls["i"] % 2 == 1
        calls["i"] += 1
        return {"wall_sec": walls_hi[i] if is_hi else 100.0,
                "work_units": 1000}

    monkeypatch.setattr(bench_scaling, "run_level", fake_run_level)
    out = bench_scaling.measure(2, 8, "wave", repeats=5)
    assert out["pair_efficiencies"] == [1.2, 1.1, 0.85, 0.7, 0.75]  # raw kept
    assert out["scaling_efficiency"] == 0.85
    # and a case where the CAP is decisive: raw median 1.1 -> capped 1.0
    calls["i"] = 0
    walls_hi[:] = [100 / (4 * e) for e in (1.2, 1.1, 1.15, 0.7, 0.75)]
    out = bench_scaling.measure(2, 8, "wave", repeats=5)
    assert out["scaling_efficiency"] == 1.0
    assert out["meets_target"] is True


def test_measure_rejects_reversed_or_equal_levels():
    """lo >= hi produces a meaningless (trivially-passing) efficiency —
    the measurement must refuse, not emit vacuous gated evidence."""
    import pytest

    import bench_scaling

    with pytest.raises(ValueError):
        bench_scaling.measure(8, 8, "wave", repeats=1)
    with pytest.raises(ValueError):
        bench_scaling.measure(32, 8, "wave", repeats=1)


def test_decomposition_uses_median_pair_not_best_runs(monkeypatch):
    """The map/shuffle decomposition (and the projection built on it)
    must come from the MEDIAN pair's two runs — the epoch-consistent
    unit the gate medians over — not from the best-of-N lo run paired
    with the best-of-N hi run (a cross-epoch combination that can
    inflate map_speedup)."""
    import bench_scaling

    # pair effs [0.9, 0.8, 0.7] → median pair is index 1. Best runs are
    # pair 0's (fastest walls) with a DIFFERENT stage split.
    effs = (0.9, 0.8, 0.7)
    walls_lo = [100.0, 110.0, 120.0]
    walls_hi = [walls_lo[i] / (4 * e) for i, e in enumerate(effs)]

    def split(map_wall):
        return {"map_wall_sec": map_wall, "shuffle_wall_sec": 10.0,
                "map_wall_fraction": 0.8, "shuffle_read_mb": 100.0,
                "map_task_sec": map_wall * 2}

    calls = {"i": 0}

    def fake_run_level(repo, cpus, mode):
        i = calls["i"] // 2
        is_hi = calls["i"] % 2 == 1
        calls["i"] += 1
        w = walls_hi[i] if is_hi else walls_lo[i]
        # distinguishable splits: pair i's map wall encodes (i, level)
        return {"wall_sec": w, "work_units": 1000,
                "stage_split": split(1000.0 * (i + 1) + (1 if is_hi else 0))}

    monkeypatch.setattr(bench_scaling, "run_level", fake_run_level)
    out = bench_scaling.measure(2, 8, "wave", repeats=3)
    d = out["decomposition"]
    assert d["pair_index"] == 1 and d["pair_efficiency"] == 0.8
    # split values are pair 1's, not pair 0's
    assert d["map_wall_sec"]["2"] == 2000.0
    assert d["map_wall_sec"]["8"] == 2001.0
    assert d["map_speedup"] == round(2000.0 / 2001.0, 3)


def test_is_default_run_value_compares_every_knob():
    ok = {"scaling_efficiency": 0.9}
    base = {"SPARK_GRAFT_SCALING_WAVE_URLS": "8000000"}  # main() setdefaults this
    assert bench.is_default_run(ok, env=base) is True
    # explicit-but-default exports (the round driver does this) still count
    assert bench.is_default_run(ok, env={
        **base, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
        "SPARK_GRAFT_CPUS": "32",
    }) is True
    # ANY overridden knob routes to BENCH_LOCAL.json
    for k, v in [
        ("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        ("SPARK_GRAFT_CPUS", "8"),
        ("SPARK_GRAFT_WAVE_URLS", "100000"),
        ("SPARK_GRAFT_SCALING_CPUS", "2,4"),
        ("SPARK_GRAFT_SCALING_REPEATS", "1"),
        ("SPARK_GRAFT_SCALING_WAVE_URLS", "100000"),
        ("SPARK_GRAFT_LOCAL_DIR", "/tmp/x"),
        ("SPARK_GRAFT_FRONTIER_LISTINGS", "1"),
        ("SPARK_GRAFT_FRONTIER_PROJECTS", "100"),
        ("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.01"),
        ("SPARK_GRAFT_DRIVER_MEM", "4g"),
    ]:
        assert bench.is_default_run(ok, env={**base, k: v}) is False, k
    # failed or skipped scaling never records
    assert bench.is_default_run(None, env=base) is False
    assert bench.is_default_run({"error": "boom"}, env=base) is False
    # a skipped/partly-failed codegen warmup never records either — its
    # timings carry the JIT knee the recorded-artifact contract excludes
    assert bench.is_default_run(ok, env=base, warmup_ok=False) is False
    # explicit force wins regardless
    assert bench.is_default_run(None, env={"SPARK_GRAFT_RECORD": "1"}) is True
    assert bench.is_default_run(
        None, env={"SPARK_GRAFT_RECORD": "1"}, warmup_ok=False
    ) is True
