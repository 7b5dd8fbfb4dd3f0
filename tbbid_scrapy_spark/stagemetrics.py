"""Per-stage map/shuffle time decomposition via the Spark UI REST API.

The scaling-efficiency criterion in BASELINE.json is defined for an
N -> 4N *executor* cluster. In this single-box sandbox the shuffle
subsystem (one JVM's disk + memory bus) is shared between the two
"cluster sizes", so a raw wall-clock ratio under-reports how the same
job scales when every added executor brings its own disks and NIC.
The honest way to bridge that gap is measurement, not prose: split the
job's time into map-side stages (no shuffle read — scan, canonicalize,
hash, partial agg) and shuffle-read stages (reduce side), report the
scaling of EACH class, and let the map-class scaling — which a real
cluster achieves for both classes — be the evidenced projection.

Requires the session to be built with spark.ui.enabled=true (the
bench_scaling worker does; the default engine session keeps it off).
"""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime, timezone


def _parse_ts(ts: str) -> float:
    """Spark REST timestamps look like '2026-08-16T18:37:35.123GMT' —
    i.e. UTC. Parse them AS UTC: a naive .timestamp() would interpret
    the wall time in the machine's local zone, shifting every stage wall
    by the UTC offset and (across a DST transition) corrupting the
    map/shuffle split the scaling projection is built on."""
    ts = ts.replace("GMT", "")
    return (
        datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%f")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def fetch_stages(spark) -> list[dict]:
    """All completed stages of this app, via the local UI REST endpoint."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def completed_stage_ids(spark) -> set[tuple[int, int]]:
    return {(s["stageId"], s["attemptId"]) for s in fetch_stages(spark)}


def stage_split(spark, exclude: set[tuple[int, int]] | None = None) -> dict:
    """Decompose completed stages into map vs shuffle-read classes.

    ``exclude``: stage (id, attempt) pairs to skip (e.g. warmup work —
    snapshot with :func:`completed_stage_ids` before the measured run).

    Returns wall seconds (first task launched -> stage complete, summed
    per class; the bench runs actions serially so stages barely overlap)
    and executor task-time seconds per class, plus shuffle volume.
    """
    exclude = exclude or set()
    # accumulate RAW floats and round ONCE at the end: rounding inside
    # the loop (round(acc + term, k)) silently discards every stage
    # whose term is below the rounding quantum — 100 reduce stages of
    # 40 KB each would report shuffle_read_mb 0.0 while
    # n_shuffle_stages says 100 (internally inconsistent evidence)
    acc = {
        "map_wall_sec": 0.0,
        "shuffle_wall_sec": 0.0,
        "map_task_sec": 0.0,
        "shuffle_task_sec": 0.0,
        "shuffle_read_mb": 0.0,
        "shuffle_write_mb": 0.0,
    }
    out = {"n_map_stages": 0, "n_shuffle_stages": 0}
    for s in fetch_stages(spark):
        if (s["stageId"], s["attemptId"]) in exclude:
            continue
        try:
            wall = _parse_ts(s["completionTime"]) - _parse_ts(
                s.get("firstTaskLaunchedTime") or s["submissionTime"]
            )
        except (KeyError, ValueError):
            wall = 0.0
        task_sec = s.get("executorRunTime", 0) / 1000.0
        is_shuffle = s.get("shuffleReadBytes", 0) > 0
        cls = "shuffle" if is_shuffle else "map"
        acc[f"{cls}_wall_sec"] += wall
        acc[f"{cls}_task_sec"] += task_sec
        out[f"n_{cls}_stages"] += 1
        acc["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
        acc["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
    for k, v in acc.items():
        out[k] = round(v, 1 if k.endswith("_mb") else 3)
    total = acc["map_wall_sec"] + acc["shuffle_wall_sec"]
    out["map_wall_fraction"] = (
        round(acc["map_wall_sec"] / total, 3) if total else None
    )
    return out
