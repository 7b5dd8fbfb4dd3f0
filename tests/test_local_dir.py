"""Unit tests for the tmpfs shuffle-scratch selection in session.py.

Pure-Python (no SparkSession): `_scratch_local_dir` only picks a
directory; `get_spark` wiring is exercised by every Spark-backed test in
the suite (the conf is visible in the JVM command line) and by the
spark-submit e2e test.
"""

import os
import time

from tbbid_scrapy_spark import session


def test_env_override_wins(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(tmp_path))
    assert session._scratch_local_dir() == str(tmp_path)


def test_env_override_unusable_falls_back_to_none(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/proc/0/no_such_dir")
    assert session._scratch_local_dir() is None


def test_falls_back_to_none_without_dev_shm(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    monkeypatch.setattr(
        session.os.path, "isdir", lambda p: False if p == "/dev/shm" else os.path.isdir(p)
    )
    assert session._scratch_local_dir() is None


def test_default_creates_per_pid_shm_subdir(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    if not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)):
        import pytest

        pytest.skip("no writable /dev/shm on this box")
    d = session._scratch_local_dir()
    assert d == f"/dev/shm/spark_graft_local/pid{os.getpid()}"
    assert os.path.isdir(d)


def test_sweep_reclaims_dead_pid_dirs_only(tmp_path):
    dead = tmp_path / "pid999999999"  # beyond pid_max — never alive
    live = tmp_path / f"pid{os.getpid()}"
    dead.mkdir()
    live.mkdir()
    (dead / "shuffle_0_0_0.data").write_bytes(b"x")
    # a live pid dir must survive regardless of age
    old = time.time() - 48 * 3600
    os.utime(live, (old, old))
    session._sweep_stale_scratch(str(tmp_path))
    assert not dead.exists()
    assert live.exists()


def test_sweep_ages_out_only_non_pid_entries(tmp_path):
    stale = tmp_path / "blockmgr-legacy"
    fresh = tmp_path / "spark-live"
    stale.mkdir()
    fresh.mkdir()
    old = time.time() - 25 * 3600
    os.utime(stale, (old, old))
    session._sweep_stale_scratch(str(tmp_path), max_age_sec=24 * 3600)
    assert not stale.exists()
    assert fresh.exists()


def test_sweep_survives_missing_dir():
    session._sweep_stale_scratch("/nonexistent/path/xyz")  # no raise
