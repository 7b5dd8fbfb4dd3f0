"""spark-submit --py-files launch path (north_rule: "the whole job
launches via spark-submit --py-files on multi-executor clusters").

Packages tbbid_scrapy_spark into a zip EXACTLY as a cluster deploy
would, then launches a small end-to-end crawl through the REAL
spark-submit binary in a clean working directory (the package is only
importable from the shipped zip — not from the repo checkout), and
checks the JSON summary against the simulator-parity numbers the
in-process suite pins. This is the executable evidence that the engine
has no hidden dependence on repo-relative imports or driver-local state.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import json, sys
from pyspark.sql import SparkSession, types as T

# the package must come from the --py-files zip: no repo on sys.path
assert not any(p.rstrip('/').endswith('repo') for p in sys.path), sys.path

from tbbid_scrapy_spark import schemas
from tbbid_scrapy_spark.fixtures import sitegen
from tbbid_scrapy_spark.operators.bloom import BloomSpec
from tbbid_scrapy_spark.plans.crawl import CrawlConfig, CrawlEngine

spark = SparkSession.builder.getOrCreate()
site = sitegen.build_site(n_listing_pages=2, projects_per_listing=5, seed=42)
schema = T.StructType(list(schemas.DOCUMENTS.fields)
                      + [T.StructField("fail_first", T.IntegerType(), False)])
site_df = spark.createDataFrame(sitegen.site_to_rows(site), schema)
pol = spark.createDataFrame(sitegen.default_politeness(), schemas.POLITENESS)
rob = spark.createDataFrame(sitegen.default_robots(), schemas.ROBOTS)
spec = BloomSpec.for_capacity(100_000, 0.01, 8)
eng = CrawlEngine(spark, site_df, sitegen.default_seeds(), pol, rob,
                  CrawlConfig(max_waves=30, seen_mode="hybrid", bloom_spec=spec))
st = eng.run()
print("SUBMIT_RESULT:" + json.dumps({
    "waves": int(st.wave),
    "fetched": int(st.fetch_log.count()),
    "seen": int(st.seen.count()),
    "pages": len(site),
}))
spark.stop()
"""


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


def test_spark_submit_py_files_zip(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not available")

    # package the library exactly as a deploy would
    pkg_root = os.path.join(REPO, "tbbid_scrapy_spark")
    zip_path = tmp_path / "tbbid_scrapy_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                # .json: package data files (fixtures/cities.json) ride
                # the deploy zip and are read via importlib.resources —
                # a plain open() would fail inside a zipimport
                if not fn.endswith((".py", ".json")):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, os.path.dirname(pkg_root))
                zf.write(full, rel)

    job = tmp_path / "job.py"
    job.write_text(JOB)

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # nothing repo-local may leak in
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(job),
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must resolve via the zip
        capture_output=True, text=True, timeout=540, env=env,
    )
    out = [ln for ln in proc.stdout.splitlines() if ln.startswith("SUBMIT_RESULT:")]
    assert proc.returncode == 0 and out, (
        f"rc={proc.returncode}\nstdout tail: {proc.stdout[-1500:]}\n"
        f"stderr tail: {proc.stderr[-3000:]}"
    )
    res = json.loads(out[0][len("SUBMIT_RESULT:"):])
    # 2 listings × 5 projects crawl: every page reachable under default
    # politeness gets fetched exactly once; seen == fetched (hybrid mode
    # has zero false drops) — same invariants the in-process parity
    # suite pins against the simulator
    assert res["fetched"] == res["seen"] > 0
    assert res["fetched"] <= res["pages"]
    assert res["waves"] >= 3
