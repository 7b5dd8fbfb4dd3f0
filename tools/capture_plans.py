"""Capture .explain("formatted") for headline queries to plans/r06/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each query (default: all
headline queries). Plans are captured BEFORE execution (initial AQE
plan), which is the shape the optimizer chose — Exchange count, join
strategy, PushedFilters/ReadSchema, Python-eval nodes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "pricing_summary", "broadcast_dim_join", "parent_child_join",
    "window_topk", "explode_split", "dedup_exact", "ngram_jaccard",
    "minhash_lsh", "simhash", "text_stats", "lang_id", "cosine_topk",
    "lsh_topk", "embedding_near_dup", "corpus_filter", "merge_upsert",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from tbbid_scrapy_spark.operators import scratch
    from tbbid_scrapy_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    queries = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        n_py = sum(buf.getvalue().count(t) for t in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas"))
        print(f"{name}: {len(buf.getvalue())} bytes, Exchange x{n_ex}, PythonEval x{n_py} -> {path}")
        scratch.release()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
