"""Banded hyperplane-LSH near-dup + two-phase top-k pins.

The r2 recall pin for pairs_above compared LSH == exact on an EMPTY pair
set (the driver fixture's max pairwise cosine is ~0.51) — asserting
nothing. These tests run on PLANTED near-duplicates: base vectors plus
perturbed copies at a controlled cosine, so the pair set is non-empty,
the banded recall pin is falsifiable, and removing the banding (a single
8-plane bucket, the r2 design with analytic recall ~0.43 at τ=0.95)
demonstrably loses pairs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tbbid_scrapy_spark.operators import similarity

# planted fixture: 60 unit base vectors (dim 32) + a perturbed copy of
# each of the first 20, at cos(v, v') == 1/sqrt(1+eps^2) ≈ 0.970
_N_BASE = 60
_DIM = 32
_N_PLANTED = 20
_EPS = 0.2506  # → cos ≈ 0.9701


def _planted_rows(seed: int = 7):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((_N_BASE, _DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(_N_BASE)]
    for i in range(_N_PLANTED):
        d = rng.standard_normal(_DIM)
        d -= d.dot(base[i]) * base[i]          # orthogonal component only
        d *= _EPS / np.linalg.norm(d)
        v = base[i] + d
        rows.append((int(1000 + i), [float(x) for x in v]))
    return rows


@pytest.fixture(scope="module")
def planted(spark):
    df = spark.createDataFrame(
        _planted_rows(), "vec_id bigint, embedding array<double>"
    ).cache()
    df.count()
    return df


def test_planted_fixture_is_nonvacuous(planted):
    """The exact pair set at τ=0.95 is exactly the 20 planted pairs —
    if this fails the other pins here assert nothing."""
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.pairs_above(planted, threshold=0.95, exact=True).collect()
    }
    assert exact == {(i, 1000 + i) for i in range(_N_PLANTED)}


def test_banded_lsh_recall_equals_exact_on_planted(planted):
    """Default banded LSH (8 bands × 8 planes) must find EVERY planted
    pair at τ=0.95 — per-pair miss probability (1-p^8)^8 ≈ 3e-3 at
    cos 0.97, and hyperplanes are xxhash64-seeded → deterministic."""
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.pairs_above(planted, threshold=0.95, exact=True).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.pairs_above(planted, threshold=0.95).collect()
    }
    assert len(exact) == _N_PLANTED
    assert lsh == exact


def test_single_band_misses_pairs_banding_is_load_bearing(planted):
    """The r2 design (ONE 8-plane bucket) has per-pair recall
    p^8 ≈ 0.52 at cos 0.97 — on 20 planted pairs it must lose some.
    This is the pin that FAILS if the banding is removed."""
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.pairs_above(planted, threshold=0.95, exact=True).collect()
    }
    one_band = {
        (r.id_a, r.id_b)
        for r in similarity.pairs_above(planted, threshold=0.95, n_bands=1).collect()
    }
    assert one_band < exact  # strict subset: single-bucket LSH drops pairs
    # and no false positives ever (exact re-score gates the output)
    assert one_band <= exact


def test_pairs_above_no_false_positives(planted):
    """Every reported pair really is ≥ τ (candidates are exact
    re-scored, so LSH can only lose pairs, never invent them)."""
    rows = similarity.pairs_above(planted, threshold=0.95).collect()
    assert rows and all(r.cos >= 0.95 for r in rows)


# ---------------------------------------------------------------------------
# two-phase salted top-k (scale hygiene: no single task ever ranks a
# query's full scored corpus)
# ---------------------------------------------------------------------------


def test_topk_two_phase_matches_numpy_bruteforce(planted):
    emb = {r.vec_id: np.array(r.embedding) for r in planted.collect()}
    queries = planted.filter(F.col("vec_id") < 4)
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in similarity.cosine_topk(planted, queries, k=5).collect()
    }
    for q in range(4):
        qv = emb[q]
        scored = sorted(
            (
                (-float(qv @ v) / (np.linalg.norm(qv) * np.linalg.norm(v)), vid)
                for vid, v in emb.items()
                if vid != q
            ),
        )[:5]
        for rank, (_, vid) in enumerate(scored, start=1):
            assert got[(q, rank)] == vid


def test_topk_plan_has_salted_local_window(planted):
    """Plan pin for the two-phase rank: the scored frame's FIRST window
    partitions by (query_id, _salt) — a lone
    row_number() OVER (PARTITION BY query_id) would funnel each query's
    entire scored corpus through one task at 10^10 vectors."""
    queries = planted.filter(F.col("vec_id") < 4)
    plan = (
        similarity.cosine_topk(planted, queries, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window [row_number" in ln]
    assert len(windows) == 2, plan
    # bottom-most window (listed last in the physical tree) partitions by
    # (query_id, pmod(xxhash64(vec_id), salt)) — the alias _salt is
    # inlined in the physical plan, so match the salt expression itself
    assert "pmod(xxhash64" in windows[-1], windows
    # the global window sees only the ≤ k·salt_buckets survivors
    assert "pmod(xxhash64" not in windows[0], windows


def test_topk_two_phase_salt_width_insensitive(planted):
    """Result set must not depend on the salt bucket count."""
    scored = similarity.cosine_topk(planted, planted.filter(F.col("vec_id") < 2), k=7)
    base = {(r.query_id, r.rank, r.vec_id) for r in scored.collect()}
    q = planted.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    raw = planted.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id",
        similarity.cosine(F.col("embedding"), F.col("q_emb")).alias("cos"),
    )
    for buckets in (1, 3, 64):
        alt = {
            (r.query_id, r.rank, r.vec_id)
            for r in similarity.topk_per_query(raw, 7, salt_buckets=buckets).collect()
        }
        assert alt == base
