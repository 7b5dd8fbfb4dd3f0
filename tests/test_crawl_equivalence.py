"""Crawl-ordering / seen-set / span-extraction equality vs the
reference-skeleton simulator (BASELINE.json metric; SURVEY.md §5c)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tbbid_scrapy_spark.fixtures import sitegen
from tbbid_scrapy_spark.fixtures.simulator import simulate_crawl
from tbbid_scrapy_spark.operators.bloom import BloomSpec
from tbbid_scrapy_spark.plans.crawl import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def sim(site):
    return simulate_crawl(
        site,
        sitegen.default_seeds(),
        sitegen.default_politeness(),
        sitegen.default_robots(),
        max_waves=50,
    )


@pytest.fixture(scope="module")
def engine_state(spark, site_df, politeness_df, robots_df):
    eng = CrawlEngine(
        spark, site_df, sitegen.default_seeds(), politeness_df, robots_df,
        CrawlConfig(max_waves=50, seen_mode="exact"),
    )
    return eng.run()


def _engine_order(state):
    return [
        (r.wave, r.url_norm)
        for r in state.fetch_log.orderBy("wave", "fetch_pos").collect()
    ]


def test_crawl_ordering_exact_match(sim, engine_state):
    assert _engine_order(engine_state) == sim.fetch_log


def test_seen_set_exact_match(sim, engine_state):
    eng_seen = {r.url_norm for r in engine_state.seen.collect()}
    assert eng_seen == sim.seen


def test_span_extraction_byte_equal(sim, engine_state):
    """Per-row invariant from BASELINE.json input_hint: span sequence
    equality on (kind, text, media_ref, order) for every fetched page."""
    rows = engine_state.extracted.orderBy("doc_id", "offset").collect()
    eng: dict[str, list] = {}
    for r in rows:
        eng.setdefault(r.doc_id, []).append((r.kind, r.text, r.media_ref, r.offset))
    assert set(eng) == set(sim.extracted)
    for doc_id, spans in sim.extracted.items():
        assert eng[doc_id] == list(spans), f"span mismatch for {doc_id}"


def test_robots_excluded_never_fetched(sim, engine_state):
    fetched = {u for _, u in _engine_order(engine_state)}
    assert not any("/admin" in u for u in fetched)
    assert not any("/admin" in u for u in sim.seen)


def test_politeness_budget_respected(engine_state, politeness_df):
    budgets = {r.host: r.budget_per_wave for r in politeness_df.collect()}
    per_wave_host = (
        engine_state.fetch_log.withColumn(
            "host", F.lower(F.parse_url(F.col("url_norm"), F.lit("HOST")))
        )
        .groupBy("wave", "host")
        .count()
        .collect()
    )
    for r in per_wave_host:
        assert r["count"] <= budgets.get(r.host, 4), (
            f"wave {r.wave} host {r.host}: {r['count']} fetches"
        )


def test_bloom_and_hybrid_modes_match_exact(
    spark, site_df, politeness_df, robots_df, sim
):
    """At fixture scale the bloom is oversized ⇒ zero FPs expected, so
    bloom/hybrid runs must equal the exact run (and the simulator)."""
    spec = BloomSpec.for_capacity(expected_n=10_000, fp_rate=1e-6, n_shards=8)
    for mode in ("bloom", "hybrid"):
        eng = CrawlEngine(
            spark, site_df, sitegen.default_seeds(), politeness_df, robots_df,
            CrawlConfig(max_waves=50, seen_mode=mode, bloom_spec=spec),
        )
        st = eng.run()
        assert _engine_order(st) == sim.fetch_log, mode
        assert {r.url_norm for r in st.seen.collect()} == sim.seen, mode


def test_retry_semantics(spark, politeness_df, robots_df):
    """Pages that 503 once are retried next wave and eventually fetched;
    attempts counted like RETRY_TIMES (settings.py:77-79)."""
    site = sitegen.build_site(
        n_listing_pages=2, projects_per_listing=3, seed=7, fail_every=2
    )
    sim = simulate_crawl(
        site, sitegen.default_seeds(), sitegen.default_politeness(),
        sitegen.default_robots(), max_waves=60,
    )
    from tests.conftest import SITE_SCHEMA

    site_df = spark.createDataFrame(sitegen.site_to_rows(site), SITE_SCHEMA)
    eng = CrawlEngine(
        spark, site_df, sitegen.default_seeds(), politeness_df, robots_df,
        CrawlConfig(max_waves=60),
    )
    st = eng.run()
    assert _engine_order(st) == sim.fetch_log
    eng_states = {
        r.url_norm: (r.state, r.attempts) for r in st.frontier.collect()
    }
    for u, e in sim.entries.items():
        assert eng_states[u] == (e.state, e.attempts), u


def test_retry_exhaustion_boundary_is_scrapy_semantics(spark, politeness_df, robots_df):
    """RETRY_TIMES=3 means 3 retries IN ADDITION to the first attempt
    (scrapy retry middleware): a page that 503s exactly 3 times succeeds
    on its 4th fetch; one that 503s 4 times settles 'failed' with
    attempts=4. Engine and simulator must agree on the boundary."""
    site = sitegen.build_site(n_listing_pages=1, projects_per_listing=4, seed=11)
    stages = [u for u, p in site.items() if p.page_kind == "stage"]
    edge_ok, edge_fail = sorted(stages)[0], sorted(stages)[1]
    site[edge_ok].fail_first = 3     # succeeds on attempt 4
    site[edge_fail].fail_first = 4   # exhausts the retry budget
    sim = simulate_crawl(
        site, sitegen.default_seeds(), sitegen.default_politeness(),
        sitegen.default_robots(), max_waves=80,
    )
    from tests.conftest import SITE_SCHEMA

    site_df = spark.createDataFrame(sitegen.site_to_rows(site), SITE_SCHEMA)
    eng = CrawlEngine(
        spark, site_df, sitegen.default_seeds(), politeness_df, robots_df,
        CrawlConfig(max_waves=80),
    )
    st = eng.run()
    eng_states = {
        r.url_norm: (r.state, r.attempts) for r in st.frontier.collect()
    }
    assert eng_states[edge_ok] == ("fetched", 3)
    assert eng_states[edge_fail] == ("failed", 4)
    for u, e in sim.entries.items():
        assert eng_states[u] == (e.state, e.attempts), u
    assert _engine_order(st) == sim.fetch_log


def test_simulated_politeness_clock(engine_state, politeness_df):
    """The derived politeness timeline respects the reference's rate
    ceiling: per wave, a host with budget 4 and 2s delay contributes
    exactly ceil(n/4)*2s; the total implies ≤4 req/s/host."""
    from tbbid_scrapy_spark.plans.clock import simulated_clock

    clock = simulated_clock(engine_state.fetch_log, politeness_df).collect()
    assert clock, "no waves"
    for r in clock:
        assert r.sim_duration_s >= 2.0  # at least one 2s slot per wave
        assert r.fetches <= 4 * 3  # ≤ budget × n_hosts
    total_fetches = sum(r.fetches for r in clock)
    total_s = sum(r.sim_duration_s for r in clock)
    assert total_fetches / total_s <= 4 * 3 / 2.0  # global ceiling


def test_simulated_clock_uses_per_host_budget(spark):
    """The politeness table's budget_per_wave IS the per-domain
    concurrency (settings.py:29) — a host crawled at budget 8 must be
    modeled at divisor 8, not the global default 4: 8 fetches at
    (budget 8, delay 2 s) cost ceil(8/8)·2 = 2 s, not 4 s."""
    from tbbid_scrapy_spark import schemas
    from tbbid_scrapy_spark.plans.clock import simulated_clock

    fetch_log = spark.createDataFrame(
        [(0, f"https://wide.example.org/p{i}") for i in range(8)]
        + [(0, f"https://narrow.example.org/p{i}") for i in range(4)]
        + [(0, f"https://norule.example.org/p{i}") for i in range(8)],
        "wave int, url_norm string",
    )
    politeness = spark.createDataFrame(
        [("wide.example.org", 8, 2.0), ("narrow.example.org", 2, 3.0)],
        schemas.POLITENESS,
    )
    rows = {r.wave: r for r in simulated_clock(fetch_log, politeness).collect()}
    # wave 0 duration = max(wide ceil(8/8)*2=2, narrow ceil(4/2)*3=6,
    # norule ceil(8/4)*2=4 with the defaults) = 6
    assert rows[0].sim_duration_s == 6.0
    assert rows[0].fetches == 20


def test_hybrid_canonicalizer_crawl_parity(
    spark, sim, site_df, politeness_df, robots_df
):
    """The JVM+Arrow hybrid canonicalizer (the wide-wave path the adaptive
    default only engages past hybrid_canon_min_rows) must reproduce the
    simulator's ordering and seen set exactly when FORCED on the parity
    fixture — byte-equality of the identity function is what makes the
    adaptive switch safe."""
    eng = CrawlEngine(
        spark, site_df, sitegen.default_seeds(), politeness_df, robots_df,
        CrawlConfig(max_waves=50, seen_mode="exact", canonicalizer="hybrid"),
    )
    st = eng.run()
    assert _engine_order(st) == sim.fetch_log
    assert {r.url_norm for r in st.seen.collect()} == sim.seen


def test_retry_settle_exprs_literal_precedence(spark):
    """Pin every branch of the settle state machine to literal outcomes
    (Scrapy parity: RETRY_TIMES=3 → 4 total fetches; 404 and other
    non-retryable statuses fail immediately with attempts UNCHANGED;
    404 wins its dedicated branch before the generic non-retryable cut;
    a retryable status at attempts=3 fails WITH the increment recorded)."""
    from tbbid_scrapy_spark.plans.crawl import retry_settle_exprs

    rows = [
        (200, 2),   # success mid-retry-history
        (404, 0),   # immediate fail, attempts untouched
        (410, 1),   # non-retryable error → immediate fail, attempts untouched
        (403, 0),   # retryable, budget left → back to pending, attempts+1
        (503, 3),   # retryable at the limit: 3+1 >= 4 → failed, attempts=4
        (429, 2),   # retryable, budget left → pending, attempts=3
    ]
    df = spark.createDataFrame(rows, "status int, attempts int")
    state_expr, attempts_expr = retry_settle_exprs()
    got = {
        (r.status, r.attempts): (r.state, r.attempts_after)
        for r in df.select(
            "status", "attempts",
            state_expr.alias("state"),
            attempts_expr.alias("attempts_after"),
        ).collect()
    }
    assert got == {
        (200, 2): ("fetched", 2),
        (404, 0): ("failed", 0),
        (410, 1): ("failed", 1),
        (403, 0): ("pending", 1),
        (503, 3): ("failed", 4),
        (429, 2): ("pending", 3),
    }
