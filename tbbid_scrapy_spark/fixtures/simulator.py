"""Single-threaded reference-skeleton crawl simulator — the ordering and
seen-set ORACLE the Spark engine is tested against (SURVEY.md §5c).

It implements the deterministic skeleton of the reference's crawl loop:

- FIFO-within-priority scheduling (Scrapy's scheduler semantics,
  configured at /root/reference/xizang/settings.py:23-30);
- per-host budget per wave = CONCURRENT_REQUESTS_PER_DOMAIN
  (settings.py:29);
- listing pages expand their links in REVERSE span order
  (bid_info.py:90 iterates ``reversed(data['data'])``);
- request-fingerprint dedup at enqueue time (Scrapy default dupefilter —
  first enqueue wins);
- retries: 3 retries after the first attempt on 5xx (4 total fetches —
  scrapy RETRY_TIMES semantics, settings.py:77-79), 404 fails immediately
  (404 ∉ RETRY_HTTP_CODES);
- robots rules enforced at enqueue (north-star requirement; the
  reference ships with ROBOTSTXT_OBEY off — settings.py:19-20 — so parity
  fixtures use allow-all unless the robots test opts in).

The CRAWL-ORDERING contract both implementations satisfy:
fetch order within a wave is the global sort of the selected batch by
(priority desc, discovery_wave, seq); a URL's (wave, position) in that
log is deterministic. ``seq`` is the global enqueue counter: seeds in
list order, then children in (parent fetch order × effective span order).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from tbbid_scrapy_spark.fixtures.sitegen import PRIORITY_BY_KIND, Page
from tbbid_scrapy_spark.functions.urls import canonicalize_url_py

RETRY_LIMIT = 3  # RETRY_TIMES, settings.py:77
# Scrapy's RETRY_TIMES counts retries IN ADDITION to the first attempt
# (retry.py middleware), so RETRY_TIMES=3 allows 4 total fetches.
MAX_ATTEMPTS = RETRY_LIMIT + 1
RETRYABLE = {403, 500, 502, 503, 504, 522, 524, 408, 429}  # settings.py:78-79


def kind_of_url(url_norm: str) -> str:
    """Page kind inferred from the canonical URL path — the shared
    dispatch rule (the reference dispatches by callback; URL shape is the
    batch equivalent)."""
    path = url_norm.split("://", 1)[-1].split("/", 1)
    path = "/" + path[1] if len(path) > 1 else "/"
    for kind, marker in [
        ("listing", "/listing"),
        ("stage", "/project/"),
        ("notice", "/notice/"),
        ("bids", "/bids/"),
        ("candidates", "/candidates/"),
        ("corp_search", "/corp/search"),
        ("corp_detail", "/corp/detail"),
        ("emp_list", "/corp/emps"),
        ("person_perf_list", "/corp/listpersonperformance"),
        ("perf_detail", "/corp/perfdetail"),
        ("security_list", "/corp/security"),
    ]:
        if path.startswith(marker):
            return kind
    return "other"


def priority_of(kind: str) -> int:
    return PRIORITY_BY_KIND.get(kind, 0)


def robots_allows(robots: list[tuple[str, str, bool]], host: str, url_norm: str) -> bool:
    path = url_norm.split("://", 1)[-1]
    path = "/" + path.split("/", 1)[1] if "/" in path else "/"
    best = None
    for rhost, prefix, allow in robots:
        if rhost == host and path.startswith(prefix):
            if best is None or len(prefix) > len(best[0]):
                best = (prefix, allow)
    return True if best is None else best[1]


@dataclass
class SimEntry:
    url_norm: str
    host: str
    page_kind: str
    priority: int
    depth: int
    wave: int  # discovery wave
    seq: int
    state: str = "pending"
    attempts: int = 0
    last_status: int | None = None
    parent_id: str | None = None


@dataclass
class SimResult:
    fetch_log: list[tuple[int, str]]  # (wave, url_norm) in fetch order
    seen: set[str]  # canonical URLs ever enqueued
    extracted: dict[str, list[tuple[str, str | None, str | None, int]]]
    entries: dict[str, SimEntry]
    waves_run: int


def simulate_crawl(
    site: dict[str, Page],
    seeds: list[str],
    politeness: list[tuple[str, int, float]],
    robots: list[tuple[str, str, bool]] | None = None,
    max_waves: int = 100,
    default_budget: int = 4,
) -> SimResult:
    robots = robots or []
    budgets = {h: b for h, b, _ in politeness}

    entries: dict[str, SimEntry] = {}
    seen: set[str] = set()
    fetch_log: list[tuple[int, str]] = []
    extracted: dict[str, list] = {}
    next_seq = 0

    def enqueue(raw_url: str, base: str | None, depth: int, wave: int, parent: str | None):
        nonlocal next_seq
        norm = canonicalize_url_py(raw_url, base)
        if norm is None or norm in seen:
            return
        host = norm.split("://", 1)[-1].split("/", 1)[0].split(":")[0]
        if not robots_allows(robots, host, norm):
            return  # never enters frontier nor seen
        seen.add(norm)
        kind = kind_of_url(norm)
        entries[norm] = SimEntry(
            url_norm=norm, host=host, page_kind=kind, priority=priority_of(kind),
            depth=depth, wave=wave, seq=next_seq, parent_id=parent,
        )
        next_seq += 1

    for s in seeds:
        enqueue(s, None, 0, 0, None)

    wave = 0
    while wave < max_waves:
        pending = [e for e in entries.values() if e.state == "pending"]
        if not pending:
            break
        # per-host politeness: rank by (priority desc, discovery wave, seq)
        batch: list[SimEntry] = []
        by_host: dict[str, list[SimEntry]] = {}
        for e in pending:
            by_host.setdefault(e.host, []).append(e)
        for host, es in by_host.items():
            es.sort(key=lambda e: (-e.priority, e.wave, e.seq))
            batch.extend(es[: budgets.get(host, default_budget)])
        # global fetch order within the wave
        batch.sort(key=lambda e: (-e.priority, e.wave, e.seq))

        for e in batch:
            fetch_log.append((wave, e.url_norm))
            page = site.get(e.url_norm)
            if page is None:
                e.state, e.last_status = "failed", 404
                continue
            if e.attempts < page.fail_first:
                e.attempts += 1
                e.last_status = 503
                e.state = "failed" if e.attempts >= MAX_ATTEMPTS else "pending"
                continue
            e.state, e.last_status = "fetched", 200
            extracted[e.url_norm] = list(page.spans)
            links = [(k, t, m, o) for (k, t, m, o) in page.spans if k == "link"]
            if page.page_kind == "listing":
                # the reference `continue`s on 监理/造价咨询 titles BEFORE
                # yielding the detail request (bid_info.py:93-94) — filtered
                # projects are never crawled at all
                links = [
                    (k, t, m, o) for (k, t, m, o) in links
                    if not (t and ("监理" in t or "造价咨询" in t))
                ]
                links = list(reversed(links))
            for _, _, media_ref, _ in links:
                if media_ref and "/corp/persondetail" in media_ref:
                    # F16 prefix rewrite: the crawler requests the
                    # performance list, not the person page
                    # (company_emp_info.py:214-216)
                    media_ref = media_ref.replace(
                        "/corp/persondetail", "/corp/listpersonperformance"
                    )
                enqueue(media_ref, e.url_norm, e.depth + 1, wave + 1, e.url_norm)
        wave += 1

    return SimResult(
        fetch_log=fetch_log,
        seen=seen,
        extracted=extracted,
        entries=entries,
        waves_run=wave,
    )
