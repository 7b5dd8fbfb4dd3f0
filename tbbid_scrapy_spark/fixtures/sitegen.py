"""Deterministic synthetic site graph.

Pages are rows of the interleaved-document schema from
BASELINE.json.input_hint: (doc_id, page_kind, host, spans) where spans is
array<struct<kind,text,media_ref,offset>> mixing text, titles, links,
table cells, and media refs. The graph mirrors the reference crawl's page
topology (SURVEY.md §2.9):

    listing --(reversed link order, bid_info.py:90)--> stage pages
    listing --> next listing page (pagination, bid_info.py:120-124)
    stage   --> notice / bids / candidates pages (bid_info.py:130-183)

Content exercises the extraction quirks pinned in FIXTURES.md §4: the
监理/造价咨询 anti-filter, 招标公告 suffix trim, Arabic + Chinese-numeral
section names, 资金来源/工期/资质/建造师 notice bodies with <script> blocks,
stride-12 candidate tables. ≥80% of pages live on one hot host to
exercise salted repartitioning.

Everything derives from a seed through a tiny hash-based PRNG — no
``random`` module state, no wall clock — so the Spark engine and the
pure-Python simulator build byte-identical graphs.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

HOT_HOST = "deal.ggzy.example.org"
COLD_HOSTS = ["www.jsjg.example.org", "corp.registry.example.org"]

PRIORITY_BY_KIND = {  # engine + simulator share this priority policy
    "listing": 10,
    "stage": 5,
    "notice": 2,
    "bids": 2,
    "candidates": 2,
    "corp_detail": 1,
}

SECTION_TITLES = [
    "水利枢纽项目(21标段)施工",      # Arabic numeral form
    "交通总承包十一标段工程",          # Chinese numeral form (parses → falls to 001)
    "管网总承包标段工程",              # Chinese branch fails → '-01'
    "城市道路改造工程",                # no section marker → '001'
]


def _h(*parts: object) -> int:
    """Deterministic 64-bit hash PRNG (stable across processes)."""
    raw = "|".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")


@dataclass
class Page:
    doc_id: str  # canonical URL
    page_kind: str
    host: str
    spans: list[tuple[str, str | None, str | None, int]] = field(default_factory=list)
    fail_first: int = 0  # fetches that 503 before succeeding (retry tests)

    def add(self, kind: str, text: str | None = None, media_ref: str | None = None):
        self.spans.append((kind, text, media_ref, len(self.spans)))


def _title(seed: int, i: int) -> str:
    h = _h(seed, "title", i)
    base = SECTION_TITLES[h % len(SECTION_TITLES)]
    if h % 7 == 0:
        return f"某某{base}监理服务"        # filtered by P2 anti-keyword
    if h % 7 == 1:
        return f"某某{base}造价咨询服务"    # filtered by P2 anti-keyword
    return f"某某{base}招标公告"            # suffix trimmed by P3


def _notice_body(seed: int, i: int) -> str:
    h = _h(seed, "notice", i)
    funds = ["政府投资（财政）", "自筹资金", "国有资金（全部）"][h % 3]
    dur = ["30天", "十二月", "100日历天"][h % 3]
    qual = [
        "房屋建筑工程施工总承包一级",
        "市政公用工程施工总承包贰级",
        "水利水电工程施工总承包特级",
    ][h % 3]
    prof = ["一级建造师", "贰级建造师", "建造师"][h % 3]
    return (
        f"<html><body><script>var x = {h % 100};</script>"
        f"<p>资金来源：{funds}。</p><p>计划工期：{dur}。</p>"
        f"<p>资质要求：{qual}。项目负责人须具备{prof}资格。</p>"
        f"</body></html>"
    )


def build_site(
    n_listing_pages: int = 4,
    projects_per_listing: int = 6,
    seed: int = 42,
    hot_ratio_cold_every: int = 7,  # every k-th project sits on a cold host
    fail_every: int = 0,  # every k-th stage page 503s once before success
    extra_text_spans: int = 0,  # filler text spans per notice (bench sizing)
) -> dict[str, Page]:
    """Build the page graph; keys are canonical URLs (https, sorted query).

    Span layout per page kind:
    - listing     : title text span, project links (anchor text = title),
                    next-page link LAST (the reference walks data reversed
                    then paginates — bid_info.py:90,120-124).
    - stage       : project_id table_cell ('项目编号：<pid>'), links to
                    notice/bids/candidates, one media span (site logo).
    - notice      : title span, HTML body text span, one media image span.
    - bids        : table_cell spans: header row then (bidder, amount)
                    pairs; '控制价' header cell (W5).
    - candidates  : stride-12 table cells per section (W1).
    """
    pages: dict[str, Page] = {}
    pid_counter = 0

    for lp in range(1, n_listing_pages + 1):
        url = f"https://{HOT_HOST}/listing?page={lp}&province=540000"
        page = Page(url, "listing", HOT_HOST)
        page.add("title", f"招标公告列表 第{lp}页")
        for j in range(projects_per_listing):
            pid_counter += 1
            pid = f"XZ2024{pid_counter:05d}"
            h = _h(seed, "proj", pid)
            host = (
                COLD_HOSTS[h % len(COLD_HOSTS)]
                if hot_ratio_cold_every and pid_counter % hot_ratio_cold_every == 0
                else HOT_HOST
            )
            stage_url = f"https://{host}/project/{pid}"
            title = _title(seed, pid_counter)
            page.add("link", title, stage_url)

            stage = Page(stage_url, "stage", host)
            if fail_every and pid_counter % fail_every == 0:
                stage.fail_first = 1
            stage.add("table_cell", f"项目编号：{pid}")
            stage.add("link", "招标公告", f"https://{host}/notice/{pid}")
            stage.add("link", "开标记录", f"https://{host}/bids/{pid}")
            if h % 3 != 2:  # some projects have no candidates page yet
                stage.add("link", "中标候选人公示", f"https://{host}/candidates/{pid}")
            stage.add("media", None, f"https://static.example.org/logo_{h % 5}.png")
            pages[stage_url] = stage

            notice = Page(f"https://{host}/notice/{pid}", "notice", host)
            notice.add("title", title)
            notice.add("text", _notice_body(seed, pid_counter))
            for ex in range(extra_text_spans):
                notice.add("text", f"补充说明第{ex}段：" + "条款内容 " * 40)
            notice.add("media", None, f"https://static.example.org/img_{pid}.jpg")
            pages[notice.doc_id] = notice

            bids = Page(f"https://{host}/bids/{pid}", "bids", host)
            bids.add("table_cell", "投标人")
            bids.add("table_cell", "控制价")
            n_bidders = 2 + (h % 3)
            for b in range(n_bidders):
                bids.add("table_cell", f"建工集团{(h + b) % 50:02d}公司")
                bids.add("table_cell", f"{1000 + ((h + b) % 9000)}.{b}万元" if b else f"{2000 + (h % 500)}")
            pages[bids.doc_id] = bids

            if h % 3 != 2:
                cand = Page(f"https://{host}/candidates/{pid}", "candidates", host)
                cand.add("title", f"{title}中标候选人公示")
                for s in range(1 + (h % 2)):  # 1-2 sections, 12 cells each
                    for cell in range(12):
                        if cell == 0:
                            cand.add("table_cell", f"建工集团{(h + s) % 50:02d}公司")
                        elif cell == 3:
                            cand.add("table_cell", f"项目经理{(h + s) % 30:02d}")
                        elif cell == 6:
                            cand.add("table_cell", f"{900 + ((h + s) % 800)}.5")
                        else:
                            cand.add("table_cell", f"—{cell}")
                pages[cand.doc_id] = cand

        if lp < n_listing_pages:
            page.add(
                "link",
                "下一页",
                f"https://{HOT_HOST}/listing?page={lp + 1}&province=540000",
            )
        # a disallowed admin link + a cache-busted self link (canonicalizer food)
        page.add("link", "后台", f"https://{HOT_HOST}/admin/login?next={lp}")
        page.add("link", "刷新", f"https://{HOT_HOST}/listing?page={lp}&province=540000&_={_h(seed, lp) % 10**13}")
        pages[url] = page

    return pages


def default_seeds() -> list[str]:
    return [f"https://{HOT_HOST}/listing?page=1&province=540000"]


def default_robots() -> list[tuple[str, str, bool]]:
    """(host, path_prefix, allow). /admin is disallowed on the hot host."""
    rules = [(HOT_HOST, "/admin", False), (HOT_HOST, "/", True)]
    for h in COLD_HOSTS:
        rules.append((h, "/", True))
    return rules


def default_politeness(budget_hot: int = 4, budget_cold: int = 4) -> list[tuple[str, int, float]]:
    """Mirrors the reference budget: ≤4 concurrent per domain, 2s delay
    (/root/reference/xizang/settings.py:26-30)."""
    rows = [(HOT_HOST, budget_hot, 2.0)]
    for h in COLD_HOSTS:
        rows.append((h, budget_cold, 2.0))
    return rows


def site_to_rows(pages: dict[str, Page]) -> list[tuple]:
    """Rows for the DOCUMENTS schema + fail_first fetch metadata."""
    return [
        (
            p.doc_id,
            p.page_kind,
            p.host,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in p.spans
            ],
            p.fail_first,
        )
        for p in sorted(pages.values(), key=lambda p: p.doc_id)
    ]
