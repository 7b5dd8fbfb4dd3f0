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
import json
from importlib import resources
from dataclasses import dataclass, field

HOT_HOST = "deal.ggzy.example.org"
COLD_HOSTS = ["www.jsjg.example.org", "corp.registry.example.org"]

REGISTRY_HOST = "corp.registry.example.org"

PRIORITY_BY_KIND = {  # engine + simulator share this priority policy
    "listing": 10,
    "stage": 5,
    "notice": 2,
    "bids": 2,
    "candidates": 2,
    "corp_search": 3,
    "corp_detail": 1,
    "emp_list": 1,
    "person_perf_list": 1,
    "perf_detail": 1,
    "security_list": 1,
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
                    then the next-page link, then a robots-blocked admin
                    link and a cache-busted self link (canonicalizer
                    food) — so pagination is THIRD-from-last, not last
                    (the reference walks data reversed then paginates —
                    bid_info.py:90,120-124; the two trailing links never
                    fetch: admin is disallowed, refresh dedups).
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
                if h % 5 == 0 and b == 1:
                    # multi-company bidder string — exercises the ';' split
                    # (T1, company_emp_info.py:62-76)
                    bids.add(
                        "table_cell",
                        f"建工集团{(h + b) % 50:02d}公司;联合体建设{(h + b) % 20:02d}公司",
                    )
                else:
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


def bidder_names_of(pages: dict[str, Page]) -> list[str]:
    """Distinct bidder names from the bids pages, ';'-split + trimmed like
    expand_companies (company_emp_info.py:62-76); sorted for determinism
    (the reference samples with ORDER BY RANDOM() — seeded determinism is
    our documented divergence, SURVEY.md O1)."""
    names: set[str] = set()
    for p in pages.values():
        if p.page_kind != "bids":
            continue
        cells = [t for (k, t, _, _) in sorted(p.spans, key=lambda s: s[3]) if k == "table_cell"]
        for i in range(2, len(cells) - 1, 2):
            raw = cells[i] or ""
            for part in raw.split(";"):
                part = part.strip()
                if part:
                    names.add(part)
    return sorted(names)


def corp_code_of(name: str, seed: int = 42) -> str | None:
    """Deterministic USCI-style corp code; ~1 in 6 names have no registry
    entry (the reference's 'No company code found' warning path)."""
    h = _h(seed, "corp", name)
    if h % 6 == 0:
        return None
    return f"91540000{h % 10**8:08d}X"


def build_corp_site(
    bidder_names: list[str], seed: int = 42
) -> dict[str, Page]:
    """Registry-host page graph for the company/employee crawl
    (company_emp_info.py semantics — SURVEY.md §3.2):

    corp_search?name=N   4th table_cell = corp_code (td[4], :79-81);
                         links to detail / employee list / security list
                         (the reference constructs these URLs from the
                         extracted code, :84-101)
    corp_detail          label-sibling cell pairs (法人姓名/注册资本/经营地址/
                         报送有效期, :109-114) + 资质条目 cells (P5 keyword
                         filter+dedup, :115-121) + 其他 cell
    emp_list             7-cell employee rows (name link td2, cert td3,
                         role td4, valid td6, major td7 split '、',
                         :197-211); page 1 links pages 2..n (O4 'seen'
                         guard = deeper pages carry no pagination links);
                         person links use /corp/persondetail which the
                         crawler rewrites to /corp/listpersonperformance
                         (F16 prefix rewrite, :214-216)
    person_perf_list     出生日期 pair (:151-154) + stride-3 perf rows
                         (level, role, detail link) zipped positionally
                         (J5, :162-167)
    perf_detail          label pairs: 项目名称/个人业绩记录编号/企业业绩记录编号/
                         人员证件号码 (:134-139)
    security_list        rows whose cert codes contain B/C or neither
                         (P8 classification, :256-261)
    """
    pages: dict[str, Page] = {}
    host = REGISTRY_HOST

    for name in bidder_names:
        from urllib.parse import quote

        search = Page(f"https://{host}/corp/search?name={quote(name)}", "corp_search", host)
        code = corp_code_of(name, seed)
        search.add("table_cell", name)
        search.add("table_cell", "西藏")
        search.add("table_cell", "施工企业")
        if code is None:
            pages[search.doc_id] = search  # no 4th cell → dead end
            continue
        search.add("table_cell", code)
        search.add("link", "企业详情", f"https://{host}/corp/detail?corpcode={code}")
        search.add("link", "注册人员", f"https://{host}/corp/emps?corpcode={code}&pageIndex=1")
        search.add("link", "安全人员", f"https://{host}/corp/security?corpcode={code}&pageIndex=1")
        pages[search.doc_id] = search

        h = _h(seed, "corpdata", code)
        detail = Page(f"https://{host}/corp/detail?corpcode={code}", "corp_detail", host)
        detail.add("table_cell", "法人姓名")
        detail.add("table_cell", f"法人{h % 100:02d}")
        detail.add("table_cell", "注册资本")
        detail.add("table_cell", f"{1000 + h % 50000}万元")
        detail.add("table_cell", "经营地址")
        detail.add("table_cell", f"拉萨市某区某路{h % 200}号")
        detail.add("table_cell", "报送有效期")
        detail.add("table_cell", f"2025-{h % 12 + 1:02d}-01")
        quals = [
            "房屋建筑工程施工总承包壹级",      # kept: 工程施工 + 承包壹级
            "市政公用工程施工总承包贰级",      # kept
            "建筑装饰装修工程专业承包一级",    # kept: 工程专业
            "劳务分包资质",                   # dropped: no keyword
            "房屋建筑工程施工总承包壹级",      # duplicate → dedup
        ]
        for q in quals[: 3 + h % 3]:
            detail.add("table_cell", f"资质条目：{q}")
        detail.add("table_cell", f"其他：信用等级{'ABC'[h % 3]}")
        pages[detail.doc_id] = detail

        n_pages = 1 + (h % 2)  # 1-2 employee list pages (pagination O4)
        n_emp_per_page = 1 + (h % 2)
        eid = 0
        for pg in range(1, n_pages + 1):
            emp = Page(
                f"https://{host}/corp/emps?corpcode={code}&pageIndex={pg}",
                "emp_list", host,
            )
            for _ in range(n_emp_per_page):
                eid += 1
                he = _h(seed, "emp", code, eid)
                pid_url = f"https://{host}/corp/persondetail?id={code}-{eid}"
                emp.add("table_cell", str(eid))  # td1
                emp.add("link", f"项目经理{he % 500:03d}", pid_url)  # td2 name+href
                emp.add("table_cell", f"ZJ{he % 10**6:06d}" if he % 4 else "")  # td3 cert
                emp.add("table_cell", ["一级建造师", "二级建造师"][he % 2])  # td4 role
                emp.add("table_cell", "注册")  # td5
                emp.add("table_cell", f"2026-0{he % 9 + 1}-01")  # td6 valid
                emp.add("table_cell", "建筑工程、市政公用工程")  # td7 major
            if pg == 1 and n_pages > 1:
                for nxt in range(2, n_pages + 1):
                    emp.add(
                        "link", str(nxt),
                        f"https://{host}/corp/emps?corpcode={code}&pageIndex={nxt}",
                    )
            pages[emp.doc_id] = emp

            for e in range(eid - n_emp_per_page + 1, eid + 1):
                he = _h(seed, "emp", code, e)
                person = Page(
                    f"https://{host}/corp/listpersonperformance?id={code}-{e}",
                    "person_perf_list", host,
                )
                person.add("table_cell", "出生日期")
                person.add("table_cell", f"19{70 + he % 30}-0{he % 9 + 1}-15")
                for pf in range(he % 3):  # 0-2 performances
                    hp = _h(seed, "perf", code, e, pf)
                    person.add("table_cell", ["省级", "市级"][hp % 2])  # level
                    person.add("table_cell", ["项目经理", "技术负责人"][hp % 2])  # (zipped-but-ignored role)
                    person.add(
                        "link", "详情",
                        f"https://{host}/corp/perfdetail?id={code}-{e}-{pf}",
                    )
                pages[person.doc_id] = person
                for pf in range(he % 3):
                    hp = _h(seed, "perf", code, e, pf)
                    perf = Page(
                        f"https://{host}/corp/perfdetail?id={code}-{e}-{pf}",
                        "perf_detail", host,
                    )
                    perf.add("table_cell", "项目名称")
                    perf.add("table_cell", f"某某工程{hp % 1000:03d}项目")
                    perf.add("table_cell", "个人业绩记录编号")
                    perf.add("table_cell", f"GR{hp % 10**6:06d}")
                    perf.add("table_cell", "企业业绩记录编号")
                    perf.add("table_cell", f"QY{hp % 10**6:06d}")
                    perf.add("table_cell", "人员证件号码")
                    perf.add("table_cell", f"5401{hp % 10**10:010d}" if hp % 3 else "")
                    pages[perf.doc_id] = perf

        sec = Page(
            f"https://{host}/corp/security?corpcode={code}&pageIndex=1",
            "security_list", host,
        )
        for s in range(2 + h % 2):
            hs = _h(seed, "sec", code, s)
            sec.add("table_cell", str(s + 1))  # td1
            sec.add("table_cell", f"安全员{hs % 300:03d}")  # td2 name
            sec.add("table_cell", "在岗")  # td3
            sec.add("table_cell", "三类人员")  # td4
            cert = ["AQB{:05d}".format(hs % 10**5), "AQC{:05d}".format(hs % 10**5),
                    "AQX{:05d}".format(hs % 10**5)][hs % 3]  # td5: B / C / neither
            sec.add("table_cell", cert)
            sec.add("table_cell", "有效")  # td6
            sec.add("table_cell", f"2026-1{hs % 2}-01")  # td7 valid
        pages[sec.doc_id] = sec

    return pages


API_HOST = "api.ggzy.example.org"

# full 342-row cities dimension — the PUBLIC PRC administrative-division
# table the reference ships as cities.json and joins on
# substring(area_code,1,4) (bid_notice.py:105-116). Shipped verbatim as a
# DATA file (fixtures/cities.json, (code, name, provinceCode) rows);
# loading the real table gives the broadcast join (S9/J4) realistic key
# dispersion — the earlier 7-entry Tibet-only toy exercised the join
# shape but not the key space. importlib.resources (not open()) so the
# file also loads from a spark-submit --py-files ZIP deploy (pinned in
# tests/test_spark_submit.py).
CITIES: list[tuple[str, str, str]] = [
    (c["code"], c["name"], c["provinceCode"])
    for c in json.loads(
        resources.files(__package__).joinpath("cities.json").read_text(
            encoding="utf-8"
        )
    )
]


def build_api_site(n_items: int = 30, rows_per_page: int = 8, seed: int = 42) -> dict[str, Page]:
    """JSON-API source pages (bid_notice.py / national_bid_list.py
    semantics): each page's body is ONE text span holding the JSON
    payload; page 1 links pages 2..total//rows+1 (O3 pagination
    pre-materialization); success:false pages contribute nothing (P9).

    Payload rows carry the winner_bid_info fields incl. area codes that
    hit (and miss) the cities dimension and createTime in all four
    accepted datetime formats plus one invalid (F18)."""
    import json as _json

    pages: dict[str, Page] = {}
    n_pages = n_items // rows_per_page + 1  # F21 page-count math
    fmt_variants = [
        "2024-03-1{d} 10:2{d}:05", "2024-03-1{d}", "2024/03/1{d} 10:2{d}:05",
        "2024/03/1{d}", "bogus-date",
    ]
    item_idx = 0
    for pg in range(1, n_pages + 1):
        url = f"https://{API_HOST}/api/list?page={pg}&rows={rows_per_page}"
        page = Page(url, "api_list", API_HOST)
        success = not (pg == n_pages and _h(seed, "apifail", pg) % 3 == 0)
        data = []
        if success:
            for _ in range(min(rows_per_page, n_items - item_idx)):
                item_idx += 1
                h = _h(seed, "api", item_idx)
                area = CITIES[h % len(CITIES)][0] + f"{h % 100:02d}" if h % 5 else f"9999{h % 100:02d}"
                data.append(
                    {
                        "projectName": f"API项目{item_idx:04d}",
                        "corpCode": f"91540000{h % 10**8:08d}A",
                        "bidderName": f"中标集团{h % 40:02d}公司",
                        "areaCode": area,
                        "winAmt": round(100 + (h % 10**6) / 100.0, 2),
                        "createTime": fmt_variants[h % 5].format(d=h % 9),
                        "tos": ["工程", "货物", "服务"][h % 3],
                        "tenderOrgName": f"招标机构{h % 9}",
                    }
                )
        body = _json.dumps(
            {"success": success, "total": n_items, "data": data},
            ensure_ascii=False, sort_keys=True,
        )
        page.add("text", body)
        if pg == 1:
            for nxt in range(2, n_pages + 1):
                page.add(
                    "link", str(nxt),
                    f"https://{API_HOST}/api/list?page={nxt}&rows={rows_per_page}",
                )
        pages[url] = page
    return pages


def api_seed() -> list[str]:
    return [f"https://{API_HOST}/api/list?page=1&rows=8"]


def company_seed_urls(names: list[str]) -> list[str]:
    from urllib.parse import quote

    return [
        f"https://{REGISTRY_HOST}/corp/search?name={quote(n)}" for n in names
    ]


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
