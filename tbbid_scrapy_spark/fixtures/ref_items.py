"""Pure-Python item-extraction oracle — the reference-skeleton twin of
plans/items.py, run by tests over the simulator's extracted spans to pin
the engine's item rows. Shares the regex patterns with the Spark
expressions (functions/extract.py constants) so there is one source of
truth for the semantics.
"""

from __future__ import annotations

import re

from tbbid_scrapy_spark.functions.extract import (
    DURATION_PATTERN,
    FUNDING_PAREN_STRIP,
    FUNDING_PATTERN,
    PROFESSION_PATTERN,
    QUALIFICATION_GROUP_PATTERN,
)
from tbbid_scrapy_spark.functions.html import remove_script_tags_py
from tbbid_scrapy_spark.functions.urls import canonicalize_url_py

Span = tuple[str, str | None, str | None, int]  # (kind, text, media_ref, offset)


def _kind_of(url: str) -> str:
    path = "/" + url.split("://", 1)[-1].split("/", 1)[1] if "/" in url.split("://", 1)[-1] else "/"
    for kind, marker in [
        ("candidates", "/candidates/"),
        ("bids", "/bids/"),
        ("notice", "/notice/"),
        ("stage", "/project/"),
        ("listing", "/listing"),
    ]:
        if path.startswith(marker):
            return kind
    return "other"


def _pid(url: str, marker: str) -> str:
    m = re.search(marker + r"([^/?#]+)", url)
    return m.group(1) if m else ""


def _is_number(s: str | None) -> bool:
    try:
        float(s)  # type: ignore[arg-type]
        return True
    except (TypeError, ValueError):
        return False


def expected_items(extracted: dict[str, list[Span]]) -> dict[str, list[dict]]:
    """Items per the rules documented in plans/items.py."""
    listing_stubs: dict[str, str] = {}  # stage_url -> title
    stage_pids: dict[str, str] = {}  # stage_url -> project_id
    notices: dict[str, dict] = {}
    bids: list[dict] = []
    lot_ctl: list[dict] = []
    ranks: list[dict] = []

    for url, spans in extracted.items():
        kind = _kind_of(url)
        if kind == "listing":
            for k, text, ref, _ in spans:
                if k == "link" and ref and "/project/" in ref:
                    if text and ("监理" in text or "造价咨询" in text):
                        continue
                    title = text[:-4] if text and text.endswith("招标公告") else text
                    stage_url = canonicalize_url_py(ref, url)
                    listing_stubs.setdefault(stage_url, title)
        elif kind == "stage":
            for k, text, _, _ in spans:
                if k == "table_cell" and text and text.startswith("项目编号："):
                    stage_pids.setdefault(url, text.split("：")[1])
        elif kind == "notice":
            body = "\n".join(
                t for k, t, _, _ in sorted(spans, key=lambda s: s[3]) if k == "text"
            )
            pure = remove_script_tags_py(body)
            m = re.search(FUNDING_PATTERN, pure)
            funds = re.sub(FUNDING_PAREN_STRIP, "", m.group(1)).strip() if m else ""
            md = re.search(DURATION_PATTERN, pure)
            mp = re.search(PROFESSION_PATTERN, pure)
            notices[_pid(url, "/notice/")] = {
                "notice_content": pure,
                "construction_funds": funds,
                "project_duration": md.group(1) if md else "",
                "company_req": ",".join(re.findall(QUALIFICATION_GROUP_PATTERN, pure)),
                "person_req": mp.group(1) if mp else "",
            }
        elif kind == "bids":
            cells = [t for k, t, _, _ in sorted(spans, key=lambda s: s[3]) if k == "table_cell"]
            data = cells[2:]
            pid = _pid(url, "/bids/")
            first_num_found = False
            for i in range(0, len(data) - 1, 2):
                bidder, amount = data[i], data[i + 1]
                if bidder:
                    bids.append(
                        {
                            "project_id": pid,
                            "section_id": "001",
                            "bidder_name": bidder,
                            "bid_amount": float(amount) if _is_number(amount) else None,
                            "bid_pos": i // 2,
                        }
                    )
                if not first_num_found and _is_number(amount):
                    lot_ctl.append(
                        {"project_id": pid, "section_id": "001",
                         "lot_ctl_amt": float(amount)}
                    )
                    first_num_found = True
        elif kind == "candidates":
            cells = [t for k, t, _, _ in sorted(spans, key=lambda s: s[3]) if k == "table_cell"]
            pid = _pid(url, "/candidates/")
            for b in range(len(cells) // 12 + (1 if len(cells) % 12 else 0)):
                block = cells[b * 12:(b + 1) * 12]
                company = block[0] if len(block) > 0 else None
                manager = block[3] if len(block) > 3 else None
                amount = block[6] if len(block) > 6 else None
                ranks.append(
                    {
                        "project_id": pid,
                        "section_id": f"{b + 1:03d}",
                        "bidder_name": company,
                        "rank": 1,
                        "manager_name": manager,
                        "win_amt": float(amount) if _is_number(amount) else None,
                    }
                )

    projects = []
    for stage_url, title in listing_stubs.items():
        if stage_url in stage_pids:
            pid = stage_pids[stage_url]
            n = notices.get(
                pid,
                {
                    "notice_content": None,
                    "construction_funds": None,
                    "project_duration": None,
                    "company_req": None,
                    "person_req": None,
                },
            )
            projects.append({"project_id": pid, "title": title, "url": stage_url, **n})

    return {"project": projects, "bid": bids, "lot_ctl": lot_ctl, "bid_rank": ranks}
