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
    # one dispatch table for all fixture oracles (markers are disjoint,
    # so sharing the simulator's rule cannot change any classification);
    # the ENGINE keeps its own independent dispatch in plans/items.py —
    # that is the parity boundary, not simulator-vs-twin.
    from tbbid_scrapy_spark.fixtures.simulator import kind_of_url

    return kind_of_url(url)


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


# ---------------------------------------------------------------------------
# corp/employee/performance chain (company_emp_info.py twin of
# plans/corp_items.py)
# ---------------------------------------------------------------------------

QUAL_KEYWORDS = ["工程施工", "工程专业", "承包贰级", "承包壹级"]


def _corp_kind(url: str) -> str:
    # shared dispatch table — see _kind_of
    from tbbid_scrapy_spark.fixtures.simulator import kind_of_url

    return kind_of_url(url)


def _qparam(url: str, key: str) -> str | None:
    from urllib.parse import parse_qs, urlsplit

    vals = parse_qs(urlsplit(url).query).get(key)
    return vals[0] if vals else None


def _labels(cells: list[str], pairs: dict[str, str]) -> dict[str, str | None]:
    out: dict[str, str | None] = {v: None for v in pairs.values()}
    for i, c in enumerate(cells[:-1]):
        if c in pairs:
            out[pairs[c]] = cells[i + 1]
    return out


def expected_corp_items(extracted: dict[str, list[Span]]) -> dict[str, list[dict]]:
    searches: dict[str, dict] = {}  # corp_code -> {name}
    details: dict[str, dict] = {}
    emp_rows: list[dict] = []
    births: dict[str, str] = {}
    perf_stubs: list[dict] = []
    perf_dets: dict[str, dict] = {}
    security: list[dict] = []

    for url, spans in extracted.items():
        kind = _corp_kind(url)
        ordered = sorted(spans, key=lambda s: s[3])
        cells = [t for k, t, _, _ in ordered if k == "table_cell"]
        if kind == "corp_search":
            if len(cells) >= 4:
                searches[cells[3]] = {"name": _qparam(url, "name")}
        elif kind == "corp_detail":
            code = _qparam(url, "corpcode")
            d = _labels(cells, {"法人姓名": "corp", "注册资本": "corp_asset",
                                "经营地址": "reg_address", "报送有效期": "valid_date"})
            quals = [c[len("资质条目："):] for c in cells if c and c.startswith("资质条目：")]
            quals = sorted({q for q in quals if any(k in q for k in QUAL_KEYWORDS)})
            others = next(
                (c[len("其他："):].strip() for c in cells if c and c.startswith("其他：")),
                None,
            )
            details[code] = {**d, "qualifications": quals, "others": others}
        elif kind == "emp_list":
            rows_spans = [
                s for s in ordered
                if s[0] == "table_cell"
                or (s[0] == "link" and "pageIndex=" not in (s[2] or ""))
            ]
            code = _qparam(url, "corpcode")
            for r in range(len(rows_spans) // 7):
                row = rows_spans[r * 7:(r + 1) * 7]
                name = row[1][1]
                if not name or not name.strip():
                    continue
                emp_rows.append(
                    {
                        "corp_code": code,
                        "name": name.strip(),
                        "cert_code": row[2][1],
                        "role": row[3][1],
                        "valid_date": row[5][1],
                        "major": (row[6][1] or "").strip().split("、"),
                        "person_id": re.search(r"id=([^&#]+)", row[1][2]).group(1),
                    }
                )
        elif kind == "person_perf_list":
            pid = re.search(r"id=([^&#]+)", url).group(1)
            if len(ordered) >= 2 and ordered[1][0] == "table_cell":
                births[pid] = (ordered[1][1] or "").strip()
            rest = ordered[2:]
            for r in range(len(rest) // 3):
                row = rest[r * 3:(r + 1) * 3]
                if row[2][0] == "link" and row[2][2]:
                    perf_stubs.append(
                        {
                            "person_id": pid,
                            "data_level": row[0][1],
                            "perf_id": re.search(r"id=([^&#]+)", row[2][2]).group(1),
                        }
                    )
        elif kind == "perf_detail":
            pfid = re.search(r"id=([^&#]+)", url).group(1)
            d = _labels(cells, {"项目名称": "project_name", "个人业绩记录编号": "record_id",
                                "企业业绩记录编号": "company_id", "人员证件号码": "id_number"})
            perf_dets[pfid] = {k: (v or "").strip() for k, v in d.items()}
        elif kind == "security_list":
            code = _qparam(url, "corpcode")
            for r in range(len(cells) // 7):
                row = cells[r * 7:(r + 1) * 7]
                name, cert, valid = row[1], row[4], row[6]
                if not name or not name.strip():
                    continue
                if "B" in cert:
                    role = "安全员B"
                elif "C" in cert:
                    role = "安全员C"
                else:
                    continue
                security.append(
                    {"corp_code": code, "name": name.strip(), "cert_code": cert,
                     "role": role, "valid_date": valid}
                )

    companies = [
        {"corp_code": code, **s,
         **details.get(code, {"corp": None, "corp_asset": None, "reg_address": None,
                              "valid_date": None, "qualifications": None, "others": None})}
        for code, s in searches.items()
    ]

    id_numbers: dict[str, str] = {}
    for pfid, d in perf_dets.items():
        pid = re.match(r"^(.+)-\d+$", pfid).group(1)
        if d.get("id_number"):
            cur = id_numbers.get(pid)
            if cur is None or d["id_number"] < cur:
                id_numbers[pid] = d["id_number"]

    employees = [
        {**e, "birth_date_raw": births.get(e["person_id"]),
         "id_number": id_numbers.get(e["person_id"])}
        for e in emp_rows
    ]

    emp_by_pid = {e["person_id"]: e for e in emp_rows}
    performances = []
    for st in perf_stubs:
        det = perf_dets.get(st["perf_id"])
        emp = emp_by_pid.get(st["person_id"])
        if det is None or emp is None:
            continue
        performances.append(
            {
                "name": emp["name"],
                "corp_code": emp["corp_code"],
                "corp_name": searches.get(emp["corp_code"], {}).get("name"),
                "project_name": det["project_name"],
                "data_level": st["data_level"],
                "role": emp["role"],  # reference quirk: NOT the zipped role
                "record_id": det["record_id"],
                "company_id": det["company_id"],
            }
        )

    return {
        "company": companies,
        "employee": employees,
        "security": security,
        "performance": performances,
    }


# ---------------------------------------------------------------------------
# JSON-API winner items (bid_notice/national_bid_list twin of
# plans/api_items.py)
# ---------------------------------------------------------------------------

_DT_FORMATS = ["%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y/%m/%d %H:%M:%S", "%Y/%m/%d"]


def _parse_dt(s: str | None):
    from datetime import datetime

    if not s:
        return None
    for f in _DT_FORMATS:
        try:
            return datetime.strptime(s, f)
        except ValueError:
            continue
    return None


def expected_api_items(
    extracted: dict[str, list[Span]], cities: list[tuple[str, str, str]]
) -> list[dict]:
    import json

    city_by_code = {c[0]: c[1] for c in cities}
    out = []
    for url, spans in extracted.items():
        if "/api/list" not in url:
            continue
        body = next((t for k, t, _, _ in sorted(spans, key=lambda s: s[3]) if k == "text"), None)
        if body is None:
            continue
        p = json.loads(body)
        if not p.get("success") or not p.get("data"):
            continue
        for d in p["data"]:
            out.append(
                {
                    "corp_code": d["corpCode"],
                    "project_name": d["projectName"],
                    "bidder_name": d["bidderName"],
                    "area_code": d["areaCode"],
                    "win_amt": d["winAmt"],
                    "create_time": _parse_dt(d["createTime"]),
                    "tender_org_name": d["tenderOrgName"],
                    "tos": d["tos"],
                    "city_name": city_by_code.get((d["areaCode"] or "")[:4]),
                }
            )
    return out
