"""Regex / string / date scalar library — pure Catalyst expressions.

Each function returns a Column built only from ``pyspark.sql.functions``
(JVM-side, whole-stage codegen). Behavioral parity targets cited per
function; no reference code copied.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Vocabulary mirrored from /root/reference/xizang/constants.py:2-6 (public
# list of PRC construction-qualification categories).
COMPANY_QUALIFICATIONS = [
    "公路工程", "铁路工程", "房屋建筑工程", "建筑工程", "市政公用工程",
    "港口与航道工程", "水利水电工程", "电力工程", "矿山工程",
    "冶金工程", "化工石油工程", "机电工程", "通信工程", "桥梁工程专业",
]

_QUAL_PATTERN = (
    "(?:" + "|".join(COMPANY_QUALIFICATIONS) + ")施工总承包[一二三四五六七八九十壹贰叁肆伍陆柒捌玖拾特]+级"
)

# Shared pattern constants (used by the Spark expressions below AND by the
# pure-Python parity oracle in fixtures/ref_items.py — one source of truth)
FUNDING_PATTERN = r"(?:资金来源|资金来自)[：:\s]*([^\n，。；]*)"
FUNDING_PAREN_STRIP = r"（.*?）"
DURATION_PATTERN = (
    r"(?:计划)?工期[：:\s]*([\d一二三四五六七八九十百]+[年月天日]{1,2}"
    r"(?:（[\d一二三四五六七八九十百]+[日历天日]{1,2}）)?)"
)
PROFESSION_PATTERN = r"((?:[一二三壹贰叁]级)?建造师)"
QUALIFICATION_GROUP_PATTERN = "(" + _QUAL_PATTERN + ")"


def title_suffix_trim(title: Column) -> Column:
    """Strip a trailing '招标公告' (P3, bid_info.py:101-102 — `title[:-4]`
    byte-equal via substring arithmetic)."""
    return F.when(
        title.endswith("招标公告"),
        F.substring(title, F.lit(1), F.length(title) - 4),
    ).otherwise(title)


def is_number(col: Column) -> Column:
    """Safe float-castable test (F3, util.py:68-73). ``try_cast`` yields
    NULL on malformed input in EVERY session — matching try/except
    float() — where a plain cast would throw under ANSI mode (the
    driver harness runs its own ANSI-on session)."""
    return col.try_cast("double").isNotNull()


def to_number(col: Column) -> Column:
    """Session-independent numeric parse: NULL on malformed input (the
    value-producing twin of ``is_number`` — use it instead of
    guard-then-cast, which still throws under ANSI because WHEN does not
    short-circuit evaluation of the other branch's cast)."""
    return col.try_cast("double")


def extract_url_from_click(onclick: Column) -> Column:
    """3rd showDetail(...) arg prefixed with the ggzy information base
    (F4, util.py:76-86). NULL when no match, like the reference's None."""
    pattern = r"showDetail\(\s*[^,]+,\s*'[^']*',\s*'([^']*)'\s*\)"
    extracted = F.regexp_extract(onclick, pattern, 1)
    has = onclick.rlike(r"showDetail\(\s*[^,]+,\s*'[^']*',\s*'[^']*'\s*\)")
    return F.when(has, F.concat(F.lit("https://www.ggzy.gov.cn/information"), extracted))


def extract_funding_source(text: Column) -> Column:
    """Text after 资金来源/资金来自, full-width parens stripped, trimmed
    (F5, util.py:88-95). Empty string when absent."""
    raw = F.regexp_extract(text, FUNDING_PATTERN, 1)
    return F.trim(F.regexp_replace(raw, FUNDING_PAREN_STRIP, ""))


def extract_duration(text: Column) -> Column:
    """工期/计划工期 value with digits/Chinese numerals + unit
    (F6, util.py:97-103)."""
    return F.regexp_extract(text, DURATION_PATTERN, 1)


def extract_construction_qualification(text: Column) -> Column:
    """All '{category}施工总承包{grade}级' matches as an array
    (F7, util.py:106-112) — `regexp_extract_all`, order-preserving."""
    return F.regexp_extract_all(text, F.lit(QUALIFICATION_GROUP_PATTERN), 1)


def extract_profession_and_level(text: Column) -> Column:
    """First '[一二三壹贰叁]级?建造师' match, '' when absent
    (F8, util.py:116-121)."""
    return F.regexp_extract(text, PROFESSION_PATTERN, 1)


def split_colon_field(text: Column, index: int = 1) -> Column:
    """`text.split('：')[index]` (F12, bid_info.py:134,218-225)."""
    return F.split(text, "：").getItem(index)


def multi_format_timestamp(col: Column) -> Column:
    """Try 4 datetime formats in order, NULL if none parse
    (F18, winner_bid.py:69-78). Returned as TIMESTAMP_NTZ: the reference
    stores naive wall-clock datetimes, so the value must not shift with
    any session/collect timezone."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(col, F.lit("yyyy/MM/dd HH:mm:ss")),
        F.try_to_timestamp(col, F.lit("yyyy/MM/dd")),
    ).cast("timestamp_ntz")


def cookie_to_map(cookie: Column) -> Column:
    """Cookie string → map via ';' then '=' (F17, bid_notice.py:11-20).

    Reference-faithful on the two semantics that matter: each pair is
    split on its FIRST '=' only (``pair.split('=', 1)`` — a base64
    value's '=' padding survives intact), and pairs WITHOUT '=' are
    dropped entirely (the ``if '=' in pair`` guard), which also drops
    the empty segment a trailing ';' produces. Keys/values are trimmed
    (documented normalization; the reference's cookies carry no spaces
    around '=', so this never diverges on reference data)."""
    pairs = F.filter(F.split(cookie, ";"), lambda p: F.instr(p, "=") > 0)
    kv = F.transform(pairs, lambda p: F.split(p, "=", 2))
    return F.map_from_arrays(
        F.transform(kv, lambda a: F.trim(a.getItem(0))),
        F.transform(kv, lambda a: F.trim(a.getItem(1))),
    )


# USCI chars [2:4] → province (F11, /root/reference/xizang/pipelines.py:20-56;
# the mapping itself is the public GB/T 2260 administrative-division table).
USCI_PROVINCE = {
    "11": "北京", "12": "天津", "13": "河北", "14": "山西", "15": "内蒙古",
    "21": "辽宁", "22": "吉林", "23": "黑龙江",
    "31": "上海", "32": "江苏", "33": "浙江", "34": "安徽", "35": "福建",
    "36": "江西", "37": "山东",
    "41": "河南", "42": "湖北", "43": "湖南", "44": "广东", "45": "广西",
    "46": "海南",
    "50": "重庆", "51": "四川", "52": "贵州", "53": "云南", "54": "西藏",
    "61": "陕西", "62": "甘肃", "63": "青海", "64": "宁夏", "65": "新疆",
}


def province_from_usci(usci: Column) -> Column:
    """USCI code chars [2:4] → province name via a literal map lookup —
    constant-folded by Catalyst, no join, no UDF."""
    entries = []
    for k, v in USCI_PROVINCE.items():
        entries.extend([F.lit(k), F.lit(v)])
    return F.element_at(F.create_map(*entries), F.substring(usci, 3, 2))
