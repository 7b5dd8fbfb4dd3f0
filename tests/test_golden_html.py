"""F9/F10 parity on the reference repo's ONLY real golden input —
``xizang/tests/test.html`` (an actual 招标公告 notice page captured from
the ggzy portal; SURVEY §5.4).

Every other HTML-parity test runs on synthetic well-formed markup from
``fixtures.sitegen`` — circular for ``remove_script_tags``, whose regex
is a stand-in for BeautifulSoup (env waiver: no bs4 in this container,
functions/html.py). These tests pin the stand-in against the one real
page available:

1. the regex <script> strip is byte-equal to a STRICT parse-and-excise
   using the stdlib ``html.parser`` state machine (which handles the
   cases regexes classically get wrong: attributes, CDATA-mode content,
   ``</script >`` spellings);
2. the five extracted notice fields (F10, util.py:133-147) are
   non-vacuous on this page and identical between the Spark column path
   (``analyse_notice_cols``) and the pure-Python twin patterns — and
   pinned to literal expected values so a regression is visible as a
   diff, not just an inequality.
"""

from __future__ import annotations

import os
import re
from html.parser import HTMLParser

import pytest
from pyspark.sql import functions as F

from tbbid_scrapy_spark.functions.extract import (
    DURATION_PATTERN,
    FUNDING_PAREN_STRIP,
    FUNDING_PATTERN,
    PROFESSION_PATTERN,
    QUALIFICATION_GROUP_PATTERN,
)
from tbbid_scrapy_spark.functions.html import (
    analyse_notice_cols,
    remove_script_tags_py,
)

GOLDEN = "/root/reference/xizang/tests/test.html"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden page not present"
)

# literal expectations, computed once from the golden page and frozen —
# the page is a real-world notice, so these double as a regression diff
EXPECTED = {
    "construction_funds": "为国家投资",
    "project_duration": "154日",
    "person_req": "建造师",
    "company_req": ["水利水电工程施工总承包叁级"],
}


def _golden_text() -> str:
    with open(GOLDEN, encoding="utf-8") as f:
        return f.read()


class _ScriptSpans(HTMLParser):
    """Strict parse: record (start, end) character spans of every
    <script>...</script> element so they can be excised from the
    ORIGINAL text in place (no re-serialization — directly comparable
    to the regex strip, unlike BeautifulSoup's ``str(soup)``)."""

    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.spans: list[tuple[tuple[int, int], tuple[int, int]]] = []
        self._open: tuple[int, int] | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "script" and self._open is None:
            self._open = self.getpos()

    def handle_endtag(self, tag):
        if tag == "script" and self._open is not None:
            self.spans.append((self._open, self.getpos()))
            self._open = None


def _strict_strip(raw: str) -> str:
    parser = _ScriptSpans()
    parser.feed(raw)
    parser.close()
    line_starts = [0]
    for line in raw.split("\n"):
        line_starts.append(line_starts[-1] + len(line) + 1)

    def abs_off(pos: tuple[int, int]) -> int:
        line, col = pos
        return line_starts[line - 1] + col

    out = raw
    for start, end in reversed(parser.spans):
        a = abs_off(start)
        # endtag pos is the START of '</script...'; consume through '>'
        b = raw.index(">", abs_off(end)) + 1
        out = out[:a] + out[b:]
    return out


def test_regex_strip_equals_strict_parse_on_golden_page():
    raw = _golden_text()
    assert raw.lower().count("<script") == 3  # the page really has scripts
    assert remove_script_tags_py(raw) == _strict_strip(raw)


def test_python_twin_fields_on_golden_page():
    pure = remove_script_tags_py(_golden_text())
    m = re.search(FUNDING_PATTERN, pure)
    funds = re.sub(FUNDING_PAREN_STRIP, "", m.group(1)).strip() if m else ""
    md = re.search(DURATION_PATTERN, pure)
    mp = re.search(PROFESSION_PATTERN, pure)
    quals = re.findall(QUALIFICATION_GROUP_PATTERN, pure)
    assert funds == EXPECTED["construction_funds"]
    assert (md.group(1) if md else "") == EXPECTED["project_duration"]
    assert (mp.group(0) if mp else "") == EXPECTED["person_req"]
    assert quals == EXPECTED["company_req"]


def test_spark_analysis_matches_twin_on_golden_page(spark):
    raw = _golden_text()
    df = spark.createDataFrame([(raw,)], "notice_html string")
    cols = analyse_notice_cols(F.col("notice_html"))
    row = df.select(
        cols["notice_content"].alias("notice_content"),
        cols["construction_funds"].alias("construction_funds"),
        cols["project_duration"].alias("project_duration"),
        cols["company_req"].alias("company_req"),
        cols["person_req"].alias("person_req"),
    ).collect()[0]
    assert row.notice_content == remove_script_tags_py(raw)
    assert row.construction_funds == EXPECTED["construction_funds"]
    assert row.project_duration == EXPECTED["project_duration"]
    assert row.person_req == EXPECTED["person_req"]
    assert list(row.company_req) == EXPECTED["company_req"]
