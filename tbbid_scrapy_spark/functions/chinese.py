"""Chinese-numeral conversion + section-number extraction.

Behavioral parity targets (no code copied; semantics pinned by tests):
- ``chinese_to_arabic``  : /root/reference/xizang/utils/util.py:22-48
  (simplified + traditional digits, 1-99, 十-compounds; -1 on failure;
  bare digit strings accumulate positionally).
- ``extract_section_number_str`` : /root/reference/xizang/utils/util.py:50-65
  including the reference quirk at util.py:62-63 — in the Chinese-numeral
  branch the formatted value is returned ONLY when conversion failed
  (num == -1 → '-01'); a successful conversion falls through to '001'.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DIGITS = {
    "零": 0, "〇": 0,
    "一": 1, "壹": 1,
    "二": 2, "贰": 2, "貳": 2,
    "三": 3, "叁": 3, "參": 3,
    "四": 4, "肆": 4,
    "五": 5, "伍": 5,
    "六": 6, "陆": 6, "陸": 6,
    "七": 7, "柒": 7,
    "八": 8, "捌": 8,
    "九": 9, "玖": 9,
    "十": 10, "拾": 10,
}


def chinese_to_arabic_py(s: str | None) -> int:
    """Pure-Python reference semantics (used inside the Arrow batch UDF and
    by the fixture simulator so engine and oracle share one definition)."""
    if not s:
        return -1
    if "十" in s or "拾" in s:
        s = s.replace("拾", "十")
        head, _, tail = s.partition("十")
        total = 10 if head == "" else _DIGITS.get(head, 0) * 10
        if tail:
            total += _DIGITS.get(tail, 0)
        return total
    total = 0
    for ch in s:
        if ch not in _DIGITS:
            return -1
        total = total * 10 + _DIGITS[ch]
    return total


_DIGIT_SIMPLE = ["零", "一", "二", "三", "四", "五", "六", "七", "八", "九"]
_DIGIT_TRAD = ["零", "壹", "贰", "叁", "肆", "伍", "陆", "柒", "捌", "玖"]


def arabic_to_chinese(n: int) -> str:
    """Inverse generator for 1-99 (fixture/oracle side): renders n as a
    Chinese numeral ``chinese_to_arabic_py`` must map back to n. Variant
    coverage: traditional digits for odd n, '拾' instead of '十' when
    n % 3 == 0 — so a round-trip query exercises the full character map,
    both tens spellings, and every compound shape (十X, X十, X十Y)."""
    assert 1 <= n <= 99
    digits = _DIGIT_TRAD if n % 2 == 1 else _DIGIT_SIMPLE
    ten = "拾" if n % 3 == 0 else "十"
    tens, ones = divmod(n, 10)
    if tens == 0:
        return digits[ones]
    head = "" if tens == 1 else digits[tens]
    tail = digits[ones] if ones else ""
    return head + ten + tail


@F.pandas_udf(T.IntegerType())
def chinese_to_arabic_pd(s: pd.Series) -> pd.Series:
    """Arrow-vectorized Chinese-numeral → int (F1)."""
    return s.map(chinese_to_arabic_py).astype("int32")


def extract_section_number(title: Column) -> Column:
    """Section id as zero-padded 3-char string (F2).

    Arabic branch is pure Catalyst (`regexp_extract` + `format_string`,
    which like Python's %03d pads-without-truncating — `lpad` would
    truncate a 4+ digit section number); the Chinese
    branch needs the numeral UDF. The reference bug is replicated: a
    *parseable* Chinese numeral falls through to '001'; an unparseable one
    returns '-01' (Python's ``f"{-1:03d}"``).
    """
    digit = F.regexp_extract(title, r"项目\((\d+)标段\)", 1)
    chinese_raw = F.regexp_extract(title, r"总承包(.*?)标段", 1)
    has_chinese_match = title.rlike("总承包.*?标段")
    num = chinese_to_arabic_pd(chinese_raw)
    # try_cast, not cast: under an ANSI-on session a digit run that
    # overflows int32 (or the '' of a non-matching title, if the branch
    # is ever evaluated eagerly) would raise and kill the job; overflow
    # falls through to the default like any other unparseable section.
    digit_int = digit.try_cast("int")
    return (
        F.when((digit != "") & digit_int.isNotNull(),
               F.format_string("%03d", digit_int))
        .when(has_chinese_match & (num == F.lit(-1)), F.lit("-01"))
        .otherwise(F.lit("001"))
    )
