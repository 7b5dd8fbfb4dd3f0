"""Scalar function library (SURVEY.md §2.8).

Built-in Catalyst expressions wherever a primitive exists (regexp, split,
trim, date parsing, map/array ops — all JVM-side, whole-stage-codegen'd);
Arrow-vectorized pandas UDFs only for URL canonicalization, Chinese
numerals, and HTML script-stripping, where no built-in applies.
Never row-at-a-time ``F.udf`` (enforced by tests/test_no_row_udf.py).
"""

from tbbid_scrapy_spark.functions.chinese import (
    chinese_to_arabic_pd,
    chinese_to_arabic_py,
    extract_section_number,
)
from tbbid_scrapy_spark.functions.extract import (
    cookie_to_map,
    extract_construction_qualification,
    extract_duration,
    extract_funding_source,
    extract_profession_and_level,
    extract_url_from_click,
    is_number,
    multi_format_timestamp,
    province_from_usci,
    split_colon_field,
    title_suffix_trim,
)
from tbbid_scrapy_spark.functions.html import analyse_notice_cols, remove_script_tags_pd
from tbbid_scrapy_spark.functions.urls import canonicalize_url_pd, url_hash_col, with_url_norm

__all__ = [
    "analyse_notice_cols",
    "canonicalize_url_pd",
    "chinese_to_arabic_pd",
    "chinese_to_arabic_py",
    "cookie_to_map",
    "extract_construction_qualification",
    "extract_duration",
    "extract_funding_source",
    "extract_profession_and_level",
    "extract_section_number",
    "extract_url_from_click",
    "is_number",
    "multi_format_timestamp",
    "province_from_usci",
    "remove_script_tags_pd",
    "split_colon_field",
    "title_suffix_trim",
    "url_hash_col",
    "with_url_norm",
]
