"""JSON-API source extraction — the bid_notice.py / national_bid_list.py
family (SURVEY.md S2/S6/S7/P9/J4/F18/F21).

API pages carry one text span holding the JSON payload. Extraction is
fully declarative: ``from_json`` with an explicit schema (S2 — never
schema inference on a crawl path), a ``success``/non-empty guard (P9),
``explode`` of the data array, multi-format timestamp parsing (F18), and
the broadcast cities-dimension join on substring(area_code,1,4)
(S9/J4 — replaces the reference's per-row linear rescan of cities.json,
bid_notice.py:105-116). Pagination is already handled by the crawl graph
(page 1 links pages 2..total//rows+1 — O3/F21).

Pure-Python twin: fixtures/ref_items.expected_api_items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tbbid_scrapy_spark.functions.extract import multi_format_timestamp

API_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("success", T.BooleanType()),
        T.StructField("total", T.LongType()),
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("projectName", T.StringType()),
                        T.StructField("corpCode", T.StringType()),
                        T.StructField("bidderName", T.StringType()),
                        T.StructField("areaCode", T.StringType()),
                        T.StructField("winAmt", T.DoubleType()),
                        T.StructField("createTime", T.StringType()),
                        T.StructField("tos", T.StringType()),
                        T.StructField("tenderOrgName", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def api_winner_items(extracted: DataFrame, cities: DataFrame) -> DataFrame:
    """winner_bid_info rows from API list pages, city name resolved via
    the broadcast dimension (unmatched prefixes → NULL city)."""
    bodies = extracted.filter(
        F.col("doc_id").contains("/api/list") & (F.col("kind") == "text")
    ).select("doc_id", F.from_json("text", API_PAYLOAD_SCHEMA).alias("p"))
    ok = bodies.filter(
        F.col("p.success") & (F.size("p.data") > 0)  # P9 guards
    )
    rows = ok.select(F.explode("p.data").alias("d")).select(
        F.col("d.corpCode").alias("corp_code"),
        F.col("d.projectName").alias("project_name"),
        F.col("d.bidderName").alias("bidder_name"),
        F.col("d.areaCode").alias("area_code"),
        F.col("d.winAmt").alias("win_amt"),
        multi_format_timestamp(F.col("d.createTime")).alias("create_time"),
        F.col("d.tenderOrgName").alias("tender_org_name"),
        F.col("d.tos").alias("tos"),
    )
    dim = cities.select(F.col("code").alias("_code"), F.col("name").alias("city_name"))
    return rows.join(
        F.broadcast(dim), F.substring("area_code", 1, 4) == F.col("_code"), "left"
    ).drop("_code")
