"""Distributed synthetic site generator (bench-scale).

Same document schema and URL scheme as fixtures/sitegen.py but built
entirely from Spark expressions over ``spark.range`` — no driver-side
object graph — so benchmark sites of 10^5-10^7 pages materialize in
seconds and the generation itself scales with the cluster. Used by the
scaling benchmark, where wave widths must be large enough that per-URL
compute (canonicalization, explode, extraction, bloom) dominates the
fixed per-wave cost; the pure-Python generator remains the parity
fixture (it must match the simulator byte-for-byte).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tbbid_scrapy_spark import schemas
from tbbid_scrapy_spark.fixtures.sitegen import COLD_HOSTS, HOT_HOST

SITE_SCHEMA = T.StructType(
    list(schemas.DOCUMENTS.fields)
    + [T.StructField("fail_first", T.IntegerType(), False)]
)


def _span(kind, text, media_ref, offset):
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


def _null_s():
    return F.lit(None).cast("string")


def build_site_df(
    spark: SparkSession,
    n_listing_pages: int = 4,
    projects_per_listing: int = 1000,
    extra_text_spans: int = 10,
    cold_every: int = 7,
) -> DataFrame:
    """listing → stage → {notice, bids, candidates} graph, hot-host skewed
    like the parity fixture (≥80 % of pages on one host)."""
    P = projects_per_listing

    # ---------- project dimension (computed identically everywhere) ------
    proj = spark.range(1, n_listing_pages * P + 1).select(
        F.col("id").alias("pn"),
        F.format_string("XZ2024%05d", F.col("id")).alias("pid"),
        ((F.col("id") - 1) / P + 1).cast("int").alias("lp"),
    ).withColumn(
        "host",
        F.when(
            F.col("pn") % cold_every == 0,
            F.element_at(
                F.array(*[F.lit(h) for h in COLD_HOSTS]),
                (F.pmod(F.xxhash64("pid"), F.lit(len(COLD_HOSTS))) + 1).cast("int"),
            ),
        ).otherwise(F.lit(HOT_HOST)),
    ).withColumn(
        "title", F.concat(F.lit("某某工程项目("), (F.col("pn") % 97 + 1).cast("string"),
                          F.lit("标段)招标公告")),
    )

    # ---------- listing pages -------------------------------------------
    def listing_url(lp):
        return F.format_string(
            f"https://{HOT_HOST}/listing?page=%d&province=540000", lp.cast("int")
        )

    proj_links = proj.groupBy("lp").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pn"), F.col("title"), F.col("host"), F.col("pid")))
            ),
            lambda s: F.struct(
                F.lit("link").alias("kind"),
                s["title"].alias("text"),
                F.concat(F.lit("https://"), s["host"], F.lit("/project/"), s["pid"]).alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            ),
        ).alias("plinks")
    )
    listings = proj_links.select(
        listing_url(F.col("lp")).alias("doc_id"),
        F.lit("listing").alias("page_kind"),
        F.lit(HOT_HOST).alias("host"),
        F.col("lp"),
        F.col("plinks"),
    ).withColumn(
        "spans",
        F.concat(
            F.array(
                _span(F.lit("title"),
                      F.format_string("招标公告列表 第%d页", F.col("lp")),
                      _null_s(), F.lit(0))
            ),
            F.col("plinks"),
            F.when(
                F.col("lp") < n_listing_pages,
                F.array(
                    _span(F.lit("link"), F.lit("下一页"),
                          listing_url(F.col("lp") + 1), F.lit(0))
                ),
            ).otherwise(F.array()),
        ),
    ).withColumn(
        # re-number offsets 0..n-1 in order
        "spans",
        F.transform(
            F.col("spans"),
            lambda s, i: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"), i.cast("int").alias("offset"),
            ),
        ),
    ).select("doc_id", "page_kind", "host", "spans", F.lit(0).alias("fail_first"))

    # ---------- stage pages ---------------------------------------------
    def child(kind_path):
        return F.concat(F.lit("https://"), F.col("host"), F.lit(f"/{kind_path}/"), F.col("pid"))

    stages = proj.select(
        child("project").alias("doc_id"),
        F.lit("stage").alias("page_kind"),
        "host",
        F.transform(
            F.array(
                _span(F.lit("table_cell"), F.concat(F.lit("项目编号："), F.col("pid")), _null_s(), F.lit(0)),
                _span(F.lit("link"), F.lit("招标公告"), child("notice"), F.lit(0)),
                _span(F.lit("link"), F.lit("开标记录"), child("bids"), F.lit(0)),
                _span(F.lit("link"), F.lit("中标候选人公示"), child("candidates"), F.lit(0)),
                _span(F.lit("media"), _null_s(), F.lit("https://static.example.org/logo.png"), F.lit(0)),
            ),
            lambda s, i: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"), i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
        F.lit(0).alias("fail_first"),
    )

    # ---------- notice pages (text-heavy: the parse workload) ------------
    body = F.concat(
        F.lit("<html><body><script>var x=1;</script><p>资金来源：政府投资。</p>"
              "<p>计划工期："),
        (F.col("pn") % 300 + 30).cast("string"),
        F.lit("天。</p><p>资质要求：房屋建筑工程施工总承包"),
        F.element_at(F.array(F.lit("一"), F.lit("贰"), F.lit("特")),
                     (F.col("pn") % 3 + 1).cast("int")),
        F.lit("级。项目负责人须一级建造师。</p></body></html>"),
    )
    # NOTE: guard the empty case — Spark's sequence(1, 0) generates a
    # DESCENDING [1, 0] (implicit step -1), which would emit 2 filler
    # spans when the caller asked for none. Resolved Python-side so no
    # empty-array literal needs type coercion into the span struct.
    filler = None if extra_text_spans <= 0 else F.transform(
        F.sequence(F.lit(1), F.lit(extra_text_spans)),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.concat(F.lit("补充说明第"), i.cast("string"), F.lit("段："),
                     F.repeat(F.lit("条款内容 "), 40)).alias("text"),
            _null_s().alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        ),
    )
    notices = proj.select(
        child("notice").alias("doc_id"),
        F.lit("notice").alias("page_kind"),
        "host",
        F.concat(
            *[
                a
                for a in (
                    F.array(
                        _span(F.lit("title"), F.col("title"), _null_s(), F.lit(0)),
                        _span(F.lit("text"), body, _null_s(), F.lit(0)),
                    ),
                    filler,
                    F.array(
                        _span(F.lit("media"), _null_s(),
                              F.concat(F.lit("https://static.example.org/img_"),
                                       F.col("pid"), F.lit(".jpg")),
                              F.lit(0))
                    ),
                )
                if a is not None
            ]
        ).alias("spans"),
        F.lit(0).alias("fail_first"),
    ).withColumn(
        "spans",
        F.transform(
            F.col("spans"),
            lambda s, i: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"), i.cast("int").alias("offset"),
            ),
        ),
    )

    # ---------- bids pages -----------------------------------------------
    bidders = F.transform(
        F.sequence(F.lit(0), (F.col("pn") % 3 + 1).cast("int")),
        lambda b: F.array(
            F.struct(F.lit("table_cell").alias("kind"),
                     F.concat(F.lit("建工集团"), F.pmod(F.col("pn") + b, F.lit(50)).cast("string"), F.lit("公司")).alias("text"),
                     _null_s().alias("media_ref"), F.lit(0).cast("int").alias("offset")),
            F.struct(F.lit("table_cell").alias("kind"),
                     (F.lit(1000) + F.pmod(F.col("pn") * 7 + b, F.lit(9000))).cast("string").alias("text"),
                     _null_s().alias("media_ref"), F.lit(0).cast("int").alias("offset")),
        ),
    )
    bids = proj.select(
        child("bids").alias("doc_id"),
        F.lit("bids").alias("page_kind"),
        "host",
        F.concat(
            F.array(
                _span(F.lit("table_cell"), F.lit("投标人"), _null_s(), F.lit(0)),
                _span(F.lit("table_cell"), F.lit("控制价"), _null_s(), F.lit(0)),
            ),
            F.flatten(bidders),
        ).alias("spans"),
        F.lit(0).alias("fail_first"),
    ).withColumn(
        "spans",
        F.transform(
            F.col("spans"),
            lambda s, i: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"), i.cast("int").alias("offset"),
            ),
        ),
    )

    # ---------- candidates pages ------------------------------------------
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda c: F.struct(
            F.lit("table_cell").alias("kind"),
            F.when(c == 0, F.concat(F.lit("建工集团"), F.pmod(F.col("pn"), F.lit(50)).cast("string"), F.lit("公司")))
            .when(c == 3, F.concat(F.lit("项目经理"), F.pmod(F.col("pn"), F.lit(30)).cast("string")))
            .when(c == 6, (F.lit(900) + F.pmod(F.col("pn"), F.lit(800))).cast("string"))
            .otherwise(F.concat(F.lit("—"), c.cast("string"))).alias("text"),
            _null_s().alias("media_ref"),
            c.cast("int").alias("offset"),
        ),
    )
    candidates = proj.select(
        child("candidates").alias("doc_id"),
        F.lit("candidates").alias("page_kind"),
        "host",
        cells.alias("spans"),
        F.lit(0).alias("fail_first"),
    )

    return (
        listings.select("doc_id", "page_kind", "host", "spans", "fail_first")
        .unionByName(stages)
        .unionByName(notices)
        .unionByName(bids)
        .unionByName(candidates)
    )
