"""Structured Streaming variants + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tbbid_scrapy_spark import schemas
from tbbid_scrapy_spark.fixtures import sitegen
from tbbid_scrapy_spark.operators import multimodal as mm
from tbbid_scrapy_spark.streaming import stream_crawl as sc


@pytest.fixture(scope="module")
def landing(spark, site, tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    rows = [
        (p.doc_id, p.page_kind, p.host,
         [{"kind": k, "text": t, "media_ref": m, "offset": o} for (k, t, m, o) in p.spans])
        for p in site.values()
    ]
    spark.createDataFrame(rows, schemas.DOCUMENTS).write.mode("overwrite").parquet(str(d / "docs"))
    return d


def test_stream_extract_equals_batch(spark, landing, tmp_path):
    q = sc.stream_extract(
        spark, str(landing / "docs"), str(tmp_path / "ck"), str(tmp_path / "out")
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    batch = (
        spark.read.parquet(str(landing / "docs"))
        .select("doc_id", F.explode("spans").alias("s"))
    )
    assert got.count() == batch.count()
    assert got.filter(F.col("kind") == "link").count() == \
        batch.filter(F.col("s.kind") == "link").count()


def test_stream_host_state(spark, landing, tmp_path):
    q = sc.stream_host_state(
        spark, str(landing / "docs"), str(tmp_path / "ck2"), str(tmp_path / "out2")
    )
    q.awaitTermination(120)
    got = {r.host: r.total_pages for r in spark.read.parquet(str(tmp_path / "out2")).collect()}
    exp = (
        spark.read.parquet(str(landing / "docs")).groupBy("host").count().collect()
    )
    for r in exp:
        assert got[r.host] == r["count"]


def test_stream_metrics_watermark(spark, tmp_path):
    sch = T.StructType(
        list(schemas.DOCUMENTS.fields)
        + [T.StructField("fetched_at", T.TimestampType(), False)]
    )
    rows = [
        (f"https://h/{i}", "notice", "h",
         [{"kind": "text", "text": "x", "media_ref": None, "offset": 0}],
         __import__("datetime").datetime(2024, 1, 1, 0, i))
        for i in range(30)
    ]
    d = tmp_path / "landing2"
    spark.createDataFrame(rows, sch).write.parquet(str(d))
    q = sc.stream_metrics(
        spark, str(d), str(tmp_path / "ck3"), str(tmp_path / "out3"), sch,
        window_minutes=10, watermark_minutes=5,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out3"))
    # 30 min of events, 10-min windows, watermark 5 min: max event 00:29 →
    # watermark 00:24 → windows [0,10) and [10,20) are closed and emitted;
    # [20,30) is still open (not below the watermark) and is correctly
    # HELD BACK in append mode — the late-data guarantee under test
    assert got.count() == 2
    assert got.agg(F.sum("pages")).collect()[0][0] == 20
    starts = sorted(r.window_start.minute for r in got.collect())
    assert starts == [0, 10]


def test_stream_frontier_foreachBatch(spark, tmp_path):
    d = tmp_path / "urls"
    urls = [(f"https://h.example.org/p/{i % 7}?x={i % 7}&_=123",) for i in range(20)]
    spark.createDataFrame(urls, "url string").write.parquet(str(d))
    stream = spark.readStream.schema("url string").parquet(str(d))
    q = sc.stream_frontier_foreachBatch(
        spark, stream, str(tmp_path / "seen"), str(tmp_path / "frontier"),
        str(tmp_path / "ck4"),
    )
    q.awaitTermination(120)
    frontier = spark.read.parquet(str(tmp_path / "frontier"))
    # 7 distinct canonical URLs (cache-buster stripped)
    assert frontier.count() == 7
    seen = spark.read.parquet(str(tmp_path / "seen"))
    assert seen.select("url_hash").distinct().count() == 7


def test_stream_frontier_corrupt_seen_table_fails_loudly(spark, tmp_path):
    """A transient/corrupt seen-table read must FAIL the batch (so the
    stream retries with dedup intact), not be swallowed as 'no seen table
    yet' — a blanket except here silently re-enqueues every
    already-crawled URL in the batch (re-crawl storm)."""
    d = tmp_path / "urls"
    spark.createDataFrame(
        [("https://h.example.org/p/1",)], "url string"
    ).write.parquet(str(d))
    seen_dir = tmp_path / "seen"
    seen_dir.mkdir()
    # not a parquet file: the read fails with something OTHER than
    # path-not-found, which must propagate
    (seen_dir / "part-00000.parquet").write_bytes(b"this is not parquet")
    stream = spark.readStream.schema("url string").parquet(str(d))
    q = sc.stream_frontier_foreachBatch(
        spark, stream, str(seen_dir), str(tmp_path / "frontier2"),
        str(tmp_path / "ck5"),
    )
    import pyspark.errors

    with pytest.raises(pyspark.errors.PySparkException):
        q.awaitTermination(120)
    # nothing may have been appended to the frontier on the failed batch
    import os
    fdir = tmp_path / "frontier2"
    assert not fdir.exists() or not [
        f for f in os.listdir(fdir) if f.endswith(".parquet")
    ]


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

def test_decode_roundtrip(spark):
    media = mm.synthetic_media(spark, 60)
    dec = mm.decode_media(media)
    rows = dec.collect()
    assert len(rows) == 60
    for r in rows:
        b = mm.fake_media_bytes(r.media_id, r.kind)
        import struct as st

        w, h, d = st.unpack(">III", b[4:16])
        assert (r.width, r.height, r.duration_ms) == (w, h, d)
        assert r.payload_bytes == 32


def test_decode_malformed_rows_null_not_batch_kill(spark):
    """One bad blob must decode as NULL metadata, never raise and kill
    the whole Arrow batch: null content, short blob, wrong magic, and —
    the r4 ADVICE case — a header whose u32 fields are ≥ 2^31 (valid in
    the 4-byte wire format, unrepresentable in the Int32 output columns;
    previously raised inside the pandas Int32 cast)."""
    import struct as st

    oversized = mm.MAGIC + st.pack(">III", 2**31, 7, 7) + b"p" * 4
    rows = [
        (0, "ok", mm.fake_media_bytes(0, "image")),
        (1, "null", None),
        (2, "short", b"TB"),
        (3, "badmagic", b"XXXX" + st.pack(">III", 1, 2, 3)),
        (4, "oversized", oversized),
        (5, "ok2", mm.fake_media_bytes(5, "audio")),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, tag string, content binary")
    media = (
        df.withColumn("doc_id", F.lit(None).cast("string"))
        .withColumn("media_ref", F.lit(None).cast("string"))
        .withColumn("kind", F.lit("image"))
        .withColumn("mime", F.lit(None).cast("string"))
        .select("media_id", "doc_id", "media_ref", "kind", "content", "mime")
    )
    out = {r.media_id: r for r in mm.decode_media(media).collect()}
    assert len(out) == 6  # the batch survived every bad row
    for bad in (1, 2, 3, 4):
        r = out[bad]
        assert (r.width, r.height, r.duration_ms) == (None, None, None)
    assert out[0].width is not None and out[5].width is not None
    # payload_bytes stays NULL for the invalid-header rows too
    assert out[4].payload_bytes is None


def test_decode_real_backend_is_stubbed(spark):
    media = mm.synthetic_media(spark, 1)
    with pytest.raises(NotImplementedError):
        mm.decode_media(media, backend="pil")


def test_resize_and_frames(spark):
    dec = mm.decode_media(mm.synthetic_media(spark, 60))
    rs = mm.resize_images(dec.filter(F.col("kind") == "image"), max_side=128)
    for r in rs.collect():
        assert max(r.target_width, r.target_height) <= 128
        assert r.target_width > 0 and r.target_height > 0
    frames = mm.sample_frames(dec, every_ms=5000)
    one = frames.groupBy("media_id").agg(F.count("*").alias("n"),
                                         F.max("duration_ms").alias("d")).collect()
    for r in one:
        assert r.n == r.d // 5000 + 1


def test_media_features_unit_norm(spark):
    import numpy as np

    feats = mm.media_features(mm.synthetic_media(spark, 30)).select("features").collect()
    for r in feats:
        v = np.array(r.features)
        assert v.shape == (mm.FEATURE_DIM,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
