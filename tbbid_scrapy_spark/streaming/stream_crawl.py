"""Structured Streaming front-end for the engine (SURVEY.md §2.11 C10).

The wave-batch loop in plans/crawl.py is the primary design (the
reference's crawl has no event-time semantics to require a stream), but
the engine also runs as a stream for deployments where pages arrive
continuously (e.g. a fetch fleet writing parquet into a landing dir):

- ``stream_extract``    : readStream over landing documents → the same
  span-explode parse used by the batch path → append sink. Exactly-once
  via the streaming checkpoint; the parse logic is shared code.
- ``stream_metrics``    : event-time windowed fetch metrics with a
  watermark (late pages beyond the watermark are dropped — the streaming
  analog of the per-wave metrics table A7).
- ``stream_host_state`` : applyInPandasWithState — running per-host page
  count + last-seen timestamp (the politeness ledger as a custom
  stateful operator).
- ``stream_crawl_foreachBatch`` : micro-batch bridge — each incoming
  batch of discovered URLs is deduped against the seen table and
  appended to the frontier using the same operators as the batch loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tbbid_scrapy_spark import schemas


def stream_extract(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: T.StructType | None = None,
):
    """Landing parquet documents → exploded span rows, append-mode.
    Returns the StreamingQuery (caller awaits/stops). Trigger availableNow
    drains what exists then stops — used by tests; a deployment would run
    continuous micro-batches with the same call."""
    sch = schema or schemas.DOCUMENTS
    stream = spark.readStream.schema(sch).parquet(landing_dir)
    exploded = stream.select(
        "doc_id",
        "page_kind",
        "host",
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        "page_kind",
        "host",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    return (
        exploded.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_metrics(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: T.StructType,
    window_minutes: int = 10,
    watermark_minutes: int = 30,
):
    """Event-time windowed page counts per host with a watermark. The
    landing schema must carry ``fetched_at timestamp``."""
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    agg = (
        stream.withWatermark("fetched_at", f"{watermark_minutes} minutes")
        .groupBy(
            F.window("fetched_at", f"{window_minutes} minutes").alias("w"),
            "host",
        )
        .agg(F.count("*").alias("pages"), F.sum(F.size("spans")).alias("spans"))
        .select(F.col("w.start").alias("window_start"), "host", "pages", "spans")
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


_HOST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("total_pages", T.LongType(), False),
        T.StructField("batch_pages", T.LongType(), False),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType(), False)])


def _host_state_fn(key, pdf_iter, state: GroupState):
    import pandas as pd

    n = 0
    for pdf in pdf_iter:
        n += len(pdf)
    (total,) = state.get if state.exists else (0,)
    total += n
    state.update((total,))
    yield pd.DataFrame(
        {"host": [key[0]], "total_pages": [total], "batch_pages": [n]}
    )


def stream_host_state(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: T.StructType | None = None,
):
    """Custom stateful operator (applyInPandasWithState): cumulative
    per-host page counts across micro-batches — the politeness ledger."""
    sch = schema or schemas.DOCUMENTS
    stream = spark.readStream.schema(sch).parquet(landing_dir)
    counted = stream.groupBy("host").applyInPandasWithState(
        _host_state_fn,
        outputStructType=_HOST_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # parquet sink can't do update mode → append each micro-batch's updates
    # via foreachBatch (standard pattern for stateful update → file sink)
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    return (
        counted.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def stream_frontier_foreachBatch(
    spark: SparkSession,
    url_stream: DataFrame,
    seen_table_path: str,
    frontier_out_path: str,
    checkpoint_dir: str,
):
    """Micro-batch frontier maintenance: each batch of raw discovered URLs
    is canonicalized, deduped against the persistent seen table, and the
    novel remainder appended to frontier + seen — the same operator
    composition as plans/crawl.py, driven by a stream."""
    from tbbid_scrapy_spark.functions.urls import with_url_norm

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        norm = with_url_norm(batch_df).dropDuplicates(["url_hash"])
        # First-batch bootstrap: probe the seen table's EXISTENCE directly
        # (Hadoop FileSystem — works for file://, hdfs://, s3a:// alike)
        # instead of substring-matching AnalysisException messages, whose
        # wording varies across Spark versions/locales. Only a confirmed
        # missing table may disable dedup; ANY read failure on an existing
        # table propagates so the batch retries — swallowing it would
        # re-enqueue every already-crawled URL in the batch (re-crawl
        # storm). No writer race: the seen table is appended only by this
        # query's own sequential batches.
        jvm = s._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(seen_table_path)
        fs = hpath.getFileSystem(s._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            seen = s.read.parquet(seen_table_path)
            novel = norm.join(seen.select("url_hash"), "url_hash", "left_anti")
        else:
            novel = norm
        # Pin `novel` before writing: the two appends must see the SAME
        # snapshot (the second action would otherwise re-read a seen table
        # that now contains the first write's rows).
        novel = novel.persist()
        try:
            # Frontier FIRST, seen second. A failure between the writes then
            # re-delivers the batch with the URLs still absent from `seen`,
            # so the retry re-emits them: duplicate frontier rows (dedup'd
            # downstream on url_hash) instead of URLs marked seen but never
            # enqueued — at-least-once, never silent loss.
            novel.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                frontier_out_path
            )
            novel.select("url_hash", "url_norm").write.mode("append").parquet(
                seen_table_path
            )
        finally:
            novel.unpersist()

    return (
        url_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
