"""The crawl wave loop — partition-parallel frontier expansion.

Re-expresses the reference's asynchronous callback crawl
(/root/reference/xizang/spiders/bid_info.py and friends; SURVEY.md §3) as
a driver-side loop over declarative DataFrame waves:

    wave w:
      1. batch    = politeness-ranked slice of pending frontier rows
      2. order    = global fetch order (priority desc, discovery wave, seq)
                    — distributed dense index, no single-task window
      3. fetch    = equi-join batch ↔ site documents on canonical URL
                    (the sandbox 'fetch' — a real deployment swaps in an
                    HTTP mapInPandas with the same row contract)
      4. states   = fetched / failed / retry (attempts+1, 5xx only,
                    ≤3 attempts — settings.py:77-79 semantics)
      5. parse    = explode spans of 200-pages; links (listing pages in
                    REVERSE span order — bid_info.py:90) become children
      6. children = resolve+canonicalize (Arrow UDF) → robots filter →
                    in-batch first-discovery dedup → seen-set dedup
                    (exact | bloom | hybrid) → dense seq → append pending
      7. commit   = atomic snapshot of {frontier, seen, shards, log,
                    extracted} → lossless resume point

Performance discipline: each wave materializes exactly two intermediates
(the fetched batch and the new children — both needed by several
downstream branches), tracks the global sequence counter on the driver
(an int, not an agg job), and takes row counts from the dense-index pass
that already ran — so a wave is a fixed small number of jobs regardless
of frontier size, and every job is shuffle-parallel.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tbbid_scrapy_spark.fixtures.sitegen import PRIORITY_BY_KIND
from tbbid_scrapy_spark.functions.urls import resolve_and_canonicalize_pd, with_url_norm
from tbbid_scrapy_spark.operators import frontier as fops
from tbbid_scrapy_spark.operators.bloom import BloomSpec, bloom_insert, bloom_test, empty_shards
from tbbid_scrapy_spark.plans.seq import dense_index
from tbbid_scrapy_spark.sources.sink import SnapshotTable

RETRY_LIMIT = 3
RETRYABLE = [403, 500, 502, 503, 504, 522, 524, 408, 429]

FETCH_LOG_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("fetch_pos", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("urls_scheduled", T.LongType(), False),
        T.StructField("fetched_ok", T.LongType(), False),
        T.StructField("failed_404", T.LongType(), False),
        T.StructField("retried_5xx", T.LongType(), False),
        T.StructField("spans_extracted", T.LongType(), False),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)


@dataclass
class CrawlConfig:
    max_waves: int = 100
    default_budget: int = 4  # CONCURRENT_REQUESTS_PER_DOMAIN, settings.py:29
    seen_mode: str = "exact"  # exact | bloom | hybrid
    bloom_spec: BloomSpec | None = None
    checkpoint_dir: str | None = None
    salt_buckets: int = 64
    num_partitions: int | None = None
    # seq_mode 'packed': children enqueue keys are computed per-row as
    # (wave+1)<<47 | parent_pos<<17 | (eff_pos + 2^16) — order-isomorphic
    # to the simulator's dense counter (scheduling only ever compares seq,
    # never assumes density), with zero sort/collect per wave. Bounds:
    # ≤32766 waves, <2^30 fetches/wave, <2^16 spans/page — beyond them use
    # 'dense' (two-pass distributed dense index).
    seq_mode: str = "packed"


def _kind_expr(url_norm):
    """URL → page kind, mirroring fixtures.simulator.kind_of_url."""
    path = F.parse_url(url_norm, F.lit("PATH"))
    expr = F.lit("other")
    for kind, marker in [
        ("corp_search", "/corp/search"),
        ("corp_detail", "/corp/detail"),
        ("emp_list", "/corp/emps"),
        ("person_perf_list", "/corp/listpersonperformance"),
        ("perf_detail", "/corp/perfdetail"),
        ("security_list", "/corp/security"),
        ("candidates", "/candidates/"),
        ("bids", "/bids/"),
        ("notice", "/notice/"),
        ("stage", "/project/"),
        ("listing", "/listing"),
    ]:
        expr = F.when(path.startswith(marker), F.lit(kind)).otherwise(expr)
    return expr


def _priority_expr(kind_col):
    expr = F.lit(0)
    for kind, pri in PRIORITY_BY_KIND.items():
        expr = F.when(kind_col == kind, F.lit(pri)).otherwise(expr)
    return expr


@dataclass
class CrawlState:
    """fetch_log/extracted are APPEND-ONLY: kept as per-wave delta frames
    so a commit materializes only the wave's new rows (a single growing
    frame would be rewritten wholly every wave — O(waves × total_rows))."""

    frontier: DataFrame
    seen: DataFrame  # (url_hash, url_norm)
    shards: DataFrame | None
    fetch_log_parts: list[DataFrame]
    extracted_parts: list[DataFrame]
    metrics_parts: list[DataFrame] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    wave: int = 0
    next_seq: int = 0  # driver-tracked global enqueue counter

    @property
    def fetch_log(self) -> DataFrame:
        assert self.fetch_log_parts
        out = self.fetch_log_parts[0]
        for p in self.fetch_log_parts[1:]:
            out = out.unionByName(p)
        return out

    @property
    def extracted(self) -> DataFrame:
        assert self.extracted_parts
        out = self.extracted_parts[0]
        for p in self.extracted_parts[1:]:
            out = out.unionByName(p)
        return out

    @property
    def metrics_table(self) -> DataFrame:
        """Per-(wave, partition, host) fetch/parse metrics — the
        north-star's per-partition lineage companion (row-level lineage
        itself is the frontier's parent_id chain)."""
        assert self.metrics_parts
        out = self.metrics_parts[0]
        for p in self.metrics_parts[1:]:
            out = out.unionByName(p)
        return out


class CrawlEngine:
    """Drives waves over a synthetic site table (schemas.DOCUMENTS +
    fail_first int)."""

    def __init__(
        self,
        spark: SparkSession,
        site: DataFrame,
        seeds: list[str],
        politeness: DataFrame,
        robots: DataFrame,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.config = config or CrawlConfig()
        self.site = site
        self.seeds = seeds
        self.politeness = politeness
        self.robots = robots
        self._tables: dict[str, SnapshotTable] = {}
        if self.config.checkpoint_dir:
            for name in ["frontier", "seen", "shards", "fetch_log", "extracted",
                         "metrics"]:
                self._tables[name] = SnapshotTable(
                    spark, f"{self.config.checkpoint_dir}/{name}"
                )

    # -- state bootstrap ---------------------------------------------------

    def _initial_state(self) -> CrawlState:
        spark = self.spark
        order = spark.createDataFrame(
            [(u, i) for i, u in enumerate(self.seeds)], "url string, _ord int"
        )
        seeds_norm = with_url_norm(order)
        f0, n_seeds, _h0 = dense_index(seeds_norm, [F.col("_ord")], "seq", 0)
        f0 = f0.withColumn("page_kind", _kind_expr(F.col("url_norm"))).select(
            "url",
            "url_norm",
            "url_hash",
            "host",
            "page_kind",
            F.lit(None).cast("string").alias("parent_id"),
            F.lit(0).alias("depth"),
            _priority_expr(F.col("page_kind")).alias("priority"),
            F.lit(0).alias("wave"),
            F.lit("pending").alias("state"),
            F.lit(0).alias("attempts"),
            F.lit(None).cast("int").alias("last_status"),
            "seq",
        )
        seen0 = f0.select("url_hash", "url_norm")
        shards0 = (
            empty_shards(spark, self.config.bloom_spec)
            if self.config.seen_mode in ("bloom", "hybrid")
            else None
        )
        if shards0 is not None:
            shards0 = bloom_insert(f0.select("url_hash"), shards0, self.config.bloom_spec)
        log0 = spark.createDataFrame([], FETCH_LOG_SCHEMA)
        ex0 = spark.createDataFrame([], EXTRACTED_SCHEMA)
        m0 = spark.createDataFrame([], METRICS_SCHEMA)
        return CrawlState(f0, seen0, shards0, [log0], [ex0], [m0], [], 0, n_seeds)

    # -- checkpoint / resume ------------------------------------------------

    def _commit(self, st: CrawlState) -> CrawlState:
        """Materialize the wave (truncates lineage) and, when a checkpoint
        dir is configured, atomically snapshot every state table."""
        if self._tables:
            self._tables["frontier"].commit(st.frontier)
            self._tables["seen"].commit(st.seen)
            if st.shards is not None:
                self._tables["shards"].commit(st.shards)
            # append-only tables: snapshot-commit the union (cheap relative
            # to frontier state because each part is already materialized),
            # but only ONCE per wave and the parts stay delta-shaped
            self._tables["fetch_log"].commit(st.fetch_log)
            self._tables["extracted"].commit(st.extracted)
            self._tables["metrics"].commit(st.metrics_table)
            with open(f"{self.config.checkpoint_dir}/_WAVE", "w") as fh:
                json.dump({"wave": st.wave, "next_seq": st.next_seq}, fh)
            return CrawlState(
                self._tables["frontier"].read(),
                self._tables["seen"].read(),
                self._tables["shards"].read() if st.shards is not None else None,
                [self._tables["fetch_log"].read()],
                [self._tables["extracted"].read()],
                [self._tables["metrics"].read()],
                st.metrics,
                st.wave,
                st.next_seq,
            )
        # coalesce before checkpointing: the per-wave unions would
        # otherwise accumulate partitions linearly in wave count, making
        # every later job pay task overhead for hundreds of slivers
        n = self.config.num_partitions or self.spark.sparkContext.defaultParallelism
        # only the NEWEST delta of the append-only tables needs
        # materializing; older parts were checkpointed in earlier waves
        log_parts = list(st.fetch_log_parts)
        ex_parts = list(st.extracted_parts)
        m_parts = list(st.metrics_parts)
        if log_parts:
            log_parts[-1] = log_parts[-1].coalesce(n).localCheckpoint()
        if ex_parts:
            ex_parts[-1] = ex_parts[-1].coalesce(n).localCheckpoint()
        if m_parts:
            m_parts[-1] = m_parts[-1].coalesce(1).localCheckpoint()
        return CrawlState(
            st.frontier.coalesce(n).localCheckpoint(),
            st.seen.coalesce(n).localCheckpoint(),
            st.shards.localCheckpoint() if st.shards is not None else None,
            log_parts,
            ex_parts,
            m_parts,
            st.metrics,
            st.wave,
            st.next_seq,
        )

    def resume(self) -> CrawlState:
        """Rebuild state from the latest committed snapshot."""
        assert self._tables, "resume requires a checkpoint_dir"
        with open(f"{self.config.checkpoint_dir}/_WAVE") as fh:
            meta = json.load(fh)
        return CrawlState(
            self._tables["frontier"].read(),
            self._tables["seen"].read(),
            self._tables["shards"].read() if self._tables["shards"].exists() else None,
            [self._tables["fetch_log"].read()],
            [self._tables["extracted"].read()],
            [self._tables["metrics"].read()],
            [],
            meta["wave"],
            meta["next_seq"],
        )

    # -- one wave ------------------------------------------------------------

    def _run_wave(self, st: CrawlState) -> tuple[CrawlState, int]:
        cfg = self.config
        w = st.wave
        t0 = time.monotonic()

        import os as _os
        _dbg = _os.environ.get("CRAWL_DEBUG")
        def _tick(label, _t=[time.monotonic()]):
            if _dbg:
                now = time.monotonic()
                print(f"# wave {w} {label}: {now - _t[0]:.2f}s", flush=True)
                _t[0] = now
        pending = st.frontier.filter(F.col("state") == "pending")
        ranked = fops.politeness_rank(pending, self.politeness, cfg.default_budget)
        # global fetch order; distributed dense index (no single-task window)
        batch, n_batch, h_batch = dense_index(
            ranked,
            [F.col("priority").desc(), F.col("wave"), F.col("seq")],
            "fetch_pos",
            0,
            cfg.num_partitions,
        )
        _tick("dense_index(batch)")
        if n_batch == 0:
            return st, 0
        # NOTE: no extra repartition here — dense_index range-partitioned
        # the batch by global fetch order, which interleaves hosts evenly,
        # so the hot host is already spread across all tasks for the
        # fetch/parse stage (salted_repartition remains available for
        # host-affine stages like real connection-pooled HTTP fetching).

        # fetch = equi-join on canonical URL (site side: doc_id IS canonical)
        site = self.site.select(
            F.col("doc_id"),
            F.col("page_kind").alias("_doc_kind"),
            F.col("spans"),
            F.col("fail_first"),
        )
        fetched = (
            batch.join(site, batch.url_norm == site.doc_id, "left")
            .withColumn(
                "status",
                F.when(F.col("doc_id").isNull(), F.lit(404))
                .when(F.col("attempts") < F.col("fail_first"), F.lit(503))
                .otherwise(F.lit(200)),
            )
            .persist()
        )

        log_add = fetched.select(
            F.lit(w).alias("wave"), "fetch_pos", "url_norm", "status"
        )
        # per-(partition, host) fetch/parse metrics — computed on the
        # already-persisted batch, one narrow aggregation per wave
        m_add = (
            fetched.groupBy(
                F.spark_partition_id().alias("partition_id"), F.col("host")
            )
            .agg(
                F.count("*").alias("urls_scheduled"),
                F.sum((F.col("status") == 200).cast("long")).alias("fetched_ok"),
                F.sum((F.col("status") == 404).cast("long")).alias("failed_404"),
                F.sum((F.col("status") == 503).cast("long")).alias("retried_5xx"),
                F.sum(
                    F.when(F.col("status") == 200, F.size("spans")).otherwise(0)
                ).alias("spans_extracted"),
            )
            .select(
                F.lit(w).alias("wave"), "partition_id", "host", "urls_scheduled",
                "fetched_ok", "failed_404", "retried_5xx", "spans_extracted",
            )
        )

        ok = fetched.filter(F.col("status") == 200)
        ex_add = ok.select(
            F.col("url_norm").alias("doc_id"),
            F.explode("spans").alias("s"),
        ).select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
            F.lit(w).alias("wave"),
        )

        # ---- children: links, listing pages reversed ----
        links = ok.select(
            F.col("url_norm").alias("parent"),
            F.col("fetch_pos").alias("parent_pos"),
            F.col("depth").alias("parent_depth"),
            F.col("_doc_kind"),
            F.explode(F.filter("spans", lambda s: s["kind"] == F.lit("link"))).alias("s"),
        ).select(
            "parent",
            "parent_pos",
            "parent_depth",
            "_doc_kind",
            F.col("s.media_ref").alias("child_url"),
            F.col("s.text").alias("_anchor"),
            F.when(F.col("_doc_kind") == "listing", -F.col("s.offset"))
            .otherwise(F.col("s.offset"))
            .alias("eff_pos"),
        ).filter(
            # listing anti-filter happens BEFORE the detail request is
            # yielded in the reference (bid_info.py:93-94): filtered
            # projects are never crawled
            ~(
                (F.col("_doc_kind") == "listing")
                & F.col("_anchor").isNotNull()
                & (F.col("_anchor").contains("监理") | F.col("_anchor").contains("造价咨询"))
            )
        ).drop("_doc_kind", "_anchor")
        # a hub page can fan out 10^4+ links from ONE row; explode keeps
        # them in the parent's partition, which would serialize the
        # canonicalize/dedup pipeline behind one task — spread them first
        links = links.repartition(
            cfg.num_partitions or self.spark.sparkContext.defaultParallelism
        )
        # F16 prefix rewrite before canonicalization: person-detail links
        # are requested as performance lists (company_emp_info.py:214-216)
        links = links.withColumn(
            "child_url",
            F.regexp_replace(
                "child_url", "/corp/persondetail", "/corp/listpersonperformance"
            ),
        )
        children = links.withColumn(
            "url_norm", resolve_and_canonicalize_pd(F.col("child_url"), F.col("parent"))
        ).filter(F.col("url_norm").isNotNull())
        children = (
            children.withColumn("url_hash", F.xxhash64("url_norm"))
            .withColumn("host", F.lower(F.parse_url(F.col("url_norm"), F.lit("HOST"))))
        )
        children = fops.apply_robots_joined(children, self.robots)
        # in-batch first-discovery wins (simulator enqueues in fetch
        # order). min(struct(order..., payload...)) per url_hash instead of
        # a row_number window: hash aggregation gets map-side partial
        # combine and scales linearly, where a window must co-locate and
        # sort every group (measured ANTI-scaling with cores at 4M rows).
        payload = [c for c in children.columns
                   if c not in ("url_hash", "parent_pos", "eff_pos")]
        first = F.min(
            F.struct(F.col("parent_pos"), F.col("eff_pos"),
                     *[F.col(c) for c in payload])
        ).alias("_first")
        children = (
            children.groupBy("url_hash").agg(first)
            .select("url_hash", "_first.*")
        )
        # seen-set dedup (bloom prefilter first in hybrid: at scale it
        # eliminates ~all dupes so the exact anti-join touches a sliver).
        # Only the 8-byte url_hash goes through the Arrow cogroup — wide
        # candidate payload must never round-trip through Python (measured
        # ~8x slowdown when it does); verdicts join back on url_hash,
        # whose hash-partitioning the preceding dedup already established.
        if cfg.seen_mode == "exact":
            children = children.join(
                st.seen.select("url_hash"), "url_hash", "left_anti"
            )
        elif cfg.seen_mode == "bloom":
            verdicts = bloom_test(
                children.select("url_hash"), st.shards, cfg.bloom_spec
            )
            children = children.join(
                verdicts.filter(~F.col("maybe_seen")).select("url_hash"),
                "url_hash", "left_semi",
            )
        else:  # hybrid
            verdicts = bloom_test(
                children.select("url_hash"), st.shards, cfg.bloom_spec
            )
            fresh_keys = verdicts.filter(~F.col("maybe_seen")).select("url_hash")
            maybe_keys = verdicts.filter(F.col("maybe_seen")).select("url_hash")
            confirmed_keys = maybe_keys.join(
                st.seen.select("url_hash"), "url_hash", "left_anti"
            )
            children = children.join(
                fresh_keys.unionByName(confirmed_keys), "url_hash", "left_semi"
            )

        # enqueue keys over the deduped children; the frame is persisted so
        # shards/frontier/seen below reuse one materialization
        if cfg.seq_mode == "packed":
            children = children.withColumn(
                "seq",
                (F.lit(w + 1).cast("long") * F.lit(1 << 47).cast("long"))
                + (F.col("parent_pos").cast("long") * F.lit(1 << 17).cast("long"))
                + (F.col("eff_pos").cast("long") + F.lit(1 << 16).cast("long")),
            ).persist()
            n_new = children.count()
            h_children = children
        else:
            children, n_new, h_children = dense_index(
                children,
                [F.col("parent_pos"), F.col("eff_pos")],
                "seq",
                st.next_seq,
                cfg.num_partitions,
            )
        _tick("children seq")
        new_shards = st.shards
        if st.shards is not None:
            new_shards = bloom_insert(
                children.select("url_hash"), st.shards, cfg.bloom_spec
            )

        f_add = children.withColumn("page_kind", _kind_expr(F.col("url_norm"))).select(
            F.col("child_url").alias("url"),
            "url_norm",
            "url_hash",
            "host",
            "page_kind",
            F.col("parent").alias("parent_id"),
            (F.col("parent_depth") + 1).alias("depth"),
            _priority_expr(F.col("page_kind")).alias("priority"),
            F.lit(w + 1).alias("wave"),
            F.lit("pending").alias("state"),
            F.lit(0).alias("attempts"),
            F.lit(None).cast("int").alias("last_status"),
            "seq",
        )

        # ---- frontier state transitions for the fetched batch ----
        outcome = fetched.select(
            "url_hash",
            F.col("status").alias("_st"),
            F.when(F.col("status") == 200, "fetched")
            .when(F.col("status") == 404, "failed")
            .when(F.col("attempts") + 1 >= F.lit(RETRY_LIMIT), "failed")
            .otherwise("pending")
            .alias("_new_state"),
            F.when(F.col("status").isin(RETRYABLE), F.col("attempts") + 1)
            .otherwise(F.col("attempts"))
            .alias("_new_attempts"),
        )
        new_frontier = (
            st.frontier.join(outcome, "url_hash", "left")
            .select(
                *[
                    c
                    for c in st.frontier.columns
                    if c not in ("state", "attempts", "last_status")
                ],
                F.coalesce(F.col("_new_state"), F.col("state")).alias("state"),
                F.coalesce(F.col("_new_attempts"), F.col("attempts")).alias("attempts"),
                F.coalesce(F.col("_st"), F.col("last_status")).alias("last_status"),
            )
            .unionByName(f_add)
        )
        new_seen = st.seen.unionByName(children.select("url_hash", "url_norm"))

        committed = self._commit(
            CrawlState(
                new_frontier,
                new_seen,
                new_shards,
                st.fetch_log_parts + [log_add],
                st.extracted_parts + [ex_add],
                st.metrics_parts + [m_add],
                st.metrics,
                w + 1,
                st.next_seq + n_new,
            )
        )
        _tick("commit")
        committed.metrics.append(
            {
                "wave": w,
                "urls_fetched": n_batch,
                "urls_new": n_new,
                "wall_ms": int((time.monotonic() - t0) * 1000),
            }
        )
        # release this wave's scratch blocks; state tables live in the
        # fresh localCheckpoint/snapshot, so nothing downstream needs them
        fetched.unpersist()
        for h in (h_batch, h_children):
            if h is not None:
                h.unpersist()
        for old in (st.frontier, st.seen, st.shards):
            if old is not None:
                try:
                    old.unpersist()
                except Exception:
                    pass
        return committed, n_batch

    # -- full run --------------------------------------------------------------

    def run(self, resume: bool = False) -> CrawlState:
        st = self.resume() if resume else self._initial_state()
        if not resume:
            st = self._commit(st)
        while st.wave < self.config.max_waves:
            st, n = self._run_wave(st)
            if n == 0:
                break
        return st
