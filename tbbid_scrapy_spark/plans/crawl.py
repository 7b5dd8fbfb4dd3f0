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
                    ≤4 total fetches = first attempt + RETRY_TIMES=3
                    retries — settings.py:77-79 semantics)
      5. parse    = explode spans of 200-pages; links (listing pages in
                    REVERSE span order — bid_info.py:90) become children
      6. children = resolve+canonicalize (Arrow UDF) → robots filter →
                    in-batch first-discovery dedup → seen-set dedup
                    (exact | bloom | hybrid | cuckoo) → dense seq →
                    append pending
      7. commit   = per-wave DELTAS (settled rows, new seen, log,
                    extracted, metrics) + live-pending snapshot, made
                    visible by ONE atomic manifest flip → lossless resume
                    point whose I/O is O(wave), not O(total state)

Performance discipline: each wave materializes exactly two intermediates
(the fetched batch and the new children — both needed by several
downstream branches), tracks the global sequence counter on the driver
(an int, not an agg job), and takes row counts from the dense-index pass
that already ran — so a wave is a fixed small number of jobs regardless
of frontier size, and every job is shuffle-parallel.
"""

from __future__ import annotations

import functools as _functools
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tbbid_scrapy_spark.fixtures.sitegen import PRIORITY_BY_KIND
from tbbid_scrapy_spark.functions.urls import with_url_norm
from tbbid_scrapy_spark.operators import frontier as fops
from tbbid_scrapy_spark.operators.bloom import (
    BloomSpec,
    bloom_insert,
    bloom_test_insert,
    empty_shards,
)
from tbbid_scrapy_spark.operators.cuckoo import (
    CuckooSpec,
    cuckoo_insert,
    cuckoo_test,
    empty_cuckoo_shards,
)
from tbbid_scrapy_spark.plans.seq import dense_index
from tbbid_scrapy_spark.sources.sink import Catalog, DeltaTable, SnapshotTable

_DELTA_TABLES = ("done", "seen", "fetch_log", "extracted", "metrics")

RETRY_LIMIT = 3
# Scrapy's RETRY_TIMES counts retries IN ADDITION to the first attempt,
# so RETRY_TIMES=3 allows 4 total fetches before the URL settles failed.
MAX_ATTEMPTS = RETRY_LIMIT + 1
RETRYABLE = [403, 500, 502, 503, 504, 522, 524, 408, 429]


def retry_settle_exprs(
    status=None, attempts=None
) -> tuple["F.Column", "F.Column"]:
    """Scrapy-parity settle expressions for a fetched batch: given a
    row's fetch ``status`` and prior ``attempts`` count, return the
    (state, attempts) Column pair the frontier state machine applies.

    Precedence mirrors Scrapy's RetryMiddleware + HttpErrorMiddleware
    composition (reference: tb_spider settings RETRY_TIMES=3 /
    RETRY_HTTP_CODES): 200 settles ``fetched``; 404 and every other
    NON-retryable status settle ``failed`` immediately (attempts
    unchanged); a RETRYABLE status increments attempts and settles
    ``failed`` once attempts+1 reaches MAX_ATTEMPTS (= first attempt +
    RETRY_TIMES), else re-enters the frontier as ``pending``.

    Exposed (rather than inlined in ``_run_wave_body``) so the driver's
    DuckDB oracle gate can exercise the exact production expressions —
    the oracle hardcodes the reference's retry policy, so a drift in
    RETRYABLE / MAX_ATTEMPTS here breaks the rows+schema+hash match.
    """
    if status is None and attempts is None:
        # the per-wave call site — the same two constant Columns every
        # wave, cached (Columns are immutable; construction is ~40 ms of
        # py4j round-trips otherwise re-paid per wave, guide §1.2 step 2)
        return _retry_settle_default()
    status = F.col("status") if status is None else status
    attempts = F.col("attempts") if attempts is None else attempts
    state = (
        F.when(status == 200, "fetched")
        .when(status == 404, "failed")
        # any other NON-retryable status (401/405/410/451… from a real
        # HttpTransport) fails permanently — without this branch such
        # rows stayed 'pending' with attempts never incremented and
        # were refetched every wave forever (the crawl never drained)
        .when(~status.isin(RETRYABLE), "failed")
        .when(attempts + 1 >= F.lit(MAX_ATTEMPTS), "failed")
        .otherwise("pending")
    )
    attempts_after = F.when(
        status.isin(RETRYABLE), attempts + 1
    ).otherwise(attempts)
    return state, attempts_after


@_functools.lru_cache(maxsize=1)
def _retry_settle_default() -> tuple["F.Column", "F.Column"]:
    return retry_settle_exprs(F.col("status"), F.col("attempts"))

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
    # exact | bloom | hybrid | cuckoo — cuckoo is the DELETABLE
    # approximate seen-set (same FP-only guarantees as bloom, plus
    # cuckoo_delete for retry re-admission / un-seeing)
    seen_mode: str = "exact"
    bloom_spec: BloomSpec | None = None
    cuckoo_spec: CuckooSpec | None = None
    checkpoint_dir: str | None = None
    salt_buckets: int = 64
    num_partitions: int | None = None
    # fetch_mode 'join': sandbox fetch = equi-join against the synthetic
    # site table. 'mapinpandas': the batch-transport operator
    # (operators/fetch.py) — identical row contract; parity-tested with
    # the synthetic transport, deployable with HttpTransport.
    fetch_mode: str = "join"
    # seq_mode 'packed': children enqueue keys are computed per-row as
    # (wave+1)<<47 | parent_pos<<17 | (eff_pos + 2^16) — order-isomorphic
    # to the simulator's dense counter (scheduling only ever compares seq,
    # never assumes density), with zero sort/collect per wave. Bounds:
    # ≤32766 waves, <2^30 fetches/wave, <2^16 spans/page — beyond them use
    # 'dense' (two-pass distributed dense index).
    seq_mode: str = "packed"
    # Adaptive wave parallelism: explicit repartitions (dense index, link
    # spread, shuffle width) are sized to ceil(rows / min_rows_per_task),
    # capped at num_partitions/cluster parallelism — the same policy AQE
    # applies to shuffle reads, extended to the repartitions AQE can't
    # touch. At 10^10-URL waves this saturates to full parallelism; at
    # trickle waves (seed ramp-up, politeness-starved hosts) it stops
    # paying ~1 s/task of scheduling+shuffle-file overhead for 100-row
    # stages (measured: 32-task stages with 74 KB of shuffle spent 20 s
    # in shuffle-write bookkeeping alone). 0 disables (always full width).
    # Default from an interleaved A/B at a 44k-page site, local[32]:
    # 2048 → 865-918 URLs/s vs 0 → 372-638 vs 8192 → 548 (starved).
    min_rows_per_task: int = 2048
    # Canonicalizer for children links: 'adaptive' uses the JVM+Arrow
    # hybrid (functions/urls.with_url_norm mode='hybrid') once the
    # pending estimate clears hybrid_canon_min_rows — wide waves amortize
    # the hybrid's split-union recompute and drop Python from the
    # identity hot path — and the pure Arrow UDF below it (interleaved
    # A/B: 6k-URL waves 835 vs 545 URLs/s for python vs hybrid; 8M-URL
    # wave 160k vs ~140k the other way). 'hybrid'/'python' pin one mode.
    canonicalizer: str = "adaptive"
    hybrid_canon_min_rows: int = 100_000


@_functools.lru_cache(maxsize=None)
def _kind_expr(col_name: str):
    """URL → page kind over the named column, mirroring
    fixtures.simulator.kind_of_url. lru_cached by column name: the
    constant tree cost ~50 ms of py4j round-trips per construction,
    previously re-paid every wave."""
    url_norm = F.col(col_name)
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


@_functools.lru_cache(maxsize=None)
def _priority_expr(col_name: str):
    kind_col = F.col(col_name)
    expr = F.lit(0)
    for kind, pri in PRIORITY_BY_KIND.items():
        expr = F.when(kind_col == kind, F.lit(pri)).otherwise(expr)
    return expr


def _union(parts: list[DataFrame]) -> DataFrame:
    assert parts
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@dataclass
class CrawlState:
    """Frontier state partitioned for O(wave) commits at a 10^10-URL scale.

    - ``pending``    : the LIVE frontier (state == 'pending' only) — the
      single table a wave rewrites. Settled rows never ride through
      another wave's join or commit.
    - ``done_parts`` : APPEND-ONLY settled rows (fetched/failed), one
      delta per wave — wave w commits |batch| rows, not |history|.
    - ``seen_parts`` : APPEND-ONLY (url_hash, url_norm), one delta per
      wave (the r1 design committed the full union every wave —
      O(waves × total_state); the VERDICT's top scale-killer).
    - fetch_log / extracted / metrics: append-only deltas as before.
    - ``committed_parts``: per delta table, the part names already in the
      checkpoint — a commit writes only parts beyond this list.
    """

    pending: DataFrame
    done_parts: list[DataFrame]
    seen_parts: list[DataFrame]
    shards: DataFrame | None
    fetch_log_parts: list[DataFrame]
    extracted_parts: list[DataFrame]
    metrics_parts: list[DataFrame] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    wave: int = 0
    next_seq: int = 0  # driver-tracked global enqueue counter
    committed_parts: dict[str, list[str]] = field(default_factory=dict)
    # driver-tracked size ESTIMATE of `pending` (exact batch/new counts,
    # retries ignored) — sizes the next wave's partitioning without a
    # count job; None → full configured parallelism
    pending_est: int | None = None

    @property
    def frontier(self) -> DataFrame:
        """Full frontier view (live ∪ settled) — read-side compatibility;
        the engine itself never joins against this union."""
        return _union([self.pending, *self.done_parts])

    @property
    def seen(self) -> DataFrame:
        return _union(self.seen_parts)

    @property
    def fetch_log(self) -> DataFrame:
        return _union(self.fetch_log_parts)

    @property
    def extracted(self) -> DataFrame:
        return _union(self.extracted_parts)

    @property
    def metrics_table(self) -> DataFrame:
        """Per-(wave, partition, host) fetch/parse metrics — the
        north-star's per-partition lineage companion (row-level lineage
        itself is the frontier's parent_id chain)."""
        return _union(self.metrics_parts)


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
        transport=None,
    ):
        self.spark = spark
        self.config = config or CrawlConfig()
        self.site = site
        self.seeds = seeds
        self.politeness = politeness
        self.robots = robots
        self._transport_obj = transport
        self._snapshots: dict[str, SnapshotTable] = {}
        self._deltas: dict[str, DeltaTable] = {}
        self._catalog: Catalog | None = None
        if self.config.checkpoint_dir:
            ck = self.config.checkpoint_dir
            self._catalog = Catalog(ck)
            for name in ("pending", "shards"):
                self._snapshots[name] = SnapshotTable(spark, f"{ck}/{name}")
            for name in _DELTA_TABLES:
                self._deltas[name] = DeltaTable(spark, f"{ck}/{name}")

    def _sized_parts(self, rows: int) -> int:
        """Partition count for ~``rows`` rows: ceil(rows/min_rows_per_task)
        clamped to [1, configured parallelism]."""
        cfg_n = self.config.num_partitions or self.spark.sparkContext.defaultParallelism
        if not self.config.min_rows_per_task:
            return cfg_n
        return max(1, min(cfg_n, 1 + (max(rows, 1) - 1) // self.config.min_rows_per_task))

    def _transport(self):
        """Transport for fetch_mode='mapinpandas'. Defaults to the
        synthetic transport over the fixture site (fixture-scale only —
        the page map rides the task closure); pass transport= (e.g.
        HttpTransport) for real fetching."""
        if self._transport_obj is None:
            from tbbid_scrapy_spark.operators.fetch import (
                SyntheticTransport,
                site_to_transport_pages,
            )

            self._transport_obj = SyntheticTransport(
                site_to_transport_pages(self.site.collect())
            )
        return self._transport_obj

    # -- state bootstrap ---------------------------------------------------

    def _initial_state(self) -> CrawlState:
        spark = self.spark
        order = spark.createDataFrame(
            [(u, i) for i, u in enumerate(self.seeds)], "url string, _ord int"
        )
        # seed lists are tiny — never worth the hybrid's split-union
        seeds_norm = with_url_norm(order, mode="python")
        # seeds go through the SAME enqueue-time checks as children
        # (simulator enqueue: robots then seen/url_hash dedup, first
        # occurrence wins; a disallowed seed never enters frontier or seen)
        seeds_norm = fops.apply_robots_joined(seeds_norm, self.robots)
        payload = [c for c in seeds_norm.columns if c not in ("url_hash", "_ord")]
        seeds_norm = (
            seeds_norm.groupBy("url_hash")
            .agg(F.min(F.struct(F.col("_ord"), *[F.col(c) for c in payload])).alias("_f"))
            .select("url_hash", "_f.*")
        )
        f0, n_seeds, _h0 = dense_index(
            seeds_norm, [F.col("_ord")], "seq", 0, self._sized_parts(len(self.seeds))
        )
        f0 = f0.withColumn("page_kind", _kind_expr("url_norm")).select(
            "url",
            "url_norm",
            "url_hash",
            "host",
            "page_kind",
            F.lit(None).cast("string").alias("parent_id"),
            F.lit(0).alias("depth"),
            _priority_expr("page_kind").alias("priority"),
            F.lit(0).alias("wave"),
            F.lit("pending").alias("state"),
            F.lit(0).alias("attempts"),
            F.lit(None).cast("int").alias("last_status"),
            "seq",
        )
        seen0 = f0.select("url_hash", "url_norm")
        shards0 = None
        if self.config.seen_mode in ("bloom", "hybrid"):
            shards0 = bloom_insert(
                f0.select("url_hash"),
                empty_shards(spark, self.config.bloom_spec),
                self.config.bloom_spec,
            )
        elif self.config.seen_mode == "cuckoo":
            shards0 = cuckoo_insert(
                f0.select("url_hash"),
                empty_cuckoo_shards(spark, self.config.cuckoo_spec),
                self.config.cuckoo_spec,
            )
        done0 = spark.createDataFrame([], f0.schema)
        log0 = spark.createDataFrame([], FETCH_LOG_SCHEMA)
        ex0 = spark.createDataFrame([], EXTRACTED_SCHEMA)
        m0 = spark.createDataFrame([], METRICS_SCHEMA)
        return CrawlState(
            pending=f0,
            done_parts=[done0],
            seen_parts=[seen0],
            shards=shards0,
            fetch_log_parts=[log0],
            extracted_parts=[ex0],
            metrics_parts=[m0],
            metrics=[],
            wave=0,
            next_seq=n_seeds,
            pending_est=n_seeds,
        )

    # -- checkpoint / resume ------------------------------------------------

    def _seen_format(self) -> str | None:
        """Format tag of the approximate seen structure under the current
        config (None for exact mode). Stamped into every manifest; at
        resume a mismatch — probe-math version bump OR spec-geometry
        change OR a pre-stamp manifest — means the persisted bitsets would
        return silent false negatives, so the shards are rebuilt from the
        seen table instead of read back."""
        if self.config.seen_mode in ("bloom", "hybrid"):
            return self.config.bloom_spec.format_tag()
        if self.config.seen_mode == "cuckoo":
            return self.config.cuckoo_spec.format_tag()
        return None

    def _rebuild_shards(self, seen: DataFrame) -> DataFrame:
        """Reconstruct the approximate seen structure from the exact seen
        table (the format-independent source of truth): every committed
        url_hash is re-inserted into fresh shards under the CURRENT
        format. O(|seen|) once at resume; the next commit persists the
        rebuilt shards under the new tag."""
        spark = self.spark
        if self.config.seen_mode == "cuckoo":
            return cuckoo_insert(
                seen.select("url_hash"),
                empty_cuckoo_shards(spark, self.config.cuckoo_spec),
                self.config.cuckoo_spec,
            )
        return bloom_insert(
            seen.select("url_hash"),
            empty_shards(spark, self.config.bloom_spec),
            self.config.bloom_spec,
        )

    def _delta_parts(self, st: CrawlState) -> dict[str, list[DataFrame]]:
        return {
            "done": st.done_parts,
            "seen": st.seen_parts,
            "fetch_log": st.fetch_log_parts,
            "extracted": st.extracted_parts,
            "metrics": st.metrics_parts,
        }

    def _commit(self, st: CrawlState) -> CrawlState:
        """Materialize the wave (truncates lineage); with a checkpoint dir
        configured, write the wave's DELTAS plus the live-pending snapshot
        and flip ONE manifest atomically.

        Commit I/O is O(wave): each append-only table writes only its new
        part(s); the only rewritten tables are ``pending`` (the live set a
        wave must touch anyway) and the fixed-size bloom ``shards``. A
        crash anywhere before the manifest flip leaves the previous
        manifest — and therefore a fully consistent multi-table snapshot —
        as the resume point (no per-table pointer skew)."""
        if self._catalog:
            # every write below targets its own immutable directory, so the
            # whole commit fans out across one thread per table (Spark
            # schedules concurrent jobs fine; local-mode cores are shared).
            # Serializing them would put ~7 job round-trips of pure
            # scheduling latency on every wave's critical path. Only the
            # manifest flip is ordered — strictly after all writes land.
            jobs: dict[str, Callable[[], object]] = {
                "pending": lambda: self._snapshots["pending"].write_version(st.pending)
            }
            if st.shards is not None:
                jobs["shards"] = lambda: self._snapshots["shards"].write_version(
                    st.shards
                )
            parts_by_name = self._delta_parts(st)
            new_by_name: dict[str, list[DataFrame]] = {}
            for name in _DELTA_TABLES:
                parts = parts_by_name[name]
                # once anything is committed, parts[0] is the read-back of
                # all committed parts; everything after it is new deltas.
                # On the very first commit every part is new.
                new_by_name[name] = parts[1:] if st.committed_parts.get(name) else parts
                for i, p in enumerate(new_by_name[name]):
                    jobs[f"{name}/{i}"] = (
                        lambda d=self._deltas[name], p=p, i=i: d.write_part(
                            p, f"{st.wave:06d}-{i}"
                        )
                    )
            with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
                results = {k: f.result() for k, f in
                           {k: ex.submit(fn) for k, fn in jobs.items()}.items()}
            snaps = {"pending": results["pending"]}
            if st.shards is not None:
                snaps["shards"] = results["shards"]
            deltas = {
                name: list(st.committed_parts.get(name, []))
                + [results[f"{name}/{i}"] for i in range(len(new_by_name[name]))]
                for name in _DELTA_TABLES
            }
            self._catalog.commit(
                {
                    "wave": st.wave,
                    "next_seq": st.next_seq,
                    "pending_est": st.pending_est,
                    "seen_format": self._seen_format(),
                    "snapshots": snaps,
                    "deltas": deltas,
                }
            )
            return self._load(st.metrics)
        # no checkpoint dir: localCheckpoint to truncate lineage. Coalesce
        # first — per-wave unions would otherwise accumulate partitions
        # linearly in wave count. Only the NEWEST delta of each append-only
        # table needs materializing; older parts were checkpointed already.
        # All 7 checkpoints are independent scans of already-persisted wave
        # blocks — submit them concurrently (each eager localCheckpoint is
        # a full job; serial submission costs ~7 scheduler round-trips of
        # per-wave fixed latency).
        n = (
            self._sized_parts(st.pending_est)
            if st.pending_est is not None
            else self.config.num_partitions
            or self.spark.sparkContext.defaultParallelism
        )

        def _ckpt_last(parts: list[DataFrame], nparts: int) -> list[DataFrame]:
            out = list(parts)
            if out:
                out[-1] = out[-1].coalesce(nparts).localCheckpoint()
            return out

        jobs: dict[str, Callable[[], object]] = {
            "pending": lambda: st.pending.coalesce(n).localCheckpoint(),
            "done": lambda: _ckpt_last(st.done_parts, n),
            "seen": lambda: _ckpt_last(st.seen_parts, n),
            "fetch_log": lambda: _ckpt_last(st.fetch_log_parts, n),
            "extracted": lambda: _ckpt_last(st.extracted_parts, n),
            "metrics": lambda: _ckpt_last(st.metrics_parts, 1),
        }
        if st.shards is not None:
            jobs["shards"] = lambda: st.shards.localCheckpoint()
        with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
            res = {k: f.result() for k, f in
                   {k: ex.submit(fn) for k, fn in jobs.items()}.items()}

        return CrawlState(
            pending=res["pending"],
            done_parts=res["done"],
            seen_parts=res["seen"],
            shards=res.get("shards"),
            fetch_log_parts=res["fetch_log"],
            extracted_parts=res["extracted"],
            metrics_parts=res["metrics"],
            metrics=st.metrics,
            wave=st.wave,
            next_seq=st.next_seq,
            pending_est=st.pending_est,
        )

    def _load(self, metrics: list[dict] | None = None) -> CrawlState:
        """State from the current manifest: every delta table becomes ONE
        multi-path scan over its committed parts."""
        manifest = self._catalog.read()
        assert manifest is not None, "no committed manifest to load"
        snaps, deltas = manifest["snapshots"], manifest["deltas"]
        parts = {
            name: [self._deltas[name].read(deltas[name])] for name in _DELTA_TABLES
        }
        want = self._seen_format()
        if want is None:
            shards = None
        elif manifest.get("seen_format") == want and "shards" in snaps:
            shards = self._snapshots["shards"].read_version(snaps["shards"])
        else:
            # probe-math version bump, spec-geometry change, seen_mode
            # change, or a manifest written before tags existed: the
            # persisted bitsets would silently drop membership (seen URLs
            # re-enqueued/refetched) — rebuild from the exact seen table.
            import sys

            print(
                "[crawl] seen-structure format mismatch at resume "
                f"(manifest={manifest.get('seen_format')!r}, current={want!r})"
                " — rebuilding shards from the seen table",
                file=sys.stderr,
            )
            # eager localCheckpoint: the O(|seen|) reconstruction runs
            # ONCE here — shards feed multiple independent actions per
            # wave (test, insert, commit), and a lazy rebuilt frame would
            # re-scan the seen table on each (same pattern as the wave
            # loop's shard checkpointing below)
            shards = self._rebuild_shards(parts["seen"][0]).localCheckpoint()
        return CrawlState(
            pending=self._snapshots["pending"].read_version(snaps["pending"]),
            done_parts=parts["done"],
            seen_parts=parts["seen"],
            shards=shards,
            fetch_log_parts=parts["fetch_log"],
            extracted_parts=parts["extracted"],
            metrics_parts=parts["metrics"],
            metrics=metrics or [],
            wave=manifest["wave"],
            next_seq=manifest["next_seq"],
            committed_parts={k: list(v) for k, v in deltas.items()},
            pending_est=manifest.get("pending_est"),
        )

    def resume(self) -> CrawlState:
        """Rebuild state from the latest committed manifest."""
        assert self._catalog, "resume requires a checkpoint_dir"
        return self._load()

    # -- one wave ------------------------------------------------------------

    def _ticker(self, w):
        """CRAWL_DEBUG=1 per-step wave timing printer (no-op otherwise)."""
        import os as _os

        _dbg = _os.environ.get("CRAWL_DEBUG")
        _t = [time.monotonic()]

        def _tick(label):
            if _dbg:
                now = time.monotonic()
                print(f"# wave {w} {label}: {now - _t[0]:.2f}s", flush=True)
                _t[0] = now

        return _tick

    def _run_wave(self, st: CrawlState) -> tuple[CrawlState, int]:
        cfg = self.config
        w = st.wave
        t0 = time.monotonic()

        _tick = self._ticker(w)
        # adaptive wave parallelism (see CrawlConfig.min_rows_per_task):
        # batch-side ops sized to the pending estimate, link-side ops get
        # 4x headroom for fan-out; shuffle width follows the wave size so
        # AQE's read-side coalescing is matched by the write side too
        cfg_n = cfg.num_partitions or self.spark.sparkContext.defaultParallelism
        if cfg.min_rows_per_task and st.pending_est is not None:
            wave_parts = self._sized_parts(st.pending_est)
            links_parts = min(cfg_n, wave_parts * 4)
            self.spark.conf.set("spark.sql.shuffle.partitions", str(links_parts))
        else:
            wave_parts = links_parts = cfg_n

        # st.pending IS the live frontier — no state filter, no settled rows
        # in any wave join
        pending = st.pending
        ranked = fops.politeness_rank(
            pending, self.politeness, cfg.default_budget,
            salt_buckets=cfg.salt_buckets,
        )
        # global fetch order; distributed dense index (no single-task window)
        batch, n_batch, h_batch = dense_index(
            ranked,
            [F.col("priority").desc(), F.col("wave"), F.col("seq")],
            "fetch_pos",
            0,
            wave_parts,
        )
        _tick("dense_index(batch)")
        if n_batch == 0:
            if h_batch is not None:
                h_batch.unpersist()
            return st, 0
        # Every wave-scratch persist is registered in `scratch` and
        # released in the finally — an exception mid-wave (e.g. a
        # packed-seq OverflowError a caller catches before retrying with
        # seq_mode='dense' on the SAME session) must not leave cached
        # blocks pinned for the session's lifetime.
        scratch: list = [] if h_batch is None else [h_batch]
        try:
            return self._run_wave_body(
                st, w, t0, cfg, batch, n_batch, links_parts, scratch
            )
        finally:
            for h in scratch:
                try:
                    h.unpersist()
                except Exception:
                    pass

    def _run_wave_body(self, st, w, t0, cfg, batch, n_batch, links_parts,
                       scratch):
        _tick = self._ticker(w)
        # NOTE: no extra repartition here — dense_index range-partitioned
        # the batch by global fetch order, which interleaves hosts evenly,
        # so the hot host is already spread across all tasks for the
        # fetch/parse stage (salted_repartition remains available for
        # host-affine stages like real connection-pooled HTTP fetching).

        if cfg.fetch_mode == "mapinpandas":
            # batch-transport fetch (operators/fetch.py): one transport
            # attempt per row in Arrow batches, JVM-side body parse —
            # the same (status, _doc_kind, spans) contract as the join
            from tbbid_scrapy_spark.operators.fetch import (
                fetch_map_in_pandas,
                parse_fetched_body,
            )

            fetched = parse_fetched_body(
                fetch_map_in_pandas(batch, self._transport())
            ).persist()
            scratch.append(fetched)
        else:
            # sandbox fetch = equi-join on canonical URL (site side:
            # doc_id IS canonical)
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
            scratch.append(fetched)

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
                # permanent failures = 404 plus any non-retryable error
                # status (the state machine fails those immediately);
                # retried = the full RETRYABLE set, not literal 503 only —
                # real HttpTransport runs see 500/502/429/… too
                F.sum(
                    (
                        (F.col("status") != 200)
                        & ~F.col("status").isin(RETRYABLE)
                    ).cast("long")
                ).alias("failed_404"),
                F.sum(F.col("status").isin(RETRYABLE).cast("long")).alias(
                    "retried_5xx"
                ),
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
        links = links.repartition(links_parts)
        # F16 prefix rewrite before canonicalization: person-detail links
        # are requested as performance lists (company_emp_info.py:214-216)
        links = links.withColumn(
            "child_url",
            F.regexp_replace(
                "child_url", "/corp/persondetail", "/corp/listpersonperformance"
            ),
        )
        # canonicalization mode per CrawlConfig.canonicalizer: wide waves
        # take the JVM+Arrow hybrid, trickle waves the straight Arrow UDF
        if cfg.canonicalizer == "adaptive":
            canon_mode = (
                "hybrid"
                if (st.pending_est or 0) >= cfg.hybrid_canon_min_rows
                else "python"
            )
        else:
            canon_mode = cfg.canonicalizer
        children = with_url_norm(
            links, "child_url", base_col="parent", mode=canon_mode
        ).filter(F.col("url_norm").isNotNull())
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
        # Bloom modes run the FUSED test+insert (operators/bloom.py
        # bloom_test_insert): one cogroup pass yields both the verdicts
        # and the updated shard table — setting bits for a maybe-seen
        # candidate is idempotent, so the bitset equals the old
        # test-then-insert-novel exactly (fused == split pinned in
        # tests/test_bloom.py); the split pipeline paid a second
        # shuffle+Arrow pass per wave for the same result.
        fused_seen = None
        if cfg.seen_mode == "exact":
            children = children.join(
                st.seen.select("url_hash"), "url_hash", "left_anti"
            )
        elif cfg.seen_mode == "cuckoo":
            verdicts = cuckoo_test(
                children.select("url_hash"), st.shards, cfg.cuckoo_spec
            )
            children = children.join(
                verdicts.filter(~F.col("maybe_seen")).select("url_hash"),
                "url_hash", "left_semi",
            )
        else:  # bloom / hybrid
            fused_seen = bloom_test_insert(
                children.select("url_hash"), st.shards, cfg.bloom_spec
            ).persist()
            scratch.append(fused_seen)
            verdicts = fused_seen.filter(F.col("row_kind") == "v").select(
                "url_hash", "maybe_seen"
            )
            fresh_keys = verdicts.filter(~F.col("maybe_seen")).select("url_hash")
            if cfg.seen_mode == "bloom":
                keep_keys = fresh_keys
            else:  # hybrid: exact-confirm the bloom-positive sliver
                maybe_keys = verdicts.filter(F.col("maybe_seen")).select("url_hash")
                confirmed_keys = maybe_keys.join(
                    st.seen.select("url_hash"), "url_hash", "left_anti"
                )
                keep_keys = fresh_keys.unionByName(confirmed_keys)
            children = children.join(keep_keys, "url_hash", "left_semi")

        # enqueue keys over the deduped children; the frame is persisted so
        # shards/frontier/seen below reuse one materialization
        if cfg.seq_mode == "packed":
            # documented packed-key bounds are ENFORCED, not assumed: a
            # silent overflow would corrupt enqueue order and politeness
            # scheduling with no error (ADVICE r1). n_batch bounds
            # parent_pos; the span-offset bound rides the same count job.
            if w + 1 > 32766:
                raise OverflowError(
                    f"seq_mode='packed' supports ≤32766 waves (at wave {w + 1}); "
                    "use seq_mode='dense'"
                )
            if n_batch >= 1 << 30:
                raise OverflowError(
                    f"seq_mode='packed' supports <2^30 fetches/wave (got {n_batch}); "
                    "use seq_mode='dense'"
                )
            children = children.withColumn(
                "seq",
                (F.lit(w + 1).cast("long") * F.lit(1 << 47).cast("long"))
                + (F.col("parent_pos").cast("long") * F.lit(1 << 17).cast("long"))
                + (F.col("eff_pos").cast("long") + F.lit(1 << 16).cast("long")),
            ).persist()
            # registered BEFORE the overflow checks below: a raised
            # OverflowError must not leak this persisted frame
            scratch.append(children)
            stats = children.agg(
                F.count("*").alias("n"), F.max(F.abs("eff_pos")).alias("max_off")
            ).collect()[0]
            n_new = stats["n"]
            if stats["max_off"] is not None and stats["max_off"] >= 1 << 16:
                raise OverflowError(
                    f"seq_mode='packed' supports <2^16 spans/page (got offset "
                    f"{stats['max_off']}); use seq_mode='dense'"
                )
        else:
            children, n_new, h_children = dense_index(
                children,
                [F.col("parent_pos"), F.col("eff_pos")],
                "seq",
                st.next_seq,
                links_parts,
            )
            if h_children is not None:
                scratch.append(h_children)
        _tick("children seq")
        new_shards = st.shards
        if st.shards is not None:
            if cfg.seen_mode == "cuckoo":
                new_shards = cuckoo_insert(
                    children.select("url_hash"), st.shards, cfg.cuckoo_spec
                )
            else:
                # bloom / hybrid: bits were already set in the fused
                # test+insert pass above — shards exist only for the three
                # seen modes, and the non-cuckoo ones always assign
                # fused_seen, so there is no separate-insert path
                assert fused_seen is not None, "bloom/hybrid wave without fused pass"
                new_shards = fused_seen.filter(F.col("row_kind") == "s").select(
                    "shard_id", "bitset", "n_inserted"
                )

        f_add = children.withColumn("page_kind", _kind_expr("url_norm")).select(
            F.col("child_url").alias("url"),
            "url_norm",
            "url_hash",
            "host",
            "page_kind",
            F.col("parent").alias("parent_id"),
            (F.col("parent_depth") + 1).alias("depth"),
            _priority_expr("page_kind").alias("priority"),
            F.lit(w + 1).alias("wave"),
            F.lit("pending").alias("state"),
            F.lit(0).alias("attempts"),
            F.lit(None).cast("int").alias("last_status"),
            "seq",
        )

        # ---- frontier state transitions: ONLY the fetched batch moves ----
        # The batch rows (already carrying every frontier column) fork into
        # a settled delta (append-only) and retry rows that re-enter the
        # live set; untouched pending rows pass through one anti-join on
        # the (small) batch keys. No join ever sees settled history — this
        # is what makes wave cost O(live + batch), not O(everything ever).
        front_cols = st.pending.columns
        state_expr, attempts_expr = retry_settle_exprs()
        batch_after = fetched.select(
            *[c for c in front_cols if c not in ("state", "attempts", "last_status")],
            state_expr.alias("state"),
            attempts_expr.alias("attempts"),
            F.col("status").alias("last_status"),
        ).select(*front_cols)
        done_add = batch_after.filter(F.col("state") != "pending")
        retries = batch_after.filter(F.col("state") == "pending")
        new_pending = (
            st.pending.join(batch.select("url_hash"), "url_hash", "left_anti")
            .select(*front_cols)
            .unionByName(retries)
            .unionByName(f_add.select(*front_cols))
        )
        seen_add = children.select("url_hash", "url_norm")

        pending_est = (
            max(1, st.pending_est - n_batch + n_new)
            if st.pending_est is not None
            else None
        )
        committed = self._commit(
            CrawlState(
                pending=new_pending,
                done_parts=st.done_parts + [done_add],
                seen_parts=st.seen_parts + [seen_add],
                shards=new_shards,
                fetch_log_parts=st.fetch_log_parts + [log_add],
                extracted_parts=st.extracted_parts + [ex_add],
                metrics_parts=st.metrics_parts + [m_add],
                metrics=st.metrics,
                wave=w + 1,
                next_seq=st.next_seq + n_new,
                committed_parts=st.committed_parts,
                pending_est=pending_est,
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
        # wave-scratch blocks (fetched / batch / children / fused frames,
        # all registered in `scratch`) are released by _run_wave's
        # finally — on success AND on any mid-wave exception. Only the
        # superseded old-state blocks are dropped here, success-path
        # only: state tables live in the fresh localCheckpoint/snapshot,
        # so nothing downstream needs them
        for old in (st.pending, *st.seen_parts, st.shards):
            if old is not None:
                try:
                    old.unpersist()
                except Exception:
                    pass
        return committed, n_batch

    # -- full run --------------------------------------------------------------

    def run(self, resume: bool = False) -> CrawlState:
        # waves retune spark.sql.shuffle.partitions to their width
        # (adaptive wave parallelism) — restore the session value so
        # unrelated queries on the same session keep their planning width
        prev_shuffle = self.spark.conf.get("spark.sql.shuffle.partitions")
        # A fresh run re-uses deterministic wave-numbered delta part names
        # (sink.DeltaTable.write_part), so starting over inside a
        # checkpoint_dir that already holds a COMMITTED manifest would
        # overwrite part directories the live manifest still references —
        # a crash mid-first-commit would then leave that manifest pointing
        # at clobbered parquet. Refuse instead of corrupting.
        if not resume and self._catalog and self._catalog.read() is not None:
            raise ValueError(
                f"checkpoint dir already holds a committed manifest "
                f"({self._catalog.root}); pass resume=True to continue it, "
                "or point checkpoint_dir at a fresh directory"
            )
        try:
            st = self.resume() if resume else self._initial_state()
            if not resume:
                st = self._commit(st)
            while st.wave < self.config.max_waves:
                st, n = self._run_wave(st)
                if n == 0:
                    break
            return st
        finally:
            self.spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
