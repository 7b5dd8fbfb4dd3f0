"""Scratch-persist ownership: operator-internal caches are registered
with ``operators.scratch`` and releasable by the caller — a long-lived
session no longer accumulates storage-pool pressure across repeated
operator calls (previously the handles were dropped and only
``spark.catalog.clearCache()`` — which nukes caller-owned caches too —
could reclaim them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tbbid_scrapy_spark.operators import dedup, scratch, similarity, text


def test_operators_register_and_release_scratch(spark):
    scratch.release()  # clean slate
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(30)],
        "doc_id bigint, text string",
    )
    before = scratch.registered_count()
    pairs = dedup.simhash_verified_pairs(docs, threshold=0.5)
    pairs.count()  # action: the persisted shingle sets did their job
    assert scratch.registered_count() > before  # registered, not dropped
    released = scratch.release()
    assert released >= 1
    assert scratch.registered_count() == 0
    # releasing twice is a safe no-op
    assert scratch.release() == 0


def test_release_unpersists_for_real(spark):
    """After release, the scratch frames THEMSELVES are no longer
    persisted.  Asserted on the registered handles' own storageLevel —
    never on the global persistent-RDD pool count, which Spark's async
    ContextCleaner mutates concurrently (it unpersists other modules'
    garbage-collected caches mid-test; the old absolute-count assertion
    flaked in full-suite runs for exactly that reason)."""
    scratch.release()
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    similarity.pairs_above(emb, threshold=0.99).count()
    assert scratch.registered_count() >= 1
    handles = list(scratch._SCRATCH)  # our own refs: ContextCleaner-proof
    for h in handles:
        lvl = h.storageLevel
        assert lvl.useMemory or lvl.useDisk
    scratch.release()
    assert scratch.registered_count() == 0
    for h in handles:
        lvl = h.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)


def test_scope_releases_only_inner_frames(spark):
    scratch.release()
    outer = scratch.persist(
        spark.createDataFrame([(1,)], "x bigint")
    )
    outer.count()
    with scratch.scope():
        docs = spark.createDataFrame(
            [(i, f"one two three four five six seven {i}") for i in range(20)],
            "doc_id bigint, text string",
        )
        text.corpus_keep(docs, min_words=3, lang=None).count()
        assert scratch.registered_count() >= 2
    # inner frames released; the caller-owned outer persist survives
    assert scratch.registered_count() == 1
    assert outer.storageLevel.useMemory or outer.storageLevel.useDisk
    scratch.release()


def test_scope_exit_correct_under_cap_eviction(spark):
    """Cap eviction firing INSIDE a scope must not shift what exit
    releases: a length-mark implementation released the wrong frames
    (pre-scope survivors) and leaked inner ones past the scope. The
    scope tracks frame IDENTITY, so exit releases exactly the inner
    frames still registered."""
    scratch.release()
    pre = [
        scratch.persist(spark.createDataFrame([(i,)], "x bigint"))
        for i in range(3)
    ]
    for df in pre:
        df.count()
    inner = []
    with scratch.scope():
        # enough registrations to blow the cap: the oldest (pre-scope)
        # frames are evicted FIFO while the scope is open
        for i in range(scratch.MAX_REGISTERED):
            df = scratch.persist(spark.createDataFrame([(100 + i,)], "x bigint"))
            df.count()
            inner.append(df)
    # every inner frame is unpersisted at exit — none leaked
    for df in inner:
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)
    # survivors (if any) are pre-scope frames only
    for df in list(scratch._SCRATCH):
        assert any(df is p for p in pre)
    scratch.release()


def test_registry_thread_safety_under_concurrent_release(spark):
    """register/release from multiple threads must not raise (the crawl
    engine commits from a ThreadPoolExecutor; an unguarded
    check-then-pop raced)."""
    from concurrent.futures import ThreadPoolExecutor

    scratch.release()
    df = spark.createDataFrame([(1,)], "x bigint")

    def spin(_):
        for _ in range(50):
            scratch.persist(df)
            scratch.release()
        return True

    with ThreadPoolExecutor(max_workers=4) as ex:
        assert all(ex.map(spin, range(4)))
    scratch.release()


def test_registry_cap_evicts_oldest(spark):
    """A caller that never calls release() stays bounded: registering
    past MAX_REGISTERED unpersists and drops the oldest frame."""
    scratch.release()
    frames = [
        scratch.persist(spark.range(i, i + 10))
        for i in range(scratch.MAX_REGISTERED + 3)
    ]
    assert scratch.registered_count() == scratch.MAX_REGISTERED
    # the three oldest were evicted (storage level reset)
    for f in frames[:3]:
        lvl = f.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)
    # the newest are still cached
    lvl = frames[-1].storageLevel
    assert lvl.useMemory or lvl.useDisk
    scratch.release()
