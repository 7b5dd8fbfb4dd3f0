"""Registry for operator-internal scratch persists.

Several operators persist intermediate frames that sub-plans reference
more than once (signature arrays in ``similarity.pairs_above``, shingle
sets in ``dedup.simhash_verified_pairs``, survivors in
``text.corpus_keep``).  The persist must outlive the operator call —
the returned DataFrame is lazy and the cache is only useful at the
caller's action — so the operator cannot unpersist before returning.
Previously those handles were simply dropped, and a long-lived session
calling the operators repeatedly accumulated storage-pool pressure
until something evicted (bench.py worked around it with
``spark.catalog.clearCache()``, which also nukes caches the CALLER
owns).

This module gives the scratch frames an owner: operators register every
internal persist here, and callers release exactly those frames — and
nothing else — once their action has run::

    from tbbid_scrapy_spark.operators import scratch

    kept = corpus_keep(docs)
    kept.write.parquet(out)          # action: caches did their job
    scratch.release()                # drop ONLY operator-internal caches

``release()`` is safe at any time (unpersist is lazy-blocking=False and
idempotent); frames still referenced by un-actioned plans simply
recompute.  For scoped use, ``scratch.scope()`` is a context manager
that releases on exit whatever was registered inside it.

Callers that never call ``release()`` are still bounded: the registry
caps at ``MAX_REGISTERED`` frames and evicts (unpersists) the oldest on
overflow — scratch frames are recomputable by construction, so an
evicted one costs recompute time, never correctness.  Under heavy
``scope()`` nesting combined with overflow the FIFO eviction may drop
an outer scope's frame before an inner one; that is equally harmless
for the same reason.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_SCRATCH: list[DataFrame] = []

# Registry cap: a caller that never calls release() (a library consumer
# unaware of the contract) must not pin scratch blocks for process
# lifetime — beyond this many registered frames the OLDEST is
# unpersisted and dropped. Scratch frames are recomputable by
# construction (they exist only to avoid re-derivation within one
# operator call), so evicting an old one can cost recompute time but
# never correctness. Recent frames — the ones an in-flight plan still
# references — stay cached.
MAX_REGISTERED = 8


def persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and register the handle for later ``release()``."""
    out = df.persist() if storage_level is None else df.persist(storage_level)
    _SCRATCH.append(out)
    while len(_SCRATCH) > MAX_REGISTERED:
        old = _SCRATCH.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass
    return out


def registered_count() -> int:
    return len(_SCRATCH)


def release() -> int:
    """Unpersist every registered scratch frame; returns how many."""
    n = 0
    while _SCRATCH:
        df = _SCRATCH.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a stopped SparkSession makes unpersist moot — keep draining
            pass
    return n


@contextmanager
def scope():
    """Release-on-exit scope: frames registered inside are unpersisted
    when the block ends (the caller's action belongs INSIDE the block)."""
    mark = len(_SCRATCH)
    try:
        yield
    finally:
        while len(_SCRATCH) > mark:
            df = _SCRATCH.pop()
            try:
                df.unpersist()
            except Exception:
                pass
