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
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_SCRATCH: list[DataFrame] = []


def persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and register the handle for later ``release()``."""
    out = df.persist() if storage_level is None else df.persist(storage_level)
    _SCRATCH.append(out)
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
