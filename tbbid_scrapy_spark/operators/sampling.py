"""Deterministic sampling (O1).

The reference seeds crawls with ``ORDER BY RANDOM() LIMIT n``
(company_emp_info.py:39-41, national_bid_list.py:29-31) — ambient
nondeterminism the engine replaces with content-keyed pseudo-randomness
(SURVEY.md §7 'seeded/parameterized identically'): rows are ordered by
``xxhash64(key_cols, seed)``. Unlike ``rand(seed)`` — whose value depends
on row position within a partition, i.e. on the physical plan — a
content hash gives the same sample for any partitioning, any cluster
size, and any run. Spark plans the orderBy+limit as
TakeOrderedAndProject: a per-partition top-n then a driver-side merge of
n·parts candidates — no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seeded_sample(df: DataFrame, n: int, key_cols: list[str], seed: int = 42) -> DataFrame:
    """Deterministic ORDER-BY-hash LIMIT n.

    CONTRACT: ``key_cols`` must identify rows uniquely (the reference
    call sites sample by primary key). Rows that TIE on (hash,
    key_cols) — i.e. duplicate keys — are chosen partition-dependently
    at the limit boundary, which would break the any-partitioning
    guarantee. Not checked at runtime: a uniqueness probe would add a
    shuffle to a path that otherwise plans as TakeOrderedAndProject
    (per-partition top-n, no exchange) — pass a unique key, or dedup
    first.
    """
    key = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    return df.orderBy(key, *key_cols).limit(n)


def seeded_sample_fraction(df: DataFrame, fraction: float, key_cols: list[str],
                           seed: int = 42) -> DataFrame:
    """Bernoulli-style deterministic sample: keep rows whose content hash
    falls under the fraction threshold — stable across runs and engines
    that share the hash (used where a LIMIT-style sample would need a
    sort).

    The threshold compares the integer bucket against ``fraction ×
    buckets`` as a FLOAT: truncating it to int made every fraction below
    1/buckets silently select NOTHING (at 10^10 rows a 5e-7 sample is
    ~5000 expected rows, not zero). 2^30 buckets give ~1e-9 granularity;
    below that the comparison still keeps bucket 0 with probability
    1/buckets rather than cliffing to empty.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    buckets = 1 << 30
    key = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)), F.lit(buckets))
    return df.filter(key < F.lit(float(fraction * buckets)))
