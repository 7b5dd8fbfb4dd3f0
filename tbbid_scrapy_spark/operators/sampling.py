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
    key = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    return df.orderBy(key, *key_cols).limit(n)


def seeded_sample_fraction(df: DataFrame, fraction: float, key_cols: list[str],
                           seed: int = 42) -> DataFrame:
    """Bernoulli-style deterministic sample: keep rows whose content hash
    falls under the fraction threshold — stable across runs and engines
    that share the hash (used where a LIMIT-style sample would need a
    sort)."""
    buckets = 1 << 20
    key = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)), F.lit(buckets))
    return df.filter(key < int(fraction * buckets))
