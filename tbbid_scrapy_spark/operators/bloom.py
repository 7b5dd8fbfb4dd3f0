"""Sharded bloom-filter URL-seen set.

Replaces the reference's two seen-sets — Scrapy's request-fingerprint
dupefilter (default-on; no ``dont_filter`` anywhere in the reference) and
the app-level ``project_cache`` set (/root/reference/xizang/pipelines/
bidSaver.py:16,30-35,123-124) — with a structure that works at a
10^10-URL frontier (SURVEY.md §2.11 C2).

Design
------
- Identity: the JVM-side ``xxhash64(url_norm)`` (no Python hashing).
- Sharding: ``shard_id = pmod(url_hash, n_shards)``. Each shard owns an
  independent bitset; shards are rows ``(shard_id, bitset binary,
  n_inserted)`` so the whole seen-set is itself a DataFrame that
  checkpoints like any other table. At 10^10 URLs / 1% FP the total is
  ~12 GB of bits — across 4096 shards that is ~3 MB per shard, small
  enough that one task owns one shard comfortably; executors process
  shards in parallel and nothing ever concentrates on the driver.
- Probes: k positions derived from the single 64-bit hash by the
  Kirsch-Mitzenmacher double-hashing scheme (h_lo + i*h_hi mod m) —
  standard result: no extra hash functions needed.
- Test/insert run as a cogrouped ``applyInPandas`` (candidates grouped by
  shard_id cogrouped with the shard rows): one Arrow batch per shard,
  numpy bit ops inside — no per-row Python.

False-positive caveat: a bloom FP silently drops a never-seen URL. The
crawl loop therefore supports four modes (plans/crawl.py): 'exact'
(anti-join against the seen table — reference-parity default), 'bloom'
(pure bloom, scale path), 'hybrid' (bloom prefilter, exact anti-join
on survivors only — at scale the prefilter removes ~all duplicates so the
exact join touches a tiny remainder; zero false drops), and 'cuckoo'
(operators/cuckoo.py — same sharded interface and FP-only guarantees,
plus DELETION for retry re-admission, which a bloom cannot do).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tbbid_scrapy_spark import schemas


@dataclass(frozen=True)
class BloomSpec:
    """Sizing for the sharded bloom filter.

    ``for_capacity`` computes classic optimal sizing: m = -n*ln(p)/ln(2)^2
    bits, k = (m/n)*ln(2) probes. Tests verify the sizing function at
    10^10 without allocating it (SURVEY.md §7 risks).
    """

    n_shards: int
    bits_per_shard: int  # multiple of 8
    n_probes: int

    @staticmethod
    def for_capacity(expected_n: int, fp_rate: float, n_shards: int) -> "BloomSpec":
        m_total = math.ceil(-expected_n * math.log(fp_rate) / (math.log(2) ** 2))
        k = max(1, round(m_total / expected_n * math.log(2)))
        bits = math.ceil(m_total / n_shards)
        bits += (-bits) % 8  # byte-align
        return BloomSpec(n_shards=n_shards, bits_per_shard=bits, n_probes=k)

    @property
    def total_bytes(self) -> int:
        return self.n_shards * self.bits_per_shard // 8

    def format_tag(self) -> str:
        """Identity of the on-disk bitset format: probe-derivation scheme
        plus every geometry parameter that decides which bits a key sets.
        Stamped into the checkpoint manifest at commit; a resume whose
        current tag differs (code changed the probe math, or the config
        changed shard count / size / k) must NOT reuse the persisted
        bitsets — they would return silent false negatives (seen URLs
        re-enqueued and refetched). The crawl engine rebuilds shards from
        the seen table on mismatch."""
        return (
            f"bloom:{PROBE_FORMAT}:shards={self.n_shards}"
            f":bits={self.bits_per_shard}:k={self.n_probes}"
        )


# Version of the probe-derivation math below (_splitmix64 remix + lo/hi
# Kirsch-Mitzenmacher stepping). BUMP THIS whenever _positions would set
# different bits for the same (hash, spec) — persisted bitsets written
# under another version are unusable (false negatives, not errors).
PROBE_FORMAT = "splitmix64-km-v2"


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (the standard public-domain avalanche
    permutation): bijective on uint64, mixes every input bit into every
    output bit. uint64 arithmetic wraps mod 2^64 by design. Shared by
    the bloom probe derivation and the cuckoo bucket derivation — both
    consume keys whose RAW low bits were already spent on shard routing
    (``hash mod n_shards``)."""
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _positions(hashes: np.ndarray, spec: BloomSpec) -> np.ndarray:
    """(n, k) probe positions from 64-bit hashes (Kirsch-Mitzenmacher).

    Works on the raw two's-complement int64 from xxhash64; reinterpret as
    uint64 for modular arithmetic.

    The hash is REMIXED (splitmix64 finalizer — the standard public
    avalanche permutation) before the lo/hi split: shard routing consumed
    ``hash mod n_shards``, so for power-of-two shard counts every key in
    a shard shares the raw hash's low bits — deriving the probe base
    from those directly would pin probe 0 to positions ≡ shard (mod
    gcd(n_shards, m)), concentrating probe-0 bits in ≤1/8 of the
    byte-aligned bitset and inflating the FP rate past BloomSpec's
    target. After the bijective remix the probe bits are independent of
    the bits sharding consumed."""
    h = _splitmix64(hashes.astype(np.int64).view(np.uint64))
    h_lo = h & np.uint64(0xFFFFFFFF)
    h_hi = (h >> np.uint64(32)) | np.uint64(1)  # odd ⇒ full-period stepping
    i = np.arange(spec.n_probes, dtype=np.uint64)
    return (h_lo[:, None] + i[None, :] * h_hi[:, None]) % np.uint64(spec.bits_per_shard)


def _test_bits(bitset: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """All-probes-set membership test; pos is (n, k)."""
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    masks = (1 << (pos & np.uint64(7))).astype(np.uint8)
    return ((bitset[byte_idx] & masks) == masks).all(axis=1)


def _set_bits(bitset: np.ndarray, pos: np.ndarray) -> None:
    byte_idx = (pos >> np.uint64(3)).astype(np.int64).ravel()
    masks = (1 << (pos & np.uint64(7))).astype(np.uint8).ravel()
    np.bitwise_or.at(bitset, byte_idx, masks)


def empty_shards(spark: SparkSession, spec: BloomSpec) -> DataFrame:
    """All-zero shard table. Built distributedly (spark.range) so that a
    4096-shard × multi-MB filter never materializes on the driver."""
    zeros = bytes(spec.bits_per_shard // 8)
    return (
        spark.range(spec.n_shards)
        .select(
            F.col("id").cast("int").alias("shard_id"),
            F.lit(zeros).alias("bitset"),
            F.lit(0).cast("long").alias("n_inserted"),
        )
    )


def with_shard_id(df: DataFrame, spec: BloomSpec, hash_col: str = "url_hash") -> DataFrame:
    return df.withColumn("shard_id", F.pmod(F.col(hash_col), F.lit(spec.n_shards)).cast("int"))


def bloom_test(candidates: DataFrame, shards: DataFrame, spec: BloomSpec,
               hash_col: str = "url_hash") -> DataFrame:
    """Candidates + ``maybe_seen`` boolean. One Arrow batch per shard via
    cogrouped applyInPandas; candidate rows pass through untouched."""
    from pyspark.sql import types as T

    cand = with_shard_id(candidates, spec, hash_col)
    # StructType.add mutates in place — build a fresh copy instead
    out_schema = T.StructType(
        list(cand.schema.fields) + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    cols = [f.name for f in cand.schema.fields]

    def per_shard(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        if shard_pdf.empty:
            return cand_pdf.assign(maybe_seen=False)
        bitset = np.frombuffer(shard_pdf["bitset"].iloc[0], dtype=np.uint8)
        pos = _positions(cand_pdf[hash_col].to_numpy(), spec)
        return cand_pdf.assign(maybe_seen=_test_bits(bitset, pos))

    return (
        cand.groupBy("shard_id")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(per_shard, schema=out_schema)
        .drop("shard_id")
    )


def bloom_insert(candidates: DataFrame, shards: DataFrame, spec: BloomSpec,
                 hash_col: str = "url_hash") -> DataFrame:
    """New shard table with all candidate hashes inserted. Shards with no
    candidates pass through unchanged (full outer cogroup)."""
    cand = with_shard_id(candidates.select(hash_col), spec, hash_col)

    def per_shard(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        if shard_pdf.empty:
            return pd.DataFrame(
                {"shard_id": [shard_id], "bitset": [b""], "n_inserted": [0]}
            ).iloc[0:0]  # shard table must pre-exist; never invent shards
        bitset = np.frombuffer(shard_pdf["bitset"].iloc[0], dtype=np.uint8).copy()
        n = int(shard_pdf["n_inserted"].iloc[0])
        if not cand_pdf.empty:
            pos = _positions(cand_pdf[hash_col].to_numpy(), spec)
            _set_bits(bitset, pos)
            n += len(cand_pdf)
        return pd.DataFrame(
            {"shard_id": [shard_id], "bitset": [bitset.tobytes()], "n_inserted": [n]}
        )

    return (
        shards.groupBy("shard_id")
        .cogroup(cand.groupBy("shard_id"))
        .applyInPandas(
            lambda key, s_pdf, c_pdf: per_shard(key, c_pdf, s_pdf),
            schema=schemas.SEEN_SHARDS,
        )
    )


def bloom_test_insert(candidates: DataFrame, shards: DataFrame, spec: BloomSpec,
                      hash_col: str = "url_hash") -> DataFrame:
    """Fused membership test + insert: ONE cogrouped pass per wave where
    the split ops take two (each pass = shuffle both sides + an Arrow
    round-trip). Emits a UNION-shaped frame the caller persists and
    filters:

    - ``row_kind='v'``: one row per candidate — (hash_col, maybe_seen),
      tested against the PRE-batch bitset (identical to ``bloom_test``).
    - ``row_kind='s'``: one row per existing shard — (shard_id, bitset,
      n_inserted) with every candidate's bits set. Setting bits for a
      maybe-seen candidate is bitwise idempotent, so the resulting
      bitset equals test-then-insert-novel exactly; ``n_inserted``
      counts bloom-fresh candidates (in hybrid mode the split pipeline
      counted fresh + FP-confirmed-novel — a ≤FP-rate difference in the
      METADATA counter only, never in membership).

    Shards with no candidates pass through unchanged; shards are never
    invented for stray shard_ids (candidates there get maybe_seen=False
    and no shard row — same contract as the split ops)."""
    from pyspark.sql import types as T

    cand = with_shard_id(candidates.select(hash_col), spec, hash_col)
    out_schema = T.StructType(
        [
            T.StructField("row_kind", T.StringType(), False),
            T.StructField("shard_id", T.IntegerType(), True),
            T.StructField("bitset", T.BinaryType(), True),
            T.StructField("n_inserted", T.LongType(), True),
            T.StructField(hash_col, T.LongType(), True),
            T.StructField("maybe_seen", T.BooleanType(), True),
        ]
    )
    empty = pd.DataFrame(
        {
            "row_kind": pd.Series(dtype="object"),
            "shard_id": pd.Series(dtype="int32"),
            "bitset": pd.Series(dtype="object"),
            "n_inserted": pd.Series(dtype="int64"),
            hash_col: pd.Series(dtype="int64"),
            "maybe_seen": pd.Series(dtype="object"),
        }
    )

    def per_shard(key, shard_pdf: pd.DataFrame, cand_pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        if cand_pdf.empty and shard_pdf.empty:
            return empty
        if cand_pdf.empty:
            return pd.DataFrame(
                {
                    "row_kind": ["s"],
                    "shard_id": [int(shard_pdf["shard_id"].iloc[0])],
                    "bitset": [shard_pdf["bitset"].iloc[0]],
                    "n_inserted": [int(shard_pdf["n_inserted"].iloc[0])],
                    hash_col: [None],
                    "maybe_seen": [None],
                }
            )
        hashes = cand_pdf[hash_col].to_numpy()
        if shard_pdf.empty:
            seen = np.zeros(len(hashes), dtype=bool)
        else:
            bitset = np.frombuffer(shard_pdf["bitset"].iloc[0], dtype=np.uint8).copy()
            pos = _positions(hashes, spec)
            seen = _test_bits(bitset, pos)
            _set_bits(bitset, pos)
            out.append(
                pd.DataFrame(
                    {
                        "row_kind": ["s"],
                        "shard_id": [int(shard_pdf["shard_id"].iloc[0])],
                        "bitset": [bitset.tobytes()],
                        "n_inserted": [
                            int(shard_pdf["n_inserted"].iloc[0]) + int((~seen).sum())
                        ],
                        hash_col: [None],
                        "maybe_seen": [None],
                    }
                )
            )
        out.append(
            pd.DataFrame(
                {
                    "row_kind": "v",
                    "shard_id": None,
                    "bitset": None,
                    "n_inserted": None,
                    hash_col: hashes,
                    "maybe_seen": seen,
                }
            )
        )
        return pd.concat(out, ignore_index=True)

    return (
        shards.groupBy("shard_id")
        .cogroup(cand.groupBy("shard_id"))
        .applyInPandas(per_shard, schema=out_schema)
    )


def bloom_fp_rate(spec: BloomSpec, n_inserted_per_shard: float) -> float:
    """Theoretical FP rate at the given load — used by tests to assert the
    measured rate stays within ~2x of theory."""
    m, k = spec.bits_per_shard, spec.n_probes
    return (1.0 - math.exp(-k * n_inserted_per_shard / m)) ** k
