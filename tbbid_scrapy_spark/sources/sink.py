"""Snapshot tables + MERGE-upsert emulation on plain parquet.

The reference upserts row-at-a-time into Postgres with natural keys and
a query-before-write existence check (/root/reference/xizang/pipelines/
bidSaver.py:37-395, CompanyEmployee.py:28-188, winner_bid.py:20-67).
The engine's sink is set-oriented: one MERGE per table per wave.

Iceberg jars are not available in this sandbox (SURVEY.md §7 plan B), so
``SnapshotTable`` provides the same two properties we need from Iceberg —
atomic commits and versioned snapshots for resume — on plain parquet:

- every commit writes a brand-new version directory ``v{n:08d}``;
- a tiny ``_LATEST`` pointer file is swapped atomically (os.replace);
- readers resolve the pointer then read that immutable directory;
- resume = read whatever ``_LATEST`` points at (a half-written version
  directory is unreachable because the pointer flips only after the
  parquet write completes).

On a real cluster the identical call sites would target Iceberg
``MERGE INTO`` — the interface (merge keys per table, column-level
matched-update expressions) is deliberately shaped like it.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class SnapshotTable:
    """Versioned parquet table with atomic pointer swap."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_LATEST")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.root, f"v{v:08d}")

    def exists(self) -> bool:
        return self.current_version() is not None

    def read(self) -> DataFrame:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed version in {self.root}")
        return self.spark.read.parquet(self._version_dir(v))

    def commit(self, df: DataFrame) -> int:
        """Write df as the next version; flip the pointer only after the
        write fully succeeds (crash between write and flip leaves the old
        version live — lossless resume)."""
        v = (self.current_version() or 0) + 1
        out = self._version_dir(v)
        df.write.mode("overwrite").parquet(out)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_LATEST_tmp")
        with os.fdopen(fd, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer)
        return v

    def rollback_to(self, v: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_LATEST_tmp")
        with os.fdopen(fd, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer)


MatchedExpr = Callable[[str], Column]
# signature: column_name -> merged Column; inside, reference t (target) and
# s (source) sides via F.col("t." + name) / F.col("s." + name).


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    on_matched: dict[str, MatchedExpr] | None = None,
    source_order: list[str] | None = None,
) -> DataFrame:
    """Set-oriented MERGE: WHEN MATCHED update / WHEN NOT MATCHED insert.

    - ``source`` is first deduplicated on ``keys`` (last row wins by
      ``source_order``, else arbitrary-but-deterministic by the key
      columns) — the batch analog of the reference processing items
      sequentially where the last write wins.
    - default matched behavior: source column replaces target column when
      source is matched (full-row update, like bidSaver.py's
      update-else-insert); per-column overrides via ``on_matched``
      express side effects like ``bid_count = t.bid_count + 1``
      (CompanyEmployee.py:121-122).
    - implemented as one full_outer join on the keys → one shuffle, AQE
      handles skew; at cluster scale this call site becomes Iceberg
      MERGE INTO with identical semantics.
    """
    on_matched = on_matched or {}
    data_cols = [c for c in target.columns if c not in keys]
    assert set(target.columns) == set(source.columns), (
        f"schema mismatch: {target.columns} vs {source.columns}"
    )

    order_cols = source_order or keys
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    src = (
        source.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # presence markers survive the outer join even when key columns are
    # legitimately NULL (join uses eqNullSafe)
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = src.withColumn("_s_present", F.lit(True)).alias("s")
    joined = t.join(s, on=[F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
                    how="full_outer")
    s_present = F.col("s._s_present").isNotNull()
    t_present = F.col("t._t_present").isNotNull()

    out_cols = []
    for k in keys:
        out_cols.append(F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k))
    for c in data_cols:
        if c in on_matched:
            upd = on_matched[c](c)
        else:
            upd = F.col(f"s.{c}")
        out_cols.append(
            F.when(s_present & t_present, upd)
            .when(s_present, F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
        )
    return joined.select(*out_cols)
