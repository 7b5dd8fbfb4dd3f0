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


def _durable_replace(root: str, final: str, content: str) -> None:
    """Atomically (and DURABLY) replace ``final`` with ``content``:
    fsync the temp file before the rename and fsync the directory after,
    so a power loss cannot leave the rename durable while the bytes are
    not (ext4/xfs delayed allocation) — an empty pointer/manifest after
    a crash would destroy the only resume point the old file held."""
    fd, tmp = tempfile.mkstemp(dir=root, prefix=os.path.basename(final) + "_tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    dfd = os.open(root, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


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
        version live — lossless resume). The next version consults BOTH
        the pointer and the directory listing: write_version (manifest
        mode, pointer never flipped) shares this namespace, and deriving
        from the pointer alone would overwrite a manifest-referenced
        version directory."""
        v = max(self.current_version() or 0, self._max_version()) + 1
        out = self._version_dir(v)
        df.write.mode("overwrite").parquet(out)
        _durable_replace(self.root, self._pointer, str(v))
        return v

    def rollback_to(self, v: int) -> None:
        _durable_replace(self.root, self._pointer, str(v))

    # -- manifest-coordinated mode (multi-table atomic commits) -------------
    # write_version/read_version do NOT touch the _LATEST pointer: a
    # higher-level Catalog manifest records which version of EVERY table
    # belongs to a consistent snapshot and flips once (ADVICE: per-table
    # pointer flips let a crash leave e.g. new-frontier + old-seen live).

    def _max_version(self) -> int:
        vs = [
            int(d[1:]) for d in os.listdir(self.root)
            if d.startswith("v") and d[1:].isdigit()
        ]
        return max(vs, default=0)

    def write_version(self, df: DataFrame) -> int:
        """Write df as a new immutable version directory WITHOUT flipping
        the pointer; returns the version for a Catalog manifest. Orphan
        versions from a crash before the manifest flip are unreferenced
        and harmless."""
        v = self._max_version() + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        return v

    def read_version(self, v: int) -> DataFrame:
        return self.spark.read.parquet(self._version_dir(v))


class DeltaTable:
    """Append-only table as immutable per-wave part directories.

    A commit writes ONLY the new part (O(wave delta), never O(total
    history) — the fix for the r1 full-union rewrite); which parts belong
    to a consistent snapshot is the Catalog manifest's job. Reading all
    committed parts is ONE multi-path parquet scan (a single source node,
    not a union of per-part plans)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def part_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write_part(self, df: DataFrame, label: str) -> str:
        name = f"part-{label}"
        df.write.mode("overwrite").parquet(self.part_dir(name))
        return name

    def read(self, names: list[str]) -> DataFrame:
        assert names, f"no committed parts in {self.root}"
        return self.spark.read.parquet(*[self.part_dir(n) for n in names])


class Catalog:
    """Atomic multi-table snapshot manifest: ONE os.replace covers every
    table's version / part list plus scalar state (wave, next_seq), so a
    crash anywhere in a commit leaves the previous manifest — and only
    fully consistent state — readable."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _path(self) -> str:
        return os.path.join(self.root, "_MANIFEST")

    def read(self) -> dict | None:
        import json

        try:
            with open(self._path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def commit(self, manifest: dict) -> None:
        import json

        _durable_replace(self.root, self._path, json.dumps(manifest))


def to_merge_sql(
    table: str,
    keys: list[str],
    cols: list[str],
    on_matched_sql: dict[str, str] | None = None,
    source: str = "_incoming",
) -> str:
    """The Iceberg/Delta ``MERGE INTO`` statement with the exact
    semantics ``merge_upsert`` emulates on parquet — the plan-A sink
    interface the north-star names (reference upsert semantics:
    bidSaver.py:37-395, models/models.py:51-90). On a cluster with a v2
    catalog the call site is ``spark.sql(to_merge_sql(...))`` against a
    temp view ``source``; in this sandbox SnapshotTable executes the same
    semantics and this generator is syntax-pinned in tests via Spark's
    SQL parser.

    ``on_matched_sql`` gives per-column UPDATE expressions over aliases
    ``t`` (target) / ``s`` (source) — e.g. counter accumulation
    ``coalesce(t.bid_count,0)+coalesce(s.bid_count,0)``; unlisted columns
    take the source value (full-row update-else-insert, like the
    reference's query-before-write upsert)."""
    on_matched_sql = on_matched_sql or {}
    data_cols = [c for c in cols if c not in keys]
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
    sets = ", ".join(
        f"t.{c} = {on_matched_sql.get(c, f's.{c}')}" for c in data_cols
    )
    col_list = ", ".join(cols)
    val_list = ", ".join(f"s.{c}" for c in cols)
    update = f"WHEN MATCHED THEN UPDATE SET {sets} " if data_cols else ""
    return (
        f"MERGE INTO {table} t USING {source} s ON {on} "
        f"{update}"
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({val_list})"
    )


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
      ``source_order``; the default orders by ALL columns — key columns
      cannot break ties between rows sharing that key, so a keys-only
      order would keep a shuffle-dependent arbitrary row when the same
      key arrives with different payloads). Callers whose source carries
      non-orderable columns (maps) must pass ``source_order``.
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

    order_cols = source_order or (keys + data_cols)
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
