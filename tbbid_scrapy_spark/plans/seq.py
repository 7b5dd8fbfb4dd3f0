"""Distributed dense sequence assignment (scalable zipWithIndex).

The frontier needs a global enqueue counter ``seq`` (the ordering oracle's
tiebreak). A naive ``row_number() OVER (ORDER BY …)`` funnels every row
through ONE task — the classic global-window scale trap. Instead:

1. range-repartition + sort-within-partitions on the order key
   (global sort, fully parallel);
2. count rows per partition (tiny driver-side collect — one row per
   partition);
3. add the broadcast cumulative offsets to the per-partition row index.
   The index comes from the low 33 bits of monotonically_increasing_id()
   (partition id in the high bits, a 0-based per-partition row counter in
   the low 33) — a pure projection over the already-sorted partitions.
   A window partitioned by spark_partition_id would instead force an
   Exchange hashpartitioning(_pid) + re-sort (RangePartitioning does not
   satisfy the window's required clustering), i.e. a SECOND full shuffle
   of the frontier per wave.

The result equals the single-task global row_number but every stage is
partition-parallel; this is the standard two-pass global-indexing scheme
(same idea as RDD.zipWithIndex)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_index(
    df: DataFrame,
    order_cols: list,
    out_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, DataFrame | None]:
    """Add ``out_col`` = start + global rank (0-based) by ``order_cols``;
    returns (indexed_df, total_rows, persisted_handle). ``order_cols`` must be a total order
    (add a unique tiebreak column). The returned DataFrame is persisted
    (it was materialized to count partitions anyway) — callers reuse it
    without recomputation and the total row count comes for free."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    d = d.persist()
    counts = {r["_pid"]: r["cnt"] for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        d.unpersist()
        return df.withColumn(out_col, F.lit(start).cast("long")), 0, None
    offset_map = F.create_map(
        *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
    )
    # Low 33 bits of monotonically_increasing_id = 0-based row index
    # within the physical partition being scanned (rows are already in
    # order from sortWithinPartitions); the stored _pid keys the offset.
    # No window ⇒ no Exchange ⇒ the only shuffle is the range partition.
    row_in_part = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    out = d.withColumn(
        out_col,
        (row_in_part + F.element_at(offset_map, F.col("_pid")) + F.lit(start)).cast("long"),
    ).drop("_pid")
    return out, acc, d
