"""Scalable global running sums — the two-pass range-partitioned
cumulative-sum pattern.

A naive global cumulative sum (``Window.orderBy(keys)`` with no
partition key) forces every row through ONE task: Spark plans an
``Exchange SinglePartition`` + in-task sort, which is the canonical
scale-killer shape — fine at sf0.1, the slowest task in the plan at
100 TB (VERDICT r6 item 4 flagged q125's ABC cut for exactly this).

``partitioned_running_sum`` keeps the same exact semantics with no
serial section over the data:

1. ``repartitionByRange(n, *keys)`` — a range shuffle (sampled range
   bounds, the same mechanism as any global sort) places each row in a
   partition whose key-range precedes all later partitions';
2. a per-partition running sum (``Window.partitionBy(pid).orderBy``)
   runs in parallel across partitions;
3. per-partition totals (tiny: one row per partition) get a prefix
   window over *n* rows — the only single-partition step, bounded by
   the partition COUNT, not the data — and are broadcast-joined back
   as offsets.

Cost: one range Exchange + one pid-hash Exchange + a broadcast of n
rows. Every stage is parallel; cluster-size the serial input (n) not
the data. Decimal-exact: sums stay in the column's own type.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partitioned_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """``df`` plus ``out_col`` = SUM(``value_col``) over rows ordered
    by ``order_by`` (unbounded-preceding .. current-row), computed with
    the two-pass range-partitioned plan documented in the module
    docstring — no single-partition pass over the data.

    ``order_by`` must be a total order (include a tiebreaker column)
    for the result to be deterministic, exactly as with a plain
    ``Window.orderBy`` running sum.

    ``total_col``: also attach the grand total of ``value_col`` to
    every row (for cumulative-share queries). It is summed from the
    per-partition totals and rides the same broadcast — no separate
    aggregation branch re-scanning the input.
    """
    pid = F.spark_partition_id()
    if num_partitions is not None:
        ranged = df.repartitionByRange(num_partitions, *order_by)
    else:
        ranged = df.repartitionByRange(*order_by)
    # materialize the range-partition id BEFORE any further exchange;
    # spark_partition_id is non-deterministic so Catalyst pins it here
    ranged = ranged.withColumn("__rs_pid", pid)

    w_local = Window.partitionBy("__rs_pid").orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = ranged.withColumn("__rs_local", F.sum(value_col).over(w_local))

    # one row per range partition -> prefix offsets over n rows only
    # bounded-serial: one row per range partition (cluster-sized, not data-sized)
    w_prefix = Window.orderBy("__rs_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded-serial: grand total over the same one-row-per-partition frame
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    offset_cols = [
        "__rs_pid",
        (F.sum("__rs_ptot").over(w_prefix) - F.col("__rs_ptot")).alias("__rs_offset"),
    ]
    if total_col is not None:
        offset_cols.append(F.sum("__rs_ptot").over(w_all).alias(total_col))
    offsets = (
        ranged.groupBy("__rs_pid")
        .agg(F.sum(value_col).alias("__rs_ptot"))
        .select(*offset_cols)
    )

    # inner join: every pid in `local` appears in `offsets` (both sides
    # derive from the same ranged rows); the first partition's offset
    # is an exact 0 of the sum type
    return (
        local.join(F.broadcast(offsets), "__rs_pid")
        .withColumn(out_col, F.col("__rs_local") + F.col("__rs_offset"))
        .drop("__rs_pid", "__rs_local", "__rs_offset")
    )
