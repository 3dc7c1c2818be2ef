"""Mergeable cardinality sketches (Apache DataSketches HLL, exposed by
Spark 4's hll_* functions) — the 100 TB pattern for COUNT(DISTINCT).

An exact grouped countDistinct shuffles every distinct value; at
corpus scale a DISTINCT-heavy dashboard re-shuffles terabytes per
refresh. Sketches change the shape of the problem:

- ``distinct_sketches`` aggregates each fine-grained group to a
  KB-sized HLL sketch ONCE (one shuffle over the raw data, ever);
- ``rollup_distinct`` answers any coarser grouping by merging the
  stored sketches (``hll_union_agg``) — a shuffle over sketch rows,
  not raw rows, typically 10^6× smaller;
- estimates hold a ~2% standard error at lgConfigK=12 (the Spark
  default). Union preserves the error bound (it does not compound —
  merging is sketch algebra, not an approximation of an
  approximation), though DataSketches' sparse→dense mode transitions
  mean a union's estimate may differ from a direct build's by a
  within-bound epsilon.

This is the precomputed-rollup companion to the serving catalog: store
per-(day, country) sketches in a TableStore table, answer per-day /
per-country / global distinct users by union — never touching the
fact table again. Kept out of the 50-entry oracle suite by design
(estimates are engine-specific); correctness is pytest-asserted as
relative-error and merge-consistency bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketches of value_col: (group_cols..., hll binary).
    One shuffle on group_cols; each group reduces to ≤ 2^lg_k bytes."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll")
    )


def rollup_distinct(
    sketches: DataFrame, rollup_cols: list[str]
) -> DataFrame:
    """Approximate distinct count at a coarser grain by UNIONING the
    stored sketches — input is sketch rows, never raw data."""
    grouped = (
        sketches.groupBy(*rollup_cols)
        if rollup_cols
        else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct")
    )
