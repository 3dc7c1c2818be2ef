"""Mergeable sketches (Apache DataSketches HLL/KLL/Theta, exposed by
Spark 4's built-in functions) — the 100 TB pattern for COUNT(DISTINCT),
quantiles, and set-overlap questions.

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


def quantile_sketches(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """Per-group KLL sketch of value_col (cast to double):
    (group_cols..., kll binary). Unlike percentile_approx results,
    these are STORABLE AND MERGEABLE — compute once at the fine grain,
    answer any coarser quantile question later without re-reading raw
    data. k=200 gives ~1.7% rank error (DataSketches default)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "kll"
        )
    )


def rollup_quantiles(
    sketches: DataFrame, rollup_cols: list[str], probs: list[float]
) -> DataFrame:
    """Quantiles at a coarser grain by MERGING stored KLL sketches.

    Spark exposes kll merge only as a scalar 2-arg function (no merge
    aggregate), so the fold is collect_list + F.aggregate: first
    element seeds the fold, the rest merge pairwise. The collected
    array holds one ~KB sketch per FINE group inside each coarse
    group — bounded by the grain ratio (e.g. 365 day-sketches per
    year-row), never by raw data size. Output: one ``q_<prob>`` double
    column per requested rank."""
    grouped = (
        sketches.groupBy(*rollup_cols) if rollup_cols else sketches.groupBy()
    )
    merged = grouped.agg(F.collect_list("kll").alias("ks")).withColumn(
        "kll",
        F.when(
            F.size("ks") == 1, F.element_at("ks", 1)
        ).otherwise(
            F.aggregate(
                F.slice("ks", 2, F.size("ks") - 1),
                F.element_at("ks", 1),
                lambda acc, s: F.kll_sketch_merge_double(acc, s),
            )
        ),
    )
    qcols = [
        F.kll_sketch_get_quantile_double("kll", F.lit(p)).alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in probs
    ]
    return merged.select(*rollup_cols, *qcols)


def theta_sketches(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group Theta sketch of value_col: (group_cols..., theta
    binary). Theta sketches support the full set algebra (union,
    intersection, difference) — HLL only unions — so they answer
    overlap questions ('distinct users active in BOTH segments')
    from stored sketches."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col, F.lit(lg_k)).alias("theta")
    )


def rollup_theta(
    sketches: DataFrame, rollup_cols: list[str], op: str = "union"
) -> DataFrame:
    """Distinct-count rollup over stored theta sketches.

    op='union' → distinct across the merged fine groups (same
    semantics as rollup_distinct); op='intersection' → distinct
    elements present in EVERY fine group of the coarse group
    (retention-style: 'users active on all 7 days of the week')."""
    if op == "union":
        agg = F.theta_union_agg("theta")
    elif op == "intersection":
        agg = F.theta_intersection_agg("theta")
    else:
        raise ValueError(f"op must be union|intersection, got {op!r}")
    grouped = (
        sketches.groupBy(*rollup_cols) if rollup_cols else sketches.groupBy()
    )
    return grouped.agg(F.theta_sketch_estimate(agg).alias("approx_distinct"))
