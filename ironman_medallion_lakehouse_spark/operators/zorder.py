"""Z-order (Morton) clustering expression — balanced multi-column
data skipping.

Range clustering (`TableStore.save_overwrite(cluster_by=...)`) sorts
on a column list, so footer min/max stats are selective on the LEADING
column only; probes on the second column still scan every file. A
Z-curve interleaves the bits of per-column quantile buckets, so files
(= contiguous z-ranges) cover small hyper-rectangles and min/max
skipping works on EVERY clustered column at once — the OPTIMIZE …
ZORDER BY semantics, built from Column expressions (CASE buckets +
shiftleft/bitwise OR; no UDF, stays in codegen).

Bucket boundaries are approxQuantile cuts (driver-side, O(bits)
values per column), making the curve skew-robust: each bucket holds
~1/2^bits of the rows regardless of the value distribution — uniform
width_bucket would collapse under skew.

Used via ``TableStore.save_overwrite(..., zorder_by=[...])`` /
``optimize(..., zorder_by=[...])``, which range-partition + sort on
the z-value so each file owns a narrow z-range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, cuts: list[float]) -> Column:
    """Quantile-bucket id 0..len(cuts) as a CASE chain (NULL → 0 so
    null rows cluster together at the curve origin). Compared in
    double space — the same space the cuts were computed in."""
    v = F.col(col).cast("double")
    expr: Column = F.lit(len(cuts))
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(v <= F.lit(cuts[i]), F.lit(i)).otherwise(expr)
    return F.when(v.isNull(), F.lit(0)).otherwise(expr)


def zorder_value(
    df: DataFrame, columns: list[str], bits_per_col: int = 4
) -> Column:
    """The interleaved z-value Column for ``columns`` (numeric or
    date/timestamp — anything approxQuantile accepts after a double
    cast). 2^bits_per_col quantile buckets per column; bit i of column
    j lands at interleaved position i*len(columns)+j."""
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE driver action computes all columns' quantiles in a single
    # scan (df.approxQuantile with a column list runs one shared
    # QuantileSummaries job; nulls are ignored per column) — the
    # per-column form was n full scans of the input (r2 VERDICT).
    all_cuts = df.select(
        *[F.col(c).cast("double").alias(c) for c in columns]
    ).approxQuantile(columns, probs, 0.01)
    z = F.lit(0).cast("long")
    for j, col in enumerate(columns):
        # deduplicate degenerate cuts (low-cardinality columns); NaNs
        # (all-null columns) drop out of the sorted set comparison
        cuts = sorted({c for c in all_cuts[j] if c == c})
        bucket = _bucket_expr(col, cuts).cast("long")
        for i in range(bits_per_col):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(columns) + j))
    return z
