"""Distributed as-of (point-in-time) join.

A custom operator Spark lacks natively (task-class: as-of/temporal
join; DuckDB exposes it as ASOF JOIN, which serves as the oracle).
Implemented as the classic scalable composition — union-tag-window —
rather than a range join:

1. Tag left rows (side=1) and right rows (side=0) and union them on
   (keys, ts, side, right-row-struct).
2. One window per key ordered by (ts, side): ``last(struct,
   ignorenulls=True)`` carries the most recent whole right row forward
   as one struct — so every unpacked output column comes from the same
   matched row and genuinely-NULL payload fields are preserved.
   side=0 sorts before side=1 at equal ts, giving ``left.ts >=
   right.ts`` (inclusive backward) semantics.
3. Keep side=1 rows and unpack the struct.

Cost: ONE shuffle on the join keys + a sort — no range explosion, no
per-row binary search, skew governed by key cardinality like any
window. This is the standard distributed as-of used for point-in-time
correctness in feature stores and market-data joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` keys (inclusive
    backward as-of). Right payload columns come back suffixed; the
    matched right timestamp is ``<right_ts><suffix>``. Unmatched left
    rows keep NULL payloads (left-outer semantics).

    Right rows must be unique per (keys, right_ts) — pre-aggregate
    ties upstream (deterministic and cheap) or results are ambiguous,
    exactly as with DuckDB/pandas as-of joins.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    out_cols = [f"{c}{suffix}" for c in right_payload] + [f"{right_ts}{suffix}"]

    # The whole right row travels as ONE nullable struct so a single
    # last(_r, ignorenulls=True) carries it: all output columns come
    # from the SAME matched right row, and a right payload column that
    # is legitimately NULL stays NULL (per-column last() would skip it
    # and mix fields across different right rows — r2 ADVICE fix).
    r_struct = F.struct(
        F.col(right_ts).alias("_ts_val"),
        *[F.col(c).alias(c) for c in right_payload],
    )
    null_struct_src = right.select(r_struct.alias("_r")).schema["_r"].dataType

    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(null_struct_src).alias("_r"),
    )
    null_left = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left.columns
        if c not in on
    ]
    right_tagged = right.select(
        *[F.col(c) for c in on],
        *null_left,
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        r_struct.alias("_r"),
    ).select(*[F.col(c) for c in left.columns], "_side", "_ts", "_r")

    unioned = left_tagged.unionByName(right_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_m"),
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_payload],
            F.col("_m._ts_val").alias(f"{right_ts}{suffix}"),
        )
        .select(*left.columns, *out_cols)
    )
