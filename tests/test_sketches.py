"""HLL sketch operators: estimates within the sketch's error bound,
and rollups by sketch UNION agree with sketches built from raw data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.operators.sketches import (
    distinct_sketches,
    rollup_distinct,
)


def _events(spark):
    # 4 days × 3 countries, overlapping user populations
    return (
        spark.range(0, 20000)
        .withColumn("day", (F.col("id") % 4).cast("int"))
        .withColumn("country", (F.col("id") % 3).cast("int"))
        .withColumn("user_id", (F.col("id") * 7919) % 5000)
    )


def test_estimates_within_error_bound(spark):
    df = _events(spark)
    sk = distinct_sketches(df, ["day", "country"], "user_id")
    est = {
        (r.day, r.country): r.approx_distinct
        for r in rollup_distinct(sk, ["day", "country"]).collect()
    }
    exact = {
        (r.day, r.country): r.n
        for r in df.groupBy("day", "country")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for key, n in exact.items():
        assert abs(est[key] - n) <= max(0.05 * n, 2.0), key


def test_rollup_by_union_matches_direct_sketch(spark):
    """Merging fine-grained sketches must agree with sketching the raw
    data at the coarse grain — union preserves the error bound (mode
    transitions allow a small epsilon, but no error compounding)."""
    df = _events(spark)
    fine = distinct_sketches(df, ["day", "country"], "user_id")
    via_union = {
        r.day: r.approx_distinct for r in rollup_distinct(fine, ["day"]).collect()
    }
    direct = {
        r.day: r.approx_distinct
        for r in rollup_distinct(
            distinct_sketches(df, ["day"], "user_id"), ["day"]
        ).collect()
    }
    assert set(via_union) == set(direct)
    for day, d in direct.items():
        assert abs(via_union[day] - d) <= 0.03 * d, day
    # global rollup (empty grouping) also within bound of the exact count
    total = rollup_distinct(fine, []).collect()[0].approx_distinct
    exact_total = df.select(F.countDistinct("user_id")).collect()[0][0]
    assert abs(total - exact_total) <= 0.05 * exact_total
