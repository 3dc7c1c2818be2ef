"""salted_join ≡ plain join, including under heavy key skew."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.operators.skew import salted_join


def _skewed(spark):
    # 90% of left rows share one key
    left = spark.createDataFrame(
        [Row(k="hot" if i % 10 else f"cold{i}", lid=i) for i in range(1000)]
    )
    right = spark.createDataFrame(
        [Row(k="hot", attr="H")]
        + [Row(k=f"cold{i}", attr=f"C{i}") for i in range(0, 1000, 10)]
    )
    return left, right


def test_salted_inner_equals_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, "k").groupBy("k").count()
    salted = salted_join(left, right, ["k"], n_salts=4, salt_source="lid").groupBy("k").count()
    assert {(r.k, r["count"]) for r in plain.collect()} == {
        (r.k, r["count"]) for r in salted.collect()
    }


def test_salted_left_keeps_unmatched(spark):
    left, right = _skewed(spark)
    extra = left.unionByName(
        left.sparkSession.createDataFrame([Row(k="nomatch", lid=-1)])
    )
    out = salted_join(extra, right, ["k"], n_salts=4, salt_source="lid", how="left")
    row = [r for r in out.collect() if r.k == "nomatch"]
    assert len(row) == 1 and row[0].attr is None


def test_salt_spreads_hot_key(spark):
    left, right = _skewed(spark)
    salted = left.withColumn("_salt", F.pmod(F.hash("lid"), F.lit(4)))
    spread = (
        salted.filter(F.col("k") == "hot").groupBy("_salt").count().collect()
    )
    assert len(spread) == 4  # hot key occupies all salt buckets
    assert max(r["count"] for r in spread) < 900  # no single bucket holds it all


def test_unsupported_how_raises(spark):
    left, right = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")
