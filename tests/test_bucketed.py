"""Bucketed co-located join: both sides bucketed on the join key →
sort-merge join with NO shuffle exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.sources.bucketed import (
    cowrite_for_join,
    read_table,
)


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, no_broadcast, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cowrite_for_join(
        lineitem,
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_lineitem",
        "b_orders",
        join_cols=["l_orderkey"],
        n_buckets=8,
    )
    l, o = read_table(spark, "b_lineitem"), read_table(spark, "b_orders")
    joined = l.join(o, "l_orderkey").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    join_section = plan.split("HashAggregate")[0]
    # co-located: the join itself requires no shuffle of either side
    assert "SortMergeJoin" in plan
    assert "hashpartitioning" not in join_section
    # results still correct
    total = sum(r.n for r in joined.collect())
    assert total == lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).count()
