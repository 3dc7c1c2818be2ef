"""Physical-plan regression tests: the optimizations the suite relies
on must actually appear in the plan (SURVEY §4). Catching a regression
here (filter not pushed, dim not broadcast, codegen broken) matters as
much as value correctness at 100 TB."""

from __future__ import annotations

import pytest

from ironman_medallion_lakehouse_spark import suite

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _plan(spark, name: str) -> str:
    return _plan_of(suite.queries()[name](spark, SF))


def test_filter_and_projection_pushdown(spark):
    plan = _plan(spark, "q02_filter_project")
    assert "PushedFilters:" in plan
    # range + comparison filters reach the parquet scan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThan" in plan
    # only the referenced columns are read (column pruning): schema
    # should not include unused wide columns
    assert "l_comment" not in plan
    assert "l_tax" not in plan


def test_dim_joins_are_broadcast(spark):
    plan = _plan(spark, "q04_star_join")
    # tree section lists each join once more in the detail section
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in plan


def test_lookup_join_broadcast_and_codegen(spark):
    # q03/q13 are unregistered plan fixtures (their operator families are
    # driver-verified through q04/q25/q26/q66) — call the shapes directly
    plan = _plan_of(suite.q03_dim_lookup_join(spark, SF))
    assert "BroadcastHashJoin" in plan
    # codegen subtrees only materialize in the AQE final plan — execute,
    # then inspect the executed plan
    df = suite.q03_dim_lookup_join(spark, SF)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(N)' prefixes mark whole-stage-codegen'd operators; the join,
    # project and partial agg must all be inside codegen stages
    assert "*(2) BroadcastHashJoin" in executed or "*(1) BroadcastHashJoin" in executed
    assert "partial_count" in executed  # map-side partial aggregation


def test_topk_uses_take_ordered(spark):
    plan = _plan_of(suite.q13_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_partial_aggregation_present(spark):
    # map-side partial agg (HashAggregate appears twice: partial+final)
    plan = _plan(spark, "q01_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_sessionization_single_shuffle(spark):
    # lag + running-sum windows share one (user_id, ts) sort: exactly one
    # exchange for the window stage (plus the final groupBy exchange)
    plan = _plan(spark, "q52_sessionization")
    assert plan.count("Exchange") <= 2


def test_year_partitioned_table_prunes(spark, tmp_path):
    """TableStore year-partitioning turns filter(year=Y) into partition
    pruning: the non-matching partition's files are not scanned."""
    from pyspark.sql import Row

    from ironman_medallion_lakehouse_spark.sources.tablestore import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [Row(year=2023, v=i) for i in range(10)]
        + [Row(year=2024, v=i) for i in range(10)]
    )
    store.save_overwrite(df, "db.t", partition_by=["year"])
    scan = store.read("db.t").filter("year = 2024")
    assert scan.count() == 10
    explain = scan._sc._jvm.PythonSQLUtils.explainString(
        scan._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in explain and "year" in explain
