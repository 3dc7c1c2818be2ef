"""ANALYZE-style table statistics + stats-driven broadcast hinting
(sources/tablestore.analyze / table_stats / read_hinted)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.sources.tablestore import TableStore


def _store(spark, tmp_path) -> TableStore:
    return TableStore(spark, str(tmp_path / "wh"))


def test_analyze_records_counts_ndv_nulls(spark, tmp_path):
    store = _store(spark, tmp_path)
    rows = [Row(k=i, grp=i % 5, label=(None if i % 10 == 0 else f"l{i % 3}")) for i in range(100)]
    store.save_overwrite(spark.createDataFrame(rows), "db.t")
    stats = store.analyze("db.t")
    assert stats["row_count"] == 100
    assert stats["size_bytes"] > 0
    # approx_count_distinct is within a few % at this cardinality
    assert abs(stats["ndv"]["k"] - 100) <= 5
    assert stats["ndv"]["grp"] == 5
    assert stats["ndv"]["label"] == 3
    assert stats["null_count"]["label"] == 10
    assert stats["null_count"]["k"] == 0


def test_table_stats_staleness_is_explicit(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.save_overwrite(spark.createDataFrame([Row(k=1)]), "db.s")
    store.analyze("db.s")
    assert store.table_stats("db.s")["stale_versions"] == 0
    # two more commits without re-analyzing → stats survive, staleness grows
    store.merge_insert_only(spark.createDataFrame([Row(k=2)]), "db.s", keys=["k"])
    store.merge_insert_only(spark.createDataFrame([Row(k=3)]), "db.s", keys=["k"])
    st = store.table_stats("db.s")
    assert st["row_count"] == 1  # describes version 1
    assert st["stale_versions"] == 2
    # re-analyze refreshes to the current version
    st2 = store.analyze("db.s")
    assert st2["row_count"] == 3
    assert store.table_stats("db.s")["stale_versions"] == 0


def test_analyze_skips_non_atomic_columns(spark, tmp_path):
    store = _store(spark, tmp_path)
    df = spark.createDataFrame([Row(k=1, vec=[1.0, 2.0])])
    store.save_overwrite(df, "db.v")
    stats = store.analyze("db.v")
    assert "vec" not in stats["ndv"]
    assert stats["ndv"]["k"] == 1


def test_read_hinted_broadcasts_small_analyzed_table(spark, tmp_path):
    store = _store(spark, tmp_path)
    dim_rows = [Row(grp=i, label=f"g{i}") for i in range(5)]
    store.save_overwrite(spark.createDataFrame(dim_rows), "db.dim")
    store.analyze("db.dim")
    fact = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 5).alias("grp")
    )
    joined = fact.join(store.read_hinted("db.dim"), "grp")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert joined.count() == 10000


def test_read_hinted_without_stats_is_plain_read(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.save_overwrite(spark.createDataFrame([Row(k=1, v="a")]), "db.plain")
    df = store.read_hinted("db.plain")
    assert [r.k for r in df.collect()] == [1]
    # no analyze sidecar → identical plan to read (no ResolvedHint)
    assert "ResolvedHint" not in df._jdf.queryExecution().logical().toString()


def test_read_hinted_respects_threshold(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.save_overwrite(
        spark.createDataFrame([Row(k=i, pad="x" * 100) for i in range(1000)]), "db.big"
    )
    store.analyze("db.big")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # threshold below the table's recorded bytes → no hint
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        df = store.read_hinted("db.big")
        assert "ResolvedHint" not in df._jdf.queryExecution().logical().toString()
        # disabled broadcasting → no hint either
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = store.read_hinted("db.big")
        assert "ResolvedHint" not in df._jdf.queryExecution().logical().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
