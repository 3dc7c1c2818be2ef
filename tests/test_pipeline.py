"""End-to-end medallion pipeline tests over the fixture landing CSVs:
full run, incremental idempotency, layer semantics, and the 15 views."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark import config as C
from ironman_medallion_lakehouse_spark import pipeline
from ironman_medallion_lakehouse_spark.config import FileSpec, PipelineConfig
from ironman_medallion_lakehouse_spark.plans.views import VIEW_SQL
from ironman_medallion_lakehouse_spark.sources.tablestore import TableStore


@pytest.fixture(scope="module")
def full_run(spark, landing_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_full"))
    specs = [
        FileSpec(2023, "M", "2023_men.csv"),
        FileSpec(2023, "F", "2023_women.csv"),
        FileSpec(2024, "M", "2024_men.csv"),
        FileSpec(2024, "F", "2024_women.csv"),
    ]
    cfg = PipelineConfig(
        source_dir=landing_dir, warehouse_dir=wh, run_mode="full", files=specs
    )
    result = pipeline.run(spark, cfg)
    return result, TableStore(spark, wh)


def test_full_run_counts(full_run):
    result, _ = full_run
    assert result.bronze_rows == 20  # 11 + 4 + 3 + 2 fixture rows
    assert result.silver_rows == 20
    assert result.fact_rows == 20
    assert result.duplicate_row_keys == 0


def test_bronze_row_key_dedup(full_run, spark):
    _, store = full_run
    bronze = store.read(C.BRONZE_TABLE)
    # duplicate John Smith pair got dup_rank 1 and 2
    keys = sorted(
        r.row_key
        for r in bronze.filter(F.col("athlete_name") == "John Smith").collect()
    )
    assert keys == ["2023_M_johnsmith_1", "2023_M_johnsmith_2"]
    # rank "10" sorts before "11" lexicographically → bib 101 is dup_rank 1
    first = bronze.filter(F.col("row_key") == "2023_M_johnsmith_1").collect()[0]
    assert first.bib == "101"


def test_silver_semantics(full_run):
    _, store = full_run
    silver = store.read(C.SILVER_TABLE)
    laidlow = silver.filter(
        (F.col("athlete_name") == "Sam Laidlow") & (F.col("year") == 2023)
    ).collect()[0]
    assert laidlow.finish_time_seconds == 29182  # "8:06:22"
    assert laidlow.swim_time_seconds == 2870
    assert laidlow.rank == 1 and isinstance(laidlow.rank, int)
    assert laidlow.is_finisher and not laidlow.is_dnf
    assert laidlow.first_name == "Sam" and laidlow.last_name == "Laidlow"
    assert (
        laidlow.calculated_total_seconds
        == 2870 + 186 + 14676 + 175 + 9719
    )

    dnf = silver.filter(F.col("athlete_name") == "Magnus Ditlev").collect()[0]
    assert dnf.is_dnf and dnf.finish_time_seconds is None
    assert dnf.calculated_total_seconds is None  # NULL segments → NULL total

    single = silver.filter(F.col("athlete_name") == "Ironman").collect()[0]
    assert single.last_name is None
    assert single.country is None  # empty CSV field → NULL at read

    glitch = silver.filter(F.col("athlete_name") == "Glitch Row").collect()[0]
    assert glitch.has_data_issue  # finisher with NULL rank


def test_dims(full_run):
    _, store = full_run
    athletes = store.read(C.DIM_ATHLETES)
    # Sam Laidlow appears in 2023+2024 → one row, latest year attrs
    laidlow = athletes.filter(F.col("athlete_natural_key") == "samlaidlow_fr")
    assert laidlow.count() == 1

    countries = store.read(C.DIM_COUNTRIES).collect()
    by_code = {r.country: r for r in countries}
    assert by_code["FR"].country_name == "France"
    assert by_code["FR"].continent == "Europe"
    assert by_code["DE"].athlete_count == 3  # Lange, Haug, Philipp (countDistinct)

    divisions = {r.division: r for r in store.read(C.DIM_DIVISIONS).collect()}
    assert divisions["MPRO"].is_professional and divisions["MPRO"].gender == "M"
    assert divisions["MPRO"].division_description == "Male Professional"
    assert divisions["M18-24"].age_group_start == 18
    assert divisions["M18-24"].division_description == "Male Age 18 to 24"


def test_fact_fk_resolution(full_run):
    result, store = full_run
    fact = store.read(C.FACT_RESULTS)
    assert fact.filter(F.col("athlete_key").isNull()).count() == 0
    assert result.unmatched_fks["athletes"] == 0
    assert len(fact.columns) == 34  # 04d 34-column contract


def test_views(full_run, spark):
    _, _ = full_run
    assert set(VIEW_SQL) == {
        "vw_kpi_metrics", "vw_athletes_by_year", "vw_finish_rate_trend",
        "vw_gender_distribution", "vw_top_countries", "vw_countries_by_year",
        "vw_continent_distribution", "vw_segment_times", "vw_age_group_performance",
        "vw_finish_time_distribution", "vw_top_finishers", "vw_year_over_year",
        "vw_pro_vs_age_group", "vw_dnf_analysis", "vw_fastest_times",
    }
    kpi = spark.sql("SELECT * FROM vw_kpi_metrics").collect()[0]
    assert kpi.total_athletes == 20
    assert kpi.first_year == 2023 and kpi.latest_year == 2024
    top = spark.sql(
        "SELECT * FROM vw_top_finishers WHERE year=2024 AND gender='Male' ORDER BY rank"
    ).collect()
    assert top[0].athlete_name == "Patrick Lange"
    assert top[0].finish_time_formatted == "7:31:30"
    yoy = {r.year: r for r in spark.sql("SELECT * FROM vw_year_over_year").collect()}
    assert yoy[2024].athletes_change == 5 - 15


def test_incremental_idempotent(spark, landing_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_incr"))
    specs = [
        FileSpec(2023, "M", "2023_men.csv"),
        FileSpec(2023, "F", "2023_women.csv"),
        FileSpec(2024, "M", "2024_men.csv"),
        FileSpec(2024, "F", "2024_women.csv"),
    ]
    base = PipelineConfig(
        source_dir=landing_dir, warehouse_dir=wh, run_mode="full",
        files=[s for s in specs if s.year == 2023],
    )
    r1 = pipeline.run(spark, base)
    assert r1.fact_rows == 15

    incr = PipelineConfig(
        source_dir=landing_dir, warehouse_dir=wh, run_mode="incremental",
        process_year=2024, files=specs,
    )
    r2 = pipeline.run(spark, incr)
    assert r2.bronze_rows == 20 and r2.fact_rows == 20

    # Readme.md:7: re-running the same incremental year must be a no-op
    r3 = pipeline.run(spark, incr)
    assert r3.bronze_rows == 20 and r3.silver_rows == 20 and r3.fact_rows == 20

    # SCD-1: Laidlow's dim row reflects the latest year, still one row
    store = TableStore(spark, wh)
    ath = store.read(C.DIM_ATHLETES).filter(
        F.col("athlete_natural_key") == "samlaidlow_fr"
    )
    assert ath.count() == 1


def test_config_validation(landing_dir):
    with pytest.raises(ValueError, match="Invalid run_mode"):
        PipelineConfig(source_dir=landing_dir, warehouse_dir="/tmp/x", run_mode="bogus")
    with pytest.raises(ValueError, match="process_year"):
        PipelineConfig(
            source_dir=landing_dir, warehouse_dir="/tmp/x", run_mode="incremental"
        )
    cfg = PipelineConfig(
        source_dir=landing_dir, warehouse_dir="/tmp/x", run_mode="full",
        files=[FileSpec(2030, "M", "missing.csv")],
    )
    with pytest.raises(FileNotFoundError):
        cfg.validate_sources()


def test_publish_catalog_qualified_sql(full_run, spark):
    """Dashboard queries work by qualified name (gold.vw_*) on a fresh
    session WITHOUT any in-process temp-view registration — the
    reference's ironman.{layer}.table serving surface (01_config:193,
    05_dashboard_queries:49)."""
    from ironman_medallion_lakehouse_spark.plans.catalog import publish_catalog

    _result, store = full_run
    published = publish_catalog(spark, store)
    assert "gold.fact_race_results" in published
    assert "gold.vw_top_finishers" in published

    fresh = spark.newSession()  # no temp views carried over
    assert fresh.catalog.tableExists("gold.fact_race_results")
    top = fresh.sql(
        "SELECT athlete_name FROM gold.vw_top_finishers WHERE year = 2023"
    ).collect()
    assert len(top) > 0
    kpi = fresh.sql("SELECT total_athletes FROM gold.vw_kpi_metrics").collect()[0]
    assert kpi.total_athletes == 20
    # bronze/silver layers addressable too
    assert fresh.sql("SELECT COUNT(*) AS n FROM silver.ironman_results").collect()[0].n == 20


def test_published_view_plans_keep_broadcast_joins(full_run, spark):
    """Plan regression for the serving catalog (VERDICT r4 item 7):
    persistent views are re-expanded per query, so the 100 TB risk is
    a ``gold.vw_*`` silently planning its dim joins as SortMergeJoin
    in some later consumer session. publish_catalog records catalog
    statistics (ANALYZE) at publish time, so every view's dim side
    carries real size stats and plans BroadcastHashJoin — asserted
    here from a FRESH session (no temp views, no in-process hints)
    for every one of the 15 views."""
    from ironman_medallion_lakehouse_spark.plans.catalog import publish_catalog

    _result, store = full_run
    publish_catalog(spark, store)
    fresh = spark.newSession()

    def plan_of(df) -> str:
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    dim_joining = 0
    for vname in VIEW_SQL:
        plan = plan_of(fresh.sql(f"SELECT * FROM gold.{vname}"))
        assert "SortMergeJoin" not in plan, f"{vname} fell to SortMergeJoin"
        if "dim_" in plan:
            dim_joining += 1
            assert "BroadcastHashJoin" in plan, f"{vname} dim join not broadcast"
    # the dim-joining subset must actually exercise the assertion
    assert dim_joining >= 5
    # and the published tables carry catalog stats (what makes the
    # broadcast decision survive a fact that outgrows size heuristics)
    stats = fresh.sql("DESCRIBE TABLE EXTENDED gold.dim_countries").collect()
    assert any("Statistics" in r.col_name for r in stats)
