"""Parity run on the REFERENCE'S OWN data: the full medallion pipeline
over the real 2023-2025 Kona race-result CSVs from
/root/reference/ironman_scraper/Data (read-only; staged via symlinks).

Expected counts come from BASELINE.md (raw input volume: 2023 M/F
2,269/2,174; 2024 M/F 2,491/1,384; 2025 M/F 2,535/1,673 = 12,526)
and known public results (Sam Laidlow won Kona 2023 men in 8:06:22).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark import config as C
from ironman_medallion_lakehouse_spark import pipeline
from ironman_medallion_lakehouse_spark.config import FileSpec, PipelineConfig
from ironman_medallion_lakehouse_spark.sources.tablestore import TableStore

DATA = "/root/reference/ironman_scraper/Data"

FILES = [
    (2023, "M", "2023_men.csv"),
    (2023, "F", "2023_women.csv"),
    (2024, "M", "ironman_kona_2024_men_complete_results.csv"),
    (2024, "F", "ironman_kona_2024_women_complete_results.csv"),
    (2025, "M", "ironman_kona_2025_men_complete_results.csv"),
    (2025, "F", "ironman_kona_2025_women_complete_results.csv"),
]

YEAR_GENDER_COUNTS = {
    (2023, "M"): 2269,
    (2023, "F"): 2174,
    (2024, "M"): 2491,
    (2024, "F"): 1384,
    (2025, "M"): 2535,
    (2025, "F"): 1673,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data not present"
)


@pytest.fixture(scope="module")
def reference_run(spark, tmp_path_factory):
    landing = tmp_path_factory.mktemp("ref_landing")
    for year, _gender, fname in FILES:
        d = landing / f"year={year}"
        d.mkdir(exist_ok=True)
        os.symlink(os.path.join(DATA, fname), d / fname)
    wh = str(tmp_path_factory.mktemp("ref_wh"))
    cfg = PipelineConfig(
        source_dir=str(landing),
        warehouse_dir=wh,
        run_mode="full",
        files=[FileSpec(y, g, f) for y, g, f in FILES],
    )
    result = pipeline.run(spark, cfg)
    return result, TableStore(spark, wh)


def test_reference_volume(reference_run):
    result, store = reference_run
    assert result.bronze_rows == 12526  # BASELINE.md raw input volume
    assert result.silver_rows == 12526
    assert result.fact_rows == 12526
    assert result.duplicate_row_keys == 0
    counts = {
        (r.year, r.source_gender): r.n
        for r in store.read(C.BRONZE_TABLE)
        .groupBy("year", "source_gender")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == YEAR_GENDER_COUNTS


def test_reference_2023_winner(reference_run, spark):
    _, _ = reference_run
    top = spark.sql(
        """
        SELECT athlete_name, country_name, finish_time_seconds, finish_time_formatted
        FROM vw_top_finishers
        WHERE year = 2023 AND gender = 'Male' AND rank = 1
        """
    ).collect()
    assert len(top) == 1
    assert top[0].athlete_name == "Sam Laidlow"
    assert top[0].country_name == "France"
    assert top[0].finish_time_seconds == 29182  # 8:06:22
    assert top[0].finish_time_formatted == "8:06:22"


def test_reference_views_populate(reference_run, spark):
    _, _ = reference_run
    kpi = spark.sql("SELECT * FROM vw_kpi_metrics").collect()[0]
    assert kpi.total_athletes == 12526
    assert kpi.first_year == 2023 and kpi.latest_year == 2025
    assert 0 < kpi.finish_rate_pct < 100
    years = {r.year for r in spark.sql("SELECT year FROM vw_finish_rate_trend").collect()}
    assert years == {2023, 2024, 2025}
    # every view is queryable and non-empty on real data
    from ironman_medallion_lakehouse_spark.plans.views import VIEW_SQL

    for name in VIEW_SQL:
        assert spark.sql(f"SELECT * FROM {name}").count() > 0, name


def test_reference_dims(reference_run, spark):
    _, store = reference_run
    athletes = store.read(C.DIM_ATHLETES)
    # one row per natural key
    assert (
        athletes.groupBy("athlete_natural_key").count().filter("count > 1").count() == 0
    )
    divisions = {r.division for r in store.read(C.DIM_DIVISIONS).collect()}
    assert "MPRO" in divisions and "FPRO" in divisions
    fr = store.read(C.DIM_COUNTRIES).filter(F.col("country") == "FR").collect()
    assert fr and fr[0].country_name == "France" and fr[0].continent == "Europe"
