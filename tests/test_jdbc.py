"""S12 JDBC extract smoke path (sources/jdbc.py) against embedded
Derby — the one JDBC engine shipped inside Spark's own jars, so the
whole round-trip (write → extract → bronze landing) runs in-process
with no external service. Closes the last unimplemented reference
surface (ironman_airflow/dags/ironman_dag.py:60-88, Postgres→CSV→S3).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from ironman_medallion_lakehouse_spark.sources.jdbc import (
    jdbc_extract,
    jdbc_land_to_bronze,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """An embedded Derby database seeded with a 100-row table via
    Spark's own JDBC writer."""
    db_dir = os.path.join(str(tmp_path_factory.mktemp("derby")), "smokedb")
    url = f"jdbc:derby:{db_dir};create=true"
    rows = [
        Row(id=i, name=f"athlete_{i:03d}", score=float(i) * 1.5, season=2020 + i % 4)
        for i in range(1, 101)
    ]
    (
        spark.createDataFrame(rows)
        .write.format("jdbc")
        .option("url", url)
        .option("driver", DERBY_DRIVER)
        .option("dbtable", "results")
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_roundtrip(spark, derby_url):
    df = jdbc_extract(spark, derby_url, "results", driver=DERBY_DRIVER)
    assert df.count() == 100
    got = {r["ID"] if "ID" in r else r["id"] for r in df.collect()}
    assert got == set(range(1, 101))


def test_jdbc_partitioned_extract(spark, derby_url):
    """partition_column turns the extract into parallel range scans;
    bounds are probed with a pushed-down MIN/MAX."""
    df = jdbc_extract(
        spark,
        derby_url,
        "results",
        driver=DERBY_DRIVER,
        partition_column="id",
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100


def test_jdbc_predicate_pushdown_shape(spark, derby_url):
    """The predicate variant wraps the table in a database-side
    subquery — row counts prove the WHERE ran remotely."""
    df = jdbc_extract(
        spark, derby_url, "results", driver=DERBY_DRIVER, predicate='"season" = 2021'
    )
    assert df.count() == 25


def test_jdbc_predicate_applies_to_partition_bounds_probe(spark, derby_url):
    """ADVICE r4: the MIN/MAX bounds probe must run over the FILTERED
    rows. id >= 81 leaves ids 81..100; with predicate-applied bounds a
    4-way split is [81,85),[85,90),[90,95),[95,...] — every partition
    non-empty. With the old raw-table bounds (1..100, stride 24) the
    first three partitions are EMPTY and partition 4 carries all 20
    rows — exactly the skew the fix removes, and what this asserts."""
    df = jdbc_extract(
        spark,
        derby_url,
        "results",
        driver=DERBY_DRIVER,
        predicate='"id" >= 81',
        partition_column="id",
        num_partitions=4,
    )
    assert df.count() == 20
    sizes = [len(p) for p in df.rdd.glom().collect()]
    assert len(sizes) == 4
    assert all(s > 0 for s in sizes), f"empty range partition: {sizes}"


def test_jdbc_lands_with_bronze_metadata(spark, derby_url):
    landed = jdbc_land_to_bronze(spark, derby_url, "results", driver=DERBY_DRIVER)
    cols = set(landed.columns)
    assert {"source_file", "load_timestamp", "load_date"} <= cols
    first = landed.limit(1).collect()[0]
    assert first["source_file"].startswith("jdbc:results@jdbc:derby:")
