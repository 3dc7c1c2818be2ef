"""Bucketed catalog tables — shuffle-free co-located joins.

At 100 TB the dominant cost of a large-large equi-join is shuffling
both sides. Hash-bucketing both tables on the join key at write time
(``bucketBy`` + ``sortBy``) stores co-partitioned, pre-sorted data, so
a later sort-merge join needs **no Exchange and no Sort** — Spark's
bucketing metadata proves the distribution requirement is already met.

This complements the TableStore (manifest-versioned, partition-pruned):
use the store for mutable medallion tables, bucketed catalog tables for
large immutable fact-to-fact join workloads (e.g. lineitem ⋈ orders at
every query). Verified by plan assertion in tests/test_bucketed.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write df as a bucketed (and bucket-sorted) parquet catalog table.

    n_buckets should be sized so one bucket of the LARGER table fits an
    executor's memory at target scale (at 100 TB with ~512 MB target
    bucket files that's O(10^5) buckets — bucket count must match on
    both sides of the intended join)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables between sessions but their
    # managed locations persist on disk; clear any orphaned location
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, table.split(".")[-1]), ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cowrite_for_join(
    left: DataFrame,
    right: DataFrame,
    left_table: str,
    right_table: str,
    join_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Bucket both sides of a recurring join identically (same columns,
    same bucket count) so every subsequent join between them is
    exchange-free."""
    save_bucketed(left, left_table, join_cols, n_buckets)
    save_bucketed(right, right_table, join_cols, n_buckets)
