"""ironman_medallion_lakehouse_spark — a PySpark-native medallion lakehouse engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference repo ``nischaldinesh/ironman-medallion-lakehouse`` (a Bronze →
Silver → Gold Delta lakehouse over Databricks), re-expressed Spark-first:

- DataFrame/SQL plans optimized by Catalyst (predicate pushdown, column
  pruning, AQE broadcast/skew handling) instead of notebook-orchestrated
  imperative steps.
- A pure-Spark versioned-parquet table store (``sources.tablestore``) that
  provides the Delta semantics the reference relies on (MERGE insert-only,
  SCD-1 upsert, OPTIMIZE compaction) without delta-spark.
- Year-partitioned tables so Catalyst partition pruning replaces the
  reference's manual driver-side file pruning
  (reference: notebooks_databricks/01_config.ipynb:292-296).

Beyond reference parity the package adds large-scale training-data pipeline
operators (exact/minhash/simhash dedup, ANN similarity search, text
analysis, multimodal column plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"

from ironman_medallion_lakehouse_spark.session import get_spark  # noqa: F401
