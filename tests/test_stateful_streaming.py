"""applyInPandasWithState: state must accumulate across micro-batches
and final running totals must equal the batch ground truth."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.streaming.stateful import running_user_totals


def _rows(batch: int):
    return [
        Row(event_id=batch * 100 + i, user_id=i % 3, value=float(i + batch))
        for i in range(6)
    ]


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    b1 = spark.createDataFrame(_rows(0))
    b1.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    query, sink = running_user_totals(spark, src, schema, sink_name="rt_sink")
    try:
        query.processAllAvailable()
        first = {r.user_id: r.n_events for r in spark.table(sink).collect()}
        assert first == {0: 2, 1: 2, 2: 2}

        # second micro-batch arrives as a new file
        b2 = spark.createDataFrame(_rows(1))
        b2.coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()

        # memory sink in update mode appends updated rows; take the last
        # emission per user
        rows = spark.table(sink).collect()
        latest = {}
        for r in rows:
            latest[r.user_id] = (r.n_events, r.total_value)
    finally:
        query.stop()

    truth = (
        b1.unionByName(b2)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    for r in truth:
        n, t = latest[r.user_id]
        assert n == r.n
        assert abs(t - r.t) < 1e-9
