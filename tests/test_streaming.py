"""Structured Streaming parity: the streaming tumbling-window query
must produce the same aggregates as the batch F.window plan."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.streaming.event_windows import (
    streaming_tumbling_counts,
    tumbling_counts,
)


def test_streaming_matches_batch(spark, tmp_path):
    rows = [
        Row(event_id=i, ts=f"2024-01-01 {h:02d}:{i % 60:02d}:00", user_id=i % 5,
            event_type=t, value=float(i))
        for i, (h, t) in enumerate(
            [(0, "click"), (0, "view"), (0, "click"), (1, "click"), (1, "error"),
             (2, "view"), (2, "view"), (2, "click"), (3, "signup"), (3, "click")]
        )
    ]
    events = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    batch = {
        (r.window_start, r.event_type): r.n_events
        for r in tumbling_counts(events, "1 hour").collect()
    }

    stored = spark.read.parquet(src)
    query, sink = streaming_tumbling_counts(
        spark, src, stored.schema, duration="1 hour", sink_name="t_sink"
    )
    try:
        query.processAllAvailable()
        streamed = {
            (r.window_start, r.event_type): r.n_events
            for r in spark.table(sink).collect()
        }
    finally:
        query.stop()

    assert streamed == batch
    assert len(batch) > 0
