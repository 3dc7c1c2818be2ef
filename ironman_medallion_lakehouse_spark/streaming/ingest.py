"""Streaming ingest into the lakehouse: readStream → foreachBatch →
TableStore merge.

Beyond-reference extension (the reference lands batch files only —
SURVEY §2.9): the canonical continuous-bronze pattern. A file-source
stream (Kafka at scale — same plan downstream of the source) feeds
``foreachBatch``, and each micro-batch MERGEs into a manifest-versioned
TableStore table:

- ``merge_insert_only`` per batch gives **idempotent** ingest: a
  replayed micro-batch (restart between sink write and checkpoint
  commit — Structured Streaming's at-least-once foreachBatch contract)
  re-offers the same keys and the anti-join drops them, upgrading the
  path to exactly-once table state.
- Each batch commit is one TableStore version, so the table's CDC feed
  (``table_changes``) doubles as the stream's downstream change log.

``streaming_dedup`` is the in-stream companion: watermark-bounded
drop-duplicates so late replays of the same event_id never reach the
sink, with state expiring past the watermark instead of growing
forever.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.sources.tablestore import ConcurrentCommitError


def streaming_merge_into(
    spark,
    store,
    source_path: str,
    schema,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    commit_retries: int = 5,
    partition_by: list[str] | None = None,
):
    """File-source stream merged continuously into a TableStore table.

    Returns the streaming query; caller drives it (processAllAvailable
    for tests, awaitTermination in production). The checkpoint dir must
    be a durable shared path at scale (it holds source offsets — the
    replay cursor).

    ``partition_by`` sets the layout when the FIRST micro-batch creates
    the table (r2 ADVICE: without it the target was born unpartitioned
    and every later batch inherited that); existing tables keep their
    recorded layout."""

    def _merge_batch(batch_df, batch_id: int) -> None:
        # foreachBatch may replay a batch after restart; insert-only
        # merge on the natural key makes the replay a no-op.
        #
        # A concurrent writer (another stream, an OPTIMIZE) can win the
        # put-if-absent commit race; merge_insert_only re-reads the
        # latest manifest on entry, so losing the race is safely
        # retryable — without this, the first real conflict would kill
        # the whole streaming query.
        for attempt in range(commit_retries + 1):
            try:
                store.merge_insert_only(
                    batch_df, table, keys=keys, partition_by=partition_by
                )
                return
            except ConcurrentCommitError:
                if attempt == commit_retries:
                    raise

    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    return (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_dedup(
    spark,
    source_path: str,
    schema,
    keys: list[str],
    event_time: str = "ts",
    watermark: str = "2 hours",
    sink_name: str = "dedup_sink",
):
    """Watermarked streaming deduplication: only the first arrival of
    each key tuple within the watermark horizon is emitted; the
    key-tracking state is dropped once the watermark passes it, so
    state size is O(keys per horizon), not O(stream).

    Returns (query, sink_name) over a memory sink (append mode — dedup
    emits each survivor exactly once)."""
    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    deduped = stream.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        keys
    )
    query = (
        deduped.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .start()
    )
    return query, sink_name
