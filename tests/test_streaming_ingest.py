"""Streaming → TableStore ingest: idempotent micro-batch merges and
watermarked in-stream deduplication."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.sources.tablestore import TableStore
from ironman_medallion_lakehouse_spark.streaming.ingest import (
    streaming_dedup,
    streaming_merge_into,
)


def _events(spark, ids, hour=0):
    rows = [
        Row(event_id=i, ts=f"2024-01-01 {hour:02d}:{i % 60:02d}:00",
            user_id=i % 3, event_type="click", value=float(i))
        for i in ids
    ]
    return spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))


def test_streaming_merge_into_tablestore(spark, tmp_path):
    src = str(tmp_path / "src")
    store = TableStore(spark, str(tmp_path / "wh"))
    first = _events(spark, range(10))
    first.coalesce(1).write.mode("append").parquet(src)

    query = streaming_merge_into(
        spark, store, src, first.schema, "bronze.events_stream",
        keys=["event_id"], checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        query.processAllAvailable()
        assert store.read("bronze.events_stream").count() == 10
        v1 = store._latest_manifest("bronze.events_stream").version

        # second batch overlaps the first on event_id 5-9: insert-only
        # merge must admit only the 5 genuinely-new keys
        _events(spark, range(5, 15)).coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        out = store.read("bronze.events_stream")
        assert out.count() == 15
        assert out.select("event_id").distinct().count() == 15
        # each micro-batch committed as its own table version, so the
        # CDC feed exposes exactly the streamed increment
        v2 = store._latest_manifest("bronze.events_stream").version
        assert v2 > v1
        assert store.table_changes("bronze.events_stream", v1).count() == 5
    finally:
        query.stop()


def test_streaming_merge_replay_is_idempotent(spark, tmp_path):
    """A restarted stream with a wiped checkpoint replays every source
    file — the insert-only merge makes the replay a no-op (exactly-once
    table state from an at-least-once sink)."""
    src = str(tmp_path / "src")
    store = TableStore(spark, str(tmp_path / "wh"))
    first = _events(spark, range(10))
    first.coalesce(1).write.mode("append").parquet(src)

    for attempt, ckpt in enumerate(["ckpt_a", "ckpt_b"]):
        query = streaming_merge_into(
            spark, store, src, first.schema, "bronze.replayed",
            keys=["event_id"], checkpoint_dir=str(tmp_path / ckpt),
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        assert store.read("bronze.replayed").count() == 10, f"attempt {attempt}"


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    base = _events(spark, range(8))
    base.coalesce(1).write.mode("append").parquet(src)
    # duplicate arrivals of event_id 0-3 inside the watermark horizon
    _events(spark, range(4)).coalesce(1).write.mode("append").parquet(src)

    query, sink = streaming_dedup(
        spark, src, base.schema, keys=["event_id"], sink_name="dd_sink"
    )
    try:
        query.processAllAvailable()
        out = spark.table(sink)
        assert out.count() == 8
        assert out.select("event_id").distinct().count() == 8
    finally:
        query.stop()


def test_streaming_dedup_ingest_gate(spark, tmp_path):
    """The crawl-ingest gate end-to-end: batch 1 founds the corpus;
    batch 2 brings an exact dup (case/whitespace-mangled), a near dup
    (one token changed), and a novel doc — only the novel doc is
    admitted, and the signatures table tracks exactly the corpus."""
    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_dedup_ingest,
    )

    src = str(tmp_path / "docs_src")
    store = TableStore(spark, str(tmp_path / "wh"))
    b1 = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog again and again today"),
        Row(doc_id=2, text="entirely different content about spark shuffles and partitions here"),
    ])
    b1.coalesce(1).write.mode("append").parquet(src)
    query = streaming_dedup_ingest(
        spark, store, src, b1.schema, str(tmp_path / "ckpt"),
        bands=16, threshold=0.8,
    )
    try:
        query.processAllAvailable()
        assert store.read("corpus.documents").count() == 2
        assert store.read("corpus.doc_signatures").count() == 2

        spark.createDataFrame([
            Row(doc_id=10, text="  THE QUICK   brown fox jumps over the lazy dog again and again today "),
            Row(doc_id=11, text="the quick brown fox jumps over the lazy dog again and again tomorrow"),
            Row(doc_id=12, text="totally novel text with no overlap whatsoever in any token plane"),
        ]).coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert admitted == {1, 2, 12}  # exact dup 10 and near dup 11 rejected
        # signature table tracks the admitted set exactly (next batch's
        # band join reads these precomputed rows)
        assert {r.doc_id for r in store.read("corpus.doc_signatures").collect()} == {1, 2, 12}
    finally:
        query.stop()


def test_streaming_gate_decontaminates_against_benchmark(spark, tmp_path):
    """The decontamination arm: a crawl doc sharing an 8-gram with the
    held-out benchmark is refused at the door — before dedup, before
    the corpus ever sees it — while clean docs flow through."""
    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_dedup_ingest,
    )

    src = str(tmp_path / "docs_src")
    store = TableStore(spark, str(tmp_path / "wh"))
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    benchmark = spark.createDataFrame(
        [Row(doc_id=900, text="prefix " + eval_text + " suffix")]
    )
    b1 = spark.createDataFrame([
        # embeds the benchmark 8-gram verbatim -> contaminated
        Row(doc_id=1, text="leading words then " + eval_text + " trailing words"),
        Row(doc_id=2, text="entirely clean content about spark shuffles and partitions here"),
    ])
    b1.coalesce(1).write.mode("append").parquet(src)
    query = streaming_dedup_ingest(
        spark, store, src, b1.schema, str(tmp_path / "ckpt"),
        bands=16, threshold=0.8, benchmark=benchmark,
    )
    try:
        query.processAllAvailable()
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert admitted == {2}
        # later batch: another contaminated doc plus a clean novel one
        spark.createDataFrame([
            Row(doc_id=10, text=eval_text + " with extra tokens appended afterwards"),
            Row(doc_id=11, text="totally novel text with no overlap whatsoever in any token plane"),
        ]).coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert admitted == {2, 11}
    finally:
        query.stop()


def test_streaming_gate_refuses_drifted_batch(spark, tmp_path):
    """The drift arm (q142's KS test at the door): a batch whose
    word-count distribution matches the reference flows through; a
    batch of drastically shorter docs is refused WHOLE — quarantine
    row recorded, corpus untouched — and a later conforming batch is
    admitted again. The recorded D must equal ks_two_sample run
    directly on the same frames (the gate is the operator, not a
    reimplementation)."""
    from pyspark.sql import functions as F

    from ironman_medallion_lakehouse_spark.operators.experiment import ks_two_sample
    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_dedup_ingest,
    )

    src = str(tmp_path / "docs_src")
    store = TableStore(spark, str(tmp_path / "wh"))
    n_words = F.size(F.split(F.col("text"), " "))

    def doc(i, nw):
        return Row(doc_id=i, text=" ".join(f"w{i}t{j}" for j in range(nw)))

    # reference distribution: 40-60-word docs
    reference = spark.createDataFrame([doc(900 + i, 40 + i % 21) for i in range(30)])

    b1 = spark.createDataFrame([doc(i, 45 + i % 10) for i in range(1, 9)])
    b1.coalesce(1).write.mode("append").parquet(src)
    query = streaming_dedup_ingest(
        spark, store, src, b1.schema, str(tmp_path / "ckpt"),
        bands=16, threshold=0.8,
        drift_reference=reference, drift_signal=n_words, drift_max_d=0.5,
    )
    try:
        query.processAllAvailable()
        assert store.read("corpus.documents").count() == 8  # conforming: admitted
        assert not store.table_exists("corpus.refused_batches")

        # drifted batch: 3-5-word docs (scraper regression shape)
        b2 = spark.createDataFrame([doc(100 + i, 3 + i % 3) for i in range(8)])
        b2.coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert admitted == set(range(1, 9))  # nothing from the drifted batch
        refused = store.read("corpus.refused_batches").collect()
        assert len(refused) == 1 and refused[0].n_docs == 8
        # the gate's D is EXACTLY the operator's D on the same data
        both = b2.select(
            n_words.cast("double").alias("_sig"), F.lit("new").alias("_side")
        ).unionByName(
            reference.select(
                n_words.cast("double").alias("_sig"), F.lit("ref").alias("_side")
            )
        )
        want = ks_two_sample(both, "_sig", "_side", "new", "ref").collect()[0]
        assert refused[0].d_stat == want.d_stat
        assert want.d_stat > 0.5

        # recovery: a conforming batch after the refusal is admitted —
        # spread across the reference range (a narrow 4-doc batch
        # concentrated at 50-53 words legitimately scores D≈0.63 vs a
        # 40-60 reference: small-sample KS is jumpy by construction)
        b3 = spark.createDataFrame(
            [doc(200 + i, 40 + (3 * i) % 21) for i in range(8)]
        )
        b3.coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert set(range(200, 208)) <= admitted
        assert store.read("corpus.refused_batches").count() == 1
    finally:
        query.stop()


def test_streaming_gate_psi_drift_arm(spark, tmp_path):
    """drift_test='psi': the binned drift screen refuses a shifted
    batch whole (quarantine row records the PSI the operator itself
    computes on the same frames), then admits a conforming batch."""
    from pyspark.sql import functions as F

    from ironman_medallion_lakehouse_spark.operators.experiment import psi_drift
    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_dedup_ingest,
    )

    src = str(tmp_path / "docs_src")
    store = TableStore(spark, str(tmp_path / "wh"))
    n_words = F.size(F.split(F.col("text"), " "))
    # bins chosen so the 40-60-word reference spans the [40,50)/[50,70)
    # pair; a conforming batch lands in both, the 3-5-word drifted
    # batch lands entirely in the first bin
    edges = [10.0, 25.0, 40.0, 50.0, 70.0]

    def doc(i, nw):
        return Row(doc_id=i, text=" ".join(f"w{i}t{j}" for j in range(nw)))

    reference = spark.createDataFrame([doc(900 + i, 40 + i % 21) for i in range(30)])
    b1 = spark.createDataFrame([doc(i, 45 + i % 10) for i in range(1, 9)])
    b1.coalesce(1).write.mode("append").parquet(src)
    query = streaming_dedup_ingest(
        spark, store, src, b1.schema, str(tmp_path / "ckpt"),
        bands=16, threshold=0.8,
        drift_reference=reference, drift_signal=n_words,
        drift_test="psi", drift_psi_edges=edges, drift_max_psi=0.5,
    )
    try:
        query.processAllAvailable()
        assert store.read("corpus.documents").count() == 8
        assert not store.table_exists("corpus.refused_batches")

        b2 = spark.createDataFrame([doc(100 + i, 3 + i % 3) for i in range(8)])
        b2.coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert admitted == set(range(1, 9))
        refused = store.read("corpus.refused_batches").collect()
        assert len(refused) == 1 and refused[0].n_docs == 8
        both = b2.select(
            n_words.cast("double").alias("_sig"), F.lit("new").alias("_side")
        ).unionByName(
            reference.select(
                n_words.cast("double").alias("_sig"), F.lit("ref").alias("_side")
            )
        )
        want = psi_drift(both, "_sig", "_side", "new", "ref", bin_edges=edges).collect()[0]
        assert refused[0].psi == want.psi and want.psi > 0.5

        b3 = spark.createDataFrame([doc(200 + i, 40 + (3 * i) % 21) for i in range(8)])
        b3.coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert set(range(200, 208)) <= admitted
        assert store.read("corpus.refused_batches").count() == 1
    finally:
        query.stop()


def test_streaming_gate_psi_requires_edges(spark, tmp_path):
    import pytest as _pytest

    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_dedup_ingest,
    )

    store = TableStore(spark, str(tmp_path / "wh"))
    ref = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with _pytest.raises(ValueError, match="drift_psi_edges"):
        streaming_dedup_ingest(
            spark, store, str(tmp_path / "s"), ref.schema, str(tmp_path / "c"),
            drift_reference=ref, drift_test="psi",
        )


def test_streaming_gate_kll_drift_arm(spark, tmp_path):
    """drift_test='kll': the reference collapses to a sketch grid at
    stream start; a conforming batch flows, a drifted batch is refused
    with the recorded D matching ks_kll_from_grids on the same data."""
    from pyspark.sql import functions as F

    from ironman_medallion_lakehouse_spark.operators.experiment import (
        kll_quantile_grid,
        ks_kll_from_grids,
    )
    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_dedup_ingest,
    )

    src = str(tmp_path / "docs_src")
    store = TableStore(spark, str(tmp_path / "wh"))
    n_words = F.size(F.split(F.col("text"), " "))

    def doc(i, nw):
        return Row(doc_id=i, text=" ".join(f"w{i}t{j}" for j in range(nw)))

    reference = spark.createDataFrame([doc(900 + i, 40 + i % 21) for i in range(30)])
    b1 = spark.createDataFrame([doc(i, 40 + (3 * i) % 21) for i in range(1, 9)])
    b1.coalesce(1).write.mode("append").parquet(src)
    query = streaming_dedup_ingest(
        spark, store, src, b1.schema, str(tmp_path / "ckpt"),
        bands=16, threshold=0.8,
        drift_reference=reference, drift_signal=n_words,
        drift_test="kll", drift_max_d=0.6,
    )
    try:
        query.processAllAvailable()
        assert store.read("corpus.documents").count() == 8
        assert not store.table_exists("corpus.refused_batches")

        b2 = spark.createDataFrame([doc(100 + i, 3 + i % 3) for i in range(8)])
        b2.coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        assert store.read("corpus.documents").count() == 8
        refused = store.read("corpus.refused_batches").collect()
        assert len(refused) == 1 and refused[0].n_docs == 8
        want = ks_kll_from_grids(
            kll_quantile_grid(
                reference.select(n_words.cast("double").alias("_sig")), "_sig"
            ),
            kll_quantile_grid(
                b2.select(n_words.cast("double").alias("_sig")), "_sig"
            ),
        ).collect()[0]
        assert refused[0].d_kll == want.d_kll and want.d_kll > 0.6
    finally:
        query.stop()


def test_streaming_gate_drift_refusal_replay_idempotent(spark, tmp_path):
    """The refusal path's exactly-once story, exercised at the actual
    failure point: foreachBatch replays a batch when the process dies
    AFTER the sink's side-effects but BEFORE the checkpoint commit —
    simulated by deleting the checkpoint's commits/<n> marker for the
    refused batch and restarting. The replayed batch recomputes the
    same D and re-merges the SAME keyed quarantine row (batch_id), so
    the table converges: still one refusal row, corpus untouched; a
    conforming batch after the replay is admitted normally."""
    import os

    from pyspark.sql import functions as F

    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_dedup_ingest,
    )

    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "ckpt")
    store = TableStore(spark, str(tmp_path / "wh"))
    n_words = F.size(F.split(F.col("text"), " "))

    def doc(i, nw):
        return Row(doc_id=i, text=" ".join(f"w{i}t{j}" for j in range(nw)))

    def start():
        return streaming_dedup_ingest(
            spark, store, src, b1.schema, ckpt,
            bands=16, threshold=0.8,
            drift_reference=reference, drift_signal=n_words, drift_max_d=0.5,
        )

    reference = spark.createDataFrame([doc(900 + i, 40 + i % 21) for i in range(30)])
    b1 = spark.createDataFrame([doc(i, 45 + i % 10) for i in range(1, 9)])
    b1.coalesce(1).write.mode("append").parquet(src)
    query = start()
    try:
        query.processAllAvailable()  # batch 0 admitted (bootstrap)
        b2 = spark.createDataFrame([doc(100 + i, 3 + i % 3) for i in range(8)])
        b2.coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()  # batch 1 refused
        refused = store.read("corpus.refused_batches").collect()
        assert len(refused) == 1 and refused[0].batch_id == 1
        d_first = refused[0].d_stat
    finally:
        query.stop()
    query.awaitTermination()  # fully release the checkpoint before restart

    # crash window: side-effects landed, commit marker didn't (the
    # Hadoop checksum sidecar must go too or the replay's atomic
    # rewrite fails as FileAlreadyExists)
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)

    query = start()
    try:
        query.processAllAvailable()  # batch 1 REPLAYS (same id, same files)
        refused = store.read("corpus.refused_batches").collect()
        assert len(refused) == 1  # keyed merge converged, no second row
        assert refused[0].batch_id == 1 and refused[0].d_stat == d_first
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert admitted == set(range(1, 9))  # replay admitted nothing

        # recovery after the replay
        b3 = spark.createDataFrame([doc(200 + i, 40 + (3 * i) % 21) for i in range(8)])
        b3.coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        admitted = {r.doc_id for r in store.read("corpus.documents").collect()}
        assert set(range(200, 208)) <= admitted
        assert store.read("corpus.refused_batches").count() == 1
    finally:
        query.stop()
