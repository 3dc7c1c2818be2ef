"""streaming_volume_monitor (streaming/ingest.py): the sequential
level-shift screen over per-batch ingest volume — CUSUM/EWMA charts
(operators/experiment) composed with the TableStore's keyed merges.
Pins: alarm fires at the planted shift and names the right batch, the
chart stat equals the operator run directly on the recorded series
(gate-stat ≡ operator-stat, the r7 streaming-gate discipline), stable
volume never alarms, and replay is idempotent for both tables."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from ironman_medallion_lakehouse_spark.sources.tablestore import TableStore


def _docs(spark, start_id: int, n: int):
    # coalesce(1): each append commits exactly ONE file (atomic rename),
    # so the always-on file-source poller cannot split an append across
    # two micro-batches — these tests assert exact per-batch volumes.
    return spark.createDataFrame(
        [Row(doc_id=start_id + i, text=f"document number {start_id + i}") for i in range(n)]
    ).coalesce(1)


def _start(spark, store, src, schema, ckpt, **kw):
    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_volume_monitor,
    )

    return streaming_volume_monitor(
        spark, store, src, schema, ckpt, baseline_n=4, **kw
    )


def test_cusum_alarm_on_volume_jump(spark, tmp_path):
    """Baseline batches of 3-4 docs, then a sustained jump to 12:
    the alert row appears, keyed at the first crossing, and its stat
    equals cusum_changepoint run directly on the recorded series."""
    from ironman_medallion_lakehouse_spark.operators.experiment import (
        cusum_changepoint,
        series_params,
    )

    src = str(tmp_path / "src")
    store = TableStore(spark, str(tmp_path / "wh"))
    sizes = [3, 4, 3, 4, 3, 12, 12, 12]
    first = _docs(spark, 0, sizes[0])
    first.write.mode("append").parquet(src)
    query = _start(spark, store, src, first.schema, str(tmp_path / "ckpt"))
    try:
        query.processAllAvailable()
        base = 100
        for s in sizes[1:]:
            # coalesce(1): atomic single-file append — the live query's
            # trigger must see each logical batch whole (the test_ivf
            # partial-listing flake), or the monitor logs it twice
            _docs(spark, base, s).coalesce(1).write.mode("append").parquet(src)
            base += 100
            query.processAllAvailable()
        vols = store.read("monitor.batch_volumes")
        assert vols.count() == len(sizes)
        assert sorted(r.n_docs for r in vols.collect()) == sorted(sizes)
        alerts = store.read("monitor.volume_alerts").collect()
        assert len(alerts) == 1
        a = alerts[0]
        assert a.side == "up"  # a jump fires the upper chart only
        # the alert records the chart state AT FIRST CROSSING (the
        # insert-only keyed merge keeps the first row): running the
        # operator on the first n_points batches reproduces the stat
        assert a.n_points >= a.alarm_t
        ordered = sorted(r.batch_id for r in vols.collect())
        prefix = vols.select("batch_id", "n_docs").filter(
            vols.batch_id <= ordered[a.n_points - 1]
        )
        p = series_params(prefix, "batch_id", "n_docs", baseline_n=4)
        chart = cusum_changepoint(prefix, "batch_id", "n_docs", p).collect()[0]
        assert a.alarm_t == chart.alarm_t
        assert a.stat == chart.s_max
        # the named batch is within the shifted regime (batch index 6+
        # 1-based; CUSUM needs a point or two of accumulation)
        assert a.alarm_t >= 6
        # alarm_batch_id resolves the index to the actual batch id
        assert a.alarm_batch_id == ordered[a.alarm_t - 1]
    finally:
        query.stop()


def test_cusum_alarm_on_volume_drop(spark, tmp_path):
    """A lost source (volume DROP) fires the lower chart — the upper
    chart alone would stay silent forever on negative deviations."""
    src = str(tmp_path / "src")
    store = TableStore(spark, str(tmp_path / "wh"))
    sizes = [3, 4, 3, 4, 3, 1, 1, 1]
    first = _docs(spark, 0, sizes[0])
    first.write.mode("append").parquet(src)
    query = _start(spark, store, src, first.schema, str(tmp_path / "ckpt"))
    try:
        query.processAllAvailable()
        base = 100
        for s in sizes[1:]:
            # coalesce(1): atomic single-file append — the live query's
            # trigger must see each logical batch whole (the test_ivf
            # partial-listing flake), or the monitor logs it twice
            _docs(spark, base, s).coalesce(1).write.mode("append").parquet(src)
            base += 100
            query.processAllAvailable()
        alerts = store.read("monitor.volume_alerts").collect()
        assert {a.side for a in alerts} == {"down"}
        assert alerts[0].alarm_t >= 6
    finally:
        query.stop()


def test_stable_volume_never_alarms(spark, tmp_path):
    src = str(tmp_path / "src")
    store = TableStore(spark, str(tmp_path / "wh"))
    sizes = [3, 4, 3, 4, 4, 3, 4, 3]
    first = _docs(spark, 0, sizes[0])
    first.write.mode("append").parquet(src)
    query = _start(spark, store, src, first.schema, str(tmp_path / "ckpt"))
    try:
        query.processAllAvailable()
        base = 100
        for s in sizes[1:]:
            # coalesce(1): atomic single-file append — the live query's
            # trigger must see each logical batch whole (the test_ivf
            # partial-listing flake), or the monitor logs it twice
            _docs(spark, base, s).coalesce(1).write.mode("append").parquet(src)
            base += 100
            query.processAllAvailable()
        assert store.read("monitor.batch_volumes").count() == len(sizes)
        assert not store.table_exists("monitor.volume_alerts")
    finally:
        query.stop()


def test_standing_alarm_merges_one_row_and_replay_idempotent(spark, tmp_path):
    """A persisting shift keeps the FIRST crossing index stable, so
    later batches re-merge the same keyed alert row; restarting the
    stream from a fresh checkpoint (full replay of the source) leaves
    both tables unchanged."""
    src = str(tmp_path / "src")
    store = TableStore(spark, str(tmp_path / "wh"))
    sizes = [3, 4, 3, 4, 12, 12, 12, 12, 12]
    first = _docs(spark, 0, sizes[0])
    first.write.mode("append").parquet(src)
    query = _start(spark, store, src, first.schema, str(tmp_path / "ckpt"))
    try:
        query.processAllAvailable()
        base = 100
        for s in sizes[1:]:
            # coalesce(1): atomic single-file append — the live query's
            # trigger must see each logical batch whole (the test_ivf
            # partial-listing flake), or the monitor logs it twice
            _docs(spark, base, s).coalesce(1).write.mode("append").parquet(src)
            base += 100
            query.processAllAvailable()
        alerts1 = [tuple(r) for r in store.read("monitor.volume_alerts").collect()]
        assert len(alerts1) == 1  # standing alarm did not spam rows
        vols1 = sorted(tuple(r) for r in store.read("monitor.batch_volumes").collect())
    finally:
        query.stop()
    # fresh checkpoint -> the file source replays everything in one
    # batch-id sequence; keyed merges converge to the same state
    query2 = _start(spark, store, src, first.schema, str(tmp_path / "ckpt2"))
    try:
        query2.processAllAvailable()
        assert (
            sorted(tuple(r) for r in store.read("monitor.batch_volumes").collect())
            == vols1
        )
        assert [
            tuple(r) for r in store.read("monitor.volume_alerts").collect()
        ] == alerts1
    finally:
        query2.stop()


def test_ewma_chart_option(spark, tmp_path):
    """chart='ewma' runs the EWMA chart instead; a modest persistent
    upward shift alarms and the stat column carries ewma_last."""
    from ironman_medallion_lakehouse_spark.operators.experiment import (
        ewma_control,
        series_params,
    )

    src = str(tmp_path / "src")
    store = TableStore(spark, str(tmp_path / "wh"))
    sizes = [6, 7, 6, 7, 6, 10, 10, 10, 10]
    first = _docs(spark, 0, sizes[0])
    first.write.mode("append").parquet(src)
    query = _start(
        spark, store, src, first.schema, str(tmp_path / "ckpt"), chart="ewma"
    )
    try:
        query.processAllAvailable()
        base = 100
        for s in sizes[1:]:
            # coalesce(1): atomic single-file append — the live query's
            # trigger must see each logical batch whole (the test_ivf
            # partial-listing flake), or the monitor logs it twice
            _docs(spark, base, s).coalesce(1).write.mode("append").parquet(src)
            base += 100
            query.processAllAvailable()
        alerts = store.read("monitor.volume_alerts").collect()
        assert len(alerts) == 1
        a = alerts[0]
        # same first-crossing contract as the CUSUM test: the stat is
        # ewma_last over the first n_points batches
        vols = store.read("monitor.batch_volumes")
        ordered = sorted(r.batch_id for r in vols.collect())
        prefix = vols.select("batch_id", "n_docs").filter(
            vols.batch_id <= ordered[a.n_points - 1]
        )
        p = series_params(prefix, "batch_id", "n_docs", baseline_n=4)
        chart = ewma_control(prefix, "batch_id", "n_docs", p).collect()[0]
        assert a.alarm_t == chart.alarm_t
        assert a.stat == chart.ewma_last
    finally:
        query.stop()


def test_rejects_unknown_chart(spark, tmp_path):
    from ironman_medallion_lakehouse_spark.streaming.ingest import (
        streaming_volume_monitor,
    )

    store = TableStore(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="chart"):
        streaming_volume_monitor(
            spark, store, str(tmp_path / "src"), None, str(tmp_path / "ckpt"),
            chart="shewhart",
        )
