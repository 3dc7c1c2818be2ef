"""Custom stateful streaming: running per-key aggregates with
applyInPandasWithState.

Beyond-reference extension (the reference has no streaming at all —
SURVEY §2.9). Demonstrates the arbitrary-stateful-operator path:
per-group state lives in the state store across micro-batches, the
user function sees Arrow-batched pandas frames, and output mode
"update" emits one row per touched key per batch. This is the pattern
for custom operators that windowed aggs can't express (running
distinct-ish counters, decayed scores, per-entity ML features).
"""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

RUNNING_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running_totals(key, pdf_iter, state: GroupState):
    # local imports only: this closure is cloudpickled to executors
    import pandas as pd

    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(spark, source_path: str, schema, sink_name: str = "running_totals_sink"):
    """readStream → groupBy(user).applyInPandasWithState → memory sink.

    State (count, sum) persists in the state store across micro-batches;
    each batch emits the updated running totals for the users it
    touched. Returns (query, sink_name)."""
    from ironman_medallion_lakehouse_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)
    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    query = (
        updated.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("update")
        .start()
    )
    return query, sink_name
