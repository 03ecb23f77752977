"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming (SURVEY.md §2.8); this is part of the
beyond-reference training-data surface: a per-key running aggregate with
explicit state — the building block for dedup-over-stream, session
accumulation, or incremental entity statistics.

Pattern: groupBy(key).applyInPandasWithState(fn, outputSchema,
stateSchema, "update", timeout) — fn receives (key, batch iterator,
GroupState) and persists a tuple between micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """events stream -> per-user running (count, sum) with explicit state."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_user_totals_once(spark: SparkSession, events_path: str) -> DataFrame:
    """Drive the stateful operator over the events table read as a stream;
    returns the final per-user totals (memory sink, synchronous)."""
    import os
    import tempfile
    import uuid

    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        stage = tempfile.mkdtemp(prefix="stateful_src_")
        os.symlink(os.path.abspath(events_path), os.path.join(stage, os.path.basename(events_path)))
        events_path = stage
    stream = spark.readStream.schema(schema).parquet(events_path)
    name = f"user_totals_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode emits one row per key per micro-batch; the LATEST row
    # per key is the final running total.  n_events is the per-key event
    # COUNT, so it is strictly monotone across batches — select the row
    # with the max count and take ITS total via max_by (independent
    # per-column max could pair a count and a total from different
    # batches, wrong whenever values go negative)
    return spark.sql(f"SELECT * FROM {name}").groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.expr("max_by(total_value, n_events)").alias("total_value"),
    )
