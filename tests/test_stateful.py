from __future__ import annotations

from pyspark.sql import functions as F

from halyard_spark.streaming.stateful import run_user_totals_once


def test_stateful_running_totals_match_batch(spark, sf001_dir):
    path = f"{sf001_dir}/events.parquet"
    got = run_user_totals_once(spark, path)
    expected = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    g = {(r.user_id, r.n_events, r.total_value) for r in got.collect()}
    e = {(r.user_id, r.n_events, r.total_value) for r in expected.collect()}
    assert g == e
