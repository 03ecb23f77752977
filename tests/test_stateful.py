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


def test_running_totals_negative_values_multibatch(spark, tmp_path):
    """The final total must come from the LATEST batch's row, not a
    per-column max: with negative event values the running total is
    non-monotone (code-review regression)."""
    import os

    from halyard_spark.streaming.stateful import run_user_totals_once

    src = str(tmp_path / "events")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 5.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(
        [(1, -3.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(src + "/b2")
    # one file per micro-batch: two update rows for u1, totals 5.0 then 2.0
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for sub in ("b1", "b2"):
        for f in os.listdir(f"{src}/{sub}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{src}/{sub}/{f}", f"{flat}/part-{n}.parquet")
                n += 1
    spark.conf.set("spark.sql.streaming.fileSource.log.compactInterval", "10")
    out = run_user_totals_once_multibatch(spark, flat)
    row = out.collect()[0]
    assert row["n_events"] == 2
    assert abs(row["total_value"] - 2.0) < 1e-9


def run_user_totals_once_multibatch(spark, path):
    import uuid

    from pyspark.sql import functions as F

    from halyard_spark.streaming.stateful import running_user_totals

    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    name = f"ut_{uuid.uuid4().hex[:8]}"
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
    return spark.sql(f"SELECT * FROM {name}").groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.expr("max_by(total_value, n_events)").alias("total_value"),
    )
