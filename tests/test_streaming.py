"""Structured-streaming surface: incremental triple ingest + determinism
of the pipeline output across input parallelism (the sandbox proxy for
cluster-size independence, SURVEY.md §7.3 risk 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from halyard_spark import corpus
from halyard_spark.pipeline import extract
from halyard_spark.streaming import ingest


def test_stream_triple_ingest_matches_batch(spark, tmp_path):
    src = corpus.generate_src(spark, 60)
    src_dir = str(tmp_path / "src_stream")
    src.write.parquet(src_dir)

    out = str(tmp_path / "out")
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    ingest.stream_triple_ingest(spark, stream, out)

    streamed = spark.read.parquet(f"{out}/mentions_stream")
    batch = extract.extract_mentions(spark.read.parquet(src_dir))
    cols = batch.columns
    assert streamed.select(cols).exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed.select(cols)).count() == 0


def test_quads_identical_across_input_parallelism(spark, tmp_path):
    """The full pipeline emission must be a pure function of the data —
    byte-identical at any partitioning (cluster size)."""
    from halyard_spark.pipeline import run

    a_src = corpus.generate_src(spark, 150, parallelism=2)
    b_src = corpus.generate_src(spark, 150, parallelism=16).repartition(16)

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    run.run_pipeline(spark, a_src, out_a)
    run.run_pipeline(spark, b_src, out_b)
    qa = {tuple(r) for r in spark.read.parquet(f"{out_a}/store/spo").collect()}
    qb = {tuple(r) for r in spark.read.parquet(f"{out_b}/store/spo").collect()}
    assert qa == qb
