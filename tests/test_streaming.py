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

    streamed = ingest.read_epochs(spark, f"{out}/mentions_stream")
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


def test_stream_ndjsonld_ingest_equals_batch(spark, tmp_path):
    """Streaming ND-JSON-LD ingest == batch parse of the same lines."""
    from halyard_spark.sources.rio import ndjsonld_to_triples
    from halyard_spark.streaming.ingest import stream_ndjsonld_ingest

    src_dir = str(tmp_path / "lines")
    out = str(tmp_path / "out")
    lines = [
        '{"@id": "urn:a", "urn:p:name": "Ada", "@type": "urn:T"}',
        '{"@id": "urn:b", "urn:p:ref": {"@id": "urn:a"}}',
        "garbage line",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    df.coalesce(1).write.mode("overwrite").text(src_dir)

    stream = spark.readStream.schema("value string").text(src_dir)
    stream_ndjsonld_ingest(spark, stream, out)

    from halyard_spark.streaming.ingest import read_epochs
    streamed = {tuple(r) for r in read_epochs(spark, f"{out}/triples_stream").collect()}
    batch = {tuple(r) for r in ndjsonld_to_triples(spark.read.text(src_dir)).collect()}
    assert streamed == batch and len(batch) == 3


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming dedup == batch exact dedup, across micro-batch boundaries."""
    import glob

    from halyard_spark.streaming.ingest import stream_exact_dedup

    src = str(tmp_path / "src")
    rows = [(i, f"text {i % 6}") for i in range(20)]  # 6 distinct contents
    spark.createDataFrame(rows, "doc_id long, text string").repartition(5).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = str(tmp_path / "out")
    stream_exact_dedup(spark, stream, out)
    from halyard_spark.streaming.ingest import read_epochs
    got = read_epochs(spark, f"{out}/docs_dedup_stream")
    texts = [r["text"] for r in got.collect()]
    assert sorted(set(texts)) == sorted(texts)  # no duplicate content survived
    assert len(texts) == 6
    assert len(glob.glob(f"{src}/*.parquet")) > 1  # really exercised >1 epoch


def test_epoch_write_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running an epoch (driver retry)
    must REPLACE that epoch's output, not append duplicates
    (code-review regression)."""
    from halyard_spark.streaming.ingest import _epoch_write, read_epochs

    base = str(tmp_path / "sink")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    _epoch_write(df, base, 0)
    _epoch_write(df, base, 0)  # the retry
    _epoch_write(spark.createDataFrame([(3, "c")], "id long, v string"), base, 1)
    got = sorted(tuple(r) for r in read_epochs(spark, base).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_dedup_fails_closed_on_corrupt_state(spark, tmp_path):
    """A corrupt committed sink must ABORT the epoch, not silently skip
    the seen-set and re-admit duplicates (code-review regression)."""
    import os

    import pytest

    from halyard_spark.streaming.ingest import stream_exact_dedup

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "x")], "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "out")
    sink_path = f"{out}/docs_dedup_stream"
    os.makedirs(f"{sink_path}/epoch=0")
    with open(f"{sink_path}/epoch=0/part-00000.parquet", "w") as f:
        f.write("not a parquet file")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(Exception):
        stream_exact_dedup(spark, stream, out)
