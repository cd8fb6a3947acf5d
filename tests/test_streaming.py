"""Streaming shell: batch ≡ streaming output on the same fixture
(SURVEY.md §7.2.6); AvailableNow gives a finite, deterministic run."""

import os

from flink_elasticsearch_ingestion_spark.operators import copy as C
from flink_elasticsearch_ingestion_spark.sources.sinks import ParquetSink
from flink_elasticsearch_ingestion_spark.sources.tables import load_events
from flink_elasticsearch_ingestion_spark.streaming.shell import stream_copy


def _input_dir(tmp_path, sf_dir):
    """The file stream source requires a directory; stage the fixture
    parquet into one via symlink."""
    d = tmp_path / "in"
    d.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_equals_batch(tmp_path, spark, sf_dir):
    # events.ts is ns parquet -> stream the raw file with its long schema;
    # the per-batch transform normalizes inside incremental_copy
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sink = ParquetSink(path=out_dir, mode="append")
    q = stream_copy(spark, _input_dir(tmp_path, sf_dir), sink, ck_dir)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out_dir)
    batch = C.incremental_copy(load_events(spark, sf_dir))
    assert streamed.count() == batch.count()
    cols = batch.columns
    assert streamed.select(*cols).exceptAll(batch).count() == 0


def test_stream_is_resumable(tmp_path, spark, sf_dir):
    """Re-running with the same checkpoint dir ingests nothing new
    (offsets owned by checkpointLocation, core.clj:96 analog)."""
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    in_dir = _input_dir(tmp_path, sf_dir)
    sink = ParquetSink(path=out_dir, mode="append")
    q = stream_copy(spark, in_dir, sink, ck_dir)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    q2 = stream_copy(spark, in_dir, sink, ck_dir)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n1


def test_batch_size_cap_limits_files_per_trigger(tmp_path, spark, sf_dir):
    """source.batch-size analog (core.clj:94): with batch_size_files=1
    a 2-file source must drain in 2 micro-batches, each reading one
    file's worth of rows."""
    import pyspark.sql.functions as F

    from flink_elasticsearch_ingestion_spark.sources.sinks import MemorySink

    d = tmp_path / "in2"
    d.mkdir()
    os.symlink(f"{sf_dir}/events.parquet", d / "a.parquet")
    os.symlink(f"{sf_dir}/events.parquet", d / "b.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batches: list[int] = []

    class CountingSink(MemorySink):
        def write(self, df):
            batches.append(df.count())
            super().write(df)

    sink = CountingSink()
    q = stream_copy(
        spark, str(d), sink, str(tmp_path / "ck2"), batch_size_files=1
    )
    q.awaitTermination(120)
    assert len(batches) == 2
    n_one_file = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # each micro-batch saw one file; last-wins dedup keeps counts <= file rows
    assert all(0 < b <= n_one_file for b in batches)
