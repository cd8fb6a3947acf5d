"""Copy-pipeline semantics: idempotence, incremental ≡ full,
checkpoint persistence, chunking invariants (SURVEY.md §5.2.4)."""

import datetime as dt

from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import copy as C
from flink_elasticsearch_ingestion_spark.sources.tables import load_events
from flink_elasticsearch_ingestion_spark.streaming.shell import CheckpointStore, run_incremental_batch
from flink_elasticsearch_ingestion_spark.sources.sinks import MemorySink, ParquetSink


def _events(spark, sf_dir):
    return load_events(spark, sf_dir)


def test_copy_idempotent(spark, sf_dir):
    """Running the copy twice over the same input yields the same doc set
    (last-wins by doc_id == ES upsert, core.clj:62-63)."""
    events = _events(spark, sf_dir)
    once = C.incremental_copy(events)
    twice = C.incremental_copy(events.union(events))
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_incremental_equals_full(spark, sf_dir):
    """copy(t0..t1) ∪ copy(t1..end) == copy(full) for mid-range t1."""
    events = _events(spark, sf_dir)
    t1 = dt.datetime(2024, 1, 15)
    first = events.filter(F.col("ts") <= t1)
    second = events.filter(F.col("ts") > t1)
    merged = C.incremental_copy(first).union(C.incremental_copy(second))
    # doc ids unique per half, so union == full copy
    full = C.incremental_copy(events)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_incremental_filter_bounds(spark, sf_dir):
    events = _events(spark, sf_dir)
    total = events.count()
    after = C.incremental_filter(events, dt.datetime(2024, 1, 15)).count()
    assert 0 < after < total
    assert C.incremental_filter(events, None).count() == total


def test_last_wins_keeps_latest(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 3.0), (1, "c", 2.0), (2, "d", 1.0)],
        "doc_id int, payload string, ts double",
    )
    out = C.last_wins(df).collect()
    by_id = {r.doc_id: r.payload for r in out}
    assert by_id == {1: "b", 2: "d"}


def test_bulk_chunks_sizes(spark, sf_dir):
    docs = C.shape_documents(_events(spark, sf_dir))
    sizes = (
        C.bulk_chunks(docs, max_actions=64)
        .groupBy("chunk_id")
        .count()
        .collect()
    )
    counts = sorted((r.chunk_id, r["count"]) for r in sizes)
    assert all(c == 64 for _, c in counts[:-1])  # all full but the last
    assert counts[-1][1] <= 64


def test_checkpoint_store_roundtrip(tmp_path, spark, sf_dir):
    store = CheckpointStore(str(tmp_path / "ck.json"))
    assert store.load() is None
    sink = MemorySink()
    events = _events(spark, sf_dir)
    n1 = run_incremental_batch(events, sink, store)
    assert n1 == events.count()
    assert store.load() is not None
    # second poll over unchanged input: nothing new past the checkpoint
    n2 = run_incremental_batch(events, sink, store)
    assert n2 == 0
    assert len(sink.rows) == n1


def test_parquet_sink_partitions_by_index(tmp_path, spark, sf_dir):
    """Data-dependent index routing (core.clj:58,64) -> partitionBy."""
    docs = C.incremental_copy(_events(spark, sf_dir))
    sink = ParquetSink(path=str(tmp_path / "out"))
    sink.write(docs)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == docs.count()
    dirs = {p.name for p in (tmp_path / "out").iterdir() if p.is_dir()}
    assert any(d.startswith("index_id=") for d in dirs)


def test_ingestion_diff(spark, sf_dir):
    events = _events(spark, sf_dir)
    docs = C.incremental_copy(events)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    missing = C.ingestion_diff(docs, half)
    assert missing.count() == docs.count() - half.count()
    assert missing.filter(F.col("doc_id") % 2 == 0).count() == 0
