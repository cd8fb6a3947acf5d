"""Structured Streaming shell over the identical batch copy logic.

The reference is an unbounded Flink stream with a polling incremental
source (poll-interval / batch-size / checkpoint-offset, reference
core.clj:94-97, 124-140) and a micro-batching bulk sink (core.clj:68-79).
Spark mapping:

- polling source      -> ``readStream`` + ``Trigger.ProcessingTime``
  (finite test/replay mode: ``Trigger.AvailableNow``)
- checkpoint-offset   -> ``checkpointLocation`` (Spark owns offsets/state);
  the batch-mode path persists max(ts) itself (CheckpointStore)
- bulk sink + retry   -> ``foreachBatch`` wrapping the same DocumentSink
  the batch path uses; at-least-once + idempotent doc_id upsert ==
  the reference's effective delivery contract (core.clj:62-63)

Batch/streaming parity: ``incremental_copy`` is applied inside each
micro-batch, so one code path is tested once and runs both ways.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from flink_elasticsearch_ingestion_spark.operators.copy import incremental_copy, shape_documents
from flink_elasticsearch_ingestion_spark.sources.sinks import DocumentSink


class CheckpointStore:
    """Batch-mode incremental offset: persist max(ts) between runs
    ('Store timestamp of last doc', core.clj:137)."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> str | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f).get("checkpoint_ts")

    def save(self, checkpoint_ts: str) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w") as f:
            json.dump({"checkpoint_ts": checkpoint_ts}, f)


def run_incremental_batch(
    events: DataFrame,
    sink: DocumentSink,
    store: CheckpointStore,
) -> int:
    """One poll of the batch-mode incremental copy: filter past the saved
    offset, copy, advance the offset. Returns rows written."""
    docs = incremental_copy(events, checkpoint_ts=store.load())
    docs = docs.cache()
    try:
        n = docs.count()
        if n:
            sink.write(docs)
            max_ts = docs.agg({"ts": "max"}).first()[0]
            store.save(max_ts.isoformat(sep=" "))
        return n
    finally:
        docs.unpersist()


def stream_copy(
    spark: SparkSession,
    source_path: str,
    sink: DocumentSink,
    checkpoint_dir: str,
    schema: str | None = None,
    available_now: bool = True,
    poll_interval_ms: int = 5000,
):
    """Streaming copy: file source -> identical batch transform per
    micro-batch -> DocumentSink via foreachBatch.

    ``available_now=True`` drains all available input then stops
    (deterministic tests); ``False`` polls forever at the reference's
    poll interval.
    """
    reader = spark.readStream.format("parquet")
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.schema(spark.read.parquet(source_path).schema)
    stream = reader.load(source_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sink.write(incremental_copy(batch_df))

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{poll_interval_ms} milliseconds")
    return writer.start()
