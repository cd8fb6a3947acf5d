"""Streaming analytics: event-time windows with watermarks, and a custom
stateful operator over ``applyInPandasWithState``.

The reference has no event-time semantics beyond the incremental ts field
(SURVEY.md §2.7) — these are the north-star streaming extensions, built
so every streaming aggregation has an identical batch formulation that
the DuckDB oracle can check (run the same transform on a static frame).

Scale notes:
- watermark state is bounded: windows older than (max event time -
  delay) are finalized and dropped from the state store, so state size
  is O(active windows × group keys), not O(stream length).
- ``applyInPandasWithState`` keeps one state row per group key in the
  state store (RocksDB-backed on a real cluster); batches arrive as
  Arrow, so the python hop is vectorized per group, not per row.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "6 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling-window counts. On a stream, the watermark
    bounds state and admits late data up to ``watermark``; on a batch
    frame the same expression is an ordinary group-by (withWatermark is
    a no-op in batch), which is how the oracle checks it."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    query_name: str = "windowed_counts",
    window: str = "6 hours",
    watermark: str = "1 hour",
):
    """readStream -> watermarked tumbling windows -> in-memory sink
    (update mode: every trigger emits changed windows; the final table
    holds the latest value per window)."""
    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)
    counts = windowed_event_counts(stream, window=window, watermark=watermark)
    return (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(
    events: DataFrame,
    key: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop duplicate keys arriving within the
    watermark horizon. State holds one entry per key seen in the last
    ``watermark`` of event time and is evicted as the watermark advances
    — bounded state for an unbounded stream, which is the only honest
    way to dedup at 100 TB/day (an unbounded seen-set is a batch job's
    privilege). In batch mode this degrades to a plain dropDuplicates."""
    if not events.isStreaming:
        return events.dropDuplicates([key])
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])


def streaming_content_dedup(
    documents: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming CONTENT dedup: the batch content-hash operator's
    streaming twin. The sha256 of the normalized text is computed
    map-side per micro-batch, then duplicate hashes arriving within the
    watermark horizon are dropped — bounded state (one entry per
    distinct content seen in the horizon), the only honest contract for
    an unbounded stream. Batch mode degrades to exact content dedup
    keeping the first row per content hash."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    hashed = documents.withColumn("content_hash", F.sha2(normalized, 256))
    if not documents.isStreaming:
        return hashed.dropDuplicates(["content_hash"])
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def stream_dedup_copy(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    query_name: str = "dedup_stream",
):
    """readStream -> watermarked exact dedup -> append to memory sink."""
    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)
    deduped = streaming_dedup(stream)
    return (
        deduped.select("event_id", "event_type", "user_id", "ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_USER_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_ts", TimestampType()),
    ]
)

_USER_STATS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user_stats(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running profile: total event count + most recent event.
    One state row per user; emits the updated profile each micro-batch
    the user appears in."""
    (user_id,) = key
    if state.exists:
        n_events, last_type, last_ts = state.get
    else:
        n_events, last_type, last_ts = 0, None, None
    for pdf in pdfs:
        n_events += len(pdf)
        idx = pdf["ts"].idxmax()
        batch_last_ts = pdf["ts"].loc[idx]
        if last_ts is None or batch_last_ts >= last_ts:
            last_ts = batch_last_ts
            last_type = pdf["event_type"].loc[idx]
    state.update((n_events, last_type, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "last_event_type": [last_type],
            "last_ts": [last_ts],
        }
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    running per-user event count + latest event type. The stream-native
    equivalent of the batch ``last_wins`` + count aggregate."""
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=_USER_STATS_OUTPUT,
            stateStructType=_USER_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_user_stats(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    query_name: str = "user_stats",
):
    """readStream -> stateful per-user profile -> in-memory sink."""
    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)
    stats = stateful_user_stats(stream)
    return (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
