"""Pluggable document sinks.

The reference's sink is an Elasticsearch bulk indexer with
flush-every-64-actions/5000 ms and exponential-backoff retry
(reference core.clj:68-79); its per-record emitter extracts
(doc_id, index_id, json body) and preserves the document id so
re-ingestion upserts (core.clj:55-66). Here the sink is an interface:

- ``ParquetSink`` (default, test env has no ES): partitions output by
  ``index_id`` — the Spark analog of data-dependent index routing
  (core.clj:58,64). At 100 TB, partitionBy(index_id) gives downstream
  readers partition pruning for free.
- ``MemorySink``: collects to the driver, unit tests only.
- ``elasticsearch_writer_options()``: the option dict for the
  elasticsearch-hadoop connector (``df.write.format("es")``) carrying the
  reference's bulk/retry constants; kept as config since the connector jar
  is absent in this environment.

Delivery contract: the ES adapter maps doc_id -> ``es.mapping.id``, so
a replayed batch upserts and the target converges (the reference's
effective exactly-once, core.clj:62-63). ``ParquetSink`` is weaker —
parquet has no keyed upsert, so incremental runs in ``append`` mode are
AT-LEAST-ONCE: a retry after a write but before the checkpoint saves
duplicates doc_ids in storage. Readers recover the converged view with
``compact_last_wins`` (last-write-wins on read); ``overwrite`` mode
replaces the full target and is only correct for full copies.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from flink_elasticsearch_ingestion_spark.config import SinkConfig


class DocumentSink:
    """Interface: write a (doc_id, index_id, ...body) DataFrame."""

    def write(self, df: DataFrame) -> None:  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class ParquetSink(DocumentSink):
    """File sink with partitionBy(index_id) routing.

    Modes and their contracts (see module docstring):

    - ``overwrite``: replaces the whole target — correct for full
      (1:1) copies only; it would delete prior incremental batches.
    - ``append`` (what the incremental/streaming paths use): keeps
      every batch; at-least-once on retry, since parquet cannot upsert
      by doc_id. Consumers needing the converged last-write-wins view
      read through :func:`compact_last_wins`.
    """

    path: str
    mode: str = "overwrite"
    partition_col: str = "index_id"

    def write(self, df: DataFrame) -> None:
        writer = df.write.mode(self.mode)
        if self.partition_col in df.columns:
            writer = writer.partitionBy(self.partition_col)
        writer.parquet(self.path)


def compact_last_wins(spark, path: str) -> DataFrame:
    """Converged read over an append-mode ParquetSink target: collapse
    any retry/replay duplicates with last-write-wins per doc_id — the
    read-side equivalent of the ES id-keyed upsert. One partial+final
    aggregation; at scale, run periodically to rewrite the target in
    place (compaction) instead of paying it on every read."""
    from flink_elasticsearch_ingestion_spark.operators.copy import last_wins

    return last_wins(spark.read.parquet(path), key="doc_id", order_col="ts")


@dataclass
class MemorySink(DocumentSink):
    """Test-only sink: accumulates rows on the driver."""

    rows: list = field(default_factory=list)

    def write(self, df: DataFrame) -> None:
        self.rows.extend(df.collect())


def elasticsearch_writer_options(cfg: SinkConfig) -> dict[str, str]:
    """elasticsearch-hadoop writer options carrying the reference's
    bulk/retry semantics (core.clj:62-63, 72-78).

    Only real connector keys are emitted. Two reference constants have
    no es-hadoop equivalent and are honored elsewhere:

    - time-based bulk flush (5000 ms, core.clj:73): es-hadoop flushes
      on batch size/bytes only; in the streaming path the micro-batch
      trigger interval (``stream_copy(poll_interval_ms=...)``) bounds
      flush latency the same way.
    - EXPONENTIAL backoff (core.clj:76-78): es-hadoop retry waits are
      constant; ``retry_base_delay_ms`` maps to that constant wait and
      ``backoff_policy`` stays config-only.
    """
    host_port = cfg.urls.split(",")[0].replace("http://", "").replace("https://", "")
    host, _, port = host_port.partition(":")
    return {
        "es.nodes": host,
        "es.port": port or "9200",  # port default, core.clj:43
        "es.net.http.auth.user": cfg.username,
        "es.net.http.auth.pass": cfg.password,
        "es.mapping.id": "doc_id",  # id preservation -> idempotent upsert
        "es.resource.write": cfg.index or "{index_id}",  # dynamic routing
        "es.batch.size.entries": str(cfg.bulk_max_actions),
        "es.batch.write.refresh": "false",
        "es.batch.write.retry.count": str(cfg.retry_count),
        "es.batch.write.retry.wait": f"{cfg.retry_base_delay_ms}ms",
        "es.write.operation": "index",  # last write wins
    }


def make_sink(cfg: SinkConfig, path: str | None = None) -> DocumentSink:
    if cfg.format == "parquet":
        if not path:
            raise ValueError("parquet sink needs a path")
        return ParquetSink(path=path)
    if cfg.format == "memory":
        return MemorySink()
    raise ValueError(f"unsupported sink format {cfg.format!r} in this environment")
