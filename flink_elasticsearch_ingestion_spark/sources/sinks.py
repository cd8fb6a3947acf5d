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

Idempotence: every sink keys on ``doc_id``; writing the same batch twice
must converge to the same target state (last-write-wins upsert,
core.clj:62-63). ParquetSink achieves this with overwrite-by-run
semantics; the ES adapter maps doc_id -> ``es.mapping.id``.
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
    path: str
    mode: str = "overwrite"
    partition_col: str = "index_id"

    def write(self, df: DataFrame) -> None:
        writer = df.write.mode(self.mode)
        if self.partition_col in df.columns:
            writer = writer.partitionBy(self.partition_col)
        writer.parquet(self.path)


@dataclass
class MemorySink(DocumentSink):
    """Test-only sink: accumulates rows on the driver."""

    rows: list = field(default_factory=list)

    def write(self, df: DataFrame) -> None:
        self.rows.extend(df.collect())


def elasticsearch_writer_options(cfg: SinkConfig) -> dict[str, str]:
    """elasticsearch-hadoop writer options carrying the reference's
    bulk/retry semantics (core.clj:62-63, 72-78)."""
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
