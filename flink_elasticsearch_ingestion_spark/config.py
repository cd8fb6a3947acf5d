"""Typed pipeline configuration.

The reference keeps config as a flat Map<String,String> via Flink's
ParameterTool with namespaced keys (reference core.clj:90-100), and ships
three latent bugs we fix by construction:

- duplicate literal key ``source.poll-interval`` (core.clj:95,97) -> a
  dataclass field can't be declared twice;
- key mismatch ``source.elasticsearch-urls`` vs the default
  ``source.elasticsearch-url`` (core.clj:84 vs 91) -> one canonical field,
  and ``from_flat`` validates unknown keys;
- the Kafka-ish default ``localhost:9092`` for an Elasticsearch URL
  (core.clj:91) -> default port is 9200 (core.clj:43 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


@dataclass(frozen=True)
class EndpointConfig:
    """One ES-like endpoint: comma-separated URL list + basic auth.

    Mirrors the reference's ``{source,sink}.elasticsearch-url/username/
    password`` triple (core.clj:82-87, 90-100).
    """

    urls: str = "http://localhost:9200"
    username: str = ""
    password: str = ""
    index: str = ""


@dataclass(frozen=True)
class SourceConfig(EndpointConfig):
    """Source side: incremental polling scan spec (core.clj:94-97, 124-140)."""

    batch_size: int = 1000          # source.batch-size   (scroll page size)
    poll_interval_ms: int = 5000    # source.poll-interval
    checkpoint_offset: str = ""     # source.checkpoint-offset (last max ts)
    timestamp_field: str = "ts"     # the designated incremental field


@dataclass(frozen=True)
class SinkConfig(EndpointConfig):
    """Sink side: bulk/retry knobs with the reference's defaults
    (core.clj:72-78)."""

    bulk_max_actions: int = 64        # setBulkFlushMaxActions
    bulk_flush_interval_ms: int = 5000  # setBulkFlushInterval
    retry_count: int = 10             # setBulkFlushBackoffRetries
    retry_base_delay_ms: int = 2000   # setBulkFlushBackoffDelay
    backoff_policy: str = "EXPONENTIAL"  # setBulkFlushBackoffType
    format: str = "parquet"           # pluggable: parquet | memory | es


@dataclass(frozen=True)
class PipelineConfig:
    source: SourceConfig = field(default_factory=SourceConfig)
    sink: SinkConfig = field(default_factory=SinkConfig)

    _FLAT_ALIASES = {
        "source.elasticsearch-url": ("source", "urls"),
        "source.elasticsearch-urls": ("source", "urls"),  # accept both spellings
        "source.username": ("source", "username"),
        "source.password": ("source", "password"),
        # the reference's actual auth key spellings (core.clj:92-93)
        "source.elasticsearch-username": ("source", "username"),
        "source.elasticsearch-password": ("source", "password"),
        "source.index": ("source", "index"),
        "source.batch-size": ("source", "batch_size"),
        "source.poll-interval": ("source", "poll_interval_ms"),
        "source.checkpoint-offset": ("source", "checkpoint_offset"),
        "source.timestamp-field": ("source", "timestamp_field"),
        "sink.elasticsearch-url": ("sink", "urls"),
        "sink.elasticsearch-urls": ("sink", "urls"),
        "sink.username": ("sink", "username"),
        "sink.password": ("sink", "password"),
        "sink.elasticsearch-username": ("sink", "username"),
        "sink.elasticsearch-password": ("sink", "password"),
        "sink.index": ("sink", "index"),
        "sink.bulk-max-actions": ("sink", "bulk_max_actions"),
        "sink.bulk-flush-interval": ("sink", "bulk_flush_interval_ms"),
        "sink.retry-count": ("sink", "retry_count"),
        "sink.retry-base-delay": ("sink", "retry_base_delay_ms"),
        "sink.backoff-policy": ("sink", "backoff_policy"),
        "sink.format": ("sink", "format"),
    }

    @classmethod
    def from_flat(cls, params: dict[str, str]) -> "PipelineConfig":
        """Build from a flat ParameterTool-style map; rejects unknown keys
        instead of silently ignoring them (the reference's key-mismatch bug
        class, core.clj:84 vs 91)."""
        source_kwargs: dict[str, object] = {}
        sink_kwargs: dict[str, object] = {}
        buckets = {"source": source_kwargs, "sink": sink_kwargs}
        types = {
            "source": {f.name: f.type for f in fields(SourceConfig)},
            "sink": {f.name: f.type for f in fields(SinkConfig)},
        }
        for key, raw in params.items():
            if key not in cls._FLAT_ALIASES:
                raise KeyError(f"unknown config key: {key!r}")
            section, attr = cls._FLAT_ALIASES[key]
            typ = types[section][attr]
            buckets[section][attr] = int(raw) if typ in (int, "int") else raw
        return cls(source=SourceConfig(**source_kwargs), sink=SinkConfig(**sink_kwargs))
