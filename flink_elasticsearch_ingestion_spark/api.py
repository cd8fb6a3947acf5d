"""User-facing entry points: the engine as a library.

``Engine`` wraps a SparkSession + a scale-factor directory and exposes
the three ways users consume this engine:

- ``engine.table(name)`` — DataFrame handle per fixture table
- ``engine.sql(query)`` — ANSI SQL over the registered views (Catalyst
  plans it identically to the DataFrame form)
- ``engine.query(name)`` — the named operator catalog from
  ``__spark_entry__.queries()`` (every SURVEY.md §2 operator)

The reference's only entry point was a CLI main that assembled one
hard-wired pipeline (core.clj:102-112); this replaces it with the
standard Spark triad while `copy_run` keeps the reference's one-command
batch-copy semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_elasticsearch_ingestion_spark.session import get_spark
from flink_elasticsearch_ingestion_spark.sources.tables import (
    TABLES,
    load_table,
    register_views,
)


class Engine:
    def __init__(self, sf_dir: str, spark: SparkSession | None = None):
        self.spark = spark or get_spark("engine")
        self.sf_dir = sf_dir
        register_views(self.spark, sf_dir)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def tables(self) -> tuple[str, ...]:
        return TABLES

    def sql(self, query: str) -> DataFrame:
        """ANSI SQL over the registered table views."""
        return self.spark.sql(query)

    def query(self, name: str) -> DataFrame:
        """Run a named operator from the driver-contract catalog."""
        import __spark_entry__ as entry

        return entry.queries()[name](self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        import __spark_entry__ as entry

        return sorted(entry.queries())

    def copy_run(self, checkpoint_path: str, sink_path: str) -> int:
        """The reference's headline behavior as one call: incremental
        batch copy of the event stream with a persisted ts offset."""
        from flink_elasticsearch_ingestion_spark.sources.sinks import ParquetSink
        from flink_elasticsearch_ingestion_spark.streaming.shell import (
            CheckpointStore,
            run_incremental_batch,
        )

        events = self.table("events")
        sink = ParquetSink(path=sink_path, mode="append")
        return run_incremental_batch(events, sink, CheckpointStore(checkpoint_path))

    def copy_run_bulk(self, checkpoint_path: str, bulk_path: str) -> int:
        """``copy_run`` writing through the ``es_bulk`` DataSource
        instead of parquet: the output directory holds the literal
        ``/_bulk`` payload files a replay tool POSTs to a live cluster
        — the complete reference job (incremental scan -> emitter ->
        last-wins -> bulk sink) with the sink half in its native wire
        format."""
        from flink_elasticsearch_ingestion_spark.functions.json_shaping import (
            encode_body,
        )
        from flink_elasticsearch_ingestion_spark.operators.copy import (
            BODY_COLS,
            incremental_copy,
            max_ts_checkpoint,
        )
        from flink_elasticsearch_ingestion_spark.sources.es_bulk import (
            register_bulk_sink,
        )
        from flink_elasticsearch_ingestion_spark.streaming.shell import (
            CheckpointStore,
        )

        register_bulk_sink(self.spark)
        store = CheckpointStore(checkpoint_path)
        events = self.table("events")
        docs = encode_body(
            incremental_copy(events, checkpoint_ts=store.load()), BODY_COLS
        ).select("doc_id", "index_id", "source", "ts")
        docs = docs.persist()
        n = docs.count()  # eager: sink write + checkpoint agg both consume
        if n:
            docs.select("doc_id", "index_id", "source").write.format(
                "es_bulk"
            ).mode("append").option("path", bulk_path).save()
            max_ts = max_ts_checkpoint(docs).first()["checkpoint_ts"]
            store.save(max_ts.isoformat(sep=" "))
        docs.unpersist()
        return n

