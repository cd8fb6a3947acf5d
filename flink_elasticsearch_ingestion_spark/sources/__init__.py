from flink_elasticsearch_ingestion_spark.sources.tables import TABLES, load_table, load_tables
from flink_elasticsearch_ingestion_spark.sources.sinks import DocumentSink, ParquetSink, MemorySink, make_sink

__all__ = ["TABLES", "load_table", "load_tables", "DocumentSink", "ParquetSink", "MemorySink", "make_sink"]
