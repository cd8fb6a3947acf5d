"""Per-family query+oracle registries assembled by __spark_entry__.

Every module exposes QUERIES (catalog name -> callable) and ORACLES
(catalog name -> DuckDB SQL). A query and its oracle live in the
same file so they cannot drift apart unreviewed."""

from flink_elasticsearch_ingestion_spark.catalog import (
    ingest,
    relational,
    windows,
    text,
    dedup,
    similarity,
    multimodal,
    sampling,
    graph,
    es_aggs,
    es_aggs2,
    es_query,
    es_search,
)

#: assembly order (drives catalog iteration order past the window)
MODULES = [ingest, relational, windows, text, dedup, similarity, multimodal, sampling, graph, es_aggs, es_aggs2, es_query, es_search]
