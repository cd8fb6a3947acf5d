"""Catalog family: the `_search` endpoint, end-to-end.

Three stored ES search bodies (hit mode with sort/size/_source,
terms agg with nested stats/cardinality sub-aggs, date_histogram
with a metric sub-agg) run through ``operators/es_search.es_search``
— the umbrella that composes the query-DSL compiler with the
aggregation surface, i.e. the actual POST body a reference user
would ship (core.clj:124–140 builds one for the scroll source)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_elasticsearch_ingestion_spark.catalog._shared import _t
from flink_elasticsearch_ingestion_spark.operators.es_search import es_search

#: stored search bodies — module constants so tests and docs quote
#: the exact JSON the catalog runs
HITS_BODY = {
    "query": {
        "bool": {
            "must": [{"match": {"text": "vector"}}],
            "filter": [{"range": {"n_chars": {"gte": 100}}}],
        }
    },
    "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": "asc"}],
    "size": 25,
    "_source": ["doc_id", "lang", "source", "n_chars"],
}

AGGS_BODY = {
    "query": {"range": {"n_chars": {"gte": 60}}},
    "aggs": {
        "by_lang": {
            "terms": {"field": "lang", "size": 10, "order": {"_count": "desc"}},
            "aggs": {
                "chars": {"stats": {"field": "n_chars"}},
                "sources": {"cardinality": {"field": "source"}},
            },
        }
    },
}

HISTO_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {
        "per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"value_avg": {"avg": {"field": "value"}}},
        }
    },
}

COLLAPSE_BODY = {
    "query": {"range": {"n_chars": {"gte": 80}}},
    "collapse": {"field": "lang", "inner_hits": {"size": 2}},
    "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": "asc"}],
    "size": 3,
    "_source": ["doc_id", "lang", "n_chars"],
}

HIGHLIGHT_BODY = {
    "query": {"match": {"text": "vector stream"}},
    "highlight": {"fields": {"text": {}}},
    "sort": [{"doc_id": {"order": "asc"}}],
    "size": 15,
    "_source": ["doc_id"],
}


def q_search_endpoint_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit mode: match+range bool query, n_chars-desc sort with
    doc_id tiebreak, size 25, _source projection."""
    return es_search(_t(spark, sf_dir, "documents"), HITS_BODY)

def q_search_endpoint_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggs mode: terms on lang ordered by _count desc with nested
    stats + cardinality sub-aggs under a range query."""
    return es_search(_t(spark, sf_dir, "documents"), AGGS_BODY)

def q_search_endpoint_histo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggs mode: daily date_histogram of purchase events with an
    avg(value) sub-agg."""
    return es_search(_t(spark, sf_dir, "events"), HISTO_BODY)

def q_search_endpoint_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing: top-3 language groups by best n_chars doc,
    2 inner hits per group under the main sort."""
    return es_search(_t(spark, sf_dir, "documents"), COLLAPSE_BODY)

def q_search_endpoint_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-field highlighting of the match terms ('vector stream')
    over the first 15 matching docs."""
    return es_search(_t(spark, sf_dir, "documents"), HIGHLIGHT_BODY)


QUERIES = {
    "search_endpoint_hits": q_search_endpoint_hits,
    "search_endpoint_aggs": q_search_endpoint_aggs,
    "search_endpoint_histo": q_search_endpoint_histo,
    "search_endpoint_collapse": q_search_endpoint_collapse,
    "search_endpoint_highlight": q_search_endpoint_highlight,
}

#: DuckDB oracle per query — keys MUST be a subset of QUERIES
ORACLES = {
    "search_endpoint_hits": (
        "SELECT doc_id, lang, source, n_chars FROM documents"
        " WHERE list_contains(string_split_regex(trim(text), '\\s+'),"
        "  'vector') AND n_chars >= 100"
        " ORDER BY n_chars DESC, doc_id LIMIT 25"
    ),
    "search_endpoint_aggs": (
        "SELECT lang AS key, CAST(count(*) AS BIGINT) AS doc_count,"
        " CAST(count(n_chars) AS BIGINT) AS chars_count,"
        " min(n_chars) AS chars_min, max(n_chars) AS chars_max,"
        " round(sum(n_chars) + 1e-9, 4) AS chars_sum,"
        " round(round(sum(n_chars), 2) / count(n_chars) + 1e-9, 4)"
        "  AS chars_avg,"
        " CAST(count(DISTINCT source) AS BIGINT) AS sources"
        " FROM documents WHERE n_chars >= 60"
        " GROUP BY lang ORDER BY doc_count DESC, key LIMIT 10"
    ),
    "search_endpoint_histo": (
        "SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),"
        "  '%Y-%m-%d %H:%M:%S') AS key,"
        " CAST(count(*) AS BIGINT) AS doc_count,"
        " round(round(sum(value), 2) / count(value) + 1e-9, 4)"
        "  AS value_avg"
        " FROM events WHERE event_type = 'purchase'"
        " GROUP BY key ORDER BY key"
    ),
    "search_endpoint_collapse": (
        "WITH h AS (SELECT doc_id, lang, n_chars FROM documents"
        "  WHERE n_chars >= 80),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY lang"
        "  ORDER BY n_chars DESC, doc_id) AS inner_rank FROM h),"
        " rep AS (SELECT lang, row_number() OVER"
        "  (ORDER BY n_chars DESC, doc_id) AS group_rank"
        "  FROM r WHERE inner_rank = 1 QUALIFY group_rank <= 3)"
        " SELECT rep.group_rank, r.inner_rank, r.doc_id, r.lang,"
        "  r.n_chars"
        " FROM r JOIN rep USING (lang) WHERE r.inner_rank <= 2"
        " ORDER BY group_rank, inner_rank"
    ),
    "search_endpoint_highlight": (
        "WITH w AS (SELECT doc_id,"
        "  string_split_regex(trim(text), '\\s+') AS toks"
        "  FROM documents)"
        " SELECT doc_id, array_to_string(list_transform(toks,"
        "  t -> CASE WHEN t IN ('stream', 'vector')"
        "   THEN '<em>' || t || '</em>' ELSE t END), ' ')"
        "  AS highlight_text"
        " FROM w WHERE list_contains(toks, 'vector')"
        "  OR list_contains(toks, 'stream')"
        " ORDER BY doc_id LIMIT 15"
    ),
}
