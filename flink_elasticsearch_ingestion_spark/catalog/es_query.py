"""Catalog family: the Elasticsearch query DSL, compiled.

The reference's users speak the ES query DSL (the JSON `_search`
bodies; core.clj:124–140 carries one inline).  operators/es_query.py
compiles the documented leaf + bool query types to Catalyst boolean
expressions; this family runs a stored bool query, a wildcard query,
and an aggregation-context match_phrase against the document/part
tables with hand-written SQL oracles replaying the same predicates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_elasticsearch_ingestion_spark.catalog._shared import _t
from flink_elasticsearch_ingestion_spark.operators import es_query as EQ


def q_bool_dsl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored ES bool query (must match + range/terms filters +
    phrase must_not + three shoulds) in filter context, with per-hit
    should-coordination counts."""
    return EQ.bool_dsl_filter(_t(spark, sf_dir, "documents"))

def q_wildcard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES wildcard query `*w?dget` on the part-name keyword field —
    the `*`/`?` -> anchored-regex translation."""
    return EQ.wildcard_query(_t(spark, sf_dir, "part"))

def q_match_phrase_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_phrase in aggregation context: per-source doc counts
    and hit rate for the consecutive-token phrase 'fast join'."""
    return EQ.match_phrase_count(_t(spark, sf_dir, "documents"))


QUERIES = {
    "bool_dsl_filter": q_bool_dsl_filter,
    "wildcard_query": q_wildcard_query,
    "match_phrase_count": q_match_phrase_count,
}

#: boundary-padded whitespace-normalized text (the phrase substrate)
_NT = "' ' || regexp_replace(trim(text), '\\s+', ' ', 'g') || ' '"

#: DuckDB oracle per query — keys MUST be a subset of QUERIES
ORACLES = {
    "bool_dsl_filter": (
        "WITH d AS (SELECT doc_id, lang, source, n_chars,"
        " string_split_regex(trim(text), '\\s+') AS w,"
        f" {_NT} AS nt FROM documents)"
        " SELECT doc_id, lang, source, n_chars,"
        " CAST(source = 'src3' AS INT)"
        " + CAST((CAST(list_contains(w, 'vector') AS INT)"
        "   + CAST(list_contains(w, 'stream') AS INT)) >= 2 AS INT)"
        " + CAST(starts_with(source, 'src1') AS INT)"
        "  AS n_should_matched"
        " FROM d"
        " WHERE (list_contains(w, 'spark') OR list_contains(w, 'merge'))"
        "  AND n_chars >= 120 AND n_chars < 400"
        "  AND lang IN ('en', 'de', 'fr')"
        "  AND NOT (position(' slow scan ' IN nt) > 0)"
        " ORDER BY doc_id"
    ),
    "wildcard_query": (
        "SELECT p_partkey, p_name, p_type FROM part"
        " WHERE regexp_matches(p_name, '^.*w.dget$')"
        " ORDER BY p_partkey LIMIT 50"
    ),
    "match_phrase_count": (
        "WITH d AS (SELECT source,"
        f" CASE WHEN position(' fast join ' IN {_NT}) > 0"
        "  THEN 1 ELSE 0 END AS hit FROM documents)"
        " SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
        " CAST(sum(hit) AS BIGINT) AS n_phrase_hits,"
        " round(sum(hit) / count(*) + 1e-9, 6) AS hit_rate"
        " FROM d GROUP BY source ORDER BY source"
    ),
}
