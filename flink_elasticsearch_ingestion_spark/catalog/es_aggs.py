"""Catalog family: Elasticsearch aggregation-surface parity.

The reference copies indexes between ES clusters (core.clj:103); the
queries its users run against those indexes are ES *aggregations*.
This family re-expresses the publicly documented ES aggregation
semantics (significant_terms/JLH, function_score decay, composite
after-key pagination, terms-agg doc_count_error accounting, the
percolator, more_like_this, percentile_ranks, adjacency_matrix) as
Spark plans with bit-matching DuckDB oracles.

Each query (QUERIES) sits next to its DuckDB oracle (ORACLES) so the
pair is reviewed and edited together — drift between the Spark plan
and the SQL twin stays visible in one diff."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_elasticsearch_ingestion_spark.catalog._shared import _t, CHECKPOINT
from flink_elasticsearch_ingestion_spark.operators import es_aggs as ES

#: shared tokenization CTE text (the engine's whitespace convention:
#: split trim(text) on \s+, drop empties) — doc_id is unique so the
#: distinct doc-term set may carry per-doc attribute columns for free
_DT = (
    "dt AS (SELECT DISTINCT doc_id, t AS term FROM"
    " (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t"
    "  FROM documents) WHERE t <> '')"
)


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_terms (JLH) per source: which terms are
    over-represented in each source vs the whole corpus — the
    provenance-drift probe every multi-source corpus build runs."""
    return ES.significant_terms(_t(spark, sf_dir, "documents"))

def q_decay_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score gauss decay × value, top-5 per event type
    (origin = the engine's incremental checkpoint constant)."""
    return ES.decay_score_topk(_t(spark, sf_dir, "events"), origin=CHECKPOINT)

def q_composite_agg_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation after-key page: 20 (event_type, day)
    buckets strictly after ('click', 2024-01-15) in key order."""
    return ES.composite_agg_page(_t(spark, sf_dir, "events"))

def q_terms_shard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms-agg distributed merge with doc_count_error_upper_bound
    accounting (8 shards, shard_size 10, final top-10)."""
    return ES.terms_shard_error(_t(spark, sf_dir, "documents"))

def q_percolate_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolator: the stored-query fixture matched against the
    document stream; zero-hit queries stay visible."""
    return ES.percolate_matches(_t(spark, sf_dir, "documents"), spark)

def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more_like_this from each language's seed doc (min doc_id):
    top-5 tf·idf query terms, idf-summed overlap scoring, top-5
    matches per seed via two-phase salted rank."""
    return ES.more_like_this(_t(spark, sf_dir, "documents"))

def q_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks at (1000, 5000, 20000, 50000) over
    l_extendedprice per returnflag — one conditional-sum agg pass."""
    return ES.percentile_ranks(_t(spark, sf_dir, "lineitem"))

def q_filters_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix over the term filters a=spark, b=vector,
    c=stream: per-filter and pairwise-intersection doc counts."""
    return ES.filters_adjacency(_t(spark, sf_dir, "documents"))


#: driver-contract queries owned by this family (names are the
#: catalog keys the driver and the oracle gate use verbatim)
QUERIES = {
    "significant_terms": q_significant_terms,
    "decay_score_topk": q_decay_score_topk,
    "composite_agg_page": q_composite_agg_page,
    "terms_shard_error": q_terms_shard_error,
    "percolate_matches": q_percolate_matches,
    "more_like_this": q_more_like_this,
    "percentile_ranks": q_percentile_ranks,
    "filters_adjacency": q_filters_adjacency,
}

#: DuckDB oracle per query — keys MUST be a subset of QUERIES
ORACLES = {
    "significant_terms": (
        "WITH dts AS (SELECT DISTINCT doc_id, source, t AS term FROM"
        " (SELECT doc_id, source,"
        "  unnest(string_split_regex(trim(text), '\\s+')) AS t"
        "  FROM documents) WHERE t <> ''),"
        " ss AS (SELECT source, CAST(count(*) AS BIGINT) AS subset_size"
        "  FROM documents GROUP BY 1),"
        " n AS (SELECT CAST(count(*) AS BIGINT) AS superset_size"
        "  FROM documents),"
        " sd AS (SELECT source, term, CAST(count(*) AS BIGINT) AS subset_df"
        "  FROM dts GROUP BY 1, 2),"
        " td AS (SELECT term, CAST(count(*) AS BIGINT) AS superset_df"
        "  FROM dts GROUP BY 1),"
        " scored AS (SELECT sd.source, sd.term, subset_df, superset_df,"
        "  round((subset_df * 1.0 / subset_size"
        "         - superset_df * 1.0 / superset_size)"
        "   * ((subset_df * 1.0 / subset_size)"
        "      / (superset_df * 1.0 / superset_size)) + 1e-9, 6) AS jlh"
        "  FROM sd JOIN td USING (term) JOIN ss USING (source) CROSS JOIN n"
        "  WHERE subset_df >= 5),"
        " ranked AS (SELECT *, row_number() OVER (PARTITION BY source"
        "  ORDER BY jlh DESC, term) AS rn FROM scored WHERE jlh > 0)"
        " SELECT source, term, subset_df, superset_df, jlh FROM ranked"
        " WHERE rn <= 5 ORDER BY source, jlh DESC, term"
    ),
    "decay_score_topk": (
        "WITH scored AS (SELECT event_type, event_id,"
        "  round(value * pow(0.5, pow(greatest(0.0,"
        "    abs(epoch(CAST(ts AS TIMESTAMP))"
        f"        - epoch(TIMESTAMP '{CHECKPOINT}')) - 86400.0)"
        "    / 604800.0, 2)) + 1e-9, 6) AS score FROM events),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY event_type"
        "  ORDER BY score DESC, event_id) AS rn FROM scored)"
        " SELECT event_type, event_id, score FROM r WHERE rn <= 5"
        " ORDER BY event_type, score DESC, event_id"
    ),
    "composite_agg_page": (
        "SELECT event_type,"
        " strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')"
        "  AS day,"
        " CAST(count(*) AS BIGINT) AS n_events,"
        " round(sum(value) + 1e-9, 4) AS sum_value"
        " FROM events GROUP BY 1, 2"
        " HAVING event_type > 'click'"
        "  OR (event_type = 'click' AND day > '2024-01-15')"
        " ORDER BY event_type, day LIMIT 20"
    ),
    "terms_shard_error": (
        "WITH dts AS (SELECT DISTINCT doc_id % 8 AS shard, doc_id,"
        "  t AS term FROM (SELECT doc_id,"
        "  unnest(string_split_regex(trim(text), '\\s+')) AS t"
        "  FROM documents) WHERE t <> ''),"
        " per AS (SELECT shard, term, CAST(count(*) AS BIGINT) AS cnt"
        "  FROM dts GROUP BY 1, 2),"
        " kept AS (SELECT * FROM (SELECT *, row_number() OVER"
        "  (PARTITION BY shard ORDER BY cnt DESC, term) AS rn FROM per)"
        "  WHERE rn <= 10),"
        " floors AS (SELECT shard, CASE WHEN count(*) = 10 THEN min(cnt)"
        "  ELSE 0 END AS floor FROM kept GROUP BY 1),"
        " tot AS (SELECT CAST(sum(floor) AS BIGINT) AS total_floor"
        "  FROM floors),"
        " merged AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS doc_count,"
        "  CAST(sum(floor) AS BIGINT) AS reported_floor"
        "  FROM kept JOIN floors USING (shard) GROUP BY 1)"
        " SELECT term, doc_count,"
        "  total_floor - reported_floor AS error_upper_bound"
        " FROM merged CROSS JOIN tot"
        " ORDER BY doc_count DESC, term LIMIT 10"
    ),
    "percolate_matches": (
        "WITH q(query_id, must_term, must_not_term) AS (VALUES"
        " (0, 'spark', NULL), (1, 'table', 'vector'),"
        " (2, 'query', 'slow'), (3, 'vector', NULL),"
        " (4, 'hash', 'stream'), (5, 'zzz_absent_term', NULL)),"
        f" {_DT},"
        " pos AS (SELECT query_id, doc_id FROM q"
        "  JOIN dt ON dt.term = q.must_term),"
        " neg AS (SELECT query_id, doc_id FROM q"
        "  JOIN dt ON dt.term = q.must_not_term),"
        " hits AS (SELECT * FROM pos WHERE NOT EXISTS (SELECT 1 FROM neg"
        "  WHERE neg.query_id = pos.query_id"
        "  AND neg.doc_id = pos.doc_id)),"
        " a AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_matches,"
        "  min(doc_id) AS first_match FROM hits GROUP BY 1)"
        " SELECT CAST(q.query_id AS BIGINT) AS query_id, q.must_term,"
        "  q.must_not_term,"
        "  CAST(coalesce(n_matches, 0) AS BIGINT) AS n_matches,"
        "  first_match"
        " FROM q LEFT JOIN a USING (query_id) ORDER BY query_id"
    ),
    "more_like_this": (
        "WITH tall AS (SELECT doc_id, t AS term FROM (SELECT doc_id,"
        "  unnest(string_split_regex(trim(text), '\\s+')) AS t"
        "  FROM documents) WHERE t <> ''),"
        " dt AS (SELECT DISTINCT doc_id, term FROM tall),"
        " dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df"
        "  FROM dt GROUP BY 1),"
        " n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),"
        " seeds AS (SELECT lang, min(doc_id) AS seed_id"
        "  FROM documents GROUP BY 1),"
        " stf AS (SELECT s.lang, s.seed_id, tall.term,"
        "  CAST(count(*) AS BIGINT) AS tf FROM tall"
        "  JOIN seeds s ON tall.doc_id = s.seed_id GROUP BY 1, 2, 3),"
        " qt AS (SELECT lang, seed_id, term,"
        "  ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf,"
        "  round(tf * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
        "   + 1e-9, 6) AS tscore"
        "  FROM stf JOIN dfreq USING (term) CROSS JOIN n WHERE df >= 2),"
        " qk AS (SELECT * FROM (SELECT *, row_number() OVER"
        "  (PARTITION BY lang ORDER BY tscore DESC, term) AS qrn FROM qt)"
        "  WHERE qrn <= 5),"
        " cand AS (SELECT qk.lang, qk.seed_id, dt.doc_id,"
        "  CAST(count(*) AS BIGINT) AS n_shared,"
        "  round(sum(qk.idf) + 1e-9, 6) AS score"
        "  FROM dt JOIN qk USING (term) WHERE dt.doc_id <> qk.seed_id"
        "  GROUP BY 1, 2, 3),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY lang"
        "  ORDER BY score DESC, doc_id) AS rn FROM cand)"
        " SELECT lang, seed_id, doc_id, n_shared, score FROM r"
        " WHERE rn <= 5 ORDER BY lang, score DESC, doc_id"
    ),
    "percentile_ranks": (
        " UNION ALL ".join(
            "SELECT l_returnflag, CAST({v} AS DOUBLE) AS value,"
            " CAST(sum(CASE WHEN l_extendedprice <= {v} THEN 1 ELSE 0 END)"
            "  AS BIGINT) AS n_le,"
            " round(100.0 * sum(CASE WHEN l_extendedprice <= {v} THEN 1"
            "  ELSE 0 END) / count(*) + 1e-9, 6) AS pct_rank"
            " FROM lineitem GROUP BY 1".format(v=v)
            for v in ("1000.0", "5000.0", "20000.0", "50000.0")
        )
        + " ORDER BY l_returnflag, value"
    ),
    "filters_adjacency": (
        f"WITH {_DT},"
        " flags AS (SELECT doc_id,"
        "  max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS fa,"
        "  max(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) AS fb,"
        "  max(CASE WHEN term = 'stream' THEN 1 ELSE 0 END) AS fc"
        "  FROM dt WHERE term IN ('spark', 'vector', 'stream')"
        "  GROUP BY 1),"
        " m AS (SELECT CAST(sum(fa) AS BIGINT) AS ca,"
        "  CAST(sum(fb) AS BIGINT) AS cb, CAST(sum(fc) AS BIGINT) AS cc,"
        "  CAST(sum(fa * fb) AS BIGINT) AS cab,"
        "  CAST(sum(fa * fc) AS BIGINT) AS cac,"
        "  CAST(sum(fb * fc) AS BIGINT) AS cbc FROM flags)"
        " SELECT key, doc_count FROM ("
        "  SELECT 'a' AS key, ca AS doc_count FROM m UNION ALL"
        "  SELECT 'b', cb FROM m UNION ALL"
        "  SELECT 'c', cc FROM m UNION ALL"
        "  SELECT 'a&b', cab FROM m UNION ALL"
        "  SELECT 'a&c', cac FROM m UNION ALL"
        "  SELECT 'b&c', cbc FROM m) ORDER BY key"
    ),
}
