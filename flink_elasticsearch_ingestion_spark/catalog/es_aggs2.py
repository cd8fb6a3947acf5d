"""Catalog family: Elasticsearch aggregation-surface parity, part II.

Second slice of the ES aggregation API (sibling of catalog/es_aggs.py;
reference context core.clj:103): the histogram / metric / text-analysis
corners — rare_terms, auto_date_histogram, date_histogram with
min_doc_count:0 + extended_bounds, variable_width_histogram, boxplot,
t_test (Welch), categorize_text, string_stats, the fuzzy query, and
the highlighter.  Each query sits next to its DuckDB oracle so the
pair is reviewed and edited together."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_elasticsearch_ingestion_spark.catalog._shared import _t
from flink_elasticsearch_ingestion_spark.operators import es_aggs2 as ES2
from flink_elasticsearch_ingestion_spark.operators.es_aggs2 import (
    AUTO_HISTO_LADDER,
    FUZZY_QUERIES,
)


def q_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms over trigram-shingle phrases: long-tail buckets
    with doc_count <= 2, ascending-count order, first 50."""
    return ES2.rare_terms(_t(spark, sf_dir, "documents"))

def q_auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES auto_date_histogram: ladder-chosen interval targeting <= 20
    buckets over the event stream's observed span."""
    return ES2.auto_date_histogram(_t(spark, sf_dir, "events"))

def q_date_histogram_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram min_doc_count:0 + extended_bounds: hourly
    error-event buckets with empty hours materialized as zeros."""
    return ES2.date_histogram_dense(_t(spark, sf_dir, "events"))

def q_variable_width_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES variable_width_histogram (deterministic largest-gap spec):
    8 variable-width clusters of the order-price axis."""
    return ES2.variable_width_histogram(_t(spark, sf_dir, "orders"))

def q_boxplot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boxplot per returnflag: quartiles, Tukey 1.5*IQR whiskers,
    outlier count over l_extendedprice."""
    return ES2.boxplot_agg(_t(spark, sf_dir, "lineitem"))

def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES t_test (heteroscedastic/Welch, the ES default): purchase vs
    error event values — one conditional-sum agg pass."""
    return ES2.welch_t_test(_t(spark, sf_dir, "events"))

def q_categorize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES categorize_text: deterministic log lines -> digit-masked
    templates, top-10 by doc count."""
    return ES2.categorize_text(_t(spark, sf_dir, "events"))

def q_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES string_stats + show_distribution per source: length stats
    and char-distribution Shannon entropy (bits)."""
    return ES2.string_stats(_t(spark, sf_dir, "documents"))

def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzzy query: typo'd probes vs the corpus vocabulary, edit
    distance <= 2, prefix_length=1 blocking, top-3 per probe."""
    return ES2.fuzzy_match(_t(spark, sf_dir, "documents"), spark)

def q_search_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES highlighter: +-3-token snippet around the first 'spark'
    occurrence with <em> tags, first 20 matching docs."""
    return ES2.search_highlight(_t(spark, sf_dir, "documents"))


QUERIES = {
    "rare_terms": q_rare_terms,
    "auto_date_histogram": q_auto_date_histogram,
    "date_histogram_dense": q_date_histogram_dense,
    "variable_width_histogram": q_variable_width_histogram,
    "boxplot_agg": q_boxplot_agg,
    "welch_t_test": q_welch_t_test,
    "categorize_text": q_categorize_text,
    "string_stats": q_string_stats,
    "fuzzy_match": q_fuzzy_match,
    "search_highlight": q_search_highlight,
}

#: epoch seconds of CAST(ts AS TIMESTAMP), truncated like Spark's
#: timestamp->long cast (positive epochs: floor == truncate)
_EPOCH = "CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)"

_LADDER_VALUES = ", ".join(f"({s})" for s in AUTO_HISTO_LADDER)
_FUZZY_VALUES = ", ".join(f"('{q}')" for q in FUZZY_QUERIES)

#: DuckDB oracle per query — keys MUST be a subset of QUERIES
ORACLES = {
    "rare_terms": (
        "WITH t AS (SELECT doc_id,"
        " string_split_regex(trim(text), '\\s+') AS w FROM documents),"
        " g AS (SELECT DISTINCT doc_id,"
        "  w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS term"
        "  FROM t, LATERAL unnest(range(1, len(w) - 1)) AS r(i)"
        "  WHERE len(w) >= 3)"
        " SELECT term, CAST(count(*) AS BIGINT) AS doc_count"
        " FROM g GROUP BY term HAVING count(*) <= 2"
        " ORDER BY doc_count, term LIMIT 50"
    ),
    "auto_date_histogram": (
        f"WITH span AS (SELECT min({_EPOCH}) AS lo, max({_EPOCH}) AS hi"
        "  FROM events),"
        f" ladder(interval_s) AS (VALUES {_LADDER_VALUES}),"
        " chosen AS (SELECT CAST(min(interval_s) AS BIGINT) AS interval_s"
        "  FROM ladder CROSS JOIN span"
        "  WHERE hi // interval_s - lo // interval_s + 1 <= 20)"
        f" SELECT interval_s, strftime(make_timestamp("
        f"  ({_EPOCH} // interval_s) * interval_s * 1000000),"
        "  '%Y-%m-%d %H:%M:%S') AS bucket_start,"
        " CAST(count(*) AS BIGINT) AS n_events,"
        " round(sum(value) + 1e-9, 4) AS sum_value"
        " FROM events CROSS JOIN chosen"
        " GROUP BY interval_s, bucket_start ORDER BY bucket_start"
    ),
    "date_histogram_dense": (
        "WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value"
        "  FROM events WHERE event_type = 'error'),"
        " b AS (SELECT date_trunc('day', min(ts)) AS lo,"
        "  date_trunc('day', max(ts)) + INTERVAL 23 HOUR AS hi FROM e),"
        " spine AS (SELECT unnest(generate_series(lo, hi,"
        "  INTERVAL 1 HOUR)) AS h FROM b),"
        " c AS (SELECT date_trunc('hour', ts) AS h,"
        "  CAST(count(*) AS BIGINT) AS n,"
        "  round(sum(value) + 1e-9, 4) AS s FROM e GROUP BY 1)"
        " SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,"
        " coalesce(n, 0) AS n_events,"
        " coalesce(s, 0.0) AS sum_value"
        " FROM spine LEFT JOIN c USING (h) ORDER BY hour"
    ),
    "variable_width_histogram": (
        "WITH vals AS (SELECT o_totalprice AS v,"
        "  CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1),"
        " g AS (SELECT v, n, v - lag(v) OVER (ORDER BY v) AS gap"
        "  FROM vals),"
        " b AS (SELECT list(v ORDER BY v) AS bounds FROM"
        "  (SELECT v FROM g WHERE gap IS NOT NULL"
        "   ORDER BY gap DESC, v LIMIT 7)),"
        " a AS (SELECT v, n,"
        "  len(list_filter(bounds, x -> x <= v)) AS cluster_id"
        "  FROM vals CROSS JOIN b)"
        " SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_values,"
        " CAST(sum(n) AS BIGINT) AS n_rows,"
        " round(min(v) + 1e-9, 2) AS min_val,"
        " round(max(v) + 1e-9, 2) AS max_val,"
        " round(round(sum(v * n) + 1e-9, 2) / sum(n) + 1e-9, 4)"
        "  AS avg_val"
        " FROM a GROUP BY cluster_id ORDER BY cluster_id"
    ),
    "boxplot_agg": (
        "WITH q AS (SELECT l_returnflag,"
        "  round(quantile_cont(l_extendedprice, 0.25), 4) AS q1,"
        "  round(quantile_cont(l_extendedprice, 0.5), 4) AS q2,"
        "  round(quantile_cont(l_extendedprice, 0.75), 4) AS q3"
        "  FROM lineitem GROUP BY 1),"
        " f AS (SELECT *, round(q1 - 1.5 * (q3 - q1), 4) AS lo,"
        "  round(q3 + 1.5 * (q3 - q1), 4) AS hi FROM q)"
        " SELECT l.l_returnflag, q1, q2, q3,"
        " round(min(CASE WHEN l_extendedprice >= lo"
        "  THEN l_extendedprice END) + 1e-9, 2) AS whisker_lo,"
        " round(max(CASE WHEN l_extendedprice <= hi"
        "  THEN l_extendedprice END) + 1e-9, 2) AS whisker_hi,"
        " CAST(sum(CASE WHEN l_extendedprice < lo"
        "  OR l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT)"
        "  AS n_outliers,"
        " CAST(count(*) AS BIGINT) AS n_rows"
        " FROM lineitem l JOIN f USING (l_returnflag)"
        " GROUP BY 1, 2, 3, 4 ORDER BY 1"
    ),
    "welch_t_test": (
        "WITH s AS (SELECT"
        " CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        "  AS BIGINT) AS n_a,"
        " CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
        "  AS BIGINT) AS n_b,"
        " round(sum(value * CASE WHEN event_type = 'purchase' THEN 1"
        "  ELSE 0 END) + 1e-9, 2) AS sa,"
        " round(sum(value * CASE WHEN event_type = 'error' THEN 1"
        "  ELSE 0 END) + 1e-9, 2) AS sb,"
        " round(sum(value * value * CASE WHEN event_type = 'purchase'"
        "  THEN 1 ELSE 0 END) + 1e-9, 2) AS qa,"
        " round(sum(value * value * CASE WHEN event_type = 'error'"
        "  THEN 1 ELSE 0 END) + 1e-9, 2) AS qb FROM events),"
        " m AS (SELECT n_a, n_b,"
        "  round(sa / n_a + 1e-9, 6) AS mean_a,"
        "  round(sb / n_b + 1e-9, 6) AS mean_b,"
        "  round((qa - sa * sa / n_a) / (n_a - 1) + 1e-9, 6) AS var_a,"
        "  round((qb - sb * sb / n_b) / (n_b - 1) + 1e-9, 6) AS var_b"
        "  FROM s)"
        " SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,"
        " round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)"
        "  + 1e-9, 4) AS t_stat,"
        " round(pow(var_a / n_a + var_b / n_b, 2)"
        "  / (pow(var_a / n_a, 2) / (n_a - 1)"
        "   + pow(var_b / n_b, 2) / (n_b - 1)) + 1e-9, 2) AS df_welch,"
        " abs(round((mean_a - mean_b)"
        "  / sqrt(var_a / n_a + var_b / n_b) + 1e-9, 4)) > 1.96"
        "  AS significant"
        " FROM m"
    ),
    "categorize_text": (
        "WITH l AS (SELECT concat_ws(' ', event_type,"
        "  'user=' || user_id,"
        "  'value=' || CAST(floor(value) AS BIGINT),"
        "  'props=' || props,"
        "  CASE WHEN event_id % 3 = 0 THEN 'retry=1' END) AS line,"
        "  user_id, event_id FROM events)"
        " SELECT regexp_replace(line, '[0-9]+', '<num>', 'g')"
        "  AS category,"
        " CAST(count(*) AS BIGINT) AS n_events,"
        " CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,"
        " min(event_id) AS first_event"
        " FROM l GROUP BY category"
        " ORDER BY n_events DESC, category LIMIT 10"
    ),
    "string_stats": (
        "WITH ch AS (SELECT source AS grp,"
        "  unnest(string_split(text, '')) AS ch FROM documents),"
        " cc AS (SELECT grp, ch, CAST(count(*) AS BIGINT) AS c"
        "  FROM ch WHERE ch <> '' GROUP BY 1, 2),"
        " tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS t"
        "  FROM cc GROUP BY 1),"
        " ent AS (SELECT grp, round(-sum((c / t) * log2(c / t))"
        "  + 1e-9, 6) AS char_entropy"
        "  FROM cc JOIN tot USING (grp) GROUP BY 1),"
        " lens AS (SELECT source AS grp,"
        "  CAST(count(*) AS BIGINT) AS n_docs,"
        "  min(length(text)) AS min_len, max(length(text)) AS max_len,"
        "  round(sum(length(text)) / count(*) + 1e-9, 4) AS avg_len"
        "  FROM documents GROUP BY 1)"
        " SELECT grp AS source, n_docs, min_len, max_len, avg_len,"
        " char_entropy"
        " FROM lens JOIN ent USING (grp) ORDER BY source"
    ),
    "fuzzy_match": (
        f"WITH q(query_term) AS (VALUES {_FUZZY_VALUES}),"
        " dt AS (SELECT DISTINCT doc_id, t AS term FROM"
        "  (SELECT doc_id, unnest(string_split_regex(trim(text),"
        "   '\\s+')) AS t FROM documents) WHERE t <> ''),"
        " v AS (SELECT term, CAST(count(*) AS BIGINT) AS df"
        "  FROM dt GROUP BY 1),"
        " cand AS (SELECT q.query_term, v.term,"
        "  levenshtein(q.query_term, v.term) AS distance, v.df"
        "  FROM q JOIN v"
        "  ON substr(q.query_term, 1, 1) = substr(v.term, 1, 1)"
        "  AND abs(length(q.query_term) - length(v.term)) <= 2"
        "  WHERE levenshtein(q.query_term, v.term) <= 2),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY query_term"
        "  ORDER BY distance, df DESC, term) AS rn FROM cand)"
        " SELECT q.query_term, r.term, r.distance, r.df"
        " FROM q LEFT JOIN (SELECT * FROM r WHERE rn <= 3) r"
        "  USING (query_term)"
        " ORDER BY query_term, distance, term"
    ),
    "search_highlight": (
        "WITH t AS (SELECT doc_id,"
        "  string_split_regex(trim(text), '\\s+') AS w FROM documents),"
        " p AS (SELECT doc_id, w, list_position(w, 'spark') AS pos"
        "  FROM t),"
        " s AS (SELECT doc_id, pos,"
        "  w[greatest(pos - 3, 1):least(pos + 3, len(w))] AS frag"
        "  FROM p WHERE pos > 0)"
        " SELECT doc_id, pos AS first_pos,"
        " array_to_string(list_transform(frag,"
        "  x -> CASE WHEN x = 'spark' THEN '<em>' || x || '</em>'"
        "   ELSE x END), ' ') AS snippet"
        " FROM s ORDER BY doc_id LIMIT 20"
    ),
}
