"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship incremental-copy pipeline (smoke, sf0.001).
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (correctness gate).

Column names are aliased identically on both sides; floating-point
aggregates are rounded identically on both sides so the order-insensitive
value hash is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_elasticsearch_ingestion_spark.catalog import MODULES
from flink_elasticsearch_ingestion_spark.operators import copy as C
from flink_elasticsearch_ingestion_spark.catalog._shared import (  # noqa: F401
    CHECKPOINT,  # re-exported: tests and fixtures key off this constant
    _t,  # re-exported: tests load tables through the contract's loader
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: incremental ES->ES copy semantics on the live event
    stream (scan -> ts filter -> emitter projection -> last-wins dedup),
    SURVEY.md §7.1."""
    events = _t(spark, "/root/testdata/sf0.001", "events")
    return C.incremental_copy(events, checkpoint_ts=CHECKPOINT)


# Round-11 driver window (the driver hash-checks the FIRST 50 entries
# of ``queries()`` per round).  Executes round 10's rotation plan
# exactly: round-11 additions first (never driver-checked), then the
# CORRECTNESS_r04 remainder displaced past round 10's 50-entry
# boundary (in r04 order), then the oldest r5 entries in
# CORRECTNESS_r05 order.  Names absent from the catalog are skipped,
# extras append in catalog order, so the list is safe to edit.
#
# ROUND-12 ROTATION NOTE: after this window lands green, the oldest
# driver proofs are the r5 entries displaced past this round's 50-slot
# boundary by the four ES-parity families (r05 positions 3+:
# lp_communities, triangle_count,
# pq_encode, pq_search, bpe_encode,
# ivf_topk_fixed, kmv_overlap, ks_drift,
# dedup_threshold_sweep, shared_spans, media_near_dup, span_leakage,
# skew_profile, bigram_pmi, binary_ingest, ab_test,
# temperature_sample, dsir_weights, chi2_terms, mmr_rerank,
# zipf_fit, target_encode, k_anonymity, rfm_segments,
# touch_attribution, revenue_anomalies — last proven r5), then the
# CORRECTNESS_r05 remainder (r05 positions 29+: quantile_normalize,
# hash_embed, survival_curve, benford_check, market_concentration,
# langid_eval, revenue_gini, ewma_forecast, span_corruption,
# kfold_split, correlation_matrix, ndcg_eval, yoy_growth,
# bootstrap_ci, diversified_topk, cdc_chunk_stats,
# cusum_changepoints, quality_dedup_survivors, centroid_margin,
# label_disagreement, lexical_diversity, oov_rate) and then the r6
# block.  The next window = round-12 additions, then that displaced
# r5 tail, then the r5 remainder in r05 order, then the oldest r6
# entries in CORRECTNESS_r06 order.
_WINDOW_PRIORITY = [
    # round-11 additions, never driver-checked:
    "simhash_hamming_pairs",
    "embedding_anisotropy",
    "length_bucketing_waste",
    "rbo_eval",
    "es_http_roundtrip",
    # round-11 ES-aggregation parity family (catalog/es_aggs.py),
    # never driver-checked:
    "significant_terms",
    "decay_score_topk",
    "composite_agg_page",
    "terms_shard_error",
    "percolate_matches",
    "more_like_this",
    "percentile_ranks",
    "filters_adjacency",
    # round-11 ES-aggregation parity part II (catalog/es_aggs2.py),
    # never driver-checked:
    "rare_terms",
    "auto_date_histogram",
    "date_histogram_dense",
    "variable_width_histogram",
    "boxplot_agg",
    "welch_t_test",
    "categorize_text",
    "string_stats",
    "fuzzy_match",
    "search_highlight",
    # round-11 ES query-DSL compiler family (catalog/es_query.py),
    # never driver-checked:
    "bool_dsl_filter",
    "wildcard_query",
    "match_phrase_count",
    # round-11 `_search` endpoint family (catalog/es_search.py),
    # never driver-checked:
    "search_endpoint_hits",
    "search_endpoint_aggs",
    "search_endpoint_histo",
    "search_endpoint_collapse",
    "search_endpoint_highlight",
    # r4 remainder (displaced past round 10's boundary, r04 order):
    "training_batches", "incremental_near_dup", "split_leakage",
    "term_postings", "bm25_search", "weighted_sample", "salted_join",
    "hll_rollup", "ivf_assign", "lsh_topk_multiprobe", "knn_join_lsh",
    "pricing_summary", "asof_join", "tumbling_windows",
    "session_windows", "returnflag_pivot", "segment_set_ops",
    # oldest r5 re-checks (CORRECTNESS_r05 order):
    "basket_rules", "copurchase_pagerank", "lp_communities",
    "triangle_count", "pq_encode", "pq_search", "bpe_encode",
    "ivf_topk_fixed", "kmv_overlap", "ks_drift",
    "dedup_threshold_sweep", "shared_spans", "media_near_dup",
    "span_leakage", "skew_profile", "bigram_pmi", "binary_ingest",
    "ab_test", "temperature_sample", "dsir_weights", "chi2_terms",
    "mmr_rerank", "zipf_fit", "target_encode", "k_anonymity",
    "rfm_segments", "touch_attribution", "revenue_anomalies",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Catalog of every implemented query/operator, reordered so the
    driver's bounded 50-entry correctness window (see
    ``_WINDOW_PRIORITY``) covers never-checked and freshly-repaired
    entries first.  The FULL catalog (every entry, regardless of window
    position) is oracle-differenced against DuckDB at sf0.01 by
    ``scripts/check_oracle.py`` before each round's commit."""
    cat = _catalog()
    ordered = {k: cat[k] for k in _WINDOW_PRIORITY if k in cat}
    ordered.update((k, v) for k, v in cat.items() if k not in ordered)
    return ordered


def _catalog() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Assemble the full catalog from the per-family registries
    (flink_elasticsearch_ingestion_spark/catalog/*). Duplicate names
    across families are a bug — fail loudly rather than shadow."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in MODULES:
        dup = set(out) & set(mod.QUERIES)
        assert not dup, f"duplicate catalog keys across families: {dup}"
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """Assemble the DuckDB oracle map from the same family registries.
    Every oracle key must name a catalog query (the reverse need not
    hold). Rows-only by design — no oracle, pinned by differential or
    recall units instead: ivf_topk (learned k-means quantizer),
    embedding_pca (eigendecomposition), approx_distinct (HLL bit-runs),
    bpe_train (iterative driver loop; its inner-loop recount
    bpe_pair_counts IS hash-checked)."""
    queries_keys = set(_catalog())
    out: dict[str, str] = {}
    for mod in MODULES:
        stray = set(mod.ORACLES) - set(mod.QUERIES)
        assert not stray, f"{mod.__name__}: oracles without queries: {stray}"
        out.update(mod.ORACLES)
    assert set(out) <= queries_keys
    return out
