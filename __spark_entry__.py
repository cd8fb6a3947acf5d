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


# Round-8 driver window (the driver hash-checks the FIRST 50 entries of
# ``queries()`` per round).  Priority: round-8 additions (never
# driver-checked), then the stale-proof backlog oldest-first — entries
# whose newest driver proof is CORRECTNESS_r01 (37 hash-checkable, in
# r01 order), then the remaining r02 entries (11), topped up from the
# head of the r03 list.  Rows-only entries (``approx_distinct``,
# ``ivf_topk``) are skipped in favor of hash-checkable ones, same
# policy as round 7.  Names absent from the catalog are skipped,
# extras append in catalog order, so the list is safe to edit.
#
# ROUND-9 ROTATION NOTE: after this window lands green, no entry's
# newest driver proof predates round 2, and only 12 r2 entries remain.
# The next window = the 12 displaced r2 entries (``volume_shipping``
# through ``product_type_profit`` — pushed past position 50 by the 12
# round-8 additions), then the CORRECTNESS_r03 remainder (listed below
# the boundary, ``small_quantity_revenue`` on), then the rows-only
# pair (``approx_distinct``, ``ivf_topk``) for their weaker rows-check
# refresh.
_WINDOW_PRIORITY = [
    # round-8 additions, never driver-checked:
    "token_fertility", "duplicate_token_share", "cross_source_near_dup",
    "fleiss_kappa", "balanced_shards", "compaction_plan",
    "autocorrelation", "mutual_matches", "sorted_neighborhood_dedup",
    "theil_sen_trend", "margin_matches", "spearman_scores",
    # r1 re-checks, oldest driver proof in the archive (CORRECTNESS_r01
    # order; several sit on since-rewritten code — diamond fix r4,
    # two-phase bulk_chunks r5, global-rank path r5):
    "copy_incremental", "copy_full", "checkpoint_max_ts", "bulk_chunks",
    "users_never_purchased", "top_revenue_orders",
    "local_supplier_volume", "returned_item_losses",
    "large_quantity_orders", "nation_region_join",
    "customers_with_orders", "customers_without_orders",
    "top_order_per_customer", "revenue_rollup", "order_priority_cube",
    "ship_within_30d", "events_by_day", "math_functions", "event_gaps",
    "funnel", "event_gaps_pandas", "running_revenue",
    "order_moving_avg", "next_event_type", "price_rank_distribution",
    "orders_above_cust_avg", "purchases_after_click", "date_functions",
    "array_functions", "map_functions", "embedding_dim_stats",
    "price_quantiles", "order_stats", "arg_extremes", "salted_agg",
    "grouping_sets", "top_words",
    # r2 re-checks (CORRECTNESS_r02 order, rows-only ivf_topk skipped);
    # the 12 round-8 additions above displace the last twelve names
    # past the 50-entry window — they queue first for round 9:
    "late_shipment_priorities",
    # --- position 50 boundary (wnd = 12 new + 37 r1 + 1 r2);
    #     displaced r2 tail + r3 remainder queue for round 9 ---
    "volume_shipping",
    "order_count_distribution",
    "top_supplier", "disjunctive_revenue",
    "passage_dedup", "top_bigrams", "embedding_norms",
    "quantize_embeddings", "shuffle_order", "sliding_windows",
    "market_share", "product_type_profit",
    "small_quantity_revenue", "trailing_revenue_window",
    "priority_value_percentiles", "similar_part_names",
    "parts_supplier_counts", "dominant_suppliers",
    "cheapest_supplier_per_part", "prior_event_counts",
    "chunk_documents", "chunk_documents_udtf", "approx_stats",
    "hybrid_search", "text_dup_components", "label_centroids",
    "cdc_classify", "important_part_value", "scd2_user_state",
    "vocab_with_ids", "zorder_key", "incremental_rollup",
    "stratified_exact_k", "token_entropy", "constraint_report",
    "bigram_lm", "weighted_discount_udaf", "quantize_embeddings_arrow",
    "resample_events", "unpivot_metrics", "null_safe_rollup",
    "clean_text", "token_budget", "priority_shipping_mix",
    "source_mix", "es_bulk_roundtrip",
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
