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


# Round-9 driver window (the driver hash-checks the FIRST 50 entries of
# ``queries()`` per round).  Priority: round-9 additions (never
# driver-checked), then the stale-proof backlog oldest-first — the 10
# hash-checkable r2 entries displaced past round 8's boundary, the
# rows-only pair (``approx_distinct`` r1 / ``ivf_topk`` r2, due their
# weaker rows-check refresh — skipped in favor of hash-checkable rows
# since round 7), then the CORRECTNESS_r03 remainder in r03 order.
# Names absent from the catalog are skipped, extras append in catalog
# order, so the list is safe to edit.
#
# ROUND-10 ROTATION NOTE: after this window lands green, the only
# entries with a driver proof older than round 4 are the r3 names that
# fall past position 50 below (the tail after the boundary marker).
# The next window = round-10 additions, then that r3 tail, then the
# oldest r4 entries in CORRECTNESS_r04 order.
_WINDOW_PRIORITY = [
    # round-9 additions, never driver-checked:
    "centered_mutual_matches",
    "recall_vs_bucket_cap",
    "string_id_knn",
    "saturating_dedup_rate",
    "minhash_band_stats",
    "token_coverage_curve",
    "doc_length_calibration",
    "ngram_novelty",
    "token_gini",
    "langid_confusion",
    "source_kl_drift",
    "shard_skew_report",
    # r2 re-checks (CORRECTNESS_r02 order): displaced past round 8's
    # 50-entry boundary by the round-8 additions:
    "volume_shipping", "order_count_distribution", "top_supplier",
    "disjunctive_revenue", "passage_dedup", "top_bigrams",
    "embedding_norms", "quantize_embeddings", "shuffle_order",
    "sliding_windows",
    # rows-only pair — weaker rows-check refresh (oldest proofs in the
    # archive: approx_distinct r1, ivf_topk r2):
    "approx_distinct", "ivf_topk",
    # r3 re-checks (CORRECTNESS_r03 order):
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
    "bigram_lm",
    # --- position 50 boundary (wnd = 12 new + 10 r2 + 2 rows-only
    #     + 26 r3); r3 tail below queues for round 10 ---
    "weighted_discount_udaf", "quantize_embeddings_arrow",
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
