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


# Round-7 driver window (the driver hash-checks the FIRST 50 entries of
# ``queries()`` per round).  Priority: the 7 round-6 additions that have
# NEVER produced a driver-verified row (judge-verified green on a
# vanilla session in round 6, VERDICT.md), then round-7 additions,
# topped up to 50 with the oldest round-2 re-checks (CORRECTNESS_r02,
# oldest driver proof in the archive; rows-only ``ivf_topk`` skipped in
# favor of hash-checkable entries).  Names absent from the catalog are
# skipped, extras append in catalog order, so the list is safe to edit.
#
# ROUND-8 ROTATION NOTE: after this window lands green, every entry
# authored through round 6 is driver-proven.  Any round-7 additions
# beyond position 50 plus the remaining round-2/3 re-checks
# (CORRECTNESS_r02 tail from ``near_dup_clusters`` on, then the
# CORRECTNESS_r03 list) fill the next window oldest-first.
_WINDOW_PRIORITY = [
    # 7 round-6 additions, never driver-checked:
    "interval_overlap", "sqrt_frequency_cap", "corpus_datasheet",
    "mixing_epochs", "quality_threshold_sweep",
    "dormant_rich_customers", "seasonal_decompose",
    # round-7 additions, never driver-checked:
    "perceptual_dedup_real", "group_auc", "cohens_kappa",
    "rrf_fusion", "ann_recall_eval", "purged_time_split",
    # round-2 re-checks, oldest-first (CORRECTNESS_r02 order):
    "text_stats", "quality_scores", "language_id", "fingerprints",
    "token_counts", "event_type_share", "training_data_pipeline",
    "hash_split", "dedup_content", "dedup_exact", "minhash_near_dup",
    "ngram_jaccard", "simhash_buckets", "cosine_topk",
    "pandas_cosine_topk", "knn_join", "embedding_near_dup",
    "lsh_topk", "media_stats", "media_features", "media_resize",
    "media_frames", "user_event_sets", "bulk_chunks_distributed",
    "near_dup_clusters", "tfidf_top_terms", "pack_documents",
    "deterministic_sample", "repetition_ratio", "contamination",
    "redact_pii", "promo_revenue_share", "idle_rich_customers",
    "lonely_late_suppliers", "ingestion_diff", "value_histogram",
    "revenue_forecast", "late_shipment_priorities", "volume_shipping",
    "order_count_distribution", "top_supplier", "disjunctive_revenue",
    "passage_dedup",
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
