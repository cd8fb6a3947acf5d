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


# Round-10 driver window (the driver hash-checks the FIRST 50 entries
# of ``queries()`` per round).  Executes round 9's rotation plan
# exactly: round-10 additions first (never driver-checked), then the
# r3 tail displaced past round 9's 50-entry boundary, then the oldest
# r4 entries in CORRECTNESS_r04 order.  Names absent from the catalog
# are skipped, extras append in catalog order, so the list is safe to
# edit.
#
# ROUND-11 ROTATION NOTE: after this window lands green, the oldest
# driver proofs are the CORRECTNESS_r04 remainder (the 17 r4 names
# past position 50 below) and then the r5 block.  The next window =
# round-11 additions, then that r4 remainder in r04 order, then the
# oldest r5 entries in CORRECTNESS_r05 order.
_WINDOW_PRIORITY = [
    # round-10 additions, never driver-checked:
    "bpe_train_fixed",
    "minhash_estimate_error",
    "planted_dup_recall",
    "context_window_fit",
    "token_burstiness",
    "pq_distortion",
    "kcore_fixed",
    # r3 tail (displaced past round 9's boundary):
    "weighted_discount_udaf", "quantize_embeddings_arrow",
    "resample_events", "unpivot_metrics", "null_safe_rollup",
    "clean_text", "token_budget", "priority_shipping_mix",
    "source_mix", "es_bulk_roundtrip",
    # oldest r4 re-checks (CORRECTNESS_r04 order):
    "es_scroll_roundtrip", "token_budget_by_source",
    "time_weighted_value", "event_trigrams", "cohort_retention",
    "table_profile", "growth_accounting", "drift_psi",
    "scrub_boilerplate", "equi_depth_buckets", "sessionize",
    "rolling_wau", "winsorized_stats", "merge_apply",
    "embedding_gramian", "embedding_pca", "cms_word_counts",
    "scd2_lookup", "jl_projection", "ohlc_bars", "erase_users",
    "gopher_quality", "substring_contamination", "token_set_join",
    "bloom_prefilter_join", "mad_outliers", "heavy_hitters",
    "linear_probe", "corpus_build_pipeline", "feature_hashing",
    "bpe_pair_counts", "bpe_train", "embedding_dup_clusters",
    # --- position 50 boundary (wnd = 7 new + 10 r3 + 33 r4); the r4
    #     remainder below queues for round 11 ---
    "training_batches", "incremental_near_dup", "split_leakage",
    "term_postings", "bm25_search", "weighted_sample", "salted_join",
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
