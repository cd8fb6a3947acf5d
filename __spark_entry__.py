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


# Round-6 driver window (the driver hash-checks the FIRST 50 entries of
# ``queries()`` per round).  Priority: the 39 catalog entries that have
# NEVER produced a driver-verified row — the 22 round-4 leftovers plus
# the 17 round-5 additions (all hash-green under the type-strict local
# gate AND the vanilla-session driver replica,
# scripts/check_oracle.py --vanilla) — topped up to 50 with 11 stable
# round-1 re-checks.  Names absent from the catalog are skipped, extras
# append in catalog order, so the list is safe to edit.
#
# ROUND-7 ROTATION NOTE: after this window lands green, every catalog
# entry authored through round 5 is driver-proven.  Round-6 additions
# land at position 51+ and need promotion next round:
# interval_overlap, sqrt_frequency_cap, corpus_datasheet,
# mixing_epochs, quality_threshold_sweep, dormant_rich_customers,
# seasonal_decompose (see the family modules in
# flink_elasticsearch_ingestion_spark/catalog/); fill the remainder
# with round-2/3 re-checks oldest-first.
_WINDOW_PRIORITY = [
    # 22 round-4 leftovers, never driver-checked:
    "probe_calibration", "session_occupancy", "contrastive_triples",
    "score_normalize", "winnowing", "neyman_sample",
    "source_similarity", "kcenter_select", "kmeans_fixed",
    "holt_forecast", "skyline_docs", "dp_histogram", "l_diversity",
    "dim_truncation_recall", "groupwise_ols", "textrank_keywords",
    "weighted_quantiles", "priority_spanning_customers",
    "join_size_estimate", "incremental_join_view", "hilbert_key",
    "top_component",
    # 17 round-5 additions, never driver-checked:
    "streaming_admission_replay", "bucketed_join",
    "leakage_safe_folds", "time_travel_diff", "kn_bigram_score",
    "scrub_shared_spans", "es_search_after_page",
    "dedup_passages_global", "unimax_sample",
    "cluster_weighted_sample", "window_novelty", "forecast_backtest",
    "waiting_suppliers", "difficulty_stratified_eval", "ql_search",
    "containment_pairs", "trimmed_stats",
    # 11 round-1 re-checks (stable, cheap) to fill the 50:
    "pricing_summary", "top_orders", "dedup_exact", "cosine_topk",
    "text_stats", "json_extract", "url_parse", "asof_join",
    "tumbling_windows", "latest_event_per_user", "string_functions",
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
