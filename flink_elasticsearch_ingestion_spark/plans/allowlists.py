"""Plan-audit allowlists — the SINGLE source of truth shared by the
pytest audits (tests/test_plans.py) and the committed artifact
generator (scripts/plan_report.py).

They lived in the test module through round 9; ADVICE r9 flagged that
the report then hard-depended on the tests/ directory layout via a
sys.path hack (a pytest-less deployment broke the artifact generator).
Both consumers now import from here, so the report still runs the
EXACT audits pytest runs (the round-8 lesson: plan_report said "zero
flags" while a pytest audit row was red, because the report didn't run
the same check at all).
"""

from __future__ import annotations

#: EMPTY as of round 6: similar_part_names (the last intentional
#: all-pairs) moved to SymSpell deletion-neighborhood blocking; its
#: naive form survives only as the blocked=False unit baseline. Keep
#: this empty by restructuring, never by allowlisting.
CROSS_JOIN_OK: set[str] = set()

#: join a single-row scalar aggregate (corr over lineitem; the corpus
#: size N for idf) — a 1-row broadcast nested loop is the correct plan
#: for a scalar subquery
#: important_part_value joins a 1-row (total, count) threshold
#: aggregate back onto the per-part table — AQE sometimes leaves the
#: 1-row broadcast as a BNLJ, which is the correct scalar-subquery plan
#: growth_accounting / rolling_wau join a 1-row corpus-horizon aggregate
#: bm25_search joins the 1-row (n_docs, avgdl, df_i) corpus-statistics
#: aggregate onto the per-doc term-frequency table — scalar subquery
#: substring_contamination is an INTENTIONAL broadcast nested-loop
#: needle scan: the benchmark-sized needle table broadcasts and the
#: corpus is scanned once map-side with a `contains` predicate — the
#: documented shape for exact-substring decontamination
#: heavy_hitters joins the 1-row global decrement-budget scalar
#: corpus_build_pipeline embeds substring_contamination's needle scan
#: kmv_overlap's pairwise sketch comparison is a theta self-join over
#: the GROUPS-SIZED sketch table (<= |event types| rows, each row one
#: k-element sketch) — quadratic in group count by definition of
#: "all pairs", never in data volume
#: dedup_threshold_sweep joins the literal threshold grid (8 rows)
#: against <= 10-row jaccard histograms — bounded by construction
#: skew_profile joins the 1-row (total, n_keys) summary onto the
#: top-N frame — scalar subquery
SCALAR_JOIN_OK = {
    # knn_join broadcasts its BOUNDED query panel (max_queries
    # structural cap; count-checked at build) onto a single corpus
    # scan — the BNLJ small side is panel-sized by construction, and
    # the per-query rank is two-phase salted (no corpus-sized window
    # partitions). Fact-sized query sides raise and route to
    # knn_join_lsh.
    "knn_join",
    # 1-row avg-positive-balance scalar broadcast onto the customer
    # frame (TPC-H Q22 pattern)
    "dormant_rich_customers",
    "kmv_overlap",
    "dedup_threshold_sweep",
    "skew_profile",
    "bigram_pmi",
    "ab_test",
    # 1-row sqrt-sum denominator broadcast onto the |langs|-row frame
    # BroadcastHashJoin on the block key — same scalar-subquery class
    # as dormant_rich_customers
    "theil_sen_trend",
}

#: unpartitioned-window audit exceptions — every entry must say WHY the
#: window input is bounded even though the plan can't prove it.
#: Currently EMPTY: the one bounded-in-fact-but-not-structurally case
#: (ndcg_eval's post-join rank windows) was rewritten as aggregate
#: folds over the collected <= k-row array, so the whole catalog passes
#: the audit structurally.
UNPARTITIONED_WINDOW_OK: set[str] = set()
