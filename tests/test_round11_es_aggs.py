"""Round-11 ES-aggregation parity family (catalog/es_aggs.py):
hand-computed semantic pins on literal fixtures for each operator —
the JLH formula, the gauss decay curve, after-key pagination edges,
the terms-agg doc_count_error accounting, percolator must/must_not,
MLT two-phase-rank equivalence, inverse percentiles, and the
adjacency matrix — plus plan pins (WindowGroupLimit for the decay
rank; no fact-sized single partitions anywhere, covered by the
catalog-wide audits in test_plans.py).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import es_aggs as ES


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


# ---------------------------------------------------------------- JLH


def test_significant_terms_jlh_formula(spark):
    # foreground s1 = 10 docs: 'hot' in 6 of them, 'base' in all;
    # background adds 10 s2 docs where 'hot' appears once.
    rows = []
    for i in range(10):
        rows.append((i, "base hot" if i < 6 else "base", "en", "s1"))
    for i in range(10, 20):
        rows.append((i, "base hot" if i == 10 else "base", "en", "s2"))
    out = ES.significant_terms(
        _docs(spark, rows), min_doc_count=2, k=5
    ).collect()
    by = {(r["source"], r["term"]): r for r in out}
    # hot in s1: fg = 6/10, bg = 7/20 -> jlh = (0.6-0.35)*(0.6/0.35)
    exp = (0.6 - 0.35) * (0.6 / 0.35)
    got = by[("s1", "hot")]
    assert got["subset_df"] == 6 and got["superset_df"] == 7
    assert got["jlh"] == pytest.approx(round(exp + 1e-9, 6))
    # 'base' is everywhere: fg == bg -> jlh 0 -> excluded both sides
    assert ("s1", "base") not in by and ("s2", "base") not in by
    # hot in s2 is UNDER-represented (fg 0.1 < bg 0.35) -> excluded
    assert ("s2", "hot") not in by


# -------------------------------------------------------- gauss decay


def test_decay_score_topk_curve_and_plateau(spark):
    # events exactly at origin, inside the offset plateau, and exactly
    # one scale past the plateau (score must be value * decay there)
    origin = "2024-01-15 00:00:00"
    ev = spark.createDataFrame(
        [
            (1, "2024-01-15 00:00:00", "a", 10.0),  # dist 0 -> plateau
            (2, "2024-01-15 12:00:00", "a", 10.0),  # < offset -> plateau
            (3, "2024-01-23 00:00:00", "a", 10.0),  # offset+scale -> *decay
            (4, "2024-01-07 00:00:00", "a", 10.0),  # symmetric (before)
            (5, "2024-01-15 00:00:00", "b", 4.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    out = {
        r["event_id"]: r["score"]
        for r in ES.decay_score_topk(
            ev, origin=origin, scale_s=604800.0, offset_s=86400.0, decay=0.5
        ).collect()
    }
    assert out[1] == pytest.approx(10.0)
    assert out[2] == pytest.approx(10.0)
    assert out[3] == pytest.approx(5.0)  # exactly decay at scale
    assert out[4] == pytest.approx(5.0)  # |dist| symmetric
    assert out[5] == pytest.approx(4.0)


def test_decay_rank_compiles_to_window_group_limit(spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.catalog._shared import (
        CHECKPOINT,
        _t,
    )

    df = ES.decay_score_topk(_t(spark, sf_dir, "events"), origin=CHECKPOINT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


# ---------------------------------------------------- composite after


def test_composite_after_key_is_strict(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-15 01:00:00", "click", 1.0),   # == after-key: out
            (2, "2024-01-16 01:00:00", "click", 2.0),   # after day: in
            (3, "2024-01-01 01:00:00", "aaa", 3.0),     # type < click: out
            (4, "2024-01-01 01:00:00", "view", 4.0),    # type > click: in
        ],
        "event_id long, ts string, event_type string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    got = [
        (r["event_type"], r["day"])
        for r in ES.composite_agg_page(ev, page_size=10).collect()
    ]
    assert got == [("click", "2024-01-16"), ("view", "2024-01-01")]


# ------------------------------------------------- terms shard error


def test_terms_shard_error_accounting(spark):
    # 2 shards (doc_id mod 2), shard_size 2.  Shard 0 docs {0,2,4},
    # shard 1 docs {1,3}.
    # shard 0 counts: x3 y2 z1 -> keeps x(3) y(2), floor 2
    # shard 1 counts: z2 x1   -> keeps z(2) x(1), floor 1
    rows = [
        (0, "x y", "en", "s"),
        (2, "x y", "en", "s"),
        (4, "x z", "en", "s"),
        (1, "z x", "en", "s"),
        (3, "z", "en", "s"),
    ]
    out = {
        r["term"]: (r["doc_count"], r["error_upper_bound"])
        for r in ES.terms_shard_error(
            _docs(spark, rows), n_shards=2, shard_size=2, k=10
        ).collect()
    }
    # x reported by both shards: count 3+1, error 0
    assert out["x"] == (4, 0)
    # y reported only by shard 0: error = shard 1's floor = 1
    assert out["y"] == (2, 1)
    # z reported only by shard 1: error = shard 0's floor = 2
    assert out["z"] == (2, 2)


def test_terms_shard_error_partial_shard_floor_is_zero(spark):
    # a shard returning FEWER than shard_size terms held nothing back:
    # its floor must be 0, not its min count
    rows = [
        (0, "x", "en", "s"),   # shard 0: only term x -> floor 0
        (1, "y z", "en", "s"),  # shard 1: y, z (2 = shard_size) -> floor 1
    ]
    out = {
        r["term"]: (r["doc_count"], r["error_upper_bound"])
        for r in ES.terms_shard_error(
            _docs(spark, rows), n_shards=2, shard_size=2, k=10
        ).collect()
    }
    # y/z missing from shard 0 contribute shard 0's floor = 0
    assert out["y"] == (1, 0) and out["z"] == (1, 0)
    # x missing from shard 1 contributes shard 1's floor = 1
    assert out["x"] == (1, 1)


# ---------------------------------------------------------- percolate


def test_percolate_must_not_and_zero_hits(spark):
    rows = [
        (0, "spark table", "en", "s"),
        (1, "table vector", "en", "s"),
        (2, "table", "en", "s"),
    ]
    queries = (
        (0, "table", None),        # all three docs
        (1, "table", "vector"),    # docs 0, 2 (doc 1 excluded)
        (2, "nope", None),         # zero hits, stays visible
    )
    out = {
        r["query_id"]: (r["n_matches"], r["first_match"])
        for r in ES.percolate_matches(
            _docs(spark, rows), spark, queries=queries
        ).collect()
    }
    assert out[0] == (3, 0)
    assert out[1] == (2, 0)
    assert out[2] == (0, None)


# ------------------------------------------------------ more_like_this


def test_more_like_this_two_phase_equals_direct_window(spark, sf_dir):
    """The salted two-phase per-seed rank must return EXACTLY the rows
    a direct (lang-partitioned) rank window would — top-k with a total
    order is two-phase-safe."""
    from flink_elasticsearch_ingestion_spark.catalog._shared import _t

    docs = _t(spark, sf_dir, "documents")
    got = ES.more_like_this(docs, k=5).collect()

    # direct-window reference form (test-only; fact-sized partitions)
    tall = docs.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")).where(F.col("term") != "")
    dt = tall.distinct()
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    seeds = docs.groupBy("lang").agg(F.min("doc_id").alias("seed_id"))
    seed_tf = (
        tall.join(seeds, tall.doc_id == seeds.seed_id)
        .groupBy("lang", "seed_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    qt = (
        seed_tf.join(dfreq, "term")
        .where(F.col("df") >= 2)
        .withColumn("idf", idf)
        .withColumn("tscore", F.round(F.col("tf") * F.col("idf") + F.lit(1e-9), 6))
    )
    wq = Window.partitionBy("lang").orderBy(F.desc("tscore"), F.asc("term"))
    qterms = (
        qt.withColumn("qrn", F.row_number().over(wq))
        .where(F.col("qrn") <= 5)
        .select("lang", "seed_id", "term", "idf")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    ref = (
        dt.join(qterms, "term")
        .where(F.col("doc_id") != F.col("seed_id"))
        .groupBy("lang", "seed_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"), F.round(F.sum("idf") + F.lit(1e-9), 6).alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "seed_id", "doc_id", "n_shared", "score")
        .collect()
    )
    key = lambda r: (r["lang"], r["doc_id"])  # noqa: E731
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))
    assert len({key(r) for r in got}) == len(got)


def test_more_like_this_idf_formula(spark):
    # 4 docs; seed (doc 0, lang en) has terms a(tf 2), b, rare(df 1 ->
    # dropped by min_doc_freq 2)
    rows = [
        (0, "a a b rare", "en", "s"),
        (1, "a b", "en", "s"),
        (2, "a", "en", "s"),
        (3, "b c", "en", "s"),
    ]
    out = ES.more_like_this(_docs(spark, rows), max_query_terms=5, min_doc_freq=2, k=5).collect()
    by = {(r["lang"], r["doc_id"]): r for r in out}
    idf_a = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    idf_b = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    # doc 1 shares a and b
    assert by[("en", 1)]["n_shared"] == 2
    assert by[("en", 1)]["score"] == pytest.approx(round(idf_a + idf_b + 1e-9, 6))
    # doc 3 shares only b; 'rare' never scores (df < min_doc_freq)
    assert by[("en", 3)]["n_shared"] == 1


# ------------------------------------------------- percentile_ranks


def test_percentile_ranks_exact_inverse_percentiles(spark):
    li = spark.createDataFrame(
        [("A", float(p)) for p in (10, 20, 30, 40)],
        "l_returnflag string, l_extendedprice double",
    )
    out = {
        r["value"]: r["pct_rank"]
        for r in ES.percentile_ranks(li, values=(15.0, 30.0, 100.0)).collect()
    }
    assert out[15.0] == pytest.approx(25.0)
    assert out[30.0] == pytest.approx(75.0)   # <= is inclusive
    assert out[100.0] == pytest.approx(100.0)


# ---------------------------------------------------- adjacency matrix


def test_filters_adjacency_cells(spark):
    rows = [
        (0, "p q", "en", "s"),
        (1, "p", "en", "s"),
        (2, "q r", "en", "s"),
        (3, "p q r", "en", "s"),
    ]
    out = {
        r["key"]: r["doc_count"]
        for r in ES.filters_adjacency(
            _docs(spark, rows), filters=(("a", "p"), ("b", "q"), ("c", "r"))
        ).collect()
    }
    assert out == {"a": 3, "b": 3, "c": 2, "a&b": 2, "a&c": 1, "b&c": 2}
