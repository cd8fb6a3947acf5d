"""Sampling operators: determinism, stratum proportions, and the
hash-split stability contract."""

from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import sampling as SM


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_uniform_sample_deterministic_and_sized(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = SM.uniform_sample(docs, 0.3, seed=7)
    b = SM.uniform_sample(docs, 0.3, seed=7)
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())
    n, total = a.count(), docs.count()
    assert 0.15 * total < n < 0.45 * total  # loose binomial bounds


def test_stratified_sample_respects_fractions(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fractions = {langs[0]: 1.0, langs[1]: 0.0}
    out = SM.stratified_sample(docs, "lang", fractions)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got.get(langs[0]) == docs.filter(F.col("lang") == langs[0]).count()
    assert langs[1] not in got


def test_hash_split_stable_partition_of_corpus(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = SM.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    # total partition: every row exactly one split
    assert out.count() == docs.count()
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # stability: same salt -> identical assignment; new salt -> different
    again = {r.doc_id: r.split for r in SM.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r.doc_id: r.split for r in out.collect()}
    assert first == again
    resalted = {
        r.doc_id: r.split
        for r in SM.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v2").collect()
    }
    assert resalted != first


def test_token_budget_by_group_respects_each_budget(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = SM.select_within_token_budget_by_group(docs, 1_500, group_col="source")
    rows = out.collect()
    assert rows, "budget selected nothing"
    # every group's running total stays inside its own budget, and the
    # selection is greedy: within a group, cum_tokens is the prefix sum
    # of n_tokens in (quality DESC, doc_id ASC) order
    per_group = {}
    for r in rows:
        per_group.setdefault(r.source, []).append(r)
    assert len(per_group) > 1
    for src, grp in per_group.items():
        grp = sorted(grp, key=lambda r: r.cum_tokens)
        assert grp[-1].cum_tokens <= 1_500
        running = 0
        for r in grp:
            running += r.n_tokens
            assert r.cum_tokens == running
        # greedy order: quality never increases along the selection
        qs = [r.quality_score for r in grp]
        assert qs == sorted(qs, reverse=True)


def test_weighted_sample_k_biases_toward_heavy_rows(spark, sf_dir):
    """A-ES weighted sampling: the sampled mean weight must exceed the
    corpus mean (heavier rows oversampled), the sample is exactly k,
    deterministic across runs, and the plan is a TakeOrdered top-k (no
    global sort, no window)."""
    from flink_elasticsearch_ingestion_spark.operators.sampling import (
        weighted_sample_k,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = weighted_sample_k(docs, "n_chars", 100)
    rows = out.collect()
    assert len(rows) == 100
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean
    again = {r.doc_id for r in weighted_sample_k(docs, "n_chars", 100).collect()}
    assert {r.doc_id for r in rows} == again
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_purged_time_split_embargo_boundaries(spark):
    """Boundary semantics: embargo band is [cutoff-embargo, cutoff) —
    a row AT cutoff-embargo is purged (not train), a row AT cutoff is
    test, and the three splits partition the input exactly."""
    from flink_elasticsearch_ingestion_spark.operators.sampling import (
        purged_time_split,
    )

    rows = [
        (1, "2024-01-19 23:59:59", 1),  # train (strictly before embargo)
        (2, "2024-01-20 00:00:00", 1),  # purged (embargo start, inclusive)
        (3, "2024-01-21 12:00:00", 2),  # purged
        (4, "2024-01-22 00:00:00", 2),  # test (cutoff, inclusive)
        (5, "2024-01-25 00:00:00", 3),  # test
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long"
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id")
    out = {
        r["split"]: r
        for r in purged_time_split(
            df, cutoff="2024-01-22 00:00:00", embargo_days=2
        ).collect()
    }
    assert out["train"]["n_events"] == 1
    assert out["purged"]["n_events"] == 2
    assert out["test"]["n_events"] == 2
    assert sum(r["n_events"] for r in out.values()) == len(rows)
    assert out["purged"]["min_ts"] == "2024-01-20 00:00:00"
    assert out["test"]["min_ts"] == "2024-01-22 00:00:00"
