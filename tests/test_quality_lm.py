"""Tests for the data-quality constraint suite, the bigram-LM scorer,
the GROUPED_AGG UDAF, the mapInArrow quantizer twin, and the
stream-static enrichment join."""

import pytest

from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators.quality import (
    constraint_report,
    referential_report,
)
from flink_elasticsearch_ingestion_spark.operators.text import bigram_lm_score
from flink_elasticsearch_ingestion_spark.sources.tables import load_events


# ---------------------------------------------------------------- quality


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "OK"),
            (2, None, 5.0, "OK"),
            (2, "c@x.com", -1.0, "BAD"),
            (3, "not-an-email", 250.0, "OK"),
        ],
        "id long, email string, amount double, status string",
    )


def test_constraint_report_counts_planted_violations(spark):
    rules = [
        {"kind": "not_null", "column": "email"},
        {"kind": "unique", "column": "id"},
        {"kind": "in_range", "column": "amount", "lo": 0.0, "hi": 100.0},
        {"kind": "accepted_values", "column": "status", "values": ("OK",)},
        {"kind": "matches", "column": "email", "pattern": "^[^@]+@[^@]+$"},
    ]
    rows = {r["rule"]: r.asDict() for r in constraint_report(_frame(spark), rules).collect()}
    assert rows["not_null_email"]["n_violations"] == 1
    assert rows["unique_id"]["n_violations"] == 1  # id=2 twice -> 1 extra
    assert rows["in_range_amount"]["n_violations"] == 2  # -1 and 250
    assert rows["accepted_values_status"]["n_violations"] == 1
    assert rows["matches_email"]["n_violations"] == 1  # not-an-email
    assert rows["not_null_email"]["passed"] is False
    assert all(set(v) == {"rule", "column", "kind", "n_violations", "passed"} for v in rows.values())


def test_constraint_report_all_green_on_clean_rules(spark):
    rules = [{"kind": "in_range", "column": "amount", "lo": -10.0, "hi": 1000.0}]
    row = constraint_report(_frame(spark), rules).first()
    assert row["n_violations"] == 0 and row["passed"] is True


def test_constraint_report_one_pass_plan(spark):
    """All rules must compile into a single aggregate — exactly one scan
    of the input in the optimized plan."""
    rules = [
        {"kind": "not_null", "column": "email"},
        {"kind": "in_range", "column": "amount", "lo": 0.0, "hi": 100.0},
        {"kind": "matches", "column": "email", "pattern": "@"},
    ]
    plan = constraint_report(_frame(spark), rules)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_constraint_report_rejects_empty_and_duplicate_rules(spark):
    with pytest.raises(ValueError):
        constraint_report(_frame(spark), [])
    with pytest.raises(ValueError):
        constraint_report(
            _frame(spark),
            [{"kind": "not_null", "column": "email"}, {"kind": "not_null", "column": "email"}],
        )


def test_referential_report_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_report(child, parent, fk="fk", pk="pk").first()
    assert row["n_violations"] == 1  # 99; null fk is not an orphan
    assert row["kind"] == "ref_integrity" and row["passed"] is False


# --------------------------------------------------------------- bigram LM


def test_bigram_lm_zero_entropy_for_deterministic_corpus(spark):
    """A corpus where every prefix has exactly one continuation is
    perfectly predictable -> cross_entropy 0 for every doc."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert out[1]["cross_entropy"] == 0.0
    assert out[2]["n_bigrams"] == 2
    assert out[3]["cross_entropy"] == 0.0


def test_bigram_lm_outlier_scores_higher(spark):
    """A doc taking RARE continuations of COMMON prefixes must score
    strictly higher cross-entropy than the corpus-typical docs (a rare
    continuation of a prefix never seen elsewhere would score 0 — the
    conditional is what the model measures)."""
    typical = [(i, "a b a b a b") for i in range(10)]
    outlier = [(99, "a a b a")]  # "a a" is a rare continuation of "a"
    docs = spark.createDataFrame(typical + outlier, "doc_id long, text string")
    out = {r["doc_id"]: r["cross_entropy"] for r in bigram_lm_score(docs).collect()}
    assert out[99] > out[0]


def test_bigram_lm_skips_sub_bigram_docs(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, "two words")], "doc_id long, text string"
    )
    got = bigram_lm_score(docs).collect()
    assert [r["doc_id"] for r in got] == [2]


# ------------------------------------------------------------- UDAF parity


def test_weighted_discount_udaf_matches_expression_twin(spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.operators.relational import (
        weighted_discount_udaf,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for r in weighted_discount_udaf(li).collect():
        assert r["weighted_avg_discount"] == pytest.approx(
            r["weighted_avg_discount_expr"], abs=1e-9
        ), r


# --------------------------------------------------------- mapInArrow twin


def test_quantize_arrow_twin_matches_expression_form(spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.operators.embeddings import (
        quantize_embeddings,
        quantize_embeddings_arrow,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    expr = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    arrow = {r["vec_id"]: r for r in quantize_embeddings_arrow(emb).collect()}
    assert set(expr) == set(arrow)
    for vid, e in expr.items():
        a = arrow[vid]
        assert (a["q_min"], a["q_max"], a["label"]) == (e["q_min"], e["q_max"], e["label"])
        assert a["scale"] == pytest.approx(e["scale"], abs=1e-12)
        assert a["recon_err"] == pytest.approx(e["recon_err"], abs=1e-10)


# ------------------------------------------------------- stream-static join


def _users_dim(spark, sf_dir):
    events = load_events(spark, sf_dir)
    return (
        events.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.when(F.col("user_id") % 2 == 0, "consumer").otherwise("business").alias("segment"),
            (F.col("user_id") % 5).cast("string").alias("home_region"),
        )
    )


def test_stream_static_enrich_matches_batch(tmp_path, spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.streaming.analytics import (
        enrich_stream,
        stream_enriched_counts,
    )

    in_dir = str(tmp_path / "events_in")
    load_events(spark, sf_dir).write.parquet(in_dir)
    users = _users_dim(spark, sf_dir)
    q = stream_enriched_counts(
        spark, in_dir, users, str(tmp_path / "es_ck"), query_name="enrich_test"
    )
    q.awaitTermination(120)
    streamed = spark.table("enrich_test")
    batch = (
        enrich_stream(spark.read.parquet(in_dir), users)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    # every event matched the dim (inner join is lossless here)
    assert streamed.agg(F.sum("n_events")).first()[0] == spark.read.parquet(in_dir).count()


# -------------------------------------------------------------- clean_text


def test_clean_text_strips_tags_entities_and_boilerplate(spark):
    from flink_elasticsearch_ingestion_spark.operators.text import clean_text

    docs = spark.createDataFrame(
        [
            (
                1,
                "<html><body>real content with many words here</body></html>\n"
                "Home About\n"
                "&lt;tag&gt; literal stays &amp; so does this line\n"
                "   \n"
                "menu",
            )
        ],
        "doc_id long, text string",
    )
    r = clean_text(docs).first()
    # tag line survives detagged; 2-word and 1-word boilerplate dropped
    assert r["n_lines_kept"] == 2
    assert r["n_lines_dropped"] == 3
    assert "<html>" not in r["clean_text"]
    assert "real content with many words here" in r["clean_text"]
    assert "<tag> literal stays & so does this line" in r["clean_text"]
    assert "menu" not in r["clean_text"]
    assert r["n_chars_clean"] < r["n_chars_raw"]


def test_table_profile_single_scan_counts_nulls(spark):
    from flink_elasticsearch_ingestion_spark.operators.quality import table_profile

    df = spark.createDataFrame(
        [(1.0, 2.0), (None, 4.0), (3.0, 4.0)], "a double, b double"
    )
    got = {r.column_name: r for r in table_profile(df, ["a", "b"]).collect()}
    assert got["a"].n_rows == 3 and got["a"].n_nulls == 1
    assert got["a"].n_distinct == 2 and got["a"].min_val == 1.0
    assert got["b"].n_nulls == 0 and got["b"].n_distinct == 2
    assert abs(got["b"].avg_val - (10.0 / 3)) < 1e-3
    # ONE aggregation pass: exactly one Aggregate pair (partial+final)
    # and one scan in the plan
    plan = table_profile(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # the single ExistingRDD scan (+reuse)


def test_table_profile_approx_distinct_no_expand(spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.operators.quality import table_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_discount"]
    exact = {r.column_name: r for r in table_profile(li, cols).collect()}
    approx = {
        r.column_name: r
        for r in table_profile(li, cols, approx_distinct=True).collect()
    }
    for c in cols:
        # HLL++ default rsd 5%: allow a generous band
        assert abs(approx[c].n_distinct - exact[c].n_distinct) <= max(
            3, 0.1 * exact[c].n_distinct
        )
        # every non-distinct statistic must be identical
        assert approx[c].n_rows == exact[c].n_rows
        assert approx[c].n_nulls == exact[c].n_nulls
        assert approx[c].min_val == exact[c].min_val
        assert approx[c].avg_val == exact[c].avg_val
    # the approx plan drops the Expand the exact distincts need
    plan = (
        table_profile(li, cols, approx_distinct=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan
