"""Round-11 ES query-DSL compiler (operators/es_query.py): per-node
compile semantics on literal fixtures — term/terms/range/exists/
prefix/wildcard/match/match_phrase/match_all leaves, bool composition
with ES's documented should-optionality rule, minimum_should_match
counting, the analyzed-field `term` guard, and loud failure on
unknown node types — plus plan pins (the compiled filter is a single
scan predicate: no joins, no exchanges before the cut).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import es_query as EQ
from flink_elasticsearch_ingestion_spark.plans import (
    assert_no_accidental_quadratic_join,
    assert_no_unpartitioned_fact_window,
    physical_plan,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _ids(df, dsl):
    return sorted(
        r["doc_id"] for r in df.where(EQ.compile_query(dsl)).collect()
    )


@pytest.fixture()
def corpus(spark):
    return _docs(
        spark,
        [
            (0, "spark merge window", "en", "src1", 100),
            (1, "slow scan table", "en", "src3", 200),
            (2, "vector stream data", "de", "src10", 300),
            (3, "the fast join", "fr", "src2", 400),
            (4, "spark slow scan", "zh", "src1", 150),
        ],
    )


# ------------------------------------------------------------- leaves


def test_term_terms_range_exists_prefix(corpus):
    assert _ids(corpus, {"term": {"source": "src1"}}) == [0, 4]
    assert _ids(corpus, {"terms": {"lang": ["de", "fr"]}}) == [2, 3]
    assert _ids(corpus, {"range": {"n_chars": {"gte": 200, "lt": 400}}}) == [1, 2]
    assert _ids(corpus, {"exists": {"field": "lang"}}) == [0, 1, 2, 3, 4]
    # prefix src1 matches src1 AND src10 (string prefix, not equality)
    assert _ids(corpus, {"prefix": {"source": "src1"}}) == [0, 2, 4]


def test_term_on_analyzed_field_raises(corpus):
    # the classic ES pitfall: `term` on an analyzed field silently
    # matches nothing server-side; here it fails at compile time
    with pytest.raises(ValueError, match="analyzed"):
        EQ.compile_query({"term": {"text": "spark"}})


def test_wildcard_translation_and_escaping(corpus):
    assert _ids(corpus, {"wildcard": {"text": "*fast*"}}) == [3]
    assert _ids(corpus, {"wildcard": {"source": "src?0"}}) == [2]
    # regex metachars in the pattern match literally
    assert EQ.wildcard_to_regex("a.b*c") == "^a\\.b.*c$"
    assert _ids(corpus, {"wildcard": {"source": "src.1"}}) == []


def test_match_or_and_msm(corpus):
    # default operator OR
    assert _ids(corpus, {"match": {"text": "spark vector"}}) == [0, 2, 4]
    # operator AND
    assert _ids(
        corpus, {"match": {"text": {"query": "spark merge", "operator": "and"}}}
    ) == [0]
    # minimum_should_match as a term count
    assert _ids(
        corpus,
        {"match": {"text": {"query": "spark slow merge", "minimum_should_match": 2}}},
    ) == [0, 4]


def test_match_phrase_consecutive_tokens_only(corpus):
    # doc 1 has 'slow scan' consecutively; doc 4 too; a doc with the
    # words in the wrong order must NOT match
    assert _ids(corpus, {"match_phrase": {"text": "slow scan"}}) == [1, 4]
    assert _ids(corpus, {"match_phrase": {"text": "scan slow"}}) == []
    # single-token phrase respects token boundaries: 'the' does not
    # match inside 'the fast join' partial words
    assert _ids(corpus, {"match_phrase": {"text": "fast join"}}) == [3]


def test_match_all(corpus):
    assert _ids(corpus, {"match_all": {}}) == [0, 1, 2, 3, 4]


# --------------------------------------------------------------- bool


def test_bool_must_filter_must_not(corpus):
    dsl = {
        "bool": {
            "must": [{"match": {"text": "spark"}}],
            "filter": [{"range": {"n_chars": {"gte": 120}}}],
            "must_not": [{"match_phrase": {"text": "slow scan"}}],
        }
    }
    # spark docs: 0, 4; n_chars >= 120 drops 0; must_not drops 4
    assert _ids(corpus, dsl) == []
    dsl["bool"]["filter"] = [{"range": {"n_chars": {"gte": 100}}}]
    assert _ids(corpus, dsl) == [0]


def test_bool_should_optional_with_must_required_alone(corpus):
    # with a must present, shoulds are optional (scoring-only)
    with_must = {
        "bool": {
            "must": [{"match": {"text": "spark"}}],
            "should": [{"term": {"lang": "zz"}}],
        }
    }
    assert _ids(corpus, with_must) == [0, 4]
    # a bool of ONLY shoulds requires at least one
    only_should = {
        "bool": {
            "should": [{"term": {"lang": "de"}}, {"term": {"lang": "fr"}}]
        }
    }
    assert _ids(corpus, only_should) == [2, 3]
    # explicit minimum_should_match overrides the default
    msm2 = {
        "bool": {
            "must": [{"match_all": {}}],
            "should": [
                {"term": {"source": "src1"}},
                {"match": {"text": "spark"}},
                {"range": {"n_chars": {"lte": 150}}},
            ],
            "minimum_should_match": 2,
        }
    }
    assert _ids(corpus, msm2) == [0, 4]


def test_should_match_count_column(corpus):
    shoulds = [
        {"term": {"source": "src1"}},
        {"match": {"text": "spark"}},
    ]
    got = {
        r["doc_id"]: r["n"]
        for r in corpus.select(
            "doc_id", EQ.should_match_count(shoulds).alias("n")
        ).collect()
    }
    assert got == {0: 2, 1: 0, 2: 0, 3: 0, 4: 2}


def test_unknown_node_and_malformed_raise():
    with pytest.raises(ValueError, match="unsupported DSL query type"):
        EQ.compile_query({"fuzzy_search_9000": {"text": "x"}})
    with pytest.raises(ValueError, match="single-key"):
        EQ.compile_query({"term": {"a": 1}, "range": {"b": {}}})
    with pytest.raises(ValueError, match="unsupported bool sections"):
        EQ.compile_query({"bool": {"shuold": []}})
    with pytest.raises(ValueError, match="zero terms"):
        EQ.compile_query({"match": {"text": "   "}})


# ------------------------------------------------------------ plan pins


@pytest.mark.parametrize(
    "name", ["bool_dsl_filter", "wildcard_query", "match_phrase_count"]
)
def test_dsl_queries_plan_shape(spark, name):
    from flink_elasticsearch_ingestion_spark.catalog import es_query as C

    df = C.QUERIES[name](spark, "/root/testdata/sf0.001")
    assert_no_accidental_quadratic_join(df)
    assert_no_unpartitioned_fact_window(df)
    # a compiled DSL filter is a scan predicate: exactly one scan,
    # and no join node of any kind in the plan
    plan = physical_plan(df)
    assert "Join" not in plan


def test_bool_filter_pushes_down_nonanalyzed_predicates(spark):
    # the range/terms filters must reach the parquet scan
    from flink_elasticsearch_ingestion_spark.catalog import es_query as C

    df = C.QUERIES["bool_dsl_filter"](spark, "/root/testdata/sf0.001")
    plan = physical_plan(df)
    assert "PushedFilters" in plan
    assert "n_chars" in plan.split("PushedFilters")[1][:400]
