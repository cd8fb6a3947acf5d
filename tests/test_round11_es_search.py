"""Round-11 `_search` endpoint umbrella (operators/es_search.py):
body dispatch semantics on literal fixtures — hit mode (sort
direction/default, size default, _source projection), terms agg
(_count/_key order, size cut, nested metric + stats sub-aggs),
date_histogram buckets, standalone metrics, and loud failures on
unknown body keys / agg families / mixed modes — plus plan pins
(hit mode is a TakeOrderedAndProject; agg mode adds no joins).
"""

from __future__ import annotations

import datetime as dt

import pytest

from flink_elasticsearch_ingestion_spark.operators.es_search import es_search
from flink_elasticsearch_ingestion_spark.plans import (
    assert_no_accidental_quadratic_join,
    assert_no_unpartitioned_fact_window,
    physical_plan,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "vector stream", "en", "s1", 100),
            (1, "vector table", "de", "s1", 300),
            (2, "plain words", "en", "s2", 300),
            (3, "vector query", "en", "s2", 200),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_hit_mode_sort_size_source(docs):
    out = es_search(
        docs,
        {
            "query": {"match": {"text": "vector"}},
            "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": "asc"}],
            "size": 2,
            "_source": ["doc_id", "n_chars"],
        },
    ).collect()
    assert [tuple(r) for r in out] == [(1, 300), (3, 200)]
    assert out[0].asDict().keys() == {"doc_id", "n_chars"}


def test_hit_mode_defaults(docs):
    # ES defaults: size 10, sort order asc when given as a dict
    out = es_search(docs, {"sort": [{"doc_id": {"order": "asc"}}]}).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]


def test_terms_agg_count_order_and_subaggs(docs):
    body = {
        "aggs": {
            "by_lang": {
                "terms": {"field": "lang", "size": 10, "order": {"_count": "desc"}},
                "aggs": {
                    "chars": {"stats": {"field": "n_chars"}},
                    "sources": {"cardinality": {"field": "source"}},
                },
            }
        }
    }
    out = es_search(docs, body).collect()
    assert [r["key"] for r in out] == ["en", "de"]
    en = out[0]
    assert en["doc_count"] == 3
    assert (en["chars_min"], en["chars_max"]) == (100, 300)
    assert en["chars_sum"] == 600.0
    assert en["chars_avg"] == 200.0
    assert en["sources"] == 2


def test_terms_agg_key_order_and_size_cut(docs):
    body = {
        "aggs": {
            "top": {"terms": {"field": "lang", "size": 1, "order": {"_key": "asc"}}}
        }
    }
    out = es_search(docs, body).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("de", 1)]


def test_date_histogram_with_metric_subagg(spark):
    rows = [
        (0, dt.datetime(2024, 1, 1, 5), 1, "purchase", 10.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 9), 1, "purchase", 20.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 5), 1, "purchase", 7.0, "{}"),
        (3, dt.datetime(2024, 1, 2, 6), 1, "click", 9.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    body = {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {"value_avg": {"avg": {"field": "value"}}},
            }
        },
    }
    out = es_search(events, body).collect()
    assert [(r["key"], r["doc_count"], r["value_avg"]) for r in out] == [
        ("2024-01-01 00:00:00", 2, 15.0),
        ("2024-01-02 00:00:00", 1, 7.0),
    ]


def test_standalone_metric_agg(docs):
    out = es_search(
        docs, {"aggs": {"n_langs": {"cardinality": {"field": "lang"}}}}
    ).collect()
    assert len(out) == 1 and out[0]["n_langs"] == 2


def test_collapse_groups_inner_hits_and_size(docs):
    body = {
        "collapse": {"field": "lang", "inner_hits": {"size": 2}},
        "sort": [{"n_chars": {"order": "desc"}}, {"doc_id": "asc"}],
        "size": 2,
        "_source": ["doc_id", "lang", "n_chars"],
    }
    out = [tuple(r) for r in es_search(docs, body).collect()]
    # en's best is n_chars 300 (doc 2 by doc_id tiebreak vs doc 1?
    # no — doc 1 is de); group order: en(300, doc 2) ties de(300,
    # doc 1): ordering on (n_chars desc, doc_id asc) puts de's doc 1
    # first -> group 1 = de (1 doc), group 2 = en (top-2 of 3)
    assert out == [
        (1, 1, 1, "de", 300),
        (2, 1, 2, "en", 300),
        (2, 2, 3, "en", 200),
    ]


def test_collapse_requires_sort_and_excludes_aggs(docs):
    with pytest.raises(ValueError, match="explicit sort"):
        es_search(docs, {"collapse": {"field": "lang"}})
    with pytest.raises(ValueError, match="mutually exclusive"):
        es_search(
            docs,
            {
                "collapse": {"field": "lang"},
                "sort": [{"doc_id": "asc"}],
                "aggs": {"a": {"terms": {"field": "lang"}}},
            },
        )


def test_highlight_wraps_all_match_terms(docs):
    body = {
        "query": {"match": {"text": "vector stream"}},
        "highlight": {"fields": {"text": {}}},
        "sort": [{"doc_id": "asc"}],
        "size": 10,
        "_source": ["doc_id"],
    }
    out = {r["doc_id"]: r["highlight_text"] for r in es_search(docs, body).collect()}
    assert out[0] == "<em>vector</em> <em>stream</em>"
    assert out[1] == "<em>vector</em> table"
    assert 2 not in out  # no match -> not a hit
    # custom tags
    body2 = dict(body, highlight={"fields": {"text": {}},
                                  "pre_tags": ["["], "post_tags": ["]"]})
    out2 = {r["doc_id"]: r["highlight_text"] for r in es_search(docs, body2).collect()}
    assert out2[3] == "[vector] query"


def test_highlight_without_match_clause_raises(docs):
    with pytest.raises(ValueError, match="needs a match clause"):
        es_search(
            docs,
            {
                "query": {"term": {"lang": "en"}},
                "highlight": {"fields": {"text": {}}},
            },
        )


def test_error_paths(docs):
    with pytest.raises(ValueError, match="unsupported search body keys"):
        es_search(docs, {"quarry": {}})
    with pytest.raises(ValueError, match="exactly one top-level"):
        es_search(docs, {"aggs": {"a": {"terms": {"field": "lang"}},
                                  "b": {"terms": {"field": "source"}}}})
    with pytest.raises(ValueError, match="unsupported aggregation family"):
        es_search(docs, {"aggs": {"a": {"percentile_rank_9000": {"field": "x"}}}})
    with pytest.raises(ValueError, match="mutually exclusive"):
        es_search(docs, {"aggs": {"a": {"terms": {"field": "lang"}}},
                         "sort": [{"doc_id": "asc"}]})
    with pytest.raises(ValueError, match="unsupported terms order"):
        es_search(docs, {"aggs": {"a": {"terms": {"field": "lang",
                                                  "order": {"_score": "desc"}}}}})
    with pytest.raises(ValueError, match="unsupported calendar_interval"):
        es_search(docs, {"aggs": {"a": {"date_histogram": {
            "field": "ts", "calendar_interval": "fortnight"}}}})
    with pytest.raises(ValueError, match="no sub-aggs"):
        es_search(docs, {"aggs": {"a": {"avg": {"field": "n_chars"},
                                        "aggs": {"x": {"sum": {"field": "n_chars"}}}}}})


def test_catalog_plan_shapes(spark):
    from flink_elasticsearch_ingestion_spark.catalog import es_search as C

    for name, fn in C.QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert_no_accidental_quadratic_join(df)
        assert_no_unpartitioned_fact_window(df)
    hits = C.QUERIES["search_endpoint_hits"](spark, "/root/testdata/sf0.001")
    assert "TakeOrderedAndProject" in physical_plan(hits)
