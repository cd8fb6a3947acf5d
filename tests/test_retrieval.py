"""Tests for the full-text retrieval block: inverted-index build,
term statistics, and BM25 ranked retrieval (the batch analog of the
reference's Elasticsearch serving index — core.clj ships documents
into ES; these build and score the same structures corpus-side)."""

import math

from flink_elasticsearch_ingestion_spark.operators.text import (
    bm25_search,
    inverted_index,
    term_statistics,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------- inverted index


def test_inverted_index_postings(spark):
    docs = _docs(
        spark,
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")],
    )
    postings = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in inverted_index(docs, min_token_len=3).collect()
    }
    assert postings[("apple", 1)] == 2
    assert postings[("apple", 3)] == 1
    assert postings[("banana", 2)] == 1
    assert ("cherry", 1) not in postings


def test_inverted_index_drops_short_tokens(spark):
    docs = _docs(spark, [(1, "a bb ccc dddd")])
    terms = {r["term"] for r in inverted_index(docs, min_token_len=3).collect()}
    assert terms == {"ccc", "dddd"}


def test_term_statistics_orders_by_df(spark):
    docs = _docs(
        spark,
        [
            (1, "apple banana"),
            (2, "apple banana banana"),
            (3, "apple"),
        ],
    )
    rows = term_statistics(docs, k=10).collect()
    assert [r["term"] for r in rows] == ["apple", "banana"]
    apple, banana = rows
    assert (apple["df"], apple["cf"], apple["max_tf"]) == (3, 3, 1)
    assert (banana["df"], banana["cf"], banana["max_tf"]) == (2, 3, 2)


# ------------------------------------------------------------ bm25


def _bm25_score(tf, df, n, doclen, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * doclen / avgdl))


def test_bm25_matches_hand_formula(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark flink"),
            (2, "spark flink flink flink"),
            (3, "hadoop hive pig storm"),
        ],
    )
    rows = {
        r["doc_id"]: r for r in bm25_search(docs, ["spark"], k=10).collect()
    }
    # doc 3 has no query term -> filtered out entirely
    assert set(rows) == {1, 2}
    avgdl = (3 + 4 + 4) / 3.0
    exp1 = _bm25_score(2, 2, 3, 3, avgdl)
    exp2 = _bm25_score(1, 2, 3, 4, avgdl)
    assert abs(rows[1]["bm25"] - round(exp1 + 1e-9, 6)) < 1e-9
    assert abs(rows[2]["bm25"] - round(exp2 + 1e-9, 6)) < 1e-9
    assert rows[1]["bm25"] > rows[2]["bm25"]


def test_bm25_rare_term_outranks_common(spark):
    # 'rare' appears in one doc, 'common' in all: idf must dominate,
    # so the rare-term doc outranks equally-sized common-term docs.
    docs = _docs(
        spark,
        [
            (1, "common rare filler filler"),
            (2, "common filler filler filler"),
            (3, "common filler filler filler"),
        ],
    )
    rows = bm25_search(docs, ["common", "rare"], k=3).collect()
    assert rows[0]["doc_id"] == 1


def test_bm25_length_normalization(spark):
    # same tf, longer doc -> lower score (b > 0 penalizes length)
    docs = _docs(
        spark,
        [
            (1, "spark x"),
            (2, "spark x x x x x x x"),
        ],
    )
    rows = {r["doc_id"]: r["bm25"] for r in bm25_search(docs, ["spark"], k=2).collect()}
    assert rows[1] > rows[2]


def test_bm25_multi_term_accumulates(spark):
    docs = _docs(spark, [(1, "spark merge"), (2, "spark spark")])
    one = {
        r["doc_id"]: r["bm25"]
        for r in bm25_search(docs, ["spark"], k=2).collect()
    }
    two = {
        r["doc_id"]: r["bm25"]
        for r in bm25_search(docs, ["spark", "merge"], k=2).collect()
    }
    # adding a matching term strictly raises doc 1's score, not doc 2's
    assert two[1] > one[1]
    assert abs(two[2] - one[2]) < 1e-6


def test_auto_lsh_bits_tracks_corpus_size():
    """bits = log2(n/target): bucket occupancy — and with it candidate
    volume per vector — must stay constant as the corpus grows (the sf1
    spot-run measured 36x wall-clock from fixed bits on a 10x corpus).
    The sf0.01 value (500 vectors -> 4) is what the DuckDB oracles'
    inlined plane literals assume, so drift here must fail loudly."""
    from flink_elasticsearch_ingestion_spark.operators.similarity import (
        auto_lsh_bits,
    )

    assert auto_lsh_bits(500) == 4  # sf0.01 oracle fixture — pinned
    assert auto_lsh_bits(10) == 3  # floor
    assert auto_lsh_bits(2_000) == 6
    assert auto_lsh_bits(20_000) == 10
    assert auto_lsh_bits(10**12) == 24  # literal-budget ceiling
    # occupancy invariant: expected bucket size within [target/2, 2*target]
    for n in (100, 10_000, 1_000_000, 10**8):
        bits = auto_lsh_bits(n)
        if bits not in (3, 24):  # outside the clamps
            assert 16 <= n / 2**bits <= 64
