"""Driver-contract smoke: entry() rows>0, every oracle key has a query,
flagship schema is stable."""

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "index_id", "ts", "user_id", "value", "props"]


def test_oracle_keys_subset_of_queries():
    qs = set(E.queries())
    oracles = set(E.oracle_sql())
    assert oracles <= qs
    # rows-only checks are intentional, enumerated here so additions are conscious
    assert qs - oracles == {
        "minhash_near_dup",
        "ngram_jaccard",
        "simhash_buckets",
        "embedding_near_dup",
        "lsh_topk",
        "media_features",
        "approx_distinct",
    }


def test_all_queries_run_at_sf0001(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
