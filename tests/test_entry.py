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
    # rows-only checks are intentional, enumerated here so additions are
    # conscious. Round 3 shrank this set to the genuinely non-replayable
    # ones: IVF's coarse quantizer is learned (iterative k-means), HLL
    # sketch state has no SQL twin, PCA's eigendecomposition is not
    # SQL-expressible (its Gram-matrix reduction IS hash-verified via
    # embedding_gramian), and bpe_train is an iterative driver loop
    # (its inner-loop recount bpe_pair_counts IS hash-verified);
    # everything hash-based got a real oracle via the engine-portable
    # md5 hash family.
    assert qs - oracles == {
        "ivf_topk",
        "approx_distinct",
        "embedding_pca",
        "bpe_train",
    }


def test_all_queries_run_at_sf0001(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


def test_engine_api(tmp_path, spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.api import Engine

    eng = Engine(sf_dir, spark=spark)
    assert eng.sql("SELECT count(*) AS n FROM nation").first().n == 25
    assert eng.query("nation_region_join").count() == 25
    assert "pricing_summary" in eng.query_names()
    # one-command incremental copy: second run ingests nothing new
    ck = str(tmp_path / "ck.json")
    out = str(tmp_path / "copied")
    n1 = eng.copy_run(ck, out)
    assert n1 > 0
    assert eng.copy_run(ck, out) == 0


def test_catalog_dict_literals_have_no_duplicate_keys():
    """A duplicate key inside ONE family module's QUERIES/ORACLES dict
    literal silently resolves to the last entry (Python semantics), so
    the assembler's cross-module check can't see it — this almost
    shipped a shadowed query in round 6. Parse each module's source and
    reject duplicates at the literal level."""
    import ast
    import pathlib

    import flink_elasticsearch_ingestion_spark.catalog as cat

    for mod in cat.MODULES:
        src = pathlib.Path(mod.__file__).read_text()
        tree = ast.parse(src)
        for node in tree.body:
            if not (
                isinstance(node, ast.Assign)
                and getattr(node.targets[0], "id", "") in ("QUERIES", "ORACLES")
                and isinstance(node.value, ast.Dict)
            ):
                continue
            keys = [ast.literal_eval(k) for k in node.value.keys]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, (
                f"{mod.__name__}.{node.targets[0].id} has duplicate "
                f"keys: {dupes}"
            )


def test_readme_catalog_count_matches_the_assembled_catalog():
    """README.md advertises the catalog size; the number is the public
    contract the round driver reads, so it must track the assembled
    catalog instead of drifting (round 6 shipped a one-off drift)."""
    import os
    import re

    import __spark_entry__ as E

    readme = open(os.path.join(os.path.dirname(E.__file__), "README.md")).read()
    m = re.search(r"The full operator catalog \((\d+) queries:", readme)
    assert m, "README.md lost the catalog-count sentence"
    assert int(m.group(1)) == len(E.queries())
