"""JSONL/CSV ingestion-edge connectors: round-trips, corrupt-record
handling, parquet conversion; streaming session-window parity."""

import pyspark.sql.functions as F

from flink_elasticsearch_ingestion_spark.functions.json_shaping import encode_body
from flink_elasticsearch_ingestion_spark.operators.copy import BODY_COLS, shape_documents
from flink_elasticsearch_ingestion_spark.sources.formats import (
    DOC_EXPORT_SCHEMA,
    audit_and_convert,
    corrupt_count,
    drop_corrupt,
    export_documents_jsonl,
    import_documents_jsonl,
    read_csv,
    read_jsonl,
    to_parquet_layout,
    write_csv,
)
from flink_elasticsearch_ingestion_spark.sources.tables import load_events


def test_documents_jsonl_round_trip(tmp_path, spark, sf_dir):
    docs = encode_body(
        shape_documents(load_events(spark, sf_dir)), BODY_COLS
    ).select("doc_id", "index_id", "source")
    path = str(tmp_path / "docs_jsonl")
    export_documents_jsonl(docs, path)
    back = drop_corrupt(import_documents_jsonl(spark, path))
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0
    # the exported body is the same JSON the ES bulk emitter would send
    assert corrupt_count(import_documents_jsonl(spark, path)) == 0


def test_jsonl_corrupt_lines_survive_not_fail(tmp_path, spark):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": "a", "index_id": "i", "source": "{}"}\n'
        "this is not json\n"
        '{"doc_id": "b", "index_id": "i", "source": "{}"}\n'
    )
    df = read_jsonl(spark, str(p), DOC_EXPORT_SCHEMA)
    assert df.count() == 3
    assert corrupt_count(df) == 1
    assert drop_corrupt(df).count() == 2


def test_csv_round_trip_preserves_timestamps(tmp_path, spark, sf_dir):
    events = load_events(spark, sf_dir).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type"
    )
    path = str(tmp_path / "events_csv")
    write_csv(events, path)
    back = drop_corrupt(
        read_csv(
            spark,
            path,
            "event_id long, ts timestamp, user_id long, event_type string",
        )
    )
    assert back.count() == events.count()
    assert back.exceptAll(events).count() == 0


def test_to_parquet_layout_round_trip(tmp_path, spark, sf_dir):
    docs = encode_body(
        shape_documents(load_events(spark, sf_dir)), BODY_COLS
    ).select("doc_id", "index_id", "source")
    jsonl = str(tmp_path / "edge")
    export_documents_jsonl(docs, jsonl)
    pq = str(tmp_path / "working")
    to_parquet_layout(import_documents_jsonl(spark, jsonl), pq)
    assert spark.read.parquet(pq).exceptAll(docs).count() == 0


def test_audit_and_convert_single_cache_released(tmp_path, spark):
    # the audit+convert pair parses once (one cache) and leaves no
    # cached parse trees behind (round-2 advice: the separate calls
    # each cached the frame and never unpersisted)
    p = tmp_path / "edge"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": "a", "index_id": "i", "source": "{}"}\n'
        "not json at all\n"
        '{"doc_id": "b", "index_id": "i", "source": "{}"}\n'
    )
    spark.catalog.clearCache()
    # earlier tests in the shared session may hold localCheckpoint blocks
    # that clearCache() doesn't release — assert no NEW entries, not zero
    before = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    df = read_jsonl(spark, str(p), DOC_EXPORT_SCHEMA)
    pq = str(tmp_path / "working")
    n_bad = audit_and_convert(df, pq)
    assert n_bad == 1
    back = spark.read.parquet(pq)
    assert back.count() == 2
    assert "_corrupt_record" not in back.columns
    # nothing newly cached after the edge completes
    after = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert after - before == set()


def test_corrupt_count_releases_its_cache(tmp_path, spark):
    p = tmp_path / "edge2"
    p.mkdir()
    (p / "part-0.json").write_text('{"doc_id": "a", "index_id": "i", "source": "{}"}\n')
    spark.catalog.clearCache()
    before = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert corrupt_count(read_jsonl(spark, str(p), DOC_EXPORT_SCHEMA)) == 0
    after = {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert after - before == set()


def test_stream_session_windows_match_batch(tmp_path, spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.operators.windows import session_windows
    from flink_elasticsearch_ingestion_spark.streaming.analytics import (
        stream_session_counts,
    )

    in_dir = str(tmp_path / "events_in")
    load_events(spark, sf_dir).write.parquet(in_dir)
    q = stream_session_counts(
        spark, in_dir, str(tmp_path / "ss_ck"), query_name="sess_test"
    )
    q.awaitTermination(120)
    streamed = spark.table("sess_test")
    batch = session_windows(spark.read.parquet(in_dir)).select(
        "user_id", F.col("session_start").cast("timestamp").alias("session_start"), "n_events"
    )
    assert streamed.count() == batch.count()
    assert streamed.select("user_id", F.col("session_start").cast("timestamp"), "n_events").exceptAll(batch).count() == 0


def test_schema_evolution_merge_and_contract(tmp_path, spark):
    from flink_elasticsearch_ingestion_spark.sources.formats import (
        cast_to_contract,
        read_merged,
    )

    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "doc_id long, text string").write.mode(
        "append"
    ).parquet(out)
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(out)
    merged = read_merged(spark, out)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[1]["lang"] is None and rows[2]["lang"] == "en"
    # contract enforcement: add missing, cast, drop extras — same
    # projection for both drift variants
    contract = "doc_id string, lang string, quality double"
    aligned = cast_to_contract(merged, contract)
    assert [f.simpleString() for f in aligned.schema.fields] == [
        "doc_id:string",
        "lang:string",
        "quality:double",
    ]
    got = {r["doc_id"]: r for r in aligned.collect()}
    assert got["1"]["quality"] is None and got["2"]["lang"] == "en"


def test_orc_round_trip_and_pushdown(tmp_path, spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.sources.formats import (
        read_orc,
        write_orc,
    )
    from flink_elasticsearch_ingestion_spark.plans import physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    p = str(tmp_path / "docs_orc")
    write_orc(docs, p)
    back = read_orc(spark, p)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0
    # the vectorized ORC scan must receive the pushed filter + pruned
    # columns, same contract as the parquet edges
    plan = physical_plan(back.filter(F.col("doc_id") < 100).select("doc_id", "lang"))
    assert "orc" in plan.lower()
    assert "PushedFilters: [" in plan and "LessThan(doc_id" in plan
    assert "n_chars" not in plan.split("ReadSchema")[1].split("\n")[0]
