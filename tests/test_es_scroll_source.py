"""Custom Python DataSource (es_scroll): the reference's scroll-source
contract against a file-backed index — shard-sliced partitions,
ts-range filter pushdown into the reader, paged reads, and the polling
stream reader with lines-consumed offsets."""

import datetime as dt
import json
import os

import pyspark.sql.functions as F

from flink_elasticsearch_ingestion_spark.functions.json_shaping import encode_body
from flink_elasticsearch_ingestion_spark.operators.copy import BODY_COLS, shape_documents
from flink_elasticsearch_ingestion_spark.sources.es_scroll import (
    EsScrollDataSource,
    EsScrollReader,
    EsScrollStreamReader,
    write_index_shards,
)
from flink_elasticsearch_ingestion_spark.sources.tables import load_events


def _docs(spark, sf_dir):
    return encode_body(shape_documents(load_events(spark, sf_dir)), BODY_COLS).select(
        "doc_id", "index_id", "ts", "source"
    )


def _stage(tmp_path, spark, sf_dir, n_shards=4):
    idx = str(tmp_path / "index")
    write_index_shards(_docs(spark, sf_dir), idx, n_shards=n_shards)
    return idx


def test_batch_read_round_trips_every_column(tmp_path, spark, sf_dir):
    spark.dataSource.register(EsScrollDataSource)
    idx = _stage(tmp_path, spark, sf_dir)
    got = (
        spark.read.format("es_scroll")
        .option("path", idx)
        .option("batch_size", "100")
        .load()
    )
    want = _docs(spark, sf_dir).select(
        "doc_id", "index_id", F.col("ts").cast("timestamp").alias("ts"), "source"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_one_partition_per_shard(tmp_path, spark, sf_dir):
    spark.dataSource.register(EsScrollDataSource)
    idx = _stage(tmp_path, spark, sf_dir, n_shards=4)
    df = spark.read.format("es_scroll").option("path", idx).load()
    assert df.rdd.getNumPartitions() == 4


def test_ts_filter_pushes_into_reader_and_stays_correct(tmp_path, spark, sf_dir):
    spark.dataSource.register(EsScrollDataSource)
    idx = _stage(tmp_path, spark, sf_dir)
    ck = F.lit("2024-01-15 00:00:00").cast("timestamp")
    got = (
        spark.read.format("es_scroll")
        .option("path", idx)
        .load()
        .filter(F.col("ts") > ck)
    )
    want = _docs(spark, sf_dir).filter(F.col("ts").cast("timestamp") > ck)
    assert got.count() == want.count()


def test_push_filters_accepts_ts_bound_rejects_rest(tmp_path, spark, sf_dir):
    idx = _stage(tmp_path, spark, sf_dir)
    from pyspark.sql.datasource import EqualTo, GreaterThan

    r = EsScrollReader({"path": idx})
    rest = list(
        r.pushFilters(
            [
                GreaterThan(("ts",), dt.datetime(2024, 1, 15)),
                EqualTo(("index_id",), "click"),
            ]
        )
    )
    assert r.ts_lower == dt.datetime(2024, 1, 15)
    assert len(rest) == 1  # the index_id equality is handed back to Spark


def test_multiple_pushed_lower_bounds_keep_tightest(tmp_path, spark, sf_dir):
    # Catalyst may push ts > A AND ts >= B as separate filters; the
    # reader must apply the strongest, not the last-seen
    idx = _stage(tmp_path, spark, sf_dir)
    from pyspark.sql.datasource import GreaterThan, GreaterThanOrEqual

    r = EsScrollReader({"path": idx})
    list(
        r.pushFilters(
            [
                GreaterThan(("ts",), dt.datetime(2024, 1, 20)),
                GreaterThanOrEqual(("ts",), dt.datetime(2024, 1, 10)),
            ]
        )
    )
    assert r.ts_lower == dt.datetime(2024, 1, 20)
    assert not r.ts_lower_inclusive
    # equal values: exclusive (>) is stricter than inclusive (>=)
    r2 = EsScrollReader({"path": idx})
    list(
        r2.pushFilters(
            [
                GreaterThanOrEqual(("ts",), dt.datetime(2024, 1, 20)),
                GreaterThan(("ts",), dt.datetime(2024, 1, 20)),
            ]
        )
    )
    assert r2.ts_lower == dt.datetime(2024, 1, 20)
    assert not r2.ts_lower_inclusive


def test_empty_index_directory_reads_zero_rows(tmp_path, spark):
    # a valid index with no shard files must read as empty, not error
    # (the DataSource API rejects an empty partitions() list)
    spark.dataSource.register(EsScrollDataSource)
    idx = tmp_path / "empty_index"
    idx.mkdir()
    df = spark.read.format("es_scroll").option("path", str(idx)).load()
    assert df.count() == 0
    assert df.columns == ["doc_id", "index_id", "ts", "source"]


def test_stream_reader_reads_only_new_tail(tmp_path, spark, sf_dir):
    """Offset = lines consumed per shard: a second poll picks up ONLY
    appended documents, and readBetweenOffsets replays a window."""
    idx = _stage(tmp_path, spark, sf_dir, n_shards=2)
    r = EsScrollStreamReader({"path": idx})
    start = r.initialOffset()
    rows1, off1 = r._read_from(start)
    assert len(rows1) == 1000
    # append two docs to one shard (an index receiving new documents)
    shard = sorted(os.listdir(idx))[0]
    with open(os.path.join(idx, shard), "a") as fh:
        for i in (1, 2):
            fh.write(
                json.dumps(
                    {
                        "doc_id": f"new-{i}",
                        "index_id": "click",
                        "ts": "2024-02-01T00:00:00.000000",
                        "source": "{}",
                    }
                )
                + "\n"
            )
    rows2, off2 = r._read_from(off1)
    assert sorted(x[0] for x in rows2) == ["new-1", "new-2"]
    # replay [off1, off2) deterministically
    replay = list(r.readBetweenOffsets(off1, off2))
    assert sorted(x[0] for x in replay) == ["new-1", "new-2"]


def test_streaming_end_to_end_drains_and_resumes(tmp_path, spark, sf_dir):
    spark.dataSource.register(EsScrollDataSource)
    idx = _stage(tmp_path, spark, sf_dir, n_shards=2)
    ck = str(tmp_path / "scroll_ck")
    out = str(tmp_path / "scroll_out")

    def drain():
        # parquet sink: the one that actually supports checkpoint
        # recovery (memory sinks cannot resume)
        q = (
            spark.readStream.format("es_scroll")
            .option("path", idx)
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 1000
    shard = sorted(os.listdir(idx))[0]
    with open(os.path.join(idx, shard), "a") as fh:
        fh.write(
            json.dumps(
                {
                    "doc_id": "late-1",
                    "index_id": "click",
                    "ts": "2024-02-01T00:00:00.000000",
                    "source": "{}",
                }
            )
            + "\n"
        )
    drain()
    # resumed from the checkpoint: exactly the appended doc arrives
    final = spark.read.parquet(out)
    assert final.count() == 1001
    assert final.filter(F.col("doc_id") == "late-1").count() == 1


def test_scroll_to_bulk_streaming_copy(tmp_path, spark, sf_dir):
    """The reference's whole JOB in streaming form, both halves custom
    connectors: scroll-source micro-batches -> emitter projection ->
    bulk-format sink — an ES-index-to-ES-index copy where source and
    target are this engine's own pluggable DataSources."""
    from flink_elasticsearch_ingestion_spark.sources.es_bulk import (
        EsBulkDataSource,
        read_bulk_payload,
    )

    spark.dataSource.register(EsScrollDataSource)
    spark.dataSource.register(EsBulkDataSource)
    idx = _stage(tmp_path, spark, sf_dir, n_shards=2)
    out = str(tmp_path / "copy_out")
    q = (
        spark.readStream.format("es_scroll")
        .option("path", idx)
        .load()
        .select("doc_id", "index_id", "source")
        .writeStream.format("es_bulk")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "copy_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    payload = read_bulk_payload(out)
    # scroll schema types doc_id as string (ES _id is a string)
    want = {str(r["doc_id"]): r for r in _docs(spark, sf_dir).collect()}
    assert len(payload) == len(want)
    for action, body in payload:
        row = want[action["index"]["_id"]]
        assert action["index"]["_index"] == row["index_id"]
        assert body == row["source"]


def test_search_after_pagination_walks_index_exactly_once(tmp_path, spark, sf_dir):
    """search_after contract: repeatedly fetching the next page from
    the last row's (ts, doc_id) cursor visits every document exactly
    once, in global (ts, doc_id-string) order, with no server-side
    state — and any page is re-fetchable from just its cursor."""
    from flink_elasticsearch_ingestion_spark.sources.es_scroll import (
        search_after_read,
    )

    idx = _stage(tmp_path, spark, sf_dir, n_shards=3)
    want = sorted(
        ((r["ts"], str(r["doc_id"])) for r in _docs(spark, sf_dir).collect())
    )

    seen = []
    after = None
    pages = 0
    while True:
        rows = search_after_read(spark, idx, page_size=137, after=after).collect()
        if not rows:
            break
        pages += 1
        page_keys = [(r["ts"], r["doc_id"]) for r in rows]
        assert page_keys == sorted(page_keys)  # in-page order
        if after is not None:
            at = after
            if isinstance(at[0], str):
                import datetime as dt

                at = (dt.datetime.fromisoformat(at[0]), at[1])
            assert page_keys[0] > at  # strictly after the cursor
        seen.extend(page_keys)
        after = (rows[-1]["ts"], rows[-1]["doc_id"])
    assert pages == -(-len(want) // 137)
    assert seen == want  # exactly once, global order

    # stateless re-fetch: the SAME cursor yields the SAME page
    mid_cursor = seen[136]
    p1 = search_after_read(spark, idx, page_size=50, after=mid_cursor).collect()
    p2 = search_after_read(spark, idx, page_size=50, after=mid_cursor).collect()
    assert [tuple(r) for r in p1] == [tuple(r) for r in p2]
    assert len(p1) == 50
