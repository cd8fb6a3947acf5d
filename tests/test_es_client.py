"""ES REST client + bulk buffer: request construction and the
count/time flush triggers (reference core.clj:48-53, 68-79), fully
offline — transport and clock are injected fakes."""

import base64
import json

from flink_elasticsearch_ingestion_spark.config import SinkConfig
from flink_elasticsearch_ingestion_spark.sources.es_client import (
    BulkBuffer,
    ElasticsearchRestClient,
    time_flushed_foreach_batch,
)


def _client(transport=None):
    cfg = SinkConfig(urls="http://es1:9200,http://es2:9200", username="u", password="p")
    return ElasticsearchRestClient(cfg, transport=transport)


def test_request_url_auth_and_default_port():
    cfg = SinkConfig(urls="es-only-host", username="u", password="p")
    req = ElasticsearchRestClient(cfg).request("GET", "/_cluster/health")
    assert req["url"] == "http://es-only-host:9200/_cluster/health"  # 9200 default
    token = base64.b64encode(b"u:p").decode()
    assert req["headers"]["Authorization"] == f"Basic {token}"


def test_bulk_request_ndjson_id_keyed():
    req = _client().bulk_request(
        [
            {"index_id": "idx-a", "doc_id": 7, "body": {"x": 1}},
            {"index_id": "idx-b", "doc_id": 8, "body": {"y": 2}},
        ]
    )
    assert req["url"].endswith("/_bulk")
    assert req["headers"]["Content-Type"] == "application/x-ndjson"
    lines = req["body"].strip().split("\n")
    assert json.loads(lines[0]) == {"index": {"_index": "idx-a", "_id": "7"}}
    assert json.loads(lines[1]) == {"x": 1}
    assert json.loads(lines[2])["index"]["_id"] == "8"
    assert req["body"].endswith("\n")  # bulk API requires trailing newline


def test_send_without_transport_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        _client().send({"method": "GET"})


def test_bulk_buffer_flushes_on_count():
    flushed = []
    buf = BulkBuffer(flush_fn=flushed.append, max_actions=3, flush_interval_ms=10**9)
    for i in range(7):
        buf.add({"i": i})
    assert [len(b) for b in flushed] == [3, 3]
    buf.close()
    assert [len(b) for b in flushed] == [3, 3, 1]


def test_bulk_buffer_flushes_on_time():
    now = [0.0]
    flushed = []
    buf = BulkBuffer(
        flush_fn=flushed.append,
        max_actions=64,
        flush_interval_ms=5000,
        clock=lambda: now[0],
    )
    buf.add({"i": 0})
    now[0] = 4.9
    buf.tick()
    assert flushed == []  # not yet overdue
    now[0] = 5.0
    buf.tick()
    assert [len(b) for b in flushed] == [1]  # 5000 ms elapsed -> flush
    # timer resets after flush
    buf.add({"i": 1})
    now[0] = 9.9
    buf.tick()
    assert len(flushed) == 1


def test_foreach_batch_writer_sends_bulk_requests(spark):
    sent = []
    client = _client(transport=sent.append)
    cfg = SinkConfig(urls="http://es1:9200", bulk_max_actions=2)
    write = time_flushed_foreach_batch(client, cfg)
    df = spark.createDataFrame(
        [(1, "idx", {"a": "1"}), (2, "idx", {"a": "2"}), (3, "idx", {"a": "3"})],
        "doc_id long, index_id string, body map<string,string>",
    )
    write(df, batch_id=0)
    # 3 docs at max_actions=2 -> 2 bulk requests (2 + 1)
    assert len(sent) == 2
    assert all(r["url"].endswith("/_bulk") for r in sent)
    n_docs = sum(r["body"].count('"index"') for r in sent)
    assert n_docs == 3
