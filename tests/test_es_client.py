"""ES REST client + bulk buffer: request construction and the
count/time flush triggers (reference core.clj:48-53, 68-79), fully
offline — transport and clock are injected fakes."""

import base64
import json

import pytest

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


# ------------------- per-item bulk retry (core.clj:72-78 semantics) ---------


def _retry_client(script):
    """Fake transport that pops one scripted response per bulk send and
    records the doc ids each attempt carried."""
    from flink_elasticsearch_ingestion_spark.config import SinkConfig
    from flink_elasticsearch_ingestion_spark.sources.es_client import (
        ElasticsearchRestClient,
    )

    sent: list[list[str]] = []

    def transport(req):
        ids = [
            __import__("json").loads(line)["index"]["_id"]
            for line in req["body"].splitlines()[::2]
        ]
        sent.append(ids)
        return script.pop(0)(ids)

    cfg = SinkConfig(retry_count=3, retry_base_delay_ms=2000)
    return ElasticsearchRestClient(cfg, transport=transport), sent


def _ok(ids):
    return {"errors": False, "items": [{"index": {"_id": i, "status": 201}} for i in ids]}


def _partial(fail_ids, status):
    def resp(ids):
        return {
            "errors": True,
            "items": [
                {
                    "index": {
                        "_id": i,
                        "status": status if i in fail_ids else 201,
                        **({"error": {"type": "x"}} if i in fail_ids else {}),
                    }
                }
                for i in ids
            ],
        }

    return resp


def _actions(n):
    return [{"doc_id": i, "index_id": "idx", "body": {"n": i}} for i in range(n)]


def test_bulk_retry_resends_only_transient_failures():
    from flink_elasticsearch_ingestion_spark.sources.es_client import (
        send_bulk_with_retry,
    )

    client, sent = _retry_client(
        [_partial({"1", "3"}, 429), _partial({"3"}, 429), _ok]
    )
    delays: list[float] = []
    out = send_bulk_with_retry(client, _actions(5), sleep=delays.append)
    assert out == {"attempts": 3, "indexed": 5, "retried": 3}
    assert sent == [["0", "1", "2", "3", "4"], ["1", "3"], ["3"]]
    assert delays == [2.0, 4.0]  # exponential: base, base*2


def test_bulk_retry_constant_backoff_policy():
    from flink_elasticsearch_ingestion_spark.sources.es_client import (
        send_bulk_with_retry,
    )

    client, _ = _retry_client([_partial({"0"}, 503), _partial({"0"}, 503), _ok])
    delays: list[float] = []
    send_bulk_with_retry(
        client, _actions(2), backoff_policy="CONSTANT", sleep=delays.append
    )
    assert delays == [2.0, 2.0]


def test_bulk_mapping_errors_raise_immediately_without_retry():
    from flink_elasticsearch_ingestion_spark.sources.es_client import (
        BulkIndexError,
        send_bulk_with_retry,
    )

    client, sent = _retry_client([_partial({"2"}, 400)])
    delays: list[float] = []
    with pytest.raises(BulkIndexError, match="non-retryably"):
        send_bulk_with_retry(client, _actions(3), sleep=delays.append)
    assert len(sent) == 1 and delays == []  # no second attempt, no sleep


def test_bulk_retries_exhausted_raises_with_pending_items():
    from flink_elasticsearch_ingestion_spark.sources.es_client import (
        BulkRetriesExhausted,
        send_bulk_with_retry,
    )

    always_fail = _partial({"0"}, 429)
    client, sent = _retry_client([always_fail] * 4)  # 1 try + 3 retries
    delays: list[float] = []
    with pytest.raises(BulkRetriesExhausted) as exc:
        send_bulk_with_retry(client, _actions(1), sleep=delays.append)
    assert len(sent) == 4
    assert delays == [2.0, 4.0, 8.0]  # full exponential schedule
    assert [a["doc_id"] for a in exc.value.pending] == [0]


def test_bulk_mixed_failures_carry_pending_transients_on_the_error():
    """A response mixing permanent (400) and transient (429) item
    failures raises immediately for the 400s, but the never-re-sent
    retryable actions ride along on ``.pending`` so a caller that fixes
    the bad documents can resume the retryable remainder."""
    from flink_elasticsearch_ingestion_spark.sources.es_client import (
        BulkIndexError,
        send_bulk_with_retry,
    )

    def mixed(ids):
        status = {"1": 400, "3": 429}
        return {
            "errors": True,
            "items": [
                {
                    "index": {
                        "_id": i,
                        "status": status.get(i, 201),
                        **({"error": {"type": "x"}} if i in status else {}),
                    }
                }
                for i in ids
            ],
        }

    client, sent = _retry_client([mixed])
    with pytest.raises(BulkIndexError, match="not re-sent") as exc:
        send_bulk_with_retry(client, _actions(4), sleep=lambda s: None)
    assert len(sent) == 1  # permanent failure aborts before any retry
    assert [f["_id"] for f in exc.value.failures] == ["1"]
    assert [a["doc_id"] for a in exc.value.pending] == [3]
