"""Driver-side Elasticsearch REST primitives.

The reference builds an authenticated REST client and a bulk indexer
with flush-on-count (64 actions), flush-on-time (5000 ms), and
exponential-backoff retry (reference core.clj:48-53, 68-79). The
distributed write path in this repo goes through the es-hadoop
connector options (:func:`..sinks.elasticsearch_writer_options`), which
covers the count trigger; this module carries the remaining two
behaviors as real, unit-tested logic:

- :class:`ElasticsearchRestClient` — request construction (URL, basic
  auth, bulk NDJSON body) for the driver-side admin/bootstrap calls the
  reference's client object serves. The TRANSPORT is injectable and no
  network I/O happens unless one is provided — this environment has no
  live Elasticsearch, and the tests assert on the built requests.
- :class:`BulkBuffer` — flush when EITHER the action count reaches
  ``max_actions`` OR ``flush_interval_ms`` has elapsed since the first
  buffered action (the time dimension es-hadoop lacks). Used per
  micro-batch via ``foreachBatch`` in
  :func:`time_flushed_foreach_batch`; the clock is injectable so the
  time trigger is testable deterministically.
"""

from __future__ import annotations

import base64
import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from flink_elasticsearch_ingestion_spark.config import SinkConfig
from flink_elasticsearch_ingestion_spark.functions.urls import urls_to_http_hosts


@dataclass
class ElasticsearchRestClient:
    """Build authenticated ES REST requests (transport injectable).

    ``transport`` is called with the built request dict and returns the
    response; by default there is none and :meth:`send` raises — request
    CONSTRUCTION is the contract this environment can honor.
    """

    cfg: SinkConfig
    transport: Callable[[dict], Any] | None = None

    def _base_url(self) -> str:
        h = urls_to_http_hosts(self.cfg.urls)[0]
        return f"{h.scheme}://{h.host}:{h.port}"

    def _headers(self, content_type: str = "application/json") -> dict[str, str]:
        token = base64.b64encode(
            f"{self.cfg.username}:{self.cfg.password}".encode()
        ).decode()
        return {"Authorization": f"Basic {token}", "Content-Type": content_type}

    def request(self, method: str, path: str, body: Any | None = None) -> dict:
        """The reference client's request shape: method + url + basic
        auth + JSON body."""
        req: dict = {
            "method": method.upper(),
            "url": self._base_url() + path,
            "headers": self._headers(
                "application/x-ndjson" if path.endswith("/_bulk") else "application/json"
            ),
        }
        if body is not None:
            req["body"] = body
        return req

    def bulk_request(self, actions: list[dict]) -> dict:
        """NDJSON bulk body: one action line + one source line per doc,
        id-keyed index ops (upsert semantics, core.clj:62-63)."""
        lines = []
        for a in actions:
            lines.append(
                json.dumps(
                    {"index": {"_index": a["index_id"], "_id": str(a["doc_id"])}},
                    separators=(",", ":"),
                )
            )
            lines.append(json.dumps(a["body"], separators=(",", ":")))
        return self.request("POST", "/_bulk", "\n".join(lines) + "\n")

    def send(self, req: dict) -> Any:
        if self.transport is None:
            raise NotImplementedError(
                "no live Elasticsearch in this environment; inject a transport"
            )
        return self.transport(req)


def urllib_transport(req: dict) -> Any:
    """Stdlib HTTP transport for :class:`ElasticsearchRestClient`: puts
    a built request dict on the wire with ``urllib`` and returns the
    parsed JSON body.  This is the real-network path the dev env uses
    (reference dev/docker-compose.yml:3-23) and the hermetic fake
    server tests ride; the distributed write path stays the es_bulk /
    es_scroll DataFrame formats — this transport serves driver-side
    admin/bootstrap/conformance calls only."""
    import urllib.request

    body = req.get("body")
    data = (
        body.encode()
        if isinstance(body, str)
        else (json.dumps(body).encode() if body is not None else None)
    )
    r = urllib.request.Request(
        req["url"], data=data, headers=req["headers"], method=req["method"]
    )
    with urllib.request.urlopen(r, timeout=30) as resp:
        return json.loads(resp.read().decode() or "{}")


@dataclass
class BulkBuffer:
    """Count-OR-time bulk flush (64 actions / 5000 ms, core.clj:72-73).

    ``flush_fn`` receives the buffered actions; ``clock`` returns
    monotonic seconds (injectable for deterministic tests). Callers add
    actions and the buffer flushes itself; ``close()`` drains the tail.
    """

    flush_fn: Callable[[list[dict]], None]
    max_actions: int = 64
    flush_interval_ms: int = 5000
    clock: Callable[[], float] = time.monotonic
    _buf: list[dict] = field(default_factory=list)
    _first_at: float | None = None
    flushes: int = 0

    def add(self, action: dict) -> None:
        if self._first_at is None:
            self._first_at = self.clock()
        self._buf.append(action)
        self._maybe_flush()

    def tick(self) -> None:
        """Re-check the time trigger without adding (a poll loop hook)."""
        self._maybe_flush()

    def _maybe_flush(self) -> None:
        if not self._buf:
            return
        overdue = (
            self._first_at is not None
            and (self.clock() - self._first_at) * 1000.0 >= self.flush_interval_ms
        )
        if len(self._buf) >= self.max_actions or overdue:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        self.flush_fn(self._buf)
        self.flushes += 1
        self._buf = []
        self._first_at = None

    def close(self) -> None:
        self.flush()


def time_flushed_foreach_batch(
    client: ElasticsearchRestClient,
    cfg: SinkConfig,
    clock: Callable[[], float] = time.monotonic,
) -> Callable:
    """A ``writeStream.foreachBatch`` function that honors BOTH bulk
    triggers on the driver-collected micro-batch of (doc_id, index_id,
    body) rows. Intended for low-volume control streams; the high-volume
    path stays the es-hadoop distributed writer, where the micro-batch
    trigger interval bounds flush latency instead."""

    def _write(batch_df, batch_id: int) -> None:
        buf = BulkBuffer(
            flush_fn=lambda actions: client.send(client.bulk_request(actions)),
            max_actions=cfg.bulk_max_actions,
            flush_interval_ms=cfg.bulk_flush_interval_ms,
            clock=clock,
        )
        for row in batch_df.toLocalIterator():
            buf.add(row.asDict())
        buf.close()

    return _write


class BulkIndexError(RuntimeError):
    """Bulk items failed with non-retryable statuses (e.g. 400 mapping
    errors): retrying cannot help, the caller must fix the documents.
    ``failures`` holds the per-item error payloads. ``pending`` holds
    the still-retryable actions from the same response (429/5xx items
    that were NOT re-sent because the permanent failures aborted the
    retry loop) — a caller that fixes the bad documents resumes by
    re-sending ``pending`` plus the repaired ones."""

    def __init__(
        self, message: str, failures: list[dict], pending: list[dict] | None = None
    ):
        super().__init__(message)
        self.failures = failures
        self.pending = pending if pending is not None else []


class BulkRetriesExhausted(RuntimeError):
    """Transient failures (429/5xx) survived every backoff retry."""

    def __init__(self, message: str, pending: list[dict]):
        super().__init__(message)
        self.pending = pending


#: transient statuses worth retrying (ES backpressure / transient 5xx);
#: everything else failing is a document problem, not a timing problem
RETRYABLE_STATUSES = (429, 502, 503)


def send_bulk_with_retry(
    client: ElasticsearchRestClient,
    actions: list[dict],
    *,
    max_retries: int | None = None,
    base_delay_ms: int | None = None,
    backoff_policy: str | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> dict:
    """The reference's bulk failure handler as real driver-side logic
    (core.clj:72-78: retry 10, base delay 2000 ms, EXPONENTIAL) plus
    the per-item semantics a real ES ``_bulk`` needs: a bulk response
    is NOT all-or-nothing — each item carries its own status, so only
    the items that failed with a RETRYABLE status are re-sent (a full
    re-send would duplicate work and, for non-idempotent pipelines,
    rows). Non-retryable item failures (mapping/400s) raise
    ``BulkIndexError`` immediately — backoff cannot fix a bad document.

    Defaults come from the client's SinkConfig; ``sleep`` is injectable
    so the exponential schedule is unit-testable with a fake clock.
    Returns ``{"attempts", "indexed", "retried"}`` on success; raises
    ``BulkRetriesExhausted`` when transient failures outlive
    ``max_retries``.
    """
    cfg = client.cfg
    retries = cfg.retry_count if max_retries is None else max_retries
    base_ms = (
        cfg.retry_base_delay_ms if base_delay_ms is None else base_delay_ms
    )
    policy = (backoff_policy or cfg.backoff_policy).upper()
    pending = list(actions)
    retried = 0
    for attempt in range(retries + 1):
        resp = client.send(client.bulk_request(pending))
        if not resp.get("errors"):
            return {
                "attempts": attempt + 1,
                "indexed": len(actions),
                "retried": retried,
            }
        items = resp.get("items", [])
        if len(items) != len(pending):
            raise BulkIndexError(
                f"bulk response has {len(items)} items for "
                f"{len(pending)} actions",
                failures=items,
            )
        transient, permanent = [], []
        for action, item in zip(pending, items):
            result = next(iter(item.values()))  # {"index": {...}}
            status = result.get("status", 200)
            if status >= 300:
                if status in RETRYABLE_STATUSES:
                    transient.append(action)
                else:
                    permanent.append(result)
        if permanent:
            raise BulkIndexError(
                f"{len(permanent)} bulk items failed non-retryably "
                f"(first: {permanent[0].get('error')}); "
                f"{len(transient)} retryable items not re-sent "
                f"(carried on .pending)",
                failures=permanent,
                pending=transient,
            )
        if not transient:  # errors flag set but every item says ok
            return {
                "attempts": attempt + 1,
                "indexed": len(actions),
                "retried": retried,
            }
        pending = transient
        retried += len(transient)
        if attempt < retries:
            factor = 2**attempt if policy == "EXPONENTIAL" else 1
            sleep(base_ms * factor / 1000.0)
    raise BulkRetriesExhausted(
        f"{len(pending)} bulk items still failing after {retries} retries",
        pending=pending,
    )
