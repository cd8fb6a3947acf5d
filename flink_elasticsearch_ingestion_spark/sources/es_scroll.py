"""Custom Python DataSource implementing the reference's ES scroll
source contract (core.clj:131-137 TODO spec) against a file-backed
index.

The reference specifies: read the source index via the scrolling API
in ``source.batch-size`` pages, polled every ``source.poll-interval``,
resuming from a timestamp checkpoint ("if saved timestamp: provide
range in query"). No ES server exists in this environment, so the
"index" is a directory of JSONL shard files (``shard-*.jsonl``, the
shape ``export_documents_jsonl`` writes) — but the SOURCE SEMANTICS
are implemented for real through Spark's DataSource V2 Python API:

- **Shard-sliced parallelism**: one ``InputPartition`` per shard file,
  the analog of ES sliced scrolling (one slice per shard) — the scan
  fans out across executors instead of funneling through the driver.
- **Filter pushdown INTO the source** (``pushFilters``): ts-range
  predicates (the incremental checkpoint filter) are evaluated inside
  the reader while scanning each shard — "provide range in query" —
  so Spark never materializes pre-checkpoint rows. Other predicates
  are returned as unsupported and Spark re-applies them post-scan
  (the contract's safe default).
- **Paged reads**: lines are consumed in ``batch_size`` pages,
  mirroring the scroll page loop (observable cost model, not just a
  readlines()).
- **Polling stream reader** (``SimpleDataSourceStreamReader``): the
  offset is lines-consumed-per-shard; each micro-batch reads only the
  NEW tail of each shard — the scroll+poll incremental contract with
  exactly-once offsets owned by Spark's checkpoint. The Simple
  (driver-side) variant is deliberate: it mirrors the reference's
  single-threaded poll loop; the shard-parallel batch reader is the
  backfill path.

Register once per session::

    spark.dataSource.register(EsScrollDataSource)
    df = (spark.read.format("es_scroll")
          .option("path", index_dir).option("batch_size", "500").load())
"""

from __future__ import annotations

import datetime as dt
import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

#: the document-record schema the reference's sink emits (§1.1) plus
#: the incremental ts the TODO spec keys on
SCHEMA_DDL = "doc_id string, index_id string, ts timestamp, source string"


def _parse_ts(v: str) -> dt.datetime:
    return dt.datetime.fromisoformat(v)


def _row(line: str):
    d = json.loads(line)
    return (d["doc_id"], d["index_id"], _parse_ts(d["ts"]), d["source"])


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EsScrollPlainReader(DataSourceReader):
    """Scroll reader WITHOUT filter pushdown.

    Spark hard-errors (``DATA_SOURCE_PUSHDOWN_DISABLED``) when a reader
    merely *defines* ``pushFilters`` while the session runs with
    ``spark.sql.python.filterPushdown.enabled=false`` — so a foreign
    session (the driver's vanilla SparkSession, a user's default
    builder) must get a reader that does not override the method at
    all.  Results stay identical: Spark evaluates every predicate
    post-scan; only the "provide range in query" efficiency
    (core.clj:133-136) is lost.  ``EsScrollDataSource.reader`` picks
    this class when option ``pushdown`` is not ``true``."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("es_scroll requires option 'path'")
        self.batch_size = int(options.get("batch_size", "1000"))
        self.ts_lower: dt.datetime | None = None
        self.ts_lower_inclusive = False
        # search_after cursor (the PIT-era stateless pagination ES
        # offers alongside scroll): rows are kept only when their
        # (ts, doc_id-as-string) sort key is STRICTLY after the cursor.
        # Stateless by construction — any page is re-fetchable from
        # just its cursor, no server-side scroll context to keep alive.
        after_ts = options.get("after_ts")
        after_id = options.get("after_id")
        self.cursor: tuple[dt.datetime, str] | None = None
        if after_ts is not None and after_id is not None:
            self.cursor = (_parse_ts(after_ts), str(after_id))

    def _push_ts_filters(self, filters: "list[Filter]") -> "Iterator[Filter]":
        """Accept ts lower bounds (the checkpoint range); everything
        else is handed back for Spark to evaluate post-scan.  When
        Catalyst pushes SEVERAL lower bounds (``ts > A AND ts >= B``),
        keep the TIGHTEST one — accepting all while applying only the
        last would under-filter."""
        for f in filters:
            accepted = False
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                if tuple(f.attribute) == ("ts",) and isinstance(
                    f.value, dt.datetime
                ):
                    v = f.value
                    if v.tzinfo is not None:
                        # TIMESTAMP literals arrive tz-aware; shard rows
                        # are naive UTC wall-clock — normalize once here
                        v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
                    inclusive = isinstance(f, GreaterThanOrEqual)
                    if self.ts_lower is None or self._tighter(v, inclusive):
                        self.ts_lower = v
                        self.ts_lower_inclusive = inclusive
                    accepted = True
            if not accepted:
                yield f

    def _tighter(self, v: dt.datetime, inclusive: bool) -> bool:
        """True when (v, inclusive) excludes more rows than the bound
        already held: a later value always wins; at equal values the
        EXCLUSIVE bound (>) is stricter than the inclusive one (>=)."""
        if v != self.ts_lower:
            return v > self.ts_lower
        return self.ts_lower_inclusive and not inclusive

    def partitions(self) -> Sequence[InputPartition]:
        shards = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith((".jsonl", ".json")) and not f.startswith(("_", "."))
        )
        if not shards:
            # the DataSource API rejects an empty partition list; an
            # index directory with no shard files is a VALID empty index
            # and must read as zero rows, not an error
            return [_ShardPartition(None)]
        return [_ShardPartition(p) for p in shards]

    def _keep(self, ts: dt.datetime) -> bool:
        if self.ts_lower is None:
            return True
        return ts >= self.ts_lower if self.ts_lower_inclusive else ts > self.ts_lower

    def read(self, partition: _ShardPartition):
        if partition.path is None:  # empty-index sentinel
            return
        with open(partition.path, "r") as fh:
            page: list[str] = []
            for line in fh:
                if line.strip():
                    page.append(line)
                if len(page) >= self.batch_size:
                    yield from self._emit(page)
                    page = []
            yield from self._emit(page)

    def _emit(self, page: list[str]):
        for line in page:
            row = _row(line)
            if not self._keep(row[2]):
                continue
            if self.cursor is not None and (row[2], str(row[0])) <= self.cursor:
                continue
            yield row


class EsScrollReader(EsScrollPlainReader):
    """Scroll reader WITH ts-range filter pushdown ("provide range in
    query", core.clj:133-136).  Only this subclass defines
    ``pushFilters`` — the method's mere presence is what Spark's
    planner keys the ``DATA_SOURCE_PUSHDOWN_DISABLED`` error on, so the
    split keeps the plain reader safe under any session conf."""

    def pushFilters(self, filters: "list[Filter]") -> "Iterator[Filter]":
        return self._push_ts_filters(filters)


class EsScrollStreamReader(SimpleDataSourceStreamReader):
    """Polling incremental reader: offset = lines consumed per shard.

    Each micro-batch scans only the new tail of each shard file, so a
    shard receiving appended documents behaves like an ES index under
    continuous indexing; Spark's checkpoint owns the offset, giving
    exactly-once replay of every page."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("es_scroll requires option 'path'")

    def _shards(self) -> list[str]:
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith((".jsonl", ".json")) and not f.startswith(("_", "."))
        )

    def initialOffset(self) -> dict:
        return {"lines": {}}

    def _read_from(self, start: dict) -> tuple[list, dict]:
        consumed = dict(start.get("lines", {}))
        rows = []
        for shard in self._shards():
            done = int(consumed.get(shard, 0))
            n = 0
            with open(shard, "r") as fh:
                for i, line in enumerate(fh):
                    if i < done:
                        n = i + 1
                        continue
                    if line.strip():
                        rows.append(_row(line))
                    n = i + 1
            consumed[shard] = max(done, n)
        return rows, {"lines": consumed}

    def read(self, start: dict):
        rows, end = self._read_from(start)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        """Deterministic replay of [start, end) for recovery."""
        start_lines = start.get("lines", {})
        end_lines = end.get("lines", {})
        rows = []
        for shard in self._shards():
            lo = int(start_lines.get(shard, 0))
            hi = int(end_lines.get(shard, 0))
            if hi <= lo:
                continue
            with open(shard, "r") as fh:
                for i, line in enumerate(fh):
                    if i >= hi:
                        break
                    if i >= lo and line.strip():
                        rows.append(_row(line))
        return iter(rows)


class EsScrollDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "es_scroll"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> EsScrollPlainReader:
        """Option ``pushdown`` (default ``true``) selects the
        pushdown-capable reader; pass ``pushdown=false`` (or use
        ``scroll_read``, which probes the session conf) under sessions
        running ``spark.sql.python.filterPushdown.enabled=false``,
        where Spark rejects any reader defining ``pushFilters``."""
        if str(self.options.get("pushdown", "true")).lower() == "true":
            return EsScrollReader(self.options)
        return EsScrollPlainReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> EsScrollStreamReader:
        return EsScrollStreamReader(self.options)


_PUSHDOWN_CONF = "spark.sql.python.filterPushdown.enabled"


def register_scroll_source(spark) -> None:
    """Idempotent registration: a session cloned via ``newSession``
    shares the data-source registry, where a second ``register`` of the
    same name raises DATA_SOURCE_ALREADY_EXISTS instead of overwriting."""
    try:
        spark.dataSource.register(EsScrollDataSource)
    except Exception as e:  # pragma: no cover - message-keyed on purpose
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise


def scroll_read(spark, path: str, batch_size: int = 1000):
    """Session-conf-safe entry point for the scroll source.

    Catalog queries must be self-contained with respect to session
    conf (the driver runs a vanilla SparkSession where
    ``spark.sql.python.filterPushdown.enabled`` defaults to false and
    any reader defining ``pushFilters`` is a hard error).  This helper
    enables the conf when the session allows runtime changes — keeping
    the "provide range in query" pushdown — and otherwise degrades to
    the plain reader, where Spark applies the ts-range post-scan with
    identical results."""
    try:
        spark.conf.set(_PUSHDOWN_CONF, "true")
    except Exception:
        pass  # conf locked down: fall through to the plain reader
    try:
        pushdown = str(spark.conf.get(_PUSHDOWN_CONF, "false")).lower() == "true"
    except Exception:
        pushdown = False
    register_scroll_source(spark)
    return (
        spark.read.format("es_scroll")
        .option("path", path)
        .option("batch_size", str(batch_size))
        .option("pushdown", "true" if pushdown else "false")
        .load()
    )


def search_after_read(
    spark,
    path: str,
    *,
    page_size: int = 1000,
    after: "tuple[dt.datetime | str, str] | None" = None,
    batch_size: int = 1000,
):
    """ES ``search_after`` pagination — the stateless keyed-cursor
    protocol ES offers alongside scroll (public ES docs; the PIT-era
    replacement for scroll contexts): each call returns the next
    ``page_size`` documents in ``(ts, doc_id)`` order STRICTLY after
    the ``after`` cursor, with the cursor filter evaluated INSIDE the
    reader ("provide range in query", the same contract as the
    checkpoint pushdown).

    Unlike a scroll context there is no server-side state: any page is
    re-fetchable from just its cursor — exactly the replayable-offset
    property a distributed, retrying source needs. ``doc_id`` compares
    as a STRING (ES ``_id`` is a string; numeric ids order
    lexicographically and the cursor contract documents it).
    Conf-safe: uses the plain (no-pushFilters) reader, so it works on
    any session."""
    register_scroll_source(spark)
    r = (
        spark.read.format("es_scroll")
        .option("path", path)
        .option("batch_size", str(batch_size))
        .option("pushdown", "false")
    )
    if after is not None:
        ats, aid = after
        if isinstance(ats, dt.datetime):
            ats = ats.isoformat()
        r = r.option("after_ts", ats).option("after_id", str(aid))
    return r.load().orderBy("ts", "doc_id").limit(page_size)


def write_index_shards(df, path: str, n_shards: int = 4) -> None:
    """Stage a document frame as an ``es_scroll`` index: ``n_shards``
    JSONL shard files (ts serialized ISO so the reader round-trips it).
    The file-per-partition write is the sharded-index layout itself."""
    import pyspark.sql.functions as F

    out = df.select(
        "doc_id",
        "index_id",
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "source",
    ).repartition(n_shards)
    tmp = path.rstrip("/") + "__stage"
    out.write.mode("overwrite").json(tmp)
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.startswith("shard-"):
            os.remove(os.path.join(path, f))
    i = 0
    for f in sorted(os.listdir(tmp)):
        if f.startswith("part-") and f.endswith(".json"):
            os.replace(os.path.join(tmp, f), os.path.join(path, f"shard-{i}.jsonl"))
            i += 1
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
