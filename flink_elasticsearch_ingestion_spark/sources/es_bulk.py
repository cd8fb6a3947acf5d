"""Custom Python DataSource WRITER emitting the Elasticsearch ``_bulk``
wire format — the sink half of the reference (core.clj:55-79) as a real
``df.write.format("es_bulk")`` path.

The reference's sink builds ``IndexRequest(id=doc_id, index=index_id,
body=source-json)`` and hands them to a BulkProcessor flushing every 64
actions. This writer produces the exact bytes such a processor sends:
NDJSON action/body line pairs ::

    {"index": {"_index": "<index_id>", "_id": "<doc_id>"}}
    {...source JSON...}

chunked into one file per (partition, flush) with at most
``max_actions`` actions each — so a replay tool can POST each file to a
live cluster's ``/_bulk`` verbatim. What this exercises beyond the
option-dict connector config (``sinks.elasticsearch_writer_options``):
the full V2 writer lifecycle — per-task ``write`` on executors,
task-level commit messages carrying (files, actions) counts, driver
``commit`` writing a manifest only after every task succeeded (the
all-or-nothing visibility contract), ``abort`` leaving no manifest.

Same format streams: ``writeStream.format("es_bulk")`` uses the
micro-batch writer (one commit per epoch), mirroring the reference's
unbounded job writing through the same bulk processor.
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

#: reference bulk flush size (core.clj:72)
DEFAULT_MAX_ACTIONS = 64

MANIFEST = "_MANIFEST.json"


@dataclasses.dataclass
class BulkCommit(WriterCommitMessage):
    files: list
    n_actions: int


def _write_chunks(path: str, rows: Iterator[Row], max_actions: int, tag: str):
    """Write bulk NDJSON chunk files of <= max_actions actions each;
    runs on the executor, one call per task."""
    os.makedirs(path, exist_ok=True)
    files: list[str] = []
    n = 0
    chunk_idx = 0
    fh = None
    in_chunk = 0
    try:
        for row in rows:
            if fh is None or in_chunk >= max_actions:
                if fh is not None:
                    fh.close()
                fname = f"bulk-{tag}-{chunk_idx:05d}.ndjson"
                fh = open(os.path.join(path, fname), "w")
                files.append(fname)
                chunk_idx += 1
                in_chunk = 0
            action = {"index": {"_index": row["index_id"], "_id": row["doc_id"]}}
            fh.write(json.dumps(action, separators=(",", ":")) + "\n")
            fh.write(row["source"] + "\n")
            in_chunk += 1
            n += 1
    finally:
        if fh is not None:
            fh.close()
    return BulkCommit(files=files, n_actions=n)


def _write_manifest(
    path: str, messages, name: str = MANIFEST, extra: dict | None = None
) -> None:
    files: list[str] = []
    total = 0
    for m in messages:
        if m is not None:
            files.extend(m.files)
            total += m.n_actions
    manifest = {"files": sorted(files), "n_actions": total}
    manifest.update(extra or {})
    with open(os.path.join(path, name), "w") as fh:
        json.dump(manifest, fh)


class EsBulkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("es_bulk requires option 'path'")
        self.max_actions = int(options.get("max_actions", str(DEFAULT_MAX_ACTIONS)))
        self.overwrite = overwrite
        # one manifest PER JOB (mirrors the streaming path's per-epoch
        # manifests): a second append run must not clobber the first
        # run's manifest, or its committed documents silently vanish
        # from read_bulk_payload
        self.job_tag = uuid.uuid4().hex[:12]

    def write(self, iterator: Iterator[Row]) -> BulkCommit:
        return _write_chunks(
            self.path, iterator, self.max_actions, uuid.uuid4().hex[:12]
        )

    def commit(self, messages) -> None:
        if self.overwrite:
            # overwrite visibility flips atomically at commit: drop every
            # prior manifest so only this job's files are payload-visible
            # (orphaned chunk files are invisible by contract)
            for f in os.listdir(self.path):
                if f.startswith("_MANIFEST") and f.endswith(".json"):
                    os.remove(os.path.join(self.path, f))
        _write_manifest(self.path, messages, name=f"_MANIFEST-job-{self.job_tag}.json")

    def abort(self, messages) -> None:
        # no manifest -> the output is invisible to consumers; stray
        # chunk files from failed tasks are ignorable by contract
        pass


class EsBulkStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("es_bulk requires option 'path'")
        self.max_actions = int(options.get("max_actions", str(DEFAULT_MAX_ACTIONS)))

    def write(self, iterator: Iterator[Row]) -> BulkCommit:
        return _write_chunks(
            self.path, iterator, self.max_actions, uuid.uuid4().hex[:12]
        )

    def commit(self, messages, batchId: int) -> None:
        # one manifest per epoch: a replayed batch overwrites its own
        # manifest (idempotent), never another epoch's
        _write_manifest(
            self.path,
            messages,
            name=f"_MANIFEST-{batchId}.json",
            extra={"batch_id": batchId},
        )

    def abort(self, messages, batchId: int) -> None:
        pass


class EsBulkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "es_bulk"

    def schema(self) -> str:
        return "doc_id string, index_id string, source string"

    def writer(self, schema: StructType, overwrite: bool) -> EsBulkWriter:
        return EsBulkWriter(self.options, overwrite=overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> EsBulkStreamWriter:
        return EsBulkStreamWriter(self.options)


def register_bulk_sink(spark) -> None:
    """Idempotent registration: a session cloned via ``newSession``
    shares the data-source registry, where a second ``register`` of the
    same name raises DATA_SOURCE_ALREADY_EXISTS instead of overwriting."""
    try:
        spark.dataSource.register(EsBulkDataSource)
    except Exception as e:  # pragma: no cover - message-keyed on purpose
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise


def read_bulk_payload_df(spark, path: str):
    """Distributed parse-back of the committed bulk payload.

    The scale path for auditing a bulk export: the manifest log is
    parsed driver-side (tiny metadata, same pattern as a Delta/Iceberg
    log read — Spark's file index hides ``_``-prefixed files from
    distributed readers anyway), the committed chunk files are scanned
    with the ordinary distributed text reader, and the action/body line
    pairing happens JVM-side with higher-order array functions — no
    driver-side payload loop, so a 100 TB payload audits at cluster
    parallelism.  At extreme file counts, compact per-epoch manifests
    before auditing.  Visibility contract matches
    :func:`read_bulk_payload`: only files named by a manifest count;
    uncommitted stragglers are invisible.

    Returns a DataFrame ``(doc_id string, index_id string, source
    string)`` — doc_id stays a string here because the wire format
    carries it as JSON; callers cast as needed.
    """
    from pyspark.sql import functions as F

    files: list[str] = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.startswith("_MANIFEST") and f.endswith(".json"):
                with open(os.path.join(path, f)) as fh:
                    files.extend(json.load(fh)["files"])
    paths = [os.path.join(path, f) for f in sorted(set(files))]
    if not paths:
        # no committed manifests -> empty payload
        return spark.createDataFrame(
            [], "doc_id string, index_id string, source string"
        )
    committed = spark.read.text(paths, wholetext=True)
    lines = F.filter(F.split(F.col("value"), "\n"), lambda x: x != "")
    split_cols = committed.select(
        F.filter(lines, lambda x, i: i % 2 == 0).alias("actions"),
        F.filter(lines, lambda x, i: i % 2 == 1).alias("bodies"),
    )
    # same invariant the driver-side reader asserts: a committed chunk
    # holds (action, body) PAIRS. A truncated/corrupt chunk must fail
    # loudly, not null-pad the zip into silently wrong audit aggregates.
    paired = split_cols.select(
        F.when(
            F.size("actions") == F.size("bodies"),
            F.arrays_zip("actions", "bodies"),
        )
        .otherwise(
            F.raise_error("odd line count in committed bulk chunk")
        )
        .alias("z")
    ).select(F.explode("z").alias("p"))
    return paired.select(
        F.get_json_object("p.actions", "$.index._id").alias("doc_id"),
        F.get_json_object("p.actions", "$.index._index").alias("index_id"),
        F.col("p.bodies").alias("source"),
    )


def read_bulk_payload(path: str) -> list[tuple[dict, str]]:
    """Parse every COMMITTED chunk back into (action, body) pairs —
    the test-side consumer standing in for a live ``/_bulk`` endpoint.
    Only files named by a manifest count (batch ``_MANIFEST.json`` and
    per-epoch ``_MANIFEST-<n>.json``); uncommitted stragglers are
    invisible, which is the point of the manifest."""
    files: list[str] = []
    for f in sorted(os.listdir(path)):
        if f.startswith("_MANIFEST") and f.endswith(".json"):
            with open(os.path.join(path, f)) as fh:
                files.extend(json.load(fh)["files"])
    out = []
    for fname in sorted(set(files)):
        with open(os.path.join(path, fname)) as fh:
            lines = [ln for ln in fh.read().splitlines() if ln]
        assert len(lines) % 2 == 0, f"odd line count in {fname}"
        for i in range(0, len(lines), 2):
            out.append((json.loads(lines[i]), lines[i + 1]))
    return out
