"""Versioned parquet tables: manifest-committed snapshots with
time-travel reads — the minimal transactional-table protocol a 100 TB
deployment needs when a full lakehouse format isn't available.

Plain ``df.write.parquet`` has no atomic visibility: a reader listing
the directory mid-write sees half a snapshot, and there is no way to
ask "what did this table contain yesterday?". The fix is the same
manifest discipline the es_bulk sink uses for exactly-once commits
(sources/es_bulk.py): data files land first, then ONE manifest file is
published atomically (tmp + rename), and readers resolve file lists
ONLY through manifests:

- ``commit``: write ``data/v=<n>/`` parquet, then publish
  ``_versions/<n>.json`` listing the snapshot's directories (its own
  plus, in append mode, the parent's). A crash before the rename
  leaves the table exactly at the previous version — no torn reads.
  Re-committing the same version overwrites its own data dir and
  manifest, so at-least-once replay (the foreachBatch failure mode)
  converges to the same state.
- ``read``: time travel — resolve any historical version's manifest to
  its directory list and scan just those. Column pruning and predicate
  pushdown apply unchanged (it's a plain multi-path parquet scan).
- ``vacuum``: delete data directories no retained manifest references
  (the compaction-era garbage collector).

Single-writer by design (one ingest pipeline owns a table); what the
protocol buys is *reader* isolation and history, which is the part
object stores can't give you for free.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """A commit's optimistic-concurrency check failed: another writer
    published a version after this writer's read. Re-read and retry."""


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._manifest_dir = os.path.join(root, "_versions")

    # -- protocol internals -------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"{version:08d}.json")

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _claim(self, rel: str) -> bool:
        """Atomically reserve a staging-directory NAME: O_EXCL marker
        under ``_claims/`` (outside ``data/`` so vacuum's rmtree sweep
        never sees it). Returns False when another writer — thread or
        process — holds the name. Claims are permanent tombstones: a
        name is never reused, even after vacuum reclaims its data."""
        claims = os.path.join(self.root, "_claims")
        os.makedirs(claims, exist_ok=True)
        try:
            fd = os.open(
                os.path.join(claims, os.path.basename(rel)),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            return False
        os.close(fd)
        return True

    # -- public surface -----------------------------------------------------
    def versions(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self._manifest_dir)
            if f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def commit(
        self,
        df: DataFrame,
        *,
        mode: str = "append",
        version: int | None = None,
        expectations: "list[tuple[str, str]] | None" = None,
        expected_version: int | None = None,
    ) -> int:
        """Publish ``df`` as the next snapshot. ``mode='append'`` keeps
        the parent snapshot's directories and adds this commit's;
        ``mode='overwrite'`` starts a fresh file set. Returns the
        committed version number.

        ``expectations``: optional write-path data-quality gate — a
        list of ``(name, sql_predicate)`` pairs every incoming row must
        satisfy (e.g. ``("pk_not_null", "doc_id IS NOT NULL")``).
        Violations raise BEFORE anything is written, so a failed gate
        leaves the table at its previous version — the manifest
        protocol's atomicity extends to quality checks for free.

        ``expected_version``: optimistic concurrency check — the commit
        raises ``ConcurrentWriteError`` (before anything lands) unless
        the table's latest version still equals it. A read-modify-write
        cycle (e.g. :meth:`upsert`) passes the version it read so a
        racing writer's commit can never be silently overwritten; pass
        ``-1`` to require an empty table. Single-writer pipelines can
        ignore it, which preserves the unconditional behavior.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode: {mode!r}")
        if expected_version is not None:
            current = self.latest_version()
            current = -1 if current is None else current
            if current != expected_version:
                raise ConcurrentWriteError(
                    f"expected latest version {expected_version}, found "
                    f"{current}: a concurrent writer committed first; "
                    f"re-read and retry"
                )
        if expectations:
            from pyspark.sql import functions as F

            bad = df.select(
                *[
                    F.count(F.when(~F.expr(pred), 1)).alias(name)
                    for name, pred in expectations
                ]
            ).first()
            failed = {n: bad[n] for n, _ in expectations if bad[n]}
            if failed:
                raise ValueError(
                    f"commit rejected, expectations violated: {failed}"
                )
        latest = self.latest_version()
        # The publish below is an exclusive compare-and-swap UNLESS the
        # caller explicitly re-publishes a version it owns (the
        # foreachBatch at-least-once replay contract: epoch N re-points
        # N's manifest at a fresh attempt dir). Auto-assigned versions
        # and OCC commits must never overwrite a manifest another
        # writer published between our latest_version() read and the
        # publish — check-then-act alone leaves that window open.
        exclusive = version is None or expected_version is not None
        if version is None:
            version = 0 if latest is None else latest + 1
        # Published directories are NEVER mutated in place: an
        # at-least-once replay of an already-published version stages
        # into a fresh attempt directory and re-points the manifest at
        # it atomically — an overwrite of the live directory would
        # delete files the current manifest still references, tearing
        # concurrent readers of that version. The superseded attempt
        # directory becomes unreferenced garbage that vacuum() reclaims.
        # Staging-name reservation is ATOMIC (O_EXCL claim marker), not
        # a bare exists() probe: two writers racing on the same version
        # — threads in one driver or separate processes — must never
        # stage parquet into one directory (the loser would die on
        # "path already exists" mid-write instead of reaching the CAS
        # and getting a clean ConcurrentWriteError). The exists() check
        # stays as a second condition for crash leftovers staged by
        # anything that never claimed.
        rel = f"data/v={version}"
        attempt = 0
        while not (
            self._claim(rel)
            and not os.path.exists(os.path.join(self.root, rel))
        ):
            attempt += 1
            rel = f"data/v={version}-attempt={attempt}"
        data_dir = os.path.join(self.root, rel)
        # data first (invisible until the manifest publishes) ...
        df.write.parquet(data_dir)
        dirs = [rel]
        if mode == "append" and latest is not None and version > 0:
            parent = self._read_manifest(min(latest, version - 1))
            dirs = parent["dirs"] + dirs
        # "added": this commit's OWN delta directories, recorded so the
        # CDC stream never has to diff against the parent manifest —
        # which vacuum() may have deleted (diffing against a missing
        # parent would replay the full cumulative list as one version's
        # delta, breaking the exactly-once contract).
        manifest = {"version": version, "mode": mode, "dirs": dirs, "added": [rel]}
        # ... then the atomic publish. For new/OCC commits the commit
        # point itself is the compare-and-swap: os.link fails with
        # FileExistsError if any other writer published this version
        # first, so two racers can never both succeed — the loser's
        # staged data dir becomes unreferenced garbage vacuum()
        # reclaims. Replay re-publishes (explicit version, no OCC) keep
        # the idempotent overwrite via os.replace.
        os.makedirs(self._manifest_dir, exist_ok=True)
        # Tmp name is unique PER COMMIT ATTEMPT, not per process: two
        # threads in one driver (exactly the concurrent-foreachBatch /
        # OCC scenario the CAS exists for) racing on the same version
        # must never share a tmp path, or the link winner could publish
        # the loser's manifest bytes (wrong "added"/"dirs").
        tmp = (
            self._manifest_path(version)
            + f".tmp-{os.getpid()}-{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        if exclusive:
            try:
                os.link(tmp, self._manifest_path(version))
            except FileExistsError:
                raise ConcurrentWriteError(
                    f"version {version} was published by a concurrent "
                    f"writer between this commit's read and its publish; "
                    f"re-read and retry"
                ) from None
            finally:
                os.remove(tmp)
        else:
            os.replace(tmp, self._manifest_path(version))
        return version

    def read(
        self, version: int | None = None, *, merge_schema: bool = False
    ) -> DataFrame:
        """Snapshot-isolated scan of ``version`` (default: latest).
        Plain multi-path parquet read, so pruning/pushdown behave
        exactly as on an unversioned table.

        ``merge_schema=True`` unions the column sets of every
        directory in the snapshot (Spark's ``mergeSchema``) — required
        to see columns ADDED by later append commits; rows from
        pre-addition directories surface them as null. Off by default
        because footer-merging every file costs planning time on
        schema-stable tables."""
        if version is None:
            version = self.latest_version()
        if version is None or not os.path.exists(self._manifest_path(version)):
            raise FileNotFoundError(f"no committed version {version} under {self.root}")
        manifest = self._read_manifest(version)
        paths = [os.path.join(self.root, d) for d in manifest["dirs"]]
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    def history(self) -> list[dict]:
        """The commit log, oldest first: one dict per retained version
        (version, mode, directory count, own-delta dirs). Bounded by
        version count — driver-safe."""
        out = []
        for v in self.versions():
            m = self._read_manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "mode": m["mode"],
                    "n_dirs": len(m["dirs"]),
                    "added": m.get("added"),
                }
            )
        return out

    def upsert(
        self, df: DataFrame, *, key: str = "doc_id", order_col: str = "ts"
    ) -> int:
        """MERGE: last-write-wins ``df`` into the latest snapshot and
        publish the result as one overwrite commit — Delta-style
        copy-on-write upsert on the manifest protocol. New keys insert,
        existing keys take the incoming row iff it wins the
        (order_col, full-tuple) tie-break (same grain as the copy
        pipeline's ``last_wins``); history and time travel stay intact.

        COW trade-off, stated plainly: every upsert rewrites the full
        snapshot, so this is for dimension/state tables (the scroll
        pipeline's admitted-corpus scale goes through append commits +
        compaction instead). A deletion-vector/MOR design is the
        upgrade path when rewrite cost dominates."""
        from flink_elasticsearch_ingestion_spark.operators.copy import last_wins

        latest = self.latest_version()
        if latest is None:
            # version 0 gets the SAME last-wins grain as steady state:
            # duplicate keys inside the very first batch must collapse,
            # or the key-uniqueness invariant only holds from version 1
            return self.commit(
                last_wins(df, key=key, order_col=order_col),
                mode="overwrite",
                expected_version=-1,
            )
        merged = last_wins(
            self.read(latest).unionByName(df), key=key, order_col=order_col
        )
        # OCC: the snapshot we merged against must still be latest at
        # publish time, or a racing writer's rows would vanish silently
        return self.commit(merged, mode="overwrite", expected_version=latest)

    def compact(self, *, files: int = 1) -> int:
        """Rewrite the LATEST snapshot as one fresh overwrite commit
        with ``files`` files — the small-files fixer for a table grown
        through many append epochs (each epoch leaves its own
        directory; a thousand epochs = a thousand directories). History
        stays intact: prior versions still time-travel, and ``vacuum``
        reclaims the old directories once retention allows. Returns the
        new version number."""
        return self.commit(self.read().coalesce(files), mode="overwrite")

    def vacuum(self, *, keep_last: int = 1) -> list[str]:
        """Drop manifests older than the last ``keep_last`` versions and
        delete every data directory no retained manifest references.
        Returns the deleted directories."""
        vs = self.versions()
        keep = set(vs[-keep_last:]) if keep_last > 0 else set()
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._read_manifest(v)["dirs"])
        for v in vs:
            if v not in keep:
                os.remove(self._manifest_path(v))
        deleted = []
        data_root = os.path.join(self.root, "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                rel = f"data/{d}"
                if rel not in referenced:
                    shutil.rmtree(os.path.join(data_root, d))
                    deleted.append(rel)
        return deleted


# --- streaming source: the table's commit log as a CDC feed ------------------
#
# The other half of the lakehouse loop: the ingest pipeline COMMITS
# versions (sink side); downstream consumers STREAM them (source side).
# Offsets are version numbers, so Spark's checkpoint + the manifest log
# give exactly-once delivery of every committed snapshot delta with no
# extra bookkeeping: replaying offset range (a, b] re-reads exactly the
# directories versions a+1..b introduced.

def _arrow_schema_of(root: str) -> "object":
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(os.path.join(root, "data", "*", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no committed data under {root}")
    return pq.ParquetFile(files[0]).schema_arrow


class VersionedTableStreamReader:
    """``SimpleDataSourceStreamReader`` over a VersionedTable's commit
    log. Each micro-batch carries the rows of every version committed
    since the last offset — for append commits that is exactly the
    appended delta (new directories only); an overwrite commit emits
    its full fresh snapshot (it references only new directories).
    Every row is tagged with ``_commit_version``."""

    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("versioned_table requires option 'path'")

    def _manifest(self, v: int) -> dict:
        with open(os.path.join(self.root, "_versions", f"{v:08d}.json")) as fh:
            return json.load(fh)

    def _versions(self) -> list[int]:
        d = os.path.join(self.root, "_versions")
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"version": -1}

    def _rows_for(self, lo: int, hi: int):
        import glob as _glob

        import pyarrow.parquet as pq

        import datetime as _dt

        def _conv(v):
            # naive parquet timestamps surface as tz-naive pandas
            # Timestamps; Spark's ingest path tz_converts, so localize
            # to the UTC wall-clock the engine stores
            if hasattr(v, "to_pydatetime"):
                v = v.to_pydatetime()
            if isinstance(v, _dt.datetime) and v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            return v

        for v in [x for x in self._versions() if lo < x <= hi]:
            m = self._manifest(v)
            if "added" in m:
                # the commit recorded its own delta — vacuum-proof,
                # never needs the parent manifest
                delta = set(m["added"])
            elif m.get("mode") == "overwrite" or v == 0:
                delta = set(m["dirs"])
            else:
                # legacy append manifest without "added": the parent
                # diff is only correct if the parent manifest survives.
                # After a vacuum it does not — fail loudly instead of
                # replaying the full cumulative list as one version's
                # delta (which would duplicate every inherited row and
                # mis-tag it with this _commit_version).
                parent = os.path.join(
                    self.root, "_versions", f"{v - 1:08d}.json"
                )
                if not os.path.exists(parent):
                    raise RuntimeError(
                        f"cannot derive append delta for version {v}: "
                        f"parent manifest {v - 1} is gone (vacuumed?) "
                        f"and the manifest has no 'added' field"
                    )
                delta = set(m["dirs"]) - set(self._manifest(v - 1)["dirs"])
            for d in sorted(delta):
                for f in sorted(
                    _glob.glob(os.path.join(self.root, d, "*.parquet"))
                ):
                    for batch in pq.ParquetFile(f).iter_batches():
                        for row in batch.to_pylist():
                            yield tuple(_conv(x) for x in row.values()) + (v,)

    def read(self, start: dict):
        vs = self._versions()
        latest = vs[-1] if vs else -1
        lo = int(start.get("version", -1))
        if latest <= lo:
            return iter(()), {"version": lo}
        # materialized list, not a generator: the simple-reader protocol
        # pickles the prefetched batch to ship it to executors
        return iter(list(self._rows_for(lo, latest))), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            list(
                self._rows_for(
                    int(start.get("version", -1)), int(end.get("version", -1))
                )
            )
        )


def register_versioned_stream_source(spark: SparkSession) -> None:
    """Register the ``versioned_table`` streaming source (idempotent,
    same discipline as ``register_scroll_source``)."""
    from pyspark.sql.datasource import DataSource
    from pyspark.sql.datasource import (
        SimpleDataSourceStreamReader as _Simple,
    )
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import LongType, StructField, StructType

    class _Reader(VersionedTableStreamReader, _Simple):
        pass

    class VersionedTableDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "versioned_table"

        def schema(self):
            base = from_arrow_schema(_arrow_schema_of(self.options["path"]))
            return StructType(
                base.fields + [StructField("_commit_version", LongType())]
            )

        def simpleStreamReader(self, schema):
            return _Reader(self.options)

    try:
        spark.dataSource.register(VersionedTableDataSource)
    except Exception as e:  # pragma: no cover - message-keyed on purpose
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise


def stream_table_versions(spark: SparkSession, root: str):
    """``readStream`` over a VersionedTable's commit log: one row per
    committed record, tagged with ``_commit_version``; offsets are
    version numbers owned by Spark's checkpoint."""
    register_versioned_stream_source(spark)
    return spark.readStream.format("versioned_table").option("path", root).load()
