"""Versioned-table commit protocol (sources/versioned.py): atomic
manifest publishes, time-travel reads, replay idempotence, vacuum
garbage collection — and pruning/pushdown surviving the indirection."""

import os

import pytest
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.plans import scan_summary
from flink_elasticsearch_ingestion_spark.sources.tables import load_table
from flink_elasticsearch_ingestion_spark.sources.versioned import VersionedTable


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


def test_commit_read_time_travel(tmp_path, spark, sf_dir):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    old = orders.filter(F.col("o_orderkey") % 3 != 0)
    new = orders.filter(F.col("o_orderkey") % 3 == 0)

    assert t.versions() == []
    v0 = t.commit(old)
    v1 = t.commit(new)  # append: v1 = old + new
    assert (v0, v1) == (0, 1)
    assert t.read(0).count() == old.count()
    assert t.read(1).count() == orders.count()
    assert t.read().count() == orders.count()  # default = latest
    assert t.read(1).exceptAll(orders).count() == 0
    assert orders.exceptAll(t.read(1)).count() == 0
    # history is immutable: v0 still reads the pre-append snapshot
    assert t.read(0).exceptAll(old).count() == 0


def test_overwrite_starts_fresh_file_set(tmp_path, spark, sf_dir):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders)
    small = orders.limit(10)
    v = t.commit(small, mode="overwrite")
    assert t.read(v).count() == 10
    assert t.read(0).count() == orders.count()


def test_uncommitted_data_is_invisible(tmp_path, spark, sf_dir):
    """The commit point is the manifest rename: data written without a
    published manifest must not change what readers see (the torn-write
    crash window)."""
    root = str(tmp_path / "tbl")
    t = VersionedTable(spark, root)
    orders = _orders(spark, sf_dir)
    t.commit(orders.limit(100))
    # simulate a crash after the data write, before the manifest publish
    orders.limit(7).write.parquet(os.path.join(root, "data", "v=1"))
    assert t.latest_version() == 0
    assert t.read().count() == 100
    with pytest.raises(FileNotFoundError):
        t.read(1)


def test_replayed_commit_is_idempotent(tmp_path, spark, sf_dir):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders.filter(F.col("o_orderkey") % 3 != 0))
    batch = orders.filter(F.col("o_orderkey") % 3 == 0)
    t.commit(batch, version=1)
    before = sorted(r["o_orderkey"] for r in t.read(1).collect())
    t.commit(batch, version=1)  # at-least-once replay of the same epoch
    assert t.latest_version() == 1
    assert sorted(r["o_orderkey"] for r in t.read(1).collect()) == before


def test_vacuum_drops_only_unreferenced(tmp_path, spark, sf_dir):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders.limit(50), mode="overwrite")
    t.commit(orders.limit(80), mode="overwrite")  # fresh set: v0 orphaned
    t.commit(orders.limit(20))  # append onto v1
    deleted = t.vacuum(keep_last=1)
    assert deleted == ["data/v=0"]
    assert t.versions() == [2]
    assert t.read(2).count() == 100  # v1's files survive: v2 references them
    with pytest.raises(FileNotFoundError):
        t.read(0)


def test_pruning_and_pushdown_survive_versioning(tmp_path, spark, sf_dir):
    """Time travel is a plain multi-path parquet scan: the column-prune
    and predicate-pushdown guarantees of the audit library must hold on
    a versioned read exactly as on a raw one."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders.filter(F.col("o_orderkey") % 3 != 0))
    t.commit(orders.filter(F.col("o_orderkey") % 3 == 0))
    q = t.read(1).filter(F.col("o_totalprice") > 100000.0).select(
        "o_orderkey", "o_totalprice"
    )
    scans = scan_summary(q)
    assert len(scans) == 1
    assert "o_custkey" not in scans[0]["columns"]  # pruned
    assert any("o_totalprice" in f for f in scans[0].get("pushed_filters", []))


def test_stream_table_versions_delivers_each_commit_exactly_once(
    tmp_path, spark, sf_dir
):
    """The commit log as a streaming source: offsets are version
    numbers, so each drain delivers exactly the versions committed
    since the checkpoint — append commits as their delta, overwrite
    commits as their fresh snapshot, every row tagged with its
    _commit_version."""
    from flink_elasticsearch_ingestion_spark.sources.versioned import (
        stream_table_versions,
    )

    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    t = VersionedTable(spark, root)
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    v0 = orders.filter(F.col("o_orderkey") % 3 == 0)
    v1 = orders.filter(F.col("o_orderkey") % 3 == 1)
    t.commit(v0)

    def drain():
        q = (
            stream_table_versions(spark, root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = spark.read.parquet(out)
    assert got.count() == v0.count()
    assert got.select("_commit_version").distinct().collect()[0][0] == 0

    t.commit(v1)  # append: the delta is exactly v1's rows
    drain()
    got = spark.read.parquet(out)
    assert got.count() == v0.count() + v1.count()
    per_v = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version").agg(F.count("*").alias("n")).collect()
    }
    assert per_v == {0: v0.count(), 1: v1.count()}
    # the union of streamed deltas IS the latest snapshot
    keys = sorted(r["o_orderkey"] for r in got.select("o_orderkey").collect())
    want = sorted(r["o_orderkey"] for r in t.read(1).collect())
    assert keys == want

    small = orders.limit(5)
    t.commit(small, mode="overwrite")  # fresh file set: full snapshot streams
    drain()
    got = spark.read.parquet(out)
    assert got.filter(F.col("_commit_version") == 2).count() == 5


def test_compact_rewrites_latest_without_losing_history(tmp_path, spark, sf_dir):
    import glob

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    for m in range(4):  # four append epochs -> four data dirs
        t.commit(orders.filter(F.col("o_orderkey") % 4 == m).repartition(4))
    before = sorted(r["o_orderkey"] for r in t.read().collect())
    n_files_before = len(glob.glob(str(tmp_path / "tbl" / "data" / "*" / "*.parquet")))

    v = t.compact(files=1)
    assert v == 4
    assert sorted(r["o_orderkey"] for r in t.read().collect()) == before
    assert t.read(3).count() == len(before)  # history intact
    assert t.read(0).count() < len(before)
    # the compacted snapshot reads from ONE file
    man_files = glob.glob(str(tmp_path / "tbl" / "data" / "v=4" / "*.parquet"))
    assert len(man_files) == 1 and n_files_before >= 16
    # vacuum now reclaims every pre-compaction directory
    deleted = t.vacuum(keep_last=1)
    assert sorted(deleted) == [f"data/v={i}" for i in range(4)]
    assert sorted(r["o_orderkey"] for r in t.read().collect()) == before


def test_commit_expectations_gate_atomically(tmp_path, spark, sf_dir):
    """A failed write-path expectation rejects the commit BEFORE any
    data lands: the table stays at its previous version and a corrected
    retry takes the version the failed attempt would have."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    checks = [
        ("pk_not_null", "o_orderkey IS NOT NULL"),
        ("price_positive", "o_totalprice > 0"),
    ]
    t.commit(orders.limit(100), expectations=checks)

    bad = orders.limit(10).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    with pytest.raises(ValueError, match="price_positive"):
        t.commit(bad, expectations=checks)
    assert t.latest_version() == 0
    assert t.read().count() == 100

    t.commit(orders.limit(10), expectations=checks)  # corrected retry
    assert t.latest_version() == 1
    assert t.read().count() == 110


def test_replay_never_mutates_a_published_directory(tmp_path, spark, sf_dir):
    """At-least-once replay of an already-published version stages into
    a fresh attempt directory: the directory the live manifest points at
    is never deleted out from under a concurrent reader (the torn-read
    window an in-place overwrite would open)."""
    import json

    root = str(tmp_path / "tbl")
    t = VersionedTable(spark, root)
    orders = _orders(spark, sf_dir)
    t.commit(orders.limit(50), version=0)
    first_dirs = set(
        json.load(open(os.path.join(root, "_versions", "00000000.json")))["dirs"]
    )
    first_files = {
        f
        for d in first_dirs
        for f in os.listdir(os.path.join(root, d))
        if f.endswith(".parquet")
    }
    # replay the same epoch: must publish from a DIFFERENT directory
    t.commit(orders.limit(50), version=0)
    replay_dirs = set(
        json.load(open(os.path.join(root, "_versions", "00000000.json")))["dirs"]
    )
    assert replay_dirs != first_dirs, "replay re-used the published directory"
    # the originally published files are still intact on disk
    for d in first_dirs:
        assert first_files <= set(os.listdir(os.path.join(root, d)))
    assert t.read(0).count() == 50
    # the superseded attempt directory is unreferenced garbage vacuum reclaims
    deleted = t.vacuum(keep_last=1)
    assert sorted(first_dirs) == deleted


def test_stream_delta_survives_vacuum_of_parent_manifests(tmp_path, spark, sf_dir):
    """A new subscriber starting AFTER a vacuum must still see each
    surviving append version's OWN delta (from the manifest's 'added'
    field), never the full cumulative directory list mis-tagged as one
    version's delta."""
    from flink_elasticsearch_ingestion_spark.sources.versioned import (
        stream_table_versions,
    )

    root = str(tmp_path / "tbl")
    t = VersionedTable(spark, root)
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    a = orders.filter(F.col("o_orderkey") % 3 == 0)
    b = orders.filter(F.col("o_orderkey") % 3 == 1)
    c = orders.filter(F.col("o_orderkey") % 3 == 2)
    t.commit(a)
    t.commit(b)
    t.commit(c)
    t.vacuum(keep_last=2)  # v0's manifest is gone; v1/v2 survive

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        stream_table_versions(spark, root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    per_v = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version").agg(F.count("*").alias("n")).collect()
    }
    # v1's delta is exactly b's rows — NOT a+b (the pre-fix behavior:
    # missing parent manifest => prev=set() => cumulative list as delta)
    assert per_v == {1: b.count(), 2: c.count()}


def test_legacy_append_manifest_with_vacuumed_parent_fails_loudly(
    tmp_path, spark, sf_dir
):
    """Pre-'added' manifests can only derive an append delta by diffing
    the parent manifest; if that parent was vacuumed the read must fail
    rather than silently duplicate inherited rows."""
    import json

    from flink_elasticsearch_ingestion_spark.sources.versioned import (
        VersionedTableStreamReader,
    )

    root = str(tmp_path / "tbl")
    t = VersionedTable(spark, root)
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    t.commit(orders.limit(10))
    t.commit(orders.limit(30))
    # strip the 'added' field (simulate a legacy manifest) and vacuum
    m_path = os.path.join(root, "_versions", "00000001.json")
    m = json.load(open(m_path))
    del m["added"]
    json.dump(m, open(m_path, "w"))
    os.remove(os.path.join(root, "_versions", "00000000.json"))

    reader = VersionedTableStreamReader({"path": root})
    with pytest.raises(RuntimeError, match="vacuumed"):
        list(reader._rows_for(-1, 1))


def test_upsert_merges_last_write_wins(tmp_path, spark, sf_dir):
    """COW MERGE on the manifest protocol: new keys insert, existing
    keys take the later-ordered incoming row, history stays
    time-travelable, and a replayed upsert of the same batch converges
    (no duplicate keys, same winners)."""
    from pyspark.sql import functions as F2

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    base = (
        _orders(spark, sf_dir)
        .select("o_orderkey", "o_totalprice")
        .withColumn("ts", F2.lit(1).cast("bigint"))
        .limit(100)
    )
    v0 = t.commit(base)
    # update half the keys with a later ts, insert 5 fresh keys
    updates = (
        base.filter(F2.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F2.col("o_totalprice") + 1000.0)
        .withColumn("ts", F2.lit(2).cast("bigint"))
    )
    inserts = spark.createDataFrame(
        [(10**9 + i, 1.0, 2) for i in range(5)],
        "o_orderkey long, o_totalprice double, ts bigint",
    )
    batch = updates.unionByName(inserts)
    v1 = t.upsert(batch, key="o_orderkey", order_col="ts")
    assert (v0, v1) == (0, 1)
    cur = t.read(v1)
    assert cur.count() == 105  # 100 keys + 5 inserts, no duplicates
    assert cur.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    # updated keys carry the +1000 price, untouched keys the original
    joined = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in cur.join(
            base.select("o_orderkey", F2.col("o_totalprice").alias("old")),
            "o_orderkey",
        )
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    for r in base.collect():
        want = r["o_totalprice"] + (1000.0 if r["o_orderkey"] % 2 == 0 else 0.0)
        assert abs(joined[r["o_orderkey"]] - want) < 1e-6
    # time travel still shows the pre-merge snapshot
    assert t.read(v0).count() == 100
    # replayed merge converges byte-identically
    before = sorted(map(tuple, t.read(v1).collect()))
    t.upsert(batch, key="o_orderkey", order_col="ts")
    assert sorted(map(tuple, t.read().collect())) == before


def test_history_lists_the_commit_log(tmp_path, spark, sf_dir):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders.limit(10))
    t.commit(orders.limit(20))
    t.commit(orders.limit(5), mode="overwrite")
    h = t.history()
    assert [x["version"] for x in h] == [0, 1, 2]
    assert [x["mode"] for x in h] == ["append", "append", "overwrite"]
    assert [x["n_dirs"] for x in h] == [1, 2, 1]
    assert all(len(x["added"]) == 1 for x in h)


def test_optimistic_concurrency_rejects_stale_writers(tmp_path, spark, sf_dir):
    """Delta-style OCC: a commit conditioned on the version the writer
    read must fail (before anything lands) when another writer has
    published since — the lost-update guard upsert() uses."""
    from flink_elasticsearch_ingestion_spark.sources.versioned import (
        ConcurrentWriteError,
    )

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders.limit(10))  # v0
    # writer A reads v0; writer B commits v1 first
    t.commit(orders.limit(5), expected_version=0)  # B wins the race -> v1
    with pytest.raises(ConcurrentWriteError, match="re-read and retry"):
        t.commit(orders.limit(7), expected_version=0)  # A's stale publish
    assert t.latest_version() == 1  # A's failed commit left no version
    # empty-table precondition
    t2 = VersionedTable(spark, str(tmp_path / "tbl2"))
    t2.commit(orders.limit(3), expected_version=-1)
    with pytest.raises(ConcurrentWriteError):
        t2.commit(orders.limit(3), expected_version=-1)


def test_schema_evolution_reads_added_columns(tmp_path, spark, sf_dir):
    """Append commits may ADD columns; merge_schema=True surfaces them
    (null for pre-addition rows) while the default read stays cheap for
    schema-stable tables."""
    from pyspark.sql import functions as F2

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    t.commit(orders.limit(10))
    t.commit(
        orders.limit(5)
        .withColumn("priority", F2.lit("HIGH"))
        .withColumn("o_orderkey", F2.col("o_orderkey") + 10**9)
    )
    evolved = t.read(merge_schema=True)
    assert "priority" in evolved.columns
    assert evolved.count() == 15
    assert evolved.filter(F2.col("priority").isNull()).count() == 10
    assert evolved.filter(F2.col("priority") == "HIGH").count() == 5
    # time travel before the addition never shows the column
    assert "priority" not in t.read(0, merge_schema=True).columns


def test_publish_point_cas_rejects_racing_publish(
    tmp_path, spark, sf_dir, monkeypatch
):
    """The commit point itself is a compare-and-swap: even when the
    check-then-act window is forced open (stale version listing), the
    exclusive manifest link fails for the loser instead of silently
    overwriting the winner's manifest."""
    from flink_elasticsearch_ingestion_spark.sources.versioned import (
        ConcurrentWriteError,
    )

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders.limit(10))  # v0
    t.commit(orders.limit(5))  # v1 — the racing writer's publish
    # writer A read the version list BEFORE v1 landed: force that stale
    # view so A's auto-assigned next version collides with v1
    monkeypatch.setattr(t, "versions", lambda: [0])
    with pytest.raises(ConcurrentWriteError, match="between this commit"):
        t.commit(orders.limit(7))
    monkeypatch.undo()
    # the winner's snapshot is untouched and the table is not torn
    assert t.latest_version() == 1
    assert t.read(1).count() == 15  # v0's 10 + v1's appended 5
    # no leftover tmp manifest
    leftovers = [
        f
        for f in os.listdir(os.path.join(str(tmp_path / "tbl"), "_versions"))
        if not f.endswith(".json")
    ]
    assert leftovers == []


def test_replay_republish_of_owned_version_still_converges(
    tmp_path, spark, sf_dir
):
    """The at-least-once replay contract survives the CAS: an explicit
    re-publish of a version the writer owns (foreachBatch epoch replay,
    no OCC) re-points the manifest idempotently instead of raising."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders.limit(10), version=0)
    before = sorted(map(tuple, t.read(0).collect()))
    t.commit(orders.limit(10), version=0)  # replayed epoch
    assert t.latest_version() == 0
    assert sorted(map(tuple, t.read(0).collect())) == before


def test_upsert_dedupes_duplicate_keys_in_the_first_batch(tmp_path, spark):
    """Version 0 gets the same last-wins grain as steady state: dup
    keys inside the very first upserted batch collapse to the
    (order_col, tuple)-winning row."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    first = spark.createDataFrame(
        [(1, 10.0, 1), (1, 20.0, 2), (2, 5.0, 1)],
        "doc_id long, val double, ts bigint",
    )
    v0 = t.upsert(first, key="doc_id", order_col="ts")
    assert v0 == 0
    rows = {r["doc_id"]: r["val"] for r in t.read(0).collect()}
    assert rows == {1: 20.0, 2: 5.0}  # later ts won inside batch 0


def test_same_process_thread_race_publishes_each_writers_own_manifest(
    tmp_path, spark, sf_dir, monkeypatch
):
    """Two threads in ONE driver process racing on the same version
    (the concurrent foreachBatch / OCC-writer scenario the CAS exists
    for) must never share a manifest tmp file: with a pid-only tmp
    suffix the link winner could publish the LOSER's manifest bytes.
    A json.dump barrier holds both tmp files fully written before
    either links, forcing the interleaving; the winner's published
    snapshot must reference the winner's own data."""
    import json as _json
    import threading

    from flink_elasticsearch_ingestion_spark.sources import versioned as V

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    orders = _orders(spark, sf_dir)
    t.commit(orders.limit(3))  # v0

    barrier = threading.Barrier(2, timeout=60)
    real_dump = _json.dump

    def sync_dump(obj, fh, *a, **kw):
        real_dump(obj, fh, *a, **kw)
        if ".tmp-" in getattr(fh, "name", ""):
            barrier.wait()  # both racers' tmp bytes down before any link

    monkeypatch.setattr(V.json, "dump", sync_dump)
    results: dict[int, object] = {}

    def commit(n):
        try:
            results[n] = t.commit(orders.limit(n), expected_version=0)
        except V.ConcurrentWriteError:
            results[n] = "lost"
        except Exception as e:  # pragma: no cover - the failure mode
            results[n] = e

    threads = [threading.Thread(target=commit, args=(n,)) for n in (5, 7)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    monkeypatch.undo()

    assert sorted(results) == [5, 7]
    losers = [n for n, r in results.items() if r == "lost"]
    winners = [n for n, r in results.items() if r == 1]
    assert len(losers) == 1 and len(winners) == 1, results
    # the winner's manifest references the WINNER's data: v0's 3 rows
    # plus exactly the winner's appended rows — never the loser's
    assert t.latest_version() == 1
    assert t.read(1).count() == 3 + winners[0]
