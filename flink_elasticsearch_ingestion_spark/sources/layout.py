"""Storage layout control — the other half of 100 TB performance.

Query speed at scale is decided as much by how data is WRITTEN as by
the plan that reads it:

- ``write_partitioned``: hive-style directory partitioning (e.g. by
  event date, or by ``index_id`` mirroring the reference's per-record
  index routing). Readers with partition-key predicates skip whole
  directories — `PartitionFilters` in the scan, zero I/O for pruned
  days — which is how the incremental ts-range copy avoids touching
  historical data at all.
- ``compact``: the small-files fixer. Streaming sinks and fine-grained
  partitioning produce files far below the ~128 MB scan-split sweet
  spot; a scan of 10^6 tiny files is scheduler-bound, not I/O-bound.
  Compaction rewrites each partition to ``files_per_partition`` files.

Both are thin, deliberately: the point is pinning the layout contract
with tests (pruning actually prunes; compaction actually reduces file
count without changing rows), not wrapping Spark's writer API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet write."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def with_event_date(events: DataFrame, ts_col: str = "ts", out_col: str = "event_date") -> DataFrame:
    """Derive the partition key for time-partitioned layouts."""
    return events.withColumn(out_col, F.to_date(ts_col))


def compact(
    spark: SparkSession,
    path: str,
    files_per_partition: int = 1,
    partition_cols: list[str] | None = None,
) -> None:
    """Rewrite a parquet dataset with ``files_per_partition`` files per
    partition directory (or per dataset when unpartitioned). Reads and
    rewrites in one job; rows are unchanged."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    if partition_cols:
        writer = (
            df.repartition(files_per_partition, *[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
        )
    else:
        writer = df.coalesce(files_per_partition).write.mode("overwrite")
    writer.parquet(tmp)
    # atomic-ish swap via filesystem rename (driver-side, local/HDFS-style)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)


#: bits per dimension for the 2-D z-order curve (16+16 -> 32-bit key)
ZORDER_BITS = 16


def zorder_value(x: F.Column, y: F.Column, bits: int = ZORDER_BITS) -> F.Column:
    """Interleave the low ``bits`` of two non-negative ints into a
    Morton (z-order) key: bit j of x lands at position 2j, bit j of y
    at 2j+1. Sorting by the key clusters rows that are close in BOTH
    dimensions, which is what multi-column min/max file skipping needs
    — a single-column sort gives perfect pruning on one predicate
    column and none on the other; the z-curve splits the difference.

    Pure bit arithmetic (an unrolled ``bits``-term expression tree, one
    shift/mask/or chain per bit) — whole-stage-codegen friendly,
    engine-portable, no UDF."""
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(x.cast("bigint"), j).bitwiseAND(1), 2 * j)
            + F.shiftleft(F.shiftrightunsigned(y.cast("bigint"), j).bitwiseAND(1), 2 * j + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    *,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the z-curve of (x_col, y_col):
    range-partition by the z key (contiguous, roughly equal-sized z
    ranges per file — the sampling-based range partitioner handles
    skew), sort within each file, drop the key. Every file then covers
    a small rectangle-ish region of (x, y) space, so min/max footer
    stats prune on EITHER column's predicate — the poor-man's
    Delta/Iceberg OPTIMIZE ZORDER, built from two Spark primitives.

    ``bits`` must match the QUANTIZED range of both columns: a 16-bit
    curve over an 8-bit column wastes the high interleave positions on
    constant zeros and degenerates toward a single-column sort — scale
    both dimensions to the same bit width first."""
    keyed = df.withColumn(
        "__z", zorder_value(F.col(x_col), F.col(y_col), bits=bits)
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def hilbert_value(x: F.Column, y: F.Column, bits: int = ZORDER_BITS) -> F.Column:
    """Hilbert-curve index of a 2-D point (``bits`` bits per axis) —
    the space-filling curve Delta/Iceberg moved to AFTER z-order,
    because Hilbert has no long diagonal jumps: consecutive key values
    are always grid-neighbors, so each file's (x, y) bounding box is
    tighter and min/max skipping prunes strictly better on mixed
    predicates than the Morton curve's corner teleports.

    The classic bit-level walk (the xy2d form): from the top bit down,
    quadrant digits accumulate ``s*s*((3*rx) XOR ry)`` while the lower
    half-plane is reflected/transposed as the curve recurses.
    Implemented as ONE ``aggregate`` fold over the bit levels with an
    integer struct accumulator — O(bits) expression nodes (one parse),
    exact int64 arithmetic only, engine-portable, no UDF."""

    def step(acc, _b):
        rx = (
            F.when(acc["x"].bitwiseAND(acc["s"]) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        ry = (
            F.when(acc["y"].bitwiseAND(acc["s"]) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        d2 = acc["d"] + acc["s"] * acc["s"] * (
            (F.lit(3).cast("bigint") * rx).bitwiseXOR(ry)
        )
        low = ry == 0
        refl = rx == 1
        new_x = (
            F.when(low & refl, acc["s"] - 1 - acc["y"])
            .when(low, acc["y"])
            .otherwise(acc["x"])
        )
        new_y = (
            F.when(low & refl, acc["s"] - 1 - acc["x"])
            .when(low, acc["x"])
            .otherwise(acc["y"])
        )
        return F.struct(
            new_x.alias("x"),
            new_y.alias("y"),
            d2.alias("d"),
            (acc["s"] / F.lit(2)).cast("bigint").alias("s"),
        )

    init = F.struct(
        x.cast("bigint").alias("x"),
        y.cast("bigint").alias("y"),
        F.lit(0).cast("bigint").alias("d"),
        F.lit(1 << (bits - 1)).cast("bigint").alias("s"),
    )
    return F.aggregate(F.sequence(F.lit(1), F.lit(bits)), init, step)["d"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    *,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed parquet table (``bucketBy`` + ``saveAsTable`` with
    an explicit ``path`` so no warehouse directory is touched) — the
    co-location half of the 100 TB join story.

    Two tables bucketed by their join key with the SAME bucket count
    join with ZERO exchange on either side: each task reads bucket i of
    both tables, so the terabytes of shuffle a fact-fact join normally
    pays disappear from the plan entirely (pinned by
    tests/test_plans.py::test_bucketed_join_is_colocated). ``sort_cols``
    pre-sorts within buckets so the sort-merge join can also skip or
    cheapen its partition-local sort.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_order_revenue(
    spark: SparkSession,
    lineitem: DataFrame,
    orders: DataFrame,
    staging_dir: str,
    *,
    n_buckets: int = 8,
) -> DataFrame:
    """Order-priority revenue off a CO-LOCATED bucketed layout: stage
    both fact tables bucketed by the join key, then join the bucketed
    tables — the exchange-free physical shape every repeated fact-fact
    join at 100 TB should run on (bucket once, join shuffle-free
    forever). Results are layout-independent; only the plan changes.
    """
    import os

    write_bucketed(
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        "__bucketed_lineitem",
        os.path.join(staging_dir, "lineitem"),
        "l_orderkey",
        n_buckets=n_buckets,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        orders.select("o_orderkey", "o_orderpriority"),
        "__bucketed_orders",
        os.path.join(staging_dir, "orders"),
        "o_orderkey",
        n_buckets=n_buckets,
        sort_cols=["o_orderkey"],
    )
    li = spark.table("__bucketed_lineitem")
    od = spark.table("__bucketed_orders")
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
