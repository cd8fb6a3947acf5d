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
