"""Storage-layout contract: partition pruning actually prunes, and
compaction reduces file count without changing a single row."""

import glob

from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.sources.layout import (
    compact,
    with_event_date,
    write_partitioned,
)
from flink_elasticsearch_ingestion_spark.sources.tables import load_events


def test_date_partition_pruning(tmp_path, spark, sf_dir):
    path = str(tmp_path / "events_by_date")
    events = with_event_date(load_events(spark, sf_dir).drop("ts_ns"))
    write_partitioned(events, path, ["event_date"])

    one_day = events.select("event_date").distinct().orderBy("event_date").first()[0]
    read = spark.read.parquet(path).filter(F.col("event_date") == F.lit(one_day))
    plan = read._jdf.queryExecution().executedPlan().toString()
    # the date predicate must be a partition filter on the scan, not a
    # row-level filter over all partitions
    assert "PartitionFilters: [" in plan and "event_date" in plan.split("PartitionFilters")[1][:200]
    assert read.count() == events.filter(F.col("event_date") == F.lit(one_day)).count()


def test_compaction_preserves_rows_and_reduces_files(tmp_path, spark, sf_dir):
    path = str(tmp_path / "fragmented")
    events = load_events(spark, sf_dir).drop("ts_ns")
    # fragment: many tiny files (the streaming-sink pathology)
    events.repartition(16).write.parquet(path)
    before_files = len(glob.glob(f"{path}/*.parquet"))
    before = events.count()

    compact(spark, path, files_per_partition=2)
    after_files = len(glob.glob(f"{path}/*.parquet"))
    after_df = spark.read.parquet(path)
    assert after_files < before_files
    assert after_files <= 2
    assert after_df.count() == before
    assert after_df.exceptAll(events).count() == 0


def test_compaction_partitioned(tmp_path, spark, sf_dir):
    path = str(tmp_path / "by_type")
    events = load_events(spark, sf_dir).drop("ts_ns")
    write_partitioned(events.repartition(8), path, ["event_type"])
    compact(spark, path, files_per_partition=1, partition_cols=["event_type"])
    for d in glob.glob(f"{path}/event_type=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1
    assert spark.read.parquet(path).count() == events.count()


def test_dynamic_partition_pruning_through_join(tmp_path, spark, sf_dir):
    """The 100 TB join-pruning contract: when the partition key arrives
    through a JOIN against a filtered dim (no literal predicate on the
    fact at all), the scan must still prune partitions at runtime via
    dynamic partition pruning — the fact's partition filter shows a
    dynamicpruning subquery, and only the dim-selected dates are read."""
    path = str(tmp_path / "events_dpp")
    events = with_event_date(load_events(spark, sf_dir).drop("ts_ns"))
    write_partitioned(events, path, ["event_date"])

    dates = [
        r[0]
        for r in events.select("event_date").distinct().orderBy("event_date").collect()
    ]
    # star shape: a date dim with an attribute to filter on, stored as a
    # table (DPP keys off a selective filter on the build side)
    dim_path = str(tmp_path / "date_dim")
    spark.createDataFrame(
        [(d, "keep" if d in dates[:2] else "skip") for d in dates],
        "event_date date, flag string",
    ).write.parquet(dim_path)

    fact = spark.read.parquet(path)
    dim = spark.read.parquet(dim_path).filter(F.col("flag") == "keep")
    joined = fact.join(F.broadcast(dim), "event_date")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = events.filter(F.col("event_date").isin(dates[:2])).count()
    assert joined.count() == expected
