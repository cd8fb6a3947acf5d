"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition a narrow input up to the cluster's
    default parallelism before a CPU-heavy map stage.

    Fixture parquet files ship a single row group, so the scan is ONE
    task regardless of ``maxPartitionBytes`` — an expression fan-out
    (shingle/explode/HOF) downstream of it would run on one core. At
    real scale inputs arrive in many splits and this is a no-op (the
    partition count already meets parallelism), so the exchange only
    appears exactly when it pays for itself.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
