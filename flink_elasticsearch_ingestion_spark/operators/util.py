"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bind_once(expr: Column, build) -> Column:
    """Evaluate ``expr`` ONCE per row and hand it to ``build`` as a
    bound lambda variable.

    HOF lambda bodies re-evaluate per element, so an expensive
    expression (a regex normalize, a tokenization) closed over by a
    per-element lambda re-runs once per output element.  Wrapping it
    as the 1-element input of an outer ``transform`` binds it to a
    lambda VARIABLE — the HOF's input is evaluated once per row, and
    variable references are free.  Same effect as a column-boundary
    two-projection split without needing a DataFrame."""
    return F.element_at(F.transform(F.array(expr), build), 1)


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
