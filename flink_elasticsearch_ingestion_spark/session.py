"""SparkSession factory.

Local test profile mirrors the driver environment (local[N], single JVM);
the same builder flags are what we would set on a 1000-executor cluster:
AQE on (runtime coalesce + skew-join), UTC session timezone (fixtures are
UTC; see FIXTURES.md), Arrow for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "flink_elasticsearch_ingestion_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` with spark-submit owning the
    master URL; every other setting below is scale-safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # plan-audit tooling (plans/audit.py) parses PushedFilters out of
        # rendered plans; the 100-char default truncates them mid-bracket
        .config("spark.sql.maxMetadataStringLength", "100000")
        .config("spark.ui.enabled", "false")
        # Python DataSource V2 filter pushdown (es_scroll's ts-range
        # checkpoint predicate evaluates inside the source reader)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
