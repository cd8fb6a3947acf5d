"""Parquet table loaders for the test fixtures (TESTDATA.md).

Scale note: ``spark.read.parquet`` gives Catalyst the scan it needs for
predicate pushdown, column pruning and partition pruning — at 100 TB the
same call reads a partitioned/bucketed layout and only the row groups a
query's filters allow. Do not collect or materialize here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # every catalog query funnels through here: guarantee executor
    # workers can import the package (pickle-by-reference UDFs and
    # DataSource classes) even when the driving process isn't rooted
    # in the repo — one addPyFile per SparkContext, then a no-op
    from flink_elasticsearch_ingestion_spark.session import ship_package

    ship_package(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; read it as nanos-long and truncate to microseconds
    (integer ``div`` — float division would round and drift from
    DuckDB's truncating ns->us cast)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        # keep the raw nanos column (ts_ns): predicates on the DERIVED
        # timestamp cannot reach the parquet scan, but a coarse range
        # predicate on ts_ns pushes down and prunes row groups — the
        # incremental copy uses both (coarse pushed + exact post-filter)
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the fixture tables as temp views for the SQL surface."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
