"""Skew-mitigation and bucketed-layout primitives: salted results must
equal their unsalted formulations; bucketed joins must not shuffle."""

from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators.skew import (
    salted_agg,
    salted_broadcast_join,
)
from flink_elasticsearch_ingestion_spark.sources.tables import load_table


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plain = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        F.max("value").alias("mx"),
    )
    salted = salted_agg(
        events,
        ["event_type"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total_raw": (F.sum("value"), F.sum("total_raw")),
            "mx": (F.max("value"), F.max("mx")),
        },
        salt_buckets=8,
    ).select(
        "event_type", "n", F.round("total_raw", 4).alias("total"), "mx"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_equals_plain_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_n"))
    )
    plain = events.join(users, "user_id")
    salted = salted_broadcast_join(events, users, on="user_id", salt_buckets=4)
    assert salted.count() == plain.count()
    assert salted.select(*plain.columns).exceptAll(plain).count() == 0


def test_bucketed_join_has_no_shuffle(tmp_path, spark, sf_dir):
    """Co-located join: both sides bucketed by the join key -> the join
    plan contains no Exchange (the 100 TB fact-fact join layout)."""
    # managed tables land in the session's spark-warehouse dir; DROP
    # TABLE below removes the files (warehouse.dir is a static conf and
    # cannot be pointed at tmp_path per-test)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "orders_b"
    )
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "lineitem_b"
    )
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("orders_b").join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
