"""Event-time windows and the as-of join operator."""

import datetime as dt

from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import windows as W
from flink_elasticsearch_ingestion_spark.operators.asof import as_of_join
from flink_elasticsearch_ingestion_spark.sources.tables import load_events


def test_tumbling_windows_cover_all_events(spark, sf_dir):
    events = load_events(spark, sf_dir)
    out = W.tumbling_event_windows(events)
    assert out.agg(F.sum("n_events")).first()[0] == events.count()
    # boundaries are 6h-aligned
    for r in out.select("window_start").limit(10).collect():
        assert r.window_start.hour % 6 == 0
        assert r.window_start.minute == 0


def test_session_windows_respect_gap(spark, sf_dir):
    events = load_events(spark, sf_dir)
    out = W.session_windows(events, gap="30 minutes")
    assert out.agg(F.sum("n_events")).first()[0] == events.count()
    # sessions for one user are >= 30min apart
    u = out.filter(F.col("user_id") == 1).orderBy("session_start").collect()
    for a, b in zip(u, u[1:]):
        assert (b.session_start - a.session_start) >= dt.timedelta(minutes=30)


def test_asof_join_matches_latest_at_or_before():
    import pyspark.sql.functions as F  # noqa

    from flink_elasticsearch_ingestion_spark import get_spark

    spark = get_spark("tests")
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 25, "e2"), (2, 5, "e3")], "k int, ts int, ev string"
    )
    right = spark.createDataFrame(
        [(1, 10, "r@10"), (1, 20, "r@20"), (1, 30, "r@30"), (3, 1, "other")],
        "k int, ts int, payload string",
    )
    out = as_of_join(left, right, on_left="k", on_right="k", left_ts="ts", right_ts="ts")
    got = {(r.k, r.ts): (r.payload, r.matched_ts) for r in out.collect()}
    assert got[(1, 10)] == ("r@10", 10)  # tie: simultaneous right row matches
    assert got[(1, 25)] == ("r@20", 20)  # latest at-or-before
    assert got[(2, 5)] == (None, None)  # left row with no match survives


def test_running_revenue_monotone(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = W.running_revenue(orders).filter(F.col("o_custkey") == 1).orderBy("order_seq").collect()
    totals = [r.running_total for r in out]
    assert totals == sorted(totals)
    assert len(out) > 0


def test_time_weighted_value_hand_computed(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: value 10 held 10s, then 20 held 30s -> twap 17.5
        (1, 1, base, 10.0),
        (2, 1, base + dt.timedelta(seconds=10), 20.0),
        (3, 1, base + dt.timedelta(seconds=40), 99.0),  # last: no duration
        # user 2: single event -> excluded entirely
        (4, 2, base, 5.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        time_weighted_value,
    )

    got = {r.user_id: r for r in time_weighted_value(events).collect()}
    assert set(got) == {1}
    assert got[1].n_intervals == 2
    assert abs(got[1].twap - (10 * 10 + 20 * 30) / 40) < 1e-6
    assert abs(got[1].total_seconds - 40.0) < 1e-6


def test_event_trigrams_counts_consecutive_triples(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    seq = ["a", "b", "c", "a", "b", "c"]  # trigrams: abc, bca, cab, abc
    rows = [
        (i, 1, base + dt.timedelta(seconds=i), t) for i, t in enumerate(seq)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        event_trigrams,
    )

    got = {r.trigram: r.n_occurrences for r in event_trigrams(events).collect()}
    assert got == {"a>b>c": 2, "b>c>a": 1, "c>a>b": 1}
