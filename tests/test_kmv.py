"""KMV (k-minimum-values) set-overlap sketch: planted ground truth.

The sketch contract: exact when a set is smaller than k (the sketch IS
the set), estimated within the published 3/sqrt(k) Jaccard tolerance
otherwise, and exact arms always exact.
"""

import pyspark.sql.functions as F

from flink_elasticsearch_ingestion_spark.operators.relational import (
    kmv_set_overlap,
)


def _events(spark, groups):
    rows = [(g, u) for g, users in groups.items() for u in users]
    return spark.createDataFrame(rows, "event_type string, user_id long")


def test_small_sets_are_exact(spark):
    """Sets below k: sketch == set, so every estimate is exact."""
    groups = {
        "a": range(0, 60),
        "b": range(30, 90),   # |a ∩ b| = 30, |a ∪ b| = 90
        "c": range(200, 220),  # disjoint from both
    }
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_set_overlap(
            _events(spark, groups), key_col="user_id", k=128
        ).collect()
    }
    ab = out[("a", "b")]
    assert ab["exact_a"] == 60 and ab["exact_b"] == 60
    assert ab["est_a"] == 60.0 and ab["est_b"] == 60.0
    assert ab["exact_inter"] == 30
    assert ab["est_inter"] == 30.0
    assert abs(ab["est_jaccard"] - 30 / 90) < 1e-6
    assert ab["within_tol"]
    ac = out[("a", "c")]
    assert ac["exact_inter"] == 0 and ac["est_jaccard"] == 0.0


def test_large_sets_estimate_within_tolerance(spark):
    """Sets far above k: distinct estimates within ~20% and Jaccard
    within the 3/sqrt(k) contract the operator itself flags."""
    n = 5000
    groups = {
        "x": range(0, n),
        "y": range(n // 2, n + n // 2),  # true J = 1/3
    }
    rows = kmv_set_overlap(
        _events(spark, groups), key_col="user_id", k=256
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["exact_a"] == n and r["exact_inter"] == n // 2
    assert abs(r["est_a"] - n) / n < 0.2
    assert abs(r["est_b"] - n) / n < 0.2
    assert r["within_tol"]  # |est_J - 1/3| <= 3/sqrt(256)
    assert abs(r["est_inter"] - n // 2) / (n // 2) < 0.35


def test_stream_kmv_merge_equals_full_history(spark, tmp_path):
    """Folding batches through kmv_apply_factory yields the EXACT
    sketch a single pass over the full history builds (KMV merge is
    lossless over sketch state), and a replayed batch id is a no-op."""
    from flink_elasticsearch_ingestion_spark.operators.dedup import (
        portable_hash31,
    )
    from flink_elasticsearch_ingestion_spark.streaming.analytics import (
        kmv_apply_factory,
    )

    k = 16
    sketch = str(tmp_path / "sketch")
    apply_batch = kmv_apply_factory(
        spark, sketch, key_col="user_id", group_col="event_type", k=k
    )
    b1 = _events(spark, {"a": range(0, 300), "b": range(100, 400)})
    b2 = _events(spark, {"a": range(250, 600), "c": range(0, 50)})
    apply_batch(b1, 0)
    apply_batch(b2, 1)
    apply_batch(b2, 1)  # replay: must be a no-op
    got = {
        (r["grp"], r["h"]) for r in spark.read.parquet(sketch).collect()
    }
    full = b1.union(b2).select(
        F.col("event_type").alias("grp"),
        portable_hash31(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    import pyspark.sql.window as W

    rn = F.row_number().over(
        W.Window.partitionBy("grp").orderBy("h")
    )
    want = {
        (r["grp"], r["h"])
        for r in full.withColumn("rn", rn).filter(F.col("rn") <= k).collect()
    }
    assert got == want


def test_duplicate_events_do_not_inflate(spark):
    """The sketch is over DISTINCT keys: replaying each event 5x
    changes nothing."""
    groups = {"a": list(range(100)), "b": list(range(50, 150))}
    ev = _events(spark, groups)
    ev5 = ev.union(ev).union(ev).union(ev).union(ev)
    one = kmv_set_overlap(ev, key_col="user_id", k=64).collect()
    five = kmv_set_overlap(ev5, key_col="user_id", k=64).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, five))
