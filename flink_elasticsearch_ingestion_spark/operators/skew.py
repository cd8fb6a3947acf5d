"""Skew mitigation primitives for 100 TB shuffles.

AQE's skew-join splitting handles most cases automatically
(``session.py`` enables it), but two patterns still need engine-side
help at extreme skew, both provided here:

- ``salted_agg``: two-phase aggregation for heavy-hitter group keys.
  Phase 1 aggregates on (key, salt) — the hot key's rows spread over
  ``salt_buckets`` reducers; phase 2 merges the per-salt partials.
  Works for any algebraic aggregate (sum/count/min/max and anything
  expressible as merge-of-partials).
- ``salted_broadcast_join``: replicate-and-salt equi-join for a skewed
  probe side against a small build side. The build side is exploded
  ``salt_buckets``-fold with a salt column; the probe side picks a
  random salt per row, so the hot key's probe rows land on different
  reducers. (With a genuinely small build side, plain ``F.broadcast``
  is simpler — this shape exists for when the build side is just above
  broadcast size.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic-per-task uniform salt in [0, salt_buckets)."""
    return df.withColumn(col_name, (F.rand(seed=42) * salt_buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output column name -> (phase1 aggregate over raw rows,
    phase2 aggregate over phase-1 partials). Example::

        salted_agg(events, ["event_type"], {
            "n":     (F.count(F.lit(1)), F.sum("n")),
            "total": (F.sum("value"),    F.sum("total")),
            "mx":    (F.max("value"),    F.max("mx")),
        })

    Phase 1 shuffles on (keys + salt): a key with 10^9 rows spreads
    across ``salt_buckets`` reducers instead of melting one. Phase 2
    shuffles only ``salt_buckets`` rows per key.

    Note Spark's hash aggregation already does map-side partials, which
    resolves *moderate* skew; salting matters when a single reducer's
    post-partial load (distinct map-task count x 1) is still the
    bottleneck, or the aggregation state per key is large
    (collect_list-like).
    """
    salted = with_salt(df, salt_buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c1.alias(name) for name, (c1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c2.alias(name) for name, (_, c2) in aggs.items()]
    )


def salted_broadcast_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join a skewed probe side with a small build side by
    replicating the build side per salt value. Output == plain inner
    join on ``on``."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    build_rep = build.select("*", salts)
    probe_salted = with_salt(probe, salt_buckets)
    out = probe_salted.join(build_rep, on=[on, "__salt"], how="inner")
    return out.drop("__salt")


def join_key_skew_profile(
    df,
    key_col: str,
    *,
    top_n: int = 20,
) -> "DataFrame":
    """Pre-join skew diagnosis: the top-N heaviest values of a join /
    groupBy key with each key's share of the table and its multiple of
    the average key load — the numbers that decide whether a shuffle
    needs salting, AQE skew handling, or a broadcast rewrite BEFORE
    the 100 TB job is launched (the post-hoc version is reading a
    straggler's task metrics; this is the cheap preflight).

    Scale shape: one partial+final count aggregate on the key, a 1-row
    global summary broadcast back, and a TakeOrdered top-N — the
    profile never materializes more than ``top_n`` + 1-row state
    downstream of the count.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = (
        counts.orderBy(F.col("n").desc(), "key")
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
    )
    w = Window.orderBy(F.col("n").desc(), "key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.select(
            "key",
            "n",
            F.round(F.col("n") / F.col("total") + 1e-9, 6).alias("share"),
            F.round(
                F.sum("n").over(w) / F.col("total") + 1e-9, 6
            ).alias("cum_share"),
            F.round(
                F.col("n") * F.col("n_keys") / F.col("total") + 1e-9, 4
            ).alias("x_avg"),
        )
        .orderBy(F.col("n").desc(), "key")
    )


def shard_skew_report(
    df: DataFrame, key_col: str, *, n_shards: int = 32
) -> DataFrame:
    """Hash-SHARD balance audit — the partition-level twin of
    ``join_key_skew_profile`` (which profiles the hottest KEYS): bucket
    every row by a portable hash of the join/partition key into
    ``n_shards`` shards and report each shard's row count, share, and
    skew vs the perfectly-balanced expectation. A shard skew near 1.0
    everywhere means the key hashes evenly (safe to shuffle on); a hot
    shard predicts the straggler task BEFORE the 100 TB shuffle runs.

    Portable hash (md5 top-32-bits mod shards, the engine's standard
    family) so any SQL engine re-derives identical shard membership;
    the share/skew normalization is a window over the bounded
    ``n_shards``-row aggregate."""
    from pyspark.sql import Window as Wnd

    shard = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % n_shards
    )
    per = df.select(shard.alias("shard")).groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = F.sum("n_rows").over(
        Wnd.partitionBy(F.lit(1)).rowsBetween(
            Wnd.unboundedPreceding, Wnd.unboundedFollowing
        )
    )
    return per.select(
        F.col("shard").cast("int").alias("shard"),
        "n_rows",
        F.round(F.col("n_rows") / total + 1e-9, 6).alias("share"),
        F.round(
            F.col("n_rows") * n_shards / total + 1e-9, 4
        ).alias("skew"),
    ).orderBy("shard")
