"""Round-11 OPTIMIZATION-round parity pins.

Each test pins an optimization that changed an operator's internals
(OPTIMIZATION_r11.md): the optimized default path must be
value-identical to the legacy path / an independent re-derivation.
"""

import pytest
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators.relational import (
    join_size_estimate,
)
from flink_elasticsearch_ingestion_spark.operators.similarity import (
    bucket_cap_recall_account,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestBucketCapRecallBucketLocal:
    """bucket_local=True (default, bucket-local cogroup scoring) must be
    bit-identical to the legacy pair-attach arm (bucket_local=False)."""

    def test_parity_on_fixture(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        kw = dict(threshold=0.4, bits=4, tables=8, bucket_cap=8,
                  reference_cap=256)
        new = _rows(bucket_cap_recall_account(emb, **kw))
        old = _rows(bucket_cap_recall_account(emb, bucket_local=False, **kw))
        assert new == old
        # the account is non-trivial on the fixture
        assert new[0][0] > 0

    def test_parity_with_truncation_and_tiny_caps(self, spark, sf_dir):
        # force reference-arm truncation (reference_cap < occupancy)
        # so the truncated branch is compared too
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        kw = dict(threshold=0.2, bits=2, tables=4, bucket_cap=2,
                  reference_cap=8)
        new = _rows(bucket_cap_recall_account(emb, **kw))
        old = _rows(bucket_cap_recall_account(emb, bucket_local=False, **kw))
        assert new == old
        assert new[0][3] > 0  # n_buckets_truncated really exercised

    def test_parity_with_null_and_wrong_dim_vectors(self, spark, sf_dir):
        # null / wrong-dim rows occupy rank slots but never score —
        # both arms must agree on that
        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
            .limit(200)
        )
        dirty = emb.unionByName(
            spark.createDataFrame(
                [(900001, None), (900002, [1.0, 2.0])],
                "vec_id bigint, embedding array<double>",
            ).select(
                "vec_id",
                F.col("embedding").cast(emb.schema["embedding"].dataType),
            )
        )
        kw = dict(threshold=0.3, bits=3, tables=4, bucket_cap=4,
                  reference_cap=16)
        new = _rows(bucket_cap_recall_account(dirty, **kw))
        old = _rows(bucket_cap_recall_account(dirty, bucket_local=False, **kw))
        assert new == old


class TestJoinSizeEstimateDedupFirst:
    """The sketch now hashes per DISTINCT key (weighted by count)
    instead of per row; every output value must be identical to an
    independent per-row re-derivation."""

    def test_tiny_frame_exact(self, spark):
        left = spark.createDataFrame(
            [(1,), (1,), (1,), (2,), (2,), (3,), (None,)], "k bigint"
        )
        right = spark.createDataFrame(
            [(1,), (2,), (2,), (4,), (None,), (None,)], "k bigint"
        )
        out = join_size_estimate(left, right, "k", "k").collect()[0]
        # exact arm: 3*1 + 2*2 = 7 (nulls never join)
        assert out["n_left"] == 7
        assert out["n_right"] == 6
        assert out["true_join_size"] == 7
        # AMS inner-product estimator never underestimates
        assert out["est_join_size"] >= out["true_join_size"]
        assert out["overestimate"] == out["est_join_size"] - 7

    def test_matches_per_row_derivation(self, spark, sf_dir):
        # independent re-derivation of the sketch from the ORIGINAL
        # per-row fan (the pre-optimization shape) on fixture data
        from flink_elasticsearch_ingestion_spark.operators.dedup import (
            portable_hash31,
        )

        depth, width = 4, 256
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

        def row_sketch(df, key):
            fan = df.select(F.col(key).cast("string").alias("k")).select(
                "k",
                F.explode(
                    F.sequence(F.lit(0), F.lit(depth - 1))
                ).alias("j"),
            )
            bucket = (
                portable_hash31(
                    F.concat(
                        F.lit("jse"),
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("k"),
                    )
                )
                % width
            )
            return (
                fan.select("j", bucket.alias("bucket"))
                .groupBy("j", "bucket")
                .agg(F.count(F.lit(1)).alias("c"))
            )

        sa = row_sketch(li, "l_orderkey")
        sb = row_sketch(orders, "o_orderkey")
        expected_est = (
            sa.join(
                F.broadcast(
                    sb.select("j", "bucket", F.col("c").alias("cb"))
                ),
                ["j", "bucket"],
            )
            .groupBy("j")
            .agg(F.sum(F.col("c") * F.col("cb")).alias("row_est"))
            .agg(F.min("row_est").alias("e"))
            .collect()[0]["e"]
        )
        got = join_size_estimate(
            li, orders, "l_orderkey", "o_orderkey"
        ).collect()[0]
        assert got["est_join_size"] == expected_est
        assert got["n_left"] == li.count()
        assert got["n_right"] == orders.count()
