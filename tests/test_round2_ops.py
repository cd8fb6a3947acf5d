"""Round-2 additions: Q11-style threshold agg, SCD2 interval build,
two-phase vocabulary ids, z-order layout clustering."""

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import relational as R
from flink_elasticsearch_ingestion_spark.operators import text as X
from flink_elasticsearch_ingestion_spark.operators import windows as W
from flink_elasticsearch_ingestion_spark.sources import layout as L


# ---------------------------------------------------------------- Q11


def test_important_part_value_threshold_semantics(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    # sf0.001 has too few suppliers for every nation to be populated:
    # aim at whichever nation holds the most suppliers
    target = (
        supp.join(nat, supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .count()
        .orderBy(F.col("count").desc(), "n_name")
        .first()
        .n_name
    )
    out = R.important_part_value(li, supp, nat, target_nation=target).collect()
    # recompute naively: per-part value over the target nation's suppliers
    rows = (
        li.join(
            supp.join(nat, supp.s_nationkey == nat.n_nationkey)
            .filter(F.col("n_name") == target)
            .select("s_suppkey"),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("v"))
        .collect()
    )
    vals = {r.l_partkey: r.v for r in rows}
    avg = sum(vals.values()) / len(vals)
    expect = {k for k, v in vals.items() if v > 2 * avg}
    assert {r.partkey for r in out} == expect
    # sorted by value desc
    got_vals = [r.part_value for r in out]
    assert got_vals == sorted(got_vals, reverse=True)


# --------------------------------------------------------------- SCD2


def test_scd2_merges_runs_and_versions(spark):
    rows = [
        # user 1: A A B A  -> 3 intervals
        (1, "A", "2024-01-01 00:00:00", 1),
        (1, "A", "2024-01-01 01:00:00", 2),
        (1, "B", "2024-01-01 02:00:00", 3),
        (1, "A", "2024-01-01 03:00:00", 4),
        # user 2: single event -> one open interval
        (2, "X", "2024-01-01 00:30:00", 5),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.user_id, r.version): r
        for r in W.scd2_user_state(ev).collect()
    }
    assert len(out) == 4
    a1 = out[(1, 1)]
    assert a1.state == "A" and str(a1.valid_from) == "2024-01-01 00:00:00"
    # run of two As merged: interval ends when B starts
    assert str(a1.valid_to) == "2024-01-01 02:00:00"
    b = out[(1, 2)]
    assert b.state == "B" and str(b.valid_to) == "2024-01-01 03:00:00"
    # open intervals end at the sentinel
    assert str(out[(1, 3)].valid_to) == W.SCD2_OPEN_END
    assert str(out[(2, 1)].valid_to) == W.SCD2_OPEN_END


def test_scd2_intervals_tile_without_overlap(spark, sf_dir):
    """Per user, intervals are contiguous: next valid_from == prev
    valid_to, and the last interval is open (sentinel)."""
    from flink_elasticsearch_ingestion_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = W.scd2_user_state(ev)
    from pyspark.sql import Window as Win

    w = Win.partitionBy("user_id").orderBy("version")
    bad = (
        out.withColumn("next_from", F.lead("valid_from").over(w))
        .filter(
            F.col("next_from").isNotNull()
            & (F.col("next_from") != F.col("valid_to"))
        )
        .count()
    )
    assert bad == 0
    open_rows = out.filter(F.col("valid_to") == F.lit(W.SCD2_OPEN_END).cast("timestamp"))
    n_users = ev.select("user_id").distinct().count()
    assert open_rows.count() == n_users


# -------------------------------------------------------------- vocab


def test_vocab_ids_match_single_window_ranking(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = X.vocab_with_ids(docs, min_count=1).collect()
    # naive reference: one global row_number (fine at test scale)
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("token")
    ).filter(F.length("token") > 0)
    from pyspark.sql import Window as Win

    ref = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "token_id",
            F.row_number().over(Win.orderBy(F.col("cnt").desc(), F.col("token"))),
        )
        .collect()
    )
    ref_ids = {r.token: (r.cnt, r.token_id) for r in ref}
    assert len(got) == len(ref_ids)
    for r in got:
        assert ref_ids[r.token] == (r.cnt, r.token_id)
    # dense contiguous ids from 1
    ids = sorted(r.token_id for r in got)
    assert ids == list(range(1, len(ids) + 1))


# ------------------------------------------------------------- zorder


def test_zorder_value_bit_interleave(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (65535, 65535), (0b1010, 0b0101)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", L.zorder_value(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for j in range(16):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y)
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_zorder_layout_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """The point of the z-curve: per-file min/max ranges stay narrow in
    BOTH dimensions, so footer-stat pruning works for predicates on
    either column. A linear sort on x gives ~full-range y spans per
    file; the z-order layout must beat it by a wide margin."""
    # both dimensions quantized to the same 8-bit range so the curve
    # actually interleaves (see write_zordered docstring)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.least(F.lit(255), F.floor(F.col("o_totalprice") / 2048).cast("bigint")).alias("x"),
        F.pmod(F.col("o_custkey") * 7, F.lit(256)).alias("y"),
    )
    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    L.write_zordered(orders, z_path, "x", "y", n_files=8, bits=8)
    orders.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(lin_path)

    def avg_span(path, col):
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for i in range(md.num_row_groups):
                for j in range(md.num_columns):
                    cc = md.row_group(i).column(j)
                    if cc.path_in_schema == col and cc.statistics is not None:
                        mins.append(cc.statistics.min)
                        maxs.append(cc.statistics.max)
            if mins:
                spans.append(max(maxs) - min(mins))
        assert spans, f"no stats for {col} under {path}"
        return sum(spans) / len(spans)

    # same number of rows survived
    assert spark.read.parquet(z_path).count() == orders.count()
    z_y_span = avg_span(z_path, "y")
    lin_y_span = avg_span(lin_path, "y")
    # linear-on-x layout leaves y unclustered (span ~ full 1024 range);
    # the z-order layout must cut the per-file y span substantially
    assert z_y_span < lin_y_span * 0.75, (z_y_span, lin_y_span)
    # and x must remain well-clustered too (far below the full range)
    full_x = orders.agg(
        (F.max("x") - F.min("x")).alias("r")
    ).collect()[0].r
    assert avg_span(z_path, "x") < full_x * 0.6


def test_write_zordered_roundtrip_rows(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") / 8).cast("bigint").alias("x"),
        F.pmod(F.col("o_custkey"), F.lit(256)).alias("y"),
    )
    path = str(tmp_path / "z")
    L.write_zordered(orders, path, "x", "y", n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(back.columns) == {"o_orderkey", "x", "y"}
    # key column dropped, ids preserved exactly
    assert (
        back.select(F.sum("o_orderkey")).collect()[0][0]
        == orders.select(F.sum("o_orderkey")).collect()[0][0]
    )


# --------------------------------------------------- incremental agg


def test_incremental_rollup_equals_full_recompute(spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"),
        F.col("value").cast("decimal(18,4)").alias("value"),
        "event_id",
    )
    snapshot = (
        ev.filter(F.col("event_id") % 3 != 0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    merged = R.incremental_rollup(
        snapshot, ev.filter(F.col("event_id") % 3 == 0), ["k"]
    )
    full = ev.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )
    got = {r.k: (r.n_events, r.total_value) for r in merged.collect()}
    want = {r.k: (r.n_events, r.total_value) for r in full.collect()}
    assert got == want  # exact decimal equality, not approximate


def test_incremental_rollup_handles_new_keys(spark):
    snap = spark.createDataFrame(
        [("a", 2, 10.0)], "k string, n_events long, total_value double"
    )
    batch = spark.createDataFrame(
        [("a", 1.0), ("b", 5.0)], "k string, value double"
    )
    out = {r.k: (r.n_events, r.total_value) for r in R.incremental_rollup(snap, batch, ["k"]).collect()}
    assert out == {"a": (3, 11.0), "b": (1, 5.0)}


# ------------------------------------------------- stratified exact-k


def test_stratified_exact_k_sizes_and_determinism(spark, sf_dir):
    from flink_elasticsearch_ingestion_spark.operators.sampling import (
        stratified_exact_k,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    sizes = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    k = 7
    out = stratified_exact_k(docs, "lang", k)
    got = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert got == {lang: min(k, n) for lang, n in sizes.items()}
    # deterministic: identical id set on re-run
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {r.doc_id for r in stratified_exact_k(docs, "lang", k).collect()}
    assert ids1 == ids2
    # a different salt versions the sample
    ids3 = {
        r.doc_id
        for r in stratified_exact_k(docs, "lang", k, salt="exact-k-v2").collect()
    }
    assert ids3 != ids1


# ------------------------------------------------------ token entropy


def test_token_entropy_extremes(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # degenerate: entropy 0
            (2, "a b c d"),          # uniform over 4: entropy ln(4)
            (3, "a a b b"),          # uniform over 2: entropy ln(2)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in X.token_entropy(docs).collect()}
    assert out[1].entropy == 0.0 and out[1].n_distinct == 1
    assert abs(out[2].entropy - round(math.log(4), 4)) < 1e-9
    assert abs(out[3].entropy - round(math.log(2), 4)) < 1e-9
    assert out[2].n_tokens == 4 and out[2].n_distinct == 4


# -------------------------------------------------------- plan audits


def test_important_part_value_plan_broadcasts_threshold(spark, sf_dir):
    """The global threshold must attach as a 1-row broadcast, never by
    windowing or re-shuffling the per-part table; the supplier dim must
    broadcast into the fact (no lineitem shuffle before the part agg)."""
    from flink_elasticsearch_ingestion_spark.plans import physical_plan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    plan = physical_plan(R.important_part_value(li, supp, nat))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2  # supp dim + 1-row threshold
    # exactly one hash shuffle before the per-part aggregate
    assert "Exchange hashpartitioning(l_partkey" in plan


def test_scd2_plan_single_user_shuffle(spark, sf_dir):
    """All three window passes (lag, lead, row_number) must share the
    one hash exchange on user_id — no re-partition between them."""
    from flink_elasticsearch_ingestion_spark.plans import physical_plan
    from flink_elasticsearch_ingestion_spark.sources.tables import load_table

    plan = physical_plan(W.scd2_user_state(load_table(spark, sf_dir, "events")))
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert "user_id" in ln, f"unpartitioned window: {ln}"


def test_vocab_ids_big_window_is_partitioned(spark, sf_dir):
    """The per-token rank must run partitioned by (cnt, prefix); only
    the tiny histogram prefix-sum may gather to one partition."""
    from flink_elasticsearch_ingestion_spark.plans import physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = physical_plan(X.vocab_with_ids(docs))
    row_windows = [
        ln for ln in plan.splitlines() if "row_number()" in ln and "__within" in ln
    ]
    assert row_windows
    for ln in row_windows:
        assert "windowspecdefinition(cnt" in ln, f"unpartitioned rank: {ln}"


def test_incremental_rollup_plan_no_history_rescan(spark):
    """Merging a batch into a snapshot must scan the snapshot relation
    once (union + one keyed re-reduce), never join back per key."""
    from flink_elasticsearch_ingestion_spark.plans import physical_plan

    snap = spark.createDataFrame(
        [("a", 2, 10.0)], "k string, n_events long, total_value double"
    )
    batch = spark.createDataFrame([("a", 1.0)], "k string, value double")
    plan = physical_plan(R.incremental_rollup(snap, batch, ["k"]))
    assert "Join" not in plan and "Window" not in plan
    assert "Union" in plan
