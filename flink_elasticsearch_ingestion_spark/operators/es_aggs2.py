"""Elasticsearch aggregation-surface parity, part II.

Second slice of the ES aggregation API (sibling of
:mod:`operators.es_aggs`; reference context core.clj:103 — the copied
indexes are *queried* through this API, so parity requires answering
them).  This module covers the histogram / metric / analysis corners:

- ``rare_terms``           — the `rare_terms` bucket aggregation
  (long-tail terms with doc_count ≤ N, ascending-count order).
- ``auto_date_histogram``  — the `auto_date_histogram` aggregation:
  the engine, not the user, picks the calendar interval from a fixed
  rounding ladder so the bucket count stays ≤ the target.
- ``date_histogram_dense`` — `date_histogram` with `min_doc_count: 0`
  + `extended_bounds`: empty buckets are materialized as zeros over
  the full day-aligned span (a generated spine, never a driver loop).
- ``variable_width_histogram`` — the variable-width 1-D clustering
  histogram, specified deterministically as largest-gap splitting of
  the distinct-value grid (ES's own heuristic is order-dependent and
  undocumented; largest-gap is the reproducible analog).
- ``boxplot_agg``          — the `boxplot` metric aggregation
  (quartiles, Tukey 1.5·IQR whiskers, outlier count).
- ``welch_t_test``         — the `t_test` metric aggregation
  (heteroscedastic / Welch variant, the ES default).
- ``categorize_text``      — the `categorize_text` aggregation: log
  lines grouped into templates by masking numeric runs.
- ``string_stats``         — the `string_stats` metric aggregation
  with `show_distribution`: length stats + char Shannon entropy.
- ``fuzzy_match``          — the `fuzzy` query: bounded edit-distance
  term matching with `prefix_length` blocking.
- ``search_highlight``     — the highlighter: first-occurrence
  snippet extraction with ``<em>`` tags around the hit term.

Scale shape: every aggregation is partial+final hash aggs over
map-side-derived keys (shingles, templates, chars, hour buckets);
scalar frames (chosen interval, boundary array, group quartiles) are
1-row/group-count-sized broadcasts; the only windows partition by
query/group keys or run over aggregate-bounded inputs (the
variable-width gap rank uses the same two-phase coarse-range
discipline as ``sampling.equi_depth_buckets``).  Floats that reach a
rank or the result are rounded identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators.text import tokens

__all__ = [
    "rare_terms",
    "auto_date_histogram",
    "date_histogram_dense",
    "variable_width_histogram",
    "grouped_quantiles_exact",
    "boxplot_agg",
    "welch_t_test",
    "categorize_text",
    "string_stats",
    "fuzzy_match",
    "search_highlight",
    "FUZZY_QUERIES",
    "AUTO_HISTO_LADDER",
]


def rare_terms(
    documents: DataFrame,
    *,
    shingle_len: int = 3,
    max_doc_count: int = 2,
    k: int = 50,
) -> DataFrame:
    """ES `rare_terms` bucket aggregation over token-shingle phrases:
    the long-tail buckets a `terms` agg structurally cannot surface
    (terms sorts by count DESC; rare_terms collects doc_count ≤
    ``max_doc_count`` and sorts ASC).  The corpus vocabulary is tiny,
    so the rare axis is ``shingle_len``-token phrases — the same
    long-tail shape ES users point rare_terms at (error signatures,
    rare entity mentions).

    Deterministic bound: ES caps the bucket list by a CuckooFilter
    precision knob; here the first ``k`` buckets in (doc_count, term)
    order — an exact, reproducible cut.

    Scale: shingles build map-side as an indexed `transform` over a
    `slice` of the token array (the `element_at`-over-`sequence` form
    measured 5.4× slower at sf0.1 — interpreted per-element indexing);
    within-doc duplicate shingles dedup map-side via `array_distinct`
    (so doc_count needs NO distinct shuffle — one vocab-keyed hash agg
    is the only exchange); the final cut is a TakeOrderedAndProject
    (per-partition top-k merge on the driver-bound k rows), never a
    global sort.
    """
    n = int(shingle_len)
    follow = ", ".join(f"__w[i+{j}]" for j in range(1, n))
    sh = F.expr(
        f"transform(slice(__w, 1, greatest(size(__w) - {n - 1}, 0)),"
        f" (x, i) -> concat_ws(' ', x, {follow}))"
    )
    dt = documents.select(tokens().alias("__w")).select(
        F.explode(F.array_distinct(sh)).alias("term")
    )
    return (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .where(F.col("doc_count") <= int(max_doc_count))
        .orderBy("doc_count", "term")
        .limit(int(k))
    )


#: the auto_date_histogram rounding ladder (seconds): minute, 5m, 30m,
#: hour, 3h, 12h, day, week, 30-day month, quarter, year — the
#: calendar intervals ES's auto_date_histogram rounds between
AUTO_HISTO_LADDER = (
    60,
    300,
    1800,
    3600,
    10800,
    43200,
    86400,
    604800,
    2592000,
    7776000,
    31536000,
)


def auto_date_histogram(
    events: DataFrame, *, target_buckets: int = 20
) -> DataFrame:
    """ES `auto_date_histogram`: the aggregation picks the SMALLEST
    interval from the rounding ladder whose bucket count over the
    observed [min(ts), max(ts)] span stays ≤ ``target_buckets``, then
    buckets by epoch-floor on that interval.  The user asks for "about
    N buckets" and the engine owns the granularity decision.

    Scale: the span is one partial+final min/max agg (1 row); the
    ladder is an 11-row literal; the chosen interval is a 1-row scalar
    broadcast onto the fact scan (allowlisted scalar join) feeding one
    bucket-keyed hash agg — no second pass over the data to re-bucket,
    because the interval choice needs only the span, not the rows.
    """
    spark = events.sparkSession
    # ts is TIMESTAMP_NTZ; route through the (UTC-session) local
    # timestamp so the epoch cast is legal — identical truncation to
    # the oracle's floor(epoch(ts))
    epoch = F.col("ts").cast("timestamp").cast("long")
    span = events.agg(
        F.min(epoch).alias("__lo"), F.max(epoch).alias("__hi")
    )
    ladder = spark.createDataFrame(
        [(int(s),) for s in AUTO_HISTO_LADDER], "interval_s long"
    )
    n_buckets = (
        F.floor(F.col("__hi") / F.col("interval_s"))
        - F.floor(F.col("__lo") / F.col("interval_s"))
        + 1
    )
    chosen = (
        ladder.crossJoin(F.broadcast(span))
        .where(n_buckets <= int(target_buckets))
        .agg(F.min("interval_s").alias("interval_s"))
    )
    bucket = F.date_format(
        F.timestamp_seconds(
            F.floor(epoch / F.col("interval_s")) * F.col("interval_s")
        ),
        "yyyy-MM-dd HH:mm:ss",
    )
    return (
        events.crossJoin(F.broadcast(chosen))
        .select(
            "interval_s", bucket.alias("bucket_start"), F.col("value")
        )
        .groupBy("interval_s", "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 4).alias("sum_value"),
        )
        .orderBy("bucket_start")
    )


def date_histogram_dense(
    events: DataFrame, *, event_type: str = "error"
) -> DataFrame:
    """ES `date_histogram` with `min_doc_count: 0` and
    `extended_bounds`: hourly buckets over the sparse filtered stream
    (one event type), with EVERY hour of the day-aligned span
    materialized — empty hours appear as explicit zero rows, the shape
    monitoring/alerting consumers require (a missing bucket is
    indistinguishable from "no data arrived" otherwise).

    Scale: the bounds are one 1-row min/max agg; the spine is a
    `sequence()` explode of that single row (span-sized, ~10⁴ rows for
    a year of hours — never fact-sized); the hourly counts are one
    hash agg of the pushed-down filtered scan; the fill is a broadcast
    equi-join of the two bucket-sized frames.
    """
    err = events.where(F.col("event_type") == event_type)
    bounds = err.agg(
        F.date_trunc("day", F.min("ts")).alias("__lo"),
        (
            F.date_trunc("day", F.max("ts"))
            + F.expr("INTERVAL 23 HOURS")
        ).alias("__hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("__lo", "__hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("__hour")
    )
    counts = err.groupBy(
        F.date_trunc("hour", "ts").alias("__hour")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(F.sum("value") + F.lit(1e-9), 4).alias("__s"),
    )
    return (
        spine.join(F.broadcast(counts), "__hour", "left")
        .select(
            F.date_format("__hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias(
                "n_events"
            ),
            F.coalesce(F.col("__s"), F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("hour")
    )


def variable_width_histogram(
    orders: DataFrame,
    value_col: str = "o_totalprice",
    *,
    k: int = 8,
    coarse_edges: tuple[float, ...] = (),
) -> DataFrame:
    """ES `variable_width_histogram`: cluster a numeric field into
    ``k`` variable-width buckets.  ES's implementation is a one-pass
    order-dependent heuristic; the deterministic spec here is
    LARGEST-GAP splitting of the distinct-value grid — the ``k-1``
    widest gaps between consecutive distinct values become the bucket
    boundaries (exact, reproducible, and the fixture every clustering
    of a 1-D axis converges to when the gaps are unambiguous).

    Scale shape — no single-partition window anywhere: consecutive
    gaps need each distinct value's predecessor, which is a GLOBAL
    order dependence, so the grid is range-partitioned by literal
    ``coarse_edges`` (a prefix of the sort key: coarse order == global
    order, same discipline as ``sampling.equi_depth_buckets``); the
    within-range ``lag`` runs in parallel and each range's first row
    takes its predecessor from the broadcast per-range max table.  The
    edges only balance work — any choice is correct.  Boundary
    selection is a TakeOrderedAndProject over the (bounded) gap table;
    assignment is a 1-row boundary-array broadcast (allowlisted).
    """
    edges = list(coarse_edges) or [
        float(e) for e in range(50_000, 500_000, 50_000)
    ]
    coarse = F.lit(len(edges))
    for i, e in reversed(list(enumerate(edges))):
        coarse = F.when(F.col("__v") < F.lit(e), F.lit(i)).otherwise(coarse)
    vals = (
        orders.groupBy(F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__coarse", coarse)
    )
    prev_in_range = F.lag("__v").over(
        Window.partitionBy("__coarse").orderBy("__v")
    )
    range_maxes = vals.groupBy("__coarse").agg(F.max("__v").alias("__rmax"))
    prev_range_max = range_maxes.select(
        "__coarse",
        F.max("__rmax")
        .over(
            Window.orderBy("__coarse").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("__prev_max"),
    )
    gaps = (
        vals.withColumn("__prev", prev_in_range)
        .join(F.broadcast(prev_range_max), "__coarse")
        .withColumn(
            "__gap",
            F.col("__v") - F.coalesce(F.col("__prev"), F.col("__prev_max")),
        )
        .where(F.col("__gap").isNotNull())
    )
    bounds = (
        gaps.orderBy(F.desc("__gap"), F.asc("__v"))
        .limit(int(k) - 1)
        .agg(F.sort_array(F.collect_list("__v")).alias("__bounds"))
    )
    assigned = vals.crossJoin(F.broadcast(bounds)).withColumn(
        "cluster_id",
        F.size(F.filter("__bounds", lambda b: b <= F.col("__v"))),
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum("__n").alias("n_rows"),
            F.round(F.min("__v") + F.lit(1e-9), 2).alias("min_val"),
            F.round(F.max("__v") + F.lit(1e-9), 2).alias("max_val"),
            F.round(
                F.round(F.sum(F.col("__v") * F.col("__n")) + F.lit(1e-9), 2)
                / F.sum("__n")
                + F.lit(1e-9),
                4,
            ).alias("avg_val"),
        )
        .orderBy("cluster_id")
    )


def grouped_quantiles_exact(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    coarse_edges: tuple[float, ...] = (),
) -> DataFrame:
    """EXACT per-group continuous quantiles (`percentile` ≡ DuckDB
    `quantile_cont` semantics: position 1 + q·(n−1), linear
    interpolation) computed through grid ranks instead of Spark's
    `Percentile` aggregate — which buffers every (value, count) pair
    of a group inside one aggregation buffer and measured 30 s where
    this path takes ~3 s at sf1 (6M rows).

    Shape: (1) collapse to the (group, value) GRID with counts — one
    hash agg, the only fact-sized exchange; (2) rank the grid
    two-phase (the equi_depth_buckets discipline: literal
    ``coarse_edges`` range-partition the value axis, the within-range
    cumulative count runs in parallel, per-(group, range) offsets come
    from a broadcast prefix sum over the tiny count table), giving
    every grid row its 1-based rank SPAN [cum_start, cum_end];
    (3) broadcast the |groups|·|qs|-row target-position table back
    onto the grid, keep the ≤ 2 spanning rows per target, interpolate.
    No per-group value buffers, no single-partition window — the plan
    survives a 100× scale-up by construction.

    Returns one row per group: ``q_0.25`` … columns (rounded 4dp, the
    price_quantiles cross-engine pin).
    """
    edges = list(coarse_edges) or [
        float(e) for e in range(10_000, 100_000, 10_000)
    ]
    coarse = F.lit(len(edges))
    for i, e in reversed(list(enumerate(edges))):
        coarse = F.when(F.col("__v") < F.lit(e), F.lit(i)).otherwise(coarse)
    grid = (
        df.select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__coarse", coarse)
    )
    range_counts = grid.groupBy("__g", "__coarse").agg(
        F.sum("__n").alias("__rn")
    )
    w_off = (
        Window.partitionBy("__g")
        .orderBy("__coarse")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = range_counts.select(
        "__g",
        "__coarse",
        F.coalesce(F.sum("__rn").over(w_off), F.lit(0)).alias("__offset"),
        F.sum("__rn")
        .over(Window.partitionBy("__g").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        ))
        .alias("__total"),
    )
    w_cum = (
        Window.partitionBy("__g", "__coarse")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = (
        grid.withColumn("__cum_in_range", F.sum("__n").over(w_cum))
        .join(F.broadcast(offsets), ["__g", "__coarse"])
        .select(
            "__g",
            "__v",
            (F.col("__offset") + F.col("__cum_in_range") - F.col("__n") + 1).alias(
                "__start"
            ),
            (F.col("__offset") + F.col("__cum_in_range")).alias("__end"),
            "__total",
        )
    )
    targets = offsets.groupBy("__g").agg(F.max("__total").alias("__n_rows"))
    pos_rows = []
    for q in qs:
        pos = F.lit(1.0) + F.lit(float(q)) * (F.col("__n_rows") - 1)
        pos_rows.append(
            targets.select(
                "__g",
                F.lit(float(q)).alias("__q"),
                F.floor(pos).cast("bigint").alias("__lo"),
                F.ceil(pos).cast("bigint").alias("__hi"),
                (pos - F.floor(pos)).alias("__frac"),
            )
        )
    positions = pos_rows[0]
    for p in pos_rows[1:]:
        positions = positions.unionByName(p)
    # distinct key name on the broadcast side: the grid and the
    # position table share lineage, and Spark resolves the ambiguous
    # self-join equality trivially-true otherwise
    positions = positions.withColumnRenamed("__g", "__pg")
    hit = ranked.join(
        F.broadcast(positions),
        (F.col("__g") == F.col("__pg"))
        & (
            ((F.col("__lo") >= F.col("__start")) & (F.col("__lo") <= F.col("__end")))
            | ((F.col("__hi") >= F.col("__start")) & (F.col("__hi") <= F.col("__end")))
        ),
    ).select(
        "__g",
        "__q",
        "__frac",
        "__lo",
        "__hi",
        "__start",
        "__end",
        "__v",
    )
    per_q = hit.groupBy("__g", "__q", "__frac").agg(
        F.max(
            F.when(
                (F.col("__lo") >= F.col("__start")) & (F.col("__lo") <= F.col("__end")),
                F.col("__v"),
            )
        ).alias("__v_lo"),
        F.max(
            F.when(
                (F.col("__hi") >= F.col("__start")) & (F.col("__hi") <= F.col("__end")),
                F.col("__v"),
            )
        ).alias("__v_hi"),
    )
    quantile = F.round(
        F.col("__v_lo") + (F.col("__v_hi") - F.col("__v_lo")) * F.col("__frac"),
        4,
    )
    wide = per_q.groupBy("__g").pivot(
        "__q", [float(q) for q in qs]
    ).agg(F.max(quantile))
    out = wide.select(
        F.col("__g").alias(group_col),
        *[F.col(f"`{float(q)}`").alias(f"q_{q}") for q in qs],
    )
    return out


def boxplot_agg(
    lineitem: DataFrame,
    value_col: str = "l_extendedprice",
    group_col: str = "l_returnflag",
) -> DataFrame:
    """ES `boxplot` metric aggregation per group: exact quartiles
    (same `percentile` ≡ `quantile_cont` 4dp parity the
    price_quantiles entry pins, computed through the two-phase grid
    ranks of :func:`grouped_quantiles_exact` — NOT the per-group
    buffering `Percentile` aggregate), Tukey fences at 1.5·IQR
    computed from the ROUNDED quartiles (so both engines derive
    identical fences), whisker min/max restricted to the in-fence
    range, and the outlier count — the distribution summary ES
    renders as a box plot.

    Scale: the quantile pass is grid-shaped (see
    grouped_quantiles_exact — measured 30 s → ~4 s at sf1 vs the
    Percentile-aggregate form), then the group-count-row fence table
    broadcasts back onto the fact scan for one conditional
    partial+final agg.  Two passes by necessity: the fences are
    data-dependent.
    """
    v = F.col(value_col)
    q = grouped_quantiles_exact(
        lineitem, value_col, group_col, qs=(0.25, 0.5, 0.75)
    ).select(
        group_col,
        F.col("`q_0.25`").alias("q1"),
        F.col("`q_0.5`").alias("q2"),
        F.col("`q_0.75`").alias("q3"),
    )
    fences = q.select(
        group_col,
        "q1",
        "q2",
        "q3",
        F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 4).alias(
            "__lo"
        ),
        F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 4).alias(
            "__hi"
        ),
    )
    return (
        lineitem.select(group_col, v.alias("__v"))
        .join(F.broadcast(fences), group_col)
        .groupBy(group_col, "q1", "q2", "q3")
        .agg(
            F.round(
                F.min(F.when(F.col("__v") >= F.col("__lo"), F.col("__v")))
                + F.lit(1e-9),
                2,
            ).alias("whisker_lo"),
            F.round(
                F.max(F.when(F.col("__v") <= F.col("__hi"), F.col("__v")))
                + F.lit(1e-9),
                2,
            ).alias("whisker_hi"),
            F.sum(
                (
                    (F.col("__v") < F.col("__lo"))
                    | (F.col("__v") > F.col("__hi"))
                ).cast("long")
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(group_col)
    )


def welch_t_test(
    events: DataFrame,
    *,
    arm_a: str = "purchase",
    arm_b: str = "error",
    value_col: str = "value",
) -> DataFrame:
    """ES `t_test` metric aggregation, `"type": "heteroscedastic"`
    (Welch — the ES default): does the mean of ``value_col`` differ
    between two filters?  Means and variances derive from ROUNDED
    conditional sums (Σv, Σv² at 2dp — the float-sum-order discipline
    every house aggregate uses), so both engines compute the identical
    t statistic and Welch–Satterthwaite degrees of freedom from
    identical scalars.

    Scale: ONE partial+final conditional agg over the fact scan — six
    sums, one output row, no joins at all.
    """
    v = F.col(value_col)
    in_a = (F.col("event_type") == arm_a).cast("int")
    in_b = (F.col("event_type") == arm_b).cast("int")
    sums = events.agg(
        F.sum(in_a).alias("n_a"),
        F.sum(in_b).alias("n_b"),
        F.round(F.sum(v * in_a) + F.lit(1e-9), 2).alias("__sa"),
        F.round(F.sum(v * in_b) + F.lit(1e-9), 2).alias("__sb"),
        F.round(F.sum(v * v * in_a) + F.lit(1e-9), 2).alias("__qa"),
        F.round(F.sum(v * v * in_b) + F.lit(1e-9), 2).alias("__qb"),
    )
    ma = F.round(F.col("__sa") / F.col("n_a") + F.lit(1e-9), 6)
    mb = F.round(F.col("__sb") / F.col("n_b") + F.lit(1e-9), 6)
    va = F.round(
        (F.col("__qa") - F.col("__sa") * F.col("__sa") / F.col("n_a"))
        / (F.col("n_a") - 1)
        + F.lit(1e-9),
        6,
    )
    vb = F.round(
        (F.col("__qb") - F.col("__sb") * F.col("__sb") / F.col("n_b"))
        / (F.col("n_b") - 1)
        + F.lit(1e-9),
        6,
    )
    stats = sums.select(
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        va.alias("var_a"),
        vb.alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    t = F.round(
        (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se_a + se_b)
        + F.lit(1e-9),
        4,
    )
    dfw = F.round(
        F.pow(se_a + se_b, 2)
        / (
            F.pow(se_a, 2) / (F.col("n_a") - 1)
            + F.pow(se_b, 2) / (F.col("n_b") - 1)
        )
        + F.lit(1e-9),
        2,
    )
    return stats.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        "var_a",
        "var_b",
        t.alias("t_stat"),
        dfw.alias("df_welch"),
        (F.abs(t) > 1.96).alias("significant"),
    )


def categorize_text(events: DataFrame, *, k: int = 10) -> DataFrame:
    """ES `categorize_text` aggregation: group semi-structured log
    messages into templates by masking variable numeric runs.  The
    events table carries the structured fields, so the log LINE is
    constructed deterministically (identically in the oracle — the
    clean_text precedent for synthesized fixtures): a message with the
    event's ids/values/props inlined, plus a retry marker on a third
    of events so formats vary within a type.  Digit runs mask to
    ``<num>``; the surviving skeleton IS the category.

    Scale: pure map-side string construction + regexp mask, one
    template-keyed hash agg (template cardinality ~ format count, not
    row count), top-k by doc count.
    """
    line = F.concat_ws(
        " ",
        F.col("event_type"),
        F.concat(F.lit("user="), F.col("user_id")),
        F.concat(
            F.lit("value="), F.floor(F.col("value")).cast("bigint")
        ),
        F.concat(F.lit("props="), F.col("props")),
        F.when(F.col("event_id") % 3 == 0, F.lit("retry=1")),
    )
    template = F.regexp_replace(line, "[0-9]+", "<num>")
    return (
        events.select(
            template.alias("category"), "user_id", "event_id"
        )
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("first_event"),
        )
        .orderBy(F.desc("n_events"), "category")
        .limit(int(k))
    )


def string_stats(documents: DataFrame, *, group_col: str = "source") -> DataFrame:
    """ES `string_stats` metric aggregation with `show_distribution`,
    per group: doc count, min/max/avg text length, and the Shannon
    entropy (bits) of the character distribution — the corpus-health
    probe that catches encoding corruption and language drift before
    any model sees the data.

    Scale: chars explode map-side into one (group, char)-keyed hash
    agg (alphabet-bounded), entropy folds over that tiny frame; the
    length stats are one grouped agg of the scan; the final join is
    group-count × group-count broadcast.
    """
    g = F.col(group_col)
    chars = documents.select(
        g.alias("grp"), F.explode(F.split(F.col("text"), "")).alias("ch")
    ).where(F.col("ch") != "")
    cc = chars.groupBy("grp", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = cc.groupBy("grp").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t")
    ent = (
        cc.join(F.broadcast(tot), "grp")
        .groupBy("grp")
        .agg(
            F.round(-F.sum(p * F.log2(p)) + F.lit(1e-9), 6).alias(
                "char_entropy"
            )
        )
    )
    lens = documents.groupBy(g.alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.length("text")).alias("min_len"),
        F.max(F.length("text")).alias("max_len"),
        F.round(
            F.sum(F.length("text")) / F.count(F.lit(1)) + F.lit(1e-9), 4
        ).alias("avg_len"),
    )
    return (
        lens.join(F.broadcast(ent), "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "min_len",
            "max_len",
            "avg_len",
            "char_entropy",
        )
        .orderBy(group_col)
    )


#: the fuzzy-query fixture: typo'd probes against the corpus
#: vocabulary (first letters chosen so prefix blocking is exercised),
#: plus a no-hit probe that must stay visible in the result
FUZZY_QUERIES = (
    "spurk",
    "qery",
    "vektor",
    "windoww",
    "streem",
    "tabel",
    "zzzz",
)


def fuzzy_match(
    documents: DataFrame,
    spark: SparkSession,
    *,
    max_dist: int = 2,
    prefix_length: int = 1,
    k: int = 3,
) -> DataFrame:
    """ES `fuzzy` query: match query terms against the indexed
    vocabulary within Levenshtein distance ``max_dist``, with ES's
    `prefix_length` optimization — the first ``prefix_length`` chars
    must match exactly, which is also the candidate-blocking key.
    Top-k expansions per query ordered the way ES's fuzzy rewrite
    ranks them (distance, then doc frequency); no-hit queries stay
    visible as null rows.

    Scale: the vocabulary is a hash agg of the corpus (vocab-sized);
    candidates come from an EQUI-join on the prefix block plus a
    ±``max_dist`` length band — never query-panel × vocabulary — and
    only candidates pay the O(len²) edit-distance compare.  The panel
    is a literal broadcast.
    """
    panel = spark.createDataFrame(
        [(q,) for q in FUZZY_QUERIES], "query_term string"
    )
    vocab = (
        documents.select("doc_id", F.explode(tokens()).alias("term"))
        .where(F.col("term") != "")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    pfx = lambda c: F.substring(c, 1, int(prefix_length))  # noqa: E731
    cand = (
        F.broadcast(panel.withColumn("__pfx", pfx(F.col("query_term"))))
        .join(vocab.withColumn("__pfx", pfx(F.col("term"))), "__pfx")
        .where(
            F.abs(F.length("query_term") - F.length("term"))
            <= int(max_dist)
        )
        .withColumn(
            "distance", F.levenshtein("query_term", "term")
        )
        .where(F.col("distance") <= int(max_dist))
    )
    w = Window.partitionBy("query_term").orderBy(
        "distance", F.desc("df"), "term"
    )
    hits = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .select("query_term", "term", "distance", "df")
    )
    return (
        panel.join(hits, "query_term", "left")
        .select("query_term", "term", "distance", "df")
        .orderBy("query_term", "distance", "term")
    )


def search_highlight(
    documents: DataFrame,
    *,
    query: str = "spark",
    context: int = 3,
    k: int = 20,
) -> DataFrame:
    """ES highlighter (`highlight` on a match query): for documents
    containing the query term, extract the snippet of ±``context``
    tokens around the FIRST occurrence and wrap every hit token inside
    the snippet in ``<em>`` tags — the fragment a search UI renders.

    Scale: pure map-side array ops on the pushed-down
    `array_contains` filter; the final cut is a
    TakeOrderedAndProject on doc_id.
    """
    w = tokens()
    pos = F.array_position(w, query)
    start = F.greatest(pos - context, F.lit(1))
    end = F.least(pos + context, F.size(w))
    frag = F.slice(w, start, end - start + F.lit(1))
    wrapped = F.transform(
        frag,
        lambda t: F.when(
            t == query, F.concat(F.lit("<em>"), t, F.lit("</em>"))
        ).otherwise(t),
    )
    return (
        documents.select(
            "doc_id",
            pos.alias("first_pos"),
            F.concat_ws(" ", wrapped).alias("snippet"),
        )
        .where(F.col("first_pos") > 0)
        .orderBy("doc_id")
        .limit(int(k))
    )
