"""Event-time and analytic window operators (SURVEY.md §2.5, §2.7).

Tumbling/session windows are the Structured-Streaming-native
aggregations (identical expressions run under ``readStream`` with a
watermark); analytic windows (lag/lead, running frames) serve the
event-sequence queries. Each shuffles exactly once on its partition
key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_event_windows(events: DataFrame, width: str = "6 hours") -> DataFrame:
    """Fixed tumbling event-time windows (UTC-epoch aligned, exactly
    what `window()` emits under streaming with a watermark)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.round(F.sum("value"), 2) / F.count(F.lit(1)) + 1e-9, 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
        .orderBy("window_start", "event_type")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: events merge while consecutive gaps are
    < gap (half-open [start, last+gap) semantics)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


def event_gaps(events: DataFrame) -> DataFrame:
    """lag() sequence analysis: per-user inter-event gap stats in
    seconds (exact integer µs arithmetic — deterministic)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros requires TIMESTAMP (rejects TIMESTAMP_NTZ, which is how
    # tz-less parquet reads); the cast is exact under the engine's UTC
    # session tz, and a gap is a difference so any fixed offset cancels.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_gap = events.select(
        "user_id",
        "event_id",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
    )
    return (
        with_gap.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.sum("gap_us") / F.lit(1000000)).cast("bigint").alias("total_gap_s"),
            (F.max("gap_us") / F.lit(1000000)).cast("bigint").alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


def running_revenue(orders: DataFrame) -> DataFrame:
    """Cumulative frame: running total of order value per customer in
    order-date order (rowsBetween unboundedPreceding..current)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
    )


def next_event_type(events: DataFrame) -> DataFrame:
    """lead(): per user, which event type follows each event (Markov-ish
    transition counts)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("event_type", "next_type")
    )


def event_gaps_pandas(events: DataFrame) -> DataFrame:
    """``event_gaps`` implemented as a grouped-map ``applyInPandas``
    (SURVEY.md §2.9 UDF surface): one pandas frame per user, Arrow
    transfer both ways. Exists to pin the grouped-map API with an
    oracle — the driver checks it against the SAME SQL as the
    expression version, so both execution paths must agree exactly.
    The expression form remains the default (JVM-side, no Python hop).
    """
    import pandas as pd

    def per_user(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        ns = pdf["ts"].values.astype("datetime64[ns]").astype("int64")
        if len(ns) < 2:
            return pd.DataFrame(
                {"user_id": [], "n_gaps": [], "total_gap_s": [], "max_gap_s": []}
            )
        gaps_us = (ns[1:] - ns[:-1]) // 1000  # exact integer us
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_gaps": [len(gaps_us)],
                "total_gap_s": [int(gaps_us.sum()) // 10**6],
                "max_gap_s": [int(gaps_us.max()) // 10**6],
            }
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(
            per_user,
            schema="user_id long, n_gaps long, total_gap_s long, max_gap_s long",
        )
        .orderBy("user_id")
    )


def funnel_counts(events: DataFrame) -> DataFrame:
    """Strictly-ordered event funnel: users who viewed, then clicked
    AFTER their first view, then purchased AFTER that first qualifying
    click. Each stage is an aggregate-then-join on user_id (partial
    aggs collapse the event log before each join), so the plan is three
    shuffles on the same key — co-partitioned end to end under AQE, and
    shuffle-free with a user_id-bucketed event log."""
    first_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    first_click = (
        events.filter(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    first_purchase = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = lambda df, name: df.agg(F.count(F.lit(1)).alias("n_users")).select(  # noqa: E731
        F.lit(name).alias("stage"), "n_users"
    )
    return (
        stage(first_view, "1_view")
        .unionByName(stage(first_click, "2_click_after_view"))
        .unionByName(stage(first_purchase, "3_purchase_after_click"))
        .orderBy("stage")
    )


def sliding_event_windows(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    width/slide overlapping windows — `window()` with a slide duration,
    which Structured Streaming expands map-side BEFORE the keyed
    shuffle (the fan-out costs width/slide rows, not an extra
    exchange). Same expression runs under readStream + watermark."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.round(F.sum("value"), 2) / F.count(F.lit(1)) + 1e-9, 4).alias(
                "avg_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
        .orderBy("window_start", "event_type")
    )


def trailing_revenue_window(orders: DataFrame, days: int = 30) -> DataFrame:
    """RANGE-frame analytic window: per order, the same customer's
    order-value total over the PRECEDING ``days`` (value-based frame —
    rows with equal order dates are excluded together, unlike a ROWS
    frame). One shuffle on the customer key; the frame is evaluated
    per partition with a sliding aggregate, and the sum runs in exact
    decimal so frames are associative across engines."""
    # parquet NTZ timestamp -> epoch seconds (session tz is UTC, so the
    # LTZ hop is wall-clock-identity and matches DuckDB's epoch())
    secs = F.unix_seconds(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(secs)
        .rangeBetween(-days * 86400, -1)
    )
    trailing = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.coalesce(trailing.cast("double"), F.lit(0.0)), 2).alias(
            "trailing_revenue"
        ),
        F.count(F.lit(1)).over(w).cast("int").alias("n_trailing_orders"),
    ).orderBy("o_orderkey")


_PRIOR_EVENTS_SCHEMA = "o_orderkey long, o_custkey long, n_prior_events long"


def prior_event_counts_cogroup(
    events: DataFrame, orders: DataFrame, buckets: int = 64
) -> DataFrame:
    """Arrow cogroup (``groupBy.cogroup().applyInPandas``): per user,
    merge the event and order streams and count, for each order, the
    user's events STRICTLY before the order date.

    This covers the two-frame grouped-Arrow UDF surface — but cogroups
    on a BUCKET of the user key, not the raw key: grouped-Arrow UDFs
    pay a fixed pandas/Arrow cost per GROUP (~3 ms measured), so raw
    per-user groups cost O(n_users) Python invocations (4.4 s for
    ~1.6k users at sf0.01; ~45 s projected at sf0.1). With a bounded
    bucket key both sides still shuffle exactly once, the invocation
    count is capped at ``buckets``, and the per-user merge inside a
    bucket stays fully vectorized: concat both frames, stable-sort by
    (user, time, kind), and a per-user cumulative sum of the event
    indicator read off at each order row gives the strictly-before
    count (order rows sort before events at equal timestamps, so ties
    are excluded — ``side='left'`` semantics). Same semantics as the
    expression-only range-join aggregation, which the DuckDB oracle
    replicates, so the custom operator is differential-tested.

    At 100 TB: raise ``buckets`` toward total-cores so every task gets
    ~1 group; skew is bounded because a bucket holds many users and
    the merge is O((E+O) log(E+O)) in the bucket's row count.
    """
    import pandas as pd

    def merge(_key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        if od.empty:
            return pd.DataFrame(
                {"o_orderkey": [], "o_custkey": [], "n_prior_events": []}
            ).astype({"o_orderkey": "int64", "o_custkey": "int64", "n_prior_events": "int64"})
        o_ts = od["o_orderdate"].to_numpy()
        if len(ev):
            e_ts = ev["ts"].to_numpy()
            o_ts = o_ts.astype(e_ts.dtype)
            both = pd.DataFrame(
                {
                    "u": pd.concat(
                        [od["o_custkey"], ev["user_id"]], ignore_index=True
                    ).to_numpy(),
                    "t": list(o_ts) + list(e_ts),
                    "is_ev": [0] * len(od) + [1] * len(ev),
                }
            )
            both.sort_values(["u", "t", "is_ev"], kind="stable", inplace=True)
            n_prior = both.groupby("u", sort=False)["is_ev"].cumsum()
            is_order = both["is_ev"] == 0
            n = n_prior[is_order].to_numpy()
            # order rows were concatenated first, so their (preserved)
            # RangeIndex labels are their positions in ``od``
            order_pos = both.index[is_order].to_numpy()
            out = od.iloc[order_pos]
        else:
            n = [0] * len(od)
            out = od
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"].to_numpy(),
                "o_custkey": out["o_custkey"].to_numpy(),
                "n_prior_events": pd.Series(n).astype("int64"),
            }
        )

    bucket = lambda col: F.pmod(F.xxhash64(F.col(col)), F.lit(buckets))  # noqa: E731
    return (
        events.select("user_id", "ts")
        .groupBy(bucket("user_id").alias("b"))
        .cogroup(
            orders.select("o_orderkey", "o_custkey", "o_orderdate").groupBy(
                bucket("o_custkey").alias("b")
            )
        )
        .applyInPandas(merge, _PRIOR_EVENTS_SCHEMA)
        .orderBy("o_orderkey")
    )


#: closed-world sentinel for the open SCD2 interval — a concrete
#: timestamp (not NULL) so downstream BETWEEN probes and cross-engine
#: hashes treat the current version uniformly. 2200 (not 9999): far
#: beyond any event time, yet inside the ns-resolution int64 range
#: (caps at 2262) so Arrow/pandas interchange never overflows
SCD2_OPEN_END = "2200-01-01 00:00:00"


def scd2_user_state(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 build (gaps-and-islands):
    collapse each user's event stream into versioned state intervals
    ``[valid_from, valid_to)`` — the warehouse dimension-history shape,
    derived straight from the raw log. Consecutive events carrying the
    same state merge into one interval; the open (current) interval
    ends at the ``SCD2_OPEN_END`` sentinel.

    Scale shape: ONE shuffle on ``user_col`` serves every pass — the
    change-detection lag, the interval-end lead, and the version
    row_number all share the identical window spec, so Spark evaluates
    them in a single Window operator chain without re-partitioning.
    Ordering is (ts, event_id): the id tie-break makes the result
    deterministic under same-timestamp bursts on every engine."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_state = F.lag(state_col).over(w)
    starts = (
        events.select(user_col, state_col, ts_col, id_col)
        .withColumn(
            "__chg", prev_state.isNull() | (prev_state != F.col(state_col))
        )
        .filter(F.col("__chg"))
    )
    return (
        starts.select(
            F.col(user_col),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            F.coalesce(
                F.lead(ts_col).over(w), F.lit(SCD2_OPEN_END).cast("timestamp")
            ).alias("valid_to"),
            F.row_number().over(w).alias("version"),
        )
        .orderBy(user_col, "version")
    )


def resample_events_hourly(events: DataFrame) -> DataFrame:
    """Time-series regularization: per-user hourly resample with
    gap-filling and forward-filled values — the spine/interpolate
    operator feeding any window-model training set or monitoring
    rollup.

    Plan shape:
      1. hourly buckets per user: one partial+final hash agg
      2. per-user [min_hour, max_hour] span: second agg on the SAME
         key (AQE reuses the hash partitioning — no extra wide
         exchange), then ``sequence()`` explodes the dense hour spine
         map-side: spine length is bounded by each user's own span,
         never by the global time range
      3. left join aggregates onto the spine on (user_id, hour) — the
         only new shuffle
      4. forward fill: ``last(value, ignorenulls=True)`` over the
         user's hour order; the window key equals the join key, so the
         sort reuses the existing partitioning

    Gaps report n_events = 0 and carry the last seen hourly average
    forward (leading gaps stay null — nothing to carry).
    """
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    hourly = (
        events.select("user_id", hour, "value")
        .groupBy("user_id", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.round(F.sum("value"), 2) / F.count(F.lit(1)) + 1e-9, 4
            ).alias("avg_value"),
        )
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("value_ffill"),
        )
        .orderBy("user_id", "hour")
    )


def time_weighted_value(events: DataFrame) -> DataFrame:
    """Time-weighted average value (TWAP) per user: each event's value
    holds until that user's next event, so the average weights each
    value by its holding duration — the standard time-series summary a
    tick stream (or metering/billing feed) needs, where a plain avg()
    over-weights bursts of rapid events.

    One window shuffle keyed on user_id (lead), then a partial+final
    agg on the same key — Catalyst reuses the partitioning, so the
    whole operator is a single wide exchange. The last event of each
    user has no successor and is excluded (no duration).
    """
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(ts.asc(), F.col("event_id").asc())
    dt_sec = (
        (F.unix_micros(F.lead(ts, 1).over(w)) - F.unix_micros(ts)) / 1e6
    ).alias("dt")
    weighted = events.select("user_id", "event_id", "value", dt_sec).filter(
        F.col("dt").isNotNull()
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt") + F.lit(1e-9), 4
            ).alias("twap"),
            F.round(F.sum("dt") + F.lit(1e-9), 3).alias("total_seconds"),
        )
        .orderBy("user_id")
    )


def event_trigrams(events: DataFrame, *, top_k: int = 20) -> DataFrame:
    """Behavioral sequence mining: the most common 3-event sequences
    (per-user consecutive event-type trigrams) across the stream — the
    funnel-discovery primitive ("what do users DO in what order")
    complementing the fixed-funnel operator.

    Plan: one window shuffle on user_id computes both leads, a map-side
    concat forms the trigram key, then partial+final count and a
    TakeOrderedAndProject for the top-k — no second wide shuffle of the
    fact table (the count shuffles only distinct trigram keys).
    """
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(ts.asc(), F.col("event_id").asc())
    t2 = F.lead("event_type", 1).over(w)
    t3 = F.lead("event_type", 2).over(w)
    tri = (
        events.select(
            F.concat_ws(">", F.col("event_type"), t2, t3).alias("trigram"),
            t3.alias("_t3"),
        )
        .filter(F.col("_t3").isNotNull())
        .drop("_t3")
    )
    return (
        tri.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "trigram")
        .limit(top_k)
    )


def sessionize(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Assign explicit session identifiers by inactivity gap and emit
    per-session facts — the row-level sessionization that the
    ``session_windows`` aggregate summarizes away.  A session breaks
    when the gap to the previous event exceeds ``gap_minutes``; the
    session id is the per-user running count of breaks (gaps-and-
    islands, deterministic tie-break on event_id).

    Scale shape: ONE keyed shuffle.  The lag window, the running-sum
    window, and the per-(user, session) aggregate all share the
    user_id partitioning — Catalyst plans a single Exchange and sorts
    once.  Same discipline as ``time_weighted_value``.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_break = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    ).withColumn(
        "session_seq",
        F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_s"
            ),
        )
        .orderBy("user_id", "session_seq")
    )


def rolling_active_users(events: DataFrame, *, window_days: int = 7) -> DataFrame:
    """Trailing ``window_days``-day distinct active users per day
    (rolling WAU) — the sliding count-distinct that naive window
    functions cannot express without O(n * window) state.

    Scale shape: dedup to (user, day) FIRST (one shuffle whose output
    is calendar-bounded per user), then each user-day fans out
    map-side to the ``window_days`` report days it supports
    (``explode(sequence(...))`` — the standard expansion trick that
    turns sliding distinct into a plain group-by), and the final
    count-distinct groups by report day.  The fan-out multiplies the
    ALREADY-DEDUPED user-day table, never the raw fact.  Report days
    beyond the corpus horizon are trimmed with a broadcast 1-row max.
    """
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    user_days = events.select("user_id", day.alias("day")).distinct()
    horizon = events.select(day.alias("d")).agg(F.max("d").alias("max_day"))
    expanded = user_days.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {window_days - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    return (
        expanded.join(F.broadcast(horizon))
        .filter(F.col("report_day") <= F.col("max_day"))
        .groupBy(F.date_format("report_day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("day")
    )


def scd2_lookup(
    events: DataFrame,
    *,
    probe_type: str = "purchase",
) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 history that
    ``scd2_user_state`` builds: each probe event is joined to the ONE
    state version whose ``[valid_from, valid_to)`` interval contains
    its timestamp — the "what was the customer's state when they
    bought" query that every warehouse dimension exists to answer.

    Scale shape: equi-join on the user key carries the shuffle; the
    interval predicates are post-join filters evaluated inside the
    sort-merge join's per-key block, which is bounded by the user's
    own version count (calendar-bounded), never the corpus.  Because
    SCD2 intervals tile each user's timeline, every probe matches
    exactly one version — row count is the probe count, a free
    invariant check.
    """
    dim = scd2_user_state(events)
    probes = events.filter(F.col("event_type") == probe_type).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return (
        probes.alias("p")
        .join(
            dim.alias("d"),
            (F.col("p.user_id") == F.col("d.user_id"))
            & (F.col("p.ts") >= F.col("d.valid_from"))
            & (F.col("p.ts") < F.col("d.valid_to")),
        )
        .select(
            F.col("p.event_id").alias("event_id"),
            F.col("p.user_id").alias("user_id"),
            F.col("p.ts").alias("ts"),
            F.col("d.state").alias("state_at_event"),
            F.col("d.version").alias("version"),
        )
        .orderBy("event_id")
    )


def ohlc_bars(events: DataFrame, *, value_col: str = "value") -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event type — the
    time-series downsample every metrics store performs.  Open/close
    are ``min_by``/``max_by`` against the (ts, event_id) order key, so
    same-timestamp bursts resolve deterministically on any engine.

    Scale shape: ONE partial+final aggregate on the (type, hour) key —
    min_by/max_by carry a single (key, value) pair of state per group
    map-side, so this is a plain hash aggregate, never a window; the
    bar count is calendar x type bounded, far below the fact size.
    """
    hour = F.date_trunc("hour", F.col("ts").cast("timestamp"))
    okey = F.struct(F.col("ts").cast("timestamp").alias("ts"), F.col("event_id"))
    return (
        events.select(
            "event_type",
            hour.alias("bar_hour"),
            okey.alias("okey"),
            F.col(value_col).alias("v"),
        )
        .groupBy("event_type", "bar_hour")
        .agg(
            F.round(F.min_by("v", "okey") + 1e-9, 4).alias("open"),
            F.round(F.max("v") + 1e-9, 4).alias("high"),
            F.round(F.min("v") + 1e-9, 4).alias("low"),
            F.round(F.max_by("v", "okey") + 1e-9, 4).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "bar_hour")
    )


def session_occupancy(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Hourly session-concurrency curve: how many sessions are OPEN at
    each hour boundary, plus per-hour start/end traffic — capacity /
    occupancy analytics over intervals WITHOUT the quadratic
    interval-overlap pair join (every pair-wise formulation of "which
    sessions overlap" explodes on a busy corpus; the boundary-sweep
    answers the operational questions from +1/-1 deltas alone).

    Scale shape: sessions (one keyed shuffle via :func:`sessionize`),
    then each session emits one +1 row at its start hour and one -1
    row at the hour AFTER its end (end-inclusive semantics) — a
    calendar-bounded aggregate (<= hours-in-corpus rows), over which
    the running-sum window is a bounded-frame scan, the same
    aggregate-then-window discipline as ``distribution_drift_psi``.
    Hours with no boundary events carry the previous concurrency by
    definition and are omitted (gap-fill composes with
    ``resample_events`` when a dense curve is needed).
    """
    sess = sessionize(events, gap_minutes=gap_minutes)
    starts = sess.select(
        F.date_trunc("hour", "session_start").alias("hour"),
        F.lit(1).alias("delta"),
        F.lit(1).alias("is_start"),
        F.lit(0).alias("is_end"),
    )
    ends = sess.select(
        (F.date_trunc("hour", "session_end") + F.expr("INTERVAL 1 HOUR")).alias(
            "hour"
        ),
        F.lit(-1).alias("delta"),
        F.lit(0).alias("is_start"),
        F.lit(1).alias("is_end"),
    )
    per_hour = (
        starts.unionByName(ends)
        .groupBy("hour")
        .agg(
            F.sum("is_start").alias("n_starts"),
            F.sum("is_end").alias("n_ends"),
            F.sum("delta").alias("net"),
        )
    )
    # bounded frame: the window runs over the <= hours-in-corpus
    # aggregate, never the session table
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return per_hour.select(
        "hour",
        "n_starts",
        "n_ends",
        F.sum("net").over(w).alias("open_sessions"),
    ).orderBy("hour")


def touch_attribution(events: DataFrame) -> DataFrame:
    """First- and last-touch purchase attribution: every ``purchase``
    event credits its value to the user's FIRST and LAST preceding
    non-purchase event type (the marketing-analytics classic).

    One per-user window (ordered by ts, event_id; frame = everything
    strictly before the current row) with ``first/last(... ignore
    nulls)`` carries the touch type — no self-join, no per-purchase
    range scan, and the partition key is the user, so the shuffle is
    the same one keyed exchange as any per-user analytic at 100 TB.
    Purchases with no prior touch attribute to ``__NONE__``.

    Returns per touch-type totals for both attribution models
    (bounded by event-type cardinality).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type") != F.lit("purchase")
    touch_type = F.when(is_touch, F.col("event_type"))
    enriched = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.first(touch_type, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch_type, ignorenulls=True).over(w).alias("last_touch"),
    ).where(F.col("event_type") == "purchase")
    first_agg = enriched.groupBy(
        F.coalesce("first_touch", F.lit("__NONE__")).alias("touch_type")
    ).agg(
        F.count(F.lit(1)).alias("n_first"),
        F.round(F.sum("value"), 2).cast("double").alias("value_first"),
    )
    last_agg = enriched.groupBy(
        F.coalesce("last_touch", F.lit("__NONE__")).alias("touch_type")
    ).agg(
        F.count(F.lit(1)).alias("n_last"),
        F.round(F.sum("value"), 2).cast("double").alias("value_last"),
    )
    return (
        first_agg.join(last_agg, "touch_type", "full")
        .select(
            "touch_type",
            F.coalesce("n_first", F.lit(0)).alias("n_first"),
            F.coalesce("value_first", F.lit(0.0)).alias("value_first"),
            F.coalesce("n_last", F.lit(0)).alias("n_last"),
            F.coalesce("value_last", F.lit(0.0)).alias("value_last"),
        )
        .orderBy("touch_type")
    )


def survival_curve(events: DataFrame) -> DataFrame:
    """Kaplan-Meier survival estimate for signup -> first-purchase
    conversion (time-to-event with right censoring — the correct way
    to answer "how long until users convert" when many haven't yet;
    naive conversion averages are biased by exactly those users).

    Per user: duration = days from first ``signup`` to first
    subsequent ``purchase``; users without one are CENSORED at the
    corpus's last timestamp.  At each distinct duration t:

        n_t = users still at risk,  d_t = conversions at t,
        S(t) = prod_{u <= t} (1 - d_u / n_u)
             = exp( sum ln(1 - d_u/n_u) )   [the portable form]

    Scale shape: two per-user aggregations (one keyed shuffle each),
    then everything collapses to the duration axis — windows run over
    at most |distinct days| rows, the calendar-bounded discipline.
    ln/exp keeps the running product a running SUM, which both
    engines evaluate identically; S is rounded at 6 dp.
    """
    su = events.where(F.col("event_type") == "signup").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("signup_ts"))
    pu = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"))
        .join(su, "user_id")
        .where(F.col("pts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("pts").alias("purchase_ts"))
    )
    horizon = events.agg(F.max("ts").alias("max_ts"))  # 1-row scalar
    us_per_day = 86_400_000_000.0

    def _us(c: F.Column) -> F.Column:
        # unix_micros rejects TIMESTAMP_NTZ; loaders pin UTC so the
        # cast is tz-stable (same idiom as event_gaps/sessionize)
        return F.unix_micros(c.cast("timestamp"))

    per_user = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.floor(
                (
                    _us(F.coalesce("purchase_ts", "max_ts"))
                    - _us(F.col("signup_ts"))
                )
                / F.lit(us_per_day)
            )
            .cast("int")
            .alias("duration_days"),
            F.col("purchase_ts").isNotNull().alias("converted"),
        )
    )
    by_t = per_user.groupBy("duration_days").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("d_events"),
        F.count(F.lit(1)).alias("n_ending"),
    )
    w_prev = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = per_user.agg(F.count(F.lit(1)).alias("n_total"))  # 1 row
    return (
        by_t.crossJoin(F.broadcast(total))
        .withColumn(
            "at_risk",
            F.col("n_total")
            - F.coalesce(F.sum("n_ending").over(w_prev), F.lit(0)),
        )
        .withColumn(
            "log_term",
            # floor the ratio at 1e-12: if every at-risk user converts
            # at one time, 1 - d/n = 0 and Spark's ln(0) is NULL while
            # SQL engines give -inf; the floor makes both compute
            # ln(1e-12), which rounds to survival = 0 at 6 dp
            F.log(
                F.greatest(
                    F.lit(1.0)
                    - F.col("d_events") / F.col("at_risk").cast("double"),
                    F.lit(1e-12),
                )
            ),
        )
        .select(
            "duration_days",
            F.col("d_events").cast("bigint").alias("d_events"),
            F.col("n_ending").cast("bigint").alias("n_ending"),
            F.col("at_risk").cast("bigint").alias("at_risk"),
            F.round(
                F.exp(F.sum("log_term").over(w_cum)) + F.lit(1e-9), 6
            ).alias("survival"),
        )
        .orderBy("duration_days")
    )


def ewma_forecast(
    orders: DataFrame, *, alpha: float = 0.3, n_lags: int = 14
) -> DataFrame:
    """One-step-ahead EWMA forecast of daily revenue with a TRUNCATED
    exponential kernel: forecast_t = sum_{k=1..K} w_k * x_{t-k},
    w_k = alpha * (1-alpha)^(k-1) renormalized over the available
    lags — the bounded-memory form of simple exponential smoothing
    (the infinite-history recursion would need pow((1-a), -t) terms
    that overflow; the truncated kernel is what streaming monitors
    actually run).

    The fact table collapses to the daily axis first, the kernel
    unrolls to ``n_lags`` lag() terms with LITERAL weights (pure
    window arithmetic, engine-portable), and each day reports
    forecast, actual, error — plus a __MAE__ summary row of mean
    absolute error over fully-windowed days.
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).cast("double").alias("revenue"))
    w = Window.orderBy("day")
    weights = [alpha * (1 - alpha) ** (k - 1) for k in range(1, n_lags + 1)]
    norm = sum(weights)
    acc = None
    for k, wt in enumerate(weights, start=1):
        term = F.lag("revenue", k).over(w) * F.lit(wt / norm)
        acc = term if acc is None else acc + term
    scored = daily.select(
        "day",
        "revenue",
        F.round(acc + F.lit(1e-9), 4).alias("forecast"),
    ).select(
        "day",
        "revenue",
        "forecast",
        F.round(F.abs(F.col("revenue") - F.col("forecast")) + F.lit(1e-9), 4)
        .alias("abs_error"),
    )
    mae = scored.where(F.col("forecast").isNotNull()).agg(
        F.round(
            F.round(F.sum("abs_error"), 4) / F.count(F.lit(1)) + F.lit(1e-9),
            4,
        ).alias("mae")
    )
    summary = mae.select(
        F.lit(None).cast("timestamp_ntz").alias("day"),
        F.lit(None).cast("double").alias("revenue"),
        F.lit(None).cast("double").alias("forecast"),
        F.col("mae").alias("abs_error"),
    )
    return scored.unionByName(summary).orderBy(
        F.col("day").asc_nulls_last()
    )


def yoy_growth(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Year-over-year revenue growth per nation: one fact aggregation
    to the (nation, year) grid, then lag() over each nation's bounded
    year axis — the contribution-analysis staple.  Growth is null for
    a nation's first year; ratios round after the rounded-sum
    discipline so both engines agree."""
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("yr")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).cast("double").alias("revenue")
        )
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return rev.select(
        "n_name",
        "yr",
        "revenue",
        F.round(prev + F.lit(1e-9), 2).alias("prev_revenue"),
        F.when(
            prev > 0,
            F.round(
                (F.col("revenue") - prev) / prev * F.lit(100.0) + F.lit(1e-9),
                4,
            ),
        ).alias("yoy_pct"),
    ).orderBy("n_name", "yr")


def holt_forecast(orders: DataFrame, *, horizon: int = 7) -> DataFrame:
    """Holt's linear-trend (double) exponential smoothing over daily
    revenue, alpha = beta = 0.5, plus a ``horizon``-step-ahead
    extrapolation — the trend-aware upgrade of ``ewma_forecast``
    (whose flat kernel cannot forecast beyond one step): l_t =
    0.5*y_t + 0.5*(l+b); b_t = 0.5*(l_t - l) + 0.5*b; y-hat_{T+h} =
    l_T + h*b_T.

    Scale + portability (the ``cusum_changepoints`` discipline): the
    fact table collapses to the calendar-bounded day axis (partial+
    final agg, the only wide work), the recurrence runs as ONE JVM
    ``aggregate`` fold over the collected day array, and because
    every op in the recurrence is a single correctly-rounded IEEE
    multiply/add applied in the same order on 2dp-pre-rounded inputs,
    the whole level/trend sequence is bit-identical in any IEEE
    engine — replayed by a recursive-CTE oracle with NO intermediate
    rounding.  Output: in-sample rows (horizon=0, forecast = prior
    l+b, null for the first day) + ``horizon`` future rows with null
    revenue."""
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).cast("double").alias("revenue"))
    day_t = dict(daily.dtypes)["day"]
    acc_t = (
        f"struct<l:double,b:double,n:int,"
        f"out:array<struct<day:{day_t},revenue:double,forecast:double>>>"
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "revenue"))).alias("s")
    )

    def step(acc, v):
        new_l = F.lit(0.5) * v["revenue"] + F.lit(0.5) * (
            acc["l"] + acc["b"]
        )
        return F.when(
            acc["n"] == F.lit(0),
            F.struct(
                v["revenue"].alias("l"),
                F.lit(0.0).alias("b"),
                F.lit(1).alias("n"),
                F.array(
                    F.struct(
                        v["day"].alias("day"),
                        v["revenue"].alias("revenue"),
                        F.lit(None).cast("double").alias("forecast"),
                    )
                ).alias("out"),
            ),
        ).otherwise(
            F.struct(
                new_l.alias("l"),
                (
                    F.lit(0.5) * (new_l - acc["l"]) + F.lit(0.5) * acc["b"]
                ).alias("b"),
                (acc["n"] + F.lit(1)).alias("n"),
                F.array_append(
                    acc["out"],
                    F.struct(
                        v["day"].alias("day"),
                        v["revenue"].alias("revenue"),
                        F.round(acc["l"] + acc["b"] + F.lit(1e-9), 4).alias(
                            "forecast"
                        ),
                    ),
                ).alias("out"),
            )
        )

    folded = series.select(
        F.aggregate(
            "s",
            F.expr(
                f"CAST(named_struct('l', 0.0d, 'b', 0.0d, 'n', 0,"
                f" 'out', array()) AS {acc_t})"
            ),
            step,
        ).alias("st")
    )
    in_sample = folded.select(F.explode("st.out").alias("r")).select(
        "r.day",
        "r.revenue",
        "r.forecast",
        F.lit(0).alias("horizon"),
    )
    future = folded.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, {int(horizon)}), h -> named_struct("
                "'day', timestampadd(DAY, h, element_at(st.out, -1).day),"
                "'revenue', CAST(NULL AS DOUBLE),"
                "'forecast', round(st.l + CAST(h AS DOUBLE) * st.b"
                " + 1e-9, 4),"
                "'horizon', h))"
            )
        ).alias("r")
    ).select("r.day", "r.revenue", "r.forecast", "r.horizon")
    return in_sample.unionByName(future).orderBy("day")


def global_distribution_ranks(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    *,
    ntile_k: int = 4,
    coarse_edges: tuple[float, ...] = (),
) -> DataFrame:
    """ntile / percent_rank / cume_dist over a GLOBAL order without a
    single-partition window (the ``WindowExec: No Partition Defined``
    shape that funnels the whole fact table through one task).

    Mirrors the reference's need for globally-ranked export batches
    (core.clj's single-stream copy implies a total order) but built on
    the ``equi_depth_buckets``/``revenue_gini`` two-phase discipline:

    1. literal ``coarse_edges`` range-bucket the value column (the
       coarse bucket is a PREFIX of the sort key, so coarse order ==
       global order; edge choice balances work, never results);
    2. ``row_number`` ranks within each coarse range in parallel;
    3. broadcast prefix-sum offsets of the tiny per-range count table
       convert within-range ranks to exact global ranks.

    Because ``(value, tiebreak)`` is unique, rank == row_number and the
    distribution functions are pure arithmetic on (rank, total):

    - ``ntile(k)``: first ``n % k`` buckets take ``n div k + 1`` rows
      (the SQL-standard distribution) — bit-identical to the window
      function;
    - ``percent_rank`` = (rank-1)/(total-1)  (0.0 for a 1-row input);
    - ``cume_dist``    = rank/total          (no peer groups).

    Returns ``df``'s rows plus ``quartile`` (ntile bucket), ``pr``,
    ``cd`` — same schema the window-function form would emit.
    """
    edges = list(coarse_edges) or [float(e) for e in range(50_000, 500_000, 50_000)]
    coarse = F.lit(len(edges))
    for i, e in reversed(list(enumerate(edges))):
        coarse = F.when(F.col(value_col) < F.lit(e), F.lit(i)).otherwise(coarse)
    src = df.withColumn("__coarse", coarse)
    within = F.row_number().over(
        Window.partitionBy("__coarse").orderBy(value_col, tiebreak_col)
    )
    counts = src.groupBy("__coarse").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        "__coarse",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__coarse").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__offset"),
        F.sum("__n")
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("__total"),
    )
    ranked = src.withColumn("__within", within).join(F.broadcast(offsets), "__coarse")
    r = F.col("__offset") + F.col("__within")
    n = F.col("__total")
    k = F.lit(int(ntile_k))
    base = (n / k).cast("bigint")
    extra = n % k
    big_span = (base + F.lit(1)) * extra
    bucket = F.when(
        r <= big_span, ((r - 1) / (base + F.lit(1))).cast("bigint") + 1
    ).otherwise(extra + ((r - big_span - 1) / base).cast("bigint") + 1)
    pr = F.when(n > 1, (r - F.lit(1)).cast("double") / (n - F.lit(1))).otherwise(
        F.lit(0.0)
    )
    return ranked.select(
        *df.columns,
        bucket.cast("int").alias("quartile"),
        pr.alias("pr"),
        (r.cast("double") / n).alias("cd"),
    )


def forecast_backtest(
    orders: DataFrame,
    *,
    horizon: int = 7,
    season: int = 7,
) -> DataFrame:
    """Backtest evaluation of the baseline forecasters on daily
    revenue: hold out the LAST ``horizon`` days, forecast them with
    (a) seasonal-naive (value ``season`` days earlier) and (b) naive
    (last training value), and score MAE / sMAPE / MASE — MASE per
    Hyndman & Koehler 2006: MAE scaled by the training one-step
    seasonal-naive MAE, so scores compare across series and a value
    >= 1 means "no better than the trivial seasonal repeat".

    The eval companion of ``ewma_forecast``/``holt_forecast``: those
    produce forecasts, this measures whether a forecaster beats the
    baselines on a true holdout. Everything runs on the calendar-
    bounded day axis (one fact aggregate, lag windows over the bounded
    frame, three 1-row scalar broadcasts), so the plan is day-count-
    sized regardless of corpus size.
    """
    if horizon > season:
        # the seasonal-naive arm is lag(rev, season) over the FULL
        # series: with horizon > season a later holdout day's
        # "forecast" would be an earlier HOLDOUT day's actual value —
        # silent test-set leakage that inflates the baseline score
        raise ValueError(
            f"horizon ({horizon}) must be <= season ({season}): the "
            f"seasonal-naive baseline would forecast holdout days from "
            f"other holdout days (test-set leakage)"
        )
    w = Window.orderBy("i")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    d = daily.withColumn(
        "i", F.row_number().over(Window.orderBy("day"))
    ).withColumn("sn", F.lag("rev", season).over(w))
    scalars = d.agg(
        F.max("i").alias("n"),
    )
    d2 = d.crossJoin(F.broadcast(scalars)).withColumn(
        "cutoff", F.col("n") - F.lit(horizon)
    )
    naive_val = d2.filter(F.col("i") == F.col("cutoff")).agg(
        F.max("rev").alias("naive_f")
    )
    denom = d2.filter(
        (F.col("i") > season) & (F.col("i") <= F.col("cutoff"))
    ).agg(
        (F.sum(F.abs(F.col("rev") - F.col("sn"))) / F.count(F.lit(1))).alias(
            "mase_denom"
        )
    )
    test = (
        d2.filter(F.col("i") > F.col("cutoff"))
        .crossJoin(F.broadcast(naive_val))
        .crossJoin(F.broadcast(denom))
    )
    arms = test.select(
        "rev",
        "mase_denom",
        F.explode(
            F.array(
                F.struct(F.lit("naive").alias("model"), F.col("naive_f").alias("f")),
                F.struct(F.lit("seasonal_naive").alias("model"), F.col("sn").alias("f")),
            )
        ).alias("m"),
    ).select("rev", "mase_denom", F.col("m.model").alias("model"), F.col("m.f").alias("f"))
    err = F.abs(F.col("f") - F.col("rev"))
    return (
        arms.groupBy("model")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.sum(err) / F.count(F.lit(1)) + 1e-9, 4).alias("mae"),
            F.round(
                F.sum(
                    F.lit(2.0) * err / (F.abs(F.col("f")) + F.abs(F.col("rev")))
                )
                / F.count(F.lit(1))
                + 1e-9,
                4,
            ).alias("smape"),
            F.round(
                (F.sum(err) / F.count(F.lit(1))) / F.max("mase_denom") + 1e-9, 4
            ).alias("mase"),
        )
        .orderBy("model")
    )


def seasonal_decompose(orders: DataFrame, *, period: int = 7) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue:
    ``rev = trend + seasonal + residual`` with a centered
    ``period``-day moving-average trend, mean-zero day-of-week seasonal
    components, and the residual as the anomaly signal — the baseline
    every revenue-anomaly monitor subtracts before thresholding.

    Scale shape: ONE fact aggregate to the calendar-bounded day axis;
    every window after that runs on the bounded frame (passes the
    unpartitioned-window audit structurally). Edge days without a full
    centered window carry null trend/residual — honest, not
    extrapolated.

    ``period`` must be odd: the centered ``rowsBetween(-half, half)``
    frame holds exactly ``period`` rows only then. An even period needs
    the classical 2xMA (half-weighted endpoints) — with this frame it
    would hold ``period + 1`` rows, the count guard would never fire,
    and trend/residual would silently come back all-null."""
    if period % 2 == 0:
        raise ValueError(
            f"period must be odd for the centered moving average; got "
            f"{period} (even periods need a 2xMA trend, not supported)"
        )
    half = period // 2
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-half, half)
    d = daily.withColumn(
        "trend",
        F.when(
            F.count(F.lit(1)).over(w) == period,
            F.round(F.avg("rev").over(w) + F.lit(1e-9), 4),
        ),
    ).withColumn("dow", F.dayofweek("day") - F.lit(1))
    detrended = F.col("rev") - F.col("trend")
    d = d.withColumn(
        "seasonal_raw",
        F.avg(detrended).over(Window.partitionBy("dow")),
    )
    # mean-zero normalization over the bounded dow axis
    d = d.withColumn(
        "seasonal",
        F.round(
            F.col("seasonal_raw")
            - F.avg("seasonal_raw").over(Window.partitionBy())
            + F.lit(1e-9),
            4,
        ),
    )
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev",
        "trend",
        "seasonal",
        F.round(
            F.col("rev") - F.col("trend") - F.col("seasonal") + F.lit(1e-9), 4
        ).alias("residual"),
    ).orderBy("day")


def revenue_autocorrelation(orders: DataFrame, *, max_lag: int = 14) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..max_lag —
    the diagnostic read BEFORE picking a seasonal period (a weekly
    cycle shows as peaks at 7 and 14) or an AR forecaster's order;
    the companion ``seasonal_decompose`` ASSUMES period=7, this is the
    plot that justifies it.

    Pearson r at lag k over the aligned pairs (x_t, x_{t+k}) — the
    sample-overlap convention, so each lag's correlation is computed
    on exactly the pairs both engines can enumerate (no circular wrap,
    no global-mean plug-in), making the DuckDB mirror a literal
    lag-k self-join.

    Scale shape: ONE fact aggregate to the calendar-bounded day axis
    (same discipline as ``seasonal_decompose``); the lag alignment and
    the max_lag-group aggregate run on that bounded frame — nothing
    here grows with the fact table beyond the first agg."""
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = Window.orderBy("day")
    # window pass first, generator second: Spark disallows a window
    # expression inside the same projection as explode()
    shifted = daily.select(
        "rev",
        *[F.lag("rev", k).over(w).alias(f"prev_{k}") for k in range(1, max_lag + 1)],
    )
    lagged = shifted.select(
        "rev",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("lag"),
                        F.col(f"prev_{k}").alias("prev"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("lp"),
    ).select("rev", "lp.lag", "lp.prev")
    return (
        lagged.filter(F.col("prev").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.corr("rev", "prev") + F.lit(1e-9), 6).alias("acf"),
        )
        .orderBy("lag")
    )


def theil_sen_trend(orders: DataFrame, *, max_span: int = 30) -> DataFrame:
    """Theil-Sen trend of daily revenue: the MEDIAN of pairwise slopes
    (rev_j - rev_i) / (t_j - t_i) over day pairs at most ``max_span``
    apart — the robust alternative to the OLS slope (``groupwise_ols``
    family) that one promotional spike or outage day cannot drag. The
    span bound is the estimator's scale contract: slopes come from
    O(days x max_span) LOCAL pairs, not the O(days^2) all-pairs
    classic, and short-range pairs are exactly the ones that carry
    trend information on a long series.

    Shape: one fact aggregate to the bounded day axis; the pair join
    block-buckets the day index (t div max_span, probe own + next
    block — the sorted-neighborhood trick on the time axis) so no
    quadratic shape exists even on a decades-long axis. One global
    median over the bounded slope set."""
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    di = daily.join(F.broadcast(d0)).select(
        F.datediff("day", "d0").alias("t"), "rev"
    )
    blk = F.floor(F.col("t") / F.lit(max_span))
    left = di.select(
        F.col("t").alias("ta"),
        F.col("rev").alias("va"),
        F.explode(F.array(blk, blk + 1)).alias("__blk"),
    )
    right = di.select(
        F.col("t").alias("tb"), F.col("rev").alias("vb"), blk.alias("__blk")
    )
    slopes = (
        left.join(right, "__blk")
        .filter((F.col("tb") > F.col("ta")) & (F.col("tb") <= F.col("ta") + max_span))
        .select(((F.col("vb") - F.col("va")) / (F.col("tb") - F.col("ta"))).alias("slope"))
    )
    return slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.median("slope") + F.lit(1e-9), 4).alias("slope_per_day"),
    )


