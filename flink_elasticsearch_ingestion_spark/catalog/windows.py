"""Catalog family: event-time + analytic windows, as-of join, forecasting, sessionization.

Each query (QUERIES) sits next to its DuckDB oracle (ORACLES) so
the pair is reviewed and edited together — drift between the
Spark plan and the SQL twin stays visible in one diff."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import (
    relational as R,
    windows as W,
)
from flink_elasticsearch_ingestion_spark.operators.asof import as_of_join
from flink_elasticsearch_ingestion_spark.catalog._shared import (
    _t,
    _ewma_terms_sql,
)


def q_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_event_windows(_t(spark, sf_dir, "events"))

def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.session_windows(_t(spark, sf_dir, "events"))

def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sliding_event_windows(_t(spark, sf_dir, "events"))

def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.event_gaps(_t(spark, sf_dir, "events"))

def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.funnel_counts(_t(spark, sf_dir, "events"))

def q_event_gaps_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas path; same oracle as event_gaps, so
    the pandas and expression implementations must agree exactly."""
    return W.event_gaps_pandas(_t(spark, sf_dir, "events"))

def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.running_revenue(_t(spark, sf_dir, "orders"))

def q_order_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded window frame (rowsBetween 3 preceding .. current): 4-order
    moving average of each customer's spend, ordered by date."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.round(F.sum("o_totalprice").over(w), 2) / F.count(F.lit(1)).over(w) + 1e-9, 4).alias(
            "moving_avg"
        ),
    ).orderBy("o_custkey", "o_orderkey")

def q_next_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.next_event_type(_t(spark, sf_dir, "events"))

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the customer's latest order at
    or before the event time. Right side pre-aggregated to one row per
    (custkey, date) so the match is deterministic."""
    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_total"))
    )
    out = as_of_join(
        events, orders, on_left="user_id", on_right="o_custkey",
        left_ts="ts", right_ts="o_orderdate", payload_cols=["day_total"],
    )
    return out.select("event_id", "user_id", "ts", "day_total", "matched_ts").orderBy("event_id")

def q_price_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    over a deterministic (tie-broken) global order, quartile summary so
    the result stays small at any SF.  Built on the two-phase
    ``global_distribution_ranks`` operator (coarse literal ranges +
    broadcast prefix offsets) so NO single-partition window ever sees
    the orders table — bit-identical to the ntile/percent_rank/
    cume_dist window functions the oracle runs."""
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        global_distribution_ranks,
    )

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_distribution_ranks(
        orders, "o_totalprice", "o_orderkey", ntile_k=4
    )
    return (
        ranked.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.max("pr"), 6).alias("max_percent_rank"),
            F.round(F.max("cd"), 6).alias("max_cume_dist"),
        )
        .orderBy("quartile")
    )

def q_event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total per event type: group counts divided by a window
    total (no second scan, no collect)."""
    from pyspark.sql import Window

    events = _t(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    total = F.sum("n_events").over(Window.partitionBy())
    return counts.select(
        "event_type",
        "n_events",
        F.round(F.col("n_events") / total + 1e-9, 6).alias("share"),
    ).orderBy("event_type")

def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch purchase attribution via one per-user window
    (frame = strictly-before rows, first/last ignore-nulls carry) —
    no self-join, bounded touch-type output."""
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        touch_attribution,
    )

    return touch_attribution(_t(spark, sf_dir, "events"))

def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (alpha=beta=0.5) over daily
    revenue + 7-day-ahead extrapolation: fact table collapses to the
    calendar-bounded day axis, recurrence runs as ONE JVM aggregate
    fold whose IEEE op sequence replays exactly in a recursive-CTE
    oracle (no intermediate rounding needed)."""
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        holt_forecast,
    )

    return holt_forecast(_t(spark, sf_dir, "orders"), horizon=7)

def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: one fact agg to the
    (nation, year) grid, lag over the bounded year axis."""
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        yoy_growth,
    )

    return yoy_growth(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
    )

def q_ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead EWMA revenue forecast (truncated 14-lag
    exponential kernel, literal renormalized weights) + __MAE__
    summary; windows only over the bounded daily axis."""
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        ewma_forecast,
    )

    return ewma_forecast(_t(spark, sf_dir, "orders"))

def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the
    exact rank formula, global ranks built two-phase (coarse literal
    buckets + broadcast prefix offsets) — no single-partition window
    over the customer axis."""
    return R.revenue_gini(_t(spark, sf_dir, "orders"))

def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier signup -> first-purchase conversion curve with
    right censoring at the corpus horizon: two per-user aggs, then
    calendar-bounded windows over the duration axis; the running
    product runs as exp(sum(ln)) for engine portability."""
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        survival_curve,
    )

    return survival_curve(_t(spark, sf_dir, "events"))

def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation by broadcast quantile thresholds (exact
    percentile sketch at max accuracy, recency scored inversely):
    one fact agg + map-side scoring, no global-window NTILE; bounded
    <= 125-row segment summary."""
    return R.rfm_segments(_t(spark, sf_dir, "orders"))

def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.revenue_forecast(_t(spark, sf_dir, "lineitem"))

def q_trailing_revenue_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.trailing_revenue_window(_t(spark, sf_dir, "orders"))

def q_prior_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.prior_event_counts_cogroup(
        _t(spark, sf_dir, "events"), _t(spark, sf_dir, "orders")
    )

def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.scd2_user_state(_t(spark, sf_dir, "events"))

def q_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.time_weighted_value(_t(spark, sf_dir, "events"))

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.cohort_retention(_t(spark, sf_dir, "events"))

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sessionization: 30-min inactivity gap, session ids."""
    return W.sessionize(_t(spark, sf_dir, "events"))

def q_session_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly open-session concurrency curve via boundary sweep
    (+1/-1 deltas, bounded-frame running sum over the hour aggregate)
    — interval-overlap analytics without a quadratic pair join."""
    return W.session_occupancy(_t(spark, sf_dir, "events"))

def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day."""
    return W.rolling_active_users(_t(spark, sf_dir, "events"))

def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type (min_by/max_by, one hash agg)."""
    return W.ohlc_bars(_t(spark, sf_dir, "events"))

def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 dimension lookup for purchase events."""
    return W.scd2_lookup(_t(spark, sf_dir, "events"))

def q_resample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.resample_events_hourly(_t(spark, sf_dir, "events"))

def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style sole-late-supplier attribution — the double
    EXISTS/NOT-EXISTS pattern reformulated as ONE aggregate pass per
    order (distinct vs distinct-late supplier counts), shuffling
    lineitem once instead of self-joining it twice."""
    return R.waiting_suppliers(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "supplier"),
    )

def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout backtest of the baseline forecasters (naive vs
    seasonal-naive) on daily revenue with MAE / sMAPE / MASE — the eval
    companion of ewma/holt: measures whether a forecaster beats the
    trivial repeats on a true holdout. Day-axis bounded."""
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        forecast_backtest,
    )

    return forecast_backtest(_t(spark, sf_dir, "orders"))


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue (centered
    7-day MA trend, mean-zero day-of-week seasonals, residual anomaly
    signal) — all windows on the calendar-bounded day axis after one
    fact aggregate."""
    return W.seasonal_decompose(_t(spark, sf_dir, "orders"))


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (Theil-Sen) daily-revenue trend: median of pairwise
    slopes over day pairs <= 30 apart — block-bucketed on the time
    axis, so O(days x span) local pairs, never all-pairs."""
    return W.theil_sen_trend(_t(spark, sf_dir, "orders"))


def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF of daily revenue at lags 1..14 — the period-selection
    diagnostic that justifies seasonal_decompose's period=7. One fact
    aggregate to the bounded day axis, then lag alignment + a 14-group
    Pearson aggregate on that small frame."""
    return W.revenue_autocorrelation(_t(spark, sf_dir, "orders"))



#: driver-contract queries owned by this family (names are the
#: catalog keys the driver and the oracle gate use verbatim)
QUERIES = {
    "seasonal_decompose": q_seasonal_decompose,
    "autocorrelation": q_autocorrelation,
    "theil_sen_trend": q_theil_sen_trend,
    "event_type_share": q_event_type_share,
    "time_weighted_value": q_time_weighted_value,
    "cohort_retention": q_cohort_retention,
    "sessionize": q_sessionize,
    "rolling_wau": q_rolling_wau,
    "scd2_lookup": q_scd2_lookup,
    "ohlc_bars": q_ohlc_bars,
    "session_occupancy": q_session_occupancy,
    "rfm_segments": q_rfm_segments,
    "touch_attribution": q_touch_attribution,
    "survival_curve": q_survival_curve,
    "revenue_gini": q_revenue_gini,
    "ewma_forecast": q_ewma_forecast,
    "yoy_growth": q_yoy_growth,
    "holt_forecast": q_holt_forecast,
    "forecast_backtest": q_forecast_backtest,
    "waiting_suppliers": q_waiting_suppliers,
    "revenue_forecast": q_revenue_forecast,
    "sliding_windows": q_sliding_windows,
    "trailing_revenue_window": q_trailing_revenue_window,
    "prior_event_counts": q_prior_event_counts,
    "scd2_user_state": q_scd2_user_state,
    "resample_events": q_resample_events,
    "tumbling_windows": q_tumbling_windows,
    "session_windows": q_session_windows,
    "event_gaps": q_event_gaps,
    "funnel": q_funnel,
    "event_gaps_pandas": q_event_gaps_pandas,
    "running_revenue": q_running_revenue,
    "order_moving_avg": q_order_moving_avg,
    "next_event_type": q_next_event_type,
    "asof_join": q_asof_join,
    "price_rank_distribution": q_price_rank_distribution,
}

#: DuckDB oracle per query — keys MUST be a subset of QUERIES
ORACLES = {
    "theil_sen_trend": (
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,"
        "  round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS rev"
        "  FROM orders GROUP BY 1),"
        " d0 AS (SELECT min(day) AS d0 FROM daily),"
        " di AS (SELECT date_diff('day', d0, day) AS t, rev"
        "  FROM daily CROSS JOIN d0),"
        " slopes AS (SELECT (b.rev - a.rev) / (b.t - a.t) AS slope"
        "  FROM di a JOIN di b ON b.t > a.t AND b.t <= a.t + 30)"
        " SELECT CAST(count(*) AS BIGINT) AS n_pairs,"
        "  round(median(slope) + 1e-9, 4) AS slope_per_day FROM slopes"
    ),
    "autocorrelation": (
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,"
        "  round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS rev"
        "  FROM orders GROUP BY 1),"
        " rn AS (SELECT rev, row_number() OVER (ORDER BY day) AS r"
        "  FROM daily)"
        " SELECT CAST(ks.k AS INTEGER) AS lag,"
        "  CAST(count(*) AS BIGINT) AS n_pairs,"
        "  round(corr(b.rev, a.rev) + 1e-9, 6) AS acf"
        " FROM generate_series(1, 14) AS ks(k)"
        " JOIN rn a ON TRUE JOIN rn b ON b.r = a.r + ks.k"
        " GROUP BY 1 ORDER BY 1"
    ),
    "seasonal_decompose": (
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,"
        "  round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS rev"
        "  FROM orders GROUP BY 1),"
        " t AS (SELECT day, rev,"
        "  CASE WHEN count(*) OVER w7 = 7"
        "   THEN round(avg(rev) OVER w7 + 1e-9, 4) END AS trend,"
        "  CAST(date_part('dow', day) AS INTEGER) AS dow"
        "  FROM daily WINDOW w7 AS"
        "   (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),"
        " s AS (SELECT *,"
        "  avg(rev - trend) OVER (PARTITION BY dow) AS seasonal_raw FROM t),"
        " n AS (SELECT *, round(seasonal_raw - avg(seasonal_raw) OVER ()"
        "   + 1e-9, 4) AS seasonal FROM s)"
        " SELECT strftime(day, '%Y-%m-%d') AS day, rev, trend, seasonal,"
        "  round(rev - trend - seasonal + 1e-9, 4) AS residual"
        " FROM n ORDER BY day"
    ),
    "tumbling_windows": (
        "SELECT time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,"
        " event_type, count(*) AS n_events,"
        " round(round(sum(value), 2) / count(*) + 1e-9, 4) AS avg_value"
        " FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"
    ),
    "session_windows": (
        "WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),"
        " flagged AS (SELECT user_id, ts,"
        "  CASE WHEN lag(ts) OVER w IS NULL"
        "   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess"
        "  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),"
        " sess AS (SELECT user_id, ts, sum(new_sess) OVER"
        "  (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM flagged)"
        " SELECT user_id, min(ts) AS session_start, count(*) AS n_events"
        " FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start"
    ),
    "event_gaps": (
        "WITH g AS (SELECT user_id,"
        "  epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)))"
        "   OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us"
        " FROM events)"
        " SELECT user_id, count(*) AS n_gaps,"
        " CAST(floor(sum(gap_us) / 1000000) AS BIGINT) AS total_gap_s,"
        " CAST(floor(max(gap_us) / 1000000) AS BIGINT) AS max_gap_s"
        " FROM g WHERE gap_us IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ),
    "funnel": (
        "WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),"
        " fv AS (SELECT user_id, min(ts) AS t_view FROM e"
        "   WHERE event_type = 'view' GROUP BY user_id),"
        " fc AS (SELECT e.user_id, min(e.ts) AS t_click FROM e JOIN fv USING (user_id)"
        "   WHERE e.event_type = 'click' AND e.ts > fv.t_view GROUP BY e.user_id),"
        " fp AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM e JOIN fc USING (user_id)"
        "   WHERE e.event_type = 'purchase' AND e.ts > fc.t_click GROUP BY e.user_id)"
        " SELECT '1_view' AS stage, count(*) AS n_users FROM fv"
        " UNION ALL SELECT '2_click_after_view', count(*) FROM fc"
        " UNION ALL SELECT '3_purchase_after_click', count(*) FROM fp"
        " ORDER BY stage"
    ),
    "event_gaps_pandas": (
        "WITH g AS (SELECT user_id,"
        "  epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)))"
        "   OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us"
        " FROM events)"
        " SELECT user_id, count(*) AS n_gaps,"
        " CAST(floor(sum(gap_us) / 1000000) AS BIGINT) AS total_gap_s,"
        " CAST(floor(max(gap_us) / 1000000) AS BIGINT) AS max_gap_s"
        " FROM g WHERE gap_us IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ),
    "running_revenue": (
        "SELECT o_custkey, o_orderkey,"
        " round(sum(o_totalprice) OVER (PARTITION BY o_custkey"
        "  ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS running_total,"
        " CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"
        "  AS INTEGER) AS order_seq"
        " FROM orders"
    ),
    "order_moving_avg": (
        "SELECT o_custkey, o_orderkey,"
        " round(round(sum(o_totalprice) OVER w, 2) / count(*) OVER w + 1e-9, 4)"
        "  AS moving_avg"
        " FROM orders"
        " WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        "  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " ORDER BY o_custkey, o_orderkey"
    ),
    "next_event_type": (
        "WITH nxt AS (SELECT event_type, lead(event_type) OVER"
        " (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type"
        " FROM events)"
        " SELECT event_type, next_type, count(*) AS n_transitions FROM nxt"
        " WHERE next_type IS NOT NULL GROUP BY event_type, next_type"
        " ORDER BY event_type, next_type"
    ),
    "asof_join": (
        "WITH day_orders AS (SELECT o_custkey, o_orderdate,"
        "  round(sum(o_totalprice), 2) AS day_total FROM orders"
        "  GROUP BY o_custkey, o_orderdate),"
        " e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)"
        " SELECT e.event_id, e.user_id, e.ts, d.day_total,"
        "  d.o_orderdate AS matched_ts"
        " FROM e ASOF LEFT JOIN day_orders d"
        "  ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate"
        " ORDER BY event_id"
    ),
    "price_rank_distribution": (
        "WITH ranked AS (SELECT o_orderkey, o_totalprice,"
        "  ntile(4) OVER w AS quartile,"
        "  percent_rank() OVER w AS pr,"
        "  cume_dist() OVER w AS cd"
        "  FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey))"
        " SELECT quartile, count(*) AS n_orders,"
        " round(min(o_totalprice), 2) AS min_price,"
        " round(max(o_totalprice), 2) AS max_price,"
        " round(max(pr), 6) AS max_percent_rank,"
        " round(max(cd), 6) AS max_cume_dist"
        " FROM ranked GROUP BY quartile ORDER BY quartile"
    ),
    "event_type_share": (
        "WITH c AS (SELECT event_type, count(*) AS n_events FROM events"
        "  GROUP BY event_type)"
        " SELECT event_type, n_events,"
        " round(n_events / (SELECT sum(n_events) FROM c) + 1e-9, 6) AS share"
        " FROM c ORDER BY event_type"
    ),
    "revenue_forecast": (
        "SELECT round(sum(l_extendedprice * l_discount), 2) AS forecast_revenue,"
        " count(*) AS n_lineitems FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
        " AND l_shipdate < TIMESTAMP '1997-01-01'"
        " AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
    ),
    "sliding_windows": (
        # each event lands in width/slide = 2 overlapping windows:
        # the slide-aligned bucket and the one slide earlier
        "WITH w AS (SELECT"
        "  time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP))"
        "   - k * INTERVAL 30 MINUTE AS window_start,"
        "  event_type, value"
        "  FROM events, (SELECT unnest([0, 1]) AS k))"
        " SELECT window_start, event_type, count(*) AS n_events,"
        " round(round(sum(value), 2) / count(*) + 1e-9, 4) AS avg_value"
        " FROM w GROUP BY 1, 2 ORDER BY window_start, event_type"
    ),
    "trailing_revenue_window": (
        "SELECT o_orderkey, o_custkey, o_orderdate,"
        " round(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w,"
        "  0) AS DOUBLE), 2) AS trailing_revenue,"
        " CAST(count(*) OVER w AS INT) AS n_trailing_orders"
        " FROM orders"
        " WINDOW w AS (PARTITION BY o_custkey"
        "  ORDER BY CAST(epoch(o_orderdate) AS BIGINT)"
        "  RANGE BETWEEN 2592000 PRECEDING AND 1 PRECEDING)"
        " ORDER BY o_orderkey"
    ),
    "prior_event_counts": (
        "SELECT o.o_orderkey, o.o_custkey, count(e.event_id) AS n_prior_events"
        " FROM orders o LEFT JOIN events e"
        " ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) < o.o_orderdate"
        " GROUP BY 1, 2 ORDER BY o_orderkey"
    ),
    "waiting_suppliers": (
        "WITH lo AS (SELECT l.l_orderkey, l.l_suppkey,"
        "  l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late"
        "  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        "  WHERE o.o_orderstatus = 'F'),"
        " per_order AS (SELECT l_orderkey,"
        "  count(DISTINCT l_suppkey) AS n_supps,"
        "  count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,"
        "  max(CASE WHEN late THEN l_suppkey END) AS late_supp"
        "  FROM lo GROUP BY l_orderkey),"
        " waits AS (SELECT late_supp, CAST(count(*) AS BIGINT) AS numwait"
        "  FROM per_order WHERE n_supps >= 2 AND n_late = 1"
        "  GROUP BY late_supp)"
        " SELECT s.s_name, w.numwait FROM waits w"
        " JOIN supplier s ON w.late_supp = s.s_suppkey"
        " ORDER BY w.numwait DESC, s.s_name LIMIT 20"
    ),
    "forecast_backtest": (
        "WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,"
        "  round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1),"
        " d AS (SELECT day, rev,"
        "  row_number() OVER (ORDER BY day) AS i,"
        "  lag(rev, 7) OVER (ORDER BY day) AS sn FROM daily),"
        " s AS (SELECT max(i) AS n FROM d),"
        " d2 AS (SELECT d.*, s.n - 7 AS cutoff FROM d CROSS JOIN s),"
        " nv AS (SELECT max(rev) AS naive_f FROM d2 WHERE i = cutoff),"
        " dn AS (SELECT sum(abs(rev - sn)) / count(*) AS mase_denom"
        "  FROM d2 WHERE i > 7 AND i <= cutoff),"
        " test AS (SELECT d2.rev, d2.sn, nv.naive_f, dn.mase_denom"
        "  FROM d2 CROSS JOIN nv CROSS JOIN dn WHERE d2.i > d2.cutoff),"
        " arms AS ("
        "  SELECT 'naive' AS model, rev, naive_f AS f, mase_denom FROM test"
        "  UNION ALL"
        "  SELECT 'seasonal_naive', rev, sn, mase_denom FROM test)"
        " SELECT model, CAST(count(*) AS BIGINT) AS n_days,"
        "  round(sum(abs(f - rev)) / count(*) + 1e-9, 4) AS mae,"
        "  round(sum(2.0 * abs(f - rev) / (abs(f) + abs(rev)))"
        "   / count(*) + 1e-9, 4) AS smape,"
        "  round((sum(abs(f - rev)) / count(*)) / max(mase_denom)"
        "   + 1e-9, 4) AS mase"
        " FROM arms GROUP BY model ORDER BY model"
    ),
    "scd2_user_state": (
        "WITH marked AS (SELECT user_id, event_type, ts, event_id,"
        "   (lag(event_type) OVER w IS NULL"
        "    OR lag(event_type) OVER w <> event_type) AS chg"
        "   FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
        " starts AS (SELECT * FROM marked WHERE chg)"
        " SELECT user_id, event_type AS state, ts AS valid_from,"
        "  coalesce(lead(ts) OVER w2, TIMESTAMP '2200-01-01 00:00:00') AS valid_to,"
        "  CAST(row_number() OVER w2 AS INT) AS version"
        " FROM starts WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)"
        " ORDER BY user_id, version"
    ),
    "time_weighted_value": (
        "WITH o AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,"
        "  value FROM events),"
        " g AS (SELECT user_id, value,"
        "  date_diff('us', ts, lead(ts) OVER ("
        "   PARTITION BY user_id ORDER BY ts, event_id)) / 1e6 AS dt FROM o)"
        " SELECT user_id, count(*) AS n_intervals,"
        " round(sum(value * dt) / sum(dt) + 1e-9, 4) AS twap,"
        " round(sum(dt) + 1e-9, 3) AS total_seconds"
        " FROM g WHERE dt IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ),
    "cohort_retention": (
        "WITH uw AS (SELECT DISTINCT user_id,"
        "  date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),"
        " f AS (SELECT user_id, wk,"
        "  min(wk) OVER (PARTITION BY user_id) AS cw FROM uw)"
        " SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,"
        " CAST(date_diff('day', cw, wk) / 7 AS INTEGER) AS week_offset,"
        " count(DISTINCT user_id) AS n_users"
        " FROM f GROUP BY 1, 2 ORDER BY cohort_week, week_offset"
    ),
    "sessionize": (
        "WITH o AS (SELECT user_id, event_id,"
        "  CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),"
        " g AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL OR"
        "  date_diff('second', lag(ts) OVER w, ts) > 1800"
        "  THEN 1 ELSE 0 END AS brk FROM o"
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
        " s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id"
        "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)"
        "  AS session_seq FROM g)"
        " SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,"
        " min(ts) AS session_start, max(ts) AS session_end,"
        " count(*) AS n_events,"
        " CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,"
        " CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)"
        "  AS duration_s"
        " FROM s GROUP BY user_id, session_seq"
        " ORDER BY user_id, session_seq"
    ),
    "holt_forecast": (
        "WITH RECURSIVE daily AS MATERIALIZED (SELECT day, revenue,"
        "  CAST(row_number() OVER (ORDER BY day) AS INT) AS t FROM"
        "  (SELECT date_trunc('day', o_orderdate) AS day,"
        "   CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue"
        "   FROM orders GROUP BY 1)),"
        " rec(t, l, b) AS ("
        "  SELECT 1, revenue, CAST(0.0 AS DOUBLE) FROM daily"
        "   WHERE t = 1"
        "  UNION ALL"
        "  SELECT d.t, 0.5 * d.revenue + 0.5 * (rec.l + rec.b),"
        "   0.5 * ((0.5 * d.revenue + 0.5 * (rec.l + rec.b)) - rec.l)"
        "   + 0.5 * rec.b"
        "  FROM rec JOIN daily d ON d.t = rec.t + 1),"
        " ins AS (SELECT d.day, d.revenue,"
        "  CASE WHEN d.t = 1 THEN NULL"
        "   ELSE round(p.l + p.b + 1e-9, 4) END AS forecast,"
        "  CAST(0 AS INT) AS horizon"
        "  FROM daily d LEFT JOIN rec p ON p.t = d.t - 1),"
        " fin AS (SELECT l, b FROM rec"
        "  WHERE t = (SELECT max(t) FROM daily)),"
        " fut AS (SELECT"
        "  (SELECT max(day) FROM daily) + INTERVAL (g.h) DAY AS day,"
        "  CAST(NULL AS DOUBLE) AS revenue,"
        "  round(fin.l + CAST(g.h AS DOUBLE) * fin.b + 1e-9, 4)"
        "   AS forecast, CAST(g.h AS INT) AS horizon"
        "  FROM generate_series(1, 7) g(h), fin)"
        " SELECT * FROM (SELECT * FROM ins UNION ALL"
        "  SELECT * FROM fut) ORDER BY day"
    ),
    "yoy_growth": (
        "WITH rev AS (SELECT n_name,"
        "  CAST(year(o_orderdate) AS INT) AS yr,"
        "  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue"
        "  FROM orders JOIN customer ON o_custkey = c_custkey"
        "  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2)"
        " SELECT n_name, yr, revenue,"
        " round(lag(revenue) OVER w + 1e-9, 2) AS prev_revenue,"
        " CASE WHEN lag(revenue) OVER w > 0 THEN"
        "  round((revenue - lag(revenue) OVER w)"
        "   / lag(revenue) OVER w * 100.0 + 1e-9, 4) END AS yoy_pct"
        " FROM rev WINDOW w AS (PARTITION BY n_name ORDER BY yr)"
        " ORDER BY n_name, yr"
    ),
    "ewma_forecast": (
        "WITH daily AS (SELECT date_trunc('day', o_orderdate)"
        "  AS day, CAST(round(sum(o_totalprice), 2) AS DOUBLE)"
        "  AS revenue FROM orders GROUP BY 1),"
        " sc AS (SELECT day, revenue,"
        "  round(" + _ewma_terms_sql() + " + 1e-9, 4) AS forecast"
        "  FROM daily WINDOW w AS (ORDER BY day)),"
        " sc2 AS (SELECT day, revenue, forecast,"
        "  round(abs(revenue - forecast) + 1e-9, 4) AS abs_error"
        "  FROM sc),"
        " m AS (SELECT round(CAST(round(sum(abs_error), 4)"
        "   AS DOUBLE) / count(*) + 1e-9, 4) AS mae FROM sc2"
        "  WHERE forecast IS NOT NULL)"
        " SELECT * FROM (SELECT day, revenue, forecast, abs_error"
        "  FROM sc2 UNION ALL SELECT NULL, NULL, NULL, mae FROM m)"
        " ORDER BY day NULLS LAST"
    ),
    "revenue_gini": (
        "WITH pc AS (SELECT o_custkey,"
        "  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS rev"
        "  FROM orders GROUP BY 1),"
        " r AS (SELECT rev, row_number() OVER ("
        "  ORDER BY rev, o_custkey) AS rk FROM pc)"
        " SELECT CAST(count(*) AS BIGINT) AS n_customers,"
        " round(sum(rev), 2) AS total_revenue,"
        " round(2.0 * sum(rk * rev) / (count(*) * sum(rev))"
        "  - (count(*) + 1.0) / count(*) + 1e-9, 6) AS gini"
        " FROM r"
    ),
    "survival_curve": (
        "WITH su AS (SELECT user_id, min(ts) AS signup_ts"
        "  FROM events WHERE event_type = 'signup'"
        "  GROUP BY user_id),"
        " pu AS (SELECT e.user_id, min(e.ts) AS purchase_ts"
        "  FROM events e JOIN su ON su.user_id = e.user_id"
        "  WHERE e.event_type = 'purchase'"
        "   AND e.ts >= su.signup_ts GROUP BY e.user_id),"
        " h AS (SELECT max(ts) AS max_ts FROM events),"
        " per_user AS (SELECT su.user_id,"
        "  CAST(floor((epoch_us(COALESCE(pu.purchase_ts, h.max_ts))"
        "   - epoch_us(su.signup_ts)) / 86400000000.0) AS INT)"
        "   AS duration_days,"
        "  pu.purchase_ts IS NOT NULL AS converted"
        "  FROM su LEFT JOIN pu ON pu.user_id = su.user_id"
        "  CROSS JOIN h),"
        " by_t AS (SELECT duration_days,"
        "  CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END)"
        "   AS BIGINT) AS d_events,"
        "  CAST(count(*) AS BIGINT) AS n_ending FROM per_user"
        "  GROUP BY duration_days),"
        " tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total"
        "  FROM per_user),"
        " r AS (SELECT by_t.*, tot.n_total,"
        "  n_total - COALESCE(sum(n_ending) OVER ("
        "   ORDER BY duration_days ROWS BETWEEN UNBOUNDED"
        "   PRECEDING AND 1 PRECEDING), 0) AS at_risk"
        "  FROM by_t CROSS JOIN tot),"
        " s AS (SELECT duration_days, d_events, n_ending,"
        "  CAST(at_risk AS BIGINT) AS at_risk,"
        "  ln(greatest(1.0 - d_events /"
        "   CAST(at_risk AS DOUBLE), 1e-12)) AS log_term FROM r)"
        " SELECT duration_days, d_events, n_ending, at_risk,"
        " round(exp(sum(log_term) OVER (ORDER BY duration_days"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
        "  + 1e-9, 6) AS survival"
        " FROM s ORDER BY duration_days"
    ),
    "touch_attribution": (
        "WITH en AS (SELECT user_id, ts, event_id, event_type,"
        "  value,"
        "  first_value(CASE WHEN event_type <> 'purchase'"
        "   THEN event_type END IGNORE NULLS) OVER ("
        "   PARTITION BY user_id ORDER BY ts, event_id"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        "   AS first_touch,"
        "  last_value(CASE WHEN event_type <> 'purchase'"
        "   THEN event_type END IGNORE NULLS) OVER ("
        "   PARTITION BY user_id ORDER BY ts, event_id"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        "   AS last_touch FROM events),"
        " p AS (SELECT * FROM en WHERE event_type = 'purchase'),"
        " f AS (SELECT COALESCE(first_touch, '__NONE__')"
        "   AS touch_type, CAST(count(*) AS BIGINT) AS n_first,"
        "  CAST(round(sum(value), 2) AS DOUBLE) AS value_first"
        "  FROM p GROUP BY 1),"
        " l AS (SELECT COALESCE(last_touch, '__NONE__')"
        "   AS touch_type, CAST(count(*) AS BIGINT) AS n_last,"
        "  CAST(round(sum(value), 2) AS DOUBLE) AS value_last"
        "  FROM p GROUP BY 1)"
        " SELECT COALESCE(f.touch_type, l.touch_type)"
        "  AS touch_type,"
        " CAST(COALESCE(n_first, 0) AS BIGINT) AS n_first,"
        " COALESCE(value_first, 0.0) AS value_first,"
        " CAST(COALESCE(n_last, 0) AS BIGINT) AS n_last,"
        " COALESCE(value_last, 0.0) AS value_last"
        " FROM f FULL JOIN l ON f.touch_type = l.touch_type"
        " ORDER BY touch_type"
    ),
    "rfm_segments": (
        "WITH ref AS (SELECT max(o_orderdate) AS ref_date"
        "  FROM orders),"
        " cust AS (SELECT o_custkey,"
        "  CAST(date_diff('day', max(o_orderdate), max(ref_date))"
        "   AS INT) AS recency_days,"
        "  CAST(count(*) AS BIGINT) AS frequency,"
        "  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS monetary"
        "  FROM orders CROSS JOIN ref GROUP BY o_custkey),"
        " b AS (SELECT"
        "  quantile_disc(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rb,"
        "  quantile_disc(frequency, [0.2, 0.4, 0.6, 0.8]) AS fb,"
        "  quantile_disc(monetary, [0.2, 0.4, 0.6, 0.8]) AS mb"
        "  FROM cust),"
        " s AS (SELECT o_custkey, monetary,"
        "  5 - ((CASE WHEN recency_days > rb[1] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN recency_days > rb[2] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN recency_days > rb[3] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN recency_days > rb[4] THEN 1 ELSE 0 END))"
        "   AS r_score,"
        "  1 + ((CASE WHEN frequency > fb[1] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN frequency > fb[2] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN frequency > fb[3] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN frequency > fb[4] THEN 1 ELSE 0 END))"
        "   AS f_score,"
        "  1 + ((CASE WHEN monetary > mb[1] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN monetary > mb[2] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN monetary > mb[3] THEN 1 ELSE 0 END)"
        "   + (CASE WHEN monetary > mb[4] THEN 1 ELSE 0 END))"
        "   AS m_score"
        "  FROM cust CROSS JOIN b)"
        " SELECT r_score, f_score, m_score,"
        " CAST(count(*) AS BIGINT) AS n_customers,"
        " round(CAST(round(sum(monetary), 2) AS DOUBLE)"
        "  / count(*) + 1e-9, 4) AS avg_monetary"
        " FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    ),
    "session_occupancy": (
        "WITH o AS (SELECT user_id, event_id,"
        "  CAST(ts AS TIMESTAMP) AS ts FROM events),"
        " g AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL OR"
        "  date_diff('second', lag(ts) OVER w, ts) > 1800"
        "  THEN 1 ELSE 0 END AS brk FROM o"
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),"
        " s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id"
        "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)"
        "  AS session_seq FROM g),"
        " sess AS (SELECT user_id, session_seq,"
        "  min(ts) AS session_start, max(ts) AS session_end"
        "  FROM s GROUP BY user_id, session_seq),"
        " b AS (SELECT date_trunc('hour', session_start) AS hour,"
        "  1 AS delta, 1 AS is_start, 0 AS is_end FROM sess"
        "  UNION ALL SELECT date_trunc('hour', session_end)"
        "  + INTERVAL 1 HOUR, -1, 0, 1 FROM sess),"
        " ph AS (SELECT hour, CAST(sum(is_start) AS BIGINT) AS n_starts,"
        "  CAST(sum(is_end) AS BIGINT) AS n_ends,"
        "  sum(delta) AS net FROM b GROUP BY hour)"
        " SELECT hour, n_starts, n_ends,"
        " CAST(sum(net) OVER (ORDER BY hour ROWS UNBOUNDED PRECEDING)"
        "  AS BIGINT) AS open_sessions"
        " FROM ph ORDER BY hour"
    ),
    "rolling_wau": (
        "WITH ud AS (SELECT DISTINCT user_id,"
        "  date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),"
        " mx AS (SELECT max(day) AS mxd FROM ud),"
        " e AS (SELECT user_id, day + i * INTERVAL 1 DAY AS report_day"
        "  FROM ud, LATERAL (SELECT unnest(generate_series(0, 6)) AS i) g)"
        " SELECT strftime(report_day, '%Y-%m-%d') AS day,"
        " CAST(count(DISTINCT user_id) AS BIGINT) AS active_users"
        " FROM e, mx WHERE report_day <= mxd"
        " GROUP BY 1 ORDER BY 1"
    ),
    "ohlc_bars": (
        "WITH o AS (SELECT event_type,"
        "  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_hour,"
        "  CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),"
        " w AS (SELECT *,"
        "  first_value(value) OVER (PARTITION BY event_type, bar_hour"
        "   ORDER BY ts, event_id) AS open_v,"
        "  first_value(value) OVER (PARTITION BY event_type, bar_hour"
        "   ORDER BY ts DESC, event_id DESC) AS close_v FROM o)"
        " SELECT event_type, bar_hour,"
        " round(min(open_v) + 1e-9, 4) AS open,"
        " round(max(value) + 1e-9, 4) AS high,"
        " round(min(value) + 1e-9, 4) AS low,"
        " round(min(close_v) + 1e-9, 4) AS close,"
        " count(*) AS n_events"
        " FROM w GROUP BY event_type, bar_hour"
        " ORDER BY event_type, bar_hour"
    ),
    "scd2_lookup": (
        "WITH marked AS (SELECT user_id, event_type, ts, event_id,"
        "   (lag(event_type) OVER w IS NULL"
        "    OR lag(event_type) OVER w <> event_type) AS chg"
        "   FROM events WINDOW w AS"
        "    (PARTITION BY user_id ORDER BY ts, event_id)),"
        " starts AS (SELECT * FROM marked WHERE chg),"
        " dim AS (SELECT user_id, event_type AS state,"
        "   ts AS valid_from,"
        "   coalesce(lead(ts) OVER w2,"
        "    TIMESTAMP '2200-01-01 00:00:00') AS valid_to,"
        "   CAST(row_number() OVER w2 AS INT) AS version"
        "  FROM starts WINDOW w2 AS"
        "   (PARTITION BY user_id ORDER BY ts, event_id)),"
        " p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts"
        "  FROM events WHERE event_type = 'purchase')"
        " SELECT p.event_id, p.user_id, p.ts,"
        " d.state AS state_at_event, d.version"
        " FROM p JOIN dim d ON p.user_id = d.user_id"
        "  AND p.ts >= d.valid_from AND p.ts < d.valid_to"
        " ORDER BY event_id"
    ),
    "resample_events": (
        "WITH hourly AS (SELECT user_id,"
        "  date_trunc('hour', ts) AS hour, count(*) AS n_events,"
        "  round(round(sum(value), 2) / count(*) + 1e-9, 4) AS avg_value"
        "  FROM events GROUP BY 1, 2),"
        " span AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1"
        "  FROM hourly GROUP BY 1),"
        " spine AS (SELECT user_id,"
        "  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span)"
        " SELECT s.user_id, s.hour, coalesce(h.n_events, 0) AS n_events,"
        " last_value(h.avg_value IGNORE NULLS) OVER ("
        "  PARTITION BY s.user_id ORDER BY s.hour"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill"
        " FROM spine s LEFT JOIN hourly h USING (user_id, hour)"
        " ORDER BY user_id, hour"
    ),
}
