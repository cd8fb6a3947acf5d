"""Declarative data-quality constraint checking (ingestion QA).

The reference pipeline trusts its source blindly (core.clj:81-88 wires
scan -> sink with no validation); any production copy of it grows a
validation pass. This module is that pass, Spark-first: every rule
compiles to ONE aggregate expression, and the whole rule set for a
table evaluates in a SINGLE scan + single partial+final aggregation —
adding a rule costs one more agg buffer, never another pass over the
data. That is the only shape that survives 100 TB: N rules x 1 scan,
not N scans.

Rule kinds:
- ``not_null``          col IS NULL
- ``unique``            duplicate extra rows on a key (count - countDistinct)
- ``in_range``          non-null value outside [lo, hi]
- ``accepted_values``   non-null value not in the allowed set
- ``matches``           non-null value not rlike the regex

Referential integrity needs a second table, so it is a separate
operator (``referential_report``) with the same output contract —
union the two reports for a full-table audit. Its anti-join is
broadcast-friendly for dimension parents and AQE-planned otherwise.

Output contract (both operators): one row per rule,
``(rule, column, kind, n_violations, passed)`` — scalar columns only,
so the report is trivially storable/diffable per ingestion run.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _violations_expr(rule: Mapping[str, Any]) -> F.Column:
    """Compile one rule to an aggregate expression counting violations."""
    kind = rule["kind"]
    col = F.col(rule["column"])
    if kind == "not_null":
        return F.sum(F.when(col.isNull(), 1).otherwise(0))
    if kind == "unique":
        # extra duplicate rows beyond the first per key; countDistinct
        # ignores nulls, so count non-null rows to match
        return F.sum(F.when(col.isNotNull(), 1).otherwise(0)) - F.countDistinct(col)
    if kind == "in_range":
        lo, hi = rule["lo"], rule["hi"]
        bad = (col < F.lit(lo)) | (col > F.lit(hi))
        return F.sum(F.when(col.isNotNull() & bad, 1).otherwise(0))
    if kind == "accepted_values":
        ok = col.isin(list(rule["values"]))
        return F.sum(F.when(col.isNotNull() & ~ok, 1).otherwise(0))
    if kind == "matches":
        return F.sum(
            F.when(col.isNotNull() & ~col.rlike(rule["pattern"]), 1).otherwise(0)
        )
    raise ValueError(f"unknown rule kind {kind!r}")


def _rule_name(rule: Mapping[str, Any]) -> str:
    return rule.get("name") or f"{rule['kind']}_{rule['column']}"


def constraint_report(
    df: DataFrame, rules: Sequence[Mapping[str, Any]]
) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass over ``df``.

    The single ``agg`` row (one long per rule) is then exploded into
    the per-rule report rows — a 1-row driver-side pivot, not a second
    job. ``unique`` rules use countDistinct, which Catalyst plans with
    Expand: cost is one extra shuffled copy of the key column per
    distinct-counted key, still within the same single scan.
    """
    if not rules:
        raise ValueError("constraint_report needs at least one rule")
    names = [_rule_name(r) for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    agg_row = df.agg(
        *[_violations_expr(r).cast("long").alias(n) for r, n in zip(rules, names)]
    )
    report_structs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"),
                F.lit(r["column"]).alias("column"),
                F.lit(r["kind"]).alias("kind"),
                F.coalesce(F.col(n), F.lit(0)).alias("n_violations"),
            )
            for r, n in zip(rules, names)
        ]
    )
    return (
        agg_row.select(F.explode(report_structs).alias("r"))
        .select(
            "r.rule",
            "r.column",
            "r.kind",
            "r.n_violations",
            (F.col("r.n_violations") == 0).alias("passed"),
        )
        .orderBy("rule")
    )


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    *,
    fk: str,
    pk: str,
    name: str | None = None,
) -> DataFrame:
    """Foreign-key integrity: rows in ``child`` whose non-null ``fk``
    has no matching ``pk`` in ``parent``. One left-anti join — Catalyst
    broadcasts dimension-sized parents automatically; a fact-sized
    parent falls back to a shuffled anti join keyed on the id, which is
    the minimal possible exchange for this question."""
    orphans = (
        child.filter(F.col(fk).isNotNull())
        .select(fk)
        .join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")
    )
    n = orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    rule = name or f"ref_{fk}"
    return n.select(
        F.lit(rule).alias("rule"),
        F.lit(fk).alias("column"),
        F.lit("ref_integrity").alias("kind"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def table_profile(
    df: DataFrame, columns: Sequence[str], *, approx_distinct: bool = False
) -> DataFrame:
    """Per-column statistical profile (row count, null count, distinct
    count, min/max/mean) for the given numeric columns, computed in ONE
    aggregation pass over the table — the data-quality profiler every
    ingestion edge runs before accepting a drop.

    Plan shape: a single partial+final hash aggregate produces every
    statistic for every column in one scan (no per-column jobs, no
    driver loop over ``describe()``), then a map-side ``inline`` of a
    literal struct array reshapes the 1-row wide result into one row
    per column. countDistinct over k columns expands to k exact
    distinct aggregates (one Expand, k shuffled copies of the key
    columns) in the same Aggregate operator — at 100 TB pass
    ``approx_distinct=True`` to swap them for approx_count_distinct
    (HLL++: bounded sketch state, NO Expand, ±~2.3% default error),
    which is the profile a petabyte audit actually wants.
    """
    n_distinct = F.approx_count_distinct if approx_distinct else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__{c}_nulls"),
            n_distinct(c).alias(f"__{c}_distinct"),
            F.min(c).cast("double").alias(f"__{c}_min"),
            F.max(c).cast("double").alias(f"__{c}_max"),
            F.sum(c).cast("double").alias(f"__{c}_sum"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__{c}_nulls").alias("n_nulls"),
                F.col(f"__{c}_distinct").alias("n_distinct"),
                F.col(f"__{c}_min").alias("min_val"),
                F.col(f"__{c}_max").alias("max_val"),
                F.round(
                    F.round(F.col(f"__{c}_sum"), 2)
                    / (F.col("__n_rows") - F.col(f"__{c}_nulls"))
                    + F.lit(1e-9),
                    4,
                ).alias("avg_val"),
            )
            for c in columns
        ]
    )
    return one.select(F.inline(per_col)).orderBy("column_name")


def distribution_drift_psi(
    df: DataFrame,
    value_col: str,
    period_col: F.Column,
    *,
    bin_width: float = 50_000.0,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    period of one numeric column — the standard drift monitor for a
    continuously-ingested corpus (PSI < 0.1 stable, 0.1–0.25 drifting,
    > 0.25 shifted).  ``period_col`` must evaluate to ``'ref'`` or
    ``'cur'`` per row; values are binned by fixed literal edges
    (``bin_width`` x ``n_bins``, last bin open-ended) so the binning is
    a pure map-side expression and two runs (or engines) agree exactly.

    Scale shape: ONE scan and ONE tiny shuffle — the conditional
    counts for both periods ride a single partial+final aggregate on
    the bin key (≤ ``n_bins`` groups), and the share denominators are
    unbounded-frame windows over that already-aggregated ≤ ``n_bins``-row
    frame, which is scale-safe at any corpus size because the frame
    width is fixed by the bin count, not the data.  Zero-count bins are
    smoothed with ``eps`` before the log ratio.
    """
    from pyspark.sql import Window

    b = F.least(
        F.floor(F.col(value_col) / F.lit(bin_width)).cast("int"),
        F.lit(n_bins - 1),
    )
    per_bin = (
        df.select(b.alias("bin"), period_col.alias("period"))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("period") == "ref", 1)).alias("n_ref"),
            F.count(F.when(F.col("period") == "cur", 1)).alias("n_cur"),
        )
    )
    # n_bins-row frame: the unbounded window is over the aggregate, not
    # the fact table — bounded state regardless of input scale
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    p = F.greatest(F.col("n_ref") / F.sum("n_ref").over(w), F.lit(eps))
    q = F.greatest(F.col("n_cur") / F.sum("n_cur").over(w), F.lit(eps))
    term = (p - q) * F.log(p / q)
    with_terms = per_bin.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p + F.lit(1e-9), 6).alias("ref_share"),
        F.round(q + F.lit(1e-9), 6).alias("cur_share"),
        F.round(term + F.lit(1e-9), 6).alias("psi_term"),
        F.round(F.sum(term).over(w) + F.lit(1e-9), 6).alias("psi_total"),
    )
    return with_terms.orderBy("bin")


def ks_drift(
    df: DataFrame,
    value_col: str,
    period_col: F.Column,
    *,
    bin_width: float = 50_000.0,
    n_bins: int = 10,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic on the SAME fixed
    literal bin grid as :func:`distribution_drift_psi` — the sup-norm
    CDF distance complements PSI's density-ratio view (PSI reacts to
    mass re-weighting anywhere; KS localizes the largest cumulative
    displacement, so the reported argmax bin says WHERE the
    distribution slid).  Exact KS needs a global sort of the pooled
    sample; the binned variant is the 100 TB formulation — one scan,
    one <= ``n_bins``-key shuffle, and windows only over the
    aggregated <= ``n_bins``-row frame (identical scale shape to PSI).

    Emits per-bin cumulative shares, the per-bin CDF gap, and the KS
    statistic (max gap) replicated on every row.
    """
    from pyspark.sql import Window

    b = F.least(
        F.floor(F.col(value_col) / F.lit(bin_width)).cast("int"),
        F.lit(n_bins - 1),
    )
    per_bin = (
        df.select(b.alias("bin"), period_col.alias("period"))
        .groupBy("bin")
        .agg(
            F.count(F.when(F.col("period") == "ref", 1)).alias("n_ref"),
            F.count(F.when(F.col("period") == "cur", 1)).alias("n_cur"),
        )
    )
    # all windows are over the aggregated <= n_bins-row frame
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_ref = F.sum("n_ref").over(w_cum) / F.sum("n_ref").over(w_all)
    cum_cur = F.sum("n_cur").over(w_cum) / F.sum("n_cur").over(w_all)
    gap = F.abs(cum_ref - cum_cur)
    with_gaps = per_bin.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(cum_ref + F.lit(1e-9), 6).alias("cum_ref_share"),
        F.round(cum_cur + F.lit(1e-9), 6).alias("cum_cur_share"),
        F.round(gap + F.lit(1e-9), 6).alias("cdf_gap"),
    )
    return with_gaps.withColumn(
        "ks_stat", F.max("cdf_gap").over(w_all)
    ).orderBy("bin")


def _grid_percentile_bounds(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: Sequence[float],
    coarse_edges: Sequence[float],
    out_cols: Sequence[str],
) -> DataFrame:
    """Per-group EXACT percentiles, BIT-IDENTICAL to Spark's
    ``percentile`` aggregate, computed through two-phase grid ranks
    instead of the per-group value buffer (r12, guide §2.3/§5: the
    ``Percentile`` aggregate holds every (value, count) pair of a group
    in ONE aggregation buffer — the known OOM/spill class at scale; the
    grid shape is the ``grouped_quantiles_exact`` discipline, already
    laddered to sf100 on the boxplot family).

    Parity contract (pinned by tests/test_opt_r12.py at full double
    precision, no rounding): nulls ignored; values sorted ascending
    with NaN last; ``position = q * (n - 1)``; result is the value at
    rank ``floor(position)+1`` when the position is whole or when the
    two spanning values compare equal, else the linear interpolation
    ``(ceil(pos) - pos) * v_lo + (pos - floor(pos)) * v_hi`` — the
    exact expression ``Percentile.getPercentile`` evaluates, in the
    same operand order, so every float op matches ULP-for-ULP.  (Known
    non-difference: ``Percentile``'s hash map keeps -0.0 and 0.0 as
    distinct keys where the grid's groupBy normalizes them; both sort
    adjacent and compare equal, so the returned double is identical.)

    ``coarse_edges`` range-partition the value axis (the
    equi_depth_buckets two-phase trick) so no window partition holds a
    whole group's grid; edges that miss the data degrade to one range
    per group — still grid-sized state, never a value buffer.

    Returns one row per group that has >= 1 non-null value:
    ``(group_col, *out_cols)`` with unrounded double percentiles —
    callers LEFT-join so all-null groups keep their legacy null bounds.
    """
    edges = list(coarse_edges)
    coarse = F.lit(len(edges))
    for i, e in reversed(list(enumerate(edges))):
        coarse = F.when(F.col("__v") < F.lit(float(e)), F.lit(i)).otherwise(
            coarse
        )
    grid = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
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
        .over(
            Window.partitionBy("__g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
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
            (
                F.col("__offset") + F.col("__cum_in_range") - F.col("__n") + 1
            ).alias("__start"),
            (F.col("__offset") + F.col("__cum_in_range")).alias("__end"),
        )
    )
    targets = offsets.groupBy("__g").agg(F.max("__total").alias("__n_rows"))
    pos_rows = []
    for qi, q in enumerate(qs):
        # Percentile.scala: maxPosition * percentile with maxPosition =
        # count - 1 (a Long); Long * Double promotes — one IEEE multiply
        pos = F.lit(float(q)) * (F.col("__n_rows") - 1).cast("double")
        pos_rows.append(
            targets.select(
                F.col("__g").alias("__pg"),
                F.lit(qi).alias("__qi"),
                pos.alias("__pos"),
                (F.floor(pos) + 1).cast("bigint").alias("__lo_rank"),
                (F.ceil(pos) + 1).cast("bigint").alias("__hi_rank"),
            )
        )
    positions = pos_rows[0]
    for p in pos_rows[1:]:
        positions = positions.unionByName(p)
    spans_lo = (F.col("__lo_rank") >= F.col("__start")) & (
        F.col("__lo_rank") <= F.col("__end")
    )
    spans_hi = (F.col("__hi_rank") >= F.col("__start")) & (
        F.col("__hi_rank") <= F.col("__end")
    )
    hit = ranked.join(
        F.broadcast(positions),
        (F.col("__g") == F.col("__pg")) & (spans_lo | spans_hi),
    )
    per_q = hit.groupBy("__g", "__qi", "__pos", "__lo_rank", "__hi_rank").agg(
        F.max(F.when(spans_lo, F.col("__v").cast("double"))).alias("__v_lo"),
        F.max(F.when(spans_hi, F.col("__v").cast("double"))).alias("__v_hi"),
    )
    # Percentile.getPercentile, same special cases, same operand order:
    # whole position -> lower key; equal keys -> lower key; else
    # (higher - position) * lowerKey + (position - lower) * higherKey
    val = (
        F.when(F.col("__hi_rank") == F.col("__lo_rank"), F.col("__v_lo"))
        .when(F.col("__v_hi") == F.col("__v_lo"), F.col("__v_lo"))
        .otherwise(
            ((F.col("__hi_rank") - 1).cast("double") - F.col("__pos"))
            * F.col("__v_lo")
            + (F.col("__pos") - (F.col("__lo_rank") - 1).cast("double"))
            * F.col("__v_hi")
        )
    )
    long_form = per_q.select("__g", "__qi", val.alias("__val"))
    return long_form.groupBy("__g").agg(
        *[
            F.max(F.when(F.col("__qi") == i, F.col("__val"))).alias(
                out_cols[i]
            )
            for i in range(len(qs))
        ]
    ).select(F.col("__g").alias(group_col), *out_cols)


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    lo: float = 0.01,
    hi: float = 0.99,
    coarse_edges: Sequence[float] = tuple(
        float(e) for e in range(50_000, 500_000, 50_000)
    ),
) -> DataFrame:
    """Per-group winsorized summary: exact ``lo``/``hi`` percentile
    bounds per group, values clipped to those bounds, then robust
    stats — the outlier-resistant profiling pass that keeps a few
    corrupt measurements from poisoning corpus statistics.

    Scale shape: two passes over the fact, both single-shuffle — pass
    1 computes the exact per-group percentile bounds through two-phase
    GRID ranks (r12: bit-identical to Spark's ``Percentile`` aggregate
    — see :func:`_grid_percentile_bounds` — without its per-group
    value buffer, the OOM class at 100 TB groups), pass 2 clips
    against the BROADCAST bounds table and aggregates per group.  The
    bounds table is group-cardinality-sized, never fact-sized.  The
    LEFT join keeps all-null-value groups on their legacy null bounds.
    """
    bounds = _grid_percentile_bounds(
        df, value_col, group_col, (lo, hi), coarse_edges, ("__lo", "__hi")
    )
    clipped = df.join(F.broadcast(bounds), group_col, "left").select(
        F.col(group_col),
        F.col(value_col).alias("__v"),
        F.greatest(F.least(F.col(value_col), F.col("__hi")), F.col("__lo")).alias(
            "__w"
        ),
        F.col("__lo"),
        F.col("__hi"),
    )
    return (
        clipped.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("__v") < F.col("__lo"), 1)).alias("n_clipped_lo"),
            F.count(F.when(F.col("__v") > F.col("__hi"), 1)).alias("n_clipped_hi"),
            F.round(F.min("__lo") + 1e-9, 4).alias("lo_bound"),
            F.round(F.max("__hi") + 1e-9, 4).alias("hi_bound"),
            F.round(F.round(F.sum("__w"), 2) / F.count(F.lit(1)) + 1e-9, 4).alias(
                "winsorized_mean"
            ),
        )
        .orderBy(group_col)
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    z_cut: float = 3.0,
    coarse_edges: Sequence[float] = tuple(
        float(e) for e in range(50, 500, 50)
    ),
    dev_coarse_edges: Sequence[float] = tuple(
        float(e) for e in range(25, 250, 25)
    ),
) -> DataFrame:
    """Per-group robust outlier detection via median / MAD: a value is
    an outlier when |v - median| > ``z_cut`` * 1.4826 * MAD (the
    consistency constant makes MAD estimate sigma under normality).
    Median/MAD resist the very outliers that poison mean/stddev-based
    z-scores, so this is the screening pass for corrupt telemetry.

    Scale shape: three single-shuffle passes, each with
    group-cardinality output — (1) exact per-group median, (2) exact
    median of absolute deviations against the BROADCAST median table,
    (3) flag-and-count against the broadcast (median, mad) table. The
    fact never shuffles; only tiny group tables move.  r12: both exact
    medians run through two-phase GRID ranks (bit-identical to Spark's
    ``Percentile`` aggregate — :func:`_grid_percentile_bounds`) instead
    of the per-group value-buffer aggregate, so no single aggregation
    buffer ever holds a group's values; LEFT joins keep all-null
    groups on their legacy null medians.
    """
    med = _grid_percentile_bounds(
        df, value_col, group_col, (0.5,), coarse_edges, ("__med",)
    )
    dev = df.join(F.broadcast(med), group_col, "left").select(
        F.col(group_col),
        F.col(value_col).alias("__v"),
        F.col("__med"),
        F.abs(F.col(value_col) - F.col("__med")).alias("__ad"),
    )
    mad = _grid_percentile_bounds(
        dev, "__ad", group_col, (0.5,), dev_coarse_edges, ("__mad",)
    )
    cut = F.lit(z_cut) * F.lit(1.4826) * F.col("__mad")
    flagged = dev.join(F.broadcast(mad), group_col, "left")
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("__med") + 1e-9, 6).alias("median"),
            F.round(F.min("__mad") + 1e-9, 6).alias("mad"),
            F.count(F.when(F.col("__ad") > cut, 1)).alias("n_outliers"),
            F.round(
                F.max(
                    F.when(F.col("__mad") > 0, F.col("__ad") / (F.lit(1.4826) * F.col("__mad")))
                )
                + 1e-9,
                4,
            ).alias("max_robust_z"),
        )
        .orderBy(group_col)
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_identifiers: list[str],
    *,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    re-identification governance check run before releasing or
    training on user-adjacent data: every row whose QI group has
    fewer than ``k`` members is re-identifiable to that group.

    Returns one row per AT-RISK group (size < k) plus a ``__TOTAL__``
    summary row (group_size = distinct at-risk groups, at_risk_rows =
    total rows exposed), so the audit is actionable (which cells to
    generalize/suppress) AND monitorable (one scalar to alert on).

    Scale shape: one partial+final agg on the QI key; the at-risk set
    is by definition small (< k rows per group), so the result is
    bounded by group count, never data volume.
    """
    if not quasi_identifiers:
        raise ValueError("k_anonymity_audit requires at least one QI column")
    groups = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    risky = groups.where(F.col("group_size") < k)
    qi_desc = risky.select(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in quasi_identifiers]
        ).alias("qi_values"),
        "group_size",
    )
    total = risky.agg(
        F.count(F.lit(1)).alias("group_size"),
        F.coalesce(F.sum("group_size"), F.lit(0)).alias("at_risk_rows"),
    ).select(
        F.lit("__TOTAL__").alias("qi_values"), "group_size", "at_risk_rows"
    )
    return (
        qi_desc.withColumn("at_risk_rows", F.col("group_size"))
        .unionByName(total)
        .orderBy("qi_values")
    )


def revenue_anomalies(
    orders: DataFrame,
    *,
    window_days: int = 14,
    min_history: int = 7,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection on the daily revenue
    series — the pipeline-monitoring staple (ingestion gaps, double
    loads, demand shocks all surface as |z| spikes).

    The fact table collapses to ONE calendar-bounded daily aggregate
    first (partial+final, data-sized work), so the analytic window
    runs over at most |days| rows — the same bounded-frame discipline
    as session_occupancy/ohlc_bars, never a corpus-wide window.  Each
    day scores against the mean/stddev of the PRECEDING
    ``window_days`` rows (self excluded — a spike must not mask
    itself); days with under ``min_history`` prior points stay
    unscored.  mean/std are rounded before the ratio so the flag is
    engine-portable.
    """
    from pyspark.sql import Window

    daily = (
        orders.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).cast("double").alias("revenue")
        )
    )
    w = Window.orderBy("day").rowsBetween(-window_days, -1)
    n_prev = F.count(F.lit(1)).over(w)
    scored = daily.select(
        "day",
        "revenue",
        n_prev.alias("n_prev"),
        F.round(F.avg("revenue").over(w) + F.lit(1e-9), 4).alias("mean_prev"),
        # guard n >= 2: Spark's stddev_samp of a single row is NaN
        # while standard SQL engines return NULL
        F.when(
            n_prev >= 2,
            F.round(F.stddev_samp("revenue").over(w) + F.lit(1e-9), 4),
        ).alias("std_prev"),
    )
    z = F.round(
        (F.col("revenue") - F.col("mean_prev")) / F.col("std_prev")
        + F.lit(1e-9),
        4,
    )
    return (
        scored.select(
            "day",
            "revenue",
            F.col("n_prev").cast("bigint").alias("n_prev"),
            "mean_prev",
            "std_prev",
            F.when(
                (F.col("n_prev") >= min_history) & (F.col("std_prev") > 0),
                z,
            ).alias("z"),
            F.when(
                (F.col("n_prev") >= min_history) & (F.col("std_prev") > 0),
                F.abs(z) > F.lit(z_threshold),
            )
            .otherwise(F.lit(False))
            .alias("is_anomaly"),
        )
        .orderBy("day")
    )


def benford_check(
    df: DataFrame, value_col: str, *, min_value: float = 1.0
) -> DataFrame:
    """Benford's-law first-digit audit — the forensic data-quality
    check for naturally-occurring positive amounts (fabricated or
    clipped numbers bend the log-uniform digit curve).

    One partial+final aggregation to the 9-row digit axis, then
    expected shares ln(1 + 1/d) / ln(10) and each digit's chi-square
    contribution n * (obs - exp)^2 / exp — all engine-exact given the
    rounding discipline.  Values below ``min_value`` are excluded
    (Benford applies to magnitudes spanning decades, not to zeros).
    """
    first_digit = F.substring(
        F.abs(F.col(value_col)).cast("double").cast("string"), 1, 1
    ).cast("int")
    digits = (
        df.where(F.col(value_col) >= F.lit(min_value))
        .select(first_digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = digits.agg(
        F.sum("n_obs").cast("double").alias("n_total")
    )  # 1-row scalar
    expected = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")) / F.log(
        F.lit(10.0)
    )
    obs_share = F.col("n_obs") / F.col("n_total")
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.round(obs_share + F.lit(1e-9), 6).alias("observed_share"),
            F.round(expected + F.lit(1e-9), 6).alias("expected_share"),
            F.round(
                F.col("n_total")
                * (obs_share - expected)
                * (obs_share - expected)
                / expected
                + F.lit(1e-9),
                6,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def market_concentration(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Revenue-concentration metrics per region-free market view:
    Herfindahl-Hirschman index (sum of squared nation revenue shares)
    and CR4 (top-4 nation share) — the standard concentration summary
    an analytics engine ships for mix monitoring.  Everything past the
    one fact aggregation happens on the |nations|-row frame.
    """
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).cast("double").alias("rev"))
    )
    total = rev.agg(F.sum("rev").alias("tot"))  # 1-row scalar
    shares = rev.crossJoin(F.broadcast(total)).select(
        "n_name", (F.col("rev") / F.col("tot")).alias("share")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("share").desc(), F.col("n_name"))
    ranked = shares.withColumn("rk", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_markets"),
        F.round(
            F.sum(F.col("share") * F.col("share")) + F.lit(1e-9), 6
        ).alias("hhi"),
        F.round(
            F.sum(F.when(F.col("rk") <= 4, F.col("share")).otherwise(F.lit(0.0)))
            + F.lit(1e-9),
            6,
        ).alias("cr4"),
        F.round(F.max("share") + F.lit(1e-9), 6).alias("top_share"),
    )


def correlation_matrix(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE
    aggregation pass (k*(k-1)/2 corr buffers in a single partial+final
    agg — the profiler companion for feature-redundancy checks; never
    k^2 scans).  Long-form output (col_a < col_b, corr rounded)."""
    if len(columns) < 2:
        raise ValueError("correlation_matrix needs at least two columns")
    pairs = [
        (a, b) for i, a in enumerate(columns) for b in columns[i + 1 :]
    ]
    one = df.agg(
        *[
            F.round(F.corr(a, b) + F.lit(1e-9), 6).alias(f"__{a}__{b}")
            for a, b in pairs
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__{a}__{b}").alias("pearson_r"),
            )
            for a, b in pairs
        ]
    )
    return one.select(F.inline(structs)).orderBy("col_a", "col_b")


def cusum_changepoints(
    orders: DataFrame,
    *,
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM control chart over daily revenue (Page 1954):
    S+_t = max(0, S+_{t-1} + (x_t - mu) - k), S-_t symmetric, alarm
    when either statistic exceeds h — the sequential change-point
    detector that catches small sustained level shifts a per-day
    z-score (``revenue_anomalies``) misses entirely.

    The recurrence is inherently sequential over the DAY axis, which
    is calendar-bounded (a century of days < 40k rows) no matter how
    large the fact table is — so the plan aggregates the corpus down
    to days (partial+final, the only wide work), collects the day
    series into ONE array, and runs the recurrence as a JVM
    ``aggregate`` fold — the same bounded-axis fold discipline as
    ``bpe_train``'s merge loop.  Nothing per-fact-row ever reaches the
    driver or a single-partition window.

    Engine portability: daily revenue, mu, and sigma are rounded to 2
    decimals BEFORE the recurrence, so the fold consumes bit-identical
    doubles on any engine; the recurrence itself is then a
    deterministic IEEE sequence (same order, same ops) and replays
    exactly in a recursive-CTE oracle.  k = ``k_sigma``*sigma (slack),
    h = ``h_sigma``*sigma.
    """
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).cast("double").alias("revenue"))
    params = daily.agg(
        F.round(F.avg("revenue") + 1e-9, 2).alias("mu"),
        F.round(F.stddev_samp("revenue") + 1e-9, 2).alias("sigma"),
    )
    series = (
        daily.crossJoin(F.broadcast(params))  # 1-row params broadcast
        .groupBy("mu", "sigma")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("day", "revenue"))
            ).alias("s")
        )
    )
    acc_t = (
        "struct<sp:double,sn:double,"
        "out:array<struct<day:timestamp,revenue:double,sp:double,sn:double>>>"
    )
    folded = series.select(
        "mu",
        "sigma",
        F.aggregate(
            "s",
            F.expr(
                f"CAST(named_struct('sp', 0.0d, 'sn', 0.0d, 'out',"
                f" array()) AS {acc_t})"
            ),
            lambda acc, v: F.struct(
                F.greatest(
                    F.lit(0.0),
                    acc["sp"]
                    + v["revenue"]
                    - F.col("mu")
                    - F.lit(k_sigma) * F.col("sigma"),
                ).alias("sp"),
                F.greatest(
                    F.lit(0.0),
                    acc["sn"]
                    - (v["revenue"] - F.col("mu"))
                    - F.lit(k_sigma) * F.col("sigma"),
                ).alias("sn"),
                F.array_append(
                    acc["out"],
                    F.struct(
                        v["day"].alias("day"),
                        v["revenue"].alias("revenue"),
                        F.greatest(
                            F.lit(0.0),
                            acc["sp"]
                            + v["revenue"]
                            - F.col("mu")
                            - F.lit(k_sigma) * F.col("sigma"),
                        ).alias("sp"),
                        F.greatest(
                            F.lit(0.0),
                            acc["sn"]
                            - (v["revenue"] - F.col("mu"))
                            - F.lit(k_sigma) * F.col("sigma"),
                        ).alias("sn"),
                    ),
                ).alias("out"),
            ),
        ).alias("acc"),
    )
    rows = folded.select(
        "sigma", F.explode(F.col("acc.out")).alias("r")
    )
    return rows.select(
        F.col("r.day").alias("day"),
        F.col("r.revenue").alias("revenue"),
        F.round(F.col("r.sp") + 1e-9, 4).alias("s_pos"),
        F.round(F.col("r.sn") + 1e-9, 4).alias("s_neg"),
        (
            (F.col("r.sp") > F.lit(h_sigma) * F.col("sigma"))
            | (F.col("r.sn") > F.lit(h_sigma) * F.col("sigma"))
        ).alias("alarm"),
    ).orderBy("day")


def dp_histogram(
    df: DataFrame,
    group_cols: list[str],
    *,
    seed: str = "dp-seed-0",
    max_magnitude: int = 20,
) -> DataFrame:
    """Differentially-private histogram release audit: per-group counts
    plus symmetric-geometric integer noise (sign from one hash bit,
    magnitude = trailing-zero count of the remaining bits, so
    P(|z| = m) = 2^-(m+1) — the discrete-Laplace-shaped mechanism at
    epsilon ~ ln 2), with the noisy count clamped at zero.

    Noise is derived DETERMINISTICALLY from an engine-portable seeded
    hash of the group key: the release is reproducible and
    hash-verifiable by an independent engine — the property this
    engine's whole oracle gate is built on.  A production release
    would draw the magnitude from a CSPRNG instead (one-line swap) and
    publish ONLY ``noisy_count``; ``true_count``/``noise`` are emitted
    here so the utility loss is auditable.

    Everything is exact integer arithmetic (hash, modulo powers of
    two, trailing-zero fold) — no float path at all.  Scale shape: one
    partial+final aggregate on the group key; noise is O(1) expression
    work per GROUP, not per row."""
    from .dedup import portable_hash31

    if not group_cols:
        raise ValueError("dp_histogram requires at least one group column")
    g = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("true_count"))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    h = portable_hash31(F.concat(F.lit(seed + "|"), key))
    sign = F.when(h % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
    # trailing zeros of (h >> 1), capped: tz >= b iff (h>>1) mod 2^b = 0
    half = (h - h % 2) / F.lit(2)
    hv = half.cast("bigint")
    st = F.aggregate(
        F.sequence(F.lit(1), F.lit(int(max_magnitude))),
        F.expr("CAST(named_struct('tz', 0, 'pw', CAST(1 AS BIGINT))"
               " AS struct<tz:int,pw:bigint>)"),
        lambda acc, _b: F.struct(
            (
                acc["tz"]
                + F.when(hv % (acc["pw"] * 2) == 0, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("tz"),
            (acc["pw"] * 2).alias("pw"),
        ),
    )
    noise = (sign * st["tz"]).cast("bigint")
    return (
        g.withColumn("noise", noise)
        .withColumn(
            "noisy_count",
            F.greatest(F.lit(0).cast("bigint"), F.col("true_count") + F.col("noise")),
        )
        .orderBy(*group_cols)
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive_col: str,
    *,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit — the attribute-disclosure companion to
    ``k_anonymity_audit``: a QI group can satisfy k-anonymity yet
    still leak its members' sensitive attribute if (nearly) everyone
    in the group shares one value.  A group is at risk when it holds
    fewer than ``l`` DISTINCT non-null sensitive values (distinct
    l-diversity, Machanavajjhala 2007).

    Returns one row per at-risk group
    ``(qi_values, group_size, n_sensitive)`` plus a ``__TOTAL__``
    summary (group_size = at-risk groups, n_sensitive = total exposed
    rows).  Scale shape: ONE partial+final aggregate on the QI key
    (count + exact countDistinct — swap to approx_count_distinct for
    petabyte audits, same trade as ``table_profile``); the at-risk
    output is bounded by group count."""
    if not quasi_identifiers:
        raise ValueError("l_diversity_audit requires at least one QI column")
    groups = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
    )
    risky = groups.where(F.col("n_sensitive") < l)
    per_group = risky.select(
        F.concat_ws(
            "|", *[F.col(c).cast("string") for c in quasi_identifiers]
        ).alias("qi_values"),
        "group_size",
        "n_sensitive",
    )
    total = risky.agg(
        F.count(F.lit(1)).alias("group_size"),
        F.coalesce(F.sum("group_size"), F.lit(0)).alias("n_sensitive"),
    ).select(
        F.lit("__TOTAL__").alias("qi_values"), "group_size", "n_sensitive"
    )
    return per_group.unionByName(total).orderBy("qi_values")


def corpus_datasheet(documents: DataFrame) -> DataFrame:
    """Datasheet-for-the-dataset rollup: one row per (source, lang)
    with the release-note numbers every training-data drop ships —
    volume (docs/chars/whitespace tokens), exact-duplicate rate
    (normalized content hash), and a PII-exposure probe (email-pattern
    hits). The per-cell formulas reuse the exact seams the focused
    catalog queries pin (dedup_content's normalization + sha256,
    token_counts' whitespace split, redact_pii's email pattern), so the
    datasheet cannot drift from the operators it summarizes.

    Scale shape: ONE hash aggregate over the corpus — every metric is
    an algebraic or sketchable per-group reduction; nothing is
    per-document after the map stage. At 100 TB swap countDistinct for
    approx_count_distinct if the 2% error is acceptable."""
    norm = F.regexp_replace(F.lower(F.trim("text")), "\\s+", " ")
    email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    return (
        documents.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.size(F.split(F.trim("text"), "\\s+")))
            .cast("bigint")
            .alias("total_ws_tokens"),
            F.countDistinct(F.sha2(norm, 256)).alias("n_distinct_contents"),
            # idx=0 (whole match): the pattern has no capture group and
            # Spark's default idx=1 raises ON MATCHING ROWS ONLY — a
            # fixture with no emails sails through the oracle gate while
            # real text crashes (caught by the crafted-fixture unit)
            F.sum(
                F.size(F.regexp_extract_all(F.col("text"), F.lit(email), 0))
            )
            .cast("bigint")
            .alias("email_hits"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "total_chars",
            "total_ws_tokens",
            "n_distinct_contents",
            F.round(
                (F.col("n_docs") - F.col("n_distinct_contents"))
                / F.col("n_docs")
                + F.lit(1e-9),
                4,
            ).alias("dup_rate"),
            F.round(F.col("total_chars") / F.col("n_docs") + F.lit(1e-9), 2).alias(
                "mean_chars"
            ),
            "email_hits",
        )
        .orderBy("source", "lang")
    )


def quality_threshold_sweep(
    documents: DataFrame,
    thresholds: "tuple[float, ...]" = (0.0, 0.35, 0.65, 0.95),
) -> DataFrame:
    """Filter-calibration sweep: for each candidate quality threshold,
    how many documents and whitespace tokens survive ``score >=
    threshold`` — the curve you read before choosing a corpus filter
    (the dedup_threshold_sweep of the quality axis). Thresholds sit
    BETWEEN the score formula's attainable levels (multiples of 0.1)
    so float rounding can never flip a boundary.

    Scale shape: scoring is one map pass (the same expression
    ``quality_scores`` pins), the sweep is CONDITIONAL AGGREGATION to a
    single row — one column pair per threshold, no grid x fact
    expansion — then an explode of the bounded threshold axis.
    """
    from flink_elasticsearch_ingestion_spark.operators.text import quality_scores

    scored = quality_scores(documents).select("quality_score", "n_tokens")
    aggs = [
        F.count(F.lit(1)).alias("nd"),
        F.sum("n_tokens").cast("bigint").alias("nt"),
    ]
    for i, t in enumerate(thresholds):
        cond = F.col("quality_score") >= F.lit(float(t))
        aggs.append(F.count(F.when(cond, 1)).alias(f"d{i}"))
        aggs.append(
            F.coalesce(F.sum(F.when(cond, F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias(f"t{i}")
        )
    row = scored.agg(*aggs)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(t)).alias("threshold"),
                    F.col(f"d{i}").alias("n_docs_kept"),
                    F.col(f"t{i}").alias("tokens_kept"),
                )
                for i, t in enumerate(thresholds)
            ]
        )
    ).alias("c")
    return (
        row.select("nd", "nt", cells)
        .select(
            F.col("c.threshold").alias("threshold"),
            F.col("c.n_docs_kept").alias("n_docs_kept"),
            F.round(F.col("c.n_docs_kept") / F.col("nd") + F.lit(1e-9), 4).alias(
                "pct_docs"
            ),
            F.col("c.tokens_kept").alias("tokens_kept"),
            F.round(F.col("c.tokens_kept") / F.col("nt") + F.lit(1e-9), 4).alias(
                "pct_tokens"
            ),
        )
        .orderBy("threshold")
    )


def group_auc(
    documents: DataFrame,
    *,
    group_col: str = "source",
    score_col: str = "n_chars",
    label: Column | None = None,
) -> DataFrame:
    """Tie-aware per-group ROC-AUC (Mann-Whitney U) of an integer-
    domain score against a binary label, WITHOUT ranking individual
    rows — the ranking-quality audit for any model- or heuristic-scored
    corpus gate (does the score actually separate the classes, per
    source?).

    Shape for 100 TB: ONE fact aggregation to (group, score) — bounded
    by the score DOMAIN, not the corpus (quantize continuous scores
    first) — then a window over that bounded table. The textbook
    formulation (rank every row, sum positive ranks) needs a
    whole-group sort of the fact table; this one never ranks rows.
    Tie handling is the midrank convention, exactly: each positive at
    score s counts every negative strictly below s as 1 and the
    negatives tied at s as 1/2, so AUC = sum_s pos(s) *
    (2*neg_below(s) + neg_at(s)) / (2*P*N). The numerator stays in
    INTEGER arithmetic (order-insensitive; IEEE summation order can
    never flip a rounded digit across engines).
    """
    lbl = label if label is not None else (F.col("lang") == "en")
    per = (
        documents.groupBy(
            F.col(group_col).alias("grp"), F.col(score_col).alias("score")
        )
        .agg(
            F.sum(lbl.cast("long")).alias("pos"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("neg", F.col("n") - F.col("pos"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per = per.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    return (
        per.groupBy("grp")
        .agg(
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.sum("neg").cast("bigint").alias("n_neg"),
            F.round(
                F.try_divide(
                    F.sum(
                        F.col("pos")
                        * (F.lit(2) * F.col("neg_below") + F.col("neg"))
                    ).cast("double"),
                    (F.lit(2.0) * F.sum("pos") * F.sum("neg")),
                )
                + F.lit(1e-9),
                6,
            ).alias("auc"),
        )
        .select(F.col("grp").alias(group_col), "n_pos", "n_neg", "auc")
        .orderBy(group_col)
    )


def gate_agreement_kappa(
    documents: DataFrame,
    *,
    group_col: str = "source",
    chars_threshold: int = 300,
    tokens_threshold: int = 60,
    text_col: str = "text",
) -> DataFrame:
    """Cohen's kappa between two heuristic keep/drop gates (char-length
    vs token-count), per group — the inter-annotator-agreement audit
    applied to automated labelers. Raw agreement overstates consensus
    when both gates mostly say "keep"; kappa subtracts the agreement
    expected from the marginals alone, which is what you report before
    trusting two cheap quality filters to vote.

    Shape: single scan, one 2x2 contingency aggregation per group —
    every derived quantity (po, pe, kappa) is a ratio of per-group
    INTEGER counts, so no cross-engine float-summation drift exists.
    kappa is null (not an error, not infinity) for the degenerate
    group where pe == 1 (both gates constant).
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    a = (F.length(text_col) >= chars_threshold).cast("long")
    b = (toks >= tokens_threshold).cast("long")
    agg = documents.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a * b).cast("bigint").alias("n11"),
        F.sum(a * (1 - b)).cast("bigint").alias("n10"),
        F.sum((1 - a) * b).cast("bigint").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("bigint").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    pa1 = (F.col("n11") + F.col("n10")) / n
    pb1 = (F.col("n11") + F.col("n01")) / n
    pe = pa1 * pb1 + (1.0 - pa1) * (1.0 - pb1)
    return agg.select(
        group_col,
        F.col("n").cast("bigint").alias("n"),
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po + F.lit(1e-9), 6).alias("agreement"),
        F.round(F.try_divide(po - pe, F.lit(1.0) - pe) + F.lit(1e-9), 6).alias(
            "kappa"
        ),
    ).orderBy(group_col)


def gate_fleiss_kappa(
    documents: DataFrame,
    *,
    group_col: str = "source",
    chars_threshold: int = 300,
    tokens_threshold: int = 60,
    spaces_threshold: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Fleiss' kappa across THREE heuristic keep/drop gates (char
    length, whitespace-token count, space count) per group — the
    m-rater generalization of :func:`gate_agreement_kappa`. With a
    gate PANEL (the production shape: several cheap filters vote
    before an expensive judge runs), pairwise Cohen's kappas
    under-report the panel's joint reliability; Fleiss' single
    statistic is what a filtering datasheet quotes.

    With m raters and 2 categories, per-item agreement is the fraction
    of concordant rater pairs: P_i = (k(k-1) + (m-k)(m-k-1)) / (m(m-1))
    where k = keep votes. Both the P_i numerator and the marginal vote
    total aggregate as exact INTEGER sums, so p_bar / p_e / kappa are
    ratios of integers — no cross-engine float-summation drift, same
    discipline as the Cohen twin. kappa is null (not inf) when
    p_e == 1 (all gates constant in the group).

    Shape: single scan, one small-integer aggregation per group —
    adds nothing wide at any corpus size."""
    m = 3
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    spaces = F.length(text_col) - F.length(F.regexp_replace(text_col, " ", ""))
    votes = (
        (F.length(text_col) >= chars_threshold).cast("long")
        + (toks >= tokens_threshold).cast("long")
        + (spaces >= spaces_threshold).cast("long")
    )
    pairs_i = votes * (votes - 1) + (m - votes) * (m - votes - 1)
    agg = documents.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(votes).cast("bigint").alias("keep_votes"),
        F.sum(pairs_i).cast("bigint").alias("agree_pairs"),
    )
    n = F.col("n").cast("double")
    p_bar = F.col("agree_pairs") / (n * m * (m - 1))
    p_keep = F.col("keep_votes") / (n * m)
    p_e = p_keep * p_keep + (1.0 - p_keep) * (1.0 - p_keep)
    return agg.select(
        group_col,
        "n",
        F.lit(m).cast("int").alias("m_raters"),
        "keep_votes",
        "agree_pairs",
        F.round(p_keep + F.lit(1e-9), 6).alias("p_keep"),
        F.round(p_bar + F.lit(1e-9), 6).alias("p_bar"),
        F.round(p_e + F.lit(1e-9), 6).alias("p_e"),
        F.round(F.try_divide(p_bar - p_e, F.lit(1.0) - p_e) + F.lit(1e-9), 6).alias(
            "kappa"
        ),
    ).orderBy(group_col)


def spearman_gate_correlation(
    documents: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Spearman rank correlation between two quality signals (char
    length vs whitespace-token count) per group — the redundancy audit
    for a filter panel: two gates with rho ~ 1 are one gate, and the
    datasheet should say so before anyone sums their votes
    (:func:`gate_fleiss_kappa` tells you agreement; this tells you
    whether the agreement is just the same signal twice).

    Tie-aware (midrank convention), computed WITHOUT ranking fact rows
    — the ``group_auc`` discipline: aggregate to the bounded
    (group, x, y) joint distribution first, derive each value's
    midrank from the MARGINAL count table with a partitioned window
    over the bounded score domain, then weighted-Pearson over
    midranks. Midranks are exact halves and counts are exact integers,
    so every sum is exact in double precision far past any realistic
    group size — the 6dp rho is engine-portable.

    Scale shape: one fact aggregate bounded by the joint score domain;
    everything after runs on that bounded table."""
    x = F.length(text_col)
    y = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    joint = documents.groupBy(
        F.col(group_col).alias("grp"), x.alias("x"), y.alias("y")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))

    def midranks(marg_col: str) -> DataFrame:
        marg = joint.groupBy("grp", marg_col).agg(F.sum("c").alias("cm"))
        w = (
            Window.partitionBy("grp")
            .orderBy(marg_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return marg.select(
            "grp",
            marg_col,
            (
                F.coalesce(F.sum("cm").over(w), F.lit(0.0))
                + (F.col("cm") + 1.0) / 2.0
            ).alias(f"r{marg_col}"),
        )

    j = joint.join(midranks("x"), ["grp", "x"]).join(
        midranks("y"), ["grp", "y"]
    )
    agg = j.groupBy("grp").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_joint"),
        F.sum(F.col("c") * F.col("rx")).alias("sx"),
        F.sum(F.col("c") * F.col("ry")).alias("sy"),
        F.sum(F.col("c") * F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("c") * F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("c") * F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        F.col("grp").alias(group_col),
        n.cast("bigint").alias("n"),
        "n_joint",
        F.round(F.try_divide(num, den) + F.lit(1e-9), 6).alias("spearman"),
    ).orderBy(group_col)


def doc_length_calibration(
    documents: DataFrame,
    *,
    n_bands: int = 10,
    pass_threshold: float = 0.7,
) -> DataFrame:
    """Quality-score calibration against document length: bucket the
    corpus into length-decile bands and report each band's mean
    quality score and keep rate — the diagnostic that catches a filter
    that is secretly a length filter (keep rate should vary smoothly,
    not step at a band boundary).

    Scale shape (the ``rfm_segments`` discipline — NO global ntile
    window): decile breakpoints come from ONE exact 1-row
    ``percentile_approx`` aggregate (accuracy=max => quantile_disc
    semantics) broadcast everywhere; band assignment is a map-side
    comparison count; the summary is one bounded aggregate. The 1-row
    breakpoint broadcast is the allowlisted scalar-subquery BNLJ."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        quality_scores,
    )

    exact = 2147483647
    qs = [i / n_bands for i in range(1, n_bands)]
    scored = quality_scores(documents)
    breaks = scored.agg(
        F.percentile_approx("n_chars", qs, exact).alias("lb")
    )  # 1 row
    with_band = scored.crossJoin(F.broadcast(breaks)).withColumn(
        "length_band",
        (
            F.lit(1)
            + F.aggregate(
                F.col("lb"),
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col("n_chars") > b, 1).otherwise(0),
            )
        ).cast("int"),
    )
    return (
        with_band.groupBy("length_band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(
                F.round(F.sum("quality_score"), 2) / F.count(F.lit(1))
                + 1e-9,
                4,
            ).alias("avg_quality"),
            F.round(
                F.sum(
                    F.when(
                        F.col("quality_score") >= pass_threshold, 1
                    ).otherwise(0)
                )
                / F.count(F.lit(1))
                + 1e-9,
                6,
            ).alias("keep_rate"),
        )
        .orderBy("length_band")
    )
