"""Round-11 ES-aggregation parity part II (catalog/es_aggs2.py):
hand-computed semantic pins on literal fixtures for each operator —
rare_terms' ascending-count long-tail cut, the auto_date_histogram
ladder choice, min_doc_count:0 zero-fill with extended bounds, the
largest-gap variable-width clustering spec, Tukey boxplot fences,
the Welch t statistic, digit-mask categorization, char-entropy
string_stats, fuzzy prefix blocking, and highlighter edge clamping —
plus plan pins (no cartesians beyond the allowlisted scalar joins;
no unpartitioned fact windows).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import es_aggs2 as ES2
from flink_elasticsearch_ingestion_spark.plans import (
    assert_no_accidental_quadratic_join,
    assert_no_unpartitioned_fact_window,
    physical_plan,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )


# ---------------------------------------------------------- rare_terms


def test_rare_terms_ascending_long_tail_cut(spark):
    # trigram 'a b c' in 3 docs (too common), 'x y z' in 2, 'p q r'
    # in 1 — rare_terms keeps doc_count <= 2, ASCENDING count order
    # (the inverse of the terms agg), hapaxes first
    rows = [
        (0, "a b c tail0", "en", "s"),
        (1, "a b c tail1", "en", "s"),
        (2, "a b c tail2", "en", "s"),
        (3, "x y z", "en", "s"),
        (4, "x y z", "en", "s"),
        (5, "p q r", "en", "s"),
    ]
    out = ES2.rare_terms(_docs(spark, rows), k=50).collect()
    by = {r["term"]: r["doc_count"] for r in out}
    assert "a b c" not in by
    assert by["x y z"] == 2 and by["p q r"] == 1
    counts = [r["doc_count"] for r in out]
    assert counts == sorted(counts)


def test_rare_terms_duplicate_shingle_in_doc_counts_once(spark):
    # 'm m m m' yields shingle 'm m m' twice in ONE doc -> doc_count 1
    out = ES2.rare_terms(
        _docs(spark, [(0, "m m m m", "en", "s")]), k=10
    ).collect()
    by = {r["term"]: r["doc_count"] for r in out}
    assert by["m m m"] == 1


# -------------------------------------------------- auto_date_histogram


def test_auto_date_histogram_picks_smallest_fitting_interval(spark):
    # 100 minutes of events: minute rounding -> 101 buckets > 20,
    # 5-minute rounding -> 21 > 20, 30-minute -> 4 <= 20 ... wait:
    # span 6000s aligned at epoch-multiple-of-300 start gives
    # 6000/300 + 1 = 21 buckets, so the chosen interval is 1800s.
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
        for i in range(0, 101, 10)
    ]
    out = ES2.auto_date_histogram(
        _events(spark, rows), target_buckets=20
    ).collect()
    assert all(r["interval_s"] == 1800 for r in out)
    assert 1 <= len(out) <= 20
    # bucket starts are epoch-floor aligned to the interval
    for r in out:
        ts = dt.datetime.strptime(r["bucket_start"], "%Y-%m-%d %H:%M:%S")
        assert (ts - dt.datetime(1970, 1, 1)).total_seconds() % 1800 == 0


def test_auto_date_histogram_counts_and_sums(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "click", 2.0, "{}"),
        (1, t0 + dt.timedelta(seconds=30), 1, "click", 3.0, "{}"),
        (2, t0 + dt.timedelta(seconds=90), 1, "click", 5.0, "{}"),
    ]
    # 91s span: minute rounding -> 2 buckets <= 20 -> interval 60
    out = ES2.auto_date_histogram(
        _events(spark, rows), target_buckets=20
    ).collect()
    assert [r["interval_s"] for r in out] == [60, 60]
    assert [r["n_events"] for r in out] == [2, 1]
    assert [r["sum_value"] for r in out] == [5.0, 5.0]


# ------------------------------------------------- date_histogram_dense


def test_date_histogram_dense_zero_fills_day_aligned_span(spark):
    t0 = dt.datetime(2024, 3, 5, 6, 15, 0)
    rows = [
        (0, t0, 1, "error", 2.5, "{}"),
        (1, t0 + dt.timedelta(hours=3), 1, "error", 1.5, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "click", 9.0, "{}"),  # filtered
    ]
    out = ES2.date_histogram_dense(_events(spark, rows)).collect()
    # extended bounds: the full day 00:00..23:00 -> 24 hourly buckets
    assert len(out) == 24
    assert out[0]["hour"] == "2024-03-05 00:00:00"
    assert out[-1]["hour"] == "2024-03-05 23:00:00"
    by = {r["hour"]: r for r in out}
    assert by["2024-03-05 06:00:00"]["n_events"] == 1
    assert by["2024-03-05 06:00:00"]["sum_value"] == 2.5
    assert by["2024-03-05 09:00:00"]["sum_value"] == 1.5
    # the click event never leaks in; empty hours are explicit zeros
    assert by["2024-03-05 07:00:00"]["n_events"] == 0
    assert by["2024-03-05 07:00:00"]["sum_value"] == 0.0
    n_zero = sum(1 for r in out if r["n_events"] == 0)
    assert n_zero == 22


# --------------------------------------------- variable_width_histogram


def test_variable_width_histogram_splits_on_largest_gaps(spark):
    # value axis 1,2,3 | 100,101 | 1000 — the two largest gaps (97,
    # 899) are the k-1=2 boundaries; duplicates weight n_rows only
    rows = [(i, float(v)) for i, v in enumerate([1, 2, 3, 100, 101, 1000, 100])]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    out = ES2.variable_width_histogram(df, k=3).collect()
    assert [r["cluster_id"] for r in out] == [0, 1, 2]
    assert [(r["min_val"], r["max_val"]) for r in out] == [
        (1.0, 3.0),
        (100.0, 101.0),
        (1000.0, 1000.0),
    ]
    assert [r["n_values"] for r in out] == [3, 2, 1]
    assert [r["n_rows"] for r in out] == [3, 3, 1]
    # avg of cluster 1 weights the duplicated 100: (100*2 + 101)/3
    assert out[1]["avg_val"] == pytest.approx(round(301 / 3 + 1e-9, 4))


def test_variable_width_histogram_coarse_edges_do_not_affect_result(spark):
    # the coarse range choice balances work, never results: any edge
    # placement (including edges splitting the clusters) yields the
    # same histogram
    rows = [(i, float(v)) for i, v in enumerate([1, 2, 3, 100, 101, 1000])]
    df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
    a = ES2.variable_width_histogram(df, k=3).collect()
    b = ES2.variable_width_histogram(
        df, k=3, coarse_edges=(2.5, 100.5, 500.0)
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---------------------------------------------------------- boxplot_agg


def test_boxplot_tukey_fences_and_outliers(spark):
    # group A: 0..8 plus an outlier 1000; exact quartiles over the 10
    # values via numpy-linear interpolation (Spark `percentile` ==
    # DuckDB quantile_cont), fences from the rounded quartiles
    import numpy as np

    vals = [float(v) for v in range(9)] + [1000.0]
    rows = [(i, v, "A") for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_extendedprice double, l_returnflag string"
    )
    out = ES2.boxplot_agg(df).collect()
    assert len(out) == 1
    r = out[0]
    q1, q2, q3 = (round(float(np.percentile(vals, p)), 4) for p in (25, 50, 75))
    assert (r["q1"], r["q2"], r["q3"]) == (q1, q2, q3)
    lo, hi = round(q1 - 1.5 * (q3 - q1), 4), round(q3 + 1.5 * (q3 - q1), 4)
    in_fence = [v for v in vals if lo <= v <= hi]
    assert r["whisker_lo"] == round(min(in_fence) + 1e-9, 2)
    assert r["whisker_hi"] == round(max(in_fence) + 1e-9, 2)
    assert r["n_outliers"] == len(vals) - len(in_fence) == 1
    assert r["n_rows"] == 10


def test_grouped_quantiles_exact_matches_percentile_aggregate(spark):
    # the two-phase grid-rank quantile must reproduce Spark's exact
    # `percentile` aggregate at the 4dp pin over adversarial shapes:
    # ties (few distinct values), singleton and two-row groups, and a
    # seeded random spread — any mismatch means the rank/interpolation
    # arithmetic drifted from the quantile_cont contract
    import random

    rng = random.Random(411)
    rows = []
    for i in range(500):
        rows.append((i, float(rng.choice([1.0, 2.0, 7.5])), "ties"))
    for i in range(500, 1500):
        rows.append((i, round(rng.uniform(0, 100_000), 2), "spread"))
    rows.append((2000, 42.5, "single"))
    rows.append((2001, 1.0, "pair"))
    rows.append((2002, 2.0, "pair"))
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_extendedprice double, l_returnflag string"
    )
    from flink_elasticsearch_ingestion_spark.operators.es_aggs2 import (
        grouped_quantiles_exact,
    )

    got = {
        r["l_returnflag"]: (r["q_0.25"], r["q_0.5"], r["q_0.75"])
        for r in grouped_quantiles_exact(
            df, "l_extendedprice", "l_returnflag"
        ).collect()
    }
    exp = {
        r["l_returnflag"]: (r["e1"], r["e2"], r["e3"])
        for r in df.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("e1"),
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("e2"),
            F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("e3"),
        )
        .collect()
    }
    assert got == exp


def test_grouped_quantiles_coarse_edges_do_not_affect_result(spark):
    rows = [(i, float(i * 3 % 101), "g") for i in range(200)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_extendedprice double, l_returnflag string"
    )
    from flink_elasticsearch_ingestion_spark.operators.es_aggs2 import (
        grouped_quantiles_exact,
    )

    a = grouped_quantiles_exact(df, "l_extendedprice", "l_returnflag").collect()
    b = grouped_quantiles_exact(
        df, "l_extendedprice", "l_returnflag", coarse_edges=(13.0, 50.5, 77.0)
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --------------------------------------------------------- welch_t_test


def test_welch_t_test_formula(spark):
    # arms with distinct means and variances; replicate the exact
    # rounded-sums arithmetic the operator (and oracle) use
    a = [10.0, 12.0, 14.0, 16.0]
    b = [1.0, 2.0, 3.0]
    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "purchase", v, "{}")
        for i, v in enumerate(a)
    ] + [
        (10 + i, dt.datetime(2024, 1, 1), 1, "error", v, "{}")
        for i, v in enumerate(b)
    ]
    out = ES2.welch_t_test(_events(spark, rows)).collect()[0]
    na, nb = len(a), len(b)
    sa, sb = round(sum(a) + 1e-9, 2), round(sum(b) + 1e-9, 2)
    qa = round(sum(v * v for v in a) + 1e-9, 2)
    qb = round(sum(v * v for v in b) + 1e-9, 2)
    ma, mb = round(sa / na + 1e-9, 6), round(sb / nb + 1e-9, 6)
    va = round((qa - sa * sa / na) / (na - 1) + 1e-9, 6)
    vb = round((qb - sb * sb / nb) / (nb - 1) + 1e-9, 6)
    t = round((ma - mb) / math.sqrt(va / na + vb / nb) + 1e-9, 4)
    dfw = round(
        (va / na + vb / nb) ** 2
        / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        + 1e-9,
        2,
    )
    assert (out["n_a"], out["n_b"]) == (na, nb)
    assert (out["mean_a"], out["mean_b"]) == (ma, mb)
    assert (out["var_a"], out["var_b"]) == (va, vb)
    assert out["t_stat"] == t and out["df_welch"] == dfw
    assert out["significant"] == (abs(t) > 1.96)


# ------------------------------------------------------ categorize_text


def test_categorize_text_masks_digits_into_templates(spark):
    rows = [
        (3, dt.datetime(2024, 1, 1), 7, "click", 42.9, '{"k": 5}'),
        (4, dt.datetime(2024, 1, 1), 8, "click", 7.0, '{"k": 88}'),
        (5, dt.datetime(2024, 1, 1), 7, "error", 1.0, '{"k": 1}'),
    ]
    out = ES2.categorize_text(_events(spark, rows)).collect()
    by = {r["category"]: r for r in out}
    # event 3 (id % 3 == 0) carries the retry marker; digits in
    # user/value/props AND in the marker itself all mask to <num>
    t_retry = 'click user=<num> value=<num> props={"k": <num>} retry=<num>'
    t_plain = 'click user=<num> value=<num> props={"k": <num>}'
    t_err = 'error user=<num> value=<num> props={"k": <num>}'
    assert by[t_retry]["n_events"] == 1 and by[t_retry]["first_event"] == 3
    assert by[t_plain]["n_events"] == 1 and by[t_plain]["first_event"] == 4
    assert by[t_err]["n_users"] == 1
    assert len(out) == 3


# --------------------------------------------------------- string_stats


def test_string_stats_char_entropy_and_lengths(spark):
    # 'abab' + 'ab': six chars, a and b equally likely -> entropy
    # exactly 1 bit; lengths 4 and 2
    rows = [(0, "abab", "en", "s1"), (1, "ab", "en", "s1")]
    out = ES2.string_stats(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["source"] == "s1"
    assert r["n_docs"] == 2
    assert (r["min_len"], r["max_len"]) == (2, 4)
    assert r["avg_len"] == 3.0
    assert r["char_entropy"] == pytest.approx(1.0, abs=1e-6)


def test_string_stats_counts_spaces_as_chars(spark):
    # the char distribution includes whitespace (encoding-corruption
    # probes need it); 'a a' = {a: 2, ' ': 1}
    out = ES2.string_stats(_docs(spark, [(0, "a a", "en", "s")])).collect()[0]
    p_a, p_sp = 2 / 3, 1 / 3
    exp = -(p_a * math.log2(p_a) + p_sp * math.log2(p_sp))
    assert out["char_entropy"] == pytest.approx(exp, abs=1e-6)


# ---------------------------------------------------------- fuzzy_match


def test_fuzzy_match_prefix_blocking_and_ranking(spark):
    rows = [
        (0, "spark spork apark", "en", "s"),
        (1, "spark", "en", "s"),
    ]
    out = ES2.fuzzy_match(
        _docs(spark, rows), spark, max_dist=2, prefix_length=1, k=3
    ).collect()
    hits = {
        (r["query_term"], r["term"]): (r["distance"], r["df"])
        for r in out
        if r["term"] is not None
    }
    # 'spurk' matches spark (dist 1, df 2) and spork (dist 1, df 1);
    # 'apark' is 1 edit away but the FIRST CHAR differs -> prefix
    # blocking must exclude it (ES prefix_length semantics)
    assert hits[("spurk", "spark")] == (1, 2)
    assert hits[("spurk", "spork")] == (1, 1)
    assert ("spurk", "apark") not in hits
    # equal distance ranks by df DESC: spark before spork
    order = [r["term"] for r in out if r["query_term"] == "spurk"]
    assert order[:2] == ["spark", "spork"]
    # the no-hit probe stays visible as a null row
    zz = [r for r in out if r["query_term"] == "zzzz"]
    assert len(zz) == 1 and zz[0]["term"] is None


# ----------------------------------------------------- search_highlight


def test_search_highlight_snippet_and_edge_clamping(spark):
    rows = [
        (0, "a b c spark d e f g", "en", "s"),   # interior: full +-3
        (1, "spark x y z w", "en", "s"),          # left clamp
        (2, "q r s t u spark", "en", "s"),        # right clamp
        (3, "no match here", "en", "s"),          # filtered out
        (4, "spark spark", "en", "s"),            # both hits wrapped
    ]
    out = ES2.search_highlight(_docs(spark, rows)).collect()
    by = {r["doc_id"]: r for r in out}
    assert 3 not in by
    assert by[0]["first_pos"] == 4
    assert by[0]["snippet"] == "a b c <em>spark</em> d e f"
    assert by[1]["snippet"] == "<em>spark</em> x y z"
    assert by[2]["snippet"] == "s t u <em>spark</em>"
    # every in-snippet occurrence of the term is wrapped
    assert by[4]["snippet"] == "<em>spark</em> <em>spark</em>"


# ------------------------------------------------------------ plan pins


@pytest.mark.parametrize(
    "name",
    [
        "rare_terms",
        "date_histogram_dense",
        "boxplot_agg",
        "welch_t_test",
        "categorize_text",
        "string_stats",
        "fuzzy_match",
        "search_highlight",
    ],
)
def test_no_quadratic_join_or_fact_window(spark, name):
    from flink_elasticsearch_ingestion_spark.catalog import es_aggs2 as C

    df = C.QUERIES[name](spark, "/root/testdata/sf0.001")
    assert_no_accidental_quadratic_join(df)
    assert_no_unpartitioned_fact_window(df)


@pytest.mark.parametrize(
    "name", ["auto_date_histogram", "variable_width_histogram"]
)
def test_scalar_join_queries_have_no_cartesian_or_fact_window(spark, name):
    # these two are in SCALAR_JOIN_OK for their 1-row broadcasts; the
    # hard guarantees still hold: no cartesian, no fact window
    from flink_elasticsearch_ingestion_spark.catalog import es_aggs2 as C

    df = C.QUERIES[name](spark, "/root/testdata/sf0.001")
    assert_no_accidental_quadratic_join(df, allow_nested_loop=True)
    assert_no_unpartitioned_fact_window(df)


def test_rare_terms_cut_is_take_ordered(spark):
    # the final k-cut must be a per-partition top-k merge, never a
    # global sort
    from flink_elasticsearch_ingestion_spark.catalog import es_aggs2 as C

    plan = physical_plan(C.QUERIES["rare_terms"](spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
