"""Units for graph centrality (pagerank_fixed) and market-basket
association rules (basket_rules) — hand-computed tiny fixtures."""

import math

import pytest

from flink_elasticsearch_ingestion_spark.operators.graph import (
    copurchase_edges,
    degree_stats,
    pagerank_fixed,
)
from flink_elasticsearch_ingestion_spark.operators.mining import basket_rules


def _py_pagerank(edges, n_iter=3, damping=0.85):
    """Reference power iteration mirroring the operator's definition."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    out = {n: 0 for n in nodes}
    for s, _ in e:
        out[s] += 1
    rank = {n: 1.0 for n in nodes}
    nn = float(len(nodes))
    for _ in range(n_iter):
        dm = sum(rank[n] for n in nodes if out[n] == 0)
        in_mass = {n: 0.0 for n in nodes}
        for s, d in e:
            in_mass[d] += rank[s] / out[s]
        rank = {
            n: (1 - damping) + damping * (in_mass[n] + dm / nn)
            for n in nodes
        }
    return rank


def test_pagerank_star_center_dominates(spark):
    # star: every leaf points at the hub, hub points back at leaf 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in pagerank_fixed(df).collect()}
    ref = _py_pagerank(edges)
    for n, want in ref.items():
        assert got[n]["rank_score"] == pytest.approx(want, abs=2e-6)
    hub = got[0]["rank_score"]
    assert all(hub > got[n]["rank_score"] for n in range(2, 6))


def test_pagerank_dangling_mass_conserved(spark):
    # 1 -> 2 -> 3, node 3 dangles; total rank must stay |V|
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank_fixed(df, n_iter=4).collect()
    ref = _py_pagerank(edges, n_iter=4)
    for r in rows:
        assert r["rank_score"] == pytest.approx(ref[r["node"]], abs=2e-6)
    assert math.isclose(
        sum(r["rank_score"] for r in rows), 3.0, abs_tol=1e-4
    )


def test_pagerank_duplicate_edges_collapse(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {r["node"]: r["rank_score"] for r in pagerank_fixed(df).collect()}
    # after dedup the graph is symmetric: both nodes identical
    assert got[1] == pytest.approx(got[2], abs=1e-9)


def test_pagerank_rejects_zero_iterations(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank_fixed(df, n_iter=0)


def test_degree_stats_counts(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 3)], "src long, dst long"
    )
    got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in
           degree_stats(df).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (0, 2)}


def _basket_fixture(spark):
    # orders: 1:{A,B}, 2:{A,B}, 3:{A,C}, 4:{B}, 5:{A,B,C}
    li = [
        (1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 12),
        (4, 11), (5, 10), (5, 11), (5, 12), (5, 10),  # dup part in 5
    ]
    part = [(10, "A"), (11, "B"), (12, "C")]
    li_df = spark.createDataFrame(
        li, "l_orderkey long, l_partkey long"
    )
    part_df = spark.createDataFrame(part, "p_partkey long, p_brand string")
    return li_df, part_df


def test_basket_rules_hand_counts(spark):
    li_df, part_df = _basket_fixture(spark)
    out = {(r["ante"], r["cons"]): r for r in
           basket_rules(li_df, part_df, min_pair_orders=1).collect()}
    # orders with A: 4 (1,2,3,5); B: 4 (1,2,4,5); C: 2 (3,5); N=5
    ab = out[("A", "B")]
    assert ab["pair_orders"] == 3
    assert ab["support"] == pytest.approx(3 / 5, abs=2e-6)
    assert ab["confidence"] == pytest.approx(3 / 4, abs=2e-6)
    assert ab["lift"] == pytest.approx((3 / 4) / (4 / 5), abs=2e-6)
    ca = out[("C", "A")]
    assert ca["pair_orders"] == 2
    assert ca["confidence"] == pytest.approx(1.0, abs=2e-6)
    assert ca["lift"] == pytest.approx(1.0 / (4 / 5), abs=2e-6)
    # symmetric counts, asymmetric confidence
    assert out[("B", "A")]["pair_orders"] == 3
    assert out[("A", "C")]["confidence"] == pytest.approx(2 / 4, abs=2e-6)


def test_basket_rules_min_support_prunes(spark):
    li_df, part_df = _basket_fixture(spark)
    out = basket_rules(li_df, part_df, min_pair_orders=3).collect()
    kept = {(r["ante"], r["cons"]) for r in out}
    assert kept == {("A", "B"), ("B", "A")}


def test_copurchase_edges_symmetric_and_distinct(spark):
    li_df, part_df = _basket_fixture(spark)
    e = {(r["src"], r["dst"]) for r in
         copurchase_edges(li_df, part_df).collect()}
    assert ("A", "B") in e and ("B", "A") in e
    assert ("B", "C") in e  # via order 5
    assert all(s != d for s, d in e)


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

import hashlib
import math as _math

from flink_elasticsearch_ingestion_spark.operators.sampling import (
    dsir_importance_weights,
)


def _py_dsir(docs, target_lang="en", n_buckets=16):
    """Pure-Python replica of the operator's definition."""
    h31 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2147483647
    per_doc = {}
    ct, cr = {}, {}
    for doc_id, lang, text in docs:
        counts = {}
        for t in text.split():
            b = h31(t) % n_buckets
            counts[b] = counts.get(b, 0) + 1
        per_doc[doc_id] = (lang, counts)
        tgt = ct if lang == target_lang else cr
        for b, c in counts.items():
            tgt[b] = tgt.get(b, 0) + c
    tt, tr = sum(ct.values()), sum(cr.values())
    out = {}
    for doc_id, (lang, counts) in per_doc.items():
        llr = sum(
            c
            * (
                _math.log((ct.get(b, 0) + 1) / (tt + n_buckets))
                - _math.log((cr.get(b, 0) + 1) / (tr + n_buckets))
            )
            for b, c in counts.items()
        )
        out[doc_id] = (lang, sum(counts.values()), llr)
    return out


def test_dsir_weights_match_python_replica(spark):
    docs = [
        (1, "en", "alpha beta alpha gamma"),
        (2, "en", "alpha beta beta"),
        (3, "fr", "zut alors zut"),
        (4, "fr", "alors gamma zut zut"),
        (5, "de", "doch alpha doch"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r for r in
           dsir_importance_weights(df, n_buckets=16).collect()}
    ref = _py_dsir(docs, n_buckets=16)
    assert set(got) == set(ref)
    for d, (lang, n_tok, llr) in ref.items():
        assert got[d]["lang"] == lang
        assert got[d]["n_tokens"] == n_tok
        assert got[d]["llr"] == round(llr + 1e-9, 6) or abs(
            got[d]["llr"] - llr
        ) < 2e-6


def test_dsir_target_typical_doc_scores_higher(spark):
    # target (en) vocabulary is disjoint from the raw pool's, so an
    # en-vocab doc must outscore a raw-vocab doc of equal length
    docs = (
        [(i, "en", "aa bb cc dd") for i in range(10)]
        + [(100 + i, "fr", "xx yy zz ww") for i in range(10)]
        + [(200, "zh", "aa bb cc dd"), (201, "zh", "xx yy zz ww")]
    )
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r["llr"] for r in
           dsir_importance_weights(df, n_buckets=64).collect()}
    assert got[200] > got[201]
    assert got[0] > got[100]


# ---------------------------------------------------------------------------
# Chi-square term-class association
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.text import chi2_terms


def test_chi2_planted_class_term_dominates(spark):
    # "aaa" appears in EVERY en doc and NO other doc -> maximal
    # association; "common" is in every doc -> chi2 exactly 0
    docs = (
        [(i, "en", "aaa common filler" + str(i % 3)) for i in range(10)]
        + [(100 + i, "fr", "bbb common filler" + str(i % 3)) for i in range(10)]
    )
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    out = chi2_terms(df, min_doc_freq=2, top_k=3).collect()
    by_cls = {}
    for r in out:
        by_cls.setdefault(r["cls"], []).append(r)
    assert by_cls["en"][0]["term"] in {"aaa", "bbb"}  # both maximally split
    top_en = {r["term"] for r in by_cls["en"][:2]}
    assert top_en == {"aaa", "bbb"}  # perfect pos + perfect neg association
    common = [r for r in out if r["term"] == "common"]
    assert all(r["chi2"] == pytest.approx(0.0, abs=1e-9) for r in common)
    # hand-check the perfect-association value: chi2 == N
    aaa_en = [r for r in by_cls["en"] if r["term"] == "aaa"][0]
    assert aaa_en["chi2"] == pytest.approx(20.0, abs=1e-6)
    assert aaa_en["present_in_class"] == 10 and aaa_en["doc_freq"] == 10


def test_chi2_min_doc_freq_prunes_rare_terms(spark):
    docs = [(1, "en", "rare shared"), (2, "fr", "shared"), (3, "fr", "shared x")]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    out = chi2_terms(df, min_doc_freq=2, top_k=5).collect()
    assert "rare" not in {r["term"] for r in out}


# ---------------------------------------------------------------------------
# MMR re-ranking
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.similarity import mmr_rerank


def test_mmr_prefers_diverse_over_redundant(spark):
    # vecs 1,2 are near-clones; vec 3 is less relevant but diverse.
    # Pure relevance ranks [2,1,3]; MMR demotes the clone of the top
    # pick and selects 3 second (hand-computed: scores 0.089 vs -0.014)
    rows = [
        (1, [1.0, 0.05, 0.0]),
        (2, [0.98, 0.08, 0.0]),
        (3, [0.5, 0.85, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(df, [0.9, 0.3, 0.0], k=3, pool=3, lam=0.5).collect()
    order = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [2, 3, 1]
    assert out[0]["rel"] == pytest.approx(0.971267, abs=1e-6)
    assert out[1]["mmr_score"] == pytest.approx(0.089051, abs=1e-6)


def test_mmr_lambda_one_degenerates_to_relevance(spark):
    rows = [(i, [1.0 - 0.01 * i, 0.1 * i, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(df, [1.0, 0.0, 0.0], k=4, pool=6, lam=1.0).collect()
    order = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [0, 1, 2, 3]


def test_mmr_k_capped_by_pool(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_rerank(df, [1.0, 0.0], k=10, pool=5).collect()
    assert len(out) == 2


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.similarity import (
    pq_codebook,
    pq_encode,
    pq_search_adc,
)


def test_pq_encode_exact_centroids_get_their_code(spark):
    # hand codebook: 2 subspaces x 2 centroids of 2 dims
    cb = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[2.0, 0.0], [0.0, 2.0]],
    ]
    rows = [
        (1, [1.0, 0.0, 2.0, 0.0]),   # = (c0, c0) -> codes (0, 0)
        (2, [0.0, 1.0, 0.0, 2.0]),   # = (c1, c1) -> codes (1, 1)
        (3, [0.9, 0.1, 0.1, 1.9]),   # nearest (c0, c1)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["code0"], r["code1"]) for r in
           pq_encode(df, cb).collect()}
    assert got == {1: (0, 0), 2: (1, 1), 3: (0, 1)}


def test_pq_adc_ranks_code_identical_vector_first(spark):
    cb = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[2.0, 0.0], [0.0, 2.0]],
    ]
    rows = [
        (1, [1.0, 0.0, 2.0, 0.0]),   # codes (0,0) — matches the query's
        (2, [0.0, 1.0, 0.0, 2.0]),   # codes (1,1) — far
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_search_adc(df, [1.0, 0.0, 2.0, 0.0], cb, k=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    # the query IS centroid (0,0): its ADC distance to codes (0,0) is 0
    assert out[0]["adc_dist"] == pytest.approx(0.0, abs=1e-6)
    assert out[1]["adc_dist"] > 1.0


def test_pq_default_codebook_shape_and_determinism():
    cb1, cb2 = pq_codebook(), pq_codebook()
    assert cb1 == cb2
    assert len(cb1) == 4 and len(cb1[0]) == 8 and len(cb1[0][0]) == 16


def test_pq_encode_is_shuffle_free(spark, sf_dir):
    import __spark_entry__ as E
    from flink_elasticsearch_ingestion_spark.plans import physical_plan

    plan = physical_plan(E.queries()["pq_encode"](spark, sf_dir))
    body = plan.split("Sort")[0]  # final presentation sort excepted
    assert "Exchange hashpartitioning" not in body


# ---------------------------------------------------------------------------
# Zipf fit, target encoding, k-anonymity
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.quality import (
    k_anonymity_audit,
)
from flink_elasticsearch_ingestion_spark.operators.relational import (
    target_encode,
)
from flink_elasticsearch_ingestion_spark.operators.text import zipf_fit


def test_zipf_fit_matches_ols_replica(spark):
    # freqs 8,4,2,1 at ranks 1..4: perfect ln-ln line, slope = -1.5?
    # compute the exact OLS in python and compare
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame(
        [(1, "en", text)], "doc_id long, lang string, text string"
    )
    out = zipf_fit(df).collect()
    assert len(out) == 1
    xs = [_math.log(r) for r in (1, 2, 3, 4)]
    ys = [_math.log(f) for f in (8, 4, 2, 1)]
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r = out[0]
    assert r["n_terms"] == 4
    assert r["slope"] == pytest.approx(slope, abs=2e-6)
    assert r["intercept"] == pytest.approx(intercept, abs=2e-6)
    assert r["slope"] < -1.0  # steeper than natural text: tiny corpus


def test_zipf_fit_tie_break_is_deterministic(spark):
    # all terms equal freq: slope must be exactly 0
    df = spark.createDataFrame(
        [(1, "en", "x y z w")], "doc_id long, lang string, text string"
    )
    r = zipf_fit(df).collect()[0]
    assert r["slope"] == pytest.approx(0.0, abs=1e-9)


def test_target_encode_shrinks_rare_categories(spark):
    rows = [("A", 100.0)] * 50 + [("B", 0.0)]
    df = spark.createDataFrame(rows, "cat string, t double")
    out = {r["cat"]: r for r in
           target_encode(df, "cat", "t", smoothing=10.0).collect()}
    gmean = (50 * 100.0) / 51
    assert out["A"]["raw_mean"] == pytest.approx(100.0, abs=1e-4)
    # A: (5000 + 10*gmean) / 60 ; B: (0 + 10*gmean) / 11
    assert out["A"]["encoded"] == pytest.approx(
        (5000 + 10 * gmean) / 60, abs=1e-4
    )
    assert out["B"]["encoded"] == pytest.approx(10 * gmean / 11, abs=1e-4)
    # the rare category lands near the global mean, not its raw 0
    assert abs(out["B"]["encoded"] - gmean) < abs(0.0 - gmean)


def test_k_anonymity_flags_small_groups(spark):
    rows = [("US", "A")] * 6 + [("US", "B")] * 2 + [("FR", "A")]
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = {r["qi_values"]: r for r in
           k_anonymity_audit(df, ["nation", "seg"], k=5).collect()}
    assert set(out) == {"US|B", "FR|A", "__TOTAL__"}
    assert out["US|B"]["group_size"] == 2
    assert out["FR|A"]["group_size"] == 1
    assert out["__TOTAL__"]["group_size"] == 2      # two risky groups
    assert out["__TOTAL__"]["at_risk_rows"] == 3    # 2 + 1 exposed rows


def test_k_anonymity_clean_table_reports_zero(spark):
    rows = [("US", "A")] * 6 + [("FR", "B")] * 5
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = k_anonymity_audit(df, ["nation", "seg"], k=5).collect()
    assert len(out) == 1
    assert out[0]["qi_values"] == "__TOTAL__"
    assert out[0]["group_size"] == 0 and out[0]["at_risk_rows"] == 0


def test_k_anonymity_requires_columns(spark):
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError, match="QI column"):
        k_anonymity_audit(df, [], k=5)


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.graph import (
    label_propagation,
)


def test_label_propagation_two_cliques_converge(spark):
    # two directed 3-cliques, no cross edges: each collapses to its
    # own minimum node label
    cl1 = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    cl2 = [(a, b) for a in (7, 8, 9) for b in (7, 8, 9) if a != b]
    df = spark.createDataFrame(cl1 + cl2, "src long, dst long")
    got = {r["node"]: r["label"] for r in
           label_propagation(df, n_iter=3).collect()}
    assert {got[1], got[2], got[3]} == {1}
    assert {got[7], got[8], got[9]} == {7}


def test_label_propagation_tie_breaks_to_smallest(spark):
    # node 5 hears one vote each from 2 and 9 -> tie -> label 2
    df = spark.createDataFrame([(2, 5), (9, 5)], "src long, dst long")
    got = {r["node"]: r["label"] for r in
           label_propagation(df, n_iter=1).collect()}
    assert got[5] == 2
    # sources have no in-edges: they keep their own labels
    assert got[2] == 2 and got[9] == 9


def test_label_propagation_string_labels(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "c")], "src string, dst string"
    )
    got = {r["node"]: r["label"] for r in
           label_propagation(df, n_iter=1).collect()}
    assert got["c"] == "a"  # tie -> lexicographically smallest


def test_label_propagation_rejects_zero_iter(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        label_propagation(df, n_iter=0)


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

import datetime

from flink_elasticsearch_ingestion_spark.operators.relational import (
    rfm_segments,
)


def test_rfm_scores_extremes_correctly(spark):
    # 10 customers with strictly increasing frequency/monetary and
    # decreasing recency: best customer must land in (5,5,5)-ish top
    # cell, worst in the bottom
    base = datetime.datetime(2024, 1, 1)
    rows = []
    okey = 0
    for c in range(10):
        for o in range(c + 1):  # frequency 1..10
            okey += 1
            rows.append(
                (okey, c, base + datetime.timedelta(days=30 * c + o),
                 1000.0 * (c + 1))
            )
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double"
    )
    segs = rfm_segments(df).collect()
    # scores stay in range and both extremes exist
    for r in segs:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
    tops = [r for r in segs if r["f_score"] == 5 and r["m_score"] == 5
            and r["r_score"] == 5]
    assert tops and sum(r["n_customers"] for r in tops) >= 1
    total = sum(r["n_customers"] for r in segs)
    assert total == 10


# ---------------------------------------------------------------------------
# Touch attribution
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.windows import (
    touch_attribution,
)


def test_touch_attribution_first_vs_last(spark):
    # user 1: view(t1) -> click(t2) -> purchase(t3, $10)
    #   first-touch = view, last-touch = click
    # user 2: purchase with no prior touch -> __NONE__
    rows = [
        (1, 1, 100, "view", 0.0),
        (2, 1, 200, "click", 0.0),
        (3, 1, 300, "purchase", 10.0),
        (4, 2, 100, "purchase", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string,"
        " value double"
    )
    out = {r["touch_type"]: r for r in touch_attribution(df).collect()}
    assert out["view"]["n_first"] == 1
    assert out["view"]["value_first"] == pytest.approx(10.0)
    assert out["view"]["n_last"] == 0
    assert out["click"]["n_last"] == 1
    assert out["click"]["value_last"] == pytest.approx(10.0)
    assert out["click"]["n_first"] == 0
    assert out["__NONE__"]["n_first"] == 1
    assert out["__NONE__"]["value_first"] == pytest.approx(7.0)
    assert out["__NONE__"]["n_last"] == 1


def test_touch_attribution_ignores_prior_purchases_as_touches(spark):
    # a purchase is never a touch: second purchase attributes to the
    # click, not to the first purchase
    rows = [
        (1, 1, 100, "click", 0.0),
        (2, 1, 200, "purchase", 5.0),
        (3, 1, 300, "purchase", 6.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string,"
        " value double"
    )
    out = {r["touch_type"]: r for r in touch_attribution(df).collect()}
    assert set(out) == {"click"}
    assert out["click"]["n_last"] == 2
    assert out["click"]["value_last"] == pytest.approx(11.0)


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.graph import triangle_count


def test_triangle_count_known_graphs(spark):
    # K4 has exactly 4 triangles; each node sits in 3 of them
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(k4, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got["__TOTAL__"] == 4
    assert all(got[str(n)] == 3 for n in range(4))


def test_triangle_count_path_has_none(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {"__TOTAL__": 0}


def test_triangle_count_direction_and_dup_invariant(spark):
    # one triangle expressed with mixed directions and duplicates
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (3, 1), (1, 3)],
        "src long, dst long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got["__TOTAL__"] == 1
    assert got["1"] == got["2"] == got["3"] == 1


# ---------------------------------------------------------------------------
# Revenue anomaly detection
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.quality import (
    revenue_anomalies,
)


def test_revenue_anomalies_flags_planted_spike(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    okey = 0
    for d in range(30):
        okey += 1
        # steady 100 +- tiny wiggle; day 20 is a 10x spike
        v = 1000.0 if d == 20 else 100.0 + (d % 3)
        rows.append((okey, base + datetime.timedelta(days=d), v))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {r["day"].day: r for r in revenue_anomalies(df).collect()
           if r["day"].month == 1}
    out.update({r["day"].day + 31: r for r in revenue_anomalies(df).collect()
                if r["day"].month == 2})
    flagged = [d for d, r in out.items() if r["is_anomaly"]]
    assert flagged == [21]  # day index 20 -> Jan 21
    # early days lack history: unscored, never flagged
    assert out[1]["z"] is None and not out[1]["is_anomaly"]
    assert out[5]["z"] is None  # only 4 prior days < min_history


def test_revenue_anomalies_steady_series_clean(spark):
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base + datetime.timedelta(days=i), 100.0 + (i % 5))
            for i in range(25)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = revenue_anomalies(df).collect()
    assert not any(r["is_anomaly"] for r in out)
    assert len(out) == 25


# ---------------------------------------------------------------------------
# Quantile normalization
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.text import (
    quantile_normalize_by_source,
)


def test_quantile_normalize_aligns_shifted_sources(spark):
    # source B's texts systematically longer (higher entropy) than A's,
    # but each source's INTERNAL ordering is the same; after quantile
    # normalization the i-th ranked doc of A and of B map to the same
    # global-scale value grid, and normalized values are monotone in
    # within-source rank
    docs = []
    for i in range(8):
        docs.append((i, " ".join(f"a{j}" for j in range(2 + i)), "A"))
        docs.append((100 + i, " ".join(f"b{j}" for j in range(12 + i)), "B"))
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = quantile_normalize_by_source(df).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src in ("A", "B"):
        rows = sorted(by_src[src], key=lambda r: r["source_pctile"])
        vals = [r["normalized"] for r in rows]
        assert vals == sorted(vals)  # monotone in rank
    # same percentile -> same normalized value, despite shifted raw scores
    a_by_p = {r["source_pctile"]: r["normalized"] for r in by_src["A"]}
    b_by_p = {r["source_pctile"]: r["normalized"] for r in by_src["B"]}
    shared = set(a_by_p) & set(b_by_p)
    assert shared
    for p in shared:
        assert a_by_p[p] == pytest.approx(b_by_p[p], abs=1e-9)
    # raw entropies differ systematically; normalized ranges coincide
    max_raw_a = max(r["entropy"] for r in by_src["A"])
    min_raw_b = min(r["entropy"] for r in by_src["B"])
    assert max_raw_a < min_raw_b


# ---------------------------------------------------------------------------
# Hashed random-projection embeddings
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.embeddings import (
    hash_embed_documents,
    hash_embedding_codebook,
)


def test_hash_embed_identical_docs_identical_vectors(spark):
    docs = [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
            (3, "totally different words here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = hash_embed_documents(df, dim=8)
    rows = out.collect()
    v = {}
    for r in rows:
        v.setdefault(r["doc_id"], {})[r["d"]] = r["value"]
    assert v[1] == v[2]
    assert v[1] != v[3]
    assert set(v[1]) == set(range(8))


def test_hash_embed_matches_python_replica(spark):
    docs = [(7, "x y x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["d"]: r["value"] for r in
           hash_embed_documents(df, n_buckets=32, dim=16).collect()}
    h31 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2147483647
    counts = {}
    for t in "x y x".split():
        b = h31(t) % 32
        counts[b] = counts.get(b, 0) + 1
    m = {(b, d): w for b, d, w in hash_embedding_codebook(32, 16)}
    for d in range(16):
        want = sum(c * m[(b, d)] for b, c in counts.items())
        assert got[d] == pytest.approx(want, abs=2e-6)


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.windows import (
    survival_curve,
)


def test_survival_curve_hand_computed(spark):
    DAY = 86_400_000_000  # us
    base = datetime.datetime(2024, 1, 1)
    us = lambda d: base + datetime.timedelta(days=d)
    # users 1-4 sign up day 0; 1 converts day 1, 2 converts day 2,
    # 3 never converts, 4 converts day 2.  Horizon = day 3 (an
    # unrelated event pushes max_ts).
    rows = [
        (1, 1, us(0), "signup"), (2, 2, us(0), "signup"),
        (3, 3, us(0), "signup"), (4, 4, us(0), "signup"),
        (5, 1, us(1), "purchase"),
        (6, 2, us(2), "purchase"), (7, 4, us(2), "purchase"),
        (8, 9, us(3), "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["duration_days"]: r for r in survival_curve(df).collect()}
    # KM: t=1: n=4, d=1 -> S=0.75 ; t=2: n=3, d=2 -> S=0.75*(1/3)=0.25
    # t=3: censored user 3 leaves, d=0 -> S stays 0.25
    assert out[1]["at_risk"] == 4 and out[1]["d_events"] == 1
    assert out[1]["survival"] == pytest.approx(0.75, abs=1e-6)
    assert out[2]["at_risk"] == 3 and out[2]["d_events"] == 2
    assert out[2]["survival"] == pytest.approx(0.25, abs=1e-6)
    assert out[3]["d_events"] == 0 and out[3]["n_ending"] == 1
    assert out[3]["survival"] == pytest.approx(0.25, abs=1e-6)


def test_survival_curve_all_convert_reaches_zero(spark):
    base = datetime.datetime(2024, 2, 1)
    rows = [
        (1, 1, base, "signup"),
        (2, 1, base + datetime.timedelta(days=1), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = survival_curve(df).collect()
    assert len(out) == 1
    assert out[0]["survival"] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Benford audit + market concentration
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.quality import (
    benford_check,
    market_concentration,
)


def test_benford_uniform_digits_flagged(spark):
    # equal counts of every first digit: 1 and 2 UNDER-represented
    # relative to Benford would be wrong — equal shares mean digit 1
    # (expected 30.1%) contributes the largest chi2 term
    rows = [(float(d) * 100.0,) for d in range(1, 10) for _ in range(10)]
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r for r in benford_check(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    for d in range(1, 10):
        assert out[d]["observed_share"] == pytest.approx(1 / 9, abs=1e-6)
    assert out[1]["expected_share"] == pytest.approx(0.30103, abs=1e-5)
    worst = max(out.values(), key=lambda r: r["chi2_term"])
    assert worst["digit"] == 1


def test_benford_excludes_small_values(spark):
    df = spark.createDataFrame([(0.5,), (0.0,), (123.0,)], "v double")
    out = benford_check(df, "v").collect()
    assert len(out) == 1 and out[0]["digit"] == 1 and out[0]["n_obs"] == 1


def test_market_concentration_extremes(spark):
    orders = spark.createDataFrame(
        [(i, i % 2, 100.0) for i in range(10)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(0, 0), (1, 1)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(0, "A"), (1, "B")], "n_nationkey long, n_name string"
    )
    r = market_concentration(orders, cust, nation).collect()[0]
    # two equal markets: HHI = 0.5, CR4 = 1, top = 0.5
    assert r["n_markets"] == 2
    assert r["hhi"] == pytest.approx(0.5, abs=1e-6)
    assert r["cr4"] == pytest.approx(1.0, abs=1e-6)
    assert r["top_share"] == pytest.approx(0.5, abs=1e-6)


# ---------------------------------------------------------------------------
# Classifier evaluation (precision / recall / F1)
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.text import classifier_eval


def test_classifier_eval_hand_computed(spark):
    # truth:  a a a b b  /  pred: a a b b c
    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c")]
    df = spark.createDataFrame(rows, "lang string, lang_guess string")
    out = {r["cls"]: r for r in classifier_eval(df).collect()}
    a = out["a"]
    assert (a["support"], a["n_predicted"], a["tp"]) == (3, 2, 2)
    assert a["precision"] == pytest.approx(1.0, abs=1e-6)
    assert a["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["f1"] == pytest.approx(0.8, abs=1e-6)
    b = out["b"]
    assert (b["support"], b["n_predicted"], b["tp"]) == (2, 2, 1)
    assert b["precision"] == pytest.approx(0.5, abs=1e-6)
    # c never occurs in truth: support 0, recall undefined (null)
    c = out["c"]
    assert c["support"] == 0 and c["n_predicted"] == 1 and c["tp"] == 0
    assert c["recall"] is None and c["precision"] == pytest.approx(0.0)
    micro = out["__MICRO__"]
    assert micro["support"] == 5
    assert micro["f1"] == pytest.approx(3 / 5, abs=1e-6)


# ---------------------------------------------------------------------------
# Gini coefficient
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.relational import (
    revenue_gini,
)


def _orders_df(spark, revs):
    rows = [(i, i, float(v)) for i, v in enumerate(revs)]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    )


def test_gini_equal_distribution_is_zero(spark):
    r = revenue_gini(_orders_df(spark, [100.0] * 10)).collect()[0]
    assert r["n_customers"] == 10
    assert r["gini"] == pytest.approx(0.0, abs=1e-6)


def test_gini_matches_python_reference(spark):
    revs = [10.0, 20.0, 30.0, 40.0, 400.0]
    r = revenue_gini(_orders_df(spark, revs)).collect()[0]
    xs = sorted(revs)
    n = len(xs)
    want = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (
        n * sum(xs)
    ) - (n + 1) / n
    assert r["gini"] == pytest.approx(want, abs=1e-6)
    assert r["gini"] > 0.4  # whale-dominated -> strongly unequal


def test_gini_two_phase_rank_matches_naive_edges(spark):
    # any coarse-edge choice must give identical results
    revs = [5.0, 50.0, 500.0, 5000.0, 50000.0, 2.0, 3.0]
    a = revenue_gini(_orders_df(spark, revs)).collect()[0]
    b = revenue_gini(
        _orders_df(spark, revs), coarse_edges=(4.0, 400.0, 40000.0)
    ).collect()[0]
    assert a["gini"] == b["gini"]


# ---------------------------------------------------------------------------
# EWMA forecast
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.windows import ewma_forecast


def test_ewma_constant_series_forecasts_itself(spark):
    base = datetime.datetime(2024, 5, 1)
    rows = [(i, base + datetime.timedelta(days=i), 500.0) for i in range(30)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = ewma_forecast(df).collect()
    scored = [r for r in out if r["day"] is not None and r["forecast"] is not None]
    # constant input + renormalized kernel -> exact constant forecast
    for r in scored:
        assert r["forecast"] == pytest.approx(500.0, abs=1e-3)
        assert r["abs_error"] == pytest.approx(0.0, abs=1e-3)
    mae = [r for r in out if r["day"] is None]
    assert len(mae) == 1 and mae[0]["abs_error"] == pytest.approx(0.0, abs=1e-3)
    # first 14 days lack the full kernel: unscored
    assert sum(1 for r in out if r["day"] is not None and r["forecast"] is None) == 14


def test_ewma_weights_recent_days_most(spark):
    base = datetime.datetime(2024, 6, 1)
    # 20 days at 100, then a step to 1000 for 5 days: forecast for the
    # last day must sit well above 100 (recent lags dominate) but
    # below 1000 (older lags still pull down)
    rows = [(i, base + datetime.timedelta(days=i),
             1000.0 if i >= 20 else 100.0) for i in range(25)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {r["day"]: r for r in ewma_forecast(df).collect() if r["day"]}
    last = out[base + datetime.timedelta(days=24)]
    assert 600.0 < last["forecast"] < 1000.0


def test_ewma_rejects_bad_alpha(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    with pytest.raises(ValueError, match="alpha"):
        ewma_forecast(df, alpha=1.5)


# ---------------------------------------------------------------------------
# Span corruption + k-fold split
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.sampling import kfold_split
from flink_elasticsearch_ingestion_spark.operators.text import span_corruption


def _py_span_corruption(doc_id, text, start_rate=20, span_len=3, salt="t5"):
    h31 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2147483647
    toks = text.strip().split()
    start = [h31(f"{salt}:{doc_id}:{i}") % start_rate == 0
             for i in range(len(toks))]
    masked = [any(start[i - b] for b in range(span_len) if i - b >= 0)
              for i in range(len(toks))]
    corr, tgt, run = [], [], -1
    for i, t in enumerate(toks):
        if not masked[i]:
            corr.append(t)
        elif i == 0 or not masked[i - 1]:
            run += 1
            corr.append(f"<extra_id_{run}>")
            tgt.append(f"<extra_id_{run}> {t}")
        else:
            tgt.append(t)
    return (
        len(toks), sum(masked), run + 1,
        hashlib.md5(" ".join(corr).encode()).hexdigest(),
        hashlib.md5(" ".join(tgt).encode()).hexdigest(),
    )


def test_span_corruption_matches_python_replica(spark):
    docs = [(i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_corruption(df).collect()}
    masked_somewhere = 0
    for doc_id, text in docs:
        n, nm, ns, cmd5, tmd5 = _py_span_corruption(doc_id, text)
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["n_masked"] == nm
        assert r["n_spans"] == ns
        assert r["corrupted_md5"] == cmd5
        assert r["target_md5"] == tmd5
        masked_somewhere += nm
    assert masked_somewhere > 0  # the default rate masks something


def test_kfold_split_balanced_and_complete(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(1000)], "doc_id long"
    )
    out = kfold_split(df, "doc_id", k=5).collect()
    assert len(out) == 5
    assert sum(r["n_rows"] for r in out) == 1000
    for r in out:
        assert 0.15 < r["share"] < 0.25  # roughly balanced


def test_kfold_split_rejects_k1(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="k >= 2"):
        kfold_split(df, "doc_id", k=1)


# ---------------------------------------------------------------------------
# Correlation matrix + NDCG
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.quality import (
    correlation_matrix,
)
from flink_elasticsearch_ingestion_spark.operators.text import ndcg_eval


def test_correlation_matrix_known_relationships(spark):
    rows = [(float(i), 2.0 * i, -3.0 * i, float(i % 2)) for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = {(r["col_a"], r["col_b"]): r["pearson_r"] for r in
           correlation_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert out[("a", "b")] == pytest.approx(1.0, abs=1e-6)
    assert out[("a", "c")] == pytest.approx(-1.0, abs=1e-6)
    assert abs(out[("a", "d")]) < 0.2
    assert len(out) == 6


def test_correlation_matrix_requires_two(spark):
    df = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError, match="two columns"):
        correlation_matrix(df, ["a"])


def test_ndcg_perfect_when_all_top_relevant(spark):
    # docs 0..4 contain both terms (relevant + high bm25); 5..9 only
    # one term (retrieved but irrelevant)
    docs = [(i, "alpha beta filler" + str(i)) for i in range(5)]
    docs += [(10 + i, "alpha filler" + str(i)) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = ndcg_eval(df, ["alpha", "beta"], k=10).collect()[0]
    assert r["n_relevant"] == 5
    # relevant docs score higher bm25 (extra matching term), so they
    # occupy the top ranks -> NDCG = 1
    assert r["ndcg"] == pytest.approx(1.0, abs=1e-6)


def test_ndcg_zero_when_nothing_relevant(spark):
    docs = [(i, "alpha filler" + str(i)) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = ndcg_eval(df, ["alpha", "zzz_absent"], k=10).collect()[0]
    assert r["n_relevant"] == 0
    assert r["ndcg"] == pytest.approx(0.0, abs=1e-9)
    assert r["idcg"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# YoY growth + bootstrap CI
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.sampling import bootstrap_ci
from flink_elasticsearch_ingestion_spark.operators.windows import yoy_growth


def test_yoy_growth_hand_computed(spark):
    orders = spark.createDataFrame(
        [
            (1, 1, datetime.datetime(2020, 5, 1), 100.0),
            (2, 1, datetime.datetime(2021, 5, 1), 150.0),
            (3, 1, datetime.datetime(2022, 5, 1), 75.0),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double",
    )
    cust = spark.createDataFrame([(1, 0)], "c_custkey long, c_nationkey long")
    nation = spark.createDataFrame([(0, "A")], "n_nationkey long, n_name string")
    out = {r["yr"]: r for r in yoy_growth(orders, cust, nation).collect()}
    assert out[2020]["yoy_pct"] is None
    assert out[2021]["yoy_pct"] == pytest.approx(50.0, abs=1e-4)
    assert out[2022]["yoy_pct"] == pytest.approx(-50.0, abs=1e-4)
    assert out[2022]["prev_revenue"] == pytest.approx(150.0, abs=1e-4)


def test_bootstrap_ci_covers_true_mean_and_is_deterministic(spark):
    rows = [(i, 100.0 + (i % 21)) for i in range(400)]  # mean 110
    df = spark.createDataFrame(rows, "k long, v double")
    r1 = bootstrap_ci(df, "v", "k").collect()[0]
    r2 = bootstrap_ci(df, "v", "k").collect()[0]
    assert r1 == r2  # hash-deterministic: identical reruns
    assert r1["n_rows"] == 400
    assert r1["est_mean"] == pytest.approx(110.0, abs=0.5)
    assert r1["ci_lo"] < r1["est_mean"] < r1["ci_hi"]
    # CI width for n=400, sd~6: roughly 2*1.96*6/20 ~ 1.2 — sane bounds
    assert 0.2 < r1["ci_hi"] - r1["ci_lo"] < 5.0
    assert r1["b_resamples"] == 50


def test_bootstrap_ci_salt_changes_resamples(spark):
    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v double")
    a = bootstrap_ci(df, "v", "k", salt="s1").collect()[0]
    b = bootstrap_ci(df, "v", "k", salt="s2").collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) != (b["ci_lo"], b["ci_hi"])
    # but both bracket the point estimate
    assert a["ci_lo"] < a["est_mean"] < a["ci_hi"]
    assert b["ci_lo"] < b["est_mean"] < b["ci_hi"]


# ---------------------------------------------------------------------------
# Diversified top-k
# ---------------------------------------------------------------------------

from flink_elasticsearch_ingestion_spark.operators.text import diversified_topk


def test_diversified_topk_caps_per_source(spark):
    # source A has the 5 highest-entropy docs; cap 2 forces B entries in
    docs = []
    for i in range(5):
        docs.append((i, " ".join(f"a{i}w{j}" for j in range(20 + i)), "A"))
    for i in range(5):
        docs.append((10 + i, " ".join(f"b{i}w{j}" for j in range(5 + i)), "B"))
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = diversified_topk(df, k=6, per_source_cap=2).collect()
    by_src = {}
    for r in out:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src == {"A": 2, "B": 2} or by_src.get("A", 0) <= 2
    assert all(r["src_rank"] <= 2 for r in out)
    assert len(out) == 4  # 2 per source is all that survives the cap
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks) == list(range(1, 5))
