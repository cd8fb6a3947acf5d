"""Catalog family: graph/mining: components, pagerank, communities, rules.

Each query (QUERIES) sits next to its DuckDB oracle (ORACLES) so
the pair is reviewed and edited together — drift between the
Spark plan and the SQL twin stays visible in one diff."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.catalog._shared import (
    _t,
)


def q_priority_spanning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: customers whose orders span EVERY order
    priority (Codd's FOR ALL query) — count-matching form: distinct
    (customer, priority) pairs, per-customer count vs a 1-row
    broadcast domain cardinality; no double NOT EXISTS, no cross
    join."""
    from flink_elasticsearch_ingestion_spark.operators.relational import (
        relational_division,
    )

    return relational_division(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_orderpriority"
    ).select(F.col("entity").alias("o_custkey"), "n_values")

def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting with degree-ordered orientation over the
    nation trade graph: orientation bounds wedge fan-out by
    O(sqrt(|E|)) per node, the standard skew-proof distributed
    formulation.  Per-node counts + a __TOTAL__ row."""
    from flink_elasticsearch_ingestion_spark.operators.graph import (
        triangle_count,
    )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
    )
    return triangle_count(edges)

def q_lp_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (2 synchronous iterations, most-
    frequent in-neighbor label, ties to the smallest) over the buyer-
    nation -> seller-nation trade graph — cluster discovery without a
    fixed cluster count; per iteration one keyed join + one argmax
    agg, both |V|-bounded."""
    from flink_elasticsearch_ingestion_spark.operators.graph import (
        label_propagation,
    )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
    )
    return label_propagation(edges, n_iter=2)

def q_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph centrality (fixed 3-iteration PageRank, damping
    0.85) over the brand co-purchase graph — the corpus-curation
    primitive behind crawl-graph quality ranking.  Each iteration is
    one keyed shuffle + one partial/final agg; dangling mass is
    redistributed uniformly so the oracle's unrolled CTE replay
    matches the power-iteration definition exactly."""
    from flink_elasticsearch_ingestion_spark.operators.graph import (
        copurchase_edges,
        pagerank_fixed,
    )

    edges = copurchase_edges(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    )
    return pagerank_fixed(edges, n_iter=3, damping=0.85)

def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift)
    between brands co-occurring in orders — Apriori-style pair mining
    with the item universe projected to a bounded attribute, so the
    within-order pair expansion stays order-width bounded."""
    from flink_elasticsearch_ingestion_spark.operators.mining import (
        basket_rules,
    )

    return basket_rules(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part"),
        min_pair_orders=20,
    )


#: driver-contract queries owned by this family (names are the
#: catalog keys the driver and the oracle gate use verbatim)
QUERIES = {
    "copurchase_pagerank": q_copurchase_pagerank,
    "basket_rules": q_basket_rules,
    "lp_communities": q_lp_communities,
    "triangle_count": q_triangle_count,
    "priority_spanning_customers": q_priority_spanning_customers,
}

#: DuckDB oracle per query — keys MUST be a subset of QUERIES
ORACLES = {
    "priority_spanning_customers": (
        "WITH p AS (SELECT DISTINCT o_custkey, o_orderpriority"
        "  FROM orders),"
        " need AS (SELECT count(DISTINCT o_orderpriority) AS need"
        "  FROM orders)"
        " SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_values"
        " FROM p GROUP BY o_custkey"
        " HAVING count(*) = (SELECT need FROM need)"
        " ORDER BY o_custkey"
    ),
    "triangle_count": (
        "WITH raw AS (SELECT DISTINCT c_nationkey AS a,"
        "  s_nationkey AS b FROM lineitem"
        "  JOIN orders ON l_orderkey = o_orderkey"
        "  JOIN customer ON o_custkey = c_custkey"
        "  JOIN supplier ON l_suppkey = s_suppkey"
        "  WHERE c_nationkey <> s_nationkey),"
        " und AS (SELECT DISTINCT least(a, b) AS u,"
        "  greatest(a, b) AS v FROM raw WHERE a <> b),"
        " deg AS (SELECT node, count(*) AS dg FROM ("
        "  SELECT u AS node FROM und UNION ALL"
        "  SELECT v AS node FROM und) GROUP BY node),"
        " o AS (SELECT CASE WHEN du.dg < dv.dg"
        "   OR (du.dg = dv.dg AND u < v) THEN u ELSE v END AS s,"
        "  CASE WHEN du.dg < dv.dg"
        "   OR (du.dg = dv.dg AND u < v) THEN v ELSE u END AS t"
        "  FROM und JOIN deg du ON du.node = und.u"
        "  JOIN deg dv ON dv.node = und.v),"
        " w AS (SELECT o1.s AS x, o1.t AS y, o2.t AS z"
        "  FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t),"
        " c AS (SELECT s AS y, t AS z FROM o UNION ALL"
        "  SELECT t AS y, s AS z FROM o),"
        " tri AS (SELECT w.x, w.y, w.z FROM w"
        "  JOIN c ON c.y = w.y AND c.z = w.z),"
        " pn AS (SELECT CAST(node AS VARCHAR) AS node,"
        "  CAST(count(*) AS BIGINT) AS n_triangles FROM ("
        "  SELECT x AS node FROM tri UNION ALL"
        "  SELECT y AS node FROM tri UNION ALL"
        "  SELECT z AS node FROM tri) GROUP BY 1)"
        " SELECT * FROM (SELECT * FROM pn UNION ALL"
        "  SELECT '__TOTAL__', CAST(count(*) AS BIGINT) FROM tri)"
        " ORDER BY node"
    ),
    "lp_communities": (
        "WITH e AS (SELECT DISTINCT c_nationkey AS src,"
        "  s_nationkey AS dst FROM lineitem"
        "  JOIN orders ON l_orderkey = o_orderkey"
        "  JOIN customer ON o_custkey = c_custkey"
        "  JOIN supplier ON l_suppkey = s_suppkey"
        "  WHERE c_nationkey <> s_nationkey),"
        " n AS (SELECT src AS node FROM e UNION"
        "  SELECT dst AS node FROM e),"
        " l0 AS (SELECT node, node AS label FROM n),"
        " v1 AS (SELECT e.dst AS node, l.label AS cand,"
        "  count(*) AS votes FROM e JOIN l0 l ON l.node = e.src"
        "  GROUP BY 1, 2),"
        " b1 AS (SELECT node, cand AS new_label FROM (SELECT *,"
        "  row_number() OVER (PARTITION BY node"
        "   ORDER BY votes DESC, cand ASC) AS rn FROM v1)"
        "  WHERE rn = 1),"
        " l1 AS (SELECT l0.node,"
        "  COALESCE(b1.new_label, l0.label) AS label"
        "  FROM l0 LEFT JOIN b1 ON b1.node = l0.node),"
        " v2 AS (SELECT e.dst AS node, l.label AS cand,"
        "  count(*) AS votes FROM e JOIN l1 l ON l.node = e.src"
        "  GROUP BY 1, 2),"
        " b2 AS (SELECT node, cand AS new_label FROM (SELECT *,"
        "  row_number() OVER (PARTITION BY node"
        "   ORDER BY votes DESC, cand ASC) AS rn FROM v2)"
        "  WHERE rn = 1),"
        " l2 AS (SELECT l1.node,"
        "  COALESCE(b2.new_label, l1.label) AS label"
        "  FROM l1 LEFT JOIN b2 ON b2.node = l1.node)"
        " SELECT node, label FROM l2 ORDER BY node"
    ),
    "copurchase_pagerank": (
        "WITH it AS (SELECT DISTINCT l_orderkey AS okey,"
        "  p_brand AS item FROM lineitem"
        "  JOIN part ON l_partkey = p_partkey),"
        " e AS (SELECT DISTINCT a.item AS src, b.item AS dst"
        "  FROM it a JOIN it b ON a.okey = b.okey"
        "  WHERE a.item <> b.item),"
        " n AS (SELECT src AS node FROM e UNION"
        "  SELECT dst AS node FROM e),"
        " d AS (SELECT n.node,"
        "  CAST(COALESCE(o.od, 0) AS BIGINT) AS out_degree"
        "  FROM n LEFT JOIN (SELECT src, count(*) AS od FROM e"
        "   GROUP BY src) o ON o.src = n.node),"
        " nv AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM d),"
        " r0 AS (SELECT node, out_degree, CAST(1.0 AS DOUBLE)"
        "  AS pr FROM d),"
        " r1 AS (SELECT d.node, d.out_degree,"
        "  0.15 + 0.85 * (COALESCE(m.in_mass, 0.0) + dm.dm / nv.nn)"
        "   AS pr FROM d CROSS JOIN nv CROSS JOIN"
        "  (SELECT COALESCE(sum(pr), 0.0) AS dm FROM r0"
        "   WHERE out_degree = 0) dm"
        "  LEFT JOIN (SELECT e.dst, sum(r.pr / r.out_degree)"
        "   AS in_mass FROM e JOIN r0 r ON r.node = e.src"
        "   GROUP BY e.dst) m ON m.dst = d.node),"
        " r2 AS (SELECT d.node, d.out_degree,"
        "  0.15 + 0.85 * (COALESCE(m.in_mass, 0.0) + dm.dm / nv.nn)"
        "   AS pr FROM d CROSS JOIN nv CROSS JOIN"
        "  (SELECT COALESCE(sum(pr), 0.0) AS dm FROM r1"
        "   WHERE out_degree = 0) dm"
        "  LEFT JOIN (SELECT e.dst, sum(r.pr / r.out_degree)"
        "   AS in_mass FROM e JOIN r1 r ON r.node = e.src"
        "   GROUP BY e.dst) m ON m.dst = d.node),"
        " r3 AS (SELECT d.node, d.out_degree,"
        "  0.15 + 0.85 * (COALESCE(m.in_mass, 0.0) + dm.dm / nv.nn)"
        "   AS pr FROM d CROSS JOIN nv CROSS JOIN"
        "  (SELECT COALESCE(sum(pr), 0.0) AS dm FROM r2"
        "   WHERE out_degree = 0) dm"
        "  LEFT JOIN (SELECT e.dst, sum(r.pr / r.out_degree)"
        "   AS in_mass FROM e JOIN r2 r ON r.node = e.src"
        "   GROUP BY e.dst) m ON m.dst = d.node)"
        " SELECT node, out_degree, round(pr + 1e-9, 6)"
        "  AS rank_score FROM r3 ORDER BY node"
    ),
    "basket_rules": (
        "WITH it AS (SELECT DISTINCT l_orderkey AS okey,"
        "  p_brand AS item FROM lineitem"
        "  JOIN part ON l_partkey = p_partkey),"
        " nn AS (SELECT CAST(count(DISTINCT okey) AS DOUBLE)"
        "  AS nd FROM it),"
        " io AS (SELECT item, count(*) AS item_orders FROM it"
        "  GROUP BY item),"
        " p AS (SELECT a.item AS ante, b.item AS cons,"
        "  count(*) AS pair_orders"
        "  FROM it a JOIN it b ON a.okey = b.okey"
        "  WHERE a.item <> b.item GROUP BY 1, 2"
        "  HAVING count(*) >= 20)"
        " SELECT ante, cons, CAST(pair_orders AS BIGINT)"
        "  AS pair_orders,"
        " round(pair_orders / nd + 1e-9, 6) AS support,"
        " round(pair_orders / CAST(ia.item_orders AS DOUBLE)"
        "  + 1e-9, 6) AS confidence,"
        " round((pair_orders / CAST(ia.item_orders AS DOUBLE))"
        "  / (ic.item_orders / nd) + 1e-9, 6) AS lift"
        " FROM p CROSS JOIN nn"
        " JOIN io ia ON ia.item = p.ante"
        " JOIN io ic ON ic.item = p.cons"
        " ORDER BY ante, cons"
    ),
}
