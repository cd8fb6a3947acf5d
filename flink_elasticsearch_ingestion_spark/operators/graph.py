"""Graph analytics over edge DataFrames — link-graph centrality.

Large-scale corpus curation ranks documents by the structure of the
hyperlink graph (CommonCrawl's harmonic-centrality ranking, Google's
original PageRank): a page linked by many well-linked pages is a
higher-quality crawl seed.  The reference job (core.clj) has no graph
surface; this module supplies the Spark-first primitive the 100 TB
pipeline needs.

Execution shape, per iteration:

- one keyed shuffle: edges join ranks on ``src`` (contributions),
- one partial+final aggregation: sum contributions per ``dst``.

Ranks and degrees are tiny relative to edges (``|V| << |E|``), so at
cluster scale the rank table is broadcast- or bucket-joinable against
an edge table that never moves.  The iteration count is FIXED (a
hyperparameter, not convergence-driven), which keeps the whole
computation a static DAG — Catalyst sees every stage, and the oracle
can replay it exactly by unrolling the same number of CTE steps.

Dangling nodes (no out-edges) are handled the standard way: their rank
mass is redistributed uniformly each iteration, so total rank stays
``|V|`` and results match the power-iteration definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kcore_peel(
    edges: DataFrame,
    *,
    k: int = 2,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peel (Matula & Beck 1983, the degeneracy
    peel, truncated at ``rounds`` iterations so the whole computation
    is SQL-replayable — the kmeans_fixed discipline): repeatedly drop
    nodes of degree < ``k`` and the edges they carry, then report the
    surviving nodes with their residual degree.

    On a near-dup pair graph this separates DENSE duplication cores
    (template families, boilerplate clusters — every member ties to
    many others, surviving every peel) from star-shaped clusters (one
    canonical + leaves — the leaves peel off in round one), which is
    exactly the triage a dedup operator wants before choosing between
    cluster-representative and pairwise-drop strategies.

    Scale shape per round: one degree aggregate (explode + groupBy)
    and two semi-joins keyed by node — the iterative-graph shuffle
    pattern of ``pagerank_fixed``, with the frontier SHRINKING each
    round. ``rounds`` is a fixed small constant; full-convergence
    peeling belongs to the driver-loop family."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    for _ in range(rounds):
        deg = (
            und.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("dg"))
        )
        keep = deg.filter(F.col("dg") >= k).select("node")
        und = und.join(
            keep.withColumnRenamed("node", "u"), "u", "semi"
        ).join(keep.withColumnRenamed("node", "v"), "v", "semi")
    return (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .orderBy("node")
    )


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Duplicate (src, dst) pairs are collapsed first (a page linking the
    same target twice contributes once — the convention used by crawl
    rankers).  Rank is initialised to 1.0 per node, so values are
    centrality scores with mean 1 rather than probabilities (multiply
    by ``1/|V|`` for the stochastic form).

    Returns one row per node: ``node``, ``out_degree``,
    ``rank_score`` (rounded, engine-portable; named to dodge the
    RANK reserved word in strict SQL dialects).
    """
    if n_iter < 1:
        raise ValueError(f"pagerank_fixed requires n_iter >= 1, got {n_iter}")
    # persist the deduped edge list: every iteration joins against it,
    # and without the cache Spark re-derives the (possibly expensive)
    # upstream edge computation once per iteration PLUS once for |V|
    # (measured: 4.3 s -> ~1.5 s on the sf0.1 co-purchase graph)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_degree"))
    # |V| is a scalar: computed once, folded into the plan as a 1-row
    # broadcast (same pattern as important_part_value's threshold).
    base = nodes.join(out_deg, nodes.node == out_deg.src, "left").select(
        "node", F.coalesce("out_degree", F.lit(0)).alias("out_degree")
    ).persist()
    n_nodes = base.count()  # scalar; |V| rows, bounded; fills both caches
    ranks = base.select("node", "out_degree", F.lit(1.0).alias("rank"))
    for _ in range(n_iter):
        # mass parked on dangling nodes, redistributed uniformly
        dangling = (
            ranks.where(F.col("out_degree") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            e.join(
                # filter BEFORE the division: dangling nodes never join
                # (no out-edges), but ANSI mode hard-errors if Catalyst
                # evaluates the projection eagerly for them — a plan-
                # dependent latent crash the hypothesis sweep caught
                ranks.where(F.col("out_degree") > 0).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("out_degree")).alias("share"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("in_mass"))
        )
        ranks = (
            ranks.select("node", "out_degree")
            .join(contrib, ranks.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))  # 1-row scalar
            .select(
                "node",
                "out_degree",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        ).localCheckpoint(eager=True)
        # |V| rows, read 3x by the next iteration. localCheckpoint (not
        # persist) because it also TRUNCATES lineage: persist keeps the
        # values but Catalyst still drags every prior iteration's plan
        # into the next one — the round-7 audit measured 2,476 exchanges
        # in the 3-iteration plan (the admission-replay lesson again);
        # after truncation each iteration plans against a materialized
        # LogicalRDD and the plan is constant in n_iter.
    return ranks.select(
        "node",
        "out_degree",
        F.round(F.col("rank") + F.lit(1e-9), 6).alias("rank_score"),
    ).orderBy("node")


def copurchase_edges(
    lineitem: DataFrame,
    part: DataFrame,
    item_col: str = "p_brand",
) -> DataFrame:
    """Directed co-purchase edges between item attributes.

    Two brands appearing in the same order yield both (a, b) and
    (b, a) edges — the co-occurrence graph is symmetric, and PageRank
    over it measures how centrally a brand sits in the purchase mix.
    Projecting parts to a bounded attribute (brand: 25 values) keeps
    the node set small while the per-order pair expansion stays
    bounded by order width; at partkey granularity the identical plan
    runs with |V| = |part|.
    """
    items = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col(item_col).alias("item"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(b, "okey")
        .where(F.col("a.item") != F.col("b.item"))
        .select(
            F.col("a.item").alias("src"), F.col("b.item").alias("dst")
        )
        .distinct()
    )


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree summary — the cheap pre-flight before any
    iterative graph job (skew in degree = skew in the contribution
    shuffle)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    outd = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    ind = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        outd.join(ind, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .orderBy("node")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 2,
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts as its own label; each iteration every node adopts the most
    frequent label among its in-neighbors (ties -> smallest label;
    isolated nodes keep their own).  ``n_iter`` is FIXED so the whole
    computation is a static DAG an oracle can replay.

    Per iteration: one edges-to-labels keyed join, one (node, label)
    count agg, one per-node argmax — all partial+final shapes on the
    edge/node tables; the label table stays |V|-sized.  The dedup /
    corpus use-case: grouping near-duplicate families or domain
    clusters from a similarity graph without fixing cluster count.
    """
    if n_iter < 1:
        raise ValueError(f"label_propagation requires n_iter >= 1, got {n_iter}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label")).persist()
    for it in range(n_iter):
        nbr = (
            e.join(
                labels.select(
                    F.col("node").alias("src"), F.col("label").alias("nl")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), F.col("nl").alias("cand"))
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        # per-node argmax: min(struct(-votes, cand)) == ORDER BY votes
        # DESC, cand ASC pick-first — works for ANY orderable label
        # type (strings included) without a window over the corpus
        best = (
            nbr.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("votes")).alias("nv"), F.col("cand"))
                ).alias("m")
            )
            .select("node", F.col("m.cand").alias("new_label"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", F.col("label")).alias("label"),
            )
            .persist()
        )
        # Periodic (not per-iteration) lineage truncation: checkpoint
        # replaces the plan with a stats-less LogicalRDD, which demotes
        # the tiny label-table joins from broadcast to SMJ — measured
        # 0.61s -> 2.12s at sf0.1 when done EVERY iteration (both eager
        # and lazy). Every 8th keeps the plan depth bounded for long
        # propagation runs while the default n_iter=3 stays on the
        # fully-fused persist path.
        if (it + 1) % 8 == 0:
            labels = labels.localCheckpoint(eager=True)
    return labels.orderBy("node")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global + per-node triangle counting with the degree-ordered
    orientation (the standard distributed formulation): the graph is
    undirected-canonicalized, each edge is oriented from the lower-
    (degree, id) endpoint to the higher, and triangles are found by
    joining oriented wedges against oriented edges.  Orientation
    bounds every node's out-degree by O(sqrt(|E|)), so the wedge
    expansion — the quadratic hazard of naive triangle counting on a
    skewed graph — stays balanced no matter how hot the hubs are.

    Returns one row per node participating in >= 1 triangle plus a
    ``__TOTAL__`` row (distinct triangles, each counted once).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(
        F.col("node").alias("u"), F.col("deg").alias("du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("deg").alias("dv")
    )
    # orient: lower (deg, id) -> higher (deg, id)
    oriented = (
        und.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"))
            )
            .alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
        .persist()
    )
    w1 = oriented.select(F.col("s").alias("x"), F.col("t").alias("y"))
    w2 = oriented.select(F.col("s").alias("x"), F.col("t").alias("z"))
    wedges = w1.join(w2, "x").where(F.col("y") < F.col("z"))
    # unionByName: plain union is POSITIONAL and would silently add the
    # same direction twice (measured: exactly 2x the triangle count)
    closing = oriented.select(
        F.col("s").alias("y"), F.col("t").alias("z")
    ).unionByName(
        oriented.select(F.col("s").alias("z"), F.col("t").alias("y"))
    )
    # localCheckpoint: the triangle list feeds FOUR downstream branches
    # (x/y/z per-node unions + the total), and each branch would
    # otherwise re-plan the whole wedge join — 403 exchanges in the
    # round-7 audit for what executes as one join. Materializing the
    # (bounded: one row per triangle) list makes the result plan a
    # union of four aggregates over one LogicalRDD.
    tri = (
        wedges.join(closing, ["y", "z"])
        .select("x", "y", "z")
        .localCheckpoint(eager=True)
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .select(F.col("node").cast("string").alias("node"), "n_triangles")
    )
    total = tri.agg(F.count(F.lit(1)).alias("n_triangles")).select(
        F.lit("__TOTAL__").alias("node"), "n_triangles"
    )
    return per_node.unionByName(total).orderBy("node")
