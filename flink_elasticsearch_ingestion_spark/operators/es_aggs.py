"""Elasticsearch search/aggregation surface parity operators.

The reference (core.clj:103, README.md:3) is an ES→ES index copy job:
its users live inside Elasticsearch's *search and aggregation* API, so
an engine that replaces it must also answer the aggregations those
users run against the copied indexes.  This module re-expresses the
publicly-documented ES aggregation semantics as Catalyst-friendly
DataFrame plans over the engine's document/event tables:

- ``significant_terms``  — the `significant_terms` bucket aggregation
  with the JLH heuristic (foreground vs background doc frequency).
- ``decay_score_topk``   — `function_score` gaussian decay ranking
  (recency-decayed relevance × field value factor).
- ``composite_agg_page`` — the `composite` aggregation's after-key
  (keyset) pagination: the only aggregation pagination that scales,
  because it is a pushed-down range predicate, not a global offset.
- ``terms_shard_error``  — the `terms` aggregation's distributed
  approximation accounting: per-shard top `shard_size` merge with
  ES's `doc_count_error_upper_bound` formula.
- ``percolate_matches``  — the percolator (reverse search): stored
  queries matched against the document stream.
- ``more_like_this``     — the MLT query: tf-idf query-term selection
  from a seed doc, idf-weighted term-overlap scoring of candidates.
- ``percentile_ranks``   — the `percentile_ranks` metric aggregation
  (inverse percentiles at fixed values).
- ``filters_adjacency``  — the `adjacency_matrix` aggregation
  (filter × filter intersection doc counts).

Scale shape: every operator tokenizes map-side, aggregates with
partial+final hash aggs on vocab- or bucket-keyed groups, broadcasts
only literal/1-row/panel-sized frames, and ranks through either
WindowGroupLimit-eligible ``row_number() <= k`` windows or two-phase
salted partial top-k — no all-pairs joins, no fact-sized single
partitions.  Every float that reaches a rank or the result is rounded
identically (+1e-9 nudge) so the DuckDB oracle hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators.text import tokens

__all__ = [
    "significant_terms",
    "decay_score_topk",
    "composite_agg_page",
    "terms_shard_error",
    "percolate_matches",
    "more_like_this",
    "percentile_ranks",
    "filters_adjacency",
    "PERCOLATOR_QUERIES",
]


def _doc_terms(documents: DataFrame, *extra_cols: str) -> DataFrame:
    """Distinct (doc_id, *extra_cols, term) pairs under the engine's
    whitespace tokenization (documents.doc_id is unique, so carrying
    per-doc attribute columns through the distinct is free)."""
    return (
        documents.select(
            "doc_id", *extra_cols, F.explode(tokens()).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )


def significant_terms(
    documents: DataFrame,
    *,
    group_col: str = "source",
    min_doc_count: int = 5,
    k: int = 5,
) -> DataFrame:
    """ES `significant_terms` aggregation, JLH heuristic: for each
    foreground bucket (one per ``group_col`` value) score terms by

        jlh = (fg% − bg%) · (fg% / bg%)

    where fg% = subset_df/subset_size and bg% = superset_df/
    superset_size (the publicly documented ES formula: absolute change
    × relative change, biased to rarer-but-concentrated terms).  Keep
    terms with ``subset_df ≥ min_doc_count`` and positive score; top-k
    per bucket ranked on the ROUNDED score (ties alphabetical) so both
    engines cut identically.

    Scale: tokens explode map-side; two vocab-keyed hash aggs
    (term×group and term); group sizes broadcast (|groups| rows); the
    corpus size is a 1-row scalar broadcast (allowlisted); the rank
    window partitions by group over vocab-sized sets.
    """
    dt = _doc_terms(documents, group_col)
    subset_sizes = documents.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("subset_size")
    )
    totals = documents.agg(F.count(F.lit(1)).alias("superset_size"))
    subset_df = dt.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("subset_df")
    )
    superset_df = dt.groupBy("term").agg(F.count(F.lit(1)).alias("superset_df"))
    fg = F.col("subset_df") / F.col("subset_size")
    bg = F.col("superset_df") / F.col("superset_size")
    scored = (
        subset_df.join(superset_df, "term")
        .join(F.broadcast(subset_sizes), group_col)
        .crossJoin(F.broadcast(totals))
        .where(F.col("subset_df") >= int(min_doc_count))
        .withColumn("jlh", F.round((fg - bg) * (fg / bg) + F.lit(1e-9), 6))
        .where(F.col("jlh") > 0)
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("jlh"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .select(group_col, "term", "subset_df", "superset_df", "jlh")
        .orderBy(group_col, F.desc("jlh"), "term")
    )


def decay_score_topk(
    events: DataFrame,
    *,
    origin: str,
    scale_s: float = 604800.0,
    offset_s: float = 86400.0,
    decay: float = 0.5,
    k: int = 5,
) -> DataFrame:
    """ES `function_score` gaussian decay × field value factor: score
    each event by

        value · decay^((max(0, |ts − origin| − offset) / scale)²)

    (the documented gauss decay — ``decay`` reached exactly at
    ``scale`` seconds past the ``offset`` plateau around ``origin``),
    then keep the top-k per event_type ranked on the ROUNDED score
    with event_id tiebreak.

    Scale: pure map-side arithmetic (timestamp → double seconds keeps
    sub-second precision, matching the oracle's ``epoch()``); the
    ``row_number() ≤ k`` filter compiles to WindowGroupLimit, so the
    per-type rank is a partial map-side top-k + merge, never a
    fact-sized sort within one task.
    """
    dist = F.greatest(
        F.lit(0.0),
        F.abs(
            F.col("ts").cast("timestamp").cast("double")
            - F.lit(origin).cast("timestamp").cast("double")
        )
        - F.lit(float(offset_s)),
    )
    score = F.round(
        F.col("value")
        * F.pow(F.lit(float(decay)), F.pow(dist / F.lit(float(scale_s)), 2))
        + F.lit(1e-9),
        6,
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("score"), F.asc("event_id"))
    return (
        events.select("event_type", "event_id", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k))
        .select("event_type", "event_id", "score")
        .orderBy("event_type", F.desc("score"), "event_id")
    )


def composite_agg_page(
    events: DataFrame,
    *,
    after_key: tuple[str, str] = ("click", "2024-01-15"),
    page_size: int = 20,
) -> DataFrame:
    """ES `composite` aggregation page: bucket by (event_type, day),
    return the ``page_size`` buckets strictly AFTER ``after_key`` in
    key order — keyset pagination, the composite agg's contract.

    Scale: ONE partial+final hash agg on the composite key; the
    after-key is a *predicate on the group keys* (prunable, pushable),
    not a global OFFSET that would re-aggregate and re-sort everything
    already paged past; the final cut is TakeOrderedAndProject.
    """
    after_type, after_day = after_key
    buckets = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value") + F.lit(1e-9), 4).alias("sum_value"),
    )
    keyset = (F.col("event_type") > after_type) | (
        (F.col("event_type") == after_type) & (F.col("day") > after_day)
    )
    return (
        buckets.where(keyset)
        .orderBy("event_type", "day")
        .limit(int(page_size))
    )


def terms_shard_error(
    documents: DataFrame,
    *,
    n_shards: int = 8,
    shard_size: int = 10,
    k: int = 10,
) -> DataFrame:
    """ES `terms` aggregation distributed-merge error accounting: shard
    the corpus (doc_id mod ``n_shards``), take each shard's top
    ``shard_size`` terms by doc count (ties alphabetical), merge, and
    report per merged term ES's `doc_count_error_upper_bound` — the sum,
    over shards that did NOT return the term, of that shard's last-place
    returned count (0 for a shard that returned fewer than
    ``shard_size`` terms, since it held nothing back).

    This is the accounting a coordinator node does for every
    distributed terms aggregation; having it as a first-class operator
    lets a pipeline *measure* whether a shard_size is adequate instead
    of trusting the default.

    Scale: the per-shard rank partitions by shard; the error bound is
    computed WITHOUT a candidates×shards cross join by the complement
    identity  error(term) = total_floor − Σ_{shards reporting term}
    floor(shard),  where total_floor is a 1-row scalar broadcast
    (allowlisted) and the per-shard floors are a |shards|-row broadcast.
    """
    dt = documents.select(
        (F.col("doc_id") % int(n_shards)).alias("shard"),
        "doc_id",
        F.explode(tokens()).alias("term"),
    ).where(F.col("term") != "").distinct()
    per = dt.groupBy("shard", "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("term"))
    kept = per.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= int(shard_size)
    )
    floors = kept.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_kept"), F.min("cnt").alias("mn")
    ).select(
        "shard",
        F.when(F.col("n_kept") == int(shard_size), F.col("mn"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("floor"),
    )
    total_floor = floors.agg(F.sum("floor").alias("total_floor"))
    merged = (
        kept.join(F.broadcast(floors), "shard")
        .groupBy("term")
        .agg(
            F.sum("cnt").alias("doc_count"),
            F.sum("floor").alias("reported_floor"),
        )
    )
    return (
        merged.crossJoin(F.broadcast(total_floor))
        .select(
            "term",
            "doc_count",
            (F.col("total_floor") - F.col("reported_floor")).alias(
                "error_upper_bound"
            ),
        )
        .orderBy(F.desc("doc_count"), "term")
        .limit(int(k))
    )


#: stored percolator queries (query_id, must_term, must_not_term):
#: a doc matches when it contains must_term and, if must_not_term is
#: set, does not contain it.  The last entry matches nothing — the
#: zero-hit path stays visible in the result.
PERCOLATOR_QUERIES: tuple[tuple[int, str, str | None], ...] = (
    (0, "spark", None),
    (1, "table", "vector"),
    (2, "query", "slow"),
    (3, "vector", None),
    (4, "hash", "stream"),
    (5, "zzz_absent_term", None),
)


def percolate_matches(
    documents: DataFrame,
    spark: SparkSession,
    *,
    queries: tuple[tuple[int, str, str | None], ...] = PERCOLATOR_QUERIES,
) -> DataFrame:
    """ES percolator (reverse search): match the STORED query table
    against the document stream and report per-query hit counts plus
    the first matching doc.  Queries with zero matches still appear
    (count 0, null first match) — the shape an alerting pipeline needs.

    Scale: the query table is literal-broadcast (both the positive and
    the must-not arm); documents are tokenized once map-side; the
    must-not exclusion is a key-local left_anti join; the result is
    |queries|-sized.
    """
    q = spark.createDataFrame(
        list(queries), "query_id long, must_term string, must_not_term string"
    )
    dt = _doc_terms(documents)
    pos = F.broadcast(q).join(dt, q.must_term == dt.term).select(
        "query_id", "doc_id"
    )
    neg = (
        F.broadcast(q.where(F.col("must_not_term").isNotNull()))
        .join(dt, F.col("must_not_term") == dt.term)
        .select("query_id", "doc_id")
    )
    hits = pos.join(neg, ["query_id", "doc_id"], "left_anti")
    agg = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("doc_id").alias("first_match"),
    )
    return (
        q.join(agg, "query_id", "left")
        .select(
            "query_id",
            "must_term",
            "must_not_term",
            F.coalesce(F.col("n_matches"), F.lit(0).cast("long")).alias(
                "n_matches"
            ),
            "first_match",
        )
        .orderBy("query_id")
    )


def more_like_this(
    documents: DataFrame,
    *,
    max_query_terms: int = 5,
    min_doc_freq: int = 2,
    k: int = 5,
) -> DataFrame:
    """ES `more_like_this`: per language pick a seed doc (min doc_id),
    select its ``max_query_terms`` best terms by tf·idf (idf =
    ln(1 + (N − df + 0.5)/(df + 0.5)), the Lucene-documented MLT form;
    terms below ``min_doc_freq`` skipped), then score every other doc
    by the summed idf of the query terms it shares; top-k per seed.

    Scale: query-term selection is vocab-keyed (seed term freqs join
    the doc-frequency table; corpus size is a 1-row scalar broadcast,
    allowlisted); the selected terms (≤ seeds × max_query_terms rows)
    broadcast onto ONE pass over the doc-term table; the per-seed rank
    is TWO-PHASE (salted partial top-k, then a final rank over ≤
    32·k rows per seed) so no seed ever owns a corpus-sized window
    partition.
    """
    tall = (
        documents.select("doc_id", F.explode(tokens()).alias("term"))
        .where(F.col("term") != "")
    )
    dt = tall.distinct()
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    seeds = documents.groupBy("lang").agg(F.min("doc_id").alias("seed_id"))
    seed_tf = (
        tall.join(F.broadcast(seeds), tall.doc_id == seeds.seed_id)
        .groupBy("lang", "seed_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    qt = (
        seed_tf.join(dfreq, "term")
        .where(F.col("df") >= int(min_doc_freq))
        .crossJoin(F.broadcast(n))
        .withColumn("idf", idf)
        .withColumn(
            "tscore", F.round(F.col("tf") * F.col("idf") + F.lit(1e-9), 6)
        )
    )
    wq = Window.partitionBy("lang").orderBy(F.desc("tscore"), F.asc("term"))
    qterms = (
        qt.withColumn("qrn", F.row_number().over(wq))
        .where(F.col("qrn") <= int(max_query_terms))
        .select("lang", "seed_id", "term", "idf")
    )
    scored = (
        dt.join(F.broadcast(qterms), "term")
        .where(F.col("doc_id") != F.col("seed_id"))
        .groupBy("lang", "seed_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.round(F.sum("idf") + F.lit(1e-9), 6).alias("score"),
        )
    )
    w1 = Window.partitionBy("lang", "salt").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    w2 = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("salt", F.col("doc_id") % 32)
        .withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= int(k))
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= int(k))
        .select("lang", "seed_id", "doc_id", "n_shared", "score")
        .orderBy("lang", F.desc("score"), "doc_id")
    )


def percentile_ranks(
    lineitem: DataFrame,
    *,
    values: tuple[float, ...] = (1000.0, 5000.0, 20000.0, 50000.0),
    value_col: str = "l_extendedprice",
    group_col: str = "l_returnflag",
) -> DataFrame:
    """ES `percentile_ranks` metric aggregation (exact form): for each
    fixed value, the percentage of rows in the group at or below it —
    the inverse of a percentiles agg, used to answer "what fraction of
    my line items are under $X".

    Scale: ONE partial+final hash agg with |values| conditional sums;
    the per-value long form is a map-side ``stack`` of the aggregated
    row — no second pass, no join, no window.
    """
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.col(value_col) <= float(v), 1).otherwise(0))
        .cast("long")
        .alias(f"le_{i}")
        for i, v in enumerate(values)
    ]
    g = lineitem.groupBy(group_col).agg(*aggs)
    stack_args = ", ".join(
        f"CAST({float(v)} AS DOUBLE), le_{i}" for i, v in enumerate(values)
    )
    return (
        g.select(
            group_col,
            F.expr(
                f"stack({len(values)}, {stack_args}) AS (value, n_le)"
            ),
            "n",
        )
        .select(
            group_col,
            "value",
            "n_le",
            F.round(
                F.lit(100.0) * F.col("n_le") / F.col("n") + F.lit(1e-9), 6
            ).alias("pct_rank"),
        )
        .orderBy(group_col, "value")
    )


def filters_adjacency(
    documents: DataFrame,
    *,
    filters: tuple[tuple[str, str], ...] = (
        ("a", "spark"),
        ("b", "vector"),
        ("c", "stream"),
    ),
) -> DataFrame:
    """ES `adjacency_matrix` aggregation over term filters: doc counts
    for each named filter and each pairwise intersection (keys
    ``a``, ``b``, ``c``, ``a&b``, ``a&c``, ``b&c``) — co-occurrence
    structure without materializing a doc×doc graph.

    Scale: the term filter prunes the exploded token stream to the
    |filters| terms of interest BEFORE the per-doc flag agg; one
    doc-keyed hash agg builds the flag vector, one 1-row final agg
    builds the matrix, and the long form is a map-side ``stack``.
    """
    names = [n for n, _ in filters]
    terms = [t for _, t in filters]
    dt = _doc_terms(documents).where(F.col("term").isin(list(terms)))
    flag_aggs = [
        F.max(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"f_{n}")
        for n, t in filters
    ]
    flags = dt.groupBy("doc_id").agg(*flag_aggs)
    cell_aggs = [
        F.sum(f"f_{n}").cast("long").alias(f"c_{n}") for n in names
    ] + [
        F.sum(F.col(f"f_{a}") * F.col(f"f_{b}")).cast("long").alias(f"c_{a}_{b}")
        for i, a in enumerate(names)
        for b in names[i + 1 :]
    ]
    m = flags.agg(*cell_aggs)
    pairs = [(n, f"c_{n}") for n in names] + [
        (f"{a}&{b}", f"c_{a}_{b}")
        for i, a in enumerate(names)
        for b in names[i + 1 :]
    ]
    stack_args = ", ".join(f"'{key}', {col}" for key, col in pairs)
    return m.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (key, doc_count)")
    ).orderBy("key")
