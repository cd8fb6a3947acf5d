"""Shared helpers for the catalog family modules: table loader,
checkpoint constant, literal fixtures, and the SQL-building
helpers the oracle entries call."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: fixed incremental checkpoint used by the ts-range queries (UTC)
CHECKPOINT = "2024-01-15 00:00:00"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from flink_elasticsearch_ingestion_spark.sources.tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


def _nrows(sf_dir: str, name: str) -> int:
    """Table row count from the parquet FOOTER metadata — the "table
    statistics" source the ``corpus_rows=`` auto-LSH-bits hint expects:
    no Spark job, no data pages read (pyarrow dataset counts row-group
    metadata only; handles both a single .parquet file and a
    Spark-written directory)."""
    import pyarrow.dataset as ds

    return ds.dataset(f"{sf_dir}/{name}.parquet", format="parquet").count_rows()


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return [float(x) for x in row[0]]


#: rules for the orders-table audit (constraint_report catalog entry)
ORDERS_RULES = (
    {"kind": "not_null", "column": "o_custkey"},
    {"kind": "unique", "column": "o_orderkey"},
    # hi deliberately inside the price distribution so the report
    # exercises a FAILING rule (nonzero count + passed=false), not just
    # all-green rows
    {"kind": "in_range", "column": "o_totalprice", "lo": 0.0, "hi": 450000.0},
    {"kind": "accepted_values", "column": "o_orderstatus", "values": ("O", "F", "P")},
    {"kind": "matches", "column": "o_orderpriority", "pattern": "^[1-5]-"},
)


#: fixed BPE merge table for the encoder query (rank order matters);
#: corpus-independent so the same literals apply at every sf — the
#: TRAINED path stays in bpe_train, whose loop is rows-only by design
_BPE_MERGES = [
    ("t", "a"),
    ("l", "e"),
    ("b", "le"),
    ("ta", "ble"),
    ("s", "c"),
    ("sc", "an"),
    ("q", "u"),
    ("e", "r"),
]


# locals the original oracle_sql() closed over, promoted to module
# constants so family ORACLES dicts can reference them verbatim
ck = f"TIMESTAMP '{CHECKPOINT}'"
# events.ts is ns-precision; the engine truncates to us (Spark's
# timestamp grain), so oracles compare on CAST(ts AS TIMESTAMP).
copy_projection = (
    "SELECT event_id AS doc_id, event_type AS index_id,"
    " CAST(ts AS TIMESTAMP) AS ts, user_id, value, props FROM events"
)
lastwins = (
    "SELECT doc_id, index_id, ts, user_id, value, props FROM ("
    "SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY ts DESC, "
    "index_id DESC, user_id DESC, value DESC, props DESC) AS rn FROM ({base})"
    ") WHERE rn = 1"
)


def _ewma_terms_sql(alpha: float = 0.3, n_lags: int = 14) -> str:
    """The same literal renormalized kernel the Spark operator unrolls,
    as a left-assoc SQL sum of lag() terms."""
    weights = [alpha * (1 - alpha) ** (k - 1) for k in range(1, n_lags + 1)]
    norm = sum(weights)
    return " + ".join(
        f"lag(revenue, {k}) OVER w * {w / norm!r}"
        for k, w in enumerate(weights, start=1)
    )


def _kn_scores_sql() -> str:
    """Shared DuckDB replay of the interpolated Kneser-Ney per-document
    cross-entropy (operators/text.py::kneser_ney_score): one SELECT
    (doc_id, n_bigrams, kn_cross_entropy), embedded by the
    kn_bigram_score oracle directly and by difficulty_stratified_eval
    as a subquery, so the score model can never drift between them."""
    return (
        "WITH toks AS (SELECT doc_id,"
        " string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),"
        "   ' ') AS t FROM documents),"
        " e AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2"
        "  FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)"
        "  WHERE len(t) >= 2),"
        " bgc AS (SELECT w1, w2, count(*) AS c_bg FROM e GROUP BY w1, w2),"
        " pfc AS (SELECT w1, count(*) AS c_w1,"
        "   count(DISTINCT w2) AS n1p_fw FROM e GROUP BY w1),"
        " sfc AS (SELECT w2, count(DISTINCT w1) AS n1p_bw FROM e GROUP BY w2),"
        " tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM bgc)"
        " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,"
        "  round(-sum(ln(greatest(c_bg - 0.75, 0.0) / c_w1"
        "   + ((0.75 * n1p_fw) / c_w1) * (n1p_bw / t))) / count(*) + 1e-9, 4)"
        "   AS kn_cross_entropy"
        " FROM e JOIN bgc USING (w1, w2) JOIN pfc USING (w1)"
        "  JOIN sfc USING (w2) CROSS JOIN tot"
        " GROUP BY doc_id"
    )


def _minhash_pairs_cte(threshold: float = 0.4, source: str = "documents") -> str:
    """Shared CTE chain re-deriving the portable-MinHash near-dup pairs
    in pure DuckDB SQL: same md5-31-bit shingle hashes, same affine
    perms (coefficients inlined from MINHASH_COEFFS), same
    signature-slice band keys, same exact-Jaccard verify. Used by the
    minhash_near_dup and near_dup_clusters oracles. ``source`` swaps
    the corpus relation (default keeps every existing oracle string
    byte-identical); pass an aliased subquery exposing (doc_id, text)
    to run the chain over a derived corpus (planted_dup_recall)."""
    from flink_elasticsearch_ingestion_spark.operators.dedup import (
        MERSENNE31,
        MINHASH_COEFFS,
    )

    ab_rows = ", ".join(
        f"({j + 1}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_COEFFS[:16])
    )
    p = MERSENNE31
    return (
        "docs AS (SELECT doc_id,"
        " string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w"
        f" FROM {source}),"
        " th AS (SELECT doc_id, list_transform(w,"
        f"   t -> ('0x' || substr(md5(t),1,8))::BIGINT % {p}) AS ht FROM docs),"
        " hv AS (SELECT doc_id, list_distinct(["
        "   list_reduce(list_prepend(0::BIGINT, ht[i:i+2]),"
        f"     (a, x) -> ((a*1000003) % {p} + x) % {p})"
        "   FOR i IN generate_series(1, greatest(len(ht)-2, 1))]) AS h FROM th),"
        f" ab AS (SELECT * FROM (VALUES {ab_rows}) AS t(j, a, b)),"
        " sig AS (SELECT doc_id, j,"
        f"   list_min(list_transform(h, x -> (a*x+b) % {p})) AS mh"
        "   FROM hv CROSS JOIN ab),"
        " bands AS (SELECT doc_id, (j-1)//2 AS band_idx,"
        "   string_agg(mh::VARCHAR, ',' ORDER BY j) AS band_key"
        "   FROM sig GROUP BY doc_id, (j-1)//2),"
        " cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b"
        "   FROM bands a JOIN bands b ON a.band_idx = b.band_idx"
        "   AND a.band_key = b.band_key AND a.doc_id < b.doc_id),"
        " verified AS (SELECT doc_a, doc_b,"
        "   round(len(list_intersect(ha.h, hb.h)) * 1.0 /"
        "     greatest(len(ha.h) + len(hb.h) - len(list_intersect(ha.h, hb.h)), 1),"
        "     6) AS jaccard"
        "   FROM cand JOIN hv ha ON ha.doc_id = cand.doc_a"
        "   JOIN hv hb ON hb.doc_id = cand.doc_b),"
        " mh_pairs AS (SELECT doc_a, doc_b, jaccard FROM verified"
        f"   WHERE jaccard >= {threshold})"
    )


def _shared_spans_cte(window_k: int = 8, min_span: int = 12, df_cap: int = 50) -> str:
    """Shared CTE chain re-deriving ``shared_span_mining`` in DuckDB:
    md5-31 window hashes over space-joined ``window_k``-token windows,
    df-capped stop windows, cross-doc equi-join, and the diagonal
    gaps-and-islands collapse to MAXIMAL spans.  Ends with a ``spans``
    CTE (doc_a, doc_b, start_a, start_b, span_tokens).  Used by the
    shared_spans and span_leakage oracles."""
    k = window_k
    return (
        "t AS (SELECT doc_id AS doc,"
        "  string_split_regex(trim(text), '\\s+') AS toks"
        "  FROM documents),"
        " win AS (SELECT doc, i AS pos,"
        "  ('0x' || substr(md5(array_to_string("
        f"    toks[i + 1 : i + {k}], ' ')), 1, 8))::BIGINT"
        "    % 2147483647 AS wh"
        "  FROM t, LATERAL (SELECT unnest(generate_series(0,"
        f"   len(toks) - {k})) AS i) g WHERE len(toks) >= {k}),"
        " keep AS (SELECT wh FROM win GROUP BY wh"
        f"  HAVING count(DISTINCT doc) <= {df_cap}),"
        " wk AS (SELECT win.* FROM win JOIN keep USING (wh)),"
        " m AS (SELECT a.doc AS doc_a, b.doc AS doc_b,"
        "  a.pos AS pa, b.pos AS pb FROM wk a JOIN wk b"
        "  ON a.wh = b.wh AND a.doc < b.doc),"
        " isl AS (SELECT doc_a, doc_b, pa, pb,"
        "  pa - row_number() OVER (PARTITION BY doc_a, doc_b,"
        "   pa - pb ORDER BY pa) AS grp FROM m),"
        " spans AS (SELECT doc_a, doc_b,"
        " CAST(min(pa) AS INT) AS start_a,"
        " CAST(min(pb) AS INT) AS start_b,"
        f" CAST(count(*) + {k - 1} AS BIGINT) AS span_tokens"
        " FROM isl GROUP BY doc_a, doc_b, pa - pb, grp"
        f" HAVING count(*) + {k - 1} >= {min_span})"
    )


def _bootstrap_coeff_values() -> str:
    """VALUES rows ``(b, a, cc)`` inlining the deterministic bootstrap
    affine coefficients (sampling.bootstrap_coeffs, seed 0xB007)."""
    from flink_elasticsearch_ingestion_spark.operators.sampling import (
        bootstrap_coeffs,
    )

    return ", ".join(f"({b}, {a}, {c})" for b, a, c in bootstrap_coeffs(50))


def _bm25_cte() -> str:
    """The shared BM25 scoring CTE chain (feat/stats/scored) — used
    verbatim by the bm25_search oracle and re-used by ndcg_eval so the
    two can never drift.  Constants mirror the engine's Python-driver
    arithmetic: (1.2 + 1.0) = k1+1 computed as the same IEEE sum,
    0.25 = 1.0-b, and the term sum folds left-to-right in query order
    (spark, merge, window) so addition order matches."""
    return (
        r"feat AS (SELECT doc_id,"
        r" len(regexp_split_to_array(trim(lower(text)), '\s+')) AS doclen,"
        r" len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),"
        r"   x -> x = 'spark')) AS tf_0,"
        r" len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),"
        r"   x -> x = 'merge')) AS tf_1,"
        r" len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),"
        r"   x -> x = 'window')) AS tf_2 FROM documents),"
        " stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,"
        "  CAST(sum(doclen) AS DOUBLE) / count(*) AS avgdl,"
        "  CAST(sum(CAST(tf_0 > 0 AS INT)) AS DOUBLE) AS df_0,"
        "  CAST(sum(CAST(tf_1 > 0 AS INT)) AS DOUBLE) AS df_1,"
        "  CAST(sum(CAST(tf_2 > 0 AS INT)) AS DOUBLE) AS df_2 FROM feat),"
        " scored AS (SELECT doc_id, doclen, round(0.0"
        "  + ln(1.0 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))"
        "    * (CAST(tf_0 AS DOUBLE) * (1.2 + 1.0))"
        "    / (CAST(tf_0 AS DOUBLE) + 1.2 * (0.25 + ((0.75 * doclen) / avgdl)))"
        "  + ln(1.0 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))"
        "    * (CAST(tf_1 AS DOUBLE) * (1.2 + 1.0))"
        "    / (CAST(tf_1 AS DOUBLE) + 1.2 * (0.25 + ((0.75 * doclen) / avgdl)))"
        "  + ln(1.0 + (n_docs - df_2 + 0.5) / (df_2 + 0.5))"
        "    * (CAST(tf_2 AS DOUBLE) * (1.2 + 1.0))"
        "    / (CAST(tf_2 AS DOUBLE) + 1.2 * (0.25 + ((0.75 * doclen) / avgdl)))"
        "  + 1e-9, 6) AS bm25 FROM feat, stats)"
    )


def _hash_embed_values() -> str:
    """VALUES rows ``(b, d, w)`` inlining the deterministic hashed-
    embedding projection matrix (embeddings.hash_embedding_codebook)."""
    from flink_elasticsearch_ingestion_spark.operators.embeddings import (
        hash_embedding_codebook,
    )

    return ", ".join(
        f"({b}, {d}, {w!r})" for b, d, w in hash_embedding_codebook()
    )


def _pq_values() -> str:
    """VALUES rows ``(sub, cid, c)`` inlining the deterministic PQ
    codebook (similarity.pq_codebook, seed 777) — same float-repr
    round-trip discipline as ``_plane_values``."""
    from flink_elasticsearch_ingestion_spark.operators.similarity import pq_codebook

    rows = []
    for sub, cents in enumerate(pq_codebook()):
        for cid, c in enumerate(cents):
            lit = "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]"
            rows.append(f"({sub}, {cid}, {lit})")
    return ", ".join(rows)


def _top_component_sql(iters: int = 5, dim: int = 64) -> str:
    """Unrolled SQL replay of the power-iteration trajectory
    (``top_component``): the 6dp Gram matrix (the proven
    embedding_gramian oracle) mirrored to full symmetric row-lists,
    then per-iteration list_dot_product matrix-vector steps with the
    EXPLICIT floor(|x|*1e6 + 0.5)/1e6 rounding — the same IEEE op
    sequence as the engine's Python fold, no library round semantics
    in play."""
    r6 = (
        "(CASE WHEN {x} >= 0 THEN floor(({x}) * 1000000.0 + 0.5)"
        " ELSE -floor(-({x}) * 1000000.0 + 0.5) END / 1000000.0)"
    )
    parts = [
        "WITH p AS (SELECT i, j,"
        " CAST(embedding[i + 1] AS DOUBLE) *"
        " CAST(embedding[j + 1] AS DOUBLE) AS v FROM embeddings,"
        f" LATERAL (SELECT unnest(generate_series(0, {dim - 1})) AS i) gi,"
        f" LATERAL (SELECT unnest(generate_series(0, {dim - 1})) AS j) gj"
        " WHERE j >= i)",
        ", g AS MATERIALIZED (SELECT i, j, round(sum(v) + 1e-9, 6)"
        " AS dot FROM p GROUP BY i, j)",
        ", gf AS MATERIALIZED (SELECT i, j, dot FROM g"
        " UNION ALL SELECT j, i, dot FROM g WHERE i <> j)",
        ", gr AS MATERIALIZED (SELECT i, list(dot ORDER BY j) AS gv"
        " FROM gf GROUP BY i)",
        ", v0 AS MATERIALIZED (SELECT list_transform("
        f"generate_series(1, {dim}), x -> 1.0) AS v)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f", w{t} AS MATERIALIZED (SELECT i, list_dot_product(gv,"
            f" (SELECT v FROM v{t - 1})) AS w FROM gr)"
        )
        parts.append(
            f", n{t} AS MATERIALIZED (SELECT"
            f" sqrt(list_dot_product(wl, wl)) AS nn FROM"
            f" (SELECT list(w ORDER BY i) AS wl FROM w{t}))"
        )
        parts.append(
            f", v{t}t AS MATERIALIZED (SELECT i, "
            + r6.format(x=f"w / (SELECT nn FROM n{t})")
            + f" AS val FROM w{t})"
        )
        parts.append(
            f", v{t} AS MATERIALIZED (SELECT list(val ORDER BY i)"
            f" AS v FROM v{t}t)"
        )
    parts.append(
        f", wf AS MATERIALIZED (SELECT i, list_dot_product(gv,"
        f" (SELECT v FROM v{iters})) AS w FROM gr)"
    )
    parts.append(
        ", lam AS (SELECT "
        + r6.format(
            x=f"list_dot_product((SELECT v FROM v{iters}), wl)"
        )
        + " AS ev FROM (SELECT list(w ORDER BY i) AS wl FROM wf))"
    )
    parts.append(
        f" SELECT CAST(t.i AS INT) AS dim_index, t.val AS loading,"
        f" lam.ev AS eigenvalue FROM v{iters}t t, lam ORDER BY dim_index"
    )
    return "".join(parts)


def _hilbert_sql(bits: int = 16) -> str:
    """Unrolled SQL replay of the Hilbert xy2d bit walk
    (``hilbert_value``): one CTE per bit level maintaining (x, y, d)
    with the same reflect/transpose CASEs and exact int64 quadrant
    digits — bit-exact, no rounding discipline needed."""
    parts = [
        "WITH h0 AS MATERIALIZED (SELECT o_orderkey,"
        " least(65535, CAST(floor(o_totalprice / 8) AS BIGINT))"
        " AS price_bucket, o_custkey % 65536 AS cust_bucket,"
        " least(65535, CAST(floor(o_totalprice / 8) AS BIGINT)) AS x,"
        " o_custkey % 65536 AS y, CAST(0 AS BIGINT) AS d FROM orders)"
    ]
    for i in range(1, bits + 1):
        s_val = 1 << (bits - i)
        parts.append(
            f", h{i} AS MATERIALIZED (SELECT o_orderkey, price_bucket,"
            f" cust_bucket,"
            f" CASE WHEN ry = 0 AND rx = 1 THEN {s_val} - 1 - y"
            f"  WHEN ry = 0 THEN y ELSE x END AS x,"
            f" CASE WHEN ry = 0 AND rx = 1 THEN {s_val} - 1 - x"
            f"  WHEN ry = 0 THEN x ELSE y END AS y,"
            f" d + {s_val * s_val} * xor(3 * rx, ry) AS d"
            f" FROM (SELECT *,"
            f" CASE WHEN (x & {s_val}) > 0 THEN CAST(1 AS BIGINT)"
            f"  ELSE CAST(0 AS BIGINT) END AS rx,"
            f" CASE WHEN (y & {s_val}) > 0 THEN CAST(1 AS BIGINT)"
            f"  ELSE CAST(0 AS BIGINT) END AS ry FROM h{i - 1}))"
        )
    parts.append(
        f" SELECT o_orderkey, price_bucket, cust_bucket,"
        f" CAST(d AS BIGINT) AS h_key FROM h{bits} ORDER BY o_orderkey"
    )
    return "".join(parts)


def _textrank_sql(n_iter: int = 4, top_k: int = 20, min_len: int = 3) -> str:
    """Unrolled SQL replay of the integer fixed-point TextRank
    trajectory (``textrank_keywords``): same adjacency pairs, same
    exact int64 edge contributions ``(w*r)//wu`` and damping
    ``(85*mass)//100`` — every intermediate is an integer, so the
    replay is bit-exact with no rounding discipline needed."""
    parts = [
        "WITH toks AS MATERIALIZED (SELECT"
        " list_filter(string_split_regex(lower(trim(text)), '\\s+'),"
        f" t -> length(t) >= {min_len}) AS t FROM documents)",
        ", pr AS MATERIALIZED (SELECT"
        " CASE WHEN p.a < p.b THEN p.a ELSE p.b END AS u,"
        " CASE WHEN p.a < p.b THEN p.b ELSE p.a END AS v"
        " FROM (SELECT unnest(list_transform(generate_series(1,"
        " len(t) - 1), i -> struct_pack(a := t[i], b := t[i + 1])))"
        " AS p FROM toks WHERE len(t) >= 2) WHERE p.a <> p.b)",
        ", uw AS MATERIALIZED (SELECT u, v, CAST(count(*) AS BIGINT)"
        " AS w FROM pr GROUP BY u, v)",
        ", ed AS MATERIALIZED (SELECT u, v, w FROM uw"
        " UNION ALL SELECT v, u, w FROM uw)",
        ", ws AS MATERIALIZED (SELECT u, CAST(sum(w) AS BIGINT) AS wu"
        " FROM ed GROUP BY u)",
        ", e AS MATERIALIZED (SELECT ed.u AS src, ed.v AS dst, ed.w,"
        " ws.wu FROM ed JOIN ws ON ed.u = ws.u)",
        ", r0 AS MATERIALIZED (SELECT u AS node, wu,"
        " CAST(1000000 AS BIGINT) AS r FROM ws)",
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f", m{t} AS MATERIALIZED (SELECT e.dst,"
            f" CAST(sum((e.w * p.r) // e.wu) AS BIGINT) AS mass"
            f" FROM e JOIN r{t - 1} p ON e.src = p.node GROUP BY e.dst)"
        )
        parts.append(
            f", r{t} AS MATERIALIZED (SELECT p.node, p.wu,"
            f" CAST(150000 + (85 * coalesce(m.mass, 0)) // 100"
            f" AS BIGINT) AS r"
            f" FROM r{t - 1} p LEFT JOIN m{t} m ON p.node = m.dst)"
        )
    parts.append(
        f" SELECT node AS token, wu AS weighted_degree,"
        f" r / 1000000.0 AS rank_score FROM r{n_iter}"
        f" ORDER BY rank_score DESC, token LIMIT {top_k}"
    )
    return "".join(parts)


def _kmeans_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Unrolled SQL replay of the fixed-iteration Lloyd trajectory
    (``kmeans_fixed``): MATERIALIZED step CTEs (DuckDB inlines CTEs by
    default — the chained references would re-evaluate exponentially,
    the k-center lesson) assign via the same 4dp-rounded distance /
    lowest-cluster tie-break, update centroids from exact int64 sums
    with the same floor((2s+n)/(2n)) half-up mean, and keep empty
    clusters via LEFT JOIN + CASE."""
    sq = (
        "round(list_sum(list_transform(generate_series(1, len(v)),"
        " i -> (v[i] - m[i] / 10000.0) * (v[i] - m[i] / 10000.0)))"
        " + 1e-9, 4)"
    )

    def assign(name: str, cents: str) -> str:
        return (
            f", {name} AS MATERIALIZED (SELECT vec_id, iv, cl, d FROM"
            f" (SELECT vecs.vec_id, vecs.iv, {cents}.cl, {sq} AS d"
            f" FROM vecs, {cents})"
            f" QUALIFY row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY d, cl) = 1)"
        )

    sums = ", ".join(
        f"CAST(sum(iv[{i + 1}]) AS BIGINT) AS s{i}" for i in range(dim)
    )
    means = ", ".join(
        f"CAST(floor((2 * s.s{i} + s.n) / (2.0 * s.n)) AS BIGINT)"
        for i in range(dim)
    )
    parts = [
        "WITH vecs AS MATERIALIZED (SELECT vec_id,"
        " CAST(embedding AS DOUBLE[]) AS v,"
        " list_transform(CAST(embedding AS DOUBLE[]),"
        " x -> CAST(round(x * 10000.0, 0) AS BIGINT)) AS iv"
        " FROM embeddings)",
        ", c0 AS MATERIALIZED (SELECT"
        " CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,"
        " iv AS m FROM (SELECT vec_id, iv FROM vecs ORDER BY vec_id"
        f" LIMIT {k}))",
    ]
    for t in range(iters):
        parts.append(assign(f"a{t}", f"c{t}"))
        parts.append(
            f", s{t + 1} AS MATERIALIZED (SELECT cl, count(*) AS n,"
            f" {sums} FROM a{t} GROUP BY cl)"
        )
        parts.append(
            f", c{t + 1} AS MATERIALIZED (SELECT p.cl,"
            f" CASE WHEN s.n IS NULL THEN p.m ELSE [{means}] END AS m"
            f" FROM c{t} p LEFT JOIN s{t + 1} s ON p.cl = s.cl)"
        )
    parts.append(assign("af", f"c{iters}"))
    parts.append(
        " SELECT cl AS cluster_id, count(*) AS n_members,"
        " CAST(sum(CAST(round(d * 10000.0, 0) AS BIGINT)) AS BIGINT)"
        " / 10000.0 AS inertia"
        " FROM af GROUP BY cl ORDER BY cl"
    )
    return "".join(parts)


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled SQL replay of the greedy k-center trajectory
    (``kcenter_select``): step CTEs d0..d{k-2} maintain the running
    4dp-rounded min-distance exactly as the Spark loop's incremental
    ``least(md, dist_to_new)`` does, c1..c{k-1} take the same
    (md DESC, vec_id ASC) argmax — the greedy path is a pure function
    of the data, so the two engines walk it identically."""

    def sq(prev: str, center_sub: str) -> str:
        return (
            f"round(list_sum(list_transform(generate_series(1,"
            f" len({prev}.v)), i -> ({prev}.v[i] - cv.v[i])"
            f" * ({prev}.v[i] - cv.v[i]))) + 1e-9, 4)"
        )

    seed = "(SELECT min(vec_id) FROM vecs)"
    parts = [
        "WITH vecs AS MATERIALIZED (SELECT vec_id,"
        " CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f", d0 AS MATERIALIZED (SELECT vecs.vec_id, vecs.v,"
        f" {sq('vecs', seed)} AS md"
        f" FROM vecs, (SELECT v FROM vecs WHERE vec_id = {seed}) cv(v))",
    ]
    chosen = [seed]
    for i in range(1, k):
        excl = ", ".join(chosen)
        parts.append(
            f", c{i} AS MATERIALIZED (SELECT vec_id, md FROM d{i-1}"
            f" WHERE vec_id NOT IN ({excl})"
            f" ORDER BY md DESC, vec_id LIMIT 1)"
        )
        if i < k - 1:
            parts.append(
                f", d{i} AS MATERIALIZED"
                f" (SELECT d{i-1}.vec_id, d{i-1}.v,"
                f" least(d{i-1}.md, {sq(f'd{i-1}', f'c{i}')}) AS md"
                f" FROM d{i-1}, (SELECT v FROM vecs WHERE vec_id ="
                f" (SELECT vec_id FROM c{i})) cv(v))"
            )
        chosen.append(f"(SELECT vec_id FROM c{i})")
    selects = [
        f" SELECT CAST(0 AS INT) AS rank, {seed} AS vec_id,"
        f" CAST(0.0 AS DOUBLE) AS dist"
    ]
    for i in range(1, k):
        selects.append(
            f" UNION ALL SELECT CAST({i} AS INT),"
            f" (SELECT vec_id FROM c{i}), (SELECT md FROM c{i})"
        )
    return "".join(parts) + "".join(selects) + " ORDER BY rank"


def _plane_values(bits: int, seeds: list[int], dim: int = 64) -> str:
    """VALUES rows ``(tbl, i, plane)`` inlining the deterministic
    sign-LSH hyperplanes (similarity._hyperplanes, same seeds) so the
    DuckDB oracle re-derives identical sign-bit buckets. Python float
    repr round-trips exactly through DuckDB's double parser, so every
    plane coefficient is bit-identical on both engines."""
    from flink_elasticsearch_ingestion_spark.operators.similarity import _hyperplanes

    rows = []
    for t, seed in enumerate(seeds):
        for i, plane in enumerate(_hyperplanes(dim, bits, seed)):
            lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
            rows.append(f"({t}, {i}, {lit})")
    return ", ".join(rows)


def _jl_s2_sql() -> str:
    """Sum-of-squared-projections SQL term for the JL oracle — same
    seeded planes and the same left-to-right '+' chain as the engine's
    one-parse expression, literals via float repr (bit-identical)."""
    import math

    from flink_elasticsearch_ingestion_spark.operators.similarity import (
        _hyperplanes,
    )

    planes = _hyperplanes(64, 16, 7)
    scale = 1.0 / math.sqrt(16)
    terms = []
    for p in planes:
        lit = "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"
        terms.append(f"pow(list_dot_product(v, {lit}) * {scale!r}, 2)")
    return "(" + " + ".join(terms) + ")"


def _probe_logit_sqls(n_classes: int = 3, dim: int = 64, seed: int = 11) -> list[str]:
    """Per-class dot-product SQL terms for the linear_probe oracle —
    identical seeded Gaussian weights (shared _hyperplanes family) via
    float repr literals and the same left-to-right fold."""
    from flink_elasticsearch_ingestion_spark.operators.similarity import (
        _hyperplanes,
    )

    out = []
    for row in _hyperplanes(dim, n_classes, seed):
        lit = "[" + ", ".join(repr(float(x)) for x in row) + "]::DOUBLE[]"
        out.append(f"list_dot_product(v, {lit})")
    return out
