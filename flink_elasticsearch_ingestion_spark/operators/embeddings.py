"""Embedding-column maintenance operators (north-star ext: the vector
side of a training-data pipeline — norm QA, storage quantization).

Everything here is a map-side expression over ``array<float>`` with at
most one small aggregation; no Python UDFs, no shuffling of raw
vectors beyond the final per-group agg rows. At 100 TB of embeddings
these run inside the scan stage and the exchange carries only scalar
per-vector/per-group summaries.

Float arrays are cast to double element-wise BEFORE arithmetic (the
same left-fold order as the DuckDB oracle's ``CAST(... AS DOUBLE[])``)
so both engines accumulate identical IEEE doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _l2_norm(col: str = "embedding") -> F.Column:
    """sqrt(sum(x^2)) as a left fold over the array order."""
    sq = F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def embedding_norms(embeddings: DataFrame) -> DataFrame:
    """Per-label L2-norm profile: count, avg/min/max norm. The norm is
    rounded per vector first (a stable scalar), then aggregated with the
    engine-portable rounding convention."""
    norm6 = F.round(_l2_norm() + 1e-9, 6)
    return (
        embeddings.select("label", norm6.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.round(F.sum("norm"), 2) / F.count(F.lit(1)) + 1e-9, 4
            ).alias("avg_norm"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
        .orderBy("label")
    )


def embedding_anisotropy(
    embeddings: DataFrame,
    *,
    offset: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus anisotropy estimate (Ethayarajh 2019's "How contextual
    are contextualized representations?" diagnostic): the expected
    cosine between UNRELATED vectors.  An isotropic embedding space
    scores ~0; a high value means the vectors live in a narrow cone —
    every downstream cosine (dedup thresholds, ANN margins, centroid
    classifiers) is then inflated by a constant the pipeline should
    subtract or whiten away, so this is the calibration reading to
    take BEFORE fixing any cosine threshold at corpus scale.

    The pair sample is deterministic, not random: vector ``i`` pairs
    with vector ``i + offset`` (callers pass ~half the corpus so pairs
    span the id range) — replayable by any SQL engine, stable across
    runs/engines, and one narrow shuffle-on-id equi-join at any scale
    (contrast a uniform random pairing, whose sample — and hence the
    statistic — would differ per run).  Per-pair cosines round to 6dp
    before the mean (the repo-wide cross-engine float discipline).

    Returns ONE row: n_pairs, mean_cosine (the anisotropy), the mean
    ABSOLUTE cosine (cone width even when signs cancel), max_abs.
    """
    from flink_elasticsearch_ingestion_spark.operators.similarity import (
        cosine,
    )

    a = embeddings.select(
        F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va")
    )
    b = embeddings.select(
        (F.col(id_col) - F.lit(offset)).alias("__ida"),
        F.col(vec_col).alias("__vb"),
    )
    c6 = F.round(cosine(F.col("__va"), F.col("__vb")), 6)
    return (
        a.join(b, "__ida")
        .select(c6.alias("__c"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.round(F.sum("__c"), 4) / F.count(F.lit(1)) + 1e-9, 6
            ).alias("mean_cosine"),
            F.round(
                F.round(F.sum(F.abs(F.col("__c"))), 4) / F.count(F.lit(1))
                + 1e-9,
                6,
            ).alias("mean_abs_cosine"),
            F.max(F.abs(F.col("__c"))).alias("max_abs_cosine"),
        )
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization parameters + worst-case
    reconstruction error — the storage/serving compression report.

    scale = max|x| / 127; q_i = round(x_i / scale);
    recon_err = max_i |x_i - q_i * scale|.

    All per-row expression work (zero shuffles); the quantized codes
    themselves are recomputable from (embedding, scale) so only the
    audit scalars are materialized here."""
    xs = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(xs, lambda x: F.abs(x)))
    scale = max_abs / F.lit(127.0)
    err = F.array_max(
        F.transform(xs, lambda x: F.abs(x - F.round(x / scale) * scale))
    )
    q = F.transform(xs, lambda x: F.round(x / scale).cast("int"))
    return embeddings.select(
        "vec_id",
        "label",
        F.round(scale + 1e-12, 8).alias("scale"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
        F.round(err + 1e-12, 6).alias("recon_err"),
    ).orderBy("vec_id")


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid, one row per (label, dim) — the distributed
    k-means M-step / IVF coarse-quantizer training primitive.

    posexplode fans each vector into (label, dim, x) rows map-side, and
    the single shuffle is a partial+final hash agg on (label, dim) —
    the sum/count buffers collapse per map task first, so 10^9 vectors
    shuffle |labels|x|dims| partial rows per task, not the data. The
    long (label, dim) layout keeps every contract column scalar; pivot
    back to array<float> with array_agg ordered by dim when feeding a
    quantizer. Money-style rounding (sum to 2dp, then divide) keeps the
    float-sum ordering differences below the contract's 4dp.
    """
    return (
        embeddings.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.round(F.sum(F.col("x").cast("double")), 2) / F.count(F.lit(1))
                + 1e-9,
                4,
            ).alias("centroid"),
        )
        .orderBy("label", "dim")
    )


def quantize_embeddings_arrow(embeddings: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`quantize_embeddings` — identical
    output contract, computed in vectorized numpy over Arrow batches.

    Exists to (a) exercise the Arrow-batch UDF surface end-to-end and
    (b) serve as the template for quantizers that genuinely need
    Python (learned codebooks, product quantization): batches arrive
    as Arrow RecordBatches (zero-copy for the fixed-width list
    column), the whole batch is one (rows x dims) ndarray op, and
    nothing ever goes through a per-row Python loop.

    Numeric parity with the expression form is exact: numpy rounds
    half-to-even while Spark's ``round`` is half-up, so the code-point
    rounding uses an explicit half-up (floor(x+0.5) on the magnitude,
    sign restored) and the audit scalars get the same epsilon-then-
    round treatment as the expression form.
    """
    from typing import Iterator

    import pyarrow as pa

    out_schema = (
        "vec_id long, label int, scale double, q_min int, q_max int, recon_err double"
    )

    def _half_up(a):
        import numpy as np

        return np.sign(a) * np.floor(np.abs(a) + 0.5)

    def quantize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for batch in batches:
            tbl = batch.to_pydict()
            xs = np.asarray(tbl["embedding"], dtype=np.float64)
            if xs.ndim == 1:  # ragged fallback: per-row object arrays
                xs = np.vstack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"]])
            scale = np.abs(xs).max(axis=1) / 127.0
            q = _half_up(xs / scale[:, None])
            err = np.abs(xs - q * scale[:, None]).max(axis=1)
            # same epsilon-then-round convention as the expression form
            scale_r = np.round(scale + 1e-12, 8)
            err_r = np.round(err + 1e-12, 6)
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(tbl["vec_id"], pa.int64()),
                    "label": pa.array(tbl["label"], pa.int32()),
                    "scale": pa.array(scale_r, pa.float64()),
                    "q_min": pa.array(q.min(axis=1).astype(np.int32), pa.int32()),
                    "q_max": pa.array(q.max(axis=1).astype(np.int32), pa.int32()),
                    "recon_err": pa.array(err_r, pa.float64()),
                }
            )

    return (
        embeddings.select("vec_id", "label", "embedding")
        .mapInArrow(quantize, out_schema)
        .orderBy("vec_id")
    )


def embedding_gramian(
    embeddings: DataFrame,
    *,
    dim: int = 64,
    vec_col: str = "embedding",
    method: str = "arrow",
) -> DataFrame:
    """Distributed Gram matrix X'X of the embedding corpus (upper
    triangle), the reduction behind PCA / covariance / whitening at
    corpus scale: dim^2 is tiny, N is huge, so every partition reduces
    to at most dim*(dim+1)/2 partial sums regardless of row count and
    the shuffle carries only (i, j, partial) triples.

    ``method="arrow"`` (default, the 100 TB path): one BLAS ``X'X``
    per Arrow-batched partition inside ``mapInPandas`` — a single
    matmul replaces the 30x row amplification of exploding per-row
    outer products, and each partition emits exactly one triangle.
    ``method="expr"`` is the pure-JVM twin (nested transform + one
    explode, partial+final agg) kept for environments without the
    Python worker and as the parity pin — both forms agree after the
    6-decimal round (test + shared DuckDB oracle).  Floats widen to
    double before multiplying on every path.
    """
    if method == "arrow":
        import numpy as np
        import pandas as pd

        iu0, iu1 = np.triu_indices(dim)

        def part(frames):
            g = np.zeros((dim, dim))
            seen = False
            for pdf in frames:
                if len(pdf) == 0:
                    continue
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                g += m.T @ m
                seen = True
            if seen:
                yield pd.DataFrame(
                    {"i": iu0.astype("int32"), "j": iu1.astype("int32"), "v": g[iu0, iu1]}
                )

        partials = embeddings.select(vec_col).mapInPandas(
            part, "i int, j int, v double"
        )
        return (
            partials.groupBy("i", "j")
            .agg(F.round(F.sum("v") + 1e-9, 6).alias("dot"))
            .orderBy("i", "j")
        )
    vec = F.col(vec_col)
    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at(vec, i + 1).cast("double")
                        * F.element_at(vec, j + 1).cast("double")
                    ).alias("v"),
                ),
            ),
        )
    )
    return (
        embeddings.select(F.explode(tri).alias("e"))
        .groupBy(F.col("e.i").alias("i"), F.col("e.j").alias("j"))
        .agg(F.round(F.sum("e.v") + 1e-9, 6).alias("dot"))
        .orderBy("i", "j")
    )


def embedding_pca(
    embeddings: DataFrame,
    *,
    dim: int = 64,
    n_components: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus PCA projection: principal components from the distributed
    Gram matrix + mean vector, eigendecomposition on the DRIVER (the
    matrix is dim x dim — bounded by the embedding width, never by
    corpus size), projection pushed back map-side as a pure expression
    (zip_with dot product against literal component vectors).

    This is the textbook two-pass distributed PCA: pass 1 reduces to
    (G, mu, n) — one aggregate, dim^2-bounded state; the covariance
    C = (G - n mu mu')/(n - 1) and its eigenvectors are driver math on
    a tiny matrix; pass 2 is embarrassingly parallel.  Eigenvector
    sign is fixed deterministically (largest-|coordinate| positive).
    """
    import numpy as np

    sums = embeddings.select(
        F.posexplode(F.col(vec_col)).alias("i", "v")
    ).groupBy("i").agg(
        F.sum(F.col("v").cast("double")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    stats = {r["i"]: (r["s"], r["n"]) for r in sums.collect()}
    n = stats[0][1]
    mu = np.array([stats[i][0] for i in range(dim)]) / n
    g_rows = embedding_gramian(embeddings, dim=dim, vec_col=vec_col).collect()
    g = np.zeros((dim, dim))
    for r in g_rows:
        g[r["i"], r["j"]] = r["dot"]
        g[r["j"], r["i"]] = r["dot"]
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:n_components]
    comps = []
    for k in order:
        v = eigvecs[:, k]
        if v[np.argmax(np.abs(v))] < 0:  # deterministic sign convention
            v = -v
        comps.append(v)
    centered = F.zip_with(
        F.col(vec_col),
        F.array(*[F.lit(float(m)) for m in mu]),
        lambda a, b: a.cast("double") - b,
    )
    proj_cols = [
        F.round(
            F.aggregate(
                F.zip_with(
                    centered,
                    F.array(*[F.lit(float(w)) for w in comp]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            + 1e-9,
            4,
        ).alias(f"pc{idx + 1}")
        for idx, comp in enumerate(comps)
    ]
    return embeddings.select(F.col(id_col), *proj_cols).orderBy(id_col)


def jl_projection_audit(
    embeddings: DataFrame,
    *,
    out_dim: int = 16,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection (dim -> out_dim, seeded
    Gaussian directions scaled 1/sqrt(out_dim)) with the distortion
    audit the lemma promises: per-vector original norm, projected
    norm, and their ratio.  The cheap dimensionality reduction for ANN
    pre-filtering when PCA's two passes are too expensive — data-
    independent, so it needs NO training pass and composes with
    streaming ingestion.

    Built as ONE parsed SQL expression (the `lsh_bucket_expr` lesson:
    a 16 x 64 literal matrix Column-by-Column costs thousands of Py4J
    round-trips; one string parse costs milliseconds).  Projection and
    norms are embarrassingly parallel map-side expressions — no
    shuffle at all; the deterministic plane family is the same seeded
    Gaussian as the sign-LSH, so DuckDB re-derives every value.
    """
    import math

    from flink_elasticsearch_ingestion_spark.operators.similarity import (
        _hyperplanes,
    )

    planes = _hyperplanes(dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    terms = []
    for p in planes:
        arr = "array(" + ",".join(repr(float(x)) + "D" for x in p) + ")"
        d = (
            f"aggregate(zip_with({vec_col}, {arr},"
            " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        terms.append(f"pow({d} * {scale!r}D, 2)")
    s2 = "(" + " + ".join(terms) + ")"
    norm2 = (
        f"aggregate({vec_col}, CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    return embeddings.select(
        F.col(id_col),
        F.expr(f"round(sqrt({norm2}) + 1e-9, 4)").alias("norm_orig"),
        F.expr(f"round(sqrt({s2}) + 1e-9, 4)").alias("norm_proj"),
        F.expr(f"round(sqrt({s2}) / sqrt({norm2}) + 1e-9, 4)").alias(
            "distortion"
        ),
    ).orderBy(id_col)


def linear_probe_scores(
    embeddings: DataFrame,
    *,
    n_classes: int = 3,
    dim: int = 64,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    passthrough_cols: tuple = (),
) -> DataFrame:
    """Broadcast-model linear scoring over the embedding corpus: one
    ``n_classes x dim`` weight matrix applied as pure map-side
    expressions — the shape of every "run a linear probe / classifier
    head / reward projection over 100 TB of embeddings" job.  The
    model rides the PLAN as one parsed literal (the `lsh_bucket_expr`
    lesson), not a driver loop or a Python UDF; per-class logits,
    argmax class, and the top-two margin are all whole-stage-codegen
    expressions, zero shuffles.

    Weights are the deterministic seeded Gaussian family shared with
    the sign-LSH / JL planes, so an independent SQL engine re-derives
    every logit bit-for-bit.
    """
    from flink_elasticsearch_ingestion_spark.operators.similarity import (
        _hyperplanes,
    )

    if n_classes < 2:
        # margin = top1 - top2 is ill-defined with one class, and the
        # element_at(array_sort(...), 0) it would compile to is an
        # invalid index in Spark SQL — fail loud like chunk_documents'
        # overlap guard rather than at plan execution
        raise ValueError(f"linear_probe_scores requires n_classes >= 2, got {n_classes}")
    w = _hyperplanes(dim, n_classes, seed)
    logits = []
    for c in range(n_classes):
        arr = "array(" + ",".join(repr(float(x)) + "D" for x in w[c]) + ")"
        logits.append(
            f"aggregate(zip_with({vec_col}, {arr},"
            " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    arr_logits = "array(" + ",".join(logits) + ")"
    # argmax with deterministic lowest-index tie-break; margin =
    # top1 - top2 (the abstention signal)
    pred = (
        f"array_position({arr_logits}, array_max({arr_logits})) - 1"
    )
    # element_at is 1-based in BOTH Spark SQL and DuckDB, so the
    # second-largest logit is element n_classes-1 of the ascending sort
    top2 = f"element_at(array_sort({arr_logits}), {n_classes - 1})"
    return embeddings.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough_cols],
        *[
            F.expr(f"round({lg} + 1e-9, 6)").alias(f"logit_{c}")
            for c, lg in enumerate(logits)
        ],
        F.expr(pred).cast("int").alias("pred_class"),
        F.expr(f"round(array_max({arr_logits}) - {top2} + 1e-9, 6)").alias(
            "margin"
        ),
    ).orderBy(id_col)


def probe_calibration(
    embeddings: DataFrame,
    *,
    n_bins: int = 8,
    bin_width: float = 0.05,
    n_classes: int = 3,
    dim: int = 64,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Reliability curve for the broadcast linear probe: bin the
    top-two MARGIN (the probe's confidence signal) into fixed
    literal-width bins and measure per-bin agreement with the stored
    labels — does confidence predict correctness?  This is the
    model-based data-curation eval loop: quality-classifier scores
    gate what enters a training corpus, and a mis-calibrated gate
    silently skews the corpus, so calibration itself must be a
    corpus-scale query.

    Scale shape: the probe logits/margins are zero-shuffle map-side
    expressions (the model rides the plan as one literal); labels stay
    in the same row, so calibration adds only the final <= n_bins-key
    aggregate.  Nothing driver-side, no joins.

    Fixed literal bins (not quantiles) keep the operator one-pass and
    the oracle exact — same decision as distribution_drift_psi.
    """
    scored = linear_probe_scores(
        embeddings,
        n_classes=n_classes,
        dim=dim,
        seed=seed,
        vec_col=vec_col,
        id_col=id_col,
        passthrough_cols=(label_col,),
    )
    bin_id = F.least(
        F.floor(F.col("margin") / F.lit(bin_width)).cast("int"),
        F.lit(n_bins - 1),
    )
    hit = (F.col("pred_class") == F.col(label_col)).cast("int")
    return (
        scored.select(
            bin_id.alias("bin_id"),
            F.col("margin"),
            hit.alias("hit"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("hit").alias("n_correct"),
            # margin is already 6dp-rounded upstream, so the sum is an
            # exact 1e-6-grid value on any engine; the two-step
            # round(round(sum)/n) derivation is the cross-engine
            # float convention (see SCALE.md)
            F.round(
                F.round(F.sum("margin"), 6) / F.count(F.lit(1)) + 1e-9, 6
            ).alias("mean_margin"),
            F.round(
                F.sum("hit") / F.count(F.lit(1)) + 1e-9, 6
            ).alias("accuracy"),
        )
        .withColumn(
            "bin_lo", F.round(F.col("bin_id") * F.lit(bin_width) + 1e-9, 2)
        )
        .select("bin_id", "bin_lo", "n", "n_correct", "accuracy", "mean_margin")
        .orderBy("bin_id")
    )


def hash_embedding_codebook(
    n_buckets: int = 32, dim: int = 16, seed: int = 0xE5BED
) -> list[tuple[int, int, float]]:
    """Deterministic Gaussian projection matrix in long form
    ``(bucket, dim, weight)`` — literal on both engines, same
    discipline as the LSH hyperplanes / PQ codebook."""
    import random as _random

    rng = _random.Random(seed)
    rows = []
    for b in range(n_buckets):
        for d in range(dim):
            rows.append((b, d, rng.gauss(0.0, 1.0) / (n_buckets ** 0.5)))
    return rows


def hash_embed_documents(
    documents: DataFrame,
    *,
    n_buckets: int = 32,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed random-projection document embeddings: bag-of-words
    counts hashed into ``n_buckets`` (engine-portable md5-31 family),
    then projected through a literal Gaussian matrix — a deterministic
    text -> dense-vector encoder that feeds the engine's ANN stack
    (LSH / IVF / PQ) when no learned model is in the loop, and the
    exact plumbing a learned encoder drops into.

    Long-form output ``(doc_id, dim, value)`` — the layout that scales
    (no wide rows, no arrays to aggregate order-sensitively): one
    corpus shuffle on (doc, bucket), a broadcast join against the
    bucket x dim matrix, one partial+final sum per (doc, dim).
    """
    from .dedup import portable_hash31

    spark = documents.sparkSession
    toks = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select(
            "doc_id",
            (portable_hash31(F.col("tok")) % F.lit(n_buckets)).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = spark.createDataFrame(
        hash_embedding_codebook(n_buckets, dim),
        "b int, d int, w double",
    )
    return (
        toks.join(F.broadcast(m), "b")
        .groupBy("doc_id", "d")
        .agg(
            F.round(F.sum(F.col("cnt") * F.col("w")) + F.lit(1e-9), 6).alias(
                "value"
            )
        )
        .orderBy("doc_id", "d")
    )


def centroid_margin(embeddings: DataFrame) -> DataFrame:
    """Label-noise scan via centroid margins (silhouette-lite): for
    each vector, squared-euclidean distance to its OWN label centroid
    vs the NEAREST other-label centroid; a negative margin (closer to
    a foreign class than to its own) flags a likely mislabeled
    example — the cheap first pass before any kNN-based confident-
    learning sweep.

    Scale shape: centroids come from ``label_centroids`` (ONE
    partial+final agg, |labels| x dims rows), pivot to |labels|
    centroid vectors — a table small enough to BROADCAST at any
    corpus size.  Each vector then does O(dims x |labels|) pure
    map-side arithmetic; the only per-vector "window" ranks |labels|
    candidate rows per vec_id — bounded by the label count, never by
    the corpus.

    Portability: centroids are pre-rounded to 4dp (the
    ``label_centroids`` contract), distances re-rounded to 4dp, and
    nearest-other ties break on label asc — every downstream
    comparison runs on identical decimals in any engine.
    """
    from pyspark.sql import Window

    cent = label_centroids(embeddings)
    cvec = cent.groupBy(F.col("label").alias("c_label")).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "centroid"))),
            lambda s: s["centroid"],
        ).alias("cvec")
    )
    d = embeddings.crossJoin(F.broadcast(cvec)).select(
        "vec_id",
        "label",
        "c_label",
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.col("cvec"),
                    lambda x, c: (x.cast("double") - c)
                    * (x.cast("double") - c),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            + 1e-9,
            4,
        ).alias("dist"),
    )
    own = d.filter(F.col("c_label") == F.col("label")).select(
        "vec_id", "label", F.col("dist").alias("d_own")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("c_label").asc()
    )
    other = (
        d.filter(F.col("c_label") != F.col("label"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "vec_id",
            F.col("c_label").alias("nearest_other_label"),
            F.col("dist").alias("d_nearest_other"),
        )
    )
    margin = F.round(
        F.col("d_nearest_other") - F.col("d_own") + 1e-9, 4
    )
    return (
        own.join(other, "vec_id")
        .select(
            "vec_id",
            "label",
            "nearest_other_label",
            "d_own",
            "d_nearest_other",
            margin.alias("margin"),
            (margin < 0).alias("suspect"),
        )
        .orderBy("vec_id")
    )


def kcenter_select(
    embeddings: DataFrame,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal) — the diversity-maximizing data-selection pass: pick the
    min-id seed, then repeatedly take the vector FARTHEST from the
    already-selected set.  The selected k points 2-approximate the
    optimal k-center cover; the emitted distance sequence is the
    coverage-radius curve a data-curation run reads to choose k.

    Scale shape (the ``bpe_train``/IVF iterative discipline): the
    min-distance column is maintained INCREMENTALLY — each of the k-1
    iterations folds exactly ONE new center literal into
    ``least(md, dist_to_new)`` (so expression trees stay O(dim), never
    O(k x dim) — the round-4 Catalyst plan-size lesson), persists the
    k-bounded state, and takes a 1-row argmax action.  Driver state is
    k ids + k vectors; per-row work across the whole run is O(k x dim).

    Portability: every distance is rounded to 4dp BEFORE entering the
    running min / argmax, ties break on id asc — the greedy trajectory
    is then a pure function of the data and replays exactly in an
    unrolled SQL oracle."""
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    seed_row = vecs.orderBy("vec_id").first()
    selected = [(0, int(seed_row["vec_id"]), 0.0)]
    center = list(seed_row["v"])

    def dist_to(center_vals):
        carr = F.array(*[F.lit(float(c)) for c in center_vals])
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.col("v"), carr, lambda x, c: (x - c) * (x - c)
                ),
                F.lit(0.0),
                lambda acc, val: acc + val,
            )
            + 1e-9,
            4,
        )

    state = vecs.withColumn("md", dist_to(center)).persist()
    prev = None
    try:
        for rank in range(1, k):
            chosen_ids = [s[1] for s in selected]
            # ONE job per iteration: the argmax action materializes this
            # iteration's cached state (carrying v, so no second lookup)
            far = (
                state.filter(~F.col("vec_id").isin(chosen_ids))
                .orderBy(F.col("md").desc(), F.col("vec_id").asc())
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
            if not far:
                break
            row = far[0]
            selected.append((rank, int(row["vec_id"]), float(row["md"])))
            prev = state
            state = state.withColumn(
                "md", F.least(F.col("md"), dist_to(list(row["v"])))
            ).persist()
    finally:
        if prev is not None:
            prev.unpersist()
        state.unpersist()
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        selected, "rank int, vec_id long, dist double"
    ).orderBy("rank")


def _kmeans_assign_expr(vec_name: str, cents_scaled, scale: float = 1e4):
    """Nearest-centroid struct ``(d, i)`` for a scaled-int codebook,
    built as ONE parsed SQL expression (the pq_encode plan-size
    discipline: a single ``transform`` over a literal codebook array,
    argmin via struct-``array_min`` — never k copies of the distance
    tree).  Centroid doubles are Python-computed ``m / scale`` literals;
    IEEE division makes them bit-identical to an engine computing
    ``m / 10000.0`` from the same integers."""
    cb = (
        "array("
        + ",".join(
            "array(" + ",".join(repr(m / scale) + "D" for m in c) + ")"
            for c in cents_scaled
        )
        + ")"
    )
    return F.expr(
        f"array_min(transform({cb}, (c, j) -> named_struct("
        f"'d', round(aggregate(zip_with({vec_name}, c,"
        f" (x, y) -> (x - y) * (x - y)),"
        f" CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) + 1e-9, 4),"
        f" 'i', j)))"
    )


def kmeans_fixed(
    embeddings: DataFrame,
    *,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means over the FULL corpus, fixed
    iterations, bit-replayable trajectory — the semantic-clustering
    pass a corpus-curation pipeline runs before per-cluster sampling
    or cluster-balanced training mixes.  Complements
    ``train_ivf_centroids`` (driver-side sampled k-means, rows-only
    oracle): here every corpus vector votes in every update, yet the
    whole trajectory is a pure function of the data, hash-verified by
    an independent engine.

    Determinism contract (the cross-engine float discipline):
    - init = the k min-id vectors, quantized to 1e-4 ints in-engine;
    - assignment distance pre-rounded to 4dp, ties to the lowest
      cluster id (struct-``array_min``);
    - centroid updates accumulate the QUANTIZED int vectors in exact
      int64 (64 map-side partial sums, one aggregate per iteration —
      never a float sum, whose order-dependence would diverge between
      engines), then ONE IEEE double division + floor per element:
      ``floor((2*s + n) / (2*n))`` == round-half-up of s/n at scale;
    - empty clusters keep their previous centroid.

    Scale shape: per iteration = one partial+final aggregate (dim sum
    columns) + a k-row collect; driver state is k x dim ints; the
    codebook re-enters each job as a one-parse literal expression.
    Output: one row per non-empty final cluster
    ``(cluster_id, n_members, inertia)`` with inertia summed exactly
    in scaled int64."""
    import math

    vecs = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias(
                "v"
            ),
        )
        .withColumn(
            "iv",
            F.expr("transform(v, x -> CAST(round(x * 10000.0, 0) AS BIGINT))"),
        )
        .persist()
    )
    try:
        init = vecs.orderBy("vec_id").limit(k).collect()
        cents = [[int(x) for x in r["iv"]] for r in init]
        dim = len(cents[0])
        for _ in range(iters):
            assigned = vecs.withColumn(
                "st", _kmeans_assign_expr("v", cents)
            )
            sums = (
                assigned.groupBy(F.col("st.i").alias("cl"))
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.element_at("iv", i + 1)).alias(f"s{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            by_cl = {int(r["cl"]): r for r in sums}
            cents = [
                cents[j]
                if j not in by_cl
                else [
                    math.floor(
                        (2 * int(by_cl[j][f"s{i}"]) + int(by_cl[j]["n"]))
                        / (2 * int(by_cl[j]["n"]))
                    )
                    for i in range(dim)
                ]
                for j in range(len(cents))
            ]
        final = vecs.withColumn("st", _kmeans_assign_expr("v", cents))
        return (
            final.groupBy(F.col("st.i").cast("int").alias("cluster_id"))
            .agg(
                F.count("*").alias("n_members"),
                F.sum(
                    F.expr("CAST(round(st.d * 10000.0, 0) AS BIGINT)")
                ).alias("in_scaled"),
            )
            .withColumn("inertia", F.col("in_scaled") / F.lit(10000.0))
            .drop("in_scaled")
            .orderBy("cluster_id")
        )
    finally:
        vecs.unpersist()


def dim_truncation_recall(
    embeddings: DataFrame,
    *,
    trunc_dim: int = 32,
    k: int = 10,
    n_queries: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka truncation eval: recall@k of TRUNCATED-dimension
    cosine retrieval against full-dimension ground truth, per query —
    the measurement that decides whether an embedding column can be
    stored/searched at half width (2x memory-bandwidth win in every
    downstream ANN pass) without losing ranking quality.

    For each query in a FIXED bounded panel (``vec_id < n_queries`` —
    an eval runs on a sampled query set by design, so the
    corpus x panel candidate join is a broadcast of the panel, the
    same named exemption as ``knn_join``'s exact baseline), rank the
    corpus by full-dim cosine and by first-``trunc_dim``-dim cosine
    (both rounded to 6dp, ties to the lowest id) and report the top-k
    overlap.  Wide work = one broadcast join + two bounded
    per-query-partition windows; at 100 TB the panel stays O(10-100)
    and the ranking becomes per-query TakeOrdered."""
    from pyspark.sql import Window

    from .similarity import cosine

    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cs_full"),
            F.round(
                cosine(
                    F.slice(F.col("v"), 1, trunc_dim),
                    F.slice(F.col("qv"), 1, trunc_dim),
                ),
                6,
            ).alias("cs_tr"),
        )
    )
    wf = Window.partitionBy("qid").orderBy(F.desc("cs_full"), "vec_id")
    wt = Window.partitionBy("qid").orderBy(F.desc("cs_tr"), "vec_id")
    ranked = scored.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rt", F.row_number().over(wt)
    )
    return (
        ranked.filter((F.col("rf") <= k) | (F.col("rt") <= k))
        .groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.sum(
                F.when((F.col("rf") <= k) & (F.col("rt") <= k), 1).otherwise(
                    0
                )
            ).alias("n_overlap")
        )
        .select(
            "query_id",
            "n_overlap",
            F.round(
                F.col("n_overlap") / F.lit(float(k)) + F.lit(1e-9), 4
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


def top_component(
    embeddings: DataFrame,
    *,
    iters: int = 5,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal direction of the embedding corpus by POWER
    ITERATION on the distributed Gram matrix — the hash-verifiable
    sibling of ``embedding_pca`` (whose driver-side ``eigh`` is
    rows-only by nature): one corpus-scale X'X reduction
    (``embedding_gramian``: dim^2-bounded shuffle regardless of N),
    then ``iters`` matrix-vector products on the 6dp-ROUNDED dim x dim
    matrix, driver-side and bounded.

    Determinism contract: the rounded Gram matrix is the cross-engine
    boundary (already oracle-pinned); every subsequent dot product
    uses the sequential left fold (``_py_dot`` order == DuckDB
    ``list_dot_product`` == Spark ``aggregate``), norms are single
    ``sqrt`` calls (IEEE-correct), and each iterate is re-rounded to
    6dp — so the whole trajectory replays in an unrolled CTE oracle.
    v0 = all-ones (no normalization-sign ambiguity: the iterate's sign
    flows from G itself).

    Output: one row per dimension ``(dim_index, loading, eigenvalue)``
    with the Rayleigh-quotient eigenvalue repeated (the top spectral
    summary a whitening/JL decision reads)."""
    import math

    from .similarity import _py_dot

    g_rows = embedding_gramian(embeddings, dim=dim, vec_col=vec_col).collect()
    G = [[0.0] * dim for _ in range(dim)]
    for r in g_rows:
        G[r["i"]][r["j"]] = r["dot"]
        G[r["j"]][r["i"]] = r["dot"]

    def rnd6(x: float) -> float:
        s = 1.0 if x >= 0 else -1.0
        return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6

    v = [1.0] * dim
    for _ in range(iters):
        w = [_py_dot(G[i], v) for i in range(dim)]
        nrm = math.sqrt(_py_dot(w, w))
        v = [rnd6(x / nrm) for x in w]
    w = [_py_dot(G[i], v) for i in range(dim)]
    lam = rnd6(_py_dot(v, w))
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i, v[i], lam) for i in range(dim)],
        "dim_index int, loading double, eigenvalue double",
    ).orderBy("dim_index")
