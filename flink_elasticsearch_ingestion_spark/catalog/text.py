"""Catalog family: text analysis, tokenization, quality scoring, retrieval.

Each query (QUERIES) sits next to its DuckDB oracle (ORACLES) so
the pair is reviewed and edited together — drift between the
Spark plan and the SQL twin stays visible in one diff."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators import (
    text as X,
    windows as W,
)
from flink_elasticsearch_ingestion_spark.catalog._shared import (
    _t,
    ORDERS_RULES,
    _BPE_MERGES,
    _kn_scores_sql,
    _bm25_cte,
    _textrank_sql,
)


def q_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency: explode tokens -> count -> top 20.
    The explode is map-side; the count is one shuffle on the token."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("word")
    ).filter(F.length("word") >= 3)
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(20)
    )

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.text_stats(_t(spark, sf_dir, "documents"))

def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.quality_scores(_t(spark, sf_dir, "documents")).orderBy("doc_id")

def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.language_id(_t(spark, sf_dir, "documents")).orderBy("doc_id")

def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count("text").alias("ws_tokens"),
        X.bpe_ish_token_count("text").alias("bpe_tokens"),
    ).orderBy("doc_id")

def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (BPE-ish subwords per
    whitespace word + subwords per 100 chars): the multiplier that
    turns a per-language word budget into an actual token budget.
    Integer sums -> exact, order-insensitive ratios."""
    return X.token_fertility_by_lang(_t(spark, sf_dir, "documents"))

def q_score_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quality normalization: per-document token-entropy
    percentile WITHIN its source, so one percentile threshold means
    the same thing across heterogeneous sources."""
    return X.score_normalize_by_source(_t(spark, sf_dir, "documents"))

def q_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped top-20 by quality (max 2 per source):
    per-source window then one TakeOrdered over <= cap x |sources|
    rows — the anti-monopoly result-shaping constraint."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        diversified_topk,
    )

    return diversified_topk(_t(spark, sf_dir, "documents"))

def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical richness (TTR / hapax ratio / Herdan's C):
    one explode + two partial+final hash aggs, no windows."""
    return X.lexical_diversity(_t(spark, sf_dir, "documents"))

def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source OOV rate against the corpus's own top-200 token
    vocabulary (deterministic count-desc/token-asc cut): vocab-sized
    ranking window + broadcast membership join, fact side is pure
    partial+final aggregation."""
    return X.oov_rate(_t(spark, sf_dir, "documents"), vocab_size=200)

def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TextRank keywords: adjacent-token co-occurrence graph +
    damped random-walk centrality run as a FIXED-POINT integer
    recurrence (1e-6-unit int64 ranks, exact int division/sums — no
    float op in the loop), bit-replayed by an unrolled CTE oracle."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        textrank_keywords,
    )

    return textrank_keywords(
        _t(spark, sf_dir, "documents"), n_iter=4, top_k=20
    )

def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=6) over the (nation, market-segment) QI
    pair with the balance bucket as the sensitive attribute: groups
    with < 6 distinct sensitive values leak the attribute even when
    k-anonymous.  One partial+final aggregate."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        l_diversity_audit,
    )

    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_bucket",
        F.floor(F.col("c_acctbal").cast("double") / F.lit(1000.0)).cast(
            "bigint"
        ),
    )
    return l_diversity_audit(
        cust, ["c_nationkey", "c_mktsegment"], "bal_bucket", l=6
    )

def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release audit over the
    (lang, source) grid: symmetric-geometric integer noise derived
    from an engine-portable seeded hash (P(|z|=m)=2^-(m+1), eps~ln2),
    noisy count clamped at zero — all exact integer arithmetic, one
    partial+final aggregate."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        dp_histogram,
    )

    return dp_histogram(
        _t(spark, sf_dir, "documents"), ["lang", "source"]
    )

def q_skyline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier (skyline) document selection on (token count,
    type-token ratio): map-side per-doc metrics, dominance sweep on
    the bounded distinct-length axis, broadcast frontier rejoin."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        skyline_docs,
    )

    return skyline_docs(_t(spark, sf_dir, "documents"))

def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM over daily revenue: fact table aggregates to the
    calendar-bounded day axis, the sequential recurrence runs as ONE
    JVM aggregate fold (inputs pre-rounded so any engine replays the
    IEEE sequence bit-for-bit)."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        cusum_changepoints,
    )

    return cusum_changepoints(_t(spark, sf_dir, "orders"))

def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking against deterministic all-terms
    binary relevance — the rank-quality metric completing the
    search-eval family; <= k-row frames after the TakeOrdered."""
    from flink_elasticsearch_ingestion_spark.operators.text import ndcg_eval

    return ndcg_eval(
        _t(spark, sf_dir, "documents"), ["spark", "merge", "window"], k=10
    )

def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem numeric columns
    in ONE aggregation pass (6 corr buffers, single scan) — the
    feature-redundancy profiler companion."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        correlation_matrix,
    )

    return correlation_matrix(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 denoising-objective prep: deterministic hash-seeded mask
    spans (~15%), sentinel-collapsed corrupted input + sentinel-
    prefixed target, md5-scalar contract columns."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        span_corruption,
    )

    return span_corruption(_t(spark, sf_dir, "documents"))

def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 + __MICRO__ accuracy of the
    heuristic language-ID against the gold lang labels — the eval
    loop for model-scored corpus gates; everything past the first
    agg is label-cardinality-sized."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        classifier_eval,
    )

    return classifier_eval(X.language_id(_t(spark, sf_dir, "documents")))

def q_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals: 9-row digit
    axis with observed/expected shares and per-digit chi-square
    contributions — the forensic QA check for fabricated amounts."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        benford_check,
    )

    return benford_check(_t(spark, sf_dir, "orders"), "o_totalprice")

def q_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration summary (HHI, CR4, top share) across
    nations: one fact agg, then |nations|-row frame only."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        market_concentration,
    )

    return market_concentration(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
    )

def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source quality percentiles onto
    the global entropy distribution (21-point exact quantile grid,
    1-row broadcast, map-side array lookup) — cross-source scores on
    ONE comparable scale."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        quantile_normalize_by_source,
    )

    return quantile_normalize_by_source(_t(spark, sf_dir, "documents"))

def q_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-14-row z-score anomaly flags on the daily revenue
    series (self-excluded frame, min 7 days history): one calendar-
    bounded aggregate, analytic window over <= |days| rows only."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        revenue_anomalies,
    )

    return revenue_anomalies(_t(spark, sf_dir, "orders"))

def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law OLS fit per language (ln freq ~ ln rank, top-200
    terms): corpus-distribution sanity metric.  Vocab-keyed aggs and
    vocabulary-sized window partitions only."""
    from flink_elasticsearch_ingestion_spark.operators.text import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"))

def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the (nation, market-segment,
    balance-bucket) quasi-identifier triple: per at-risk group rows
    plus a __TOTAL__ summary — the governance gate before releasing
    user-adjacent data."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        k_anonymity_audit,
    )

    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_bucket",
        F.floor(F.col("c_acctbal").cast("double") / F.lit(2000.0)).cast(
            "bigint"
        ),
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment", "bal_bucket"], k=5
    )

def q_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square term-class association (top-10 per language, min doc
    freq 5): feature selection / domain-term mining.  Vocab-keyed aggs
    and vocabulary-sized window partitions; products in double so the
    statistic survives petabyte doc counts; the top-k cut ranks on the
    ROUNDED statistic so both engines agree at boundaries."""
    from flink_elasticsearch_ingestion_spark.operators.text import chi2_terms

    return chi2_terms(_t(spark, sf_dir, "documents"))

def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by smoothed TF-IDF; rank ties
    break alphabetically so both engines order identically."""
    return X.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)

def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing of token counts into capacity-512 bins
    per (lang, doc_id%8) stream (applyInPandas per group), summarized
    as per-stream packing efficiency. The oracle replays the identical
    greedy recurrence as a DuckDB recursive CTE."""
    from flink_elasticsearch_ingestion_spark.operators.packing import (
        pack_documents,
        packing_summary,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", X.token_count("text").cast("long")
    )
    assigned = pack_documents(docs, capacity=512, n_shards=8)
    return packing_summary(assigned, capacity=512)

def q_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snake-balanced (LPT-style) assignment of documents into 8
    training shards by whitespace-token size — the export step that
    keeps data-parallel workers' token totals flat. Global size rank
    via the two-phase (coarse-range + broadcast offsets) discipline;
    no single-partition window."""
    from flink_elasticsearch_ingestion_spark.operators.packing import (
        balanced_shards,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", X.token_count("text").cast("long")
    )
    return balanced_shards(docs, n_shards=8)

def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc repeated-trigram fraction (Gopher-style repetition
    filter) — map-side only."""
    return X.repetition_ratio(_t(spark, sf_dir, "documents")).orderBy("doc_id")

def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub contract: deterministic synthetic PII is appended to
    each doc (same construction in the oracle), then redacted; the
    sha256 of the redacted text pins the exact replacement behavior."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +123456789"),
        ),
    )
    out = X.redact_pii(docs)
    return out.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.length("redacted_text").alias("n_chars"),
        F.sha2("redacted_text", 256).alias("redacted_sha"),
    ).orderBy("doc_id")

def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.top_bigrams(_t(spark, sf_dir, "documents"))

def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.source_mix(_t(spark, sf_dir, "documents"))

def q_vocab_with_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.vocab_with_ids(_t(spark, sf_dir, "documents"), min_count=2)

def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.token_entropy(_t(spark, sf_dir, "documents"))

def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.event_trigrams(_t(spark, sf_dir, "events"))

def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profiler over lineitem's numeric measures."""
    from flink_elasticsearch_ingestion_spark.operators import quality as Q

    return Q.table_profile(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift monitor: order-value distribution, pre- vs post-1998."""
    from flink_elasticsearch_ingestion_spark.operators import quality as Q

    period = F.when(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "ref"
    ).otherwise("cur")
    return Q.distribution_drift_psi(
        _t(spark, sf_dir, "orders"), "o_totalprice", period
    )

def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS statistic on the same split/grid as
    drift_psi: sup-norm CDF distance localizing WHERE the order-value
    distribution slid between periods."""
    from flink_elasticsearch_ingestion_spark.operators import quality as Q

    period = F.when(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "ref"
    ).otherwise("cur")
    return Q.ks_drift(_t(spark, sf_dir, "orders"), "o_totalprice", period)

def q_term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index dictionary head: df/cf/max_tf of the top-20 terms."""
    return X.term_statistics(_t(spark, sf_dir, "documents"), k=20)

def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed 3-term query (Lucene idf variant)."""
    return X.bm25_search(
        _t(spark, sf_dir, "documents"), ["spark", "merge", "window"], k=10
    )

def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorized order-value stats (exact p01/p99 clip)."""
    from flink_elasticsearch_ingestion_spark.operators import quality as Q

    return Q.winsorized_stats(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority"
    )

def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning contract: deterministic HTML/boilerplate lines
    are appended to each doc (same construction in the oracle) so the
    tag-strip, entity-unescape, and short-line filters all fire."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit("\n<div>menu</div>\nHome About\n&amp; final long closing line here"),
        ),
    )
    return X.clean_text(docs).orderBy("doc_id")

def q_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass declarative DQ audit of orders + one FK check."""
    from flink_elasticsearch_ingestion_spark.operators import quality as Q

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    report = Q.constraint_report(orders, ORDERS_RULES)
    ref = Q.referential_report(orders, customer, fk="o_custkey", pk="c_custkey")
    return report.unionByName(ref).orderBy("rule")

def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.bigram_lm_score(_t(spark, sf_dir, "documents"))

def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.chunk_documents(_t(spark, sf_dir, "documents"))

def q_chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return X.chunk_documents_udtf(_t(spark, sf_dir, "documents"))

def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality rules (word band, mean word
    length, symbol/bullet/ellipsis/alpha fractions, stopword floor)."""
    return X.gopher_quality(_t(spark, sf_dir, "documents"))

def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier screen: exact median/MAD, values
    beyond 3 robust sigmas counted."""
    from flink_elasticsearch_ingestion_spark.operators.quality import mad_outliers

    return mad_outliers(_t(spark, sf_dir, "events"), "value", "event_type")

def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INFERENCE half of the BPE tokenizer, hash-verified: apply a
    fixed merge table to every document via the shared JVM merge fold
    (vocabulary-sized chained passes, one plan, no driver loop) and
    emit per-doc counts + the full encoded symbol stream.  The DuckDB
    oracle replays every greedy left-to-right merge decision through a
    recursive CTE over (word, merge rank, symbol position)."""
    return X.bpe_encode(_t(spark, sf_dir, "documents"), _BPE_MERGES)

def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words: 16-dim vocabulary-free count
    vectors, engine-portable hashes, zero shuffles."""
    return X.feature_hashing(_t(spark, sf_dir, "documents"))

def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training inner loop: corpus-weighted adjacent char-pair
    counts over the word vocabulary (top 20)."""
    return X.bpe_pair_counts(_t(spark, sf_dir, "documents"))

def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE training (5 merges). Rows-only by design: the
    merge LOOP is driver-side control flow (argmax -> merge -> recount
    like IVF training), not a single SQL expression; the inner-loop
    recount has its own hash-green oracle (bpe_pair_counts), the loop
    is pinned by a pure-Python reference differential test, and the
    2-merge unrolled trainer (bpe_train_fixed) is HASH-verified via
    the sentinel-replace state encoding."""
    return X.bpe_train(_t(spark, sf_dir, "documents"), n_merges=5)

def q_bpe_train_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-merge fixed-iteration BPE trainer, hash-oracle-checked end to
    end (VERDICT r9 #6): the symbol state is a \\x01<sym>\\x02 sentinel
    string, so each greedy merge is ONE literal replace that DuckDB
    replays exactly; the oracle unrolls both iterations as
    materialized CTEs (the kmeans_fixed pattern) — argmax pair,
    replace, recount, argmax. Parity of the replace encoding with
    bpe_train's struct fold is unit-pinned, so this hash proof covers
    the shared merge semantics."""
    return X.bpe_train_fixed(_t(spark, sf_dir, "documents"), n_merges=2)

def q_ql_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Ponte & Croft /
    Zhai & Lafferty) — the language-modeling scorer beside BM25; same
    two-pass shape (one broadcast corpus-stats row, pure-expression
    score, TakeOrdered)."""
    return X.ql_search(
        _t(spark, sf_dir, "documents"), ["spark", "merge", "window"], k=10
    )

def q_kn_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram cross-entropy per document — the
    smoothed corpus-LM quality filter (continuation probabilities +
    absolute discounting) next to the unsmoothed bigram_lm. All model
    quantities are exact integer counts, so the oracle replays the
    model bit-for-bit."""
    return X.kneser_ney_score(_t(spark, sf_dir, "documents"))


def q_group_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tie-aware ROC-AUC (Mann-Whitney, midrank convention)
    of the char-length score against the lang=='en' label — does the
    cheap score separate the classes, per source? Computed WITHOUT
    ranking fact rows: one agg to (source, score) bounded by the score
    domain, then a window over that bounded table; the U numerator
    stays in integer arithmetic so no cross-engine float drift."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        group_auc,
    )

    return group_auc(_t(spark, sf_dir, "documents"))

def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two heuristic keep/drop gates (char-length
    vs token-count) per source — chance-corrected agreement, the
    annotation-QA metric raw agreement overstates. Single scan, one
    2x2 contingency agg per group; every output is a ratio of integer
    counts."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        gate_agreement_kappa,
    )

    return gate_agreement_kappa(_t(spark, sf_dir, "documents"))

def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across a THREE-gate keep/drop panel (char length,
    token count, space count) per source — the m-rater agreement
    statistic a filter-panel datasheet quotes where pairwise Cohen's
    kappas under-report joint reliability. Integer-sum aggregation
    only; single scan."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        gate_fleiss_kappa,
    )

    return gate_fleiss_kappa(_t(spark, sf_dir, "documents"))

def q_spearman_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (midrank ties) between the char-length
    and token-count quality signals per source — the gate-redundancy
    audit next to fleiss_kappa. Computed without ranking fact rows:
    bounded joint distribution -> marginal midranks -> weighted
    Pearson, the group_auc discipline."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        spearman_gate_correlation,
    )

    return spearman_gate_correlation(_t(spark, sf_dir, "documents"))

def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 and Dirichlet-QL rankers
    (hybrid search, the ES `rrf` retriever's algorithm): 1/(60+rank)
    per ranker over each top-20, fused on two <= 20-row post-
    TakeOrdered frames — adds nothing to the two scorers' scan cost."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        rrf_fusion,
    )

    return rrf_fusion(
        _t(spark, sf_dir, "documents"), ["spark", "merge", "window"], k=10
    )

def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-note datasheet per (source, lang): volume, exact-dup
    rate, PII probe — one hash aggregate, formulas shared verbatim
    with dedup_content / token_counts / redact_pii so the summary and
    the focused queries cannot disagree."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        corpus_datasheet,
    )

    return corpus_datasheet(_t(spark, sf_dir, "documents"))



def q_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter calibration: survivor docs/tokens at each candidate
    quality threshold (conditional aggregation to ONE row, then a
    bounded explode — no grid x fact expansion). Thresholds sit between
    the score formula's attainable 0.1 levels so no float boundary can
    flip."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        quality_threshold_sweep,
    )

    return quality_threshold_sweep(_t(spark, sf_dir, "documents"))



def q_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the corpus token-frequency distribution —
    one-number concentration KPI; built on vocab_with_ids' two-phase
    global rank (no single-partition window), ONE vocab-sized
    aggregate, integer until the final division."""
    from flink_elasticsearch_ingestion_spark.operators.text import token_gini

    return token_gini(_t(spark, sf_dir, "documents"))


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (labeled lang vs the stopword-vote
    guess): the eval that locates WHERE the heuristic fails before it
    routes documents to per-language pipelines. One aggregate over
    language_id's projection + a bounded |langs|-axis share window."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        langid_confusion,
    )

    return langid_confusion(_t(spark, sf_dir, "documents"))


def q_source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution KL divergence vs the corpus over
    the top-200 vocab (add-one smoothed) — the mixing-drift diagnostic.
    One token explode + (source, token) agg; vocab is a broadcast
    post-limit frame; the source x vocab completion grid is the
    bounded label-dimension cross-expansion (chi2_terms class)."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        source_kl_drift,
    )

    return source_kl_drift(_t(spark, sf_dir, "documents"), vocab_k=200)


def q_doc_length_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score calibration by length decile (mean score + keep
    rate per band): catches a quality filter that is secretly a length
    filter. Breakpoints via ONE exact 1-row percentile aggregate
    broadcast map-side (the rfm_segments discipline — no global ntile
    window); the 1-row broadcast is the allowlisted scalar BNLJ."""
    from flink_elasticsearch_ingestion_spark.operators.quality import (
        doc_length_calibration,
    )

    return doc_length_calibration(_t(spark, sf_dir, "documents"))


def q_token_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token-mass coverage at candidate vocab sizes (5 ..
    5000; the small sizes keep the curve populated at tiny fixtures) — the vocab-sizing curve between oov_rate (one fixed vocab)
    and token_gini (one number). Two-phase global frequency rank +
    vocab-axis running sum, sampled at a literal grid."""
    from flink_elasticsearch_ingestion_spark.operators.text import (
        token_coverage_curve,
    )

    return token_coverage_curve(_t(spark, sf_dir, "documents"))


#: driver-contract queries owned by this family (names are the
#: catalog keys the driver and the oracle gate use verbatim)
def q_context_window_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window budget curve (r10): per candidate sequence
    length, the share of documents that fit whole, the token mass in
    fitting docs, and the mass surviving clip-at-window — the
    truncation-waste account behind picking a training context length.
    One aggregate row of conditional integer sums, inlined to the
    size grid; no corpus fan-out, no grid join."""
    return X.context_window_fit(_t(spark, sf_dir, "documents"))

def q_length_bucketing_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste vs bucket-count sweep (r11): the PADDING side of
    the batch-assembly budget next to context_window_fit's truncation
    side — per equi-depth length-bucket count nb in {1,2,4,8}, the pad
    tokens burned when each bucket pads to its own max. Two-phase
    global length rank (no single-partition window) + SQL-standard
    ntile arithmetic the oracle replays in integers."""
    return X.length_bucketing_waste(_t(spark, sf_dir, "documents"))

def q_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness / dispersion (Church & Gale 1995), r10: VMR of
    per-doc counts for the top-20 corpus tokens — Poisson-like scatter
    vs topical burst, the signal behind stop-lists, df-caps and BM25
    TF saturation. Integer moments (sum, sum-of-squares) until the
    final division, so both engines round identical doubles."""
    return X.token_burstiness(_t(spark, sf_dir, "documents"), k=20)

QUERIES = {
    "token_coverage_curve": q_token_coverage_curve,
    "token_gini": q_token_gini,
    "langid_confusion": q_langid_confusion,
    "source_kl_drift": q_source_kl_drift,
    "doc_length_calibration": q_doc_length_calibration,
    "quality_threshold_sweep": q_quality_threshold_sweep,
    "corpus_datasheet": q_corpus_datasheet,
    "text_stats": q_text_stats,
    "quality_scores": q_quality_scores,
    "language_id": q_language_id,
    "token_counts": q_token_counts,
    "token_fertility": q_token_fertility,
    "event_trigrams": q_event_trigrams,
    "table_profile": q_table_profile,
    "drift_psi": q_drift_psi,
    "winsorized_stats": q_winsorized_stats,
    "gopher_quality": q_gopher_quality,
    "mad_outliers": q_mad_outliers,
    "bpe_encode": q_bpe_encode,
    "ks_drift": q_ks_drift,
    "score_normalize": q_score_normalize,
    "chi2_terms": q_chi2_terms,
    "zipf_fit": q_zipf_fit,
    "k_anonymity": q_k_anonymity,
    "revenue_anomalies": q_revenue_anomalies,
    "quantile_normalize": q_quantile_normalize,
    "benford_check": q_benford_check,
    "market_concentration": q_market_concentration,
    "langid_eval": q_langid_eval,
    "span_corruption": q_span_corruption,
    "correlation_matrix": q_correlation_matrix,
    "ndcg_eval": q_ndcg_eval,
    "diversified_topk": q_diversified_topk,
    "lexical_diversity": q_lexical_diversity,
    "oov_rate": q_oov_rate,
    "cusum_changepoints": q_cusum_changepoints,
    "skyline_docs": q_skyline_docs,
    "dp_histogram": q_dp_histogram,
    "l_diversity": q_l_diversity,
    "textrank_keywords": q_textrank_keywords,
    "kn_bigram_score": q_kn_bigram_score,
    "ql_search": q_ql_search,
    "feature_hashing": q_feature_hashing,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bpe_train": q_bpe_train,
    "bpe_train_fixed": q_bpe_train_fixed,
    "context_window_fit": q_context_window_fit,
    "length_bucketing_waste": q_length_bucketing_waste,
    "token_burstiness": q_token_burstiness,
    "tfidf_top_terms": q_tfidf_top_terms,
    "pack_documents": q_pack_documents,
    "repetition_ratio": q_repetition_ratio,
    "redact_pii": q_redact_pii,
    "top_bigrams": q_top_bigrams,
    "term_postings": q_term_postings,
    "bm25_search": q_bm25_search,
    "group_auc": q_group_auc,
    "cohens_kappa": q_cohens_kappa,
    "fleiss_kappa": q_fleiss_kappa,
    "balanced_shards": q_balanced_shards,
    "spearman_scores": q_spearman_scores,
    "rrf_fusion": q_rrf_fusion,
    "source_mix": q_source_mix,
    "chunk_documents": q_chunk_documents,
    "chunk_documents_udtf": q_chunk_documents_udtf,
    "vocab_with_ids": q_vocab_with_ids,
    "token_entropy": q_token_entropy,
    "constraint_report": q_constraint_report,
    "bigram_lm": q_bigram_lm,
    "clean_text": q_clean_text,
    "top_words": q_top_words,
}

#: DuckDB oracle per query — keys MUST be a subset of QUERIES
ORACLES = {
    "token_coverage_curve": (
        # same tokenization + (cnt DESC, token) rank as vocab_with_ids
        "WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)),"
        " '\\s+')) AS token FROM documents),"
        " c AS (SELECT token, count(*) AS cnt FROM toks"
        "  WHERE length(token) > 0 GROUP BY token),"
        " r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token)"
        "  AS token_id FROM c),"
        " s AS (SELECT token_id, cnt,"
        "  sum(cnt) OVER (ORDER BY token_id ROWS UNBOUNDED PRECEDING)"
        "   AS covered_tokens,"
        "  sum(cnt) OVER () AS total_tokens FROM r)"
        " SELECT CAST(token_id AS INT) AS vocab_size,"
        " CAST(covered_tokens AS BIGINT) AS covered_tokens,"
        " CAST(total_tokens AS BIGINT) AS total_tokens,"
        " round(covered_tokens * 1.0 / total_tokens + 1e-9, 6) AS coverage,"
        " CAST(cnt AS BIGINT) AS min_in_vocab_count"
        " FROM s WHERE token_id IN (5, 10, 20, 50, 100, 500, 1000, 5000)"
        " ORDER BY vocab_size"
    ),
    "token_gini": (
        # same tokenization as vocab_with_ids (lower + \s+ split, drop
        # empties); rank DESC by (cnt, token) = token_id; formula kept
        # in doubles with the identical operation order as the engine
        "WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)),"
        " '\\s+')) AS token FROM documents),"
        " c AS (SELECT token, count(*) AS cnt FROM toks"
        "  WHERE length(token) > 0 GROUP BY token),"
        " r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token)"
        "  AS token_id FROM c),"
        " a AS (SELECT CAST(count(*) AS BIGINT) AS v,"
        "  CAST(sum(cnt) AS BIGINT) AS t,"
        "  CAST(sum(token_id * cnt) AS BIGINT) AS s_desc FROM r)"
        " SELECT v AS distinct_tokens, t AS total_tokens,"
        " round(2.0 * ((v + 1) * t - s_desc) / (v * t)"
        "  - (v + 1.0) / v + 1e-9, 6) AS gini FROM a"
    ),
    "langid_confusion": (
        "WITH toks AS (SELECT doc_id, lang,"
        "  string_split_regex(trim(text), '\\s+') AS t FROM documents),"
        " hits AS (SELECT doc_id, lang,"
        "  len(list_filter(t, x -> lower(x) IN ('der','die','das','und','ist'))) AS hits_de,"
        "  len(list_filter(t, x -> lower(x) IN ('the','a','of','and','to'))) AS hits_en,"
        "  len(list_filter(t, x -> lower(x) IN ('le','la','de','et','est'))) AS hits_fr"
        "  FROM toks),"
        " pred AS (SELECT lang,"
        "  CASE WHEN greatest(hits_de, hits_en, hits_fr) <= 0 THEN 'und'"
        "   WHEN hits_de = greatest(hits_de, hits_en, hits_fr) THEN 'de'"
        "   WHEN hits_en = greatest(hits_de, hits_en, hits_fr) THEN 'en'"
        "   ELSE 'fr' END AS lang_guess FROM hits),"
        " g AS (SELECT lang, lang_guess, count(*) AS n_docs"
        "  FROM pred GROUP BY 1, 2)"
        " SELECT lang, lang_guess, n_docs,"
        " round(n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY lang)"
        "  + 1e-9, 6) AS share,"
        " lang = lang_guess AS correct"
        " FROM g ORDER BY lang, lang_guess"
    ),
    "source_kl_drift": (
        "WITH f AS (SELECT source, unnest(string_split_regex(trim(text),"
        " '\\s+')) AS token FROM documents),"
        " ff AS (SELECT source, token FROM f WHERE length(token) > 0),"
        " vocab AS (SELECT token, count(*) AS corpus_cnt FROM ff"
        "  GROUP BY token ORDER BY corpus_cnt DESC, token LIMIT 200),"
        " qv AS (SELECT token, corpus_cnt,"
        "  (corpus_cnt + 1) / (sum(corpus_cnt) OVER () + count(*) OVER ())"
        "   AS qq FROM vocab),"
        " st AS (SELECT source, ff.token, count(*) AS cnt FROM ff"
        "  JOIN vocab USING (token) GROUP BY 1, 2),"
        " grid AS (SELECT s.source, qv.token, qv.qq,"
        "  coalesce(st.cnt, 0) AS cnt"
        "  FROM (SELECT DISTINCT source FROM st) s CROSS JOIN qv"
        "  LEFT JOIN st ON st.source = s.source AND st.token = qv.token),"
        " p AS (SELECT source, qq, cnt,"
        "  (cnt + 1) / (sum(cnt) OVER (PARTITION BY source)"
        "   + count(*) OVER (PARTITION BY source)) AS pp"
        "  FROM grid)"
        " SELECT source,"
        " round(sum(pp * (ln(pp) - ln(qq))) + 1e-9, 6) AS kl_divergence,"
        " CAST(sum(cnt) AS BIGINT) AS vocab_tokens"
        " FROM p GROUP BY source ORDER BY source"
    ),
    "doc_length_calibration": (
        "WITH scored AS (SELECT n_chars, round("
        "  (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END)"
        "  + (CASE WHEN len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))"
        "      / greatest(length(text), 1) < 0.1 THEN 0.3 ELSE 0.0 END)"
        "  + (CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),"
        "      t -> lower(t) IN ('the','a','of','and','to')))"
        "      / greatest(len(string_split_regex(trim(text), '\\s+')), 1) > 0.01"
        "      THEN 0.3 ELSE 0.0 END), 2) AS q"
        " FROM documents),"
        " b AS (SELECT quantile_disc(n_chars,"
        "  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS lb FROM scored),"
        " banded AS (SELECT q, n_chars,"
        "  CAST(1 + len(list_filter(b.lb, x -> n_chars > x)) AS INT)"
        "   AS length_band FROM scored CROSS JOIN b)"
        " SELECT length_band, count(*) AS n_docs,"
        " min(n_chars) AS min_chars, max(n_chars) AS max_chars,"
        " round(round(sum(q), 2) / count(*) + 1e-9, 4) AS avg_quality,"
        " round(sum(CASE WHEN q >= 0.7 THEN 1 ELSE 0 END) * 1.0 / count(*)"
        "  + 1e-9, 6) AS keep_rate"
        " FROM banded GROUP BY 1 ORDER BY 1"
    ),
    "quality_threshold_sweep": (
        "WITH scored AS (SELECT"
        "  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,"
        "  round((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END)"
        "   + (CASE WHEN len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))"
        "        / greatest(length(text), 1) < 0.1 THEN 0.3 ELSE 0.0 END)"
        "   + (CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),"
        "        t -> lower(t) IN ('the','a','of','and','to')))"
        "        / greatest(len(string_split_regex(trim(text), '\\s+')), 1) > 0.01"
        "       THEN 0.3 ELSE 0.0 END), 2) AS quality_score"
        " FROM documents),"
        " tot AS (SELECT count(*) AS nd, CAST(sum(n_tokens) AS BIGINT) AS nt"
        "  FROM scored),"
        " grid AS (SELECT * FROM (VALUES (0.0), (0.35), (0.65), (0.95))"
        "  AS v(threshold))"
        " SELECT threshold,"
        "  count(*) FILTER (quality_score >= threshold) AS n_docs_kept,"
        "  round(count(*) FILTER (quality_score >= threshold) * 1.0 / max(nd)"
        "   + 1e-9, 4) AS pct_docs,"
        "  CAST(coalesce(sum(n_tokens) FILTER (quality_score >= threshold), 0)"
        "   AS BIGINT) AS tokens_kept,"
        "  round(coalesce(sum(n_tokens) FILTER (quality_score >= threshold), 0)"
        "   * 1.0 / max(nt) + 1e-9, 4) AS pct_tokens"
        " FROM grid, scored, tot GROUP BY threshold ORDER BY threshold"
    ),
    "corpus_datasheet": (
        "WITH base AS (SELECT source, lang, n_chars,"
        "  sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ch,"
        "  len(string_split_regex(trim(text), '\\s+')) AS ws,"
        "  len(regexp_extract_all(text,"
        "   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS em"
        " FROM documents)"
        " SELECT source, lang, count(*) AS n_docs,"
        "  CAST(sum(n_chars) AS BIGINT) AS total_chars,"
        "  CAST(sum(ws) AS BIGINT) AS total_ws_tokens,"
        "  count(DISTINCT ch) AS n_distinct_contents,"
        "  round((count(*) - count(DISTINCT ch)) * 1.0 / count(*) + 1e-9, 4)"
        "   AS dup_rate,"
        "  round(sum(n_chars) * 1.0 / count(*) + 1e-9, 2) AS mean_chars,"
        "  CAST(sum(em) AS BIGINT) AS email_hits"
        " FROM base GROUP BY source, lang ORDER BY source, lang"
    ),
    "top_words": (
        "SELECT word, count(*) AS n FROM ("
        " SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word"
        " FROM documents) WHERE length(word) >= 3"
        " GROUP BY word ORDER BY n DESC, word LIMIT 20"
    ),
    "text_stats": (
        "WITH toks AS (SELECT lang, length(text) AS n_chars,"
        "  len(string_split_regex(trim(text), '\\s+')) AS n_tokens FROM documents)"
        " SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,"
        " round(avg(n_chars), 4) AS avg_chars, round(avg(n_tokens), 4) AS avg_tokens"
        " FROM toks GROUP BY lang ORDER BY lang"
    ),
    "quality_scores": (
        "WITH base AS (SELECT doc_id, lang, n_chars, text,"
        "  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,"
        "  len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,"
        "  len(list_filter(string_split_regex(trim(text), '\\s+'),"
        "      t -> lower(t) IN ('the','a','of','and','to'))) AS n_stop"
        "  FROM documents)"
        " SELECT doc_id, lang, n_chars, n_tokens,"
        " round(n_punct / greatest(length(text), 1) + 1e-9, 6) AS punct_ratio,"
        " round(n_stop / greatest(n_tokens, 1) + 1e-9, 6) AS stopword_ratio,"
        " round((CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END)"
        "  + (CASE WHEN n_punct / greatest(length(text), 1) < 0.1 THEN 0.3 ELSE 0.0 END)"
        "  + (CASE WHEN n_stop / greatest(n_tokens, 1) > 0.01 THEN 0.3 ELSE 0.0 END), 2)"
        "  AS quality_score"
        " FROM base ORDER BY doc_id"
    ),
    "language_id": (
        "WITH toks AS (SELECT doc_id, lang,"
        "  string_split_regex(trim(text), '\\s+') AS t FROM documents),"
        " hits AS (SELECT doc_id, lang,"
        "  len(list_filter(t, x -> lower(x) IN ('der','die','das','und','ist'))) AS hits_de,"
        "  len(list_filter(t, x -> lower(x) IN ('the','a','of','and','to'))) AS hits_en,"
        "  len(list_filter(t, x -> lower(x) IN ('le','la','de','et','est'))) AS hits_fr"
        "  FROM toks)"
        " SELECT doc_id, lang, hits_de, hits_en, hits_fr,"
        " CASE WHEN greatest(hits_de, hits_en, hits_fr) <= 0 THEN 'und'"
        "  WHEN hits_de = greatest(hits_de, hits_en, hits_fr) THEN 'de'"
        "  WHEN hits_en = greatest(hits_de, hits_en, hits_fr) THEN 'en'"
        "  ELSE 'fr' END AS lang_guess"
        " FROM hits ORDER BY doc_id"
    ),
    "token_counts": (
        "SELECT doc_id,"
        " len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,"
        " len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_tokens"
        " FROM documents ORDER BY doc_id"
    ),
    "token_fertility": (
        "WITH t AS (SELECT lang,"
        "  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe,"
        "  len(string_split_regex(trim(text), '\\s+')) AS ws,"
        "  length(text) AS ch FROM documents)"
        " SELECT lang, count(*) AS n_docs,"
        " CAST(sum(bpe) AS BIGINT) AS bpe_tokens,"
        " CAST(sum(ws) AS BIGINT) AS ws_tokens,"
        " CAST(sum(ch) AS BIGINT) AS n_chars,"
        " round(sum(bpe) * 1.0 / sum(ws), 6) AS fertility,"
        " round(sum(bpe) * 100.0 / sum(ch), 6) AS tokens_per_100_chars"
        " FROM t GROUP BY lang ORDER BY lang"
    ),
    "top_bigrams": (
        "WITH toks AS (SELECT string_split(trim(text), ' ') AS t FROM documents),"
        " bg AS (SELECT unnest(list_transform(range(1, len(t)),"
        "   i -> t[i] || ' ' || t[i+1])) AS bigram"
        "  FROM toks WHERE len(t) >= 2)"
        " SELECT bigram, count(*) AS n_occurrences FROM bg"
        " GROUP BY 1 ORDER BY n_occurrences DESC, bigram LIMIT 20"
    ),
    "term_postings": (
        r"WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
        r"trim(lower(text)), '\s+')) AS term FROM documents),"
        " f AS (SELECT doc_id, term FROM toks WHERE length(term) >= 3),"
        " tf AS (SELECT term, doc_id, count(*) AS tf FROM f GROUP BY 1, 2)"
        " SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,"
        " CAST(max(tf) AS BIGINT) AS max_tf"
        " FROM tf GROUP BY term ORDER BY df DESC, term LIMIT 20"
    ),
    "bm25_search": (
        "WITH " + _bm25_cte()
        + " SELECT doc_id, doclen, bm25 FROM scored WHERE bm25 > 0.0"
        " ORDER BY bm25 DESC, doc_id LIMIT 10"
    ),
    "group_auc": (
        # integer Mann-Whitney numerator: each positive at score s sees
        # 2*(negatives strictly below) + (negatives tied at s)
        "WITH per AS (SELECT source AS grp, n_chars AS score,"
        "  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)"
        "    AS pos,"
        "  CAST(count(*) AS BIGINT) AS n"
        "  FROM documents GROUP BY 1, 2),"
        " w AS (SELECT grp, pos, n - pos AS neg,"
        "  COALESCE(CAST(sum(n - pos) OVER (PARTITION BY grp ORDER BY"
        "   score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        "   AS BIGINT), 0) AS neg_below FROM per)"
        " SELECT grp AS source, CAST(sum(pos) AS BIGINT) AS n_pos,"
        "  CAST(sum(neg) AS BIGINT) AS n_neg,"
        "  round(CAST(sum(pos * (2 * neg_below + neg)) AS DOUBLE)"
        "   / (2.0 * CAST(sum(pos) AS DOUBLE) * CAST(sum(neg) AS DOUBLE))"
        "   + 1e-9, 6) AS auc"
        " FROM w GROUP BY grp ORDER BY source"
    ),
    "cohens_kappa": (
        "WITH g AS (SELECT source,"
        "  CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END AS a,"
        r"  CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 60"
        "   THEN 1 ELSE 0 END AS b FROM documents),"
        " c AS (SELECT source, CAST(count(*) AS BIGINT) AS n,"
        "  CAST(sum(a * b) AS BIGINT) AS n11,"
        "  CAST(sum(a * (1 - b)) AS BIGINT) AS n10,"
        "  CAST(sum((1 - a) * b) AS BIGINT) AS n01,"
        "  CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00"
        "  FROM g GROUP BY source)"
        " SELECT source, n, n11, n10, n01, n00,"
        "  round((n11 + n00) / CAST(n AS DOUBLE) + 1e-9, 6) AS agreement,"
        "  round(("
        "    (n11 + n00) / CAST(n AS DOUBLE)"
        "    - (((n11 + n10) / CAST(n AS DOUBLE))"
        "        * ((n11 + n01) / CAST(n AS DOUBLE))"
        "       + (1.0 - (n11 + n10) / CAST(n AS DOUBLE))"
        "        * (1.0 - (n11 + n01) / CAST(n AS DOUBLE)))"
        "  ) / (1.0 - (((n11 + n10) / CAST(n AS DOUBLE))"
        "        * ((n11 + n01) / CAST(n AS DOUBLE))"
        "       + (1.0 - (n11 + n10) / CAST(n AS DOUBLE))"
        "        * (1.0 - (n11 + n01) / CAST(n AS DOUBLE))))"
        "  + 1e-9, 6) AS kappa"
        " FROM c ORDER BY source"
    ),
    "spearman_scores": (
        "WITH j AS (SELECT source AS grp, length(text) AS x,"
        r"  len(regexp_split_to_array(trim(text), '\s+')) AS y,"
        "  count(*) * 1.0 AS c FROM documents GROUP BY 1, 2, 3),"
        " mxm AS (SELECT grp, x, sum(c) AS cm FROM j GROUP BY 1, 2),"
        " mx AS (SELECT grp, x, coalesce(sum(cm) OVER (PARTITION BY grp"
        "   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
        "   0) + (cm + 1) / 2.0 AS rx FROM mxm),"
        " mym AS (SELECT grp, y, sum(c) AS cm FROM j GROUP BY 1, 2),"
        " my AS (SELECT grp, y, coalesce(sum(cm) OVER (PARTITION BY grp"
        "   ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
        "   0) + (cm + 1) / 2.0 AS ry FROM mym),"
        " t AS (SELECT j.grp, j.c, mx.rx, my.ry FROM j"
        "   JOIN mx ON mx.grp = j.grp AND mx.x = j.x"
        "   JOIN my ON my.grp = j.grp AND my.y = j.y),"
        " a AS (SELECT grp, sum(c) AS n, count(*) AS n_joint,"
        "   sum(c * rx) AS sx, sum(c * ry) AS sy,"
        "   sum(c * rx * rx) AS sxx, sum(c * ry * ry) AS syy,"
        "   sum(c * rx * ry) AS sxy FROM t GROUP BY grp)"
        " SELECT grp AS source, CAST(n AS BIGINT) AS n,"
        "  CAST(n_joint AS BIGINT) AS n_joint,"
        "  round((n * sxy - sx * sy) /"
        "   nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0)"
        "   + 1e-9, 6) AS spearman"
        " FROM a ORDER BY source"
    ),
    "balanced_shards": (
        "WITH t AS (SELECT doc_id,"
        r"  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens"
        "  FROM documents),"
        " r AS (SELECT *, row_number() OVER"
        "  (ORDER BY n_tokens DESC, doc_id) - 1 AS rank0 FROM t),"
        " s AS (SELECT n_tokens, CAST(CASE WHEN rank0 % 16 < 8"
        "  THEN rank0 % 16 ELSE 15 - (rank0 % 16) END AS INTEGER)"
        "  AS shard FROM r)"
        " SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,"
        "  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,"
        "  CAST(min(n_tokens) AS BIGINT) AS min_tokens,"
        "  CAST(max(n_tokens) AS BIGINT) AS max_tokens"
        " FROM s GROUP BY shard ORDER BY shard"
    ),
    "fleiss_kappa": (
        "WITH g AS (SELECT source,"
        "  (CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END"
        r"   + CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 60"
        "     THEN 1 ELSE 0 END"
        "   + CASE WHEN length(text) - length(replace(text, ' ', '')) >= 50"
        "     THEN 1 ELSE 0 END) AS k FROM documents),"
        " c AS (SELECT source, CAST(count(*) AS BIGINT) AS n,"
        "  CAST(sum(k) AS BIGINT) AS keep_votes,"
        "  CAST(sum(k * (k - 1) + (3 - k) * (2 - k)) AS BIGINT)"
        "   AS agree_pairs"
        "  FROM g GROUP BY source),"
        " r AS (SELECT *,"
        "  agree_pairs / (CAST(n AS DOUBLE) * 6.0) AS p_bar_raw,"
        "  keep_votes / (CAST(n AS DOUBLE) * 3.0) AS p_keep_raw FROM c)"
        " SELECT source, n, CAST(3 AS INTEGER) AS m_raters,"
        "  keep_votes, agree_pairs,"
        "  round(p_keep_raw + 1e-9, 6) AS p_keep,"
        "  round(p_bar_raw + 1e-9, 6) AS p_bar,"
        "  round(p_keep_raw * p_keep_raw"
        "   + (1.0 - p_keep_raw) * (1.0 - p_keep_raw) + 1e-9, 6) AS p_e,"
        "  round((p_bar_raw - (p_keep_raw * p_keep_raw"
        "     + (1.0 - p_keep_raw) * (1.0 - p_keep_raw)))"
        "   / nullif(1.0 - (p_keep_raw * p_keep_raw"
        "     + (1.0 - p_keep_raw) * (1.0 - p_keep_raw)), 0.0)"
        "   + 1e-9, 6) AS kappa"
        " FROM r ORDER BY source"
    ),
    "rrf_fusion": (
        "WITH " + _bm25_cte() + ","
        " btop AS (SELECT doc_id, bm25 FROM scored WHERE bm25 > 0.0"
        "  ORDER BY bm25 DESC, doc_id LIMIT 20),"
        " brk AS (SELECT doc_id, CAST(row_number() OVER ("
        "  ORDER BY bm25 DESC, doc_id) AS INT) AS bm25_rank FROM btop),"
        " qstats AS (SELECT CAST(sum(doclen) AS DOUBLE) AS c_total,"
        "  CAST(sum(tf_0) AS DOUBLE) AS cf_0,"
        "  CAST(sum(tf_1) AS DOUBLE) AS cf_1,"
        "  CAST(sum(tf_2) AS DOUBLE) AS cf_2 FROM feat),"
        " qscored AS (SELECT doc_id, round(0.0"
        "   + ln((tf_0 + 2000.0 * (cf_0 / c_total)) / (doclen + 2000.0))"
        "   + ln((tf_1 + 2000.0 * (cf_1 / c_total)) / (doclen + 2000.0))"
        "   + ln((tf_2 + 2000.0 * (cf_2 / c_total)) / (doclen + 2000.0))"
        "   + 1e-9, 6) AS ql FROM feat CROSS JOIN qstats),"
        " qtop AS (SELECT doc_id, ql FROM qscored"
        "  ORDER BY ql DESC, doc_id LIMIT 20),"
        " qrk AS (SELECT doc_id, CAST(row_number() OVER ("
        "  ORDER BY ql DESC, doc_id) AS INT) AS ql_rank FROM qtop)"
        " SELECT CAST(COALESCE(brk.doc_id, qrk.doc_id) AS BIGINT)"
        "   AS doc_id, brk.bm25_rank, qrk.ql_rank,"
        "  round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + brk.bm25_rank), 0.0)"
        "   + COALESCE(CAST(1.0 AS DOUBLE) / (60 + qrk.ql_rank), 0.0)"
        "   + 1e-9, 6) AS rrf"
        " FROM brk FULL OUTER JOIN qrk ON brk.doc_id = qrk.doc_id"
        " ORDER BY rrf DESC, doc_id LIMIT 10"
    ),
    "ndcg_eval": (
        "WITH " + _bm25_cte() + ","
        " top AS (SELECT doc_id, bm25 FROM scored"
        "  WHERE bm25 > 0.0 ORDER BY bm25 DESC, doc_id LIMIT 10),"
        " rkd AS (SELECT doc_id, row_number() OVER ("
        "  ORDER BY bm25 DESC, doc_id) AS rk FROM top),"
        " lab AS (SELECT doc_id, CASE WHEN tf_0 > 0 AND tf_1 > 0"
        "  AND tf_2 > 0 THEN 1 ELSE 0 END AS rel FROM feat),"
        " sc AS (SELECT rkd.rk, lab.rel FROM rkd"
        "  JOIN lab ON lab.doc_id = rkd.doc_id),"
        " a AS (SELECT CAST(count(*) AS BIGINT) AS k_eval,"
        "  CAST(sum(rel) AS BIGINT) AS n_relevant,"
        "  round(sum(rel / (ln(CAST(rk AS DOUBLE) + 1.0)"
        "   / ln(2.0))) + 1e-9, 6) AS dcg FROM sc),"
        " ir AS (SELECT row_number() OVER (ORDER BY rk) AS irk"
        "  FROM sc WHERE rel > 0),"
        " i AS (SELECT round(COALESCE(sum(1.0 /"
        "  (ln(CAST(irk AS DOUBLE) + 1.0) / ln(2.0))), 0.0)"
        "  + 1e-9, 6) AS idcg FROM ir)"
        " SELECT k_eval, n_relevant, dcg, idcg,"
        " CASE WHEN idcg > 0 THEN round(dcg / idcg + 1e-9, 6)"
        "  ELSE 0.0 END AS ndcg FROM a CROSS JOIN i"
    ),
    "source_mix": (
        "SELECT source, count(*) AS n_docs,"
        " count(DISTINCT lang) AS n_langs,"
        " CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,"
        " round(round(CAST(sum(length(text)) AS DOUBLE), 2) / count(*) + 1e-9, 4)"
        "  AS avg_chars"
        " FROM documents GROUP BY source ORDER BY source"
    ),
    # chunker: step = chunk_words(40) - overlap(10) = 30; DuckDB list
    # slice l[a:b] is 1-based inclusive == F.slice(l, a, b-a+1), and
    # generate_series is end-INCLUSIVE (unlike range)
    "chunk_documents": (
        "WITH w AS (SELECT doc_id,"
        " regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),"
        " e AS (SELECT doc_id, words,"
        " unnest(generate_series(0, (len(words)+29)//30 - 1)) AS s FROM w)"
        " SELECT doc_id, CAST(s AS INT) AS chunk_id,"
        " CAST(len(words[s*30+1 : s*30+40]) AS INT) AS n_chunk_words,"
        " array_to_string(words[s*30+1 : s*30+40], ' ') AS chunk_text FROM e"
    ),
    "kn_bigram_score": _kn_scores_sql() + " ORDER BY doc_id",
    "ql_search": (
        "WITH feat AS (SELECT doc_id,"
        " len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS doclen,"
        " len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        "   x -> x = 'spark')) AS tf_0,"
        " len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        "   x -> x = 'merge')) AS tf_1,"
        " len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        "   x -> x = 'window')) AS tf_2"
        " FROM documents),"
        " stats AS (SELECT CAST(sum(doclen) AS DOUBLE) AS c_total,"
        "  CAST(sum(tf_0) AS DOUBLE) AS cf_0,"
        "  CAST(sum(tf_1) AS DOUBLE) AS cf_1,"
        "  CAST(sum(tf_2) AS DOUBLE) AS cf_2 FROM feat)"
        " SELECT doc_id, CAST(doclen AS BIGINT) AS doclen,"
        "  round(0.0"
        "   + ln((tf_0 + 2000.0 * (cf_0 / c_total)) / (doclen + 2000.0))"
        "   + ln((tf_1 + 2000.0 * (cf_1 / c_total)) / (doclen + 2000.0))"
        "   + ln((tf_2 + 2000.0 * (cf_2 / c_total)) / (doclen + 2000.0))"
        "   + 1e-9, 6) AS ql"
        " FROM feat CROSS JOIN stats"
        " ORDER BY ql DESC, doc_id LIMIT 10"
    ),
    "vocab_with_ids": (
        "WITH t AS (SELECT lower(unnest(string_split(trim(text), ' '))) AS token"
        "   FROM documents),"
        " c AS (SELECT token, count(*) AS cnt FROM t"
        "   WHERE length(token) > 0 GROUP BY token HAVING count(*) >= 2)"
        " SELECT token, cnt,"
        "  CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS token_id"
        " FROM c ORDER BY token_id"
    ),
    "token_entropy": (
        "WITH t AS (SELECT doc_id,"
        "   lower(unnest(string_split(trim(text), ' '))) AS token FROM documents),"
        " pt AS (SELECT doc_id, token, count(*) AS c FROM t"
        "   WHERE length(token) > 0 GROUP BY 1, 2)"
        " SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,"
        "  count(*) AS n_distinct,"
        "  round(ln(sum(c)) - sum(c * ln(c)) / sum(c) + 1e-9, 4) AS entropy"
        " FROM pt GROUP BY doc_id ORDER BY doc_id"
    ),
    "constraint_report": (
        # one scalar-agg arm per rule, mirroring the single-pass
        # compiled aggregate; passed derives from the count
        "WITH v AS ("
        " SELECT 'accepted_values_o_orderstatus' AS rule,"
        "  'o_orderstatus' AS \"column\", 'accepted_values' AS kind,"
        "  sum(CASE WHEN o_orderstatus IS NOT NULL"
        "   AND o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)"
        "   AS n_violations FROM orders"
        " UNION ALL SELECT 'in_range_o_totalprice', 'o_totalprice',"
        "  'in_range', sum(CASE WHEN o_totalprice IS NOT NULL AND"
        "  (o_totalprice < 0 OR o_totalprice > 450000)"
        "  THEN 1 ELSE 0 END) FROM orders"
        " UNION ALL SELECT 'matches_o_orderpriority', 'o_orderpriority',"
        "  'matches', sum(CASE WHEN o_orderpriority IS NOT NULL AND NOT"
        "  regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END)"
        "  FROM orders"
        " UNION ALL SELECT 'not_null_o_custkey', 'o_custkey', 'not_null',"
        "  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) FROM orders"
        " UNION ALL SELECT 'ref_o_custkey', 'o_custkey', 'ref_integrity',"
        "  (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL AND"
        "   o_custkey NOT IN (SELECT c_custkey FROM customer))"
        " UNION ALL SELECT 'unique_o_orderkey', 'o_orderkey', 'unique',"
        "  count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders)"
        " SELECT rule, \"column\", kind,"
        " CAST(n_violations AS BIGINT) AS n_violations,"
        " n_violations = 0 AS passed FROM v ORDER BY rule"
    ),
    "bigram_lm": (
        "WITH toks AS (SELECT doc_id,"
        "  string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),"
        "   ' ') AS t FROM documents),"
        " e AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg"
        "  FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)"
        "  WHERE len(t) >= 2),"
        " bgc AS (SELECT bg, count(*) AS c_bg FROM e GROUP BY bg),"
        " pfc AS (SELECT w1, count(*) AS c_w1 FROM e GROUP BY w1)"
        " SELECT doc_id, count(*) AS n_bigrams,"
        " round(-sum(ln(c_bg) - ln(c_w1)) / count(*) + 1e-9, 4)"
        "  AS cross_entropy"
        " FROM e JOIN bgc USING (bg) JOIN pfc USING (w1)"
        " GROUP BY doc_id ORDER BY doc_id"
    ),
    "event_trigrams": (
        "WITH o AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,"
        "  event_type FROM events),"
        " t AS (SELECT event_type || '>' || lead(event_type, 1) OVER w"
        "   || '>' || lead(event_type, 2) OVER w AS trigram,"
        "   lead(event_type, 2) OVER w AS t3"
        "  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"
        " SELECT trigram, count(*) AS n_occurrences FROM t"
        " WHERE t3 IS NOT NULL GROUP BY trigram"
        " ORDER BY n_occurrences DESC, trigram LIMIT 20"
    ),
    "table_profile": "\nUNION ALL\n".join(
        "SELECT '{c}' AS column_name, count(*) AS n_rows,"
        " CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        "  AS n_nulls,"
        " count(DISTINCT {c}) AS n_distinct,"
        " CAST(min({c}) AS DOUBLE) AS min_val,"
        " CAST(max({c}) AS DOUBLE) AS max_val,"
        " round(round(CAST(sum({c}) AS DOUBLE), 2)"
        "  / (count(*) - sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END))"
        "  + 1e-9, 4) AS avg_val"
        " FROM lineitem".format(c=c)
        for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    )
    + " ORDER BY column_name",
    "drift_psi": (
        "WITH b AS (SELECT least(CAST(floor(o_totalprice / 50000)"
        "   AS INT), 9) AS bin,"
        "  CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'ref'"
        "   ELSE 'cur' END AS period FROM orders),"
        " pb AS (SELECT bin,"
        "  count(*) FILTER (WHERE period = 'ref') AS n_ref,"
        "  count(*) FILTER (WHERE period = 'cur') AS n_cur"
        "  FROM b GROUP BY bin),"
        " t AS (SELECT bin, n_ref, n_cur,"
        "  greatest(CAST(n_ref AS DOUBLE) / CAST(sum(n_ref) OVER ()"
        "   AS DOUBLE), 1e-6) AS p,"
        "  greatest(CAST(n_cur AS DOUBLE) / CAST(sum(n_cur) OVER ()"
        "   AS DOUBLE), 1e-6) AS q FROM pb)"
        " SELECT bin, n_ref, n_cur,"
        " round(p + 1e-9, 6) AS ref_share,"
        " round(q + 1e-9, 6) AS cur_share,"
        " round((p - q) * ln(p / q) + 1e-9, 6) AS psi_term,"
        " round(sum((p - q) * ln(p / q)) OVER () + 1e-9, 6) AS psi_total"
        " FROM t ORDER BY bin"
    ),
    "ks_drift": (
        "WITH b AS (SELECT least(CAST(floor(o_totalprice / 50000)"
        "   AS INT), 9) AS bin,"
        "  CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'ref'"
        "   ELSE 'cur' END AS period FROM orders),"
        " pb AS (SELECT bin,"
        "  count(*) FILTER (WHERE period = 'ref') AS n_ref,"
        "  count(*) FILTER (WHERE period = 'cur') AS n_cur"
        "  FROM b GROUP BY bin),"
        " t AS (SELECT bin, n_ref, n_cur,"
        "  CAST(sum(n_ref) OVER (ORDER BY bin) AS DOUBLE)"
        "   / CAST(sum(n_ref) OVER () AS DOUBLE) AS cr,"
        "  CAST(sum(n_cur) OVER (ORDER BY bin) AS DOUBLE)"
        "   / CAST(sum(n_cur) OVER () AS DOUBLE) AS cc FROM pb)"
        " SELECT bin, n_ref, n_cur,"
        " round(cr + 1e-9, 6) AS cum_ref_share,"
        " round(cc + 1e-9, 6) AS cum_cur_share,"
        " round(abs(cr - cc) + 1e-9, 6) AS cdf_gap,"
        " max(round(abs(cr - cc) + 1e-9, 6)) OVER () AS ks_stat"
        " FROM t ORDER BY bin"
    ),
    "diversified_topk": (
        "WITH t AS (SELECT doc_id,"
        "   lower(unnest(string_split(trim(text), ' '))) AS token"
        "   FROM documents),"
        " pt AS (SELECT doc_id, token, count(*) AS c FROM t"
        "   WHERE length(token) > 0 GROUP BY 1, 2),"
        " ent AS (SELECT doc_id,"
        "  round(ln(sum(c)) - sum(c * ln(c)) / sum(c) + 1e-9, 4)"
        "   AS entropy FROM pt GROUP BY doc_id),"
        " j AS (SELECT d.doc_id, d.source, e.entropy"
        "  FROM documents d JOIN ent e ON e.doc_id = d.doc_id),"
        " c AS (SELECT *, row_number() OVER (PARTITION BY source"
        "  ORDER BY entropy DESC, doc_id) AS src_rank FROM j),"
        " f AS (SELECT * FROM c WHERE src_rank <= 2),"
        " g AS (SELECT *, row_number() OVER ("
        "  ORDER BY entropy DESC, doc_id) AS rank FROM f)"
        " SELECT CAST(rank AS INT) AS rank, doc_id, source,"
        " CAST(src_rank AS INT) AS src_rank, entropy"
        " FROM g WHERE rank <= 20 ORDER BY rank"
    ),
    "lexical_diversity": (
        "WITH t AS (SELECT source,"
        "   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token"
        "   FROM documents),"
        " pt AS (SELECT source, token, count(*) AS c FROM t"
        "   WHERE length(token) > 0 GROUP BY 1, 2)"
        " SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,"
        "  count(*) AS n_types,"
        "  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS n_hapax,"
        "  round(count(*) / sum(c) + 1e-9, 6) AS ttr,"
        "  round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / count(*)"
        "   + 1e-9, 6) AS hapax_ratio,"
        "  round(ln(count(*)) / ln(sum(c)) + 1e-9, 6) AS herdan_c"
        " FROM pt GROUP BY source ORDER BY source"
    ),
    "oov_rate": (
        "WITH t AS (SELECT source, doc_id,"
        "   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token"
        "   FROM documents),"
        " tf AS (SELECT * FROM t WHERE length(token) > 0),"
        " c AS (SELECT token, count(*) AS c FROM tf GROUP BY 1),"
        " v AS (SELECT token FROM (SELECT token,"
        "   row_number() OVER (ORDER BY c DESC, token) AS rk FROM c)"
        "   WHERE rk <= 200),"
        " fl AS (SELECT tf.source, tf.doc_id,"
        "   CASE WHEN v.token IS NOT NULL THEN 0 ELSE 1 END AS oov"
        "   FROM tf LEFT JOIN v ON tf.token = v.token),"
        " pd AS (SELECT source, doc_id, count(*) AS n_tok,"
        "   sum(oov) AS n_oov FROM fl GROUP BY 1, 2)"
        " SELECT source, count(*) AS n_docs,"
        "  CAST(sum(n_tok) AS BIGINT) AS n_tokens,"
        "  CAST(sum(n_oov) AS BIGINT) AS n_oov,"
        "  round(sum(n_oov) / sum(n_tok) + 1e-9, 6) AS micro_oov_rate,"
        "  round(avg(n_oov / n_tok) + 1e-9, 6) AS macro_oov_rate"
        " FROM pd GROUP BY source ORDER BY source"
    ),
    "textrank_keywords": _textrank_sql(4, 20),
    "l_diversity": (
        "WITH g AS (SELECT c_nationkey, c_mktsegment,"
        "  count(*) AS group_size,"
        "  count(DISTINCT CAST(floor(CAST(c_acctbal AS DOUBLE)"
        "   / 1000.0) AS BIGINT)) AS n_sensitive"
        "  FROM customer GROUP BY c_nationkey, c_mktsegment),"
        " r AS (SELECT * FROM g WHERE n_sensitive < 6)"
        " SELECT * FROM ("
        "  SELECT CAST(c_nationkey AS VARCHAR) || '|' ||"
        "   c_mktsegment AS qi_values,"
        "   CAST(group_size AS BIGINT) AS group_size,"
        "   CAST(n_sensitive AS BIGINT) AS n_sensitive FROM r"
        "  UNION ALL SELECT '__TOTAL__',"
        "   CAST(count(*) AS BIGINT),"
        "   CAST(coalesce(sum(group_size), 0) AS BIGINT) FROM r)"
        " ORDER BY qi_values"
    ),
    "dp_histogram": (
        # same seeded md5-31 hash, sign bit, trailing-zero
        # geometric magnitude, zero clamp -- pure integer replay
        "WITH g AS (SELECT lang, source, count(*) AS true_count,"
        "  ('0x' || substr(md5('dp-seed-0|' || lang || '|' ||"
        "   source), 1, 8))::BIGINT % 2147483647 AS h"
        "  FROM documents GROUP BY lang, source),"
        " n AS (SELECT lang, source,"
        "  CAST(true_count AS BIGINT) AS true_count,"
        "  CAST((CASE WHEN h % 2 = 1 THEN 1 ELSE -1 END) *"
        "   len(list_filter(generate_series(1, 20),"
        "    b -> ((h - h % 2) / 2)::BIGINT"
        "     % (1::BIGINT << b) = 0)) AS BIGINT) AS noise"
        "  FROM g)"
        " SELECT lang, source, true_count, noise,"
        "  greatest(0::BIGINT, true_count + noise) AS noisy_count"
        " FROM n ORDER BY lang, source"
    ),
    "skyline_docs": (
        "WITH per AS (SELECT doc_id, CAST(len(t) AS BIGINT)"
        "  AS n_tokens, round(len(list_distinct(t))"
        "   / CAST(len(t) AS DOUBLE) + 1e-9, 4) AS ttr FROM"
        "  (SELECT doc_id, list_filter(string_split_regex("
        "   lower(trim(text)), '\\s+'), x -> x <> '') AS t"
        "   FROM documents) WHERE len(t) > 0),"
        " bx AS (SELECT n_tokens, max(ttr) AS best_ttr FROM per"
        "  GROUP BY n_tokens),"
        " fx AS (SELECT n_tokens, best_ttr, max(best_ttr) OVER ("
        "  ORDER BY n_tokens DESC ROWS BETWEEN UNBOUNDED PRECEDING"
        "  AND 1 PRECEDING) AS pm FROM bx)"
        " SELECT p.doc_id, p.n_tokens, p.ttr"
        " FROM per p JOIN fx ON p.n_tokens = fx.n_tokens"
        "  AND p.ttr = fx.best_ttr"
        " WHERE fx.pm IS NULL OR fx.best_ttr > fx.pm"
        " ORDER BY p.n_tokens DESC, p.doc_id"
    ),
    "cusum_changepoints": (
        # the recurrence replays exactly: daily revenue / mu /
        # sigma are rounded to 2dp BEFORE the fold on both sides,
        # then the recursive CTE performs the identical IEEE
        # double sequence the JVM aggregate fold performs
        "WITH RECURSIVE daily AS (SELECT date_trunc('day',"
        "   o_orderdate) AS day, CAST(round(sum(o_totalprice), 2)"
        "   AS DOUBLE) AS revenue FROM orders GROUP BY 1),"
        " p AS (SELECT round(avg(revenue) + 1e-9, 2) AS mu,"
        "   round(stddev_samp(revenue) + 1e-9, 2) AS sigma"
        "   FROM daily),"
        " d AS (SELECT day, revenue,"
        "   row_number() OVER (ORDER BY day) AS rn FROM daily),"
        " r AS ("
        "  SELECT d.rn, d.day, d.revenue,"
        "   greatest(CAST(0 AS DOUBLE),"
        "    d.revenue - p.mu - 0.5 * p.sigma) AS sp,"
        "   greatest(CAST(0 AS DOUBLE),"
        "    -(d.revenue - p.mu) - 0.5 * p.sigma) AS sn"
        "  FROM d, p WHERE d.rn = 1"
        "  UNION ALL"
        "  SELECT d.rn, d.day, d.revenue,"
        "   greatest(CAST(0 AS DOUBLE),"
        "    r.sp + d.revenue - p.mu - 0.5 * p.sigma),"
        "   greatest(CAST(0 AS DOUBLE),"
        "    r.sn - (d.revenue - p.mu) - 0.5 * p.sigma)"
        "  FROM d, p, r WHERE d.rn = r.rn + 1)"
        " SELECT r.day, r.revenue,"
        "  round(r.sp + 1e-9, 4) AS s_pos,"
        "  round(r.sn + 1e-9, 4) AS s_neg,"
        "  (r.sp > 4.0 * p.sigma OR r.sn > 4.0 * p.sigma) AS alarm"
        " FROM r, p ORDER BY r.day"
    ),
    "correlation_matrix": (
        "SELECT * FROM ("
        " SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,"
        "  round(corr(l_quantity, l_extendedprice) + 1e-9, 6)"
        "  AS pearson_r FROM lineitem"
        " UNION ALL SELECT 'l_quantity', 'l_discount',"
        "  round(corr(l_quantity, l_discount) + 1e-9, 6)"
        "  FROM lineitem"
        " UNION ALL SELECT 'l_quantity', 'l_tax',"
        "  round(corr(l_quantity, l_tax) + 1e-9, 6) FROM lineitem"
        " UNION ALL SELECT 'l_extendedprice', 'l_discount',"
        "  round(corr(l_extendedprice, l_discount) + 1e-9, 6)"
        "  FROM lineitem"
        " UNION ALL SELECT 'l_extendedprice', 'l_tax',"
        "  round(corr(l_extendedprice, l_tax) + 1e-9, 6)"
        "  FROM lineitem"
        " UNION ALL SELECT 'l_discount', 'l_tax',"
        "  round(corr(l_discount, l_tax) + 1e-9, 6) FROM lineitem"
        ") ORDER BY col_a, col_b"
    ),
    "span_corruption": (
        "WITH t AS (SELECT doc_id,"
        "  string_split_regex(trim(text), '\\s+') AS toks"
        "  FROM documents),"
        " b AS (SELECT doc_id, toks, len(toks) AS n,"
        "  [(('0x' || substr(md5('t5:' ||"
        "     CAST(doc_id AS VARCHAR) || ':' ||"
        "     CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT"
        "    % 2147483647) % 20 = 0"
        "   FOR i IN generate_series(1, len(toks))] AS st FROM t),"
        " m AS (SELECT doc_id, toks, n, st,"
        "  [st[i] OR (i >= 2 AND st[i - 1])"
        "   OR (i >= 3 AND st[i - 2])"
        "   FOR i IN generate_series(1, n)] AS mk FROM b),"
        " r AS (SELECT doc_id, toks, n, mk,"
        "  [mk[i] AND (i = 1 OR NOT mk[i - 1])"
        "   FOR i IN generate_series(1, n)] AS nr FROM m),"
        " r2 AS (SELECT *,"
        "  [CASE WHEN x THEN 1 ELSE 0 END FOR x IN nr] AS nri"
        "  FROM r),"
        " r3 AS (SELECT *,"
        "  [CAST(list_sum(nri[1:i]) AS INT)"
        "   FOR i IN generate_series(1, n)] AS rid FROM r2),"
        " p AS (SELECT doc_id, n, mk, nr,"
        "  [CASE WHEN NOT mk[i] THEN toks[i]"
        "   WHEN nr[i] THEN '<extra_id_' ||"
        "    CAST(rid[i] - 1 AS VARCHAR) || '>'"
        "   ELSE '' END FOR i IN generate_series(1, n)] AS corr,"
        "  [CASE WHEN nr[i] THEN '<extra_id_' ||"
        "    CAST(rid[i] - 1 AS VARCHAR) || '> ' || toks[i]"
        "   WHEN mk[i] THEN toks[i]"
        "   ELSE '' END FOR i IN generate_series(1, n)] AS tgt"
        "  FROM r3)"
        " SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,"
        " CAST(len(list_filter(mk, x -> x)) AS BIGINT) AS n_masked,"
        " CAST(len(list_filter(nr, x -> x)) AS BIGINT) AS n_spans,"
        " md5(COALESCE(array_to_string(list_filter(corr,"
        "  p -> p <> ''), ' '), '')) AS corrupted_md5,"
        " md5(COALESCE(array_to_string(list_filter(tgt,"
        "  p -> p <> ''), ' '), '')) AS target_md5"
        " FROM p ORDER BY doc_id"
    ),
    "langid_eval": (
        "WITH toks AS (SELECT doc_id, lang,"
        "  string_split_regex(trim(text), '\\s+') AS t"
        "  FROM documents),"
        " hits AS (SELECT doc_id, lang,"
        "  len(list_filter(t, x -> lower(x) IN"
        "   ('der','die','das','und','ist'))) AS hits_de,"
        "  len(list_filter(t, x -> lower(x) IN"
        "   ('the','a','of','and','to'))) AS hits_en,"
        "  len(list_filter(t, x -> lower(x) IN"
        "   ('le','la','de','et','est'))) AS hits_fr FROM toks),"
        " pr AS (SELECT lang AS t,"
        "  CASE WHEN greatest(hits_de, hits_en, hits_fr) <= 0"
        "   THEN 'und'"
        "  WHEN hits_de = greatest(hits_de, hits_en, hits_fr)"
        "   THEN 'de'"
        "  WHEN hits_en = greatest(hits_de, hits_en, hits_fr)"
        "   THEN 'en' ELSE 'fr' END AS p FROM hits),"
        " cm AS (SELECT t, p, count(*) AS n FROM pr GROUP BY 1, 2),"
        " tp AS (SELECT t AS cls, n AS tp FROM cm WHERE t = p),"
        " sup AS (SELECT t AS cls, sum(n) AS support FROM cm"
        "  GROUP BY 1),"
        " prd AS (SELECT p AS cls, sum(n) AS n_predicted FROM cm"
        "  GROUP BY 1),"
        " pc0 AS (SELECT COALESCE(sup.cls, prd.cls) AS cls,"
        "  CAST(COALESCE(support, 0) AS BIGINT) AS support,"
        "  CAST(COALESCE(n_predicted, 0) AS BIGINT) AS n_predicted"
        "  FROM sup FULL JOIN prd ON prd.cls = sup.cls),"
        " pc1 AS (SELECT pc0.*,"
        "  CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp FROM pc0"
        "  LEFT JOIN tp ON tp.cls = pc0.cls),"
        " pc2 AS (SELECT *, CASE WHEN n_predicted > 0 THEN"
        "  round(tp / CAST(n_predicted AS DOUBLE) + 1e-9, 6) END"
        "   AS precision,"
        "  CASE WHEN support > 0 THEN"
        "  round(tp / CAST(support AS DOUBLE) + 1e-9, 6) END"
        "   AS recall FROM pc1),"
        " pc AS (SELECT cls, support, n_predicted, tp, precision,"
        "  recall, CASE WHEN precision + recall > 0 THEN"
        "  round(2.0 * precision * recall / (precision + recall)"
        "   + 1e-9, 6) END AS f1 FROM pc2),"
        " tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_all,"
        "  CAST(sum(CASE WHEN t = p THEN n ELSE 0 END) AS BIGINT)"
        "   AS n_correct FROM cm)"
        " SELECT * FROM (SELECT * FROM pc UNION ALL"
        "  SELECT '__MICRO__', n_all, n_all, n_correct,"
        "  round(n_correct / CAST(n_all AS DOUBLE) + 1e-9, 6),"
        "  round(n_correct / CAST(n_all AS DOUBLE) + 1e-9, 6),"
        "  round(n_correct / CAST(n_all AS DOUBLE) + 1e-9, 6)"
        "  FROM tot) ORDER BY cls"
    ),
    "benford_check": (
        "WITH d AS (SELECT CAST(substr(CAST(abs(o_totalprice)"
        "   AS VARCHAR), 1, 1) AS INT) AS digit"
        "  FROM orders WHERE o_totalprice >= 1.0),"
        " g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs"
        "  FROM d GROUP BY digit),"
        " t AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS n_total"
        "  FROM g)"
        " SELECT digit, n_obs,"
        " round(n_obs / n_total + 1e-9, 6) AS observed_share,"
        " round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)"
        "  + 1e-9, 6) AS expected_share,"
        " round(n_total * (n_obs / n_total"
        "   - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))"
        "  * (n_obs / n_total"
        "   - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))"
        "  / (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))"
        "  + 1e-9, 6) AS chi2_term"
        " FROM g CROSS JOIN t ORDER BY digit"
    ),
    "market_concentration": (
        "WITH rev AS (SELECT n_name,"
        "  CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS rev"
        "  FROM orders JOIN customer ON o_custkey = c_custkey"
        "  JOIN nation ON c_nationkey = n_nationkey"
        "  GROUP BY n_name),"
        " t AS (SELECT sum(rev) AS tot FROM rev),"
        " s AS (SELECT n_name, rev / tot AS share"
        "  FROM rev CROSS JOIN t),"
        " r AS (SELECT *, row_number() OVER ("
        "  ORDER BY share DESC, n_name) AS rk FROM s)"
        " SELECT CAST(count(*) AS BIGINT) AS n_markets,"
        " round(sum(share * share) + 1e-9, 6) AS hhi,"
        " round(sum(CASE WHEN rk <= 4 THEN share ELSE 0.0 END)"
        "  + 1e-9, 6) AS cr4,"
        " round(max(share) + 1e-9, 6) AS top_share FROM r"
    ),
    "quantile_normalize": (
        "WITH t AS (SELECT doc_id,"
        "   lower(unnest(string_split(trim(text), ' '))) AS token"
        "   FROM documents),"
        " pt AS (SELECT doc_id, token, count(*) AS c FROM t"
        "   WHERE length(token) > 0 GROUP BY 1, 2),"
        " ent AS (SELECT doc_id,"
        "  round(ln(sum(c)) - sum(c * ln(c)) / sum(c) + 1e-9, 4)"
        "   AS entropy FROM pt GROUP BY doc_id),"
        " j AS (SELECT d.doc_id, d.source, e.entropy FROM documents d"
        "  JOIN ent e ON e.doc_id = d.doc_id),"
        " p AS (SELECT doc_id, source, entropy,"
        "  round(percent_rank() OVER (PARTITION BY source"
        "   ORDER BY entropy, doc_id) + 1e-9, 6) AS source_pctile"
        "  FROM j),"
        " gq AS (SELECT quantile_disc(entropy,"
        "  [x / 20.0 FOR x IN generate_series(0, 20)]) AS gq FROM p)"
        " SELECT doc_id, source, entropy, source_pctile,"
        " round(gq[CAST(floor(source_pctile * 20) AS INT) + 1]"
        "  + 1e-9, 6) AS normalized"
        " FROM p CROSS JOIN gq ORDER BY source, doc_id"
    ),
    "revenue_anomalies": (
        "WITH daily AS (SELECT date_trunc('day', o_orderdate)"
        "  AS day, CAST(round(sum(o_totalprice), 2) AS DOUBLE)"
        "  AS revenue FROM orders GROUP BY 1),"
        " s AS (SELECT day, revenue,"
        "  CAST(count(*) OVER w AS BIGINT) AS n_prev,"
        "  round(avg(revenue) OVER w + 1e-9, 4) AS mean_prev,"
        "  CASE WHEN count(*) OVER w >= 2 THEN"
        "   round(stddev_samp(revenue) OVER w + 1e-9, 4) END"
        "   AS std_prev"
        "  FROM daily WINDOW w AS (ORDER BY day"
        "   ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING))"
        " SELECT day, revenue, n_prev, mean_prev, std_prev,"
        " CASE WHEN n_prev >= 7 AND std_prev > 0 THEN"
        "  round((revenue - mean_prev) / std_prev + 1e-9, 4) END"
        "  AS z,"
        " COALESCE(CASE WHEN n_prev >= 7 AND std_prev > 0 THEN"
        "  abs(round((revenue - mean_prev) / std_prev + 1e-9, 4))"
        "   > 3.0 END, FALSE) AS is_anomaly"
        " FROM s ORDER BY day"
    ),
    "zipf_fit": (
        "WITH tf AS (SELECT lang AS cls, t AS term,"
        "  count(*) AS freq FROM (SELECT lang,"
        "  unnest(string_split_regex(trim(text), '\\s+')) AS t"
        "  FROM documents) WHERE t <> '' GROUP BY 1, 2),"
        " r AS (SELECT cls, ln(CAST(rank AS DOUBLE)) AS x,"
        "  ln(CAST(freq AS DOUBLE)) AS y FROM (SELECT *,"
        "  row_number() OVER (PARTITION BY cls"
        "   ORDER BY freq DESC, term ASC) AS rank FROM tf)"
        "  WHERE rank <= 200),"
        " a AS (SELECT cls, CAST(count(*) AS DOUBLE) AS n,"
        "  sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,"
        "  sum(x * x) AS sxx FROM r GROUP BY cls)"
        " SELECT cls, CAST(n AS BIGINT) AS n_terms,"
        " round((n * sxy - sx * sy) / (n * sxx - sx * sx)"
        "  + 1e-9, 6) AS slope,"
        " round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx))"
        "  * sx) / n + 1e-9, 6) AS intercept"
        " FROM a ORDER BY cls"
    ),
    "k_anonymity": (
        "WITH b AS (SELECT c_nationkey, c_mktsegment,"
        "  CAST(floor(CAST(c_acctbal AS DOUBLE) / 2000.0)"
        "   AS BIGINT) AS bal_bucket FROM customer),"
        " g AS (SELECT CAST(c_nationkey AS VARCHAR)"
        "  || '|' || c_mktsegment"
        "  || '|' || CAST(bal_bucket AS VARCHAR) AS qi_values,"
        "  CAST(count(*) AS BIGINT) AS group_size"
        "  FROM b GROUP BY c_nationkey, c_mktsegment, bal_bucket),"
        " r AS (SELECT qi_values, group_size,"
        "  group_size AS at_risk_rows FROM g WHERE group_size < 5)"
        " SELECT * FROM (SELECT * FROM r UNION ALL"
        "  SELECT '__TOTAL__', CAST(count(*) AS BIGINT),"
        "  CAST(COALESCE(sum(group_size), 0) AS BIGINT) FROM r)"
        " ORDER BY qi_values"
    ),
    "chi2_terms": (
        "WITH dt AS (SELECT DISTINCT doc_id, lang AS cls, t AS term"
        "  FROM (SELECT doc_id, lang,"
        "   unnest(string_split_regex(trim(text), '\\s+')) AS t"
        "   FROM documents) WHERE t <> ''),"
        " n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE)"
        "  AS nd FROM documents),"
        " cd AS (SELECT lang AS cls,"
        "  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_cls"
        "  FROM documents GROUP BY 1),"
        " p AS (SELECT term, cls, CAST(count(*) AS BIGINT) AS a_raw"
        "  FROM dt GROUP BY 1, 2),"
        " tt AS (SELECT term, CAST(sum(a_raw) AS BIGINT) AS df_term"
        "  FROM p GROUP BY 1),"
        " tc AS (SELECT tt.term, g.cls, tt.df_term,"
        "  CAST(COALESCE(p.a_raw, 0) AS BIGINT) AS a"
        "  FROM tt CROSS JOIN (SELECT cls FROM cd) g"
        "  LEFT JOIN p ON p.term = tt.term AND p.cls = g.cls),"
        " s AS (SELECT tc.cls, tc.term, tc.a, tc.df_term,"
        "   cd.n_cls, n.nd,"
        "   CAST(a AS DOUBLE) * (nd - n_cls - (df_term - a))"
        "    - CAST(df_term - a AS DOUBLE)"
        "      * CAST(n_cls - a AS DOUBLE) AS ad_bc"
        "  FROM tc JOIN cd ON cd.cls = tc.cls CROSS JOIN n"
        "  WHERE tc.df_term >= 5),"
        " sc AS (SELECT cls, term, a, df_term,"
        "  round(CASE WHEN df_term >= nd OR n_cls >= nd THEN 0.0"
        "   ELSE nd * ad_bc * ad_bc /"
        "   (CAST(df_term AS DOUBLE) * (nd - df_term)"
        "    * CAST(n_cls AS DOUBLE) * (nd - n_cls)) END + 1e-9, 6)"
        "   AS chi2 FROM s),"
        " r AS (SELECT *, row_number() OVER (PARTITION BY cls"
        "  ORDER BY chi2 DESC, term ASC) AS rk FROM sc)"
        " SELECT cls, CAST(rk AS INT) AS rk, term,"
        " a AS present_in_class, df_term AS doc_freq, chi2"
        " FROM r WHERE rk <= 10 ORDER BY cls, rk"
    ),
    "score_normalize": (
        "WITH t AS (SELECT doc_id,"
        "   lower(unnest(string_split(trim(text), ' '))) AS token"
        "   FROM documents),"
        " pt AS (SELECT doc_id, token, count(*) AS c FROM t"
        "   WHERE length(token) > 0 GROUP BY 1, 2),"
        " ent AS (SELECT doc_id,"
        "  round(ln(sum(c)) - sum(c * ln(c)) / sum(c) + 1e-9, 4)"
        "   AS entropy FROM pt GROUP BY doc_id),"
        " j AS (SELECT d.doc_id, d.source, e.entropy FROM documents d"
        "  JOIN ent e ON e.doc_id = d.doc_id)"
        " SELECT doc_id, source, entropy,"
        " round(percent_rank() OVER (PARTITION BY source"
        "  ORDER BY entropy, doc_id) + 1e-9, 6) AS source_pctile"
        " FROM j ORDER BY source, doc_id"
    ),
    "winsorized_stats": (
        "WITH b AS (SELECT o_orderpriority,"
        "  quantile_cont(o_totalprice, 0.01) AS lo,"
        "  quantile_cont(o_totalprice, 0.99) AS hi"
        "  FROM orders GROUP BY o_orderpriority),"
        " c AS (SELECT o.o_orderpriority, o.o_totalprice AS v,"
        "  greatest(least(o.o_totalprice, b.hi), b.lo) AS w, b.lo, b.hi"
        "  FROM orders o JOIN b USING (o_orderpriority))"
        " SELECT o_orderpriority, count(*) AS n,"
        " CAST(count(*) FILTER (WHERE v < lo) AS BIGINT) AS n_clipped_lo,"
        " CAST(count(*) FILTER (WHERE v > hi) AS BIGINT) AS n_clipped_hi,"
        " round(min(lo) + 1e-9, 4) AS lo_bound,"
        " round(max(hi) + 1e-9, 4) AS hi_bound,"
        " round(round(CAST(sum(w) AS DOUBLE), 2) / count(*) + 1e-9, 4)"
        "  AS winsorized_mean"
        " FROM c GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    "clean_text": (
        "WITH aug AS (SELECT doc_id, text || chr(10) || '<div>menu</div>'"
        "  || chr(10) || 'Home About' || chr(10) ||"
        "  '&amp; final long closing line here' AS text FROM documents),"
        " l AS (SELECT doc_id, length(text) AS n_chars_raw,"
        "  string_split(regexp_replace(regexp_replace(regexp_replace("
        "   regexp_replace(text, '<[^>]+>', ' ', 'g'),"
        "   '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),"
        "   chr(10)) AS lines FROM aug),"
        " c AS (SELECT doc_id, n_chars_raw, len(lines) AS n_lines,"
        "  list_filter(lines, x -> length(trim(x)) > 0 AND"
        "   len(regexp_split_to_array(trim(x), '\\s+')) >= 3) AS kept"
        "  FROM l)"
        " SELECT doc_id, n_chars_raw,"
        " length(trim(regexp_replace(array_to_string(kept, chr(10)),"
        "  '[ \\t]+', ' ', 'g'))) AS n_chars_clean,"
        " len(kept) AS n_lines_kept,"
        " n_lines - len(kept) AS n_lines_dropped,"
        " trim(regexp_replace(array_to_string(kept, chr(10)),"
        "  '[ \\t]+', ' ', 'g')) AS clean_text"
        " FROM c ORDER BY doc_id"
    ),
    "chunk_documents_udtf": (
        "WITH w AS (SELECT doc_id,"
        " regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),"
        " e AS (SELECT doc_id, words,"
        " unnest(generate_series(0, (len(words)+29)//30 - 1)) AS s FROM w)"
        " SELECT doc_id, CAST(s AS INT) AS chunk_id,"
        " CAST(len(words[s*30+1 : s*30+40]) AS INT) AS n_chunk_words,"
        " array_to_string(words[s*30+1 : s*30+40], ' ') AS chunk_text FROM e"
    ),
    "repetition_ratio": (
        "WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks"
        "  FROM documents),"
        " g AS (SELECT doc_id, list_transform("
        "  range(1, greatest(len(toks) - 2, 1) + 1),"
        "  i -> array_to_string(toks[i:i+2], ' ')) AS grams FROM t)"
        " SELECT doc_id, len(grams) AS total_grams,"
        " len(list_distinct(grams)) AS distinct_grams,"
        " round((len(grams) - len(list_distinct(grams)))"
        "  / greatest(len(grams), 1) + 1e-9, 6) AS repetition_ratio"
        " FROM g ORDER BY doc_id"
    ),
    "redact_pii": (
        "WITH aug AS (SELECT doc_id,"
        "  text || ' contact user' || doc_id || '@example.com or +123456789' AS t"
        "  FROM documents),"
        " red AS (SELECT doc_id, t,"
        "  regexp_replace(regexp_replace(t,"
        "   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),"
        "   '\\+[0-9]{7,15}', '<PHONE>', 'g') AS rt FROM aug)"
        " SELECT doc_id,"
        " len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_emails,"
        " len(regexp_extract_all(t, '\\+[0-9]{7,15}')) AS n_phones,"
        " length(rt) AS n_chars, sha256(rt) AS redacted_sha"
        " FROM red ORDER BY doc_id"
    ),
    "tfidf_top_terms": (
        "WITH toks AS (SELECT doc_id,"
        "  unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term"
        "  FROM documents),"
        " filt AS (SELECT doc_id, term FROM toks WHERE length(term) >= 3),"
        " tf AS (SELECT doc_id, term, count(*) AS tf FROM filt GROUP BY 1, 2),"
        " dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),"
        " n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),"
        " weighted AS (SELECT doc_id, term, tf, df,"
        "  round(tf * (ln((n + 1) / (df + 1)) + 1) + 1e-9, 6) AS tfidf"
        "  FROM tf JOIN dfq USING (term) CROSS JOIN n),"
        " ranked AS (SELECT *, CAST(row_number() OVER ("
        "  PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rank"
        "  FROM weighted)"
        " SELECT doc_id, rank, term, tf, df, tfidf FROM ranked"
        " WHERE rank <= 3 ORDER BY doc_id, rank"
    ),
    "pack_documents": (
        # replay of the engine's greedy sequential packing recurrence
        # (same order, same overflow rule) as a recursive CTE
        "WITH RECURSIVE docs AS (SELECT doc_id, lang, doc_id % 8 AS shard,"
        "  len(string_split_regex(trim(text), '\\s+')) AS n_tokens FROM documents),"
        " ordered AS (SELECT *, row_number() OVER ("
        "  PARTITION BY lang, shard ORDER BY doc_id) AS rn FROM docs),"
        " packed AS ("
        "  SELECT lang, shard, doc_id, n_tokens, rn,"
        "   CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill"
        "  FROM ordered WHERE rn = 1"
        "  UNION ALL"
        "  SELECT o.lang, o.shard, o.doc_id, o.n_tokens, o.rn,"
        "   CASE WHEN p.fill + o.n_tokens > 512 THEN p.bin_id + 1 ELSE p.bin_id END,"
        "   CASE WHEN p.fill + o.n_tokens > 512 THEN o.n_tokens ELSE p.fill + o.n_tokens END"
        "  FROM packed p JOIN ordered o"
        "   ON o.lang = p.lang AND o.shard = p.shard AND o.rn = p.rn + 1),"
        " per_bin AS (SELECT lang, shard, bin_id, sum(n_tokens) AS bin_fill,"
        "  count(*) AS nd FROM packed GROUP BY 1, 2, 3)"
        " SELECT lang, shard, count(*) AS n_bins,"
        " CAST(sum(nd) AS BIGINT) AS n_docs,"
        " CAST(sum(bin_fill) AS BIGINT) AS total_tokens,"
        " CAST(max(bin_fill) AS BIGINT) AS max_fill,"
        " round(sum(bin_fill) / (count(*) * 512) + 1e-9, 6) AS fill_ratio"
        " FROM per_bin GROUP BY lang, shard ORDER BY lang, shard"
    ),
    "gopher_quality": (
        "WITH t AS (SELECT doc_id, text,"
        "  string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w,"
        "  string_split(text, chr(10)) AS lines FROM documents),"
        " m AS (SELECT doc_id,"
        "  len(w) AS n_words,"
        "  greatest(len(w), 1)::DOUBLE AS nw,"
        "  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)"
        "    / greatest(len(w), 1) AS mwl,"
        "  len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym,"
        "  greatest(len(lines), 1)::DOUBLE AS nl,"
        "  len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))"
        "    AS n_bullet,"
        "  len(list_filter(lines, l -> regexp_matches(trim(l), '\\.\\.\\.$')))"
        "    AS n_ell,"
        "  len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,"
        "  len(list_intersect(list_transform(w, x -> lower(x)),"
        "    ['the','a','of','and','to'])) AS stop_hits"
        "  FROM t)"
        " SELECT doc_id, n_words,"
        " round(mwl + 1e-9, 6) AS mean_word_len,"
        " round(n_sym / nw + 1e-9, 6) AS symbol_ratio,"
        " round(n_bullet / nl + 1e-9, 6) AS bullet_line_frac,"
        " round(n_ell / nl + 1e-9, 6) AS ellipsis_line_frac,"
        " round(n_alpha / nw + 1e-9, 6) AS alpha_word_frac,"
        " stop_hits,"
        " (n_words >= 50 AND n_words <= 100000"
        "  AND mwl >= 3.0 AND mwl <= 10.0"
        "  AND n_sym / nw < 0.1"
        "  AND n_bullet / nl <= 0.9"
        "  AND n_ell / nl <= 0.3"
        "  AND n_alpha / nw >= 0.8"
        "  AND stop_hits >= 2) AS passes_gopher"
        " FROM m ORDER BY doc_id"
    ),
    "mad_outliers": (
        "WITH med AS (SELECT event_type, median(value) AS m"
        "  FROM events GROUP BY 1),"
        " dev AS (SELECT e.event_type, e.value, med.m,"
        "  abs(e.value - med.m) AS ad"
        "  FROM events e JOIN med USING (event_type)),"
        " mad AS (SELECT event_type, median(ad) AS md"
        "  FROM dev GROUP BY 1)"
        " SELECT dev.event_type, count(*) AS n,"
        " round(min(dev.m) + 1e-9, 6) AS median,"
        " round(min(mad.md) + 1e-9, 6) AS mad,"
        " count(CASE WHEN dev.ad > 3.0 * 1.4826 * mad.md THEN 1 END)"
        "   AS n_outliers,"
        " round(max(CASE WHEN mad.md > 0"
        "   THEN dev.ad / (1.4826 * mad.md) END) + 1e-9, 4) AS max_robust_z"
        " FROM dev JOIN mad USING (event_type)"
        " GROUP BY dev.event_type ORDER BY dev.event_type"
    ),
    "bpe_encode": (
        # greedy BPE merge replay: a recursive CTE walks each
        # vocabulary word through (merge rank, symbol position)
        # states with the same (result, pending) fold the engine
        # runs as a JVM aggregate — then re-joins tokens per doc
        "WITH RECURSIVE merges(mrank, a, b, ab) AS (VALUES "
        + ", ".join(
            f"({i}, '{a}', '{b}', '{a + b}')"
            for i, (a, b) in enumerate(_BPE_MERGES)
        )
        + "),"
        " tok AS (SELECT doc_id, i AS pos, w[i] AS token"
        "  FROM (SELECT doc_id,"
        "    string_split_regex(trim(text), '\\s+') AS w FROM documents),"
        "  LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g"
        "  ),"
        " tk AS (SELECT * FROM tok WHERE length(token) > 0),"
        " vocab AS (SELECT DISTINCT token FROM tk),"
        " rec AS ("
        "  SELECT token, 0 AS mrank, string_split(token, '') AS syms,"
        "   0 AS pos, CAST([] AS VARCHAR[]) AS res,"
        "   CAST(NULL AS VARCHAR) AS pend FROM vocab"
        "  UNION ALL"
        "  SELECT r.token,"
        "   CASE WHEN r.pos < len(r.syms) THEN r.mrank"
        "    ELSE r.mrank + 1 END,"
        "   CASE WHEN r.pos < len(r.syms) THEN r.syms"
        "    ELSE CASE WHEN r.pend IS NULL THEN r.res"
        "     ELSE r.res || [r.pend] END END,"
        "   CASE WHEN r.pos < len(r.syms) THEN r.pos + 1 ELSE 0 END,"
        "   CASE WHEN r.pos < len(r.syms) THEN"
        "     CASE WHEN r.pend IS NULL THEN r.res"
        "      WHEN r.pend = m.a AND r.syms[r.pos + 1] = m.b"
        "       THEN r.res || [m.ab]"
        "      ELSE r.res || [r.pend] END"
        "    ELSE CAST([] AS VARCHAR[]) END,"
        "   CASE WHEN r.pos < len(r.syms) THEN"
        "     CASE WHEN r.pend IS NULL THEN r.syms[r.pos + 1]"
        "      WHEN r.pend = m.a AND r.syms[r.pos + 1] = m.b"
        "       THEN CAST(NULL AS VARCHAR)"
        "      ELSE r.syms[r.pos + 1] END"
        "    ELSE CAST(NULL AS VARCHAR) END"
        "  FROM rec r JOIN merges m ON m.mrank = r.mrank),"
        " enc AS (SELECT token, len(syms) AS n_syms,"
        "   array_to_string(syms, ',') AS syms_csv"
        f"  FROM rec WHERE mrank = {len(_BPE_MERGES)} AND pos = 0)"
        " SELECT tk.doc_id,"
        " count(*) AS n_tokens,"
        " CAST(sum(e.n_syms) AS BIGINT) AS n_symbols,"
        " round(CAST(sum(e.n_syms) AS DOUBLE) / count(*) + 1e-9, 4)"
        "  AS symbols_per_token,"
        " string_agg(e.syms_csv, ' ' ORDER BY tk.pos) AS encoded"
        " FROM tk JOIN enc e USING (token)"
        " GROUP BY tk.doc_id ORDER BY tk.doc_id"
    ),
    "length_bucketing_waste": (
        # two-phase rank == plain row_number here; buckets use the
        # SQL-standard ntile distribution in integer arithmetic
        # (first total%nb buckets take base+1 rows), replicated rather
        # than ntile(nb) so the bucket math is explicit on both engines
        "WITH tok AS (SELECT doc_id,"
        "  len(string_split_regex(trim(text), '\\s+')) AS n FROM documents),"
        " axis AS (SELECT unnest([1, 2, 4, 8]) AS nb),"
        " ranked AS (SELECT nb, n,"
        "  row_number() OVER (PARTITION BY nb ORDER BY n, doc_id) AS r,"
        "  count(*) OVER (PARTITION BY nb) AS total FROM tok, axis),"
        " b AS (SELECT nb, n,"
        "  CASE WHEN r <= (total // nb + 1) * (total % nb)"
        "   THEN (r - 1) // (total // nb + 1) + 1"
        "   ELSE (total % nb) + (r - (total // nb + 1) * (total % nb) - 1)"
        "        // (total // nb) + 1 END AS bucket FROM ranked),"
        " pb AS (SELECT nb, bucket, count(*) AS docs, max(n) AS cap,"
        "  sum(n) AS toks FROM b GROUP BY 1, 2)"
        " SELECT CAST(nb AS BIGINT) AS n_buckets,"
        "  CAST(sum(toks) AS BIGINT) AS total_tokens,"
        "  CAST(sum(cap * docs) AS BIGINT) AS padded_tokens,"
        "  round((sum(cap * docs) - sum(toks)) * 1.0 / sum(cap * docs)"
        "   + 1e-9, 6) AS waste_share"
        " FROM pb GROUP BY nb ORDER BY n_buckets"
    ),
    "context_window_fit": "WITH n AS (SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS nt FROM documents), a AS (SELECT count(*) AS nd, sum(nt) AS tt, sum(CASE WHEN nt <= 8 THEN 1 ELSE 0 END) AS f8, sum(CASE WHEN nt <= 8 THEN nt ELSE 0 END) AS m8, sum(least(nt, 8)) AS l8, sum(CASE WHEN nt <= 16 THEN 1 ELSE 0 END) AS f16, sum(CASE WHEN nt <= 16 THEN nt ELSE 0 END) AS m16, sum(least(nt, 16)) AS l16, sum(CASE WHEN nt <= 32 THEN 1 ELSE 0 END) AS f32, sum(CASE WHEN nt <= 32 THEN nt ELSE 0 END) AS m32, sum(least(nt, 32)) AS l32, sum(CASE WHEN nt <= 64 THEN 1 ELSE 0 END) AS f64, sum(CASE WHEN nt <= 64 THEN nt ELSE 0 END) AS m64, sum(least(nt, 64)) AS l64, sum(CASE WHEN nt <= 128 THEN 1 ELSE 0 END) AS f128, sum(CASE WHEN nt <= 128 THEN nt ELSE 0 END) AS m128, sum(least(nt, 128)) AS l128 FROM n) SELECT * FROM (SELECT CAST(8 AS INT) AS context_size, CAST(f8 AS BIGINT) AS n_docs_fit, round(f8 * 1.0 / nd + 1e-9, 6) AS doc_fit_share, round(m8 * 1.0 / tt + 1e-9, 6) AS token_fit_share, round(l8 * 1.0 / tt + 1e-9, 6) AS clipped_token_share FROM a UNION ALL SELECT CAST(16 AS INT) AS context_size, CAST(f16 AS BIGINT) AS n_docs_fit, round(f16 * 1.0 / nd + 1e-9, 6) AS doc_fit_share, round(m16 * 1.0 / tt + 1e-9, 6) AS token_fit_share, round(l16 * 1.0 / tt + 1e-9, 6) AS clipped_token_share FROM a UNION ALL SELECT CAST(32 AS INT) AS context_size, CAST(f32 AS BIGINT) AS n_docs_fit, round(f32 * 1.0 / nd + 1e-9, 6) AS doc_fit_share, round(m32 * 1.0 / tt + 1e-9, 6) AS token_fit_share, round(l32 * 1.0 / tt + 1e-9, 6) AS clipped_token_share FROM a UNION ALL SELECT CAST(64 AS INT) AS context_size, CAST(f64 AS BIGINT) AS n_docs_fit, round(f64 * 1.0 / nd + 1e-9, 6) AS doc_fit_share, round(m64 * 1.0 / tt + 1e-9, 6) AS token_fit_share, round(l64 * 1.0 / tt + 1e-9, 6) AS clipped_token_share FROM a UNION ALL SELECT CAST(128 AS INT) AS context_size, CAST(f128 AS BIGINT) AS n_docs_fit, round(f128 * 1.0 / nd + 1e-9, 6) AS doc_fit_share, round(m128 * 1.0 / tt + 1e-9, 6) AS token_fit_share, round(l128 * 1.0 / tt + 1e-9, 6) AS clipped_token_share FROM a) ORDER BY context_size",
    "token_burstiness": "WITH pd AS (SELECT doc_id, w, count(*) AS c FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents) WHERE w <> '' GROUP BY doc_id, w), m AS (SELECT w, count(*) AS df, sum(c) AS s1, sum(c*c) AS s2 FROM pd GROUP BY w) SELECT w AS token, CAST(df AS BIGINT) AS df, CAST(s1 AS BIGINT) AS total_count, round((s2 * 1.0 / df - (s1 * 1.0 / df) * (s1 * 1.0 / df))   / (s1 * 1.0 / df) + 1e-9, 6) AS vmr FROM m ORDER BY total_count DESC, token LIMIT 20",
    "bpe_train_fixed": (
        # 2-merge BPE trainer unrolled as materialized CTEs; symbol
        # state = \x01<sym>\x02 sentinel string, merge = ONE literal
        # replace (both engines scan left-to-right non-overlapping,
        # which IS the greedy BPE pass)
        "WITH words AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (SELECT"
        "  unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'),"
        "    ' ')) AS w FROM documents) WHERE w <> '' GROUP BY w),"
        " v0 AS (SELECT wc, chr(1) ||"
        "   array_to_string(string_split(w, ''), chr(2)||chr(1)) || chr(2)"
        "   AS enc FROM words),"
        " s1 AS (SELECT wc, string_split(substr(enc, 2, length(enc)-2),"
        "   chr(2)||chr(1)) AS s FROM v0),"
        " p1 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM (SELECT wc,"
        "   unnest([s[i] || ' ' || s[i+1] FOR i IN generate_series(1, len(s)-1)])"
        "   AS pair FROM s1 WHERE len(s) >= 2) GROUP BY pair),"
        " m1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),"
        " v1 AS (SELECT wc, replace(enc,"
        "   chr(1) || split_part((SELECT pair FROM m1), ' ', 1) || chr(2) ||"
        "   chr(1) || split_part((SELECT pair FROM m1), ' ', 2) || chr(2),"
        "   chr(1) || replace((SELECT pair FROM m1), ' ', '') || chr(2))"
        "   AS enc FROM v0),"
        " s2 AS (SELECT wc, string_split(substr(enc, 2, length(enc)-2),"
        "   chr(2)||chr(1)) AS s FROM v1),"
        " p2 AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM (SELECT wc,"
        "   unnest([s[i] || ' ' || s[i+1] FOR i IN generate_series(1, len(s)-1)])"
        "   AS pair FROM s2 WHERE len(s) >= 2) GROUP BY pair),"
        " m2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1)"
        " SELECT CAST(0 AS INT) AS rank, pair, cnt AS pair_count FROM m1"
        " UNION ALL"
        " SELECT CAST(1 AS INT) AS rank, pair, cnt AS pair_count FROM m2"
        " ORDER BY rank"
    ),
    "bpe_pair_counts": (
        "WITH words AS (SELECT w, count(*) AS wc FROM (SELECT"
        "  unnest(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'),"
        "    ' ')) AS w FROM documents) WHERE w <> '' GROUP BY w),"
        " pr AS (SELECT wc,"
        "  unnest([c[i] || ' ' || c[i+1]"
        "    FOR i IN generate_series(1, len(c)-1)]) AS pair"
        "  FROM (SELECT wc, string_split(w, '') AS c FROM words"
        "   WHERE length(w) >= 2))"
        " SELECT pair, CAST(sum(wc) AS BIGINT) AS pair_count FROM pr"
        " GROUP BY pair ORDER BY pair_count DESC, pair LIMIT 20"
    ),
    "feature_hashing": (
        "WITH t AS (SELECT doc_id, list_transform("
        "  string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),"
        "  x -> ('0x' || substr(md5('fh:' || x), 1, 8))::BIGINT"
        "    % 2147483647 % 16) AS b FROM documents)"
        " SELECT doc_id, "
        + ", ".join(
            f"len(list_filter(b, x -> x = {j})) AS f{j}" for j in range(16)
        )
        + " FROM t ORDER BY doc_id"
    ),
}
