"""Text-analysis operators over the documents corpus (north-star ext:
language-ID, quality scoring, token counting, fingerprinting).

All JVM-side built-ins (split/regexp/length/sha2) — no Python UDFs, so
every expression stays inside whole-stage codegen and the scan only
reads the columns each query touches. At 100 TB the corpus is the big
table; these are embarrassingly parallel map-side transforms with at
most one shuffle for the final group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: tiny deterministic stopword lists for the n-gram/stopword language
#: heuristic. Real language-ID plugs in behind the same column contract.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}

#: BPE-ish token pattern: word pieces, numbers, or single non-space symbols
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(col: str = "text") -> F.Column:
    """Whitespace tokenization; trim first so no empty edge tokens."""
    return F.split(F.trim(F.col(col)), "\\s+")


def token_count(col: str = "text") -> F.Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: str = "text") -> F.Column:
    """Token count under a BPE-ish regex (letters / digits / symbol)."""
    return F.size(F.regexp_extract_all(F.col(col), F.lit(TOKEN_PATTERN), 0))


def stopword_hits(col: str, words: tuple[str, ...]) -> F.Column:
    """How many tokens are in the given stopword list."""
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-language corpus profile: doc counts, char/token averages."""
    return (
        documents.select(
            "lang",
            F.length("text").alias("n_chars"),
            token_count("text").alias("n_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


def token_fertility_by_lang(documents: DataFrame) -> DataFrame:
    """Tokenizer fertility profile per language: subword-ish (BPE
    regex) tokens per whitespace word — the per-language multiplier a
    tokenizer charges — plus subwords per 100 chars. The companion
    metric every multilingual token-budget plan needs: a lang whose
    fertility is 2x costs 2x the budget for the same word count.

    Plan: one map-side expression pass (both token counts are JVM
    regex expressions, no UDF), one |langs|-group aggregation; ratios
    derive from exact integer sums, so they are order-insensitive and
    engine-portable at any scale."""
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bpe_ish_token_count("text")).cast("bigint").alias("bpe_tokens"),
            F.sum(token_count("text")).cast("bigint").alias("ws_tokens"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "bpe_tokens",
            "ws_tokens",
            "n_chars",
            F.round(F.col("bpe_tokens") / F.col("ws_tokens"), 6).alias("fertility"),
            F.round(F.col("bpe_tokens") * 100.0 / F.col("n_chars"), 6).alias(
                "tokens_per_100_chars"
            ),
        )
        .orderBy("lang")
    )


def quality_scores(documents: DataFrame, *, keep: tuple[str, ...] = ()) -> DataFrame:
    """Heuristic quality scoring: length band + punctuation density +
    stopword ratio -> [0,1] score. Mirrors common LLM-corpus filters
    (C4/Gopher-style) with fully declarative expressions.

    ``keep`` threads extra input columns (e.g. ``source``) through the
    projection so downstream group-wise consumers don't need a
    fact-sized re-join just to recover them."""
    n_tokens = token_count("text")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9\\s]"), 0))
    n_stop = stopword_hits("text", STOPWORDS["en"])
    length_ok = (F.length("text") >= 50) & (F.length("text") <= 10000)
    punct_ratio = n_punct / F.greatest(F.length("text"), F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return documents.select(
        "doc_id",
        "lang",
        *keep,
        F.col("n_chars").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio + 1e-9, 6).alias("punct_ratio"),
        F.round(stop_ratio + 1e-9, 6).alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language guess: the language whose stopword list
    hits most tokens wins; ties/zero -> 'und' (undetermined)."""
    hits = {lang: stopword_hits("text", words) for lang, words in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in sorted(STOPWORDS):  # deterministic tie-break: alphabetical
        guess = guess.when(hits[lang] == best, F.lit(lang))
    return documents.select(
        "doc_id",
        "lang",
        *[hits[lang].alias(f"hits_{lang}") for lang in sorted(STOPWORDS)],
        guess.otherwise(F.lit("und")).alias("lang_guess"),
    )


def tfidf_top_terms(
    documents: DataFrame,
    *,
    k: int = 3,
    min_token_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Shuffle profile at 100 TB: explode tokens (map-side) -> tf agg on
    (doc, term) -> df agg on term (the document-frequency table is
    vocabulary-sized, orders of magnitude smaller than the corpus) ->
    broadcast-eligible join of weights back onto (doc, term) -> per-doc
    top-k via a keyed window (never a global sort). idf uses the
    smoothed ``ln((N+1)/(df+1)) + 1`` form so terms present in every
    document still get a finite positive weight.

    Ties (equal tf-idf within a doc) break alphabetically on the term
    so both engines rank identically.
    """
    # tokenize at full parallelism: a narrow local scan (single parquet
    # row group) would otherwise run the explode on one core — no-op at
    # real scale where the scan has thousands of splits
    sc = documents.sparkSession.sparkContext
    if documents.rdd.getNumPartitions() < sc.defaultParallelism:
        documents = documents.repartition(sc.defaultParallelism)
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("term"),
    ).filter(F.length("term") >= min_token_len)
    # tf feeds BOTH the df aggregation and the weight join, and Spark
    # does not reuse the common subtree — without a barrier the corpus
    # is scanned + exploded twice. Persist is the local analog of the
    # scale path (write the tf table to parquet; it is narrow and far
    # smaller than the exploded token stream).
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    # eager fill: df aggregation and weight join otherwise race the
    # cold cache as concurrent stages and scan+explode the corpus twice
    tf.count()
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.select(F.countDistinct(id_col).alias("n")).crossJoin(
        df_tbl
    )  # 1-row broadcast of the corpus size onto the vocab table
    idf = n_docs.select(
        "term",
        "df",
        (F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1).alias("idf"),
    )
    weighted = tf.join(idf, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.col("idf") + 1e-9, 6).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "rank")
    )


def repetition_ratio(documents: DataFrame, *, word_k: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Intra-document repetition: the fraction of word ``word_k``-grams
    that are duplicates of an earlier one (Gopher-style repetition
    filter — high ratio flags boilerplate/spam). Pure map-side
    expression: one token split, one n-gram transform, one
    array_distinct; no shuffle at all."""
    from flink_elasticsearch_ingestion_spark.operators.util import bind_once

    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    grams = bind_once(
        toks,
        lambda t: F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(t) - F.lit(word_k - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(t, i, word_k)),
        ),
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        total.alias("total_grams"),
        distinct.alias("distinct_grams"),
        F.round((total - distinct) / F.greatest(total, F.lit(1)) + 1e-9, 6).alias(
            "repetition_ratio"
        ),
    )


#: deliberately simple, engine-portable patterns (no lookaround): the
#: real scrubber plugs stricter patterns into the same column contract
EMAIL_PATTERN = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PHONE_PATTERN = "\\+[0-9]{7,15}"


def redact_pii(documents: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII scrubbing: replace email addresses and +international phone
    numbers with typed placeholder tokens, reporting per-doc match
    counts. Map-side regexp work only — the standard pre-training
    compliance pass, run before any content hashing so near-dup
    detection sees the redacted form."""
    email_hits = F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_PATTERN), 0))
    phone_hits = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PHONE_PATTERN), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        email_hits.alias("n_emails"),
        phone_hits.alias("n_phones"),
        redacted.alias("redacted_text"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: sha256 over the
    whitespace-normalized, lowercased text. Content-addressable id for
    exact dedup across 100 TB (collision-safe unlike 64-bit hashes)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " ")
    return documents.select(
        "doc_id",
        F.sha2(normalized, 256).alias("fingerprint"),
        F.length(normalized).alias("n_chars_norm"),
    )


def passage_dedup(
    documents: DataFrame, *, chunk_words: int = 10, text_col: str = "text"
) -> DataFrame:
    """Passage-level duplicate detection: split each document into
    fixed-width word windows ("passages" — the sentence/paragraph analog
    for unpunctuated corpora), hash each, and report passages occurring
    more than once corpus-wide.

    Spark-first shape: the chunking is a pure expression tree
    (split -> sequence -> transform/slice -> explode) that runs map-side
    inside the scan stage; the ONLY shuffle is the group-by on the
    passage hash. At 100 TB that is one keyed exchange of (hash, doc_id)
    pairs — no document text ever shuffles. Cross-doc duplicate passages
    are exactly what paragraph-dedup pipelines (C4, RefinedWeb) drop.
    """
    from flink_elasticsearch_ingestion_spark.operators.util import ensure_parallelism

    documents = ensure_parallelism(documents)
    from flink_elasticsearch_ingestion_spark.operators.util import bind_once

    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    chunks = bind_once(
        toks,
        lambda t: F.transform(
            F.sequence(
                F.lit(0), F.ceil(F.size(t) / F.lit(chunk_words)).cast("int") - 1
            ),
            lambda i: F.array_join(F.slice(t, i * chunk_words + 1, chunk_words), " "),
        ),
    )
    exploded = documents.select(
        "doc_id", F.explode(chunks).alias("passage")
    ).select("doc_id", F.md5("passage").alias("passage_hash"))
    return (
        exploded.groupBy("passage_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.col("n_occurrences").desc(), "passage_hash")
    )


def top_bigrams(documents: DataFrame, *, k: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus-wide top-k word bigrams (n-gram frequency table — the
    vocabulary/statistics primitive for tokenizer training and corpus
    QA). Map-side expression fan-out, one hash-agg shuffle on the bigram
    key, TakeOrderedAndProject for the top-k — no global sort."""
    from flink_elasticsearch_ingestion_spark.operators.util import ensure_parallelism

    documents = ensure_parallelism(documents)
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    # zip_with over two shifted slices: ONE interpreted-lambda pass per
    # bigram (vs transform + 2x element_at = 3 array probes each)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        documents.filter(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "bigram")
        .limit(k)
    )


def source_mix(documents: DataFrame) -> DataFrame:
    """Per-source corpus profile: doc share, language spread, token
    volume — the mixture report every training-data pipeline keeps in
    front of sampling decisions. One partial+final agg."""
    return (
        documents.select(
            "source",
            "lang",
            F.length("text").alias("n_chars"),
            token_count("text").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.round(F.sum("n_chars").cast("double"), 2) / F.count(F.lit(1)) + 1e-9, 4
            ).alias("avg_chars"),
        )
        .orderBy("source")
    )


_CHUNK_SCHEMA = "doc_id bigint, chunk_id int, n_chunk_words int, chunk_text string"


def chunk_documents(
    documents: DataFrame,
    *,
    chunk_words: int = 40,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunker (the RAG / context-window prep
    primitive): overlapping ``chunk_words``-word windows every
    ``chunk_words - overlap`` words, one output row per chunk.

    Expression form: split -> sequence over chunk starts ->
    transform/slice -> posexplode, all map-side inside the scan stage
    with zero shuffles — at 100 TB this is embarrassingly parallel and
    the output is ~(1 + overlap/step)x the input text, so the operator
    is write-bound, not compute-bound. ``chunk_documents_udtf`` is the
    lateral table-function twin (same rows; parity-tested).
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    from flink_elasticsearch_ingestion_spark.operators.util import bind_once

    step = chunk_words - overlap
    toks = tokens(text_col)
    chunks = bind_once(
        toks,
        lambda t: F.transform(
            F.sequence(
                F.lit(0),
                F.floor((F.size(t) + step - 1) / F.lit(step)).cast("int") - 1,
            ),
            lambda i: F.struct(
                F.size(F.slice(t, i * step + 1, chunk_words)).alias(
                    "n_chunk_words"
                ),
                F.array_join(F.slice(t, i * step + 1, chunk_words), " ").alias(
                    "chunk_text"
                ),
            ),
        ),
    )
    return documents.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        "doc_id",
        "chunk_id",
        F.col("c.n_chunk_words").alias("n_chunk_words"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def chunk_documents_udtf(
    documents: DataFrame,
    *,
    chunk_words: int = 40,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Python UDTF twin of :func:`chunk_documents` — covers the
    user-defined TABLE function surface (SURVEY.md §2.9): one input row
    fans out to N output rows via a lateral join, the shape Spark's
    scalar/pandas UDFs cannot express.

    The reference has no UDTFs (its per-record fan-out lives in the
    emitter, core.clj:55-66); this is the Spark-4 form a user would
    reach for when chunk logic outgrows expressions (real tokenizers,
    sentence splitters). Engine policy still holds — the expression
    form is the hot path; the UDTF exists for API parity and is
    differential-tested against the same DuckDB oracle.
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    import re

    from pyspark.sql.functions import udtf

    step = chunk_words - overlap

    class ChunkDocs:
        def eval(self, doc_id, text):
            if text is None:
                return
            words = re.split(r"\s+", text.strip())
            for chunk_id, start in enumerate(range(0, len(words), step)):
                piece = words[start : start + chunk_words]
                yield doc_id, chunk_id, len(piece), " ".join(piece)

    spark = documents.sparkSession
    fn = udtf(ChunkDocs, returnType=_CHUNK_SCHEMA)
    spark.udtf.register("chunk_docs", fn)
    documents.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).createOrReplaceTempView(
        "_chunk_docs_in"
    )
    return spark.sql(
        "SELECT c.* FROM _chunk_docs_in, LATERAL chunk_docs(doc_id, text) c"
    )


def vocab_with_ids(
    documents: DataFrame,
    *,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-vocabulary construction with CONTIGUOUS dense ids:
    count whitespace tokens corpus-wide, keep those with
    ``cnt >= min_count``, and assign ``token_id`` 1..V ordered by
    (count desc, token asc) — the conventional frequency-ranked vocab
    layout every tokenizer trainer emits.

    Scale shape — global ranking with NO single-partition window: the
    obvious ``row_number() over (order by cnt desc, token)`` funnels
    the whole vocabulary through one task. Instead rank two-phase, the
    same prefix-sum scheme as ``sampling.shuffle_order``: partition the
    vocab by (cnt, first-char) — the first char sub-buckets the huge
    Zipf-tail count groups (cnt=1 holds most of a real vocab, so
    bucketing by cnt alone would re-create the skew) — rank within each
    sub-bucket in parallel, and add the sub-bucket's global offset, a
    prefix sum over the tiny (distinct-counts x alphabet) histogram
    broadcast back. Because first-char order IS token order within a
    count group, offset + within-rank reproduces the exact global
    row_number at the cost of one keyed shuffle + one broadcast join."""
    toks = documents.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("token")
    ).filter(F.length("token") > 0)
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .withColumn("__pfx", F.substring("token", 1, 1))
    )
    within = F.row_number().over(
        Window.partitionBy("cnt", "__pfx").orderBy("token")
    )
    ranked = counts.withColumn("__within", within)
    hist = counts.groupBy("cnt", "__pfx").agg(F.count(F.lit(1)).alias("__n"))
    offsets = hist.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy(F.col("cnt").desc(), F.col("__pfx")).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("cnt", "__pfx", "__offset")
    return (
        ranked.join(F.broadcast(offsets), ["cnt", "__pfx"])
        .select(
            "token",
            "cnt",
            (F.col("__offset") + F.col("__within")).cast("int").alias("token_id"),
        )
        .orderBy("token_id")
    )


def token_entropy(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    a standard corpus-quality signal: near-zero entropy flags
    degenerate/repetitive text, unusually high entropy flags noise.

    One explode + one keyed shuffle on (doc, token), then a per-doc
    fold: entropy = ln(N) - sum(c*ln(c))/N over token counts c. That
    algebraic form needs only sum(c*ln(c)) and N as aggregates, so the
    whole computation is two partial-aggregable group-bys — no
    collect_list of per-doc distributions, bounded state per key."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    per_token = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_token.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c") * F.log("c")).alias("__clnc"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(
                F.log("n_tokens") - F.col("__clnc") / F.col("n_tokens") + 1e-9, 4
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


def bigram_lm_score(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram language-model cross-entropy — the
    statistical-LM quality filter (the perplexity-style signal corpus
    pipelines use to rank documents before training).

    The corpus itself is the model: p(w2|w1) = c(w1 w2) / c(w1·),
    where c(w1·) counts w1 as a bigram PREFIX (so the conditional
    sums to 1 exactly, with no end-of-doc mass leak). Per doc:
    cross_entropy = -avg(ln p) over its bigrams; lower = more typical
    of the corpus, higher = outlier/noise.

    Plan shape (the 100 TB path):
      1. map: explode each doc into (doc_id, w1, bigram) rows
      2. two partial+final hash aggs build the model tables:
         c(bigram) and c(prefix) — both Zipf-vocabulary-sized,
         tiny next to the corpus
      3. join the exploded stream against both count tables (bigram
         key, then prefix key). After a min-count vocabulary cut the
         model tables broadcast; un-cut they are AQE-planned shuffle
         joins on vocabulary keys, never on doc ids
      4. one keyed agg back to doc granularity

    The exploded stream is consumed twice (model build + scoring), so
    at scale materialize the model tables to parquet once per corpus
    snapshot and score incrementally against them.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")),
    )
    exploded = (
        documents.filter(F.size(toks) >= 2)
        .select(F.col(id_col).alias("doc_id"), F.explode(bigrams).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
    )
    bg_counts = exploded.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    prefix_counts = exploded.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    scored = (
        exploded.join(bg_counts, "bg")
        .join(prefix_counts, "w1")
        .select("doc_id", (F.log("c_bg") - F.log("c_w1")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("__slp"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(-F.col("__slp") / F.col("n_bigrams") + 1e-9, 4).alias(
                "cross_entropy"
            ),
        )
        .orderBy("doc_id")
    )


#: markup/entity cleaning table (deterministic, engine-portable)
_HTML_TAG = "<[^>]+>"


def clean_text(
    documents: DataFrame,
    *,
    min_line_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style corpus cleaning: strip HTML markup, unescape the basic
    entities, drop boilerplate lines shorter than ``min_line_words``
    words, and normalize whitespace — the standard pre-tokenization
    scrub, entirely in JVM expressions (one map stage, no shuffle).

    Line filtering is the load-bearing part (C4 drops ~66% of raw web
    text this way): short lines are nav/menu/footer boilerplate with
    outsized repetition; dropping them BEFORE dedup keeps MinHash from
    clustering unrelated pages on shared chrome.

    Reports before/after char counts and kept/dropped line counts per
    doc — the audit trail a cleaning pass needs to be tunable.
    """
    raw = F.col(text_col)
    detagged = F.regexp_replace(raw, _HTML_TAG, " ")
    unescaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(detagged, "&amp;", "&"), "&lt;", "<"
        ),
        "&gt;",
        ">",
    )
    lines = F.split(unescaped, "\n")
    is_kept = (
        lambda ln: (F.length(F.trim(ln)) > 0)
        & (F.size(F.split(F.trim(ln), "\\s+")) >= min_line_words)
    )
    kept = F.filter(lines, is_kept)
    cleaned = F.trim(
        F.regexp_replace(F.array_join(kept, "\n"), "[ \\t]+", " ")
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.length(raw).alias("n_chars_raw"),
        F.length(cleaned).alias("n_chars_clean"),
        F.size(kept).alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).alias("n_lines_dropped"),
        cleaned.alias("clean_text"),
    )


def scrub_boilerplate(
    documents: DataFrame,
    *,
    chunk_words: int = 10,
    df_threshold: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate removal WITH document reassembly — the
    C4/RefinedWeb "remove repeated lines, keep the document" operation
    that ``passage_dedup`` only reports on.  Each document is split into
    fixed ``chunk_words``-word passages; any passage appearing in
    ``df_threshold``-or-more DISTINCT documents is boilerplate
    (navigation chrome, license headers, templated footers) and is
    dropped from every document, which is then reassembled from its
    surviving passages in original order.

    Scale shape: passages explode map-side inside the scan stage
    (split → sequence → slice, no UDF); the boilerplate table is ONE
    hash-agg on the passage key and is vocabulary-sized (high-df strings
    only, further shrunk by the >= threshold filter), so AQE broadcasts
    it in the flag join.  Reassembly is a single group-by on doc_id
    whose ``collect_list`` state is bounded by the document's own
    length — the same bound as holding the document row itself.  No
    document text ever shuffles twice: the passage join carries
    (doc_id, pos, passage) and the rebuild groups once.
    """
    from flink_elasticsearch_ingestion_spark.operators.util import ensure_parallelism

    from flink_elasticsearch_ingestion_spark.operators.util import bind_once

    documents = ensure_parallelism(documents.filter(F.trim(F.col(text_col)) != ""))
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    chunks = bind_once(
        toks,
        lambda t: F.transform(
            F.sequence(
                F.lit(0), F.ceil(F.size(t) / F.lit(chunk_words)).cast("int") - 1
            ),
            lambda i: F.array_join(F.slice(t, i * chunk_words + 1, chunk_words), " "),
        ),
    )
    exploded = documents.select(
        "doc_id", F.posexplode(chunks).alias("pos", "passage")
    )
    boiler = (
        exploded.groupBy("passage")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= df_threshold)
        .select("passage", F.lit(True).alias("is_boiler"))
    )
    flagged = exploded.join(F.broadcast(boiler), "passage", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.count(F.when(F.col("is_boiler"), 1)).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.coalesce(F.col("is_boiler"), F.lit(False)),
                                F.struct(F.col("pos"), F.col("passage")),
                            )
                        )
                    ),
                    lambda s: s.passage,
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dropped",
            F.length("clean_text").alias("n_chars_clean"),
            F.md5("clean_text").alias("clean_sha"),
        )
        .orderBy("doc_id")
    )


def inverted_index(
    documents: DataFrame,
    *,
    min_token_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Build the postings table of a full-text inverted index:
    ``(term, doc_id, tf)`` — the serving structure behind BM25 / keyword
    retrieval (the batch analog of the reference's Elasticsearch index;
    core.clj ships documents INTO such an index, this builds one from
    the corpus directly).

    Shuffle profile at 100 TB: tokens explode map-side inside the scan
    stage; ONE hash aggregation on (term, doc_id) — partial map-side
    combine collapses within-document repeats before the shuffle, so
    the shuffled stream is bounded by distinct (term, doc) pairs, not
    token occurrences.  Write the result partitioned/bucketed by term
    and every query-time postings lookup becomes a partition-pruned
    read; no corpus re-scan per query.
    """
    from flink_elasticsearch_ingestion_spark.operators.util import ensure_parallelism

    documents = ensure_parallelism(documents)
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("term"),
    ).filter(F.length("term") >= min_token_len)
    return toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def term_statistics(
    documents: DataFrame,
    *,
    k: int = 20,
    min_token_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dictionary head of the inverted index: per-term document
    frequency, collection frequency, and max within-doc tf for the
    ``k`` highest-df terms.  The dictionary is vocabulary-sized — the
    second aggregation runs over the (term, doc) postings table from
    ``inverted_index``, never the raw token stream, and the final
    top-k is a ``TakeOrderedAndProject`` (no global sort).

    Ties on df break ascending on the term so both engines rank
    identically.
    """
    postings = inverted_index(
        documents, min_token_len=min_token_len, id_col=id_col, text_col=text_col
    )
    return (
        postings.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
            F.max("tf").cast("bigint").alias("max_tf"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(k)
    )


def bm25_search(
    documents: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Spärck Jones; the Lucene/
    Elasticsearch ``idf = ln(1 + (N - df + .5)/(df + .5))`` variant —
    the exact scorer the reference's target system runs server-side,
    re-expressed as two Spark passes).

    Pass 1 aggregates the corpus statistics the scorer needs — N,
    avgdl, and df per QUERY term only — into a single broadcastable
    row: per-term tf is a higher-order ``filter`` over the token array
    (no explode, no vocabulary shuffle — the query has |Q| terms, not
    the corpus's vocabulary).  Pass 2 re-derives per-doc tf and doclen
    in the scan stage, applies the closed-form score as pure JVM
    expressions, and reduces with ``TakeOrderedAndProject``.  For
    arbitrary ad-hoc queries at 100 TB, materialize ``inverted_index``
    once (bucketed by term) and score from postings instead; this
    2-scan form is the index-free batch scorer.

    Scores round to 6 dp with doc_id tie-break so ranking is stable
    across engines; the term sum folds left-to-right in query order so
    IEEE addition order matches the oracle exactly.
    """
    from flink_elasticsearch_ingestion_spark.operators.util import ensure_parallelism

    documents = ensure_parallelism(documents)
    terms = [t.lower() for t in query_terms]
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")

    # single-arg closure: a 2-arg lambda would be treated by F.filter
    # as the (element, index) form and bind the index as the term
    def _is(term: str):
        return lambda x: x == F.lit(term)

    feat = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("doclen"),
        *[F.size(F.filter(toks, _is(t))).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = feat.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("doclen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).cast("double").alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = feat.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}").cast("double")
        norm = tf + k1 * (1.0 - b + b * F.col("doclen") / F.col("avgdl"))
        score = score + idf * (tf * (k1 + 1.0)) / norm
    return (
        scored.select(
            "doc_id",
            "doclen",
            F.round(score + 1e-9, 6).alias("bm25"),
        )
        .filter(F.col("bm25") > 0.0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def gopher_quality(
    documents: DataFrame,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, App. A):
    word-count band, mean word length band, symbol-to-word ratio,
    bullet-/ellipsis-line fractions, alphabetic-word fraction, and a
    minimum of distinct required stopwords.  Every rule is a JVM
    higher-order-function expression over ONE tokenization — a pure
    map stage (no shuffle, no Python), so at 100 TB this is a
    full-corpus filter at scan speed with the filter decision AND the
    per-rule evidence kept for auditability.
    """
    words = tokens(text_col)
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wlen = (
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
        ).cast("double")
        / nw
    )
    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("#|\\.\\.\\."), 0)
    )
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(
            F.filter(lines, lambda ln: F.trim(ln).rlike("^[-*•]"))
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda ln: F.trim(ln).rlike("\\.\\.\\.$"))).cast(
            "double"
        )
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("double") / nw
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
        )
    )
    m = {
        "n_words": n_words,
        "mean_word_len": F.round(mean_wlen + 1e-9, 6),
        "symbol_ratio": F.round(n_symbols / nw + 1e-9, 6),
        "bullet_line_frac": F.round(bullet_frac + 1e-9, 6),
        "ellipsis_line_frac": F.round(ellipsis_frac + 1e-9, 6),
        "alpha_word_frac": F.round(alpha_frac + 1e-9, 6),
        "stop_hits": stop_hits,
    }
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wlen >= min_mean_word_len)
        & (mean_wlen <= max_mean_word_len)
        & (n_symbols / nw < max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(k) for k, c in m.items()],
        passes.alias("passes_gopher"),
    )


def feature_hashing(
    documents: DataFrame,
    *,
    dims: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick bag-of-words vectorization (Weinberger et al.
    2009): each token hashes to one of ``dims`` buckets and the
    document vector is the bucket-count histogram — the vocabulary-free
    featurizer (no dictionary build, no second pass, vectors fixed
    width no matter the corpus), which is exactly what makes it the
    100 TB featurization default.

    Shape: pure map stage, zero shuffles.  Token buckets are
    materialized behind a column boundary first (the HOF-lambda
    lesson: inlined, the md5 pass would re-run once per output
    dimension); each dimension is then a codegen integer count over
    the bucket array.  Hashes are the engine-portable md5 family, so
    an independent SQL engine re-derives every vector."""
    from flink_elasticsearch_ingestion_spark.operators.dedup import (
        MERSENNE31,
        portable_hash31,
    )

    toks = tokens(text_col)
    buckets = F.transform(
        toks,
        lambda t: portable_hash31(F.concat(F.lit("fh:"), t)) % F.lit(dims),
    )
    staged = documents.select(F.col(id_col).alias("doc_id"), buckets.alias("__b"))
    return staged.select(
        "doc_id",
        *[
            F.size(F.filter(F.col("__b"), lambda b: b == F.lit(j))).alias(f"f{j}")
            for j in range(dims)
        ],
    ).orderBy("doc_id")


def bpe_pair_counts(
    documents: DataFrame,
    *,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The distributed inner loop of BPE tokenizer training (Sennrich
    et al. 2016): corpus-weighted adjacent-symbol-pair frequencies over
    the word vocabulary.  Each training iteration picks the top pair,
    merges it, and recounts — the recount is THIS operator; the merge
    loop is driver-side control flow around it (one 1-row argmax per
    iteration, like IVF's training loop).

    Scale shape: the word VOCABULARY (not the corpus) carries the
    symbol work — one corpus shuffle to count words, then char-pair
    fan-out on the vocabulary-sized table, one pair shuffle weighted
    by word frequency.  At 100 TB the vocabulary is millions of rows
    while the corpus is billions, so counting words first is the
    difference between feasible and not."""
    toks = tokens(text_col)
    words = (
        documents.select(F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    chars = F.split(F.col("w"), "")
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(chars) - F.lit(1), F.lit(1))),
        lambda i: F.concat(
            F.element_at(chars, i), F.lit(" "), F.element_at(chars, i + F.lit(1))
        ),
    )
    staged = words.filter(F.length("w") >= 2).select(
        "wc", F.explode(pairs).alias("pair")
    )
    return (
        staged.groupBy("pair")
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(k)
    )


def bpe_merge_fold(syms: F.Column, a: str, b: str) -> F.Column:
    """ONE greedy left-to-right BPE merge pass over a symbol array as a
    pure JVM fold: accumulator = (result array, pending symbol); the
    pending symbol merges with the next when they form (a, b), else
    flushes.  Symbols are bound as ``F.lit`` columns, NOT spliced into
    an SQL string — learned symbols from arbitrary corpora may contain
    quotes/backslashes, whose repr() form only parses under specific
    literal/escape parser modes.  Shared by the trainer (``bpe_train``)
    and the encoder (``bpe_encode``) so both apply IDENTICAL merge
    semantics."""
    ab = a + b

    def _step(acc, s):
        take_pending = F.struct(acc["res"].alias("res"), s.alias("pend"))
        do_merge = F.struct(
            F.array_append(acc["res"], F.lit(ab)).alias("res"),
            F.lit(None).cast("string").alias("pend"),
        )
        flush_pending = F.struct(
            F.array_append(acc["res"], acc["pend"]).alias("res"),
            s.alias("pend"),
        )
        return F.when(acc["pend"].isNull(), take_pending).otherwise(
            F.when((acc["pend"] == F.lit(a)) & (s == F.lit(b)), do_merge).otherwise(
                flush_pending
            )
        )

    return F.aggregate(
        syms,
        F.struct(
            F.expr("CAST(array() AS ARRAY<STRING>)").alias("res"),
            F.lit(None).cast("string").alias("pend"),
        ),
        _step,
        lambda acc: F.when(acc["pend"].isNull(), acc["res"]).otherwise(
            F.array_append(acc["res"], acc["pend"])
        ),
    )


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a BPE merge table to every document — the INFERENCE half
    of the tokenizer (``bpe_train`` is the trainer): word -> character
    symbols -> each merge applied in rank order via the shared
    ``bpe_merge_fold``.  Returns per-document token/symbol counts, the
    compression ratio, and the full encoded symbol stream (symbols
    comma-joined within a word, words space-joined in document order) —
    lossless: the original text is the stream with separators dropped.

    Scale shape: merges fold over the DISTINCT-WORD vocabulary (the
    chained per-merge passes are vocabulary-sized expressions in ONE
    plan — no driver loop, no iteration over the corpus), and the only
    fact-sized work is the token join + per-doc ordered re-collect,
    the same single-shuffle encode shape as ``q_training_batches``.
    """
    toks = documents.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "token"),
    ).filter(F.col("token") != "")
    vocab = toks.select("token").distinct()
    syms = F.split(F.col("token"), "")
    for a, b in merges:
        syms = bpe_merge_fold(syms, a, b)
    encoded_vocab = vocab.select(
        "token",
        F.size(syms).alias("n_syms"),
        F.array_join(syms, ",").alias("syms_csv"),
    )
    return (
        toks.join(encoded_vocab, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_syms").alias("n_symbols"),
            F.round(
                F.sum("n_syms") / F.count(F.lit(1)) + 1e-9, 4
            ).alias("symbols_per_token"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms_csv"))),
                    lambda s: s["syms_csv"],
                ),
                " ",
            ).alias("encoded"),
        )
        .orderBy(id_col)
    )


def bpe_train(
    documents: DataFrame,
    *,
    n_merges: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016): the
    driver loop around ``bpe_pair_counts``'s recount — each iteration
    takes the corpus-weighted argmax pair (ONE 1-row driver action,
    like IVF's training loop), applies the merge to the vocabulary's
    symbol sequences, and recounts.  Returns the learned merge table
    (rank, pair, pair_count) — the tokenizer artifact.

    The merge application is a pure JVM fold: a left-to-right
    ``aggregate`` over each word's symbol array with a
    (result, pending) struct accumulator — pending symbol merges with
    the next when they form the chosen pair, else flushes. All work is
    vocabulary-sized after the single corpus word-count shuffle.
    """
    spark = documents.sparkSession
    toks = tokens(text_col)
    words = (
        documents.select(F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    cur = words.select("wc", F.split("w", "").alias("syms")).persist()
    merges: list[tuple[int, str, int]] = []
    try:
        for r in range(n_merges):
            pair_col = F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("syms") - F.lit(1), F.lit(1))
                ),
                lambda i: F.concat(
                    F.element_at("syms", i),
                    F.lit(" "),
                    F.element_at("syms", i + F.lit(1)),
                ),
            )
            top = (
                cur.filter(F.size("syms") >= 2)
                .select("wc", F.explode(pair_col).alias("pair"))
                .groupBy("pair")
                .agg(F.sum("wc").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "pair")
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["pair"].split(" ")
            merges.append((r, top[0]["pair"], int(top[0]["cnt"])))
            merged = bpe_merge_fold(F.col("syms"), a, b)
            nxt = cur.select("wc", merged.alias("syms")).persist()
            nxt.count()  # materialize before releasing the parent
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        merges, "rank int, pair string, pair_count long"
    )


#: symbol-boundary sentinels for the SQL-replayable BPE state encoding
#: (bpe_train_fixed): every symbol is wrapped \x01<sym>\x02, so a merge
#: is ONE literal string replace whose pattern can only match two
#: complete adjacent symbols — never a symbol prefix/suffix. \x01/\x02
#: cannot occur in whitespace-split word text.
_BPE_S, _BPE_E = "\x01", "\x02"


def bpe_train_fixed(
    documents: DataFrame,
    *,
    n_merges: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Fixed-iteration BPE trainer with a fully SQL-replayable state —
    the hash-oracle twin of ``bpe_train`` (VERDICT r9 #6: the loop was
    rows-only because the (result, pending) struct fold has no DuckDB
    expression; this variant makes the merge itself engine-portable).

    State: each word's symbol sequence is ONE string with every symbol
    wrapped in \\x01..\\x02 sentinels.  A greedy left-to-right
    non-overlapping BPE merge of (a, b) is then EXACTLY a literal
    ``replace(state, \\x01a\\x02\\x01b\\x02, \\x01ab\\x02)`` — both
    engines' ``replace`` scan left-to-right, consume the replacement,
    and continue after it, which is the (result, pending) fold's
    semantics (a freshly merged symbol never re-merges with the next
    symbol in the same pass; parity with ``bpe_merge_fold`` is
    unit-pinned).  The sentinels make cross-symbol false matches
    impossible: a pattern must cover two complete adjacent symbols.

    Same scale shape as ``bpe_train``: one corpus word-count shuffle,
    then every pass is vocabulary-sized (pair recount + argmax — one
    1-row driver action per iteration — + one map-side replace).
    Returns (rank, pair, pair_count), the learned merge table."""
    spark = documents.sparkSession
    toks = tokens(text_col)
    words = (
        documents.select(F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    enc0 = F.concat(
        F.lit(_BPE_S),
        F.array_join(F.split("w", ""), _BPE_E + _BPE_S),
        F.lit(_BPE_E),
    )
    cur = words.select("wc", enc0.alias("enc")).persist()
    merges: list[tuple[int, str, int]] = []
    try:
        for r in range(n_merges):
            syms = F.split(
                F.col("enc").substr(F.lit(2), F.length("enc") - 2),
                _BPE_E + _BPE_S,
            )
            pair_col = F.transform(
                F.sequence(F.lit(1), F.size(syms) - F.lit(1)),
                lambda i: F.concat(
                    F.element_at(syms, i),
                    F.lit(" "),
                    F.element_at(syms, i + F.lit(1)),
                ),
            )
            top = (
                cur.filter(F.size(syms) >= 2)
                .select("wc", F.explode(pair_col).alias("pair"))
                .groupBy("pair")
                .agg(F.sum("wc").alias("cnt"))
                .orderBy(F.col("cnt").desc(), "pair")
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["pair"].split(" ")
            merges.append((r, top[0]["pair"], int(top[0]["cnt"])))
            merged = F.replace(
                F.col("enc"),
                F.lit(_BPE_S + a + _BPE_E + _BPE_S + b + _BPE_E),
                F.lit(_BPE_S + a + b + _BPE_E),
            )
            nxt = cur.select("wc", merged.alias("enc")).persist()
            nxt.count()  # materialize before releasing the parent
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        merges, "rank int, pair string, pair_count long"
    )


def context_window_fit(
    documents: DataFrame,
    *,
    sizes: tuple[int, ...] = (8, 16, 32, 64, 128),
    text_col: str = "text",
) -> DataFrame:
    """Context-window budget curve: for each candidate sequence length,
    what share of DOCUMENTS fits whole, what share of TOKEN MASS lives
    in those fitting documents, and what share survives if every
    document is clipped at the window — the three numbers behind
    choosing a training context length (and the truncation-waste bill
    of choosing it too small).

    Scale shape: ONE map-side token count + ONE aggregate row holding
    3 x |sizes| conditional sums (no per-size fan-out of the corpus,
    no grid join), inlined to |sizes| rows at the end. Shares divide
    exact integer sums, so the cross-engine hash is stable."""
    per = documents.select(token_count(text_col).alias("nt"))
    aggs = [
        F.count(F.lit(1)).alias("nd"),
        F.sum("nt").alias("tt"),
    ]
    for c in sizes:
        fit = F.col("nt") <= c
        aggs += [
            F.sum(F.when(fit, 1).otherwise(0)).alias(f"f{c}"),
            F.sum(F.when(fit, F.col("nt")).otherwise(0)).alias(f"m{c}"),
            F.sum(F.least(F.col("nt"), F.lit(c))).alias(f"l{c}"),
        ]
    one = per.agg(*aggs)
    rows = F.inline(
        F.array(
            *[
                F.struct(
                    F.lit(int(c)).alias("context_size"),
                    F.col(f"f{c}").cast("bigint").alias("n_docs_fit"),
                    F.round(F.col(f"f{c}") / F.col("nd") + 1e-9, 6).alias(
                        "doc_fit_share"
                    ),
                    F.round(F.col(f"m{c}") / F.col("tt") + 1e-9, 6).alias(
                        "token_fit_share"
                    ),
                    F.round(F.col(f"l{c}") / F.col("tt") + 1e-9, 6).alias(
                        "clipped_token_share"
                    ),
                )
                for c in sizes
            ]
        )
    )
    return one.select(rows).orderBy("context_size")


def token_burstiness(
    documents: DataFrame,
    *,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Token burstiness (Church & Gale 1995): for the top-``k`` corpus
    tokens, the variance-to-mean ratio of their per-document counts
    over the documents that contain them. VMR ~ 1 is Poisson
    (function-word-like scatter); VMR >> 1 is bursty (topical words
    concentrate in few documents) — the dispersion signal behind
    stop-lists, df-caps, and TF saturation constants (BM25's k1).

    Scale shape: one (doc, token) count aggregate (map-side combine),
    one per-token moment aggregate (sum, sum of squares — exact BIGINT
    arithmetic until the final division), TakeOrdered top-k. The
    population variance comes from integer moments, so both engines
    round the same doubles."""
    toks = tokens(text_col)
    per_doc = (
        documents.select(
            F.col("doc_id"), F.explode(toks).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    moments = per_doc.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    mean = F.col("s1") / F.col("df")
    var = F.col("s2") / F.col("df") - mean * mean
    return (
        moments.select(
            F.col("w").alias("token"),
            F.col("df").cast("bigint").alias("df"),
            F.col("s1").cast("bigint").alias("total_count"),
            F.round(var / mean + 1e-9, 6).alias("vmr"),
        )
        .orderBy(F.col("total_count").desc(), "token")
        .limit(k)
    )


def bigram_pmi(
    documents: DataFrame,
    *,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining: top-k word bigrams by pointwise mutual
    information, ``PMI = ln(c_ab * N / (c_a * c_b))`` with ``N`` the
    corpus token count — the statistic separating true collocations
    ("new york") from merely-frequent pairs ("of the"), used for
    tokenizer seeding and phrase-aware dedup.  ``min_count`` floors
    the bigram count so rare one-off pairs (whose PMI is inflated by
    tiny denominators) never crowd the list.

    Scale shape: one unigram aggregate and one bigram aggregate over
    the same map-side fan-out (two vocabulary-sized tables), the
    bigram frame joined to unigram counts on its two word keys, the
    1-row corpus total as a broadcast scalar, TakeOrdered top-k.  The
    fact shuffles twice (unigram + bigram keys) and nothing else.
    """
    from flink_elasticsearch_ingestion_spark.operators.util import (
        ensure_parallelism,
    )

    documents = ensure_parallelism(documents)
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    words = documents.select(F.explode(toks).alias("w")).filter(F.col("w") != "")
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = uni.agg(F.sum("c").alias("n_tokens"))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bi = (
        documents.filter(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    parts = F.split(F.col("bigram"), " ")
    bi = bi.select(
        "bigram",
        "c_ab",
        F.element_at(parts, 1).alias("w1"),
        F.element_at(parts, 2).alias("w2"),
    )
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.log(
        F.col("c_ab").cast("double")
        * F.col("n_tokens")
        / (F.col("c_a").cast("double") * F.col("c_b"))
    )
    return (
        bi.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            "c_ab",
            "c_a",
            "c_b",
            F.round(pmi + 1e-9, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(k)
    )


def score_normalize_by_source(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source score normalization: each document's quality signal
    (token entropy here) mapped to its PERCENTILE within its own
    source — the step that makes one quality threshold meaningful
    across heterogeneous sources (a raw-score cutoff tuned on web text
    silently rejects most of a code or forum source whose score
    distribution sits elsewhere; percentile cutoffs don't).

    Ties break on ``id_col`` before ``percent_rank`` so both engines
    produce identical ranks.  The window partitions by source (sources
    rank in parallel); a single source too large for one task takes
    the ``equi_depth_buckets`` two-phase route instead — documented
    trade, same as ``stratified_exact_k``.
    """
    ent = token_entropy(documents, id_col=id_col, text_col=text_col).select(
        id_col, "entropy"
    )
    src = documents.select(id_col, source_col)
    w = Window.partitionBy(source_col).orderBy("entropy", id_col)
    return (
        ent.join(src, id_col)
        .select(
            id_col,
            source_col,
            "entropy",
            F.round(F.percent_rank().over(w) + 1e-9, 6).alias("source_pctile"),
        )
        .orderBy(source_col, id_col)
    )


def winnowing_fingerprints(
    documents: DataFrame,
    *,
    gram_k: int = 3,
    window_w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    rolling-hash scheme): hash every ``gram_k``-token gram, then keep
    the MINIMUM hash of each ``window_w``-length sliding window of
    gram hashes.  The guarantee that makes winnowing the standard
    local fingerprint: any shared run of at least
    ``window_w + gram_k - 1`` tokens between two documents is certain
    to contribute at least one common fingerprint — position-robust
    detection at a tunable ~2/(w+1) density, far sparser than storing
    every gram (MinHash summarizes GLOBAL set similarity; winnowing
    localizes WHERE overlap can be found — the complement).

    Emits the per-document fingerprint summary (gram count, selected
    fingerprint count, min/max fingerprint, density).  Only distinct
    fingerprint VALUES are kept, so the original algorithm's
    positional tie-break rule is irrelevant here and both engines
    agree exactly.  Pure map-side expression tree with every
    intermediate bound once per row (``bind_once`` — tokens, gram
    hashes, and window minima never re-evaluate per element); zero
    shuffles.  The fingerprint inverted index composes with
    ``passage_dedup``'s group-by when cross-doc posting lists are
    needed.
    """
    from flink_elasticsearch_ingestion_spark.operators.dedup import (
        portable_hash31,
    )
    from flink_elasticsearch_ingestion_spark.operators.util import bind_once

    empty = "CAST(array() AS ARRAY<BIGINT>)"

    def from_toks(toks):
        grams = F.when(
            F.size(toks) >= gram_k,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(gram_k - 1)),
                lambda i: portable_hash31(
                    F.concat_ws(" ", F.slice(toks, i, gram_k))
                ),
            ),
        ).otherwise(F.expr(empty))

        def from_grams(g):
            fps = F.array_distinct(
                F.when(
                    F.size(g) >= window_w,
                    F.transform(
                        F.sequence(F.lit(1), F.size(g) - F.lit(window_w - 1)),
                        lambda j: F.array_min(F.slice(g, j, window_w)),
                    ),
                ).otherwise(g)
            )

            def from_fps(f):
                return F.struct(
                    F.size(g).alias("n_grams"),
                    F.size(f).alias("n_fps"),
                    F.array_min(f).alias("fp_min"),
                    F.array_max(f).alias("fp_max"),
                    F.round(
                        F.size(f) / F.greatest(F.size(g), F.lit(1)) + 1e-9, 6
                    ).alias("density"),
                )

            return bind_once(fps, from_fps)

        return bind_once(grams, from_grams)

    summary = bind_once(F.split(F.trim(F.col(text_col)), "\\s+"), from_toks)
    return documents.select(
        F.col(id_col), summary.alias("__s")
    ).select(
        id_col,
        F.col("__s.n_grams").alias("n_grams"),
        F.col("__s.n_fps").alias("n_fps"),
        F.col("__s.fp_min").alias("fp_min"),
        F.col("__s.fp_max").alias("fp_max"),
        F.col("__s.density").alias("density"),
    ).orderBy(id_col)


def source_similarity(
    documents: DataFrame,
    *,
    dims: int = 32,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus cartography: pairwise cosine similarity between SOURCES
    over their hashed bag-of-words distributions — the overview query
    behind mixing decisions ("these two crawls are near-identical,
    down-weight one") and contamination triage ("why does source X
    look like the eval set").

    Scale shape: token -> md5 bucket map-side (the ``feature_hashing``
    trick, vocabulary-free), ONE (source, bucket) count aggregate
    (<= |sources| * dims rows), then pairwise cosine over the tiny
    per-source vectors — the pair join is quadratic only in SOURCE
    count, the same bounded combinatorics as ``kmv_overlap``'s sketch
    comparison.  Engine-portable hashes keep every vector and cosine
    DuckDB-derivable.
    """
    from flink_elasticsearch_ingestion_spark.operators.dedup import (
        MERSENNE31,
        portable_hash31,
    )
    from flink_elasticsearch_ingestion_spark.operators.util import (
        bind_once,
        ensure_parallelism,
    )

    documents = ensure_parallelism(documents)
    toks = tokens(text_col)
    bucket = lambda t: portable_hash31(t) % F.lit(dims)  # noqa: E731
    words = documents.select(
        F.col(source_col).alias("src"),
        F.explode(toks).alias("t"),
    ).filter(F.col("t") != "")
    counts = (
        words.select("src", bucket(F.col("t")).alias("b"))
        .groupBy("src", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # the bucket->count map materializes ONCE per source behind the
    # aggregation boundary; the dense vector is then a cheap per-dim
    # lookup over the attribute (never a per-element map rebuild)
    maps = counts.groupBy("src").agg(
        F.map_from_arrays(
            F.collect_list("b"), F.collect_list("c")
        ).alias("m")
    )
    vecs = maps.select(
        "src",
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda d: F.coalesce(
                F.element_at(F.col("m"), d.cast("bigint")), F.lit(0)
            ).cast("double"),
        ).alias("v"),
    )
    a = vecs.select(F.col("src").alias("src_a"), F.col("v").alias("va"))
    b = vecs.select(F.col("src").alias("src_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.round(
                dot / (nrm(F.col("va")) * nrm(F.col("vb"))) + 1e-9, 6
            ).alias("cosine"),
        )
        .orderBy("src_a", "src_b")
    )


def chi2_terms(
    documents: DataFrame,
    *,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 5,
    top_k: int = 10,
) -> DataFrame:
    """Chi-square term-class association: the classic feature-selection
    / domain-term-mining statistic.  For each (term, class) the 2x2
    document-presence contingency (a = class docs with term, b = other
    docs with term, c = class docs without, d = rest) scores

        chi2 = N * (a*d - b*c)^2 / ((a+b)(c+d)(a+c)(b+d))

    and the ``top_k`` terms per class (by rounded chi2 desc, then term
    asc — the rounding makes the cut engine-portable) are returned.

    Scale shape: one distinct (doc, term) projection, one vocab-keyed
    agg per class (both Zipf-bounded), then a per-class window over
    VOCABULARY-sized partitions — never over the corpus.  The products
    are computed in double so the statistic cannot overflow at
    petabyte document counts.
    """
    toks = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.col(class_col).alias("cls"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    n_docs = documents.select(id_col).distinct().count()  # scalar
    cls_docs = (
        documents.select(
            F.col(id_col).alias("doc_id"), F.col(class_col).alias("cls")
        )
        .distinct()
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n_cls"))
    )
    present = toks.groupBy("term", "cls").agg(
        F.count(F.lit(1)).alias("a_raw")
    )
    term_tot = present.groupBy("term").agg(F.sum("a_raw").alias("df_term"))
    # full vocab x class grid: a = 0 cells carry the perfect-NEGATIVE
    # associations (a term that never occurs in a class is just as
    # informative as one that always does).  The class table is tiny
    # (bounded label cardinality), so the grid is one broadcast
    # cross-expansion of the vocabulary, not a data-sized product.
    term_cls = (
        term_tot.crossJoin(F.broadcast(cls_docs.select("cls")))
        .join(present, ["term", "cls"], "left")
        .select(
            "term",
            "cls",
            "df_term",
            F.coalesce("a_raw", F.lit(0)).alias("a"),
        )
    )
    nd = float(n_docs)
    # a*d - b*c squared via self-multiplication (NOT pow: libm pow is
    # not ulp-identical across engines; x*x is)
    ad_bc = F.col("a").cast("double") * (
        F.lit(nd) - F.col("n_cls") - (F.col("df_term") - F.col("a"))
    ) - (F.col("df_term") - F.col("a")).cast("double") * (
        F.col("n_cls") - F.col("a")
    ).cast("double")
    scored = (
        term_cls.where(F.col("df_term") >= min_doc_freq)
        .join(F.broadcast(cls_docs), "cls")
        .withColumn("ad_bc", ad_bc)
        .select(
            "cls",
            "term",
            F.col("a").cast("bigint").alias("present_in_class"),
            F.col("df_term").cast("bigint").alias("doc_freq"),
            # a term in every doc, or a single-class corpus, has zero
            # discriminative power: chi2 := 0 (denominator degenerates)
            F.when(
                (F.col("df_term") >= F.lit(nd))
                | (F.col("n_cls") >= F.lit(nd)),
                F.lit(0.0),
            )
            .otherwise(
                F.lit(nd)
                * F.col("ad_bc")
                * F.col("ad_bc")
                / (
                    F.col("df_term").cast("double")
                    * (F.lit(nd) - F.col("df_term"))
                    * F.col("n_cls").cast("double")
                    * (F.lit(nd) - F.col("n_cls"))
                )
            )
            .alias("chi2_raw"),
        )
        .withColumn("chi2", F.round(F.col("chi2_raw") + F.lit(1e-9), 6))
    )
    w = Window.partitionBy("cls").orderBy(
        F.col("chi2").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select(
            "cls",
            F.col("rk").cast("int").alias("rk"),
            "term",
            "present_in_class",
            "doc_freq",
            "chi2",
        )
        .orderBy("cls", "rk")
    )


def zipf_fit(
    documents: DataFrame,
    *,
    class_col: str = "lang",
    text_col: str = "text",
    top_n: int = 200,
) -> DataFrame:
    """Zipf's-law fit per class: OLS slope of ln(freq) on ln(rank)
    over the ``top_n`` most frequent terms — the canonical sanity
    check on a corpus's token distribution (natural text ~ -1; spam /
    template floods and tokenizer bugs bend the curve).

    Scale shape: one vocab-keyed agg, a per-class window over the
    vocabulary (never the corpus), then a class-keyed closed-form OLS
    partial+final agg.  Frequency ties rank by term asc so the cut and
    the regressors are engine-deterministic.
    """
    tf = (
        documents.select(
            F.col(class_col).alias("cls"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("cls", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("cls").orderBy(
        F.col("freq").desc(), F.col("term").asc()
    )
    ranked = (
        tf.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            "cls",
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("freq").cast("double")).alias("y"),
        )
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    return (
        ranked.groupBy("cls")
        .agg(
            n.alias("n_terms"),
            sx.alias("sx"),
            sy.alias("sy"),
            sxy.alias("sxy"),
            sxx.alias("sxx"),
        )
        .select(
            "cls",
            F.col("n_terms").cast("bigint").alias("n_terms"),
            F.round(
                (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (
                    F.col("n_terms") * F.col("sxx")
                    - F.col("sx") * F.col("sx")
                )
                + F.lit(1e-9),
                6,
            ).alias("slope"),
            F.round(
                (
                    F.col("sy")
                    - (
                        (
                            F.col("n_terms") * F.col("sxy")
                            - F.col("sx") * F.col("sy")
                        )
                        / (
                            F.col("n_terms") * F.col("sxx")
                            - F.col("sx") * F.col("sx")
                        )
                    )
                    * F.col("sx")
                )
                / F.col("n_terms")
                + F.lit(1e-9),
                6,
            ).alias("intercept"),
        )
        .orderBy("cls")
    )


def quantile_normalize_by_source(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    grid: int = 20,
) -> DataFrame:
    """Quantile normalization across sources (the batch-effect
    correction of bioinformatics, applied to corpus quality scores):
    each document's within-source percentile is mapped onto the
    GLOBAL score distribution, so normalized values are directly
    comparable numbers on one scale — not just comparable ranks.

    Builds on ``score_normalize_by_source`` (per-source percent_rank)
    and adds one 1-row broadcast: the global quantile function
    sampled at ``grid`` + 1 exact quantile_disc points.  The mapped
    value is the global quantile at the document's (floored) grid
    position — a pure map-side array lookup.
    """
    exact = 2147483647
    pct = score_normalize_by_source(
        documents, id_col=id_col, text_col=text_col, source_col=source_col
    )
    qs = [i / grid for i in range(grid + 1)]
    gq = pct.agg(
        F.percentile_approx("entropy", qs, exact).alias("gq")
    )  # 1-row scalar: the global quantile function
    pos = F.floor(F.col("source_pctile") * grid).cast("int")
    return (
        pct.crossJoin(F.broadcast(gq))
        .select(
            id_col,
            source_col,
            "entropy",
            "source_pctile",
            F.round(
                F.element_at(F.col("gq"), pos + 1) + F.lit(1e-9), 6
            ).alias("normalized"),
        )
        .orderBy(source_col, id_col)
    )


def classifier_eval(
    predictions: DataFrame,
    *,
    true_col: str = "lang",
    pred_col: str = "lang_guess",
) -> DataFrame:
    """Multi-class classifier evaluation: per-class precision / recall
    / F1 plus support, from a (true, predicted) label frame — the eval
    loop every model-scored corpus gate needs (here closing the loop
    on the engine's own heuristic language-ID).

    One partial+final agg to the |true x pred| confusion matrix, then
    class-keyed marginals joined back — everything past the first agg
    is label-cardinality-sized.  A ``__MICRO__`` row carries overall
    accuracy (micro-averaged P = R = F1 for single-label tasks).
    """
    cm = predictions.groupBy(
        F.col(true_col).alias("t"), F.col(pred_col).alias("p")
    ).agg(F.count(F.lit(1)).alias("n"))
    tp = cm.where(F.col("t") == F.col("p")).select(
        F.col("t").alias("cls"), F.col("n").alias("tp")
    )
    support = cm.groupBy(F.col("t").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    predicted = cm.groupBy(F.col("p").alias("cls")).agg(
        F.sum("n").alias("n_predicted")
    )
    per_class = (
        support.join(predicted, "cls", "full")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("support", F.lit(0)).cast("bigint").alias("support"),
            F.coalesce("n_predicted", F.lit(0))
            .cast("bigint")
            .alias("n_predicted"),
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
        )
        .withColumn(
            "precision",
            F.when(
                F.col("n_predicted") > 0,
                F.round(
                    F.col("tp") / F.col("n_predicted").cast("double")
                    + F.lit(1e-9),
                    6,
                ),
            ),
        )
        .withColumn(
            "recall",
            F.when(
                F.col("support") > 0,
                F.round(
                    F.col("tp") / F.col("support").cast("double")
                    + F.lit(1e-9),
                    6,
                ),
            ),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                F.round(
                    F.lit(2.0)
                    * F.col("precision")
                    * F.col("recall")
                    / (F.col("precision") + F.col("recall"))
                    + F.lit(1e-9),
                    6,
                ),
            ),
        )
    )
    totals = cm.agg(
        F.sum("n").alias("n_all"),
        F.sum(F.when(F.col("t") == F.col("p"), F.col("n")).otherwise(0)).alias(
            "n_correct"
        ),
    )
    acc = F.round(
        F.col("n_correct") / F.col("n_all").cast("double") + F.lit(1e-9), 6
    )
    micro = totals.select(
        F.lit("__MICRO__").alias("cls"),
        F.col("n_all").cast("bigint").alias("support"),
        F.col("n_all").cast("bigint").alias("n_predicted"),
        F.col("n_correct").cast("bigint").alias("tp"),
        acc.alias("precision"),
        acc.alias("recall"),
        acc.alias("f1"),
    )
    return per_class.unionByName(micro).orderBy("cls")


def span_corruption(
    documents: DataFrame,
    *,
    start_rate: int = 20,
    span_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "t5",
) -> DataFrame:
    """T5-style span-corruption data prep (the denoising objective's
    input/target pair): deterministic hash-seeded mask spans — a token
    position STARTS a span when ``portable_hash(doc, pos) %
    start_rate == 0`` (so ~``span_len / start_rate`` of tokens mask,
    T5's ~15% at the defaults), each span covering ``span_len``
    positions.  Masked runs collapse to ``<extra_id_N>`` sentinels in
    the corrupted input; the target emits each sentinel followed by
    the hidden tokens — the exact seq2seq contract.

    Determinism is the point: masks are a pure function of (salt,
    doc, position), so any engine, run, or worker reproduces the same
    corruption — the property that makes cached corrupted corpora
    verifiable.  Output keeps scalar columns (counts + md5 of both
    sequences); plan = one explode, per-doc windows, one agg.
    """
    from .dedup import portable_hash31

    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "tok"
        ),
    ).where(F.col("tok") != "")

    def _start(pos_col: F.Column) -> F.Column:
        h = portable_hash31(
            F.concat(
                F.lit(salt + ":"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                pos_col.cast("string"),
            )
        )
        return (h % F.lit(start_rate)) == 0

    masked = _start(F.col("pos"))
    for back in range(1, span_len):
        masked = masked | (
            (F.col("pos") >= back) & _start(F.col("pos") - back)
        )
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = toks.withColumn("m", masked).withColumn(
        "new_run",
        F.col("m")
        & ~F.coalesce(F.lag("m").over(w), F.lit(False)),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum(F.when(F.col("new_run"), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("run_id") - 1).cast("string"), F.lit(">")
    )
    pieces = runs.select(
        "doc_id",
        "pos",
        "m",
        "new_run",
        F.when(~F.col("m"), F.col("tok"))
        .when(F.col("new_run"), sentinel)
        .otherwise(F.lit(""))
        .alias("corr_piece"),
        F.when(
            F.col("new_run"), F.concat(sentinel, F.lit(" "), F.col("tok"))
        )
        .when(F.col("m"), F.col("tok"))
        .otherwise(F.lit(""))
        .alias("tgt_piece"),
    )
    joined = pieces.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("m"), 1).otherwise(0)).cast("bigint").alias(
            "n_masked"
        ),
        F.sum(F.when(F.col("new_run"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_spans"),
        F.concat_ws(
            " ",
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "corr_piece"))
                    ),
                    lambda s: s["corr_piece"],
                ),
                lambda p: p != "",
            ),
        ).alias("corrupted"),
        F.concat_ws(
            " ",
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tgt_piece"))
                    ),
                    lambda s: s["tgt_piece"],
                ),
                lambda p: p != "",
            ),
        ).alias("target"),
    )
    return joined.select(
        "doc_id",
        "n_tokens",
        "n_masked",
        "n_spans",
        F.md5(F.col("corrupted")).alias("corrupted_md5"),
        F.md5(F.col("target")).alias("target_md5"),
    ).orderBy("doc_id")


def ndcg_eval(
    documents: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NDCG@k of the engine's BM25 ranking against a deterministic
    binary relevance label (document contains EVERY query term) — the
    rank-quality metric that rewards putting relevant results early,
    completing the search-eval family (calibration, confusion,
    now ranking).

        DCG  = sum rel_i / log2(rank_i + 1)
        IDCG = best possible ordering of the list's relevance
        NDCG = DCG / IDCG   (0 when nothing relevant)

    Everything after the BM25 TakeOrdered happens on the <= k-row
    frame; log2 runs as ln(x)/ln(2) on both engines.
    """
    ranked = bm25_search(
        documents, query_terms, k=k, id_col=id_col, text_col=text_col
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    has_all = None
    for t in query_terms:
        cond = F.array_contains(toks, t.lower())
        has_all = cond if has_all is None else (has_all & cond)
    labels = documents.select(
        F.col(id_col).alias("__id"),
        F.when(has_all, F.lit(1)).otherwise(F.lit(0)).alias("rel"),
    )
    scored = (
        ranked.withColumn("rk", F.row_number().over(w))
        .join(labels, F.col(id_col) == F.col("__id"))
        .select("rk", "rel")
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    # everything below runs on ONE collected <= k-row array: dcg and
    # the ideal-ordering idcg are aggregate FOLDS over the rank-sorted
    # (rk, rel) structs — no unpartitioned window anywhere, so the
    # catalog-wide window audit passes structurally (the ideal rank of
    # the i-th relevant item is i, carried as the fold's pos counter)
    collected = scored.agg(
        F.array_sort(F.collect_list(F.struct("rk", "rel"))).alias("a")
    )
    dcg = F.aggregate(
        "a",
        F.lit(0.0),
        lambda acc, s: acc
        + s["rel"].cast("double") / log2(s["rk"].cast("double") + F.lit(1.0)),
    )
    ideal = F.aggregate(
        "a",
        F.struct(
            F.lit(0).cast("bigint").alias("pos"), F.lit(0.0).alias("s")
        ),
        lambda acc, s: F.when(
            s["rel"] > 0,
            F.struct(
                (acc["pos"] + F.lit(1)).alias("pos"),
                (
                    acc["s"]
                    + F.lit(1.0)
                    / log2((acc["pos"] + F.lit(1)).cast("double") + F.lit(1.0))
                ).alias("s"),
            ),
        ).otherwise(acc),
    )
    agg = collected.select(
        F.size("a").cast("bigint").alias("k_eval"),
        F.aggregate(
            "a", F.lit(0).cast("bigint"), lambda acc, s: acc + s["rel"]
        ).alias("n_relevant"),
        F.round(dcg + F.lit(1e-9), 6).alias("dcg"),
        F.round(ideal["s"] + F.lit(1e-9), 6).alias("idcg"),
    )
    # round BOTH inputs before the ratio so the published ndcg is a
    # pure function of the published dcg/idcg on any engine
    return (
        agg.select(
            "k_eval",
            "n_relevant",
            "dcg",
            "idcg",
            F.when(
                F.col("idcg") > 0,
                F.round(F.col("dcg") / F.col("idcg") + F.lit(1e-9), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )


def diversified_topk(
    documents: DataFrame,
    *,
    k: int = 20,
    per_source_cap: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Diversity-capped top-k: rank documents by a quality signal
    (token entropy) but admit at most ``per_source_cap`` per source —
    the result-shaping constraint every production ranking applies so
    one prolific source cannot monopolize a page / a training batch.

    Two-stage cut, both bounded: a per-source window (source-sized
    partitions) keeps each source's best ``per_source_cap`` rows, then
    one TakeOrdered over the surviving <= cap x |sources| rows picks
    the global k.  All ordering on the ROUNDED score + id, so the cut
    is engine-portable.
    """
    ent = token_entropy(documents, id_col=id_col, text_col=text_col).select(
        id_col, "entropy"
    )
    scored = documents.select(id_col, source_col).join(ent, id_col)
    w = Window.partitionBy(source_col).orderBy(
        F.col("entropy").desc(), F.col(id_col)
    )
    capped = scored.withColumn("src_rank", F.row_number().over(w)).where(
        F.col("src_rank") <= per_source_cap
    )
    wg = Window.orderBy(F.col("entropy").desc(), F.col(id_col))
    return (
        capped.withColumn("rank", F.row_number().over(wg))
        .where(F.col("rank") <= k)
        .select(
            F.col("rank").cast("int").alias("rank"),
            id_col,
            source_col,
            F.col("src_rank").cast("int").alias("src_rank"),
            "entropy",
        )
        .orderBy("rank")
    )


def lexical_diversity(
    documents: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source lexical-richness profile: type-token ratio, hapax
    ratio, and Herdan's C — the corpus-health metrics a data-mixing
    decision reads before weighting a source up or down (a source
    whose TTR collapses is template/boilerplate-heavy; a hapax spike
    flags OCR noise or tokenizer damage).

      * ttr        = |types| / |tokens|   (length-sensitive)
      * hapax_ratio= |{t : c(t)=1}| / |types|
      * herdan_c   = ln |types| / ln |tokens|  (length-corrected TTR)

    Plan shape: one explode, then TWO partial+final hash aggregations
    — (source, token) -> c, then source -> {sum c, count, count c=1}.
    State per key is a handful of longs; the (source, token) shuffle
    is vocabulary-sized per source, never corpus-sized. No windows,
    no collects — survives any corpus size where the per-source
    vocabulary fits a hash aggregate (Zipf guarantees it).
    """
    toks = documents.select(
        F.col(source_col).alias("source"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    per_token = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_token.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.round(F.col("n_types") / F.col("n_tokens") + 1e-9, 6).alias("ttr"),
            F.round(F.col("n_hapax") / F.col("n_types") + 1e-9, 6).alias(
                "hapax_ratio"
            ),
            F.round(F.log("n_types") / F.log("n_tokens") + 1e-9, 6).alias(
                "herdan_c"
            ),
        )
        .orderBy("source")
    )


def oov_rate(
    documents: DataFrame,
    *,
    vocab_size: int = 200,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus's own
    top-``vocab_size`` token vocabulary — the coverage check run
    before freezing a tokenizer/vocab: a source with a high OOV rate
    under the candidate vocab will fragment into byte-fallback tokens
    and train poorly.

    Vocabulary selection is deterministic: global token counts, keep
    the ``vocab_size`` most frequent (count desc, token asc
    tie-break). The ranking window runs over the VOCABULARY relation
    (Zipf-bounded, orders of magnitude smaller than the corpus), and
    the membership test joins the token stream against a
    vocab_size-row table — a broadcast hash join at any corpus scale.
    Everything else is partial+final aggregation.

    Emits per source: micro OOV rate (token-weighted), macro OOV rate
    (doc-averaged), and doc counts — micro vs macro diverging is
    itself a signal (a few giant noisy docs vs uniform noise).
    """
    toks = documents.select(
        F.col(source_col).alias("source"),
        F.col("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("token"),
    ).filter(F.length("token") > 0)
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("token"))
    vocab = (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= vocab_size)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "token", "left").select(
        "source",
        "doc_id",
        F.coalesce(F.col("in_vocab"), F.lit(False)).alias("in_vocab"),
    )
    per_doc = flagged.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.when(~F.col("in_vocab"), 1).otherwise(0)).alias("n_oov"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_oov").alias("n_oov"),
            F.avg(F.col("n_oov") / F.col("n_tok")).alias("__macro"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens") + 1e-9, 6).alias(
                "micro_oov_rate"
            ),
            F.round(F.col("__macro") + 1e-9, 6).alias("macro_oov_rate"),
        )
        .orderBy("source")
    )


def cdc_chunks(
    documents: DataFrame,
    *,
    window: int = 4,
    mask: int = 16,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (rolling-hash boundaries, the
    rsync/LBFS family): split each document where a polynomial hash of
    the trailing ``window`` characters is ``0 mod mask``.  Unlike
    fixed-size ``chunk_documents``, CDC boundaries survive insertions
    — a one-word edit shifts only the chunks it touches, so shared
    chunks between near-identical docs still align.  Expected chunk
    length ~= mask.

    The boundary hash is a fixed-depth base-31 polynomial over the
    last ``window`` char codes, computed with LAG over a per-document
    window — per-doc partitions, never a global sort.  Chunk ids are a
    prefix sum of boundary flags (again per doc).  Chunk TEXT is
    recovered as substring(text, min(pos), len) from the grouped char
    positions — the chars themselves are never re-assembled by
    aggregation, so the wide shuffle carries (doc_id, pos, code) longs
    only.  Rows = corpus bytes: the honest cost of byte-level
    chunking, embarrassingly parallel per document."""
    if window != 4:
        raise ValueError("cdc_chunks: the lag-unrolled hash is fixed at window=4")
    chars = documents.select(
        F.col("doc_id"),
        F.col(source_col).alias("source"),
        F.col(text_col),
        F.explode(F.sequence(F.lit(1), F.length(text_col))).alias("pos"),
    ).select(
        "doc_id",
        "source",
        "pos",
        F.ascii(F.expr(f"substring({text_col}, pos, 1)")).alias("code"),
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    h = (
        F.col("code")
        + F.lag("code", 1).over(wl) * 31
        + F.lag("code", 2).over(wl) * 961
        + F.lag("code", 3).over(wl) * 29791
    )
    flagged = chars.withColumn(
        "b",
        F.when((F.col("pos") >= window) & (h % mask == 0), 1).otherwise(0),
    )
    wp = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    chunked = flagged.withColumn(
        "chunk_id", F.coalesce(F.sum("b").over(wp), F.lit(0))
    )
    return (
        chunked.groupBy("doc_id", "source", "chunk_id")
        .agg(F.min("pos").alias("start"), F.count(F.lit(1)).alias("chunk_len"))
        .join(documents.select("doc_id", text_col), "doc_id")
        .select(
            "doc_id",
            "source",
            "chunk_id",
            "chunk_len",
            F.expr(f"substring({text_col}, start, chunk_len)").alias("chunk_text"),
        )
    )


def cdc_chunk_stats(
    documents: DataFrame,
    *,
    window: int = 4,
    mask: int = 16,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source chunk-duplication audit over ``cdc_chunks``: chunk
    counts, within-source distinct chunks, the share of chunk
    OCCURRENCES whose text repeats anywhere in the corpus
    (``dup_ratio`` — the dedup opportunity CDC exists to find), and
    mean chunk length.  One chunk-text global count
    (chunk-vocabulary-sized) + one keyed join back + one partial+final
    agg; all deterministic integer arithmetic, so an independent
    engine replays it bit-for-bit."""
    chunks = cdc_chunks(
        documents,
        window=window,
        mask=mask,
        source_col=source_col,
        text_col=text_col,
    )
    global_counts = chunks.groupBy("chunk_text").agg(
        F.count(F.lit(1)).alias("g_c")
    )
    per_chunk = chunks.join(global_counts, "chunk_text")
    return (
        per_chunk.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_text").alias("n_distinct"),
            F.sum(F.when(F.col("g_c") > 1, 1).otherwise(0)).alias("n_dup_occ"),
            F.avg("chunk_len").alias("__avg_len"),
        )
        .select(
            "source",
            "n_chunks",
            "n_distinct",
            "n_dup_occ",
            F.round(F.col("n_dup_occ") / F.col("n_chunks") + 1e-9, 6).alias(
                "dup_ratio"
            ),
            F.round(F.col("__avg_len") + 1e-9, 4).alias("avg_chunk_len"),
        )
        .orderBy("source")
    )


def skyline_docs(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pareto-frontier (skyline) document selection: the documents for
    which no other document is at least as long AND at least as
    lexically diverse, with one strict improvement — the
    multi-objective version of top-k that data-curation uses when
    "best" has no single score (here: maximize token count and
    type-token ratio, two naturally conflicting axes).

    Scale shape: per-doc metrics are pure map-side array expressions
    (no explode); the dominance sweep runs on the DISTINCT-x axis
    (group by n_tokens -> best ttr, then one running-max window over
    that axis, bounded by the longest document's token count — the
    calendar-day-axis discipline, never corpus-sized); frontier
    membership rejoins as a broadcast.  Ties: equal (x, y) points are
    mutually non-dominating and all kept; a lower-ttr doc at the same
    length is dominated and dropped.  Empty documents are excluded
    (undefined diversity, never frontier-eligible)."""
    per = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"filter(split(lower(trim({text_col})), '\\\\s+'),"
                " t -> t <> '')"
            ).alias("t"),
        )
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.when(
                F.size("t") > 0,
                F.round(
                    F.size(F.array_distinct("t")) / F.size("t")
                    + F.lit(1e-9),
                    4,
                ),
            ).alias("ttr"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    bx = per.groupBy("n_tokens").agg(F.max("ttr").alias("best_ttr"))
    w = (
        Window.orderBy(F.col("n_tokens").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = bx.withColumn("pm", F.max("best_ttr").over(w)).filter(
        F.col("pm").isNull() | (F.col("best_ttr") > F.col("pm"))
    )
    return (
        per.join(
            F.broadcast(frontier.select("n_tokens", "best_ttr")),
            on="n_tokens",
            how="inner",
        )
        .filter(F.col("ttr") == F.col("best_ttr"))
        .select("doc_id", "n_tokens", "ttr")
        .orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
    )


def textrank_keywords(
    documents: DataFrame,
    *,
    n_iter: int = 4,
    top_k: int = 20,
    min_token_len: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau
    2004): adjacent-token co-occurrence graph over the corpus, then a
    damped random-walk centrality — the unsupervised keyword scorer a
    curation pipeline runs to label/compare sources.

    FIXED-POINT integer recurrence (the kmeans_fixed discipline,
    pushed further — NO float op anywhere in the iteration):
    ranks live in 1e-6 units as int64, each edge contributes
    ``(w_uv * r_u) div W_u`` (exact integer division of exact ints),
    per-node in-mass is an exact int64 sum (order-independent, unlike
    the float sums a textbook implementation shuffles), and damping
    0.85 is ``(85 * mass) div 100``.  The whole trajectory is
    bit-identical on any engine — it replays in an unrolled
    materialized-CTE oracle.  r_v = 0.15 + 0.85 * sum_u w_uv/W_u * r_u
    in 1e-6 units, truncated — a deterministic fixed-point variant of
    the float recurrence (documented, not an approximation bug).

    Scale shape: tokenize map-side, ONE explode to adjacency pairs,
    edge weights = one partial+final count agg (vocabulary^2-bounded,
    Zipf-sparse in practice); each iteration is one keyed join +
    int-sum agg over the edge list (persisted once); output is
    top-k TakeOrdered."""
    toks = documents.select(
        F.expr(
            f"filter(split(lower(trim({text_col})), '\\\\s+'),"
            f" t -> length(t) >= {int(min_token_len)})"
        ).alias("t")
    ).filter(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> named_struct('a', element_at(t, i),"
                " 'b', element_at(t, i + 1)))"
            )
        ).alias("p")
    ).filter(F.col("p.a") != F.col("p.b"))
    und = pairs.select(
        F.least("p.a", "p.b").alias("u"), F.greatest("p.a", "p.b").alias("v")
    )
    uw = und.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
    edges = (
        uw.select("u", "v", "w")
        .unionByName(
            uw.select(
                F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
            )
        )
        .persist()
    )
    wsum = edges.groupBy("u").agg(F.sum("w").alias("wu"))
    e = edges.join(wsum, "u").select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w", "wu"
    ).persist()
    ranks = wsum.select(
        F.col("u").alias("node"),
        F.col("wu"),
        F.lit(1000000).cast("bigint").alias("r"),
    )
    prev = None
    for _ in range(n_iter):
        contrib = (
            e.join(
                ranks.select(F.col("node").alias("src"), F.col("r")), "src"
            )
            .select(
                "dst", F.expr("(w * r) div wu").alias("c")
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        new_ranks = (
            ranks.select("node", "wu")
            .join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                "wu",
                (
                    F.lit(150000).cast("bigint")
                    + F.expr("(85 * coalesce(mass, 0)) div 100")
                ).alias("r"),
            )
            .persist()
        )
        if prev is not None:
            prev.unpersist()
        prev = ranks = new_ranks
    out = (
        ranks.select(
            F.col("node").alias("token"),
            F.col("wu").alias("weighted_degree"),
            (F.col("r") / F.lit(1000000.0)).alias("rank_score"),
        )
        .orderBy(F.col("rank_score").desc(), "token")
        .limit(top_k)
    )
    # the returned plan re-reads the persisted frames lazily; they stay
    # cached for the caller's single action, then GC'd with the session
    return out


def kneser_ney_score(
    documents: DataFrame,
    *,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy under an interpolated Kneser-Ney
    bigram model (Kneser & Ney 1995; Chen & Goodman 1998) — the
    smoothing that makes corpus-LM quality filtering robust on rare
    prefixes, where the unsmoothed ``bigram_lm_score`` degenerates:

        P(w2|w1) = max(c(w1 w2) - D, 0) / c(w1·)
                 + (D · N1+(w1,·) / c(w1·)) · N1+(·,w2) / |bigram types|

    continuation probability instead of raw unigram frequency, absolute
    discounting instead of add-k. Every model quantity is an exact
    integer count, so the doubles are a fixed IEEE op sequence on both
    engines (the groupwise_ols discipline) and the DuckDB oracle
    replays the model bit-for-bit.

    Plan shape mirrors ``bigram_lm_score``: map-side explode, four
    vocabulary-sized partial+final count tables (bigram, prefix,
    distinct-continuations per prefix, distinct-histories per word),
    one 1-row |types| scalar broadcast, joins on vocabulary keys, one
    keyed agg back to doc granularity.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    exploded = (
        documents.filter(F.size(toks) >= 2)
        .select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bgc = exploded.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    pfc = exploded.groupBy("w1").agg(
        F.count(F.lit(1)).alias("c_w1"),
        F.countDistinct("w2").alias("n1p_fw"),
    )
    sfc = exploded.groupBy("w2").agg(F.countDistinct("w1").alias("n1p_bw"))
    tot = bgc.agg(F.count(F.lit(1)).cast("double").alias("t"))
    d = F.lit(float(discount))
    prob = (
        F.greatest(F.col("c_bg") - d, F.lit(0.0)) / F.col("c_w1")
        + ((d * F.col("n1p_fw")) / F.col("c_w1"))
        * (F.col("n1p_bw") / F.col("t"))
    )
    scored = (
        exploded.join(bgc, ["w1", "w2"])
        .join(pfc, "w1")
        .join(sfc, "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.log(prob).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"), F.sum("lp").alias("__slp"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(-F.col("__slp") / F.col("n_bigrams") + 1e-9, 4).alias(
                "kn_cross_entropy"
            ),
        )
        .orderBy("doc_id")
    )


def dedup_passages_global(
    documents: DataFrame,
    *,
    chunk_words: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide passage dedup with the KEEP-FIRST policy (C4's
    line-level rule, Raffel et al. 2020 §2.2: "discard all but one of
    any three-sentence span occurring more than once") — the companion
    to ``scrub_boilerplate``, which drops repeated passages from EVERY
    document; here each exact passage keeps its earliest (doc_id, pos)
    occurrence and only the LATER copies drop, so no content is lost
    from the corpus.

    Winner election is one aggregate: ``min(struct(doc_id, pos))`` per
    passage (partial+final, map-side combine collapses per-task
    repeats). An occurrence survives iff it IS its passage's winner.
    Scale shape: explode map-side, one shuffle on the passage key for
    the winner table, one join back on the same key (AQE co-plans the
    pair), one doc-keyed rebuild whose collect state is bounded by the
    document's own length.
    """
    from flink_elasticsearch_ingestion_spark.operators.util import (
        bind_once,
        ensure_parallelism,
    )

    documents = ensure_parallelism(documents.filter(F.trim(F.col(text_col)) != ""))
    toks = F.split(F.trim(F.col(text_col)), "\\s+")
    chunks = bind_once(
        toks,
        lambda t: F.transform(
            F.sequence(
                F.lit(0), F.ceil(F.size(t) / F.lit(chunk_words)).cast("int") - 1
            ),
            lambda i: F.array_join(F.slice(t, i * chunk_words + 1, chunk_words), " "),
        ),
    )
    exploded = documents.select(
        "doc_id", F.posexplode(chunks).alias("pos", "passage")
    )
    winners = exploded.groupBy("passage").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    flagged = exploded.join(winners, "passage").withColumn(
        "keep",
        (F.col("doc_id") == F.col("w.doc_id")) & (F.col("pos") == F.col("w.pos")),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_passages"),
            F.count(F.when(~F.col("keep"), 1)).cast("bigint").alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("pos"), F.col("passage")),
                            )
                        )
                    ),
                    lambda s: s.passage,
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dropped",
            F.length("clean_text").cast("bigint").alias("n_chars_clean"),
            F.md5("clean_text").alias("clean_sha"),
        )
        .orderBy("doc_id")
    )


def difficulty_stratified_eval(
    documents: DataFrame,
    *,
    per_cell: int = 5,
    salt: str = "evalsel-v1",
) -> DataFrame:
    """Difficulty-stratified eval-set construction: bucket the corpus
    into Kneser-Ney cross-entropy QUARTILES (model-difficulty bins),
    cross them with language, and draw a deterministic exact-k sample
    per (lang, difficulty) cell — the balanced eval panel that stops a
    "quality improved" claim from hiding behind easy-cell wins.

    A round-5 composition capstone: KN scoring (``kneser_ney_score``)
    -> two-phase global quartiles (``global_distribution_ranks``, no
    single-partition window) -> salted per-cell exact-k (portable md5
    order), every stage independently oracle-proven. Documents shorter
    than one bigram have no score and are excluded from the pool.

    Returns per cell: pool size, selected count, mean difficulty of
    the selection.
    """
    from flink_elasticsearch_ingestion_spark.operators.windows import (
        global_distribution_ranks,
    )

    scores = kneser_ney_score(documents).select("doc_id", "kn_cross_entropy")
    ranked = global_distribution_ranks(
        scores,
        "kn_cross_entropy",
        "doc_id",
        ntile_k=4,
        coarse_edges=(2.0, 4.0, 6.0, 8.0),
    ).select("doc_id", "kn_cross_entropy", "quartile")
    cells = ranked.join(documents.select("doc_id", "lang"), "doc_id")
    rn = F.row_number().over(
        Window.partitionBy("lang", "quartile").orderBy(
            F.md5(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
    )
    sel = cells.withColumn("rn", rn)
    picked = F.col("rn") <= per_cell
    return (
        sel.groupBy("lang", "quartile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pool"),
            F.count(F.when(picked, 1)).cast("bigint").alias("n_selected"),
            F.round(
                F.coalesce(
                    F.sum(F.when(picked, F.col("kn_cross_entropy")))
                    / F.count(F.when(picked, 1)),
                    F.lit(0.0),
                )
                + 1e-9,
                4,
            ).alias("avg_ce_selected"),
        )
        .orderBy("lang", "quartile")
    )


def ql_search(
    documents: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    mu: float = 2000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Query-likelihood ranked retrieval with Dirichlet smoothing
    (Ponte & Croft 1998; Zhai & Lafferty 2001) — the language-modeling
    scorer that complements ``bm25_search``:

        score(q, d) = sum_t ln( (tf(t,d) + mu * cf(t)/|C|) / (|d| + mu) )

    where cf(t) is the term's corpus frequency and |C| the corpus token
    count. Same two-pass shape as BM25: one broadcastable corpus-stats
    row (|C| plus cf per QUERY term only — higher-order filter over the
    token array, no vocabulary shuffle), then a pure-expression score
    and ``TakeOrderedAndProject``. The term sum folds in query order so
    the IEEE sequence matches the oracle; 6 dp rounding + doc_id
    tie-break pin the ranking.
    """
    from flink_elasticsearch_ingestion_spark.operators.util import ensure_parallelism

    documents = ensure_parallelism(documents)
    terms = [t.lower() for t in query_terms]
    toks = F.split(F.lower(F.trim(F.col(text_col))), "\\s+")

    def _is(term: str):
        return lambda x: x == F.lit(term)

    feat = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("doclen"),
        *[F.size(F.filter(toks, _is(t))).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = feat.agg(
        F.sum("doclen").cast("double").alias("c_total"),
        *[
            F.sum(F.col(f"tf_{i}")).cast("double").alias(f"cf_{i}")
            for i in range(len(terms))
        ],
    )
    scored = feat.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        p_c = F.col(f"cf_{i}") / F.col("c_total")
        score = score + F.log(
            (F.col(f"tf_{i}") + F.lit(mu) * p_c)
            / (F.col("doclen") + F.lit(mu))
        )
    return (
        scored.select(
            "doc_id",
            F.col("doclen").cast("bigint").alias("doclen"),
            F.round(score + F.lit(1e-9), 6).alias("ql"),
        )
        .orderBy(F.col("ql").desc(), F.col("doc_id"))
        .limit(k)
    )


def rrf_fusion(
    documents: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    depth: int = 20,
    rrf_c: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of the
    BM25 and Dirichlet-QL rankers: each ranker contributes
    ``1/(rrf_c + rank)`` for documents inside its top-``depth``; the
    fused score needs no score normalization across rankers — which is
    the whole point of RRF and why every hybrid-search stack (including
    Elasticsearch's own ``rrf`` retriever, the reference's target
    system) ships it.

    Shape for 100 TB: the two underlying scorers are each one corpus
    scan + TakeOrderedAndProject; fusion itself runs on two
    <= depth-row frames (row_number over a TakeOrdered result, then a
    full-outer equi-join of two tiny sides) — it adds nothing to the
    scan cost, exactly like ``ndcg_eval``'s post-TakeOrdered frame.
    Ranks tie-break on ``id_col`` in both engines so fusion is stable.
    """
    b = bm25_search(
        documents, query_terms, k=depth, id_col=id_col, text_col=text_col
    )
    q = ql_search(
        documents, query_terms, k=depth, id_col=id_col, text_col=text_col
    )
    wb = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    wq = Window.orderBy(F.col("ql").desc(), F.col(id_col))
    br = b.select(
        id_col, F.row_number().over(wb).cast("int").alias("bm25_rank")
    )
    qr = q.select(
        id_col, F.row_number().over(wq).cast("int").alias("ql_rank")
    )
    contrib = lambda rank: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(rrf_c) + F.col(rank)), F.lit(0.0)
    )
    return (
        br.join(qr, id_col, "full_outer")
        .select(
            id_col,
            "bm25_rank",
            "ql_rank",
            F.round(
                contrib("bm25_rank") + contrib("ql_rank") + F.lit(1e-9), 6
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), id_col)
        .limit(k)
    )


def token_gini(documents: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Gini coefficient of the corpus token-frequency distribution —
    the one-number concentration KPI next to ``token_entropy`` (0 =
    every type equally frequent, ->1 = a few types dominate). Corpus
    curation watches it drift when a boilerplate-heavy source joins
    the mix.

    Computed from the frequency-ranked vocabulary ``vocab_with_ids``
    already builds (two-phase global rank — NO single-partition
    window): with ``token_id`` = 1..V ordered by count DESC, the
    ascending-rank index is ``i = V - token_id + 1`` and

        G = 2 * sum(i * c_i) / (V * T)  -  (V + 1) / V

    Within a tie group (equal counts) sum(i * c_i) is invariant under
    permutation, so the DESC-rank reversal is exact. Everything stays
    integer until the final division — one aggregate over the
    vocabulary-sized frame, bit-stable on any engine."""
    v = vocab_with_ids(documents, text_col=text_col)
    agg = v.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cnt").alias("t"),
        F.sum(F.col("token_id").cast("long") * F.col("cnt")).alias("s_desc"),
    )
    # sum(i*c) with ascending i = (V+1)*T - sum(token_id*c)
    s_asc = (F.col("v") + 1) * F.col("t") - F.col("s_desc")
    gini = (
        F.lit(2.0) * s_asc / (F.col("v") * F.col("t"))
        - (F.col("v") + F.lit(1.0)) / F.col("v")
    )
    return agg.select(
        F.col("v").cast("bigint").alias("distinct_tokens"),
        F.col("t").cast("bigint").alias("total_tokens"),
        F.round(gini + 1e-9, 6).alias("gini"),
    )


def langid_confusion(documents: DataFrame) -> DataFrame:
    """Language-ID confusion matrix: labeled ``lang`` vs the stopword
    vote ``language_id`` predicts — the eval that tells you WHERE the
    heuristic fails (which true language leaks into which guess)
    before it routes documents to per-language pipelines. One extra
    aggregate over ``language_id``'s projection; share is within the
    true-language row (bounded |langs| axis window)."""
    from pyspark.sql import Window as Wnd

    pred = language_id(documents).groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per_lang = Wnd.partitionBy("lang")
    return pred.select(
        "lang",
        "lang_guess",
        "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(per_lang) + 1e-9, 6
        ).alias("share"),
        (F.col("lang") == F.col("lang_guess")).alias("correct"),
    ).orderBy("lang", "lang_guess")


def source_kl_drift(
    documents: DataFrame,
    *,
    vocab_k: int = 200,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source token-distribution drift: KL(source || corpus) over
    the corpus' top-``vocab_k`` token types, add-one smoothed — the
    mixing diagnostic that flags an ingested dataset whose language
    shifted away from the blend (tokenizer fertility and filter
    calibrations silently degrade downstream).

    Scale shape: one token explode -> (source, token) hash aggregate;
    the reference vocabulary is a TakeOrdered ``vocab_k``-row frame
    broadcast back; per-source normalization windows partition on the
    bounded (source) axis over <= vocab_k rows. KL sums ~vocab_k ln
    terms then rounds to 6dp, far above cross-libm ulp noise."""
    from pyspark.sql import Window as Wnd

    toks = documents.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("token"),
    ).filter(F.length("token") > 0)
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("corpus_cnt"))
        .orderBy(F.col("corpus_cnt").desc(), "token")
        .limit(vocab_k)
    )
    # corpus q over the vocab, add-one smoothed over the ACTUAL vocab
    # size (a corpus with fewer than vocab_k types must still yield a
    # normalized distribution — smoothing by vocab_k would leave
    # sum(q) < 1 and a spurious nonzero KL on identical inputs); the
    # normalizers are windows over the post-limit vocab_k-row frame
    # (bounded by construction, the shape the window audit passes
    # structurally), computed BEFORE the source grid so they normalize
    # over the vocab, not vocab x sources
    w_all = Wnd.partitionBy(F.lit(1)).rowsBetween(
        Wnd.unboundedPreceding, Wnd.unboundedFollowing
    )
    vocab = vocab.withColumn(
        "__q",
        (F.col("corpus_cnt") + 1)
        / (F.sum("corpus_cnt").over(w_all) + F.count(F.lit(1)).over(w_all)),
    )
    st = (
        toks.join(F.broadcast(vocab), "token")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # complete the (source x vocab) grid so absent tokens still carry
    # their smoothed mass (otherwise KL silently drops terms)
    grid = (
        st.select("source").distinct().crossJoin(F.broadcast(vocab))
    )
    full = grid.join(st, ["source", "token"], "left").fillna(
        {"cnt": 0}
    )
    w_src = Wnd.partitionBy("source")
    # per-source support == vocab size (the grid completes it), so the
    # same actual-size smoothing keeps p normalized too
    p = (F.col("cnt") + 1) / (
        F.sum("cnt").over(w_src) + F.count(F.lit(1)).over(w_src)
    )
    q = F.col("__q")
    terms = full.select(
        "source", (p * (F.log(p) - F.log(q))).alias("term"), F.col("cnt")
    )
    return (
        terms.groupBy("source")
        .agg(
            F.round(F.sum("term") + 1e-9, 6).alias("kl_divergence"),
            F.sum("cnt").cast("bigint").alias("vocab_tokens"),
        )
        .orderBy("source")
    )



def token_coverage_curve(
    documents: DataFrame,
    *,
    vocab_sizes: tuple[int, ...] = (5, 10, 20, 50, 100, 500, 1000, 5000),
    text_col: str = "text",
) -> DataFrame:
    """Cumulative corpus token coverage at candidate vocabulary sizes —
    the vocab-sizing curve ("how large must the vocabulary be to cover
    95% of token mass?"), the planning tool between ``oov_rate`` (one
    fixed vocab) and ``token_gini`` (one concentration number).

    Built on ``vocab_with_ids``' two-phase global frequency rank, and
    the running token-mass sum is two-phase TOO (ADVICE r9: the rank
    phase avoided the single-partition window but the mass prefix sum
    still ordered the full vocabulary through one task — and the vocab
    grows with the corpus): within-sub-bucket running sums run
    partitioned by the same (cnt, first-char) keys the rank phase
    uses (first-char order IS token order inside a count group, so
    bucket order matches token_id order), and each bucket's global
    mass offset + the corpus total come from ONE prefix sum over the
    tiny (distinct-counts x alphabet) histogram, broadcast back.
    Sampled at the literal ``vocab_sizes`` grid: covered tokens,
    coverage share, and the rarest in-vocab frequency (the natural
    min_count cut)."""
    v = vocab_with_ids(documents, text_col=text_col).withColumn(
        "__pfx", F.substring("token", 1, 1)
    )
    within_run = F.sum("cnt").over(
        Window.partitionBy("cnt", "__pfx")
        .orderBy("token")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hist = v.groupBy("cnt", "__pfx").agg(F.sum("cnt").alias("__mass"))
    w_hist = Window.orderBy(F.col("cnt").desc(), F.col("__pfx"))
    offsets = hist.select(
        "cnt",
        "__pfx",
        F.coalesce(
            F.sum("__mass").over(w_hist.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__mass_offset"),
        F.sum("__mass")
        .over(
            w_hist.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__total"),
    )
    curve = (
        v.withColumn("__within_run", within_run)
        .filter(F.col("token_id").isin(*[int(s) for s in vocab_sizes]))
        .join(F.broadcast(offsets), ["cnt", "__pfx"])
        .select(
            "token_id",
            "cnt",
            (F.col("__mass_offset") + F.col("__within_run")).alias("covered_tokens"),
            F.col("__total").alias("total_tokens"),
        )
    )
    return curve.select(
        F.col("token_id").cast("int").alias("vocab_size"),
        F.col("covered_tokens").cast("bigint").alias("covered_tokens"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.col("covered_tokens") / F.col("total_tokens") + 1e-9, 6
        ).alias("coverage"),
        F.col("cnt").cast("bigint").alias("min_in_vocab_count"),
    ).orderBy("vocab_size")


def length_bucketing_waste(
    documents: DataFrame,
    *,
    bucket_counts: tuple[int, ...] = (1, 2, 4, 8),
    id_col: str = "doc_id",
    text_col: str = "text",
    coarse_edges: tuple[float, ...] = (30.0, 45.0, 60.0, 80.0),
) -> DataFrame:
    """Padding-waste account for LENGTH-BUCKETED batch assembly: if the
    corpus is split into ``nb`` equi-depth length buckets and every doc
    in a bucket pads to that bucket's longest doc (the dynamic-batching
    regime between "pad everything to global max" at nb=1 and per-batch
    packing), how many pad tokens does each choice of ``nb`` burn?

    The reading that sizes a training-batch pipeline's bucket count:
    waste_share(nb=1) is the cost of naive global padding,
    ``pack_documents`` is the zero-waste-asymptote alternative, and
    ``context_window_fit`` accounts the TRUNCATION side of the same
    budget — this operator measures the PADDING side as a function of
    bucketing granularity.

    The global length order is ranked two-phase (the
    ``global_distribution_ranks``/``equi_depth_buckets`` discipline,
    windows.py:1046 — coarse literal ranges + per-range row_number +
    broadcast prefix offsets, no single-partition window); buckets use
    the SQL-standard NTILE distribution (first ``n % nb`` buckets take
    one extra row), in pure integer arithmetic an oracle replays
    exactly. One rank shuffle, then a bounded ``|bucket_counts|``-way
    explode and two hash aggregations.

    Returns one row per ``nb``: n_buckets, total_tokens,
    padded_tokens (sum over buckets of bucket_max * bucket_size),
    waste_share = 1 - total/padded.
    """
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    edges = list(coarse_edges)
    coarse = F.lit(len(edges))
    for i, e in reversed(list(enumerate(edges))):
        coarse = F.when(n_tok < F.lit(e), F.lit(i)).otherwise(coarse)
    src = documents.select(
        F.col(id_col).alias("__id"), n_tok.alias("__n"), coarse.alias("__coarse")
    )
    within = F.row_number().over(
        Window.partitionBy("__coarse").orderBy("__n", "__id")
    )
    counts = src.groupBy("__coarse").agg(F.count(F.lit(1)).alias("__cnt"))
    offsets = counts.select(
        "__coarse",
        F.coalesce(
            F.sum("__cnt").over(
                Window.orderBy("__coarse").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__offset"),
        F.sum("__cnt")
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__total"),
    )
    ranked = src.withColumn("__within", within).join(
        F.broadcast(offsets), "__coarse"
    )
    r = F.col("__offset") + F.col("__within")
    n = F.col("__total")
    nb = F.col("n_buckets")
    exploded = ranked.select(
        r.alias("__r"),
        n.alias("__tot"),
        F.col("__n"),
        F.explode(
            F.array(*[F.lit(int(b)) for b in bucket_counts])
        ).alias("n_buckets"),
    )
    base = (F.col("__tot") / nb).cast("bigint")
    extra = F.col("__tot") % nb
    big_span = (base + F.lit(1)) * extra
    bucket = F.when(
        F.col("__r") <= big_span,
        ((F.col("__r") - 1) / (base + F.lit(1))).cast("bigint") + 1,
    ).otherwise(
        extra + ((F.col("__r") - big_span - 1) / base).cast("bigint") + 1
    )
    per_bucket = (
        exploded.withColumn("__bucket", bucket)
        .groupBy("n_buckets", "__bucket")
        .agg(
            F.count(F.lit(1)).alias("__docs"),
            F.max("__n").alias("__cap"),
            F.sum("__n").alias("__toks"),
        )
    )
    padded = F.sum(F.col("__cap") * F.col("__docs"))
    total = F.sum("__toks")
    return (
        per_bucket.groupBy(F.col("n_buckets").cast("bigint").alias("n_buckets"))
        .agg(
            total.cast("bigint").alias("total_tokens"),
            padded.cast("bigint").alias("padded_tokens"),
            F.round((padded - total) / padded + 1e-9, 6).alias("waste_share"),
        )
        .orderBy("n_buckets")
    )
