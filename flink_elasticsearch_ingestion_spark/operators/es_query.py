"""Elasticsearch query-DSL compiler: bool queries → Catalyst predicates.

The reference's users don't write SQL — they write the ES query DSL
(the JSON bodies `_search` accepts; reference context core.clj:103 and
the scroll source's match_all body, core.clj:124–140).  An engine that
replaces the copied indexes must therefore answer the DSL, not just
hand-built DataFrame plans.  This module compiles the publicly
documented leaf and compound query types to Spark SQL boolean
expressions, so a stored DSL query runs as a pushdown-friendly
`.where(...)` over the document/event tables:

leaf queries
    ``term`` ``terms`` ``range`` (gt/gte/lt/lte) ``exists``
    ``prefix`` ``wildcard`` (``*``/``?`` patterns, LIKE-special
    escaping) ``match`` (analyzed OR/AND with
    ``minimum_should_match``) ``match_phrase`` (token-boundary
    containment under the whitespace analyzer) ``match_all``
compound
    ``bool`` with ``must`` / ``filter`` / ``should`` / ``must_not``
    and ``minimum_should_match`` — ES semantics: should clauses are
    optional when must/filter exist (unless minimum_should_match is
    set) and required-one when the bool has only shoulds.

Everything compiles to JVM-side expression trees (no UDFs): term
membership is `array_contains` over the whitespace tokenization,
phrases are boundary-delimited `instr` on the whitespace-normalized
text, wildcards become anchored regexes.  A compiled filter is
therefore whole-stage-codegen-eligible and — for non-analyzed fields
— pushdown-eligible, exactly what a 100 TB scan wants.  Scoring stays
out of scope by design: filter-context semantics here, BM25 ranked
retrieval in ``text.bm25_search`` (the two compose: compile the bool
filter, rank the survivors).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators.text import tokens

__all__ = [
    "compile_query",
    "should_match_count",
    "wildcard_to_regex",
    "bool_dsl_filter",
    "wildcard_query",
    "match_phrase_count",
    "BOOL_DSL_FIXTURE",
]

#: analyzed (tokenized) text fields — `match`/`match_phrase` target
#: these; `term` on an analyzed field is the classic ES pitfall and
#: raises here instead of silently matching nothing
_ANALYZED_FIELDS = frozenset({"text"})

_RANGE_OPS = {
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
}


def wildcard_to_regex(pattern: str) -> str:
    """ES wildcard pattern → anchored regex: ``*`` → ``.*``, ``?`` →
    ``.``, every other char regex-escaped (so LIKE/regex specials in
    the pattern match literally, the documented ES behavior)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _norm_text(field: str) -> Column:
    """Whitespace-normalized, boundary-padded text — the phrase-match
    substrate (`' w1 w2 '` containment == consecutive-token match
    under the whitespace analyzer)."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(F.trim(F.col(field)), "\\s+", " "),
        F.lit(" "),
    )


def _match_clause(field: str, spec) -> Column:
    """`match`: analyzed membership with OR (default) / AND operator
    or an explicit minimum_should_match count."""
    if isinstance(spec, str):
        query, operator, msm = spec, "or", None
    else:
        query = spec["query"]
        operator = spec.get("operator", "or")
        msm = spec.get("minimum_should_match")
    terms = [t for t in query.lower().split() if t]
    if not terms:
        raise ValueError("match query analyzed to zero terms")
    hits = [F.array_contains(tokens(field), t) for t in terms]
    if msm is not None:
        sum_hits = hits[0].cast("int")
        for h in hits[1:]:
            sum_hits = sum_hits + h.cast("int")
        return sum_hits >= int(msm)
    combined = hits[0]
    for h in hits[1:]:
        combined = (combined & h) if operator == "and" else (combined | h)
    return combined


def compile_query(dsl: dict) -> Column:
    """Compile one ES query-DSL node to a Spark boolean Column.

    Raises ``ValueError`` on unknown query types or malformed bodies —
    a stored query that cannot run must fail loudly at compile time,
    never silently match nothing.
    """
    if not isinstance(dsl, dict) or len(dsl) != 1:
        raise ValueError(f"a DSL node must be a single-key dict, got: {dsl!r}")
    kind, body = next(iter(dsl.items()))

    if kind == "match_all":
        return F.lit(True)
    if kind == "term":
        ((field, spec),) = body.items()
        value = spec["value"] if isinstance(spec, dict) else spec
        if field in _ANALYZED_FIELDS:
            raise ValueError(
                f"`term` on analyzed field {field!r} — use `match`"
            )
        return F.col(field) == F.lit(value)
    if kind == "terms":
        ((field, values),) = body.items()
        return F.col(field).isin(list(values))
    if kind == "range":
        ((field, ops),) = body.items()
        conds = [
            _RANGE_OPS[op](F.col(field), F.lit(v))
            for op, v in ops.items()
        ]
        if not conds:
            raise ValueError(f"empty range body for {field!r}")
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    if kind == "exists":
        return F.col(body["field"]).isNotNull()
    if kind == "prefix":
        ((field, spec),) = body.items()
        value = spec["value"] if isinstance(spec, dict) else spec
        return F.col(field).startswith(value)
    if kind == "wildcard":
        ((field, spec),) = body.items()
        value = spec["value"] if isinstance(spec, dict) else spec
        return F.col(field).rlike(wildcard_to_regex(value))
    if kind == "match":
        ((field, spec),) = body.items()
        return _match_clause(field, spec)
    if kind == "match_phrase":
        ((field, spec),) = body.items()
        phrase = spec["query"] if isinstance(spec, dict) else spec
        norm = " ".join(phrase.lower().split())
        return F.instr(_norm_text(field), f" {norm} ") > 0
    if kind == "bool":
        return _compile_bool(body)
    raise ValueError(f"unsupported DSL query type: {kind!r}")


def _compile_bool(body: dict) -> Column:
    unknown = set(body) - {
        "must",
        "filter",
        "should",
        "must_not",
        "minimum_should_match",
    }
    if unknown:
        raise ValueError(f"unsupported bool sections: {sorted(unknown)}")
    conds: list[Column] = []
    for section in ("must", "filter"):
        for clause in body.get(section, []):
            conds.append(compile_query(clause))
    for clause in body.get("must_not", []):
        # ES must_not is strict exclusion: a doc matching ANY
        # must_not clause is out
        conds.append(~compile_query(clause))
    shoulds = body.get("should", [])
    msm = body.get("minimum_should_match")
    if shoulds:
        # documented ES default: should is optional when must/filter
        # exist; required-one when the bool has only shoulds
        if msm is None:
            msm = 0 if (body.get("must") or body.get("filter")) else 1
        if int(msm) > 0:
            conds.append(should_match_count(shoulds) >= int(msm))
    if not conds:
        return F.lit(True)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def should_match_count(shoulds: list[dict]) -> Column:
    """How many should clauses a row satisfies — the bool query's
    coordination count (exposed so callers can report/rank on it)."""
    if not shoulds:
        return F.lit(0)
    total = compile_query(shoulds[0]).cast("int")
    for clause in shoulds[1:]:
        total = total + compile_query(clause).cast("int")
    return total


#: the stored bool-query fixture the catalog entry runs — one of each
#: compound section, leaf types spanning match / range / terms /
#: match_phrase / term / match+msm / prefix
BOOL_DSL_FIXTURE = {
    "bool": {
        "must": [{"match": {"text": "spark merge"}}],
        "filter": [
            {"range": {"n_chars": {"gte": 120, "lt": 400}}},
            {"terms": {"lang": ["en", "de", "fr"]}},
        ],
        "must_not": [{"match_phrase": {"text": "slow scan"}}],
        "should": [
            {"term": {"source": "src3"}},
            {"match": {"text": {"query": "vector stream", "minimum_should_match": 2}}},
            {"prefix": {"source": "src1"}},
        ],
    }
}


def bool_dsl_filter(documents: DataFrame) -> DataFrame:
    """Run the stored ``BOOL_DSL_FIXTURE`` bool query in filter
    context and report each hit with its should-coordination count —
    the exact result set ES returns for the same JSON body (hit set +
    per-hit matched-clause accounting).

    Scale: the whole query is ONE boolean expression over the scan —
    no joins, no shuffles before the final order; the non-analyzed
    predicates (range on n_chars, terms on lang) sit in the pushdown
    position.
    """
    shoulds = BOOL_DSL_FIXTURE["bool"]["should"]
    return (
        documents.where(compile_query(BOOL_DSL_FIXTURE))
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            should_match_count(shoulds).alias("n_should_matched"),
        )
        .orderBy("doc_id")
    )


def wildcard_query(part: DataFrame, *, pattern: str = "*w?dget") -> DataFrame:
    """ES `wildcard` query on a keyword field: `*`/`?` translated to
    an anchored regex with literal-escaping of every other char.
    Returns the matched rows — map-side filter, TakeOrdered cut."""
    return (
        part.where(F.col("p_name").rlike(wildcard_to_regex(pattern)))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
        .limit(50)
    )


def match_phrase_count(
    documents: DataFrame, *, phrase: str = "fast join"
) -> DataFrame:
    """ES `match_phrase` in aggregation context: per-source doc counts
    for a consecutive-token phrase (whitespace analyzer) — the
    "which sources talk about X" slice ES users run constantly.
    Sources with zero hits stay visible (ES terms-agg over a filtered
    set loses them; the left join keeps the full source dimension)."""
    hit = compile_query({"match_phrase": {"text": phrase}})
    per = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(hit.cast("long")).alias("n_phrase_hits"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_phrase_hits",
        F.round(
            F.col("n_phrase_hits") / F.col("n_docs") + F.lit(1e-9), 6
        ).alias("hit_rate"),
    ).orderBy("source")
