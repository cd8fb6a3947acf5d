"""The `_search` endpoint, compiled: one ES search body → one plan.

operators/es_query.py compiles the query DSL; operators/es_aggs*.py
answer the individual aggregations.  This module is the umbrella the
reference's users actually call — POST `_search` with a JSON body
carrying a query, a sort/size hit spec, and/or an aggs tree
(core.clj:124–140 builds exactly such a body for the scroll source).
``es_search(df, body)`` dispatches the body to a single DataFrame
plan:

- ``query``  → the compiled boolean filter (es_query.compile_query).
- hits mode  → ``sort`` (field/order list, ES default order asc) and
  ``size`` (default 10) over the ``_source`` projection: a
  TakeOrderedAndProject, never a global sort.
- ``collapse`` → field collapsing with ``inner_hits``: one result
  GROUP per distinct collapse-key ranked by its best hit under the
  main sort, each group carrying its top ``inner_hits.size`` rows
  (``inner_rank`` 1 = the collapsed representative; inner hits
  inherit the main sort, the engine's documented default rendering).
- ``highlight`` → whole-field highlighting (the
  ``number_of_fragments: 0`` mode): every token of the highlighted
  field that matches a `match` term of the query wraps in
  ``pre_tags``/``post_tags``.
- aggs mode  → ONE top-level aggregation, matching the documented ES
  families: bucket ``terms`` (size, _count/_key order, optional
  nested metric sub-aggs) and ``date_histogram`` (calendar_interval
  day/hour, optional sub-aggs); metric ``avg`` / ``sum`` / ``min`` /
  ``max`` / ``value_count`` / ``cardinality`` / ``stats`` standalone.

Unknown body keys, agg families, or intervals raise ``ValueError`` at
compile time — a stored search that cannot run must fail loudly,
never return an empty-but-plausible result.

Scale shape: the filter is a pushdown-eligible scan predicate; bucket
aggs are partial+final hash aggs keyed on the bucket axis; hit mode
is a per-partition top-k merge.  Nothing here adds a join or a
window — the endpoint composes the already-audited primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.operators.es_query import compile_query
from flink_elasticsearch_ingestion_spark.operators.text import tokens

__all__ = ["es_search"]


def _match_terms(dsl, field: str) -> list[str]:
    """Every analyzed `match` term the query applies to ``field`` —
    the highlighter's term set (ES highlights the query's analyzed
    terms; phrase/term/wildcard highlighting is out of scope here)."""
    out: list[str] = []
    if isinstance(dsl, dict):
        for k, v in dsl.items():
            if k == "match" and isinstance(v, dict) and field in v:
                spec = v[field]
                query = spec["query"] if isinstance(spec, dict) else spec
                out += [t for t in query.lower().split() if t]
            else:
                out += _match_terms(v, field)
    elif isinstance(dsl, list):
        for item in dsl:
            out += _match_terms(item, field)
    return out

#: metric agg family → column-function (ES value semantics); each
#: numeric result is rounded 4dp (+1e-9) so oracle hashes are stable
_METRICS = {
    "avg": lambda c: F.round(
        F.round(F.sum(c), 2) / F.count(c) + F.lit(1e-9), 4
    ),
    "sum": lambda c: F.round(F.sum(c) + F.lit(1e-9), 4),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "value_count": lambda c: F.count(c),
    "cardinality": lambda c: F.countDistinct(c),
}

_CALENDAR = {"hour": "hour", "day": "day", "month": "month", "year": "year"}


def _metric_exprs(aggs: dict) -> list[Column]:
    """Nested metric sub-agg specs → aliased aggregate Columns."""
    out = []
    for name, spec in aggs.items():
        ((family, body),) = spec.items()
        if family == "stats":
            c = F.col(body["field"])
            out += [
                F.count(c).alias(f"{name}_count"),
                F.min(c).alias(f"{name}_min"),
                F.max(c).alias(f"{name}_max"),
                F.round(F.sum(c) + F.lit(1e-9), 4).alias(f"{name}_sum"),
                F.round(
                    F.round(F.sum(c), 2) / F.count(c) + F.lit(1e-9), 4
                ).alias(f"{name}_avg"),
            ]
        elif family in _METRICS:
            out.append(_METRICS[family](F.col(body["field"])).alias(name))
        else:
            raise ValueError(f"unsupported sub-aggregation: {family!r}")
    return out


def _sort_cols(body: dict) -> list[Column]:
    out = []
    for entry in body.get("sort", []):
        ((field, spec),) = entry.items()
        direction = spec.get("order", "asc") if isinstance(spec, dict) else spec
        if direction == "desc":
            out.append(F.col(field).desc())
        elif direction == "asc":
            out.append(F.col(field).asc())
        else:
            raise ValueError(f"unsupported sort order: {direction!r}")
    return out


def es_search(df: DataFrame, body: dict) -> DataFrame:
    """Run one ES `_search` body against a table. See module doc."""
    unknown = set(body) - {
        "query",
        "aggs",
        "sort",
        "size",
        "_source",
        "collapse",
        "highlight",
    }
    if unknown:
        raise ValueError(f"unsupported search body keys: {sorted(unknown)}")
    hits = df
    if "query" in body:
        hits = hits.where(compile_query(body["query"]))

    highlight_cols: list[str] = []
    if "highlight" in body:
        if "aggs" in body:
            raise ValueError("highlight applies to hit mode only")
        fields = body["highlight"].get("fields", {})
        pre = body["highlight"].get("pre_tags", ["<em>"])[0]
        post = body["highlight"].get("post_tags", ["</em>"])[0]
        for hfield in fields:
            terms = sorted(set(_match_terms(body.get("query", {}), hfield)))
            if not terms:
                raise ValueError(
                    f"highlight on {hfield!r} needs a match clause on it"
                )
            wrapped = F.transform(
                tokens(hfield),
                lambda t: F.when(
                    t.isin(terms), F.concat(F.lit(pre), t, F.lit(post))
                ).otherwise(t),
            )
            hits = hits.withColumn(
                f"highlight_{hfield}", F.concat_ws(" ", wrapped)
            )
            highlight_cols.append(f"highlight_{hfield}")

    if "collapse" in body:
        if "aggs" in body:
            raise ValueError("collapse and aggs are mutually exclusive")
        order_cols = _sort_cols(body)
        if not order_cols:
            raise ValueError("collapse requires an explicit sort")
        key = body["collapse"]["field"]
        k = int(body["collapse"].get("inner_hits", {}).get("size", 1))
        w = Window.partitionBy(key).orderBy(*order_cols)
        ranked = hits.withColumn(
            "inner_rank", F.row_number().over(w)
        ).where(F.col("inner_rank") <= k)
        # top `size` GROUPS by their representative under the main
        # sort; the rep frame is post-limit (bounded), so its group
        # rank window is audit-safe and the join back is a broadcast
        reps = (
            ranked.where(F.col("inner_rank") == 1)
            .orderBy(*order_cols)
            .limit(int(body.get("size", 10)))
            .withColumn(
                "group_rank", F.row_number().over(Window.orderBy(*order_cols))
            )
            .select(F.col(key).alias("__ck"), "group_rank")
        )
        out = ranked.join(
            F.broadcast(reps), ranked[key] == reps["__ck"]
        ).drop("__ck")
        cols = body.get("_source")
        if cols:
            out = out.select(
                "group_rank", "inner_rank", *cols, *highlight_cols
            )
        return out.orderBy("group_rank", "inner_rank")

    if "aggs" in body:
        if "sort" in body or "_source" in body:
            raise ValueError("aggs and hit specs are mutually exclusive here")
        if len(body["aggs"]) != 1:
            raise ValueError("exactly one top-level aggregation is supported")
        ((agg_name, spec),) = body["aggs"].items()
        sub = spec.get("aggs", {})
        ((family, fbody),) = (
            (k, v) for k, v in spec.items() if k != "aggs"
        )
        if family == "terms":
            key = F.col(fbody["field"]).alias("key")
            size = int(fbody.get("size", 10))
            order = fbody.get("order", {"_count": "desc"})
            ((order_on, direction),) = order.items()
            grouped = hits.groupBy(key).agg(
                F.count(F.lit(1)).alias("doc_count"), *_metric_exprs(sub)
            )
            if order_on == "_count":
                cols = [F.col("doc_count"), F.col("key")]
            elif order_on == "_key":
                cols = [F.col("key")]
            else:
                raise ValueError(f"unsupported terms order: {order_on!r}")
            if direction == "desc":
                cols[0] = cols[0].desc()
            elif direction != "asc":
                raise ValueError(f"unsupported order direction: {direction!r}")
            return grouped.orderBy(*cols).limit(size)
        if family == "date_histogram":
            interval = fbody["calendar_interval"]
            if interval not in _CALENDAR:
                raise ValueError(
                    f"unsupported calendar_interval: {interval!r}"
                )
            bucket = F.date_format(
                F.date_trunc(_CALENDAR[interval], F.col(fbody["field"])),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("key")
            return (
                hits.groupBy(bucket)
                .agg(F.count(F.lit(1)).alias("doc_count"), *_metric_exprs(sub))
                .orderBy("key")
            )
        if family in _METRICS or family == "stats":
            if sub:
                raise ValueError("metric aggregations take no sub-aggs")
            return hits.agg(*_metric_exprs({agg_name: {family: fbody}}))
        raise ValueError(f"unsupported aggregation family: {family!r}")

    # hit mode: _source projection, sort, size (ES defaults)
    order_cols = _sort_cols(body)
    cols = body.get("_source")
    if cols:
        hits = hits.select(*cols, *highlight_cols)
    if order_cols:
        hits = hits.orderBy(*order_cols)
    return hits.limit(int(body.get("size", 10)))
