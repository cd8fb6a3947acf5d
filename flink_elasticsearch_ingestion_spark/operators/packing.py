"""Sequence packing: assign documents to fixed-capacity training bins.

Every LLM training pipeline ends by packing tokenized documents into
context-window-sized sequences. The operator here is GREEDY SEQUENTIAL
packing with deterministic order: within each packing group, documents
are taken in ``doc_id`` order and appended to the current bin until the
next one would overflow ``capacity``, which opens a new bin (a document
longer than ``capacity`` gets a bin of its own). Deterministic by
construction — re-runs and backfills produce identical bin ids.

Scale design: packing is inherently sequential WITHIN a bin stream, so
the unit of distribution is the packing group — ``(group_cols..., shard)``
where ``shard = doc_id % n_shards`` bounds the rows any single task must
scan sequentially. Groups are processed via ``applyInPandas`` (one Arrow
batch per group, a tight numpy-free loop per group): at 100 TB you size
``n_shards`` so a group is a few hundred MB, giving millions of
independent groups across executors. The greedy loop is O(rows) per
group with O(1) state — no sort beyond the per-group ordering.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(
    documents: DataFrame,
    *,
    capacity: int = 2048,
    size_col: str = "n_tokens",
    group_cols: tuple[str, ...] = ("lang",),
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, group_cols..., shard, bin_id, n_tokens) — the packing
    assignment. ``bin_id`` is local to its (group, shard) stream."""
    cols = [id_col, size_col, *group_cols]
    narrow = documents.select(*cols).withColumn("shard", F.col(id_col) % n_shards)

    keys = [*group_cols, "shard"]
    out_schema = ", ".join(
        [f"{id_col} long", f"{size_col} long"]
        + [f"{c} string" for c in group_cols]
        + ["shard long", "bin_id long"]
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bin_ids = []
        bin_id, fill = 0, 0
        for size in pdf[size_col]:
            size = int(size)
            if fill > 0 and fill + size > capacity:
                bin_id += 1
                fill = 0
            fill += size
            bin_ids.append(bin_id)
        pdf = pdf.copy()
        pdf["bin_id"] = bin_ids
        return pdf[[id_col, size_col, *group_cols, "shard", "bin_id"]]

    return narrow.groupBy(*keys).applyInPandas(pack_group, schema=out_schema)


def packing_summary(assignments: DataFrame, *, capacity: int, size_col: str = "n_tokens") -> DataFrame:
    """Per-(group, shard) packing efficiency: bins used vs the
    theoretical minimum (ceil(total/capacity)) and fill ratio."""
    group_cols = [c for c in assignments.columns if c not in ("doc_id", size_col, "bin_id")]
    per_bin = assignments.groupBy(*group_cols, "bin_id").agg(
        F.sum(size_col).alias("bin_fill"), F.count(F.lit(1)).alias("n_docs")
    )
    return (
        per_bin.groupBy(*group_cols)
        .agg(
            F.countDistinct("bin_id").alias("n_bins"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("bin_fill").alias("total_tokens"),
            F.max("bin_fill").alias("max_fill"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("total_tokens") / (F.col("n_bins") * capacity) + 1e-9, 6),
        )
        .orderBy(*group_cols)
    )


def balanced_shards(
    df: DataFrame,
    *,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 8,
    coarse_edges: tuple[int, ...] = (80, 65, 50, 35, 20),
) -> DataFrame:
    """Snake-balanced shard assignment — the training-export last mile:
    documents sort by size DESC and deal into ``n_shards`` in
    boustrophedon order (0..N-1, N-1..0, ...), the classic LPT-style
    heuristic that keeps every shard's TOKEN total within one document
    of its neighbors, so no data-parallel worker stalls on a fat shard.
    ``pack_documents`` bins docs into fixed-capacity sequences; this
    balances TOTALS across a fixed shard count — the other half of the
    export contract.

    The global size rank uses the two-phase discipline of
    ``equi_depth_buckets`` (no single-partition window): literal
    DESCENDING ``coarse_edges`` range-bucket the size column (the
    coarse bucket is a prefix of the DESC sort key, so coarse order ==
    global order), ``row_number`` ranks within each range in parallel,
    and broadcast prefix-sum offsets of the tiny per-range count table
    lift within-range ranks to exact global ranks. Edge choice only
    balances work, never results.

    Returns per-shard stats: doc/token totals plus the size extremes,
    the table a launch checklist reads to confirm the split is flat.
    """
    from pyspark.sql import Window

    # edges are descending thresholds; the when-chain tests the largest
    # edge first so each row lands in the first range it clears
    coarse = F.lit(len(coarse_edges))
    for i, e in reversed(list(enumerate(coarse_edges))):
        coarse = F.when(F.col(size_col) >= F.lit(e), F.lit(i)).otherwise(coarse)
    narrow = df.select(
        F.col(id_col).alias("__id"),
        F.col(size_col).cast("bigint").alias("__v"),
        coarse.alias("__coarse"),
    )
    within = F.row_number().over(
        Window.partitionBy("__coarse").orderBy(F.col("__v").desc(), "__id")
    )
    counts = narrow.groupBy("__coarse").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        "__coarse",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__coarse").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__offset"),
    )
    ranked = narrow.withColumn("__within", within).join(
        F.broadcast(offsets), "__coarse"
    )
    rank0 = F.col("__offset") + F.col("__within") - 1  # 0-based global rank
    pos = rank0 % (2 * n_shards)
    shard = F.when(pos < n_shards, pos).otherwise(2 * n_shards - 1 - pos)
    return (
        ranked.select(shard.cast("int").alias("shard"), "__v")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__v").cast("bigint").alias("total_tokens"),
            F.min("__v").cast("bigint").alias("min_tokens"),
            F.max("__v").cast("bigint").alias("max_tokens"),
        )
        .orderBy("shard")
    )
