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
