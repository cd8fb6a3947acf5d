"""As-of (time-travel) join: for each left row, attach the latest right
row with right_ts <= left_ts on the same key.

Spark has no native ASOF JOIN; this is the classic union-and-carry
rewrite — tag both sides, sort by (key, ts, side) within a single
window, and carry the last non-null right payload forward:

    union -> one shuffle on key -> last(ignorenulls) over ordered window

which is O(n log n) per key with ONE shuffle, versus the naive
range-join (broadcast-nested-loop, quadratic). At 100 TB both inputs
shuffle once on the join key — the same cost as any co-partitioned
join — and skewed keys are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on_left: str,
    on_right: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join on ``left.on_left == right.on_right``;
    ``payload_cols`` default to all right columns except key and
    timestamp.

    Tie rule: right rows sort before left rows at equal timestamps, so
    an exactly-simultaneous right row matches (<= semantics, same as
    DuckDB ASOF JOIN).
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on_right, right_ts)
    ]

    left_tagged = left.select(
        F.col(on_left).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in payload_cols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__r_ts"),
    )
    right_tagged = right.select(
        F.col(on_right).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left.select(F.struct(*left.columns)).dtypes[0][1]).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = left_tagged.unionByName(right_tagged).select(
        "__side",
        "__left",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}") for c in payload_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__matched_ts"),
    )
    return carried.filter(F.col("__side") == 1).select(
        F.col("__left.*"),
        *[F.col(f"__r_{c}").alias(c) for c in payload_cols],
        F.col("__matched_ts").alias("matched_ts"),
    )
