"""Physical-plan introspection: the plan-audit checks as a library.

The 100 TB posture of this engine is enforced by READING plans, not by
hoping: scans must prune columns and carry pushed/partition filters,
joins must never degenerate to cartesian products, and the hot path
should sit inside whole-stage codegen. These helpers extract those
facts from a DataFrame's executed plan so tests (`tests/test_plans.py`)
and users (`Engine.query(...)` consumers tuning a deployment) assert
them programmatically instead of eyeballing `.explain()` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_summary(df: DataFrame) -> list[dict]:
    """One dict per file scan: read schema columns, pushed filters,
    partition filters. The things that decide I/O volume at scale.

    Rendered with ``spark.sql.maxMetadataStringLength`` raised: the
    default (100 chars) truncates longer PushedFilters lists mid-bracket
    and they'd silently parse as absent."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "100000")
    try:
        plan = physical_plan(df)
    finally:
        spark.conf.set(key, old)
    scans = []
    for m in re.finditer(r"FileScan (\w+) \[([^\]]*)\]", plan):
        # the scan's output column list (col#id, ...) IS the pruned
        # read set and always sits on the FileScan line itself
        window = plan[m.start() : m.start() + 4000]
        entry: dict = {
            "format": m.group(1),
            "columns": [
                c.strip().split("#")[0] for c in m.group(2).split(",") if c.strip()
            ],
        }
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", window)
        if pf:
            entry["pushed_filters"] = [
                f.strip() for f in pf.group(1).split(",") if f.strip()
            ]
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", window)
        if part:
            entry["partition_filters"] = [
                f.strip() for f in part.group(1).split(",") if f.strip()
            ]
        scans.append(entry)
    return scans


def codegen_span_count(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans — wider spans mean
    more of the plan runs as generated JVM code."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", physical_plan(df))))


def assert_no_accidental_quadratic_join(
    df: DataFrame, *, allow_nested_loop: bool = False
) -> None:
    """Raise AssertionError if the plan contains a cartesian product or
    (unless ``allow_nested_loop``, for 1-row scalar-subquery joins) a
    broadcast nested-loop join — both quadratic at scale."""
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, "plan contains a cartesian product"
    if not allow_nested_loop:
        assert (
            "BroadcastNestedLoopJoin" not in plan
        ), "plan contains a broadcast nested-loop join"


#: logical operators that bound their output's cardinality regardless
#: of what sits below them: a grouped aggregate emits one row per key
#: group, a limit emits at most N rows
_BOUNDING_NODES = {"Aggregate", "GlobalLimit", "LocalLimit", "Limit"}
#: leaves that ARE literal data (driver-side constant tables) — bounded
_LITERAL_LEAVES = {"LocalRelation", "OneRowRelation"}


def _jvm_children(node) -> list:
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def _subtree_is_bounded(node) -> bool:
    """True iff every leaf-to-here path passes through a cardinality-
    bounding operator (aggregate/limit) or starts at a literal relation
    — i.e. this subtree's row count is group-count/limit-sized, never
    fact-sized."""
    name = node.getClass().getSimpleName()
    if name in _BOUNDING_NODES or name in _LITERAL_LEAVES:
        return True
    children = _jvm_children(node)
    if not children:
        # unknown leaf (file relation, cached scan, stream source):
        # assume fact-sized
        return False
    return all(_subtree_is_bounded(c) for c in children)


def unpartitioned_fact_windows(df: DataFrame) -> list[str]:
    """Every ``Window`` in the optimized logical plan whose partition
    spec is EMPTY and whose input is not provably bounded (see
    ``_subtree_is_bounded``) — the ``WindowExec: No Partition Defined``
    shape that funnels a fact table through ONE task at scale.

    Windows over grouped axes (day / vocab / bucket tables) and
    post-limit frames pass by construction: an Aggregate or Limit below
    the window bounds the rows a single partition must absorb.  Returns
    one description string per offending node (empty list == clean).
    """
    offenders: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name in {"Window", "WindowGroupLimit"}:
            if node.partitionSpec().isEmpty():
                children = _jvm_children(node)
                if not all(_subtree_is_bounded(c) for c in children):
                    offenders.append(
                        f"{name} [order: {node.orderSpec().toString()}] "
                        "has no partitioning over a fact-sized input"
                    )
        for c in _jvm_children(node):
            walk(c)

    walk(df._jdf.queryExecution().optimizedPlan())
    return offenders


def assert_no_unpartitioned_fact_window(df: DataFrame) -> None:
    """Raise AssertionError if any global (unpartitioned) window runs
    over a fact-sized input — the missing twin of the quadratic-join
    audit. Fix pattern: two-phase ranking (coarse literal ranges +
    broadcast prefix offsets), see ``operators.windows.
    global_distribution_ranks`` / ``operators.sampling.
    equi_depth_buckets``."""
    offenders = unpartitioned_fact_windows(df)
    assert not offenders, "; ".join(offenders)
