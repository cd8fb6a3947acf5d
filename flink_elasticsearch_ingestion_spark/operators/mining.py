"""Frequent-pattern mining over transactional data.

Market-basket association rules (the Apriori/FP-growth family) over
the order -> items relation: which item pairs co-occur more than
their marginals predict.  The corpus-curation analog is source/topic
co-occurrence — "documents tagged A disproportionately also match B"
— the same support/confidence/lift algebra on a different fact table.

Scale shape: the item universe is projected to a bounded attribute
(or pre-pruned by min support — classic Apriori monotonicity: a pair
can only be frequent if both items are), so the within-order pair
expansion is bounded by order width squared, and the whole job is
two keyed shuffles (distinct item-per-order, then pair count).  No
driver-side candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_rules(
    lineitem: DataFrame,
    part: DataFrame,
    item_col: str = "p_brand",
    min_pair_orders: int = 5,
) -> DataFrame:
    """Association rules between item attributes co-occurring in orders.

    For each ordered pair (a -> b) seen in at least
    ``min_pair_orders`` orders:

    - ``pair_orders``: orders containing both,
    - ``support``: pair_orders / total orders,
    - ``confidence``: P(b in order | a in order),
    - ``lift``: confidence / P(b in order) — > 1 means the pair
      attracts, < 1 repels.

    All ratios are exact integer divisions done in double and rounded
    to 6 dp, so any engine reproduces them bit-for-bit.
    """
    items = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col(item_col).alias("item"))
        .distinct()
    )
    n_orders = items.select("okey").distinct().count()  # scalar, bounded
    item_orders = items.groupBy("item").agg(F.count("*").alias("item_orders"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, "okey")
        .where(F.col("a.item") != F.col("b.item"))
        .groupBy(F.col("a.item").alias("ante"), F.col("b.item").alias("cons"))
        .agg(F.count("*").alias("pair_orders"))
        .where(F.col("pair_orders") >= min_pair_orders)
    )
    ante_n = item_orders.select(
        F.col("item").alias("ante"), F.col("item_orders").alias("ante_orders")
    )
    cons_n = item_orders.select(
        F.col("item").alias("cons"), F.col("item_orders").alias("cons_orders")
    )
    nd = float(n_orders)
    return (
        pairs.join(F.broadcast(ante_n), "ante")
        .join(F.broadcast(cons_n), "cons")
        .select(
            "ante",
            "cons",
            "pair_orders",
            F.round(F.col("pair_orders") / F.lit(nd) + F.lit(1e-9), 6).alias(
                "support"
            ),
            F.round(
                F.col("pair_orders") / F.col("ante_orders") + F.lit(1e-9), 6
            ).alias("confidence"),
            F.round(
                (F.col("pair_orders") / F.col("ante_orders"))
                / (F.col("cons_orders") / F.lit(nd))
                + F.lit(1e-9),
                6,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )
