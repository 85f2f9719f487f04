"""Market-basket association-rule mining (Agrawal & Srikant 1994) as one
distributed plan — the a-priori 2-itemset tier with support / confidence
/ lift, integer-exact in ppm.

Scale shape: the basket table deduplicates to distinct (basket, item)
once; baskets above ``basket_cap`` items are dropped BEFORE the pair
self-join (the classic guard — pair fan-out is quadratic in basket size,
so one pathological mega-basket would otherwise dominate the stage);
pair generation is an equi-join on the basket key (both sides hash-
partition on it, never a cartesian); the support cut applies at the
pair-count aggregate so only surviving 2-itemsets reach the rule-
assembly joins, which are keyed on single items (dimension-sized). The
lift ppm is computed as ``conf_ppm * n_baskets // n_cons`` — the
two-step floor shared verbatim with the DuckDB twin keeps every
intermediate inside signed-64 up to ~9e12 baskets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    basket_cap: int = 64,
) -> DataFrame:
    """Directional rules (ante → cons) for all co-occurring item pairs
    with pair support >= ``min_pair_support``: (ante, cons, n_ab,
    n_ante, n_cons, support_ppm, conf_ppm, lift_ppm)."""
    b = baskets.select(
        F.col(basket_col).alias("o"), F.col(item_col).alias("i")
    ).distinct()
    keep = b.groupBy("o").agg(F.count(F.lit(1)).alias("bsz")).filter(
        F.col("bsz") <= int(basket_cap)
    ).select("o")
    bc = b.join(keep, "o", "left_semi")
    x, y = bc.alias("x"), bc.alias("y")
    pairs = x.join(
        y,
        (F.col("x.o") == F.col("y.o")) & (F.col("x.i") < F.col("y.i")),
    ).select(F.col("x.i").alias("ia"), F.col("y.i").alias("ib"))
    c = pairs.groupBy("ia", "ib").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab")
    ).filter(F.col("n_ab") >= int(min_pair_support))
    itn = bc.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("n_i"))
    nb = bc.agg(F.count_distinct("o").cast("long").alias("n_baskets"))
    dirs = c.select(
        F.col("ia").alias("ante"), F.col("ib").alias("cons"), "n_ab"
    ).unionByName(
        c.select(F.col("ib").alias("ante"), F.col("ia").alias("cons"), "n_ab")
    )
    return (
        dirs.join(itn.select(F.col("i").alias("ante"),
                             F.col("n_i").alias("n_ante")), "ante")
        .join(itn.select(F.col("i").alias("cons"),
                         F.col("n_i").alias("n_cons")), "cons")
        .crossJoin(F.broadcast(nb))
        .select(
            "ante",
            "cons",
            "n_ab",
            "n_ante",
            "n_cons",
            F.expr("(n_ab * 1000000L) div n_baskets").alias("support_ppm"),
            F.expr("(n_ab * 1000000L) div n_ante").alias("conf_ppm"),
            F.expr(
                "((n_ab * 1000000L) div n_ante) * n_baskets div n_cons"
            ).alias("lift_ppm"),
        )
    )
