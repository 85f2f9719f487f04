"""Table profiling: per-column statistics in ONE aggregation pass.

The data-quality profile (Deequ/Great-Expectations shape): for every
column — row count, null count, distinct count, min/max (stringified to
a uniform schema). All statistics for all columns are computed in a
SINGLE agg over a single scan (Spark evaluates the whole expression
list in one partial+final aggregate); the wide 1-row result is then
pivoted to long form row-locally with a stack expression — no
per-column scans, no driver loop.

At 100 TB the exact per-column count_distinct is the one expensive term
(it shuffles each column's distinct values); swap it for the minhash
distinct sketch (datapipe/sketches.py) when profiling fact tables —
the profile's shape stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list = None) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_str, max_str) — one row
    per profiled column, computed in one aggregation pass."""
    names = cols or df.columns
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in names:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__nd`, `{c}__min`, `{c}__max`"
        for c in names
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {stack})"
            " AS (col_name, n_null, n_distinct, min_str, max_str)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
