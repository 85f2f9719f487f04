"""Ad-hoc SQL surface: register the corpus tables as temp views so an
analyst can run plain ``spark.sql(...)`` over them — the same entry
point the reference exposes through its shell (and the switching user
expects from an analytics engine).

Because the views are plain parquet scans, everything Catalyst gives a
DataFrame plan — predicate pushdown, column pruning, broadcast
selection, AQE — applies unchanged to the SQL text. Queries written in
the common ANSI subset (explicit CASTs, no engine-specific operators)
run verbatim on DuckDB too, which is how `sql_region_orders` is
oracled: ONE string is both the Spark query and its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_views(
    spark: SparkSession, sf_dir: str, tables: list = None
) -> None:
    """Register each parquet table under ``sf_dir`` as a temp view of
    the same name. Idempotent (createOrReplaceTempView); lazy — no scan
    happens until a query references the view."""
    for t in tables or TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(
            t
        )


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ad-hoc SQL string over the corpus tables."""
    register_views(spark, sf_dir)
    return spark.sql(query)
