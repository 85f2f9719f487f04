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
        elif spark.catalog.tableExists(identifier):
            # existence decides create-vs-append explicitly: a bare
            # try/append-except/create would mask a genuine append failure
            # (schema drift, commit conflict) behind TableAlreadyExists
            writer.append()
        else:
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


def current_snapshot_id(spark: SparkSession, identifier: str) -> Optional[int]:
    """Latest snapshot id of the table — record this in chunk lineage at
    each commit point so resume knows where to roll back to. None without
    the runtime or for an empty table."""
    if not iceberg_available(spark):
        return None
    row = (
        spark.sql(
            f"SELECT snapshot_id FROM {identifier}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1"
        ).first()
    )
    return row[0] if row else None


def rollback_uncommitted(
    spark: SparkSession, identifier: str, committed_snapshot_id: Optional[int]
) -> None:
    """Iceberg counterpart of checkpoint._clean_uncommitted: restore the
    table to the last snapshot RECORDED IN LINEAGE, discarding snapshots
    committed after it (data written without a lineage record). No-op
    without the runtime — the Parquet path rolls back by deleting
    unrecorded chunk dirs. (expire_snapshots would do the opposite: keep
    the possibly-orphan latest snapshot and delete the history needed to
    roll back.)"""
    if not iceberg_available(spark) or committed_snapshot_id is None:
        return
    spark.sql(
        f"CALL genie.system.rollback_to_snapshot(table => '{identifier}', "
        f"snapshot_id => {int(committed_snapshot_id)})"
    )
