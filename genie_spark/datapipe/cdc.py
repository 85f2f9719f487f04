"""Change-data-capture apply: MERGE INTO semantics as one plan.

The lakehouse upsert: a current snapshot plus a change log (upserts and
deletes, possibly several per key) reconciled into the next snapshot.
Built scale-first:

* the change log folds to ONE winning change per key with a
  partial-aggregatable ``max(struct(ts, change_id, op, payload))`` —
  later timestamp wins, change_id breaks exact ts ties, so the fold is
  partition-invariant and never needs a per-key sort;
* the fold joins the snapshot FULL OUTER on the key — both sides hash-
  partition on the merge key, the single shuffle each side;
* row fate is a row-local CASE: survive unchanged / update / insert /
  drop (delete).

No window over the change log (a per-key row_number would sort every
key's history); the struct-max fold is the associative form that
partial-aggregates map-side at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    payload: str,
    op_col: str = "op",
    ts_col: str = "ts",
    id_col: str = "change_id",
) -> DataFrame:
    """Next snapshot ``(key, payload)`` after applying the change log.
    ``op`` is 'upsert' or 'delete'; latest (ts, change_id) per key
    wins."""
    win = changes.groupBy(key).agg(
        F.max(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("cid"),
                F.col(op_col).alias("op"),
                F.col(payload).alias("pay"),
            )
        ).alias("w")
    ).select(
        key, F.col("w.op").alias("__op"), F.col("w.pay").alias("__pay")
    )
    merged = snapshot.withColumn("__snap", F.lit(1)).join(
        win, key, "full_outer"
    )
    return merged.filter(
        # delete drops the row; a delete for an absent key is a no-op.
        # presence marker, NOT the payload column: a legitimately-null
        # payload must still survive an untouched row.
        (F.col("__op").isNull() & F.col("__snap").isNotNull())
        | (F.col("__op") == "upsert")
    ).select(
        key,
        F.when(F.col("__op") == "upsert", F.col("__pay"))
        .otherwise(F.col(payload))
        .alias(payload),
    )


def apply_changes_audit(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    payload: str,
    **kw,
) -> DataFrame:
    """One audit row: (n_snapshot, n_changes, n_result, n_inserted,
    n_deleted) — the counts a MERGE INTO reports."""
    result = apply_changes(snapshot, changes, key, payload, **kw)
    ins = result.join(snapshot.select(key), key, "left_anti")
    del_ = snapshot.select(key).join(result.select(key), key, "left_anti")
    return (
        snapshot.agg(F.count(F.lit(1)).cast("long").alias("n_snapshot"))
        .crossJoin(
            changes.agg(F.count(F.lit(1)).cast("long").alias("n_changes"))
        )
        .crossJoin(
            result.agg(F.count(F.lit(1)).cast("long").alias("n_result"))
        )
        .crossJoin(
            ins.agg(F.count(F.lit(1)).cast("long").alias("n_inserted"))
        )
        .crossJoin(
            del_.agg(F.count(F.lit(1)).cast("long").alias("n_deleted"))
        )
    )
