"""Custom join operators Spark lacks natively — as-of and banded range
joins, expressed as compositions of existing DataFrame ops (the task's
preferred order: composition > pandas UDF > mapPartitions).

The as-of join is the union-window formulation: instead of a per-probe
binary search (the single-node implementation), both sides union into
one frame ordered by (key, ts, side) and a running last-non-null carries
each build row forward to every later probe row of the same key — ONE
key-partitioned window, no join at all, which is exactly the shape that
scales (kdb/pandas merge_asof semantics, distributed).

The range join replaces the naive |probe| × |bands| cross-join-filter
with integer bucket keys: each band explodes into the fixed-width
buckets it overlaps, each probe row computes its single bucket, and the
equi-join on the bucket bounds candidates before the exact range filter
(the standard interval-join bucketization; Spark's own optimized range
join exists only in Databricks' runtime)."""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "tus",
    payload_cols: Optional[List[str]] = None,
    keep_build_ts_as: Optional[str] = "asof_ts",
) -> DataFrame:
    """For every probe row, attach the LATEST build row of the same key
    with build.ts ≤ probe.ts (inclusive; pandas merge_asof / kdb aj
    semantics). Probe rows with no earlier build row keep NULL payloads.

    Both frames must carry ``key_cols`` + ``ts_col``; ``payload_cols``
    (default: every build column not in keys/ts) are carried over.
    Same-instant determinism: build rows order before probe rows at
    equal ts (so a probe AT a build's timestamp sees it), and multiple
    build rows at one instant resolve to the LAST under a final
    ``_tie`` ordering column if present, else payload order.

    Scale shape (100 TB): NO join — one union and ONE window
    partitioned by the key (running last-non-null, rows unbounded
    preceding). Per-key history must fit a task; for hot keys
    pre-split by coarse time range (the window then runs per
    (key, range) with a carried boundary row — the standard
    distributed merge_asof refinement)."""
    keys = list(key_cols)
    if payload_cols is None:
        payload_cols = [
            c for c in build.columns if c not in keys and c != ts_col
        ]
    b = build.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    probe_cols = [c for c in probe.columns if c not in keys and c != ts_col]
    p = probe.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(b.schema[f"_p_{c}"].dataType).alias(f"_p_{c}")
          for c in payload_cols],
        *probe_cols,
    )
    b = b.select(
        *keys, "_ts", "_side",
        *[f"_p_{c}" for c in payload_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_cols],
    )
    from pyspark.sql import Window

    u = b.unionByName(p)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", *[f"_p_{c}" for c in payload_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *keys, "_ts", "_side", *probe_cols,
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
        F.last(
            F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True
        ).over(w).alias("_bts"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    out = out.withColumnRenamed("_ts", ts_col)
    if keep_build_ts_as:
        out = out.withColumnRenamed("_bts", keep_build_ts_as)
    else:
        out = out.drop("_bts")
    return out


def range_join(
    probe: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 10,
) -> DataFrame:
    """Band (interval) join: each probe row matches every band with
    ``lo ≤ value < hi`` — WITHOUT the cross-join-filter shape (which is
    |probe|×|bands| and unrunnable at scale). Bands explode into the
    fixed-width integer buckets they overlap (row-local, fan-out =
    band width / bucket_width); probe rows compute their single bucket;
    the equi-join on the bucket key bounds candidates, and the exact
    range predicate refines. Pick ``bucket_width`` near the typical
    band width so candidate fan-out stays O(1) per probe row.

    Works on integer-valued columns (cast/scale floats first — the
    determinism discipline everywhere else in this repo)."""
    bk = F.floor(F.col(value_col) / bucket_width).cast("long")
    eb = bands.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # hi is exclusive: the last overlapped bucket is the one
                # containing hi - 1
                F.floor((F.col(hi_col) - 1) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        probe.withColumn("_bk", bk)
        .join(eb, "_bk")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bk")
    )
