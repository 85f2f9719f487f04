"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

One entry per implemented operator family (SURVEY.md §2 + the
training-data pipeline ops). Each Spark callable takes (spark, sf_dir)
and must produce EXACTLY the rows of its ORACLES[...] DuckDB SQL on the
same parquet tables (order-insensitive value-hash): identical column
names, integer columns cast to bigint, floats rounded to 6 via the same
formulas, and all hashing through the cross-engine ``h60`` primitive.

Queries without an oracle entry (constrained generation, multimodal
feature extraction) get the driver's rows-only check; their exactness is
covered by the pytest parity suites instead (Spark vs pure-Python oracle,
tests/test_spark_pipeline.py).
"""

from __future__ import annotations

import os
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .metrics import POISSON1_CDF

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def _register(name: str, oracle: str = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# shared derivations: triple sets from lineitem (sample = order;
# relation = l_returnflag; object = part). target = shipped before 1996,
# pred = quantity > 25 — two deterministic, overlapping triple sets.
# ---------------------------------------------------------------------------

_CUT = "1996-01-01"
_QTY = 25

_TRIPLES_SQL = f"""
  trg AS (SELECT DISTINCT l_orderkey, l_returnflag, l_partkey FROM lineitem
          WHERE l_shipdate < TIMESTAMP '{_CUT}'),
  prd AS (SELECT DISTINCT l_orderkey, l_returnflag, l_partkey FROM lineitem
          WHERE l_quantity > {_QTY})
"""


def _pred_target_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order: pred/target as array<struct<s,r,o>> (exercises
    the real metrics module input shape)."""
    li = _t(spark, sf_dir, "lineitem")
    def sets(cond, name):
        return (
            li.filter(cond)
            .select(
                "l_orderkey",
                F.struct(
                    F.col("l_orderkey").cast("string").alias("s"),
                    F.col("l_returnflag").alias("r"),
                    F.col("l_partkey").cast("string").alias("o"),
                ).alias("t"),
            )
            .groupBy("l_orderkey")
            .agg(F.array_distinct(F.collect_list("t")).alias(name))
        )
    trg = sets(F.col("l_shipdate") < _CUT, "target")
    prd = sets(F.col("l_quantity") > _QTY, "pred")
    empty = F.array().cast("array<struct<s:string,r:string,o:string>>")
    return (
        trg.join(prd, "l_orderkey", "full")
        .select(
            F.col("l_orderkey").alias("id"),
            F.coalesce("pred", empty).alias("pred"),
            F.coalesce("target", empty).alias("target"),
        )
    )


_PRF_SQL = """
  c AS (SELECT count(*) AS n FROM trg JOIN prd USING (l_orderkey, l_returnflag, l_partkey)),
  tots AS (SELECT (SELECT n FROM c) AS n_correct,
                  (SELECT count(*) FROM prd) AS n_pred,
                  (SELECT count(*) FROM trg) AS n_target)
"""


# -- A1: micro precision/recall/F1 ------------------------------------------

@_register(
    "micro_prf",
    f"""
WITH {_TRIPLES_SQL}, {_PRF_SQL}
SELECT round(CASE WHEN n_pred = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_pred END, 6) AS precision,
       round(CASE WHEN n_target = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_target END, 6) AS recall,
       round(CASE WHEN (CASE WHEN n_pred = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_pred END)
                     + (CASE WHEN n_target = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_target END) = 0
             THEN 0.0
             ELSE 2 * (CASE WHEN n_pred = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_pred END)
                    * (CASE WHEN n_target = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_target END)
                  / ((CASE WHEN n_pred = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_pred END)
                     + (CASE WHEN n_target = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_target END)) END, 6) AS f1,
       n_correct::BIGINT AS n_correct, n_pred::BIGINT AS n_pred, n_target::BIGINT AS n_target
FROM tots
""",
)
def micro_prf(spark, sf_dir):
    from .metrics import micro_metrics

    df = micro_metrics(_pred_target_df(spark, sf_dir))
    return df.select(
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
        F.col("n_correct").cast("bigint").alias("n_correct"),
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_target").cast("bigint").alias("n_target"),
    )


# -- A2: per-relation (macro) metrics ----------------------------------------

_PER_REL_SQL = f"""
WITH {_TRIPLES_SQL},
rels AS (SELECT l_returnflag FROM trg UNION SELECT l_returnflag FROM prd),
cnt AS (
  SELECT r.l_returnflag AS rel,
         (SELECT count(*) FROM trg t JOIN prd p USING (l_orderkey, l_returnflag, l_partkey)
          WHERE t.l_returnflag = r.l_returnflag) AS n_correct,
         (SELECT count(*) FROM prd WHERE l_returnflag = r.l_returnflag) AS n_pred,
         (SELECT count(*) FROM trg WHERE l_returnflag = r.l_returnflag) AS n_target
  FROM rels r
),
scored AS (
  SELECT rel,
         CASE WHEN n_pred = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_pred END AS p,
         CASE WHEN n_target = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_target END AS r2,
         n_correct, n_pred, n_target
  FROM cnt
)
"""


@_register(
    "macro_by_relation",
    _PER_REL_SQL
    + """
SELECT rel, round(p, 6) AS precision, round(r2, 6) AS recall,
       round(CASE WHEN p + r2 = 0 THEN 0.0 ELSE 2 * p * r2 / (p + r2) END, 6) AS f1,
       n_correct::BIGINT AS n_correct, n_pred::BIGINT AS n_pred, n_target::BIGINT AS n_target
FROM scored
""",
)
def macro_by_relation(spark, sf_dir):
    from .metrics import per_relation_metrics

    df = per_relation_metrics(_pred_target_df(spark, sf_dir))
    return df.select(
        "rel",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
        F.col("n_correct").cast("bigint").alias("n_correct"),
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_target").cast("bigint").alias("n_target"),
    )


@_register(
    "macro_mean",
    _PER_REL_SQL
    + """
SELECT round(avg(p), 6) AS macro_precision,
       round(avg(r2), 6) AS macro_recall,
       round(avg(CASE WHEN p + r2 = 0 THEN 0.0 ELSE 2 * p * r2 / (p + r2) END), 6) AS macro_f1,
       count(*)::BIGINT AS n_relations
FROM scored
""",
)
def macro_mean(spark, sf_dir):
    """A2 final form: unweighted mean of per-relation micro scores
    (reference evaluation.py:67-78)."""
    from .metrics import macro_metrics

    df = macro_metrics(_pred_target_df(spark, sf_dir))
    return df.select(
        F.round("macro_precision", 6).alias("macro_precision"),
        F.round("macro_recall", 6).alias("macro_recall"),
        F.round("macro_f1", 6).alias("macro_f1"),
        F.col("n_relations").cast("bigint").alias("n_relations"),
    )


@_register(
    "macro_mean_target_rels",
    _PER_REL_SQL
    + """
SELECT round(avg(p), 6) AS macro_precision,
       round(avg(r2), 6) AS macro_recall,
       round(avg(CASE WHEN p + r2 = 0 THEN 0.0 ELSE 2 * p * r2 / (p + r2) END), 6) AS macro_f1,
       count(*)::BIGINT AS n_relations
FROM scored WHERE n_target > 0
""",
)
def macro_mean_target_rels(spark, sf_dir):
    """A2, reference averaging set: only relations with ≥1 target
    occurrence enter the mean (MacroMetricsEvaluator,
    evaluators.py:84-87) — a hallucinated pred-only relation adds no
    zero-F1 group."""
    from .metrics import macro_metrics

    df = macro_metrics(_pred_target_df(spark, sf_dir), target_relations_only=True)
    return df.select(
        F.round("macro_precision", 6).alias("macro_precision"),
        F.round("macro_recall", 6).alias("macro_recall"),
        F.round("macro_f1", 6).alias("macro_f1"),
        F.col("n_relations").cast("bigint").alias("n_relations"),
    )


# -- A3: bucketed metrics -----------------------------------------------------

@_register(
    "bucket_metrics",
    _PER_REL_SQL.replace("\nSELECT rel,", "\nSELECT rel,", 1)
    + f""",
train AS (SELECT l_returnflag AS rel, count(*) AS cnt FROM lineitem
          WHERE l_linenumber = 1 GROUP BY 1),
bucketed AS (
  SELECT coalesce(floor(log2(t.cnt))::BIGINT, -1) AS bucket,
         s.n_correct, s.n_pred, s.n_target
  FROM scored s LEFT JOIN train t ON s.rel = t.rel
),
agg AS (
  SELECT bucket, sum(n_correct) AS n_correct, sum(n_pred) AS n_pred,
         sum(n_target) AS n_target, count(*) AS n_relations
  FROM bucketed GROUP BY 1
)
SELECT bucket,
       round(CASE WHEN n_pred = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_pred END, 6) AS precision,
       round(CASE WHEN n_target = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_target END, 6) AS recall,
       n_relations::BIGINT AS n_relations,
       n_correct::BIGINT AS n_correct, n_pred::BIGINT AS n_pred, n_target::BIGINT AS n_target
FROM agg
""",
)
def bucket_metrics_q(spark, sf_dir):
    from .metrics import bucket_metrics

    li = _t(spark, sf_dir, "lineitem")
    train = (
        li.filter(F.col("l_linenumber") == 1)
        .groupBy(F.col("l_returnflag").alias("rel"))
        .count()
    )
    df = bucket_metrics(_pred_target_df(spark, sf_dir), train)
    return df.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.col("n_relations").cast("bigint").alias("n_relations"),
        F.col("n_correct").cast("bigint").alias("n_correct"),
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_target").cast("bigint").alias("n_target"),
    )


# -- A4: zero-shot relation-group metrics ------------------------------------

_ZS_GROUPS = [("A", "seen"), ("N", "ignored"), ("R", "dropped")]


@_register(
    "zero_shot_groups",
    _PER_REL_SQL
    + f""",
gmap AS (SELECT * FROM (VALUES {', '.join(f"('{r}','{g}')" for r, g in _ZS_GROUPS)}) AS v(rel, grp)),
agg AS (
  SELECT coalesce(g.grp, 'seen') AS "group",
         sum(s.n_correct) AS n_correct, sum(s.n_pred) AS n_pred, sum(s.n_target) AS n_target
  FROM scored s LEFT JOIN gmap g ON s.rel = g.rel GROUP BY 1
)
SELECT "group",
       round(CASE WHEN n_pred = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_pred END, 6) AS precision,
       round(CASE WHEN n_target = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_target END, 6) AS recall,
       n_correct::BIGINT AS n_correct, n_pred::BIGINT AS n_pred, n_target::BIGINT AS n_target
FROM agg
""",
)
def zero_shot_groups(spark, sf_dir):
    from .metrics import zero_shot_metrics

    groups = spark.createDataFrame(_ZS_GROUPS, ["rel", "group"])
    df = zero_shot_metrics(_pred_target_df(spark, sf_dir), groups)
    return df.select(
        "group",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.col("n_correct").cast("bigint").alias("n_correct"),
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_target").cast("bigint").alias("n_target"),
    )


@_register(
    "micro_recall_only",
    f"""
WITH {_TRIPLES_SQL}, {_PRF_SQL}
SELECT round(CASE WHEN n_target = 0 THEN 0.0 ELSE n_correct::DOUBLE / n_target END, 6) AS recall,
       n_correct::BIGINT AS n_correct, n_target::BIGINT AS n_target
FROM tots
""",
)
def micro_recall_only(spark, sf_dir):
    """FewRel evaluation mode (results_full.yaml:76-80): only recall is
    computable when the gold annotation is one triple per sample."""
    from .metrics import micro_metrics

    out = micro_metrics(_pred_target_df(spark, sf_dir), recall_only=True)
    return out.select(
        F.round("recall", 6).alias("recall"),
        F.col("n_correct").cast("bigint").alias("n_correct"),
        F.col("n_target").cast("bigint").alias("n_target"),
    )


# -- A5: deterministic bootstrap ----------------------------------------------

_N_BOOT = 20


@_register(
    "bootstrap_micro",
    f"""
WITH {_TRIPLES_SQL},
per_order AS (
  SELECT o.l_orderkey,
         coalesce(c.n, 0) AS n_correct, coalesce(p.n, 0) AS n_pred, coalesce(t.n, 0) AS n_target
  FROM (SELECT l_orderkey FROM trg UNION SELECT l_orderkey FROM prd) o
  LEFT JOIN (SELECT l_orderkey, count(*) n FROM trg JOIN prd USING (l_orderkey, l_returnflag, l_partkey) GROUP BY 1) c USING (l_orderkey)
  LEFT JOIN (SELECT l_orderkey, count(*) n FROM prd GROUP BY 1) p USING (l_orderkey)
  LEFT JOIN (SELECT l_orderkey, count(*) n FROM trg GROUP BY 1) t USING (l_orderkey)
),
runs AS (SELECT unnest(generate_series(0, {_N_BOOT - 1})) AS run),
weighted AS (
  SELECT r.run, po.n_correct, po.n_pred, po.n_target,
         (('0x' || substr(md5(r.run::VARCHAR || chr(1) || po.l_orderkey::VARCHAR), 1, 15))::UBIGINT::BIGINT % 1000000) / 1000000.0 AS u
  FROM per_order po CROSS JOIN runs r
),
w AS (
  SELECT run, n_correct, n_pred, n_target,
         CASE WHEN u < {POISSON1_CDF[0]!r} THEN 0
              WHEN u < {POISSON1_CDF[1]!r} THEN 1
              WHEN u < {POISSON1_CDF[2]!r} THEN 2
              WHEN u < {POISSON1_CDF[3]!r} THEN 3
              WHEN u < {POISSON1_CDF[4]!r} THEN 4
              ELSE 5 END AS wt
  FROM weighted
),
per_run AS (
  SELECT run, sum(n_correct * wt) AS c, sum(n_pred * wt) AS p, sum(n_target * wt) AS t
  FROM w GROUP BY 1
),
scored AS (
  SELECT CASE WHEN p = 0 THEN 0.0 ELSE c::DOUBLE / p END AS precision,
         CASE WHEN t = 0 THEN 0.0 ELSE c::DOUBLE / t END AS recall,
         CASE WHEN (CASE WHEN p = 0 THEN 0.0 ELSE c::DOUBLE / p END)
                 + (CASE WHEN t = 0 THEN 0.0 ELSE c::DOUBLE / t END) = 0 THEN 0.0
              ELSE 2 * (CASE WHEN p = 0 THEN 0.0 ELSE c::DOUBLE / p END)
                     * (CASE WHEN t = 0 THEN 0.0 ELSE c::DOUBLE / t END)
                   / ((CASE WHEN p = 0 THEN 0.0 ELSE c::DOUBLE / p END)
                      + (CASE WHEN t = 0 THEN 0.0 ELSE c::DOUBLE / t END)) END AS f1
  FROM per_run
)
SELECT 'precision' AS metric, round(avg(precision), 6) AS mean, round(stddev_pop(precision), 6) AS std FROM scored
UNION ALL
SELECT 'recall', round(avg(recall), 6), round(stddev_pop(recall), 6) FROM scored
UNION ALL
SELECT 'f1', round(avg(f1), 6), round(stddev_pop(f1), 6) FROM scored
""",
)
def bootstrap_micro_q(spark, sf_dir):
    from .metrics import bootstrap_micro

    df = bootstrap_micro(
        _pred_target_df(spark, sf_dir), n_runs=_N_BOOT, hash_mode="md5"
    )
    return df.select(
        "metric", F.round("mean", 6).alias("mean"), F.round("std", 6).alias("std")
    )


_PRF_CASES = """
  SELECT CASE WHEN p = 0 THEN 0.0 ELSE c::DOUBLE / p END AS precision,
         CASE WHEN t = 0 THEN 0.0 ELSE c::DOUBLE / t END AS recall,
         CASE WHEN (CASE WHEN p = 0 THEN 0.0 ELSE c::DOUBLE / p END)
                 + (CASE WHEN t = 0 THEN 0.0 ELSE c::DOUBLE / t END) = 0 THEN 0.0
              ELSE 2 * (CASE WHEN p = 0 THEN 0.0 ELSE c::DOUBLE / p END)
                     * (CASE WHEN t = 0 THEN 0.0 ELSE c::DOUBLE / t END)
                   / ((CASE WHEN p = 0 THEN 0.0 ELSE c::DOUBLE / p END)
                      + (CASE WHEN t = 0 THEN 0.0 ELSE c::DOUBLE / t END)) END AS f1
  FROM per_run
"""


def _multinomial_draw_sql():
    """h60(j) base hash + salt-keyed affine remix — the DuckDB twins of
    the Spark expressions in metrics.bootstrap_micro_multinomial."""
    from .datapipe.hashes import affine_mix_sql, h60_sql

    return {
        "h_base": h60_sql("j::VARCHAR"),
        "mix": affine_mix_sql("i.h", "r.run"),
    }


@_register(
    "bootstrap_micro_multinomial",
    f"""
WITH {_TRIPLES_SQL},
per_order AS (
  SELECT o.l_orderkey,
         coalesce(c.n, 0) AS n_correct, coalesce(p.n, 0) AS n_pred, coalesce(t.n, 0) AS n_target
  FROM (SELECT l_orderkey FROM trg UNION SELECT l_orderkey FROM prd) o
  LEFT JOIN (SELECT l_orderkey, count(*) n FROM trg JOIN prd USING (l_orderkey, l_returnflag, l_partkey) GROUP BY 1) c USING (l_orderkey)
  LEFT JOIN (SELECT l_orderkey, count(*) n FROM prd GROUP BY 1) p USING (l_orderkey)
  LEFT JOIN (SELECT l_orderkey, count(*) n FROM trg GROUP BY 1) t USING (l_orderkey)
),
idx AS (SELECT *, row_number() OVER (ORDER BY l_orderkey) - 1 AS j FROM per_order),
nn AS (SELECT count(*) AS n FROM per_order),
runs AS (SELECT unnest(generate_series(0, {_N_BOOT - 1})) AS run),
based AS (SELECT j, {{h_base}} AS h FROM idx),
draws AS (
  SELECT r.run, ({{mix}}) % n.n AS pick
  FROM based i CROSS JOIN runs r CROSS JOIN nn n
),
w AS (SELECT run, pick, count(*) AS wt FROM draws GROUP BY 1, 2),
per_run AS (
  SELECT w.run, sum(i.n_correct * wt) AS c, sum(i.n_pred * wt) AS p, sum(i.n_target * wt) AS t
  FROM w JOIN idx i ON w.pick = i.j GROUP BY 1
),
scored AS ({_PRF_CASES})
SELECT 'precision' AS metric, round(avg(precision), 6) AS mean, round(stddev_samp(precision), 6) AS std FROM scored
UNION ALL
SELECT 'recall', round(avg(recall), 6), round(stddev_samp(recall), 6) FROM scored
UNION ALL
SELECT 'f1', round(avg(f1), 6), round(stddev_samp(f1), 6) FROM scored
""".format(**_multinomial_draw_sql()),
)
def bootstrap_micro_multinomial_q(spark, sf_dir):
    """Exact multinomial bootstrap (reference evaluation.py:12-26 estimator
    form: n draws with replacement per run, sample std) beside the Poisson
    approximation — deterministic hash draws, no RNG."""
    from .metrics import bootstrap_micro_multinomial

    df = bootstrap_micro_multinomial(
        _pred_target_df(spark, sf_dir), n_runs=_N_BOOT, hash_mode="md5"
    )
    return df.select(
        "metric", F.round("mean", 6).alias("mean"), F.round("std", 6).alias("std")
    )


# -- A6/A7: occurrence + status tallies ---------------------------------------

@_register(
    "relation_occurrence",
    "SELECT event_type AS rel, count(*)::BIGINT AS count FROM events GROUP BY 1",
)
def relation_occurrence(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("rel"))
        .agg(F.count("*").cast("bigint").alias("count"))
    )


@_register(
    "status_tally",
    "SELECT o_orderstatus AS status, count(*)::BIGINT AS count FROM orders GROUP BY 1",
)
def status_tally(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").cast("bigint").alias("count"))
    )


# -- A8/SO2: coverage via anti-join -------------------------------------------

@_register(
    "relation_coverage",
    f"""
WITH {_TRIPLES_SQL}
SELECT l_returnflag AS rel FROM trg
EXCEPT
SELECT l_returnflag AS rel FROM prd
""",
)
def relation_coverage_q(spark, sf_dir):
    from .metrics import relation_coverage

    return relation_coverage(_pred_target_df(spark, sf_dir))


# -- W1/W2: top-k per group ----------------------------------------------------

@_register(
    "topk_per_group",
    """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def topk_per_group(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
    )


@_register(
    "skew_profile",
    f"""
WITH sk_c AS (
  SELECT 'P' || l_partkey AS key, count(*)::BIGINT AS cnt
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
  GROUP BY 1),
sk_t AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS nkeys FROM sk_c)
SELECT key, cnt,
       (cnt * 1000000 // total)::BIGINT AS share_ppm,
       (cnt * 1000000 * nkeys // total)::BIGINT AS hot_ratio_ppm
FROM sk_c, sk_t
ORDER BY cnt DESC, key LIMIT 20
""",
)
def skew_profile_q(spark, sf_dir):
    """Shuffle-skew diagnosis for the triple OBJECT key before the
    graph-materialize dedup shuffle: top-20 heaviest keys with corpus
    share and hot-key ratio in integer ppm — the numbers that pick
    salt_buckets (canonicalize.key_skew_profile: one partial-agg
    groupBy + TakeOrderedAndProject, no global sort)."""
    from .canonicalize import key_skew_profile

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    keyed = li.select(
        F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("k")
    )
    return key_skew_profile(keyed, "k", top_n=20)


@_register(
    "asof_enrich",
    """
WITH aj_b AS (
  SELECT user_id, epoch_us(ts) AS tus, 0 AS side,
         event_id AS click_eid, value AS click_value,
         NULL::BIGINT AS event_id
  FROM events WHERE event_type = 'click'),
aj_p AS (
  SELECT user_id, epoch_us(ts) AS tus, 1 AS side,
         NULL::BIGINT AS click_eid, NULL::DOUBLE AS click_value,
         event_id
  FROM events),
aj_u AS (SELECT * FROM aj_b UNION ALL SELECT * FROM aj_p),
aj_w AS (
  SELECT user_id, tus, side, event_id,
         last_value(click_eid IGNORE NULLS) OVER w AS click_eid,
         last_value(click_value IGNORE NULLS) OVER w AS click_value,
         last_value(CASE WHEN side = 0 THEN tus END IGNORE NULLS) OVER w
           AS asof_ts
  FROM aj_u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY tus, side, click_eid, click_value
               ROWS UNBOUNDED PRECEDING))
SELECT event_id, user_id, tus, click_eid, click_value, asof_ts
FROM aj_w WHERE side = 1
""",
)
def asof_enrich_q(spark, sf_dir):
    """AS-OF JOIN (pandas merge_asof / kdb aj semantics, distributed):
    every event is enriched with the user's latest click AT OR BEFORE
    it. Union-window formulation — NO join node: one key-partitioned
    window carries each build row forward via running last-non-null
    (datapipe/joins.py asof_join; the oracle runs the identical spec
    through DuckDB's window engine rather than its native ASOF JOIN, so
    the tie semantics are pinned by construction)."""
    from .datapipe.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    tus = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    probe = ev.select("event_id", "user_id", tus.alias("tus"))
    build = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        tus.alias("tus"),
        F.col("event_id").alias("click_eid"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        probe, build, ["user_id"], ts_col="tus",
        payload_cols=["click_eid", "click_value"],
    )
    return out.select(
        "event_id", "user_id", "tus", "click_eid", "click_value", "asof_ts"
    )


_QTY_BANDS = [("low", 1, 11), ("mid", 8, 30), ("high", 25, 51)]


@_register(
    "range_band_join",
    f"""
WITH rb_bands AS (
  SELECT * FROM (VALUES
    {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _QTY_BANDS)}
  ) t(band, lo, hi)),
rb_p AS (SELECT l_quantity::INT AS value FROM lineitem)
SELECT b.band,
       count(*)::BIGINT AS n_rows,
       sum(p.value)::BIGINT AS qty_sum
FROM rb_p p JOIN rb_bands b ON p.value >= b.lo AND p.value < b.hi
GROUP BY 1
""",
)
def range_band_join_q(spark, sf_dir):
    """RANGE (interval/band) JOIN without the cross-join-filter shape:
    overlapping quantity tiers explode into fixed-width integer
    buckets, probe rows equi-join on their single bucket, the exact
    range predicate refines — candidate fan-out O(band/bucket), never
    |probe|×|bands| (datapipe/joins.py range_join; the oracle is the
    plain range-predicate join, the semantic spec)."""
    from .datapipe.joins import range_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("int").alias("value")
    )
    bands = spark.createDataFrame(_QTY_BANDS, ["band", "lo", "hi"])
    out = range_join(li, bands, "value", bucket_width=10)
    return out.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("value").cast("long").alias("qty_sum"),
    )


@_register(
    "event_rates_hopping",
    """
WITH hw_b AS (
  SELECT epoch_us(ts) AS tus, event_type,
         round(value * 1000000)::BIGINT AS v_ppm
  FROM events),
hw_w AS (
  SELECT ((tus // 900000000) - i) * 900000000 AS win_start_us,
         event_type, v_ppm
  FROM hw_b, unnest(generate_series(0, 1)) AS t(i))
SELECT win_start_us, event_type,
       count(*)::BIGINT AS n_events,
       sum(v_ppm)::BIGINT AS value_sum_ppm
FROM hw_w GROUP BY 1, 2
""",
)
def event_rates_hopping_q(spark, sf_dir):
    """Hopping-window event aggregation (30-min windows, 15-min hop) in
    integer epoch-microsecond arithmetic — the batch twin of the
    streaming windowed rates, engine-exact where native window
    functions draw boundaries differently. Constant ≤2× explode then
    ONE partial-agg groupBy; value sums ppm-quantized
    (datapipe/sampling.py hopping_window_rates)."""
    from .datapipe.sampling import hopping_window_rates

    return hopping_window_rates(
        _t(spark, sf_dir, "events"), window_minutes=30, hop_minutes=15
    )


@_register(
    "sessionize",
    """
WITH se_ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
se_lag AS (
  SELECT user_id, event_id, tus,
         lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
  FROM se_ev),
se_flag AS (
  SELECT user_id, event_id, tus,
         CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS ns
  FROM se_lag),
se_num AS (
  SELECT user_id, tus,
         sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM se_flag)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*)::BIGINT AS n_events,
       min(tus)::BIGINT AS start_us,
       max(tus)::BIGINT AS end_us,
       (max(tus) - min(tus))::BIGINT AS duration_us
FROM se_num GROUP BY 1, 2
""",
)
def sessionize_q(spark, sf_dir):
    """Gap-based sessionization of the event log (30-min inactivity
    gap): per-user lag marks session starts, per-user running sum
    numbers them, one aggregate per session. Both windows PARTITIONED BY
    user — no global sort; timestamps as integer epoch microseconds for
    cross-engine exactness (datapipe/sampling.py sessionize)."""
    from .datapipe.sampling import sessionize

    out = sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)
    return out.select(
        "user_id",
        F.col("session_idx").cast("bigint").alias("session_idx"),
        "n_events",
        "start_us",
        "end_us",
        "duration_us",
    )


# -- J1-analog: broadcast canonicalization join chain --------------------------

@_register(
    "canonicalize_join",
    """
SELECT r.r_name, count(*)::BIGINT AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
""",
)
def canonicalize_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


# -- J6: dimension dedup --------------------------------------------------------

@_register(
    "dedup_dimension",
    """
WITH uniq AS (SELECT p_name FROM part GROUP BY 1 HAVING count(*) = 1)
SELECT p.p_partkey AS id, p.p_name AS name
FROM part p JOIN uniq u ON p.p_name = u.p_name
""",
)
def dedup_dimension(spark, sf_dir):
    from .canonicalize import dedup_catalog

    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.lit("en_title").alias("provenance"),
    )
    return dedup_catalog(part).select("id", "name")


# -- X1/X2: linearization round-trip --------------------------------------------

@_register(
    "linearize_roundtrip",
    """
WITH tr AS (SELECT DISTINCT l_orderkey,
                   l_orderkey::VARCHAR AS s, l_returnflag AS r, l_partkey::VARCHAR AS o
            FROM lineitem),
lin AS (SELECT l_orderkey,
               string_agg(' <sub> ' || s || ' <rel> ' || r || ' <obj> ' || o || ' <et>', ''
                          ORDER BY s, r, o) AS lin,
               count(*) AS n
        FROM tr GROUP BY 1)
SELECT l_orderkey, n::BIGINT AS n_parsed, md5(lin) AS lin_md5 FROM lin
""",
)
def linearize_roundtrip(spark, sf_dir):
    from .triples import format_triples_col, parse_triples_col

    li = _t(spark, sf_dir, "lineitem")
    triples = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_orderkey").cast("string").alias("s"),
                F.col("l_returnflag").alias("r"),
                F.col("l_partkey").cast("string").alias("o"),
            ).alias("t"),
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.array_distinct(F.collect_list("t"))).alias("triples"))
        # format+parse below are interpreted HOFs over every triple —
        # compute-bound, so spread past AQE's byte-light coalescing
        .repartition(spark.sparkContext.defaultParallelism)
    )
    lin = triples.withColumn("lin", format_triples_col(F.col("triples")))
    parsed = lin.withColumn("parsed", parse_triples_col(F.col("lin")))
    return parsed.select(
        "l_orderkey",
        F.size("parsed").cast("bigint").alias("n_parsed"),
        F.md5("lin").alias("lin_md5"),
    )


# -- P1/F1/F2/F4/F5: KILT dataset-load filter pipeline ----------------------------

_KILT_DROP = "R"    # F2: drop the whole sample if any triple has this relation
_KILT_IGNORE = "N"  # F4: remove individual triples with this relation


@_register(
    "kilt_filters",
    f"""
WITH tr AS (SELECT DISTINCT l_orderkey,
                   l_orderkey::VARCHAR AS s, l_returnflag AS r, l_partkey::VARCHAR AS o
            FROM lineitem),
samples AS (
  SELECT t.l_orderkey AS id,
         CASE o.o_orderstatus WHEN 'F' THEN 'title' WHEN 'O' THEN 'label' ELSE 'none' END AS status,
         t.s, t.r, t.o
  FROM tr t JOIN orders o ON t.l_orderkey = o.o_orderkey
),
f1 AS (SELECT * FROM samples WHERE status IN ('title', 'label')),
f2 AS (SELECT * FROM f1 WHERE id NOT IN (SELECT id FROM f1 WHERE r = '{_KILT_DROP}')),
f4 AS (SELECT * FROM f2 WHERE r <> '{_KILT_IGNORE}'),
lin AS (SELECT id,
               count(*) AS n_triples,
               string_agg(' <sub> ' || s || ' <rel> ' || r || ' <obj> ' || o || ' <et>', ''
                          ORDER BY s, r, o) AS target
        FROM f4 GROUP BY 1)
SELECT id, n_triples::BIGINT AS n_triples, md5(target) AS target_md5 FROM lin
""",
)
def kilt_filters(spark, sf_dir):
    """F1 matching-status filter → F2 relations-drop → F4 per-triple ignore
    + re-linearize → F5 empty-target drop (reference datasets.py:92-201),
    over a KILT-shaped table derived from lineitem/orders."""
    from .kilt import (
        drop_ignored_relations,
        filter_matching_status,
        filter_relations_drop,
    )

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    samples = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_orderkey").cast("string").alias("s"),
                F.col("l_returnflag").alias("r"),
                F.col("l_partkey").cast("string").alias("o"),
            ).alias("t"),
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.array_distinct(F.collect_list("t"))).alias("surface_triples"))
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .select(
            F.col("l_orderkey").alias("id"),
            F.when(F.col("o_orderstatus") == "F", "title")
            .when(F.col("o_orderstatus") == "O", "label")
            .otherwise("none")
            .alias("instance_matching_status"),
            "surface_triples",
        )
        .withColumn("target", F.lit(""))
    )
    out = filter_matching_status(samples, allowed=("title", "label"))
    out = filter_relations_drop(out, [_KILT_DROP])
    out = drop_ignored_relations(out, [_KILT_IGNORE])
    return out.select(
        "id",
        F.size("surface_triples").cast("bigint").alias("n_triples"),
        F.md5("target").alias("target_md5"),
    )


# -- J2: id→surface annotation with match statuses --------------------------------

@_register(
    "annotate_id_triples",
    """
WITH idt AS (
  SELECT DISTINCT 'S' || l_suppkey::VARCHAR AS s_id,
         'P' || l_linenumber::VARCHAR AS r_id,
         'T' || l_partkey::VARCHAR AS o_id
  FROM lineitem
),
ents AS (
  SELECT 'S' || s_suppkey::VARCHAR AS id, s_name AS name, 'en_title' AS provenance FROM supplier
  UNION ALL
  SELECT 'T' || p_partkey::VARCHAR, p_name, 'en_label' FROM part
),
rels AS (SELECT 'P' || n_nationkey::VARCHAR AS id, n_name AS name FROM nation WHERE n_nationkey BETWEEN 1 AND 5),
ann AS (
  SELECT i.s_id, i.r_id, i.o_id,
         es.name AS s, CASE WHEN es.name IS NULL THEN 'no_match'
                            WHEN es.provenance = 'en_title' THEN 'title' ELSE 'label' END AS s_status,
         eo.name AS o, CASE WHEN eo.name IS NULL THEN 'no_match'
                            WHEN eo.provenance = 'en_title' THEN 'title' ELSE 'label' END AS o_status,
         r.name AS r, CASE WHEN r.name IS NULL THEN 'no_match' ELSE 'title' END AS r_status
  FROM idt i LEFT JOIN ents es ON i.s_id = es.id
             LEFT JOIN ents eo ON i.o_id = eo.id
             LEFT JOIN rels r ON i.r_id = r.id
)
SELECT s_id, r_id, o_id, coalesce(s, '') AS s, coalesce(r, '') AS r, coalesce(o, '') AS o,
       s_status, r_status, o_status,
       CASE WHEN s_status = 'no_match' OR r_status = 'no_match' OR o_status = 'no_match' THEN 'no_match'
            WHEN s_status = 'label' OR o_status = 'label' THEN 'label'
            ELSE 'title' END AS triple_status
FROM ann
""",
)
def annotate_id_triples(spark, sf_dir):
    """J2 broadcast annotation join (reference triplet_utils.py:38-68,
    surface_forms_utils.py:180-232): gold id-triples → surface forms with
    per-position and rolled-up match statuses."""
    from .canonicalize import id_to_surface

    li = _t(spark, sf_dir, "lineitem")
    idt = li.select(
        F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("s_id"),
        F.concat(F.lit("P"), F.col("l_linenumber").cast("string")).alias("r_id"),
        F.concat(F.lit("T"), F.col("l_partkey").cast("string")).alias("o_id"),
    ).distinct()
    supplier = _t(spark, sf_dir, "supplier").select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("id"),
        F.col("s_name").alias("name"),
        F.lit("en_title").alias("provenance"),
    )
    part = _t(spark, sf_dir, "part").select(
        F.concat(F.lit("T"), F.col("p_partkey").cast("string")).alias("id"),
        F.col("p_name").alias("name"),
        F.lit("en_label").alias("provenance"),
    )
    ents = supplier.unionByName(part)
    rels = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey").between(1, 5))
        .select(
            F.concat(F.lit("P"), F.col("n_nationkey").cast("string")).alias("id"),
            F.col("n_name").alias("name"),
        )
    )
    out = id_to_surface(idt, ents, rels)
    # null-free output: unmatched names surface as '' (status columns carry
    # the no_match signal) so cross-engine row hashing never sees NULL
    return out.select(
        "s_id", "r_id", "o_id",
        F.coalesce("s", F.lit("")).alias("s"),
        F.coalesce("r", F.lit("")).alias("r"),
        F.coalesce("o", F.lit("")).alias("o"),
        "s_status", "r_status", "o_status", "triple_status",
    )


# -- X3: sentence splitting (reference REBEL semantics) --------------------------

@_register(
    "sentence_split",
    """
WITH seeded AS (
  SELECT doc_id, replace(text, ' the ', '. the ') AS text FROM documents
),
paras AS (
  SELECT doc_id, p, pidx
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS p,
               generate_subscripts(string_split(text, chr(10)), 1) AS pidx
        FROM seeded)
  WHERE length(p) > 0
),
sents AS (
  SELECT doc_id, pidx, s, sidx
  FROM (SELECT doc_id, pidx,
               unnest(string_split(replace(p, '. ', '.' || chr(1)), chr(1))) AS s,
               generate_subscripts(string_split(replace(p, '. ', '.' || chr(1)), chr(1)), 1) AS sidx
        FROM paras)
  WHERE trim(s) <> ''
),
ordered AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY pidx, sidx) - 1 AS sent_idx,
         regexp_replace(s || ' ', '\\s{2,}', ' ', 'g') AS sent
  FROM sents
)
SELECT doc_id, sent_idx::BIGINT AS sent_idx, md5(sent) AS sent_md5 FROM ordered
""",
)
def sentence_split(spark, sf_dir):
    from .extract import sentences_df

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.replace(F.col("text"), F.lit(" the "), F.lit(". the ")).alias("text")
    )
    out = sentences_df(docs)
    return out.select(
        "doc_id",
        F.col("sent_idx").cast("bigint").alias("sent_idx"),
        F.md5("input").alias("sent_md5"),
    )


@_register(
    "sentence_split_bounded",
    """
WITH seeded AS (
  SELECT doc_id, replace(text, ' the ', '. the ') AS text FROM documents
),
bnd AS (
  SELECT doc_id,
         [struct_pack(s := length(text) // 4, e := length(text) // 4 + 10),
          struct_pack(s := (2 * length(text)) // 3, e := (2 * length(text)) // 3 + 10)] AS bs
  FROM seeded
),
paras AS (
  SELECT doc_id, p, pidx
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS p,
               generate_subscripts(string_split(text, chr(10)), 1) AS pidx
        FROM seeded)
  WHERE length(p) > 0
),
sents AS (
  SELECT doc_id, pidx, s, sidx
  FROM (SELECT doc_id, pidx,
               unnest(string_split(replace(p, '. ', '.' || chr(1)), chr(1))) AS s,
               generate_subscripts(string_split(replace(p, '. ', '.' || chr(1)), chr(1)), 1) AS sidx
        FROM paras)
),
pos AS (
  SELECT n.*, b.bs,
         sum(length(s) + 1) OVER (PARTITION BY n.doc_id ORDER BY pidx, sidx
                                  ROWS UNBOUNDED PRECEDING) AS p,
         (sidx = max(sidx) OVER (PARTITION BY n.doc_id, pidx)) AS para_last
  FROM sents n JOIN bnd b ON n.doc_id = b.doc_id
),
flagged AS (
  SELECT *, (para_last OR len(list_filter(bs, x -> x.s < p AND p < x.e)) = 0) AS kept
  FROM pos
),
grp AS (
  SELECT *, coalesce(sum(CASE WHEN kept THEN 1 ELSE 0 END) OVER (
              PARTITION BY doc_id ORDER BY pidx, sidx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS g
  FROM flagged
),
units AS (
  SELECT doc_id, g,
         regexp_replace(string_agg(s, ' ' ORDER BY pidx, sidx) || ' ',
                        '\\s{2,}', ' ', 'g') AS unit
  FROM grp GROUP BY doc_id, g
),
emitted AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY g) - 1 AS sent_idx, unit
  FROM units WHERE trim(unit) <> ''
)
SELECT doc_id, sent_idx::BIGINT AS sent_idx, md5(unit) AS sent_md5 FROM emitted
""",
)
def sentence_split_bounded(spark, sf_dir):
    """Boundary-aware split over a synthetic annotated table: seeded
    sentence breaks plus two deterministic entity spans per doc (at 1/4
    and 2/3 of the text, 10 chars wide) — split points inside a span are
    suppressed, merging sentences (reference
    convert_rebel_data2kilt.py:98-105 semantics)."""
    from .extract import sentences_bounded_df

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" the "), F.lit(". the ")).alias("text"),
    )
    ln = F.length("text")
    q1 = F.floor(ln / 4).cast("long")
    q2 = F.floor((ln * 2) / 3).cast("long")
    annotated = docs.withColumn(
        "boundaries",
        F.array(
            F.struct(q1.alias("s"), (q1 + 10).alias("e")),
            F.struct(q2.alias("s"), (q2 + 10).alias("e")),
        ),
    )
    out = sentences_bounded_df(annotated)
    return out.select(
        "doc_id",
        F.col("sent_idx").cast("bigint").alias("sent_idx"),
        F.md5("input").alias("sent_md5"),
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings tables)
# ---------------------------------------------------------------------------

# DuckDB twin of h60 (see datapipe/hashes.py)
def _h60_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::UBIGINT::BIGINT)"


# shared shingle CTE (word 3-shingles, distinct per doc; docs shorter than
# 3 words contribute the whole text — matches shingles_col semantics).
# Parameterized by source table so cascade oracles can run the chain over
# an upstream CTE instead of the base documents table.
def _shingles_sql(table: str = "documents") -> str:
    return f"""
  w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM {table}),
  nw AS (SELECT doc_id, count(*) AS n FROM w GROUP BY 1),
  sh AS (
    SELECT DISTINCT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS shingle
    FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
             JOIN w c ON a.doc_id = c.doc_id AND c.ord = a.ord + 2
    UNION
    SELECT d.doc_id, d.text FROM {table} d JOIN nw ON d.doc_id = nw.doc_id AND nw.n < 3
  )
"""


_SHINGLES_SQL = _shingles_sql()


@_register(
    "dedup_exact",
    """
SELECT md5(text) AS text_hash, min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_dups
FROM documents GROUP BY 1
""",
)
def dedup_exact(spark, sf_dir):
    from .datapipe.dedup import exact_dedup

    out = exact_dedup(_t(spark, sf_dir, "documents"))
    return out.select(
        "text_hash",
        F.col("keep_id").cast("bigint").alias("keep_id"),
        F.col("n_dups").cast("bigint").alias("n_dups"),
    )


_MINHASH_N = 16
_MINHASH_BANDS = 4
_MINHASH_T = 0.5


def _minhash_params_sql() -> str:
    from .datapipe.hashes import minhash_params

    vals = ", ".join(
        f"({j}, {a}, {b}, {c})"
        for j, (a, b, c) in enumerate(minhash_params(_MINHASH_N))
    )
    return f"(VALUES {vals}) AS v(j, a, b, c)"


def _minhash_banded_sql(table: str = "documents") -> str:
    """WITH-body (no leading WITH) computing MinHash signatures + LSH
    band keys over ``{table}(doc_id, text)`` — ends in CTEs
    ``sig(doc_id, sig)`` and ``banded(doc_id, band, bkey)``."""
    return f"""{_shingles_sql(table)},
hbase AS (SELECT doc_id, {_h60_sql("shingle")} AS h FROM sh),
params AS (SELECT * FROM {_minhash_params_sql()}),
mh AS (
  SELECT doc_id, j,
         min(((a * (h >> 30) + c) % 2147483647) * 2147483648
             + ((b * (h & 1073741823) + c) % 2147483647)) AS mv
  FROM hbase CROSS JOIN params GROUP BY 1, 2
),
sig AS (SELECT doc_id, list(mv ORDER BY j) AS sig FROM mh GROUP BY 1),
banded AS (
  SELECT doc_id, b.band,
         md5(array_to_string(sig[b.band * {_MINHASH_N // _MINHASH_BANDS} + 1 :
                                 (b.band + 1) * {_MINHASH_N // _MINHASH_BANDS}], ',')) AS bkey
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASH_BANDS - 1})) AS band) b
)"""


def _minhash_chain_sql(table: str = "documents") -> str:
    """WITH-body (no leading WITH) computing the MinHash near-dup chain
    over ``{table}(doc_id, text)`` — ends in CTE ``est(id_a, id_b, ej)``."""
    return f"""{_minhash_banded_sql(table)},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.id_a, c.id_b,
         len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2]))::DOUBLE / {_MINHASH_N} AS ej
  FROM cand c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
)"""


_MINHASH_ORACLE = (
    f"WITH {_minhash_chain_sql('documents')}\n"
    f"SELECT id_a, id_b, round(ej, 6) AS est_jaccard FROM est WHERE ej >= {_MINHASH_T}"
)


@_register("dedup_minhash_lsh", None)
def dedup_minhash_lsh(spark, sf_dir):
    from .datapipe.dedup import minhash_jaccard_pairs

    return minhash_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        threshold=_MINHASH_T,
    )


ORACLES["dedup_minhash_lsh"] = _MINHASH_ORACLE


@_register(
    "dedup_ngram_jaccard",
    f"""
WITH {_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS nc
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(nc::DOUBLE / (sa.n + sb.n - nc), 6) AS jaccard
FROM common JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
WHERE nc::DOUBLE / (sa.n + sb.n - nc) >= 0.5
""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    from .datapipe.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


_NGRAM_MAX_DF = 3


@_register(
    "dedup_ngram_jaccard_dfcut",
    f"""
WITH {_SHINGLES_SQL},
rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= {_NGRAM_MAX_DF}),
shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS nc
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(nc::DOUBLE / (sa.n + sb.n - nc), 6) AS jaccard
FROM common JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
WHERE nc::DOUBLE / (sa.n + sb.n - nc) >= 0.5
""",
)
def dedup_ngram_jaccard_dfcut(spark, sf_dir):
    """Web-scale variant: shingles in > max_df docs are dropped before the
    self-join (stopword semantics), bounding the hottest join key at
    max_df·(max_df−1)/2 pairs regardless of corpus size."""
    from .datapipe.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_df=_NGRAM_MAX_DF
    )


def _simhash_sql(bits: int = 16) -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN ({_h60_sql('word')} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    val = " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits))
    return f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
sums AS (
  SELECT doc_id,
         {sums}
  FROM w GROUP BY 1
)
SELECT doc_id, ({val})::BIGINT AS simhash FROM sums
"""


@_register("dedup_simhash", _simhash_sql(16))
def dedup_simhash(spark, sf_dir):
    from .datapipe.dedup import simhash_table

    return simhash_table(_t(spark, sf_dir, "documents"))


@_register(
    "embedding_neardup",
    """
WITH base AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS v,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS n
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.n * b.n), 6) AS cosine
FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])) / (a.n * b.n) >= 0.3
""",
)
def embedding_neardup(spark, sf_dir):
    from .datapipe.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), block_col="label", threshold=0.3
    )


@_register("embedding_neardup_lsh", None)
def embedding_neardup_lsh(spark, sf_dir):
    """Corpus-safe near-dup default: hyperplane-LSH buckets as the
    blocking key, so the within-block all-pairs term is bounded by the
    bucket size, not the corpus size."""
    from .datapipe.dedup import embedding_neardup_lsh_pairs

    return embedding_neardup_lsh_pairs(
        _t(spark, sf_dir, "embeddings"), n_planes=4, threshold=0.3,
        dim=len(ANN_QUERY),
    )


@_register("hard_negatives", None)
def hard_negatives_q(spark, sf_dir):
    """Hard-negative mining for contrastive/embedding training:
    same-LSH-bucket pairs with cosine >= 0.3 but DIFFERENT labels —
    the pairs a metric-learning loss needs most. Same corpus-safe
    blocking as the embedding near-dup tier; the label predicate is a
    free ride-along (datapipe/dedup.py hard_negative_pairs)."""
    from .datapipe.dedup import hard_negative_pairs

    return hard_negative_pairs(
        _t(spark, sf_dir, "embeddings"), n_planes=4, threshold=0.3,
        dim=len(ANN_QUERY),
    )


def _install_hard_negatives_oracle():
    from .datapipe.similarity import hard_negatives_lsh_sql

    ORACLES["hard_negatives"] = hard_negatives_lsh_sql(
        n_planes=4, dim=len(ANN_QUERY), threshold=0.3
    )


@_register("dedup_semantic", None)
def dedup_semantic(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540) as a Spark plan: hash-seeded
    clustering of the embedding space bounds the quadratic pair term to
    within-cell self-joins; every vector with a cosine-≥-threshold
    neighbor of smaller id in its cell is dropped. Returns the
    SURVIVORS (vec_id, cell) — engine-exact vs the data-derived DuckDB
    twin (semantic_dedup_sql)."""
    from .datapipe.similarity import ivf_centroids, semantic_dedup_survivors

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, n_cells=_IVF_CELLS)
    return semantic_dedup_survivors(emb, cents, threshold=_SEMDEDUP_T)


_SEMDEDUP_T = 0.3


@_register("dedup_components", None)
def dedup_components(spark, sf_dir):
    """Transitive duplicate clustering: MinHash-LSH candidate pairs as
    the edge list, distributed connected components (min-label
    propagation + pointer jumping, datapipe/graph.py) as the closure,
    every document labeled with its component = min doc_id reachable
    through near-dup edges (singletons label themselves). Pairwise
    keep-min under-deletes on A~B~C chains; this is the production
    CCNet/RefinedWeb-style cluster step. Oracle: DuckDB recursive CTE
    over the same edge SQL."""
    from .datapipe.dedup import minhash_jaccard_pairs
    from .datapipe.graph import components_with_singletons

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_jaccard_pairs(
        docs, num_hashes=_MINHASH_N, bands=_MINHASH_BANDS,
        threshold=_MINHASH_T,
    )
    return components_with_singletons(
        docs.select("doc_id"), pairs, "doc_id"
    )


ORACLES["dedup_components"] = (
    f"WITH RECURSIVE {_minhash_chain_sql('documents')},\n"
    f"""edges AS (
  SELECT id_a AS u, id_b AS w FROM est WHERE ej >= {_MINHASH_T}
  UNION ALL
  SELECT id_b, id_a FROM est WHERE ej >= {_MINHASH_T}
),
reach(v, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.v
),
comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v)
SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
"""
)


@_register("dedup_cluster_sizes", None)
def dedup_cluster_sizes(spark, sf_dir):
    """Duplicate-cluster size histogram — the audit number a dedup run
    reports (how much mass sits in clusters of size 2, 3, ...; size-1 =
    unique docs). Composes the connected-components closure with two
    counter-sized aggregates: component → size, size → (n_clusters,
    n_docs). Both groupBys partial-aggregate; output is
    histogram-sized."""
    from .datapipe.dedup import minhash_jaccard_pairs
    from .datapipe.graph import components_with_singletons

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_jaccard_pairs(
        docs, num_hashes=_MINHASH_N, bands=_MINHASH_BANDS,
        threshold=_MINHASH_T,
    )
    comp = components_with_singletons(docs.select("doc_id"), pairs, "doc_id")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
    )


_MIX_SQL = """
WITH cnt AS (SELECT source, count(*)::BIGINT AS n_docs
             FROM documents GROUP BY 1),
cw AS (SELECT source, n_docs, CAST(floor(sqrt(n_docs)) AS BIGINT) AS w
       FROM cnt),
tot AS (SELECT sum(w)::BIGINT AS sw, sum(n_docs)::BIGINT AS nt FROM cw)
SELECT source, n_docs, w,
       ((w * 1000000) // sw)::BIGINT AS weight_ppm,
       (((w * 1000000) // sw) * nt // n_docs)::BIGINT AS upsample_ppm
FROM cw CROSS JOIN tot
"""


@_register("source_mix_weights", _MIX_SQL)
def source_mix_weights_q(spark, sf_dir):
    """Temperature-based source mixture reweighting (weights ∝ n^0.5 —
    the head-flattening sampling trick for multi-domain corpora),
    integer-exact because floor(sqrt(bigint)) is the correctly-rounded
    IEEE value in both engines; per-source share and relative
    over/under-sampling multiplier in ppm. Entirely dimension-sized:
    one per-source count + one broadcast total
    (datapipe/sampling.py source_mix_weights)."""
    from .datapipe.sampling import source_mix_weights

    return source_mix_weights(_t(spark, sf_dir, "documents"), "source")


_SWEEP_PPM = [250000, 500000, 625000, 750000, 875000, 1000000]


def _dedup_sweep_sql() -> str:
    lits = ", ".join(str(t) for t in _SWEEP_PPM)
    return (
        f"WITH {_minhash_chain_sql('documents')},\n"
        f"""th AS (SELECT unnest([{lits}]) AS t_ppm)
SELECT t_ppm::BIGINT AS t_ppm, count(*)::BIGINT AS n_pairs
FROM th JOIN est ON ej >= t_ppm / 1000000.0
GROUP BY 1
"""
    )


@_register("dedup_threshold_sweep", None)
def dedup_threshold_sweep_q(spark, sf_dir):
    """Threshold-sensitivity sweep for the MinHash near-dup tier: pair
    counts at six Jaccard cut points from ONE candidate generation —
    the tuning audit run before committing a dedup threshold at scale
    (signatures, banding, and the estimate join are paid once; the
    sweep itself is a tiny explode + filter over the already-LSH-
    bounded candidate pairs). Thresholds are multiples of 1/16 = the
    signature granularity, so every comparison is float-exact in both
    engines (datapipe/dedup.py minhash_jaccard_pairs at threshold 0)."""
    from .datapipe.dedup import minhash_jaccard_pairs

    est = minhash_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=_MINHASH_N, bands=_MINHASH_BANDS, threshold=0.0,
    )
    th = F.explode(
        F.expr("array(" + ", ".join(f"{t}L" for t in _SWEEP_PPM) + ")")
    ).alias("t_ppm")
    return (
        est.select("est_jaccard", th)
        .filter(F.col("est_jaccard") >= F.col("t_ppm") / F.lit(1000000.0))
        .groupBy("t_ppm")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


ORACLES["dedup_threshold_sweep"] = _dedup_sweep_sql()


def _leak_split_cuts():
    from .datapipe.sampling import split_thresholds

    return dict(split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1}))


@_register("leakage_safe_split", None)
def leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test assignment: split membership is a
    pure function of the document's NEAR-DUP COMPONENT label, not its
    own id, so no pair of near-duplicates ever straddles train and
    eval (the contamination mode document-level hashing cannot prevent
    — Lee et al. 2022 §5). Composition of two already-oracled tiers:
    MinHash-LSH edges → distributed connected components → hash-residue
    split over the component representative (sampling.assign_split
    keyed on `component`). Per-doc output (doc_id, component, split);
    the no-straddle property holds by construction since split is a
    function of component. Scale: adds ZERO work beyond the components
    closure — the assignment is one row-local hash."""
    from .datapipe.dedup import minhash_jaccard_pairs
    from .datapipe.graph import components_with_singletons
    from .datapipe.sampling import assign_split

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_jaccard_pairs(
        docs, num_hashes=_MINHASH_N, bands=_MINHASH_BANDS,
        threshold=_MINHASH_T,
    )
    comp = components_with_singletons(docs.select("doc_id"), pairs, "doc_id")
    out = assign_split(
        comp, {"train": 0.8, "val": 0.1, "test": 0.1},
        id_col="component", salt="lsplit",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("component"),
        "split",
    )


def _leakage_safe_split_sql() -> str:
    from .datapipe.sampling import residue_sql

    cuts = _leak_split_cuts()
    r = residue_sql("component", "lsplit")
    return (
        f"WITH RECURSIVE {_minhash_chain_sql('documents')},\n"
        f"""edges AS (
  SELECT id_a AS u, id_b AS w FROM est WHERE ej >= {_MINHASH_T}
  UNION ALL
  SELECT id_b, id_a FROM est WHERE ej >= {_MINHASH_T}
),
reach(v, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.v
),
comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
lbl AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
SELECT doc_id::BIGINT AS doc_id, component::BIGINT AS component,
       CASE WHEN ({r}) < {cuts['test']} THEN 'test'
            WHEN ({r}) < {cuts['train']} THEN 'train'
            ELSE 'val' END AS split
FROM lbl
"""
    )


ORACLES["leakage_safe_split"] = _leakage_safe_split_sql()


ORACLES["dedup_cluster_sizes"] = (
    f"WITH RECURSIVE {_minhash_chain_sql('documents')},\n"
    f"""edges AS (
  SELECT id_a AS u, id_b AS w FROM est WHERE ej >= {_MINHASH_T}
  UNION ALL
  SELECT id_b, id_a FROM est WHERE ej >= {_MINHASH_T}
),
reach(v, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.v
),
comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
lbl AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
szs AS (SELECT component, count(*)::BIGINT AS sz FROM lbl GROUP BY 1)
SELECT sz AS cluster_size, count(*)::BIGINT AS n_clusters,
       sum(sz)::BIGINT AS n_docs
FROM szs GROUP BY 1
"""
)


# -- KG analytics ----------------------------------------------------------------
#
# Once the engine has constructed and canonicalized a KG, users run graph
# analytics over it. These queries build a deterministic 4-relation KG
# from the relational tables (the same entity universe the metric queries
# use): order -[returnflag]-> part -[supplied_by]-> supplier
# -[based_in]-> nation -[part_of]-> region; entity ids are type-prefixed
# strings so the id spaces never collide.

_KG_EDGES_SQL = """
  kg_edges AS (
    SELECT DISTINCT 'O' || l_orderkey AS src, 'P' || l_partkey AS dst FROM lineitem
    UNION
    SELECT DISTINCT 'P' || l_partkey, 'S' || l_suppkey FROM lineitem
    UNION
    SELECT DISTINCT 'S' || s_suppkey, 'N' || s_nationkey FROM supplier
    UNION
    SELECT DISTINCT 'N' || n_nationkey, 'R' || n_regionkey FROM nation
  )
"""

_KG_SEED_MOD = 997
_PR_ITERS = 5
_PR_SCALE = 10**12


def _kg_edges_df(spark, sf_dir) -> DataFrame:
    """Spark twin of _KG_EDGES_SQL — DISTINCT directed (src, dst)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")

    # Both lineitem edge types explode from ONE struct array so lineitem
    # (the only fact-sized input) is scanned once, not twice; and the
    # DISTINCT runs on typed (tag, long, long) rows — each edge type owns
    # a disjoint tag, so pair-level dedup equals string-level dedup while
    # the shuffle rows are narrower and hash/compare on longs, with the
    # "O123"-style labels built row-locally AFTER the dedup. Same row set
    # as the oracle's UNION ALL + DISTINCT over the concatenated labels.
    def pair(tg, a, b):
        return F.struct(
            F.lit(tg).cast("int").alias("tg"),
            F.col(a).cast("long").alias("k1"),
            F.col(b).cast("long").alias("k2"),
        )

    # Spread the single-row-group lineitem scan BEFORE the explode: one
    # scan = one task here, so the explode + map-side distinct hashing of
    # 2x|lineitem| rows would serialize on one core (the old two-scan
    # form at least got two). The repartition moves only the three
    # pruned key columns, once; consumers that reference the edge
    # subtree k times (k_hop, walks) re-execute it k times, so the map
    # stage must be parallel.
    from .datapipe.dedup import spread_for_compute

    li_pairs = spread_for_compute(
        li.select("l_orderkey", "l_partkey", "l_suppkey")
    ).select(
        F.explode(
            F.array(
                pair(0, "l_orderkey", "l_partkey"),
                pair(1, "l_partkey", "l_suppkey"),
            )
        ).alias("e")
    ).select("e.tg", "e.k1", "e.k2")
    pairs = (
        li_pairs
        .union(sup.select(pair(2, "s_suppkey", "s_nationkey").alias("e")).select("e.tg", "e.k1", "e.k2"))
        .union(nat.select(pair(3, "n_nationkey", "n_regionkey").alias("e")).select("e.tg", "e.k1", "e.k2"))
        .distinct()
    )
    src_tag = F.element_at(F.array(F.lit("O"), F.lit("P"), F.lit("S"), F.lit("N")), F.col("tg") + 1)
    dst_tag = F.element_at(F.array(F.lit("P"), F.lit("S"), F.lit("N"), F.lit("R")), F.col("tg") + 1)
    return pairs.select(
        F.concat(src_tag, F.col("k1").cast("string")).alias("src"),
        F.concat(dst_tag, F.col("k2").cast("string")).alias("dst"),
    )


@_register(
    "kg_degree",
    f"""
WITH {_KG_EDGES_SQL}
SELECT coalesce(o.entity, i.entity) AS entity,
       coalesce(out_deg, 0)::BIGINT AS out_deg,
       coalesce(in_deg, 0)::BIGINT AS in_deg,
       (coalesce(out_deg, 0) + coalesce(in_deg, 0))::BIGINT AS degree
FROM (SELECT src AS entity, count(*) AS out_deg FROM kg_edges GROUP BY src) o
FULL JOIN (SELECT dst AS entity, count(*) AS in_deg FROM kg_edges GROUP BY dst) i
  ON o.entity = i.entity
""",
)
def kg_degree(spark, sf_dir):
    """Per-entity in/out/total degree over the constructed KG — two
    map-side-combinable groupBys + a full outer join (datapipe/graph.py
    degree_stats)."""
    from .datapipe.graph import degree_stats

    return degree_stats(_kg_edges_df(spark, sf_dir))


@_register("kg_pagerank", None)
def kg_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank over the constructed KG in INTEGER
    fixed-point (rank_fp = rank in units of 1e-12) — float PR is
    engine-divergent under reordering, integer PR is exact, the same
    determinism discipline as sampling.split_thresholds. Distributed
    loop: edges⋈ranks + partial-agg groupBy per iteration, lazy 1-row
    dangling aggregate, localCheckpoint lineage cuts
    (datapipe/graph.py pagerank_fixed)."""
    from .datapipe.graph import pagerank_fixed

    return pagerank_fixed(
        _kg_edges_df(spark, sf_dir), iterations=_PR_ITERS, scale=_PR_SCALE
    )


def _kg_pagerank_sql() -> str:
    from .datapipe.graph import pagerank_sql_chain

    return (
        f"WITH {_KG_EDGES_SQL},\n"
        + pagerank_sql_chain("kg_edges", iterations=_PR_ITERS, scale=_PR_SCALE)
        + f"\nSELECT v AS entity, r AS rank_fp FROM pr{_PR_ITERS}"
    )


ORACLES["kg_pagerank"] = _kg_pagerank_sql()


_LPA_ITERS = 3


@_register("kg_communities", None)
def kg_communities_q(spark, sf_dir):
    """Deterministic label-propagation community detection over the
    constructed KG (synchronous LPA, fixed 3 rounds, frequency vote
    with exact min-label tiebreak — Raghavan et al. 2007 made
    engine-exact). Per round: one vertex-keyed join + two partial-agg
    groupBys; lineage cut per round (datapipe/graph.py
    label_propagation_fixed)."""
    from .datapipe.graph import label_propagation_fixed

    out = label_propagation_fixed(
        _kg_edges_df(spark, sf_dir), iterations=_LPA_ITERS
    )
    return out.select(
        F.col("id").alias("entity"), "community"
    )


def _kg_communities_sql() -> str:
    from .datapipe.graph import lpa_sql_chain

    return (
        f"WITH {_KG_EDGES_SQL},\n"
        + lpa_sql_chain("kg_edges", iterations=_LPA_ITERS)
        + f"\nSELECT v AS entity, lbl AS community FROM lpa{_LPA_ITERS}"
    )


ORACLES["kg_communities"] = _kg_communities_sql()


_HITS_ITERS = 3


@_register("kg_hits", None)
def kg_hits(spark, sf_dir):
    """HITS hubs & authorities over the constructed KG in integer
    fixed-point with L1 normalization (float L2 is engine-divergent) —
    the other classic centrality pair next to PageRank; per iteration
    two edges⋈scores joins + two partial-agg groupBys + two lazy 1-row
    totals (datapipe/graph.py hits_fixed; unrolled CTE twin)."""
    from .datapipe.graph import hits_fixed

    return hits_fixed(
        _kg_edges_df(spark, sf_dir), iterations=_HITS_ITERS,
        dedup_edges=False,  # _kg_edges_df output is already DISTINCT
    )


def _kg_hits_sql() -> str:
    from .datapipe.graph import hits_sql_chain

    return (
        f"WITH {_KG_EDGES_SQL},\n"
        + hits_sql_chain("kg_edges", iterations=_HITS_ITERS)
        + "\nSELECT entity, hub_fp, auth_fp FROM hsel"
    )


ORACLES["kg_hits"] = _kg_hits_sql()


@_register("kg_ppr", None)
def kg_ppr(spark, sf_dir):
    """Personalized PageRank (random walk with restart) from the
    deterministic order seed set over the constructed KG — the
    relatedness measure entity disambiguation runs; all teleport and
    dangling mass returns to the seeds, integer fixed-point exact
    (datapipe/graph.py personalized_pagerank_fixed; unrolled DuckDB CTE
    twin)."""
    from .datapipe.graph import personalized_pagerank_fixed

    li = _t(spark, sf_dir, "lineitem")
    seeds = (
        li.filter(F.col("l_orderkey") % _KG_SEED_MOD == 0)
        .select(
            F.concat(F.lit("O"), F.col("l_orderkey").cast("string")).alias("v")
        )
        .distinct()
    )
    return personalized_pagerank_fixed(
        _kg_edges_df(spark, sf_dir), seeds,
        iterations=_PR_ITERS, scale=_PR_SCALE,
    )


def _kg_ppr_sql() -> str:
    from .datapipe.graph import ppr_sql_chain

    seeds = (
        f"sds AS (SELECT DISTINCT 'O' || l_orderkey AS v FROM lineitem"
        f" WHERE l_orderkey % {_KG_SEED_MOD} = 0)"
    )
    return (
        f"WITH {_KG_EDGES_SQL},\n{seeds},\n"
        + ppr_sql_chain("kg_edges", "sds", iterations=_PR_ITERS, scale=_PR_SCALE)
        + f"\nSELECT v AS entity, r AS rank_fp FROM ppr{_PR_ITERS}"
    )


ORACLES["kg_ppr"] = _kg_ppr_sql()


# Closure runs on the layered part→supplier→nation→region hierarchy plus
# a seeded slice of the order layer (orderkey % 7) — depth-4 DAG, so the
# semi-naive loop must survive ≥4 rounds and detect convergence; seeding
# keeps the emitted pair set gate-sized without losing the deep layer.
_CLOSURE_EDGES_SQL = """
  cl_edges AS (
    SELECT DISTINCT 'O' || l_orderkey AS src, 'P' || l_partkey AS dst
    FROM lineitem WHERE l_orderkey % 7 = 0
    UNION
    SELECT DISTINCT 'P' || l_partkey, 'S' || l_suppkey FROM lineitem
    UNION
    SELECT DISTINCT 'S' || s_suppkey, 'N' || s_nationkey FROM supplier
    UNION
    SELECT DISTINCT 'N' || n_nationkey, 'R' || n_regionkey FROM nation
  )
"""


def _kg_closure_sql() -> str:
    from .datapipe.graph import closure_sql

    return (
        f"WITH RECURSIVE {_CLOSURE_EDGES_SQL},\n"
        + closure_sql("cl_edges", max_hops=12)
        + "\nSELECT src, dst, min_hops FROM reach_min"
    )


@_register("kg_closure", None)
def kg_closure(spark, sf_dir):
    """Transitive reachability closure (src, dst, min_hops) of the
    seeded KG hierarchy — SEMI-NAIVE datalog iteration: each round
    joins only the last round's delta against the edge list and
    anti-joins known pairs, stopping on an empty delta (the Spark form
    of WITH RECURSIVE; oracle is DuckDB's actual WITH RECURSIVE over
    the same edges). Ontology-subsumption / containment-hierarchy
    closure is the canonical KG-construction use
    (datapipe/graph.py transitive_closure)."""
    from .datapipe.graph import transitive_closure

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")

    def edge(df, a, ta, b, tb):
        return df.select(
            F.concat(F.lit(ta), F.col(a).cast("string")).alias("src"),
            F.concat(F.lit(tb), F.col(b).cast("string")).alias("dst"),
        )

    edges = (
        edge(li.filter(F.col("l_orderkey") % 7 == 0), "l_orderkey", "O", "l_partkey", "P")
        .union(edge(li, "l_partkey", "P", "l_suppkey", "S"))
        .union(edge(sup, "s_suppkey", "S", "s_nationkey", "N"))
        .union(edge(nat, "n_nationkey", "N", "n_regionkey", "R"))
        .distinct()
    )
    return transitive_closure(edges, max_hops=12)


ORACLES["kg_closure"] = _kg_closure_sql()


@_register(
    "kg_closure_delta",
    f"""
WITH RECURSIVE {_CLOSURE_EDGES_SQL},
cd_new AS (
  SELECT 'S' || s_suppkey AS src, 'N' || s_nationkey AS dst
  FROM supplier WHERE s_suppkey % 10 = 0),
cd_old AS (
  SELECT e.src, e.dst FROM cl_edges e
  WHERE NOT EXISTS (SELECT 1 FROM cd_new n
                    WHERE n.src = e.src AND n.dst = e.dst)),
r_all AS (
  SELECT src, dst FROM cl_edges
  UNION
  SELECT r.src, t.dst FROM r_all r JOIN cl_edges t ON r.dst = t.src),
r_old AS (
  SELECT src, dst FROM cd_old
  UNION
  SELECT r.src, t.dst FROM r_old r JOIN cd_old t ON r.dst = t.src)
SELECT src, dst FROM r_all EXCEPT SELECT src, dst FROM r_old
""",
)
def kg_closure_delta(spark, sf_dir):
    """INCREMENTAL closure maintenance: the reachability pairs created
    by newly-arrived edges (every-10th supplier's based-in link),
    computed from the materialized old closure + the delta ONLY — never
    re-deriving the old closure (the daily-crawl-update shape; oracle
    recomputes both closures via WITH RECURSIVE and EXCEPTs them, the
    semantic spec the incremental algorithm must match). New pairs seed
    from the new edges, right-grow semi-naively through ALL edges, and
    close on the left with ONE join against the old closure
    (datapipe/graph.py closure_delta)."""
    from .datapipe.graph import closure_delta, transitive_closure

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")

    def edge(df, a, ta, b, tb):
        return df.select(
            F.concat(F.lit(ta), F.col(a).cast("string")).alias("src"),
            F.concat(F.lit(tb), F.col(b).cast("string")).alias("dst"),
        )

    all_edges = (
        edge(li.filter(F.col("l_orderkey") % 7 == 0), "l_orderkey", "O", "l_partkey", "P")
        .union(edge(li, "l_partkey", "P", "l_suppkey", "S"))
        .union(edge(sup, "s_suppkey", "S", "s_nationkey", "N"))
        .union(edge(nat, "n_nationkey", "N", "n_regionkey", "R"))
        .distinct()
    )
    new_edges = edge(
        sup.filter(F.col("s_suppkey") % 10 == 0), "s_suppkey", "S", "s_nationkey", "N"
    )
    old_edges = all_edges.join(new_edges, ["src", "dst"], "left_anti")
    old_closure = transitive_closure(old_edges, max_hops=12)
    return closure_delta(old_closure, new_edges, all_edges, max_hops=12)


# Inverse/symmetry mining runs on a 3-relation fact set with engineered
# structure: hosts(N,S) is the (partial, even-suppkey) inverse of
# based_in(S,N); near(N,N) is symmetric by construction — so the miner
# must find confidence_ppm = 1e6 on (hosts => based_in) and the (near,
# near) diagonal, and the even-suppkey fraction on (based_in => hosts).
_INV_FACTS_SQL = """
  inv_facts AS (
    SELECT 'S' || s_suppkey AS s, 'based_in' AS r, 'N' || s_nationkey AS o
    FROM supplier
    UNION ALL
    SELECT 'N' || s_nationkey, 'hosts', 'S' || s_suppkey
    FROM supplier WHERE s_suppkey % 2 = 0
    UNION ALL
    SELECT 'N' || a.n_nationkey, 'near', 'N' || b.n_nationkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey <> b.n_nationkey
  )
"""


@_register(
    "kg_inverse_rules",
    f"""
WITH {_INV_FACTS_SQL},
fd AS (SELECT DISTINCT s, r, o FROM inv_facts),
body AS (SELECT r AS r_body, count(*)::BIGINT AS n_body FROM fd GROUP BY r),
sup AS (
  SELECT a.r AS r_body, b.r AS r_head, count(*)::BIGINT AS support
  FROM fd a JOIN fd b ON a.s = b.o AND a.o = b.s
  GROUP BY 1, 2
)
SELECT r_body, r_head, support, n_body,
       (support * 1000000 // n_body)::BIGINT AS confidence_ppm
FROM sup JOIN body USING (r_body)
""",
)
def kg_inverse_rules(spark, sf_dir):
    """AMIE inverse-rule mining: confidence of r_body(x,y) => r_head(y,x)
    per ordered relation pair, in integer ppm; the diagonal is each
    relation's symmetry score (the owl:inverseOf / owl:SymmetricProperty
    discovery pass). Support join keyed on the ENTITY PAIR — per-key
    fan-out is pair-level relation multiplicity, never entity degree
    (datapipe/graph.py inverse_rule_confidence)."""
    from .datapipe.graph import inverse_rule_confidence

    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    sn = F.concat(F.lit("S"), F.col("s_suppkey").cast("string"))
    nn = F.concat(F.lit("N"), F.col("s_nationkey").cast("string"))
    facts = sup.select(sn.alias("s"), F.lit("based_in").alias("r"), nn.alias("o"))
    facts = facts.unionByName(
        sup.filter(F.col("s_suppkey") % 2 == 0).select(
            nn.alias("s"), F.lit("hosts").alias("r"), sn.alias("o")
        )
    )
    a = nat.select(F.col("n_nationkey").alias("ka"), F.col("n_regionkey").alias("rg"))
    b = nat.select(F.col("n_nationkey").alias("kb"), F.col("n_regionkey").alias("rg"))
    near = (
        a.join(b, "rg")
        .filter(F.col("ka") != F.col("kb"))
        .select(
            F.concat(F.lit("N"), F.col("ka").cast("string")).alias("s"),
            F.lit("near").alias("r"),
            F.concat(F.lit("N"), F.col("kb").cast("string")).alias("o"),
        )
    )
    return inverse_rule_confidence(facts.unionByName(near))


@_register(
    "kg_two_hop",
    f"""
WITH {_KG_EDGES_SQL},
seeds AS (SELECT DISTINCT 'O' || l_orderkey AS v FROM lineitem
          WHERE l_orderkey % {_KG_SEED_MOD} = 0),
h1 AS (SELECT DISTINCT e.dst AS v FROM kg_edges e JOIN seeds s ON e.src = s.v),
h2 AS (SELECT DISTINCT e.dst AS v FROM kg_edges e JOIN h1 ON e.src = h1.v),
lv AS (SELECT v, 0 AS hop FROM seeds
       UNION ALL SELECT v, 1 FROM h1
       UNION ALL SELECT v, 2 FROM h2)
SELECT v AS entity, min(hop)::INT AS min_hop FROM lv GROUP BY v
""",
)
def kg_two_hop(spark, sf_dir):
    """Entities within 2 directed hops of a deterministic order seed
    set, labeled with min hop distance — frontier-expansion BFS, one
    edge join per hop (datapipe/graph.py k_hop)."""
    from .datapipe.graph import k_hop

    li = _t(spark, sf_dir, "lineitem")
    seeds = (
        li.filter(F.col("l_orderkey") % _KG_SEED_MOD == 0)
        .select(
            F.concat(F.lit("O"), F.col("l_orderkey").cast("string")).alias("v")
        )
        .distinct()
    )
    return k_hop(_kg_edges_df(spark, sf_dir), seeds, k=2)


@_register(
    "kg_triangles",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pe AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       FROM li a JOIN li b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT count(*)::BIGINT AS n_triangles
FROM pe e1
JOIN pe e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
JOIN pe e3 ON e3.pa = e1.pb AND e3.pb = e2.pb
""",
)
def kg_triangles(spark, sf_dir):
    """Triangle count of the part co-order graph (parts appearing in the
    same order — the entity co-occurrence graph KG pipelines mine for
    relatedness). Spark side uses degree-ordered orientation so the
    wedge join stays sub-quadratic on skewed graphs; the oracle counts
    the same triangles via the id-ordered 3-way join
    (datapipe/graph.py triangle_count)."""
    from .datapipe.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    return triangle_count(pairs, src="pa", dst="pb")


@_register(
    "kg_clustering_coeff",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pe AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
       FROM li a JOIN li b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
tri AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
        FROM pe e1
        JOIN pe e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
        JOIN pe e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
tv AS (SELECT unnest([x, y, z]) AS v FROM tri),
tc AS (SELECT v, count(*)::BIGINT AS n_tri FROM tv GROUP BY 1),
dg AS (SELECT v, count(*)::BIGINT AS deg FROM
       (SELECT pa AS v FROM pe UNION ALL SELECT pb FROM pe) GROUP BY 1)
SELECT dg.v::BIGINT AS v, deg,
       coalesce(n_tri, 0)::BIGINT AS n_tri,
       ((2 * coalesce(n_tri, 0) * 1000000) // (deg * (deg - 1)))::BIGINT
         AS cc_ppm
FROM dg LEFT JOIN tc ON tc.v = dg.v
WHERE deg >= 2
""",
)
def kg_clustering_coeff(spark, sf_dir):
    """Per-vertex local clustering coefficient of the part co-order
    graph, integer ppm: degree-ordered-oriented wedge join (each
    triangle closes once), one explode credits all three corners, one
    join against the degree table. The oracle enumerates the same
    triangles via the id-ordered 3-way join
    (datapipe/graph.py local_clustering)."""
    from .datapipe.graph import local_clustering

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    return local_clustering(pairs, src="pa", dst="pb")


@_register(
    "kg_common_neighbors",
    """
WITH li AS (SELECT DISTINCT l_partkey AS u, l_orderkey AS v FROM lineitem),
deg AS (SELECT v, count(*)::BIGINT AS deg FROM li GROUP BY v),
pairs AS (SELECT n1.v AS id_a, n2.v AS id_b, count(*)::BIGINT AS common
          FROM li n1 JOIN li n2 ON n1.u = n2.u AND n1.v < n2.v
          GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT p.id_a, p.id_b, p.common,
       (p.common * 1000000) // (da.deg + db.deg - p.common) AS jaccard_ppm
FROM pairs p JOIN deg da ON da.v = p.id_a JOIN deg db ON db.v = p.id_b
""",
)
def kg_common_neighbors(spark, sf_dir):
    """Link-prediction candidate features over the bipartite
    order–part incidence: order pairs sharing ≥ 2 distinct parts, with
    common-neighbor count and integer-ppm Jaccard — the classic
    missing-edge / entity-alias proposal generator for a constructed
    KG. Wedge self-join keyed on the shared part; hub_cap available for
    Zipfian centers (unbound here — the oracle carries full semantics)
    (datapipe/graph.py common_neighbors_bipartite)."""
    from .datapipe.graph import common_neighbors_bipartite

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"), F.col("l_orderkey").alias("order_")
    )
    return common_neighbors_bipartite(
        li, center="part", side="order_", min_common=2
    )


_TFIDF_K = 3
_TFIDF_SCALE = 10**6


@_register(
    "tfidf_top_terms",
    f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
nd AS (SELECT count(*)::BIGINT AS nd FROM documents),
scored AS (SELECT tf.doc_id, tf.term, tf.tf,
                  tf.tf * ((nd.nd * {_TFIDF_SCALE}) // dfq.df) AS score_fp
           FROM tf JOIN dfq USING (term) CROSS JOIN nd)
SELECT doc_id::BIGINT AS doc_id, term, tf, score_fp, rnk::INT AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_fp DESC, term) AS rnk
      FROM scored)
WHERE rnk <= {_TFIDF_K}
""",
)
def tfidf_top_terms_q(spark, sf_dir):
    """Top-3 most characteristic terms per document by tf×idf with a
    LINEAR integer fixed-point idf (log-idf is engine-divergent;
    textstats.tfidf_top_terms). Partial-agg tf and df groupBys, shuffle
    join on term whose output equals the tf table (no blowup), one
    window per doc with a lexicographic tiebreak."""
    from .datapipe.textstats import tfidf_top_terms

    return tfidf_top_terms(
        _t(spark, sf_dir, "documents"), k=_TFIDF_K, scale=_TFIDF_SCALE
    )


# -- similarity search ----------------------------------------------------------

# fixed 64-dim literal query vector (independent of sf so the oracle SQL
# is a constant string)
ANN_QUERY = [
    (1.0 if i % 3 == 0 else (0.5 if i % 3 == 1 else -0.25)) for i in range(64)
]
_ANN_K = 10


def _ann_oracle():
    from .datapipe.similarity import brute_force_topk_sql

    return brute_force_topk_sql(ANN_QUERY, _ANN_K)


@_register("ann_cosine_topk", None)
def ann_cosine_topk(spark, sf_dir):
    from .datapipe.similarity import brute_force_topk

    return brute_force_topk(_t(spark, sf_dir, "embeddings"), ANN_QUERY, k=_ANN_K)


_LSH_PLANES = 4


def lsh_index(spark, sf_dir):
    """Build (once per sf_dir, idempotent) the partitionBy(bucket) LSH
    table under /tmp — same index-build/probe split as the IVF path."""
    from .datapipe.similarity import materialize_lsh_buckets

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = f"/tmp/genie_spark_lsh/{base}_p{_LSH_PLANES}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_lsh_buckets(
            _t(spark, sf_dir, "embeddings"), path, n_planes=_LSH_PLANES,
            dim=len(ANN_QUERY),
        )
    return path


@_register("ann_lsh_topk", None)
def ann_lsh_topk(spark, sf_dir):
    """LSH ANN against the materialized bucket table: the probe is
    partition pruning over 1 of 2^n_planes directories."""
    from .datapipe.similarity import lsh_topk_pruned

    return lsh_topk_pruned(
        spark, lsh_index(spark, sf_dir), ANN_QUERY, k=_ANN_K,
        n_planes=_LSH_PLANES,
    )


@_register("ann_lsh_multiprobe_topk", None)
def ann_lsh_multiprobe_topk(spark, sf_dir):
    """Hamming-1 multiprobe: the query bucket plus its n_planes neighbor
    buckets — recovers near-hyperplane recall at (n_planes+1)/2^n_planes
    of the full-scan cost."""
    from .datapipe.similarity import lsh_topk_pruned

    return lsh_topk_pruned(
        spark, lsh_index(spark, sf_dir), ANN_QUERY, k=_ANN_K,
        n_planes=_LSH_PLANES, multiprobe=1,
    )


@_register("ann_recall_eval", None)
def ann_recall_eval(spark, sf_dir):
    """Recall@10 of the hyperplane-LSH probe vs exact brute force over a
    hash-drawn query panel from the corpus itself — the accuracy
    accounting an approximate index owes its users. Ground truth is a
    broadcast panel × corpus join; the approximate side joins on the
    bucket key; integer-ppm recall per query
    (datapipe/similarity.py lsh_recall_eval)."""
    from .datapipe.similarity import lsh_recall_eval

    return lsh_recall_eval(
        _t(spark, sf_dir, "embeddings"), n_planes=_LSH_PLANES,
        dim=len(ANN_QUERY), k=_ANN_K, query_mod=97,
    )


def _install_recall_oracle():
    from .datapipe.similarity import lsh_recall_eval_sql

    ORACLES["ann_recall_eval"] = lsh_recall_eval_sql(
        n_planes=_LSH_PLANES, dim=len(ANN_QUERY), k=_ANN_K, query_mod=97
    )


_install_recall_oracle()


_IVF_CELLS = 8
_IVF_PROBE = 2


def _ivf_index_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/genie_spark_ivf/{base}_c{_IVF_CELLS}"


def ivf_index(spark, sf_dir):
    """Build (once per sf_dir, idempotent) the partitionBy(cell) IVF table
    under /tmp and return (path, centroids). The _SUCCESS marker makes the
    build amortize across processes — exactly the index-build/probe split
    a production deployment has."""
    from .datapipe.similarity import ivf_centroids, materialize_ivf_cells

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, n_cells=_IVF_CELLS)
    path = _ivf_index_dir(sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_ivf_cells(emb, cents, path)
    return path, cents


@_register("ann_ivf_topk", None)
def ann_ivf_topk(spark, sf_dir):
    """IVF scale path: deterministic hash-sampled centroids; the corpus is
    materialized partitionBy(cell) once, so the probe is partition pruning
    over n_probe directories (PartitionFilters in the scan — asserted in
    test_plans), not a full scan re-deriving assignments per query."""
    from .datapipe.similarity import ivf_topk_pruned

    path, cents = ivf_index(spark, sf_dir)
    return ivf_topk_pruned(
        spark, path, ANN_QUERY, cents, k=_ANN_K, n_probe=_IVF_PROBE
    )


_IVF_KM_ITERS = 2
_KM_CENT_CACHE: Dict[str, list] = {}


def ivf_kmeans_index(spark, sf_dir):
    """Build (once per sf_dir) the Lloyd-refined centroid set and its
    partitionBy(cell) table; centroids are cached driver-side so repeated
    probes pay neither the k-means scans nor the assignment."""
    from .datapipe.similarity import ivf_kmeans_centroids, materialize_ivf_cells

    emb = _t(spark, sf_dir, "embeddings")
    cents = _KM_CENT_CACHE.get(sf_dir)
    if cents is None:
        cents = ivf_kmeans_centroids(
            emb, n_cells=_IVF_CELLS, n_iters=_IVF_KM_ITERS
        )
        _KM_CENT_CACHE[sf_dir] = cents
    path = _ivf_index_dir(sf_dir) + f"_km{_IVF_KM_ITERS}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_ivf_cells(emb, cents, path)
    return path, cents


@_register("ann_ivf_kmeans_topk", None)
def ann_ivf_kmeans_topk(spark, sf_dir):
    """True k-means IVF: deterministic Lloyd-refined centroids (2 fixed
    iterations, 9dp-rounded means — engine-exact), corpus materialized
    partitionBy(cell), probe via partition pruning."""
    from .datapipe.similarity import ivf_topk_pruned

    path, cents = ivf_kmeans_index(spark, sf_dir)
    return ivf_topk_pruned(
        spark, path, ANN_QUERY, cents, k=_ANN_K, n_probe=_IVF_PROBE
    )


_PQ_M, _PQ_KSUB, _PQ_RERANK = 4, 32, 50


def _pq_books(spark, sf_dir):
    from .datapipe.similarity import pq_codebooks

    return pq_codebooks(
        _t(spark, sf_dir, "embeddings"), m=_PQ_M, k_sub=_PQ_KSUB
    )


def pq_index(spark, sf_dir):
    """Build (once per sf_dir, idempotent — _SUCCESS-gated like the IVF
    index) the PQ codes table under /tmp and return (path, codebooks):
    the corpus encode is paid at index build; every probe is literal
    lookups over stored codes."""
    from .datapipe.similarity import materialize_pq_codes

    books = _pq_books(spark, sf_dir)
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = f"/tmp/genie_spark_ivf/{base}_pq{_PQ_M}x{_PQ_KSUB}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_pq_codes(
            _t(spark, sf_dir, "embeddings"), books, path
        )
    return path, books


@_register("ann_pq_topk", None)
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-k: the memory-compression ANN tier
    (m small codes replace the dim-float vector, ~128× smaller at
    dim=64/m=4). Deterministic seeded codebooks, row-local encode,
    fixed-order ADC chain, top-k via TakeOrderedAndProject. On the
    UNSTRUCTURED synthetic embeddings any quantizer's recall degenerates
    (same caveat as IVF — the hash gate checks engine-exactness here;
    recall is proven on clustered vectors in
    test_pq_rerank_recall_vs_brute)."""
    from .datapipe.similarity import pq_topk_from_codes

    path, books = pq_index(spark, sf_dir)
    return pq_topk_from_codes(spark, path, ANN_QUERY, books, k=_ANN_K)


_PQ_KM_ITERS = 1
_PQ_KM_CACHE: Dict[str, list] = {}


def pq_kmeans_index(spark, sf_dir):
    """Lloyd-refined PQ index: per-subspace k-means codebooks (cached
    driver-side — the refinement scans run once per corpus) + the
    _SUCCESS-gated materialized codes table."""
    from .datapipe.similarity import materialize_pq_codes, pq_kmeans_codebooks

    books = _PQ_KM_CACHE.get(sf_dir)
    if books is None:
        books = pq_kmeans_codebooks(
            _t(spark, sf_dir, "embeddings"),
            m=_PQ_M, k_sub=_PQ_KSUB, n_iters=_PQ_KM_ITERS,
        )
        _PQ_KM_CACHE.clear()
        _PQ_KM_CACHE[sf_dir] = books
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = f"/tmp/genie_spark_ivf/{base}_pqkm{_PQ_M}x{_PQ_KSUB}i{_PQ_KM_ITERS}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_pq_codes(_t(spark, sf_dir, "embeddings"), books, path)
    return path, books


@_register("ann_pq_kmeans_topk", None)
def ann_pq_kmeans_topk(spark, sf_dir):
    """True product quantization: per-subspace Lloyd-refined codebooks
    (1 fixed iteration, 9dp-rounded means — engine-exact) + ADC over the
    materialized codes. Refinement cuts quantization MSE ~3× on
    clustered data and ~26% on the synthetic noise embeddings
    (test_pq_kmeans_reduces_quantization_error); serving plan identical
    to ann_pq_topk."""
    from .datapipe.similarity import pq_topk_from_codes

    path, books = pq_kmeans_index(spark, sf_dir)
    return pq_topk_from_codes(spark, path, ANN_QUERY, books, k=_ANN_K)


@_register("ann_pq_rerank_topk", None)
def ann_pq_rerank_topk(spark, sf_dir):
    """Two-stage PQ serving (the production shape): ADC prunes the corpus
    to a 50-candidate pool from codes alone; exact cosine re-ranks the
    pool only — full-precision vectors are read for 50 rows, not the
    corpus, and quantization error stays out of the final ordering."""
    from .datapipe.similarity import pq_topk_from_codes

    path, books = pq_index(spark, sf_dir)
    return pq_topk_from_codes(
        spark, path, ANN_QUERY, books, k=_ANN_K, rerank=_PQ_RERANK
    )


def ivf_pq_index(spark, sf_dir):
    """Build (once per sf_dir, _SUCCESS-gated) the composed IVF-PQ index:
    coarse cell + m PQ codes assigned in one row-local scan, written
    partitionBy(cell). Returns (path, centroids, codebooks)."""
    from .datapipe.similarity import ivf_centroids, materialize_ivf_pq

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, n_cells=_IVF_CELLS)
    books = _pq_books(spark, sf_dir)
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = (
        f"/tmp/genie_spark_ivf/{base}_ivfpq_c{_IVF_CELLS}"
        f"_pq{_PQ_M}x{_PQ_KSUB}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_ivf_pq(emb, cents, books, path)
    return path, cents, books


@_register("ann_ivf_pq_topk", None)
def ann_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ — the actual web-scale ANN serving shape: the coarse cell
    probe prunes the corpus to n_probe partition directories
    (PartitionFilters asserted in test_plans), ADC ranks the pruned rows
    from their m stored codes (row-local literal-table lookups), and
    exact cosine re-ranks only the 50-candidate pool. I/O is bounded by
    the probe, memory by the codes, quantization error by the re-rank —
    each tier verified engine-exact against the data-derived DuckDB
    twin; recall parity with ann_pq_rerank_topk shown on the clustered
    fixture (test_ivf_pq_recall_vs_brute)."""
    from .datapipe.similarity import ivf_pq_topk_pruned

    path, cents, books = ivf_pq_index(spark, sf_dir)
    return ivf_pq_topk_pruned(
        spark, path, ANN_QUERY, cents, books,
        k=_ANN_K, n_probe=_IVF_PROBE, rerank=_PQ_RERANK,
    )


def _install_ann_oracles():
    from .datapipe.similarity import (
        brute_force_topk_sql,
        embedding_neardup_lsh_sql,
        ivf_kmeans_topk_sql,
        ivf_topk_sql,
        lsh_topk_sql,
        pq_kmeans_topk_sql,
        pq_topk_sql,
    )

    ORACLES["ann_cosine_topk"] = brute_force_topk_sql(ANN_QUERY, _ANN_K)
    ORACLES["ann_lsh_topk"] = lsh_topk_sql(ANN_QUERY, _ANN_K, 4, 64)
    ORACLES["ann_lsh_multiprobe_topk"] = lsh_topk_sql(
        ANN_QUERY, _ANN_K, 4, 64, multiprobe=1
    )
    ORACLES["ann_ivf_topk"] = ivf_topk_sql(
        ANN_QUERY, n_cells=_IVF_CELLS, k=_ANN_K, n_probe=_IVF_PROBE
    )
    ORACLES["ann_ivf_kmeans_topk"] = ivf_kmeans_topk_sql(
        ANN_QUERY, n_cells=_IVF_CELLS, k=_ANN_K, n_probe=_IVF_PROBE,
        n_iters=_IVF_KM_ITERS,
    )
    ORACLES["embedding_neardup_lsh"] = embedding_neardup_lsh_sql(
        n_planes=4, dim=64, threshold=0.3
    )
    ORACLES["ann_pq_topk"] = pq_topk_sql(
        ANN_QUERY, m=_PQ_M, k_sub=_PQ_KSUB, dim=len(ANN_QUERY), k=_ANN_K
    )
    ORACLES["ann_pq_kmeans_topk"] = pq_kmeans_topk_sql(
        ANN_QUERY, m=_PQ_M, k_sub=_PQ_KSUB, dim=len(ANN_QUERY), k=_ANN_K,
        n_iters=_PQ_KM_ITERS,
    )
    ORACLES["ann_pq_rerank_topk"] = pq_topk_sql(
        ANN_QUERY, m=_PQ_M, k_sub=_PQ_KSUB, dim=len(ANN_QUERY), k=_ANN_K,
        rerank=_PQ_RERANK,
    )
    from .datapipe.similarity import ivf_pq_topk_sql, semantic_dedup_sql

    ORACLES["ann_ivf_pq_topk"] = ivf_pq_topk_sql(
        ANN_QUERY, n_cells=_IVF_CELLS, n_probe=_IVF_PROBE,
        m=_PQ_M, k_sub=_PQ_KSUB, dim=len(ANN_QUERY), k=_ANN_K,
        rerank=_PQ_RERANK,
    )
    ORACLES["dedup_semantic"] = semantic_dedup_sql(
        n_cells=_IVF_CELLS, threshold=_SEMDEDUP_T
    )


_install_ann_oracles()
_install_hard_negatives_oracle()


# -- text analysis ----------------------------------------------------------------

def _stop_sql(lang: str) -> str:
    from .datapipe.textstats import STOPWORDS

    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


# lang-ID CTE chain shared by the lang_id oracle and the classifier-
# evaluation oracles (confusion matrix / per-class report / kappa):
# `lg` carries (doc_id, lang = true label, score_*, lang_guess).
_LANG_CHAIN = f"""s AS (
  SELECT doc_id, lang,
         string_split_regex(lower(text), '\\s+') AS ws
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
         round(len(list_filter(ws, x -> list_contains({_stop_sql('de')}, x)))::DOUBLE / greatest(len(ws), 1), 6) AS score_de,
         round(len(list_filter(ws, x -> list_contains({_stop_sql('en')}, x)))::DOUBLE / greatest(len(ws), 1), 6) AS score_en,
         round(len(list_filter(ws, x -> list_contains({_stop_sql('es')}, x)))::DOUBLE / greatest(len(ws), 1), 6) AS score_es,
         round(len(list_filter(ws, x -> list_contains({_stop_sql('fr')}, x)))::DOUBLE / greatest(len(ws), 1), 6) AS score_fr
  FROM s
),
lg AS (
  SELECT doc_id, lang, score_de, score_en, score_es, score_fr,
       CASE WHEN greatest(score_de, score_en, score_es, score_fr) <= 0 THEN 'unknown'
            WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
            WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr' END AS lang_guess
  FROM scored
)"""


@_register(
    "lang_id",
    f"""
WITH {_LANG_CHAIN}
SELECT doc_id, score_de, score_en, score_es, score_fr, lang_guess FROM lg
""",
)
def lang_id_q(spark, sf_dir):
    from .datapipe.textstats import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def _lang_eval_df(spark, sf_dir):
    """(doc_id, lang = gold, lang_guess = weak labeler) — the
    predicted-vs-gold frame the classifier-eval queries score."""
    from .datapipe.textstats import lang_id

    docs = _t(spark, sf_dir, "documents")
    return lang_id(docs).select("doc_id", "lang_guess").join(
        docs.select("doc_id", "lang"), "doc_id"
    )


@_register(
    "confusion_matrix",
    f"""
WITH {_LANG_CHAIN}
SELECT lang AS true_cls, lang_guess AS pred_cls, count(*)::BIGINT AS n
FROM lg GROUP BY 1, 2
""",
)
def confusion_matrix_q(spark, sf_dir):
    """Multiclass confusion census of the stopword lang-ID labeler vs
    the gold `lang` column — one class-domain-bounded groupBy
    (metrics.py confusion_matrix)."""
    from .metrics import confusion_matrix

    return confusion_matrix(_lang_eval_df(spark, sf_dir), "lang", "lang_guess")


@_register(
    "classifier_report",
    f"""
WITH {_LANG_CHAIN},
cm AS (SELECT lang AS t, lang_guess AS p, count(*)::BIGINT AS n
       FROM lg GROUP BY 1, 2),
tt AS (SELECT t AS cls, sum(n)::BIGINT AS n_true FROM cm GROUP BY 1),
pp AS (SELECT p AS cls, sum(n)::BIGINT AS n_pred FROM cm GROUP BY 1),
tp AS (SELECT t AS cls, n AS tp FROM cm WHERE t = p)
SELECT tt.cls, n_true,
       coalesce(n_pred, 0)::BIGINT AS n_pred,
       coalesce(tp, 0)::BIGINT AS tp,
       (CASE WHEN coalesce(n_pred, 0) = 0 THEN 0
             ELSE (coalesce(tp, 0) * 1000000) // n_pred END)::BIGINT
         AS precision_ppm,
       ((coalesce(tp, 0) * 1000000) // n_true)::BIGINT AS recall_ppm,
       ((2 * coalesce(tp, 0) * 1000000)
        // (n_true + coalesce(n_pred, 0)))::BIGINT AS f1_ppm
FROM tt LEFT JOIN pp ON pp.cls = tt.cls LEFT JOIN tp ON tp.cls = tt.cls
""",
)
def classifier_report_q(spark, sf_dir):
    """Per-class precision/recall/F1 (integer ppm) of the lang-ID
    labeler against gold labels, keyed on the true-class domain; F1
    folds exactly to 2·tp/(n_true+n_pred) so no float harmonic mean
    enters either engine (metrics.py classification_report)."""
    from .metrics import classification_report

    return classification_report(
        _lang_eval_df(spark, sf_dir), "lang", "lang_guess"
    )


@_register(
    "cohen_kappa",
    f"""
WITH {_LANG_CHAIN},
cm AS (SELECT lang AS t, lang_guess AS p, count(*)::BIGINT AS n
       FROM lg GROUP BY 1, 2),
tt AS (SELECT t AS cls, sum(n)::BIGINT AS n_true FROM cm GROUP BY 1),
pp AS (SELECT p AS cls, sum(n)::BIGINT AS n_pred FROM cm GROUP BY 1),
sx AS (SELECT sum(coalesce(n_true, 0) * coalesce(n_pred, 0))::BIGINT AS s
       FROM tt FULL OUTER JOIN pp ON pp.cls = tt.cls),
tot AS (SELECT sum(n)::BIGINT AS n,
               sum(CASE WHEN t = p THEN n ELSE 0 END)::BIGINT AS agree
        FROM cm)
SELECT n, agree,
       ((agree * 1000000) // n)::BIGINT AS po_ppm,
       (s // greatest((n * n) // 1000000, 1))::BIGINT AS pe_ppm,
       ((agree * n - s) // greatest((n * n - s) // 1000000, 1))::BIGINT
         AS kappa_ppm
FROM tot CROSS JOIN sx
""",
)
def cohen_kappa_q(spark, sf_dir):
    """Cohen's kappa of the lang-ID labeler vs gold — chance-corrected
    agreement as one row, integer-exact via the cleared rational form
    with the ppm scale applied to the denominator so intermediates stay
    inside signed-64 at ~3e9 rows (metrics.py cohen_kappa)."""
    from .metrics import cohen_kappa

    return cohen_kappa(_lang_eval_df(spark, sf_dir), "lang", "lang_guess")


@_register(
    "quality_score",
    """
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars_m,
         len(string_split_regex(text, '\\s+')) AS n_words,
         round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
               / greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter(list_transform(string_split_regex(text, '\\s+'), x -> lower(x)),
                               x -> list_contains(['the','and','of','a','to','in','is','that','for','with'], x)))::DOUBLE
               / greatest(len(string_split_regex(text, '\\s+')), 1), 6) AS stopword_ratio,
         round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
               / greatest(len(string_split_regex(text, '\\s+')), 1), 6) AS mean_word_len
  FROM documents
)
SELECT doc_id, n_chars_m::BIGINT AS n_chars_m, n_words::BIGINT AS n_words,
       punct_ratio, stopword_ratio, mean_word_len,
       round((CASE WHEN n_words >= 20 THEN 0.25 ELSE n_words / 80.0 END)
             + (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE greatest(0.0, 0.25 - punct_ratio) END)
             + least(stopword_ratio * 3.0, 0.25)
             + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.25 ELSE 0.0 END), 6) AS quality_score
FROM f
""",
)
def quality_score_q(spark, sf_dir):
    from .datapipe.textstats import quality_features

    out = quality_features(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_chars_m").cast("bigint").alias("n_chars_m"),
        F.col("n_words").cast("bigint").alias("n_words"),
        "punct_ratio", "stopword_ratio", "mean_word_len", "quality_score",
    )


@_register(
    "token_count",
    """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS re_tokens
FROM documents
""",
)
def token_count_q(spark, sf_dir):
    from .datapipe.textstats import token_counts

    out = token_counts(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("ws_tokens").cast("bigint").alias("ws_tokens"),
        F.col("re_tokens").cast("bigint").alias("re_tokens"),
    )


@_register(
    "length_deciles",
    """
WITH ld_l AS (
  SELECT doc_id, len(string_split(text, ' ')) AS v FROM documents),
ld_r AS (
  SELECT v, row_number() OVER (ORDER BY v, doc_id) AS rn,
         count(*) OVER () AS n
  FROM ld_l),
ld_q AS (SELECT unnest(generate_series(1, 9)) AS decile)
SELECT q.decile::INT AS decile, r.v::BIGINT AS value
FROM ld_q q JOIN ld_r r ON r.rn = (r.n * q.decile + 9) // 10
""",
)
def length_deciles_q(spark, sf_dir):
    """Exact corpus length-distribution deciles (curation cutoff
    boundaries) with NO single-partition sort: distributed
    range-partition rank + a broadcast 9-row probe join. The oracle's
    global window is the semantic spec; the Spark plan is the scale
    shape (datapipe/textstats.py length_deciles)."""
    from .datapipe.textstats import length_deciles

    return length_deciles(_t(spark, sf_dir, "documents"))


def _domain_cap_oracle() -> str:
    from .datapipe.hashes import h60_salted_sql

    key = h60_salted_sql("doc_id", "'cap'")
    return f"""
SELECT doc_id, source, rn::INT AS grp_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {key}, doc_id) AS rn
  FROM documents)
WHERE rn <= 50
"""


@_register("domain_cap", _domain_cap_oracle())
def domain_cap_q(spark, sf_dir):
    """Deterministic per-domain quota cap (≤50 docs per source, salted
    hash order): the domain-capping step of pretraining mixes — an
    absolute per-group count, rerun- and partitioning-stable, ONE
    group-partitioned window, no global sort
    (datapipe/sampling.py group_cap)."""
    from .datapipe.sampling import group_cap

    out = group_cap(
        _t(spark, sf_dir, "documents"), group_col="source", k=50, salt="cap"
    )
    return out.select("doc_id", "source", F.col("grp_rank").cast("int").alias("grp_rank"))


@_register(
    "winnow_fps",
    f"""
WITH wf_base AS (SELECT doc_id, string_split(text, ' ') AS wd, text FROM documents),
wf_h AS (
  SELECT doc_id,
    CASE WHEN len(wd) >= 3 THEN
      list_transform(generate_series(1, len(wd) - 2),
        i -> {_h60_sql("array_to_string(wd[i:i+2], ' ')")})
    ELSE [{_h60_sql("text")}] END AS hs
  FROM wf_base),
wf_sel AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, greatest(len(hs) - 3, 1)),
      i -> struct_pack(
        p := i + len(hs[i:i+3]) - list_position(list_reverse(hs[i:i+3]),
                                                list_min(hs[i:i+3])),
        v := list_min(hs[i:i+3])))) AS f
  FROM wf_h)
SELECT DISTINCT doc_id, f['p']::INT AS pos, f['v']::BIGINT AS fp FROM wf_sel
""",
)
def winnow_fps_q(spark, sf_dir):
    """Winnowing fingerprints (MOSS): per-window rightmost-min gram
    hash, k=3 / w=4 — the local-overlap detector of the dedup family.
    Row-local array selection, one DISTINCT shuffle
    (datapipe/dedup.py winnow_fingerprints)."""
    from .datapipe.dedup import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=3, w=4)


@_register(
    "bigram_counts",
    """
WITH bg_w AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents),
bg_p AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM bg_w)
SELECT bigram, count(*)::BIGINT AS cnt FROM bg_p
GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 100
""",
)
def bigram_counts_q(spark, sf_dir):
    """Top-100 adjacent word bigrams corpus-wide — the tokenizer/BPE
    training and n-gram LM count shape: row-local pair generation, one
    partial-agg groupBy, TakeOrderedAndProject top-n
    (datapipe/textstats.py bigram_counts)."""
    from .datapipe.textstats import bigram_counts

    return bigram_counts(_t(spark, sf_dir, "documents"), top_n=100)


@_register(
    "fingerprint",
    f"""
WITH {_SHINGLES_SQL},
h AS (SELECT doc_id, {_h60_sql('shingle')} AS hv FROM sh)
SELECT h.doc_id,
       min(hv)::BIGINT AS fp_min, max(hv)::BIGINT AS fp_max,
       min(md5(d.text)) AS fp_md5
FROM h JOIN documents d ON h.doc_id = d.doc_id
GROUP BY 1
""",
)
def fingerprint_q(spark, sf_dir):
    from .datapipe.textstats import fingerprints

    out = fingerprints(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("fp_min").cast("bigint").alias("fp_min"),
        F.col("fp_max").cast("bigint").alias("fp_max"),
        "fp_md5",
    )


# -- deterministic sampling / splitting / packing -----------------------------


def _url_variants_df(spark, sf_dir, with_text=False, with_ts=False):
    """Fabricated crawl variants: every page fetched twice — once with a
    canonical URL, once with uppercased host, trailing slash, tracking
    params, and a fragment. Deterministic fetch timestamps (mod-10 affine
    hashes of doc_id) tie every 5th page so the (ts, id) tie-break is
    exercised, and either fetch can be the newer one."""
    docs = _t(spark, sf_dir, "documents")
    # both variants explode from ONE struct array so the whole family
    # reads the base table once (the earlier unionAll form scanned it
    # twice); the oracle's UNION ALL produces the identical row set
    canonical = F.struct(
        (F.col("doc_id") * 2).alias("vid"),
        F.concat(
            F.lit("https://"), "source", F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        *(
            [F.pmod(F.col("doc_id") * F.lit(7).cast("long"), F.lit(10).cast("long"))
             .cast("long").alias("ts")]
            if with_ts else []
        ),
        *([F.col("text").alias("text")] if with_text else []),
    )
    messy = F.struct(
        (F.col("doc_id") * 2 + 1).alias("vid"),
        F.concat(
            F.lit("HTTPS://"), F.upper("source"), F.lit("/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("/?utm_source=x&utm_medium=y#frag"),
        ).alias("url"),
        *(
            [F.pmod(F.col("doc_id") * F.lit(3).cast("long"), F.lit(10).cast("long"))
             .cast("long").alias("ts")]
            if with_ts else []
        ),
        *([F.col("text").alias("text")] if with_text else []),
    )
    return docs.select(
        F.explode(F.array(canonical, messy)).alias("v")
    ).select("v.*")


def _url_variants_sql(with_text=False, with_ts=False):
    text = ", text" if with_text else ""
    ts_a = ", (doc_id * 7) % 10 AS ts" if with_ts else ""
    ts_b = ", (doc_id * 3) % 10" if with_ts else ""
    return f"""variants AS (
  SELECT doc_id * 2 AS vid,
         'https://' || source || '/doc/' || doc_id AS url{ts_a}{text}
  FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1 AS vid,
         'HTTPS://' || upper(source) || '/doc/' || doc_id ||
         '/?utm_source=x&utm_medium=y#frag' AS url{ts_b}{text}
  FROM documents
)"""


def _url_dedup_oracle():
    from .datapipe.urls import normalize_url_sql

    return f"""
WITH {_url_variants_sql()}
SELECT {normalize_url_sql('url')} AS norm_url,
       min(vid)::BIGINT AS keep_id,
       count(*)::BIGINT AS n_dups
FROM variants GROUP BY 1
"""


_BLOCK_RULES = ["src1.com", "src2.org", "src5.net", "src8.com", "www.src4.net"]


@_register(
    "domain_blocklist",
    f"""
WITH db_docs AS (
  SELECT doc_id,
         'www.' || source || '.' ||
         CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END AS host
  FROM documents),
db_rules AS (SELECT * FROM (VALUES {", ".join(f"('{r}')" for r in _BLOCK_RULES)}) t(rule)),
db_suf AS (
  SELECT doc_id, host,
         unnest(list_transform(generate_series(1, len(string_split(host, '.'))),
                i -> array_to_string(string_split(host, '.')[i:], '.'))) AS suf
  FROM db_docs),
db_hit AS (
  SELECT s.doc_id, min(r.rule) AS rule
  FROM db_suf s JOIN db_rules r ON s.suf = r.rule
  GROUP BY 1)
SELECT d.doc_id, d.host, h.rule IS NOT NULL AS blocked, h.rule
FROM db_docs d LEFT JOIN db_hit h ON d.doc_id = h.doc_id
""",
)
def domain_blocklist_q(spark, sf_dir):
    """Crawl-side domain blocklist with subdomain (suffix) matching over
    fabricated multi-label hosts: each host explodes into its
    label-suffix chain and joins the rule set by exact key — O(labels)
    per host, no regex/LIKE scan (datapipe/urls.py blocklist_filter)."""
    from .datapipe.urls import blocklist_filter

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select(
        "doc_id",
        F.concat(
            F.lit("www."), F.col("source"), F.lit("."),
            F.when(F.col("doc_id") % 3 == 0, "com")
            .when(F.col("doc_id") % 3 == 1, "org")
            .otherwise("net"),
        ).alias("host"),
    )
    rules = spark.createDataFrame([(r,) for r in _BLOCK_RULES], ["rule"])
    return blocklist_filter(hosts, rules)


@_register("dedup_url", _url_dedup_oracle())
def dedup_url(spark, sf_dir):
    """URL-keyed dedup over fabricated crawl variants: every page appears
    once canonically and once with uppercased host, trailing slash,
    tracking params, and a fragment — normalization must fold each pair
    to one key (n_dups=2 everywhere, canonical vid kept)."""
    from .datapipe.urls import dedup_by_url

    out = dedup_by_url(
        _url_variants_df(spark, sf_dir), url_col="url", id_col="vid"
    )
    return out.select(
        "norm_url",
        F.col("keep_id").cast("bigint").alias("keep_id"),
        F.col("n_dups").cast("bigint").alias("n_dups"),
    )


def _url_latest_oracle():
    from .datapipe.urls import normalize_url_sql

    return f"""
WITH {_url_variants_sql(with_ts=True)}
SELECT {normalize_url_sql('url')} AS norm_url,
       max(struct_pack(t := ts, i := vid))['i']::BIGINT AS keep_id,
       count(*)::BIGINT AS n_dups
FROM variants GROUP BY 1
"""


@_register("dedup_url_latest", _url_latest_oracle())
def dedup_url_latest(spark, sf_dir):
    """URL-keyed dedup with the keep='latest' policy a crawl pipeline
    actually wants: the NEWEST fetch of each page wins (max (ts, id)
    struct, id breaking timestamp ties deterministically). Timestamps are
    fabricated so some pages' canonical fetch is newer, some pages' messy
    re-fetch is newer, and every 5th page ties."""
    from .datapipe.urls import dedup_by_url

    variants = _url_variants_df(spark, sf_dir, with_ts=True)
    out = dedup_by_url(
        variants, url_col="url", id_col="vid", keep="latest", ts_col="ts"
    )
    return out.select(
        "norm_url",
        F.col("keep_id").cast("bigint").alias("keep_id"),
        F.col("n_dups").cast("bigint").alias("n_dups"),
    )


def _cascade_oracle():
    from .datapipe.urls import normalize_url_sql

    return f"""
WITH {_url_variants_sql(with_text=True)},
kept AS (
  SELECT {normalize_url_sql('url')} AS norm_url, min(vid) AS keep_id
  FROM variants GROUP BY 1
),
docs2 AS (
  SELECT v.vid AS doc_id, v.text
  FROM variants v JOIN kept k ON v.vid = k.keep_id
),
{_minhash_chain_sql('docs2')}
SELECT id_a, id_b, round(ej, 6) AS est_jaccard FROM est WHERE ej >= {_MINHASH_T}
"""


@_register("dedup_cascade", None)
def dedup_cascade(spark, sf_dir):
    """Production multi-tier dedup cascade: tier 1 folds crawl re-fetches
    by normalized URL (cheapest — never reads content bytes), tier 2 runs
    MinHash+LSH near-dup over the survivors only. This is the ordering a
    real pipeline uses: pay content shingling only for pages that survive
    the URL fold. The survivor join is a left-semi on the kept ids, so
    content flows through exactly once."""
    from .datapipe.dedup import minhash_jaccard_pairs
    from .datapipe.urls import dedup_by_url

    variants = _url_variants_df(spark, sf_dir, with_text=True)
    kept = dedup_by_url(variants, url_col="url", id_col="vid").select("keep_id")
    survivors = variants.join(
        kept, variants["vid"] == kept["keep_id"], "left_semi"
    ).select(F.col("vid").alias("doc_id"), "text")
    return minhash_jaccard_pairs(
        survivors,
        num_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        threshold=_MINHASH_T,
    )


ORACLES["dedup_cascade"] = _cascade_oracle()


@_register("dedup_cascade_cc", None)
def dedup_cascade_cc(spark, sf_dir):
    """End-to-end three-tier dedup with transitive clustering: URL fold
    → MinHash-LSH candidate pairs over survivors → connected components
    → ONE kept page per duplicate cluster with its cluster size.
    Pairwise keep-min (dedup_cascade's consumer) under-deletes on A~B~C
    chains; this is the production keep-one-per-component form. Oracle:
    DuckDB recursive CTE over the identical cascade chain."""
    from .datapipe.dedup import minhash_jaccard_pairs
    from .datapipe.graph import components_with_singletons
    from .datapipe.urls import dedup_by_url

    variants = _url_variants_df(spark, sf_dir, with_text=True)
    kept = dedup_by_url(variants, url_col="url", id_col="vid").select("keep_id")
    survivors = variants.join(
        kept, variants["vid"] == kept["keep_id"], "left_semi"
    ).select(F.col("vid").alias("doc_id"), "text")
    pairs = minhash_jaccard_pairs(
        survivors, num_hashes=_MINHASH_N, bands=_MINHASH_BANDS,
        threshold=_MINHASH_T,
    )
    lab = components_with_singletons(
        survivors.select("doc_id"), pairs, "doc_id"
    )
    return lab.groupBy(F.col("component").alias("keep_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )


def _cascade_cc_oracle():
    from .datapipe.urls import normalize_url_sql

    return f"""
WITH RECURSIVE {_url_variants_sql(with_text=True)},
kept AS (
  SELECT {normalize_url_sql('url')} AS norm_url, min(vid) AS keep_id
  FROM variants GROUP BY 1
),
docs2 AS (
  SELECT v.vid AS doc_id, v.text
  FROM variants v JOIN kept k ON v.vid = k.keep_id
),
{_minhash_chain_sql('docs2')},
edges AS (
  SELECT id_a AS u, id_b AS w FROM est WHERE ej >= {_MINHASH_T}
  UNION ALL
  SELECT id_b, id_a FROM est WHERE ej >= {_MINHASH_T}
),
reach(v, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.w, reach.r FROM reach JOIN edges e ON e.u = reach.v
),
comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        FROM docs2 d LEFT JOIN comp c ON c.doc_id = d.doc_id)
SELECT component AS keep_id, count(*)::BIGINT AS n_members
FROM lab GROUP BY 1
"""


ORACLES["dedup_cascade_cc"] = _cascade_cc_oracle()


@_register(
    "contact_flags",
    """
WITH enriched AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0
                      THEN ' contact: user' || doc_id || '@example.com or https://example.org/u/' || doc_id
                      ELSE '' END AS text
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, 'https?://[A-Za-z0-9./_-]+'))::BIGINT AS n_urls,
       (len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) > 0
        OR len(regexp_extract_all(text, 'https?://[A-Za-z0-9./_-]+')) > 0) AS has_contact
FROM enriched
""",
)
def contact_flags_q(spark, sf_dir):
    """PII/contact-surface flags. The synthetic corpus contains no
    contact strings, so the query fabricates deterministic ones in-plan
    for a quarter of the docs (both engines apply the identical concat)
    — the regex path is exercised with non-trivial counts."""
    from .datapipe.textstats import contact_flags

    out = contact_flags(_contact_enriched_docs(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_emails").cast("bigint").alias("n_emails"),
        F.col("n_urls").cast("bigint").alias("n_urls"),
        "has_contact",
    )


# shared with contact_flags: deterministic contact-string fabrication (the
# synthetic corpus has no PII) — both engines apply the identical concat
_CONTACT_ENRICH_SQL = """
enriched AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0
                      THEN ' contact: user' || doc_id || '@example.com or https://example.org/u/' || doc_id
                      ELSE '' END AS text
  FROM documents
)
"""


def _contact_enriched_docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.pmod("doc_id", F.lit(4)) == 0,
                F.concat(
                    F.lit(" contact: user"), F.col("doc_id").cast("string"),
                    F.lit("@example.com or https://example.org/u/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def _redact_oracle():
    from .datapipe.textstats import EMAIL_PATTERN, URL_PATTERN

    return f"""
WITH {_CONTACT_ENRICH_SQL}
SELECT doc_id::BIGINT AS doc_id,
       regexp_replace(regexp_replace(text, '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
                      '{URL_PATTERN}', '<URL>', 'g') AS clean_text,
       len(regexp_extract_all(text, '{EMAIL_PATTERN}'))::BIGINT AS n_redacted_emails,
       len(regexp_extract_all(text, '{URL_PATTERN}'))::BIGINT AS n_redacted_urls
FROM enriched
"""


@_register("redact_contacts", _redact_oracle())
def redact_contacts_q(spark, sf_dir):
    """PII redaction over the contact-enriched corpus: every fabricated
    email → <EMAIL>, every URL → <URL>, with per-doc redaction counts.
    Row-local regexp_replace, zero shuffle."""
    from .datapipe.textstats import redact_contacts

    out = redact_contacts(_contact_enriched_docs(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "clean_text",
        F.col("n_redacted_emails").cast("bigint").alias("n_redacted_emails"),
        F.col("n_redacted_urls").cast("bigint").alias("n_redacted_urls"),
    )


def _grams_sql(k: int, arr: str = "w") -> str:
    """DuckDB expression: distinct word ``k``-grams of list column ``arr``
    with the whole-text fallback for short docs — the twin of
    ``dedup.shingles_col(text, k)``."""
    return (
        f"CASE WHEN len({arr}) >= {k} THEN list_distinct(list_transform("
        f"range(1, len({arr}) - {k - 2}), i -> array_to_string("
        f"list_slice({arr}, i, i + {k - 1}), ' ')))"
        f" ELSE [array_to_string({arr}, ' ')] END"
    )


_DECONTAM_N = 8
_DECONTAM_ORACLE = f"""
WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tg AS (SELECT doc_id, unnest({_grams_sql(_DECONTAM_N)}) AS gram FROM tw),
ev AS (SELECT list_slice(w, 1, 12) AS w FROM tw WHERE doc_id % 37 = 0),
eg AS (SELECT DISTINCT unnest({_grams_sql(_DECONTAM_N)}) AS gram FROM ev)
SELECT tg.doc_id::BIGINT AS doc_id,
       count(DISTINCT tg.gram)::BIGINT AS n_hit_grams
FROM tg JOIN eg USING (gram) GROUP BY 1
"""


@_register("decontaminate", _DECONTAM_ORACLE)
def decontaminate_q(spark, sf_dir):
    """Benchmark decontamination: the eval set is fabricated as the
    first-12-word slice of every 37th document (a held-out "test
    question" extracted from a crawl page), so each eval item genuinely
    cross-contaminates its source doc through shared 8-grams rather than
    by identity. Eval grams are broadcast; the corpus is never
    shuffled."""
    from .datapipe.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.pmod("doc_id", F.lit(37)) == 0).select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("text"),
    )
    out = decontaminate(docs, eval_docs, n=_DECONTAM_N)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_hit_grams").cast("bigint").alias("n_hit_grams"),
    )


_DUP_SPAN_N = 8

_DUP_SPAN_ORACLE = f"""
WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tg AS (SELECT doc_id, len(w) AS n_tok, i AS pos,
              array_to_string(list_slice(w, i, i + {_DUP_SPAN_N - 1}), ' ') AS gram
       FROM (SELECT doc_id, w,
                    unnest(range(1, greatest(len(w) - {_DUP_SPAN_N - 1}, 1) + 1)) AS i
             FROM tw)),
dup AS (SELECT gram FROM tg GROUP BY gram HAVING count(*) >= 2),
cov AS (SELECT tg.doc_id,
               unnest(range(pos, least(pos + {_DUP_SPAN_N - 1}, n_tok) + 1)) AS t
        FROM tg JOIN dup USING (gram)),
agg AS (SELECT doc_id, count(DISTINCT t) AS n_dup FROM cov GROUP BY doc_id)
SELECT tw.doc_id::BIGINT AS doc_id,
       len(w)::BIGINT AS n_tokens,
       coalesce(agg.n_dup, 0)::BIGINT AS n_dup_tokens,
       round(coalesce(agg.n_dup, 0)::DOUBLE / len(w), 6) AS dup_ratio
FROM tw LEFT JOIN agg ON agg.doc_id = tw.doc_id
"""


@_register("dup_span_stats", _DUP_SPAN_ORACLE)
def dup_span_stats(spark, sf_dir):
    """Exact-substring duplication profile (Lee et al. 2022 ExactSubstr,
    bounded word-8-gram form): per doc, how many tokens sit inside a
    span that occurs >= 2 times corpus-wide. The removal criterion of
    suffix-array dedup as a distributable three-shuffle plan (gram
    count, flag join, per-doc distinct-coverage)."""
    from .datapipe.dedup import substring_dup_stats

    return substring_dup_stats(
        _t(spark, sf_dir, "documents"), n=_DUP_SPAN_N, min_count=2
    )


@_register(
    "domain_stats",
    """
WITH f AS (
  SELECT doc_id, source,
         len(string_split_regex(text, '\\s+')) AS n_words,
         round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
               / greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter(list_transform(string_split_regex(text, '\\s+'), x -> lower(x)),
                               x -> list_contains(['the','and','of','a','to','in','is','that','for','with'], x)))::DOUBLE
               / greatest(len(string_split_regex(text, '\\s+')), 1), 6) AS stopword_ratio,
         round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
               / greatest(len(string_split_regex(text, '\\s+')), 1), 6) AS mean_word_len
  FROM documents
),
s AS (
  SELECT doc_id, source, n_words,
         round((CASE WHEN n_words >= 20 THEN 0.25 ELSE n_words / 80.0 END)
               + (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE greatest(0.0, 0.25 - punct_ratio) END)
               + least(stopword_ratio * 3.0, 0.25)
               + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.25 ELSE 0.0 END), 6) AS q
  FROM f
)
SELECT source AS domain,
       count(*)::BIGINT AS n_docs,
       sum(n_words)::BIGINT AS total_words,
       round((sum(floor(q * 1000000)::BIGINT)::DOUBLE / count(*)) / 1000000.0, 6) AS mean_quality,
       max(q) AS max_quality
FROM s GROUP BY source
""",
)
def domain_stats(spark, sf_dir):
    """Per-domain corpus profile (docs/tokens/quality by source host —
    the RefinedWeb-style curation view). Mean quality is
    determinism-safe: per-doc 6dp scores quantized to integer ppm
    before the sum (textstats.domain_quality_stats)."""
    from .datapipe.textstats import domain_quality_stats

    return domain_quality_stats(_t(spark, sf_dir, "documents"))


def _importance_oracle():
    from .datapipe.sampling import importance_weights_sql

    return importance_weights_sql(
        "documents", target_where="doc_id % 13 = 0"
    )


@_register("importance_weights", None)
def importance_weights_q(spark, sf_dir):
    """DSIR-style importance weights (arXiv:2302.03169): hashed-token
    likelihood-ratio affinity of every raw doc to a target domain (every
    13th doc stands in for the target corpus). Oracled in integer
    fixed-point (the log estimator is engine-divergent — see
    sampling.importance_weights); feature tables are broadcast-sized by
    construction, the corpus is never shuffled on content."""
    from .datapipe.sampling import importance_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 13 == 0)
    return importance_weights(docs, target)


ORACLES["importance_weights"] = _importance_oracle()


_LINE_WORDS = 8


def _line_chain_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """WITH-body (no leading WITH) computing the corpus-wide line-dedup
    chain over ``{table}({id_col}, text)`` — ends in CTE
    ``linej({id_col}, clean_text, n_lines_kept, n_lines_dropped)``."""
    lw = _LINE_WORDS
    return f"""line_base AS (SELECT {id_col}, string_split(text, ' ') AS w FROM {table}),
line_l AS (
  SELECT {id_col}, i - 1 AS pos,
         array_to_string(list_slice(w, (i - 1) * {lw} + 1,
                                    (i - 1) * {lw} + {lw}), ' ') AS line
  FROM (SELECT {id_col}, w,
               unnest(range(1, ceil(len(w) / {lw}.0)::INT + 1)) AS i
        FROM line_base)),
line_keep AS (
  SELECT {id_col}, pos, line FROM line_l
  QUALIFY row_number() OVER (PARTITION BY md5(line) ORDER BY {id_col}, pos) = 1),
line_agg AS (
  SELECT {id_col}, string_agg(line, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM line_keep GROUP BY 1),
line_tot AS (SELECT {id_col}, ceil(len(w) / {lw}.0)::INT AS n_lines FROM line_base),
linej AS (
  SELECT t.{id_col},
         coalesce(a.clean_text, '') AS clean_text,
         coalesce(a.n_kept, 0)::BIGINT AS n_lines_kept,
         (t.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_lines_dropped
  FROM line_tot t LEFT JOIN line_agg a ON t.{id_col} = a.{id_col})"""


_LINE_DEDUP_ORACLE = f"""
WITH {_line_chain_sql('documents')}
SELECT doc_id::BIGINT AS doc_id, clean_text, n_lines_kept, n_lines_dropped
FROM linej
"""


@_register("line_dedup", _LINE_DEDUP_ORACLE)
def line_dedup_q(spark, sf_dir):
    """CCNet-style corpus-wide line dedup: first occurrence of each
    8-word line (by doc id, position) survives, repeats drop, docs are
    reassembled in order. The only content shuffle keys on the 128-bit
    line digest."""
    from .datapipe.dedup import line_dedup

    out = line_dedup(
        _t(spark, sf_dir, "documents"), line_words=_LINE_WORDS
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "clean_text",
        F.col("n_lines_kept").cast("bigint").alias("n_lines_kept"),
        F.col("n_lines_dropped").cast("bigint").alias("n_lines_dropped"),
    )


_MULTILINE_DOCS_SQL = """mdocs AS (
  SELECT doc_id,
         'COMMON HEADER' || chr(10) || text || chr(10) || 'FOOTER ' || source ||
         CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'COMMON HEADER' ELSE '' END AS text
  FROM documents
)"""

_LINE_NEWLINE_ORACLE = f"""
WITH {_MULTILINE_DOCS_SQL},
line_base AS (SELECT doc_id, string_split(text, chr(10)) AS w FROM mdocs),
line_l AS (
  SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS line
  FROM line_base),
line_keep AS (
  SELECT doc_id, pos, line FROM line_l
  QUALIFY row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) = 1),
line_agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM line_keep GROUP BY 1),
line_tot AS (SELECT doc_id, len(w) AS n_lines FROM line_base)
SELECT t.doc_id::BIGINT AS doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       coalesce(a.n_kept, 0)::BIGINT AS n_lines_kept,
       (t.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_lines_dropped
FROM line_tot t LEFT JOIN line_agg a ON t.doc_id = a.doc_id
"""


def _multiline_docs_df(spark, sf_dir):
    """Fabricated multi-line crawl pages (the synthetic corpus has no
    newlines): shared boilerplate header on every page, the original text
    as the body line, a per-source boilerplate footer, and every 7th page
    repeats the header — so the newline dedup exercises cross-corpus
    boilerplate removal, per-group survivors, and within-document
    repeats."""
    docs = _t(spark, sf_dir, "documents")
    base = F.concat_ws(
        "\n",
        F.lit("COMMON HEADER"),
        F.col("text"),
        F.concat(F.lit("FOOTER "), F.col("source")),
    )
    mtext = F.when(
        F.col("doc_id") % 7 == 0, F.concat(base, F.lit("\nCOMMON HEADER"))
    ).otherwise(base)
    return docs.select("doc_id", mtext.alias("text"))


@_register("line_dedup_newline", _LINE_NEWLINE_ORACLE)
def line_dedup_newline_q(spark, sf_dir):
    """The CCNet/RefinedWeb PRODUCTION form of line dedup: lines are
    newline-delimited (split='\\n'), not fixed word chunks — boilerplate
    headers/footers repeated across a crawl collapse to their first
    occurrence and documents reassemble with '\\n'. Runs over fabricated
    multi-line pages (see :func:`_multiline_docs_df`); shares the
    digest-keyed one-shuffle plan with line_dedup."""
    from .datapipe.dedup import line_dedup

    out = line_dedup(
        _multiline_docs_df(spark, sf_dir), split="\n"
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "clean_text",
        F.col("n_lines_kept").cast("bigint").alias("n_lines_kept"),
        F.col("n_lines_dropped").cast("bigint").alias("n_lines_dropped"),
    )


_BOILERPLATE_MIN_DF = 3

_BOILERPLATE_ORACLE = f"""
WITH {_MULTILINE_DOCS_SQL},
bl_base AS (SELECT doc_id, string_split(text, chr(10)) AS w FROM mdocs),
bl_l AS (
  SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS line
  FROM bl_base),
bl_boiler AS (
  SELECT md5(line) AS lh FROM bl_l
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {_BOILERPLATE_MIN_DF}),
bl_keep AS (
  SELECT doc_id, pos, line FROM bl_l
  WHERE md5(line) NOT IN (SELECT lh FROM bl_boiler)),
bl_agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM bl_keep GROUP BY 1),
bl_tot AS (SELECT doc_id, len(w) AS n_lines FROM bl_base)
SELECT t.doc_id::BIGINT AS doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       coalesce(a.n_kept, 0)::BIGINT AS n_lines_kept,
       (t.n_lines - coalesce(a.n_kept, 0))::BIGINT AS n_lines_dropped
FROM bl_tot t LEFT JOIN bl_agg a ON t.doc_id = a.doc_id
"""


@_register("boilerplate_strip", _BOILERPLATE_ORACLE)
def boilerplate_strip_q(spark, sf_dir):
    """Corpus-frequency boilerplate removal (the C4/CCNet line-filter
    family's statistical leg): every line occurring in ≥3 DISTINCT
    documents drops from ALL of them — the shared header and per-source
    footers of the fabricated crawl pages vanish, page bodies survive.
    Complements line_dedup (which keeps first occurrences). One
    (digest, doc) shuffle for the df count; the drop join reuses its
    partitioning (datapipe/dedup.py boilerplate_strip)."""
    from .datapipe.dedup import boilerplate_strip

    out = boilerplate_strip(
        _multiline_docs_df(spark, sf_dir), split="\n",
        min_df=_BOILERPLATE_MIN_DF,
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "clean_text",
        F.col("n_lines_kept").cast("bigint").alias("n_lines_kept"),
        F.col("n_lines_dropped").cast("bigint").alias("n_lines_dropped"),
    )


def _gate_chain_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """WITH-body (no leading WITH) computing the quality-gate feature +
    verdict chain over ``{table}({id_col}, text)`` — ends in CTE
    ``gatej({id_col}, n_words, quality_score, top_word_frac,
    dup_3gram_frac, fail_reasons, passed)``. Parameterized so the
    curation-report oracle can gate an upstream CTE."""
    reasons = """concat_ws(';',
         CASE WHEN n_words < 20 THEN 'too_short' END,
         CASE WHEN n_words > 90 THEN 'too_long' END,
         CASE WHEN punct_ratio > 0.1 THEN 'high_punct' END,
         CASE WHEN stopword_ratio < 0.02 THEN 'low_stopword' END,
         CASE WHEN top_word_frac > 0.2 THEN 'top_word' END,
         CASE WHEN dup_3gram_frac > 0.1 THEN 'dup_3gram' END)"""
    return f"""gate_f AS (
  SELECT {id_col},
         len(string_split_regex(text, '\\s+')) AS n_words,
         round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
               / greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter(list_transform(string_split_regex(text, '\\s+'), x -> lower(x)),
                               x -> list_contains(['the','and','of','a','to','in','is','that','for','with'], x)))::DOUBLE
               / greatest(len(string_split_regex(text, '\\s+')), 1), 6) AS stopword_ratio,
         round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
               / greatest(len(string_split_regex(text, '\\s+')), 1), 6) AS mean_word_len
  FROM {table}
),
gate_fq AS (
  SELECT {id_col}, n_words, punct_ratio, stopword_ratio,
         round((CASE WHEN n_words >= 20 THEN 0.25 ELSE n_words / 80.0 END)
               + (CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE greatest(0.0, 0.25 - punct_ratio) END)
               + least(stopword_ratio * 3.0, 0.25)
               + (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.25 ELSE 0.0 END), 6) AS quality_score
  FROM gate_f
),
gate_base AS (SELECT {id_col}, string_split(text, ' ') AS w FROM {table}),
gate_g AS (
  SELECT {id_col}, w,
    CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), i -> array_to_string(list_slice(w, i, i + 2), ' '))
         ELSE [array_to_string(w, ' ')] END AS g3
  FROM gate_base),
gate_r AS (
  SELECT {id_col},
    round((len(g3) - len(list_distinct(g3))) / greatest(len(g3), 1)::DOUBLE, 6) AS dup_3gram_frac,
    round(list_max(list_transform(list_distinct(w), d -> len(list_filter(w, x -> x = d)))) / greatest(len(w), 1)::DOUBLE, 6) AS top_word_frac
  FROM gate_g),
gatej AS (
  SELECT fq.*, r.dup_3gram_frac, r.top_word_frac,
         {reasons} AS fail_reasons,
         ({reasons} = '') AS passed
  FROM gate_fq fq JOIN gate_r r ON fq.{id_col} = r.{id_col})"""


_GATE_ORACLE = f"""
WITH {_gate_chain_sql('documents')}
SELECT doc_id::BIGINT AS doc_id, n_words::BIGINT AS n_words, quality_score,
       top_word_frac, dup_3gram_frac, fail_reasons, passed
FROM gatej
"""


def _gate_ablation_sql() -> str:
    from .datapipe.textstats import GATE_CHECKS

    lits = ", ".join(f"'{c}'" for c in GATE_CHECKS)
    return f"""
WITH {_gate_chain_sql('documents')},
ck AS (SELECT unnest([{lits}]) AS chk),
tot AS (SELECT count(*)::BIGINT AS n_total FROM gatej)
SELECT chk,
       sum(CASE WHEN list_contains(string_split(fail_reasons, ';'), chk)
                THEN 1 ELSE 0 END)::BIGINT AS n_failed,
       sum(CASE WHEN fail_reasons = chk THEN 1 ELSE 0 END)::BIGINT
         AS n_failed_only,
       ((sum(CASE WHEN list_contains(string_split(fail_reasons, ';'), chk)
                  THEN 1 ELSE 0 END) * 1000000) // n_total)::BIGINT
         AS failed_ppm,
       ((sum(CASE WHEN fail_reasons = chk THEN 1 ELSE 0 END) * 1000000)
        // n_total)::BIGINT AS marginal_ppm
FROM gatej CROSS JOIN ck CROSS JOIN tot
GROUP BY chk, n_total
"""


@_register("gate_ablation", _gate_ablation_sql())
def gate_ablation_q(spark, sf_dir):
    """Per-filter ablation of the quality gate: docs each criterion
    trips at all vs trips ALONE (its marginal removal), ppm of corpus —
    the evidence for keeping or dropping each check. Features computed
    once row-local; constant 6-way explode; one 6-group aggregate
    (datapipe/textstats.py gate_ablation)."""
    from .datapipe.textstats import gate_ablation

    return gate_ablation(_t(spark, sf_dir, "documents"))


@_register("quality_gate", _GATE_ORACLE)
def quality_gate_q(spark, sf_dir):
    """Gopher-style keep/drop gate: single-pass composition of the
    quality and repetition feature families with auditable fail_reasons.
    Thresholds chosen so the synthetic corpus trips every exercisable
    check (short/long/low-stopword/top-word/dup-3gram) on some docs and
    passes others."""
    from .datapipe.textstats import quality_gate

    out = quality_gate(_t(spark, sf_dir, "documents"))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_words").cast("bigint").alias("n_words"),
        "quality_score", "top_word_frac", "dup_3gram_frac",
        "fail_reasons", "passed",
    )


def _curation_report_oracle():
    from .datapipe.urls import normalize_url_sql

    return f"""
WITH {_url_variants_sql(with_text=True)},
kept AS (
  SELECT {normalize_url_sql('url')} AS norm_url, min(vid) AS keep_id
  FROM variants GROUP BY 1
),
s1 AS (SELECT v.vid, v.text FROM variants v JOIN kept k ON v.vid = k.keep_id),
{_gate_chain_sql('s1', 'vid')},
s2 AS (SELECT s1.vid, s1.text FROM s1 JOIN gatej g ON s1.vid = g.vid WHERE g.passed),
{_line_chain_sql('s2', 'vid')}
SELECT (SELECT count(*) FROM variants)::BIGINT AS n_input,
       (SELECT count(*) FROM s1)::BIGINT AS n_after_url_dedup,
       (SELECT count(*) FROM s2)::BIGINT AS n_after_gate,
       (SELECT coalesce(sum(n_lines_dropped), 0) FROM linej)::BIGINT AS n_lines_dropped,
       (SELECT count(*) FROM linej WHERE clean_text <> '')::BIGINT AS n_final
"""


@_register("curation_report", _curation_report_oracle())
def curation_report_q(spark, sf_dir):
    """Per-stage drop accounting for the curation cascade — the
    observability row a production pipeline logs per run: fabricated
    crawl variants → URL fold → quality gate → corpus line dedup, with
    counts after each tier plus total deduped lines.

    One-pass shape (r4 verdict #3: the cross-joined-aggregates form
    re-scanned the corpus ~4×). The plan is one LINEAR chain: every row
    is tagged with its furthest-surviving stage in a single select
    (is_kept = window-min over the normalized URL — per-URL fan-in is
    the re-fetch count, so the window is skew-safe here; survives =
    is_kept ∧ row-local gate), lines posexplode_outer so every doc
    keeps exactly one MARKER row (pos 0, or the null row for docs that
    contribute no lines), and ONE skew-safe groupBy on the line digest
    partial-aggregates BOTH the line keepers and the doc-stage counters
    (marker-row sums distribute over any grouping). A final single-row
    aggregate emits the report. Corpus scanned once — asserted in
    test_plans."""
    from pyspark.sql import Window

    from .datapipe.dedup import lines_col, spread_for_compute
    from .datapipe.textstats import gate_passed_col
    from .datapipe.urls import normalize_url_col

    # spread the single-split scan: URL normalization, the quality gate
    # and the line chunking are all compute-heavy row-local expressions
    # that would otherwise run on 1-2 scan tasks (one row group = one
    # task); the window below shuffles by normalized URL regardless, so
    # the extra exchange carries only the base variants once
    variants = spread_for_compute(_url_variants_df(spark, sf_dir, with_text=True))
    # gate + URL normalization in the projection BELOW the window: both
    # then run in the spread pre-shuffle stage (the Window's child
    # projection), not the post-window (AQE-coalesced) stage
    pre = variants.select(
        "vid", "text",
        normalize_url_col(F.col("url")).alias("_nu"),
        gate_passed_col(F.col("text")).alias("_gate"),
    )
    w = Window.partitionBy("_nu")
    tagged = (
        pre.select(
            "vid", "text", "_gate",
            (F.col("vid") == F.min("vid").over(w)).alias("is_kept"),
        )
        .select(
            "vid", "text", "is_kept",
            (F.col("is_kept") & F.col("_gate")).alias(
                "survives"
            ),
        )
        .select(
            "vid", "is_kept", "survives",
            # null for non-survivors: posexplode_outer still emits their
            # single null marker row — no second pass over the corpus
            F.when(
                F.col("survives"), lines_col(F.col("text"), _LINE_WORDS)
            ).alias("lines"),
        )
    )
    ex = tagged.select(
        "vid", "is_kept", "survives",
        F.posexplode_outer("lines").alias("pos", "line"),
    ).withColumn("lh", F.md5("line"))
    marker = (F.col("pos").isNull() | (F.col("pos") == 0)).cast("int")
    keeper = ex.groupBy("lh").agg(
        # the kept (first) occurrence of this line; null for the lh=null
        # marker-only group
        F.min(
            F.when(
                F.col("line").isNotNull(),
                F.struct(F.col("vid").alias("i"), F.col("pos").alias("p")),
            )
        ).alias("k"),
        F.sum(marker).alias("docs_part"),
        F.sum(marker * F.col("is_kept").cast("int")).alias("kept_part"),
        F.sum(marker * F.col("survives").cast("int")).alias("surv_part"),
        F.sum(F.col("line").isNotNull().cast("int")).alias("lines_part"),
    )
    return keeper.agg(
        F.sum("docs_part").cast("bigint").alias("n_input"),
        F.sum("kept_part").cast("bigint").alias("n_after_url_dedup"),
        F.sum("surv_part").cast("bigint").alias("n_after_gate"),
        (
            F.sum("lines_part")
            - F.sum(F.col("k").isNotNull().cast("int"))
        ).cast("bigint").alias("n_lines_dropped"),
        # docs whose clean_text survives non-empty: every kept chunk line
        # is a non-empty string (no empty words in the corpus — the
        # oracle comparison enforces this equivalence)
        F.count_distinct(F.col("k.i")).cast("bigint").alias("n_final"),
    )


@_register(
    "repetition_stats",
    """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, w,
    CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), i -> array_to_string(list_slice(w, i, i + 1), ' '))
         ELSE [array_to_string(w, ' ')] END AS g2,
    CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), i -> array_to_string(list_slice(w, i, i + 2), ' '))
         ELSE [array_to_string(w, ' ')] END AS g3
  FROM base)
SELECT doc_id::BIGINT AS doc_id,
  round((len(g2) - len(list_distinct(g2))) / greatest(len(g2), 1)::DOUBLE, 6) AS dup_2gram_frac,
  round((len(g3) - len(list_distinct(g3))) / greatest(len(g3), 1)::DOUBLE, 6) AS dup_3gram_frac,
  round(list_max(list_transform(list_distinct(w), d -> len(list_filter(w, x -> x = d)))) / greatest(len(w), 1)::DOUBLE, 6) AS top_word_frac
FROM g
""",
)
def repetition_stats(spark, sf_dir):
    """Gopher-style intra-document repetition filters: duplicate 2/3-gram
    fractions + top-word dominance (row-local Column math; the spread
    repartition only balances the compute over cores — see
    spread_for_compute)."""
    from .datapipe.dedup import spread_for_compute
    from .datapipe.textstats import repetition_features

    return repetition_features(
        spread_for_compute(_t(spark, sf_dir, "documents"))
    )


@_register(
    "media_resize_plan",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         ((doc_id % 64) * 16 + 64)::INT AS width,
         ((doc_id % 48) * 16 + 64)::INT AS height
  FROM documents WHERE doc_id % 3 = 0
)
SELECT media_id::BIGINT AS media_id, width::BIGINT AS width, height::BIGINT AS height,
       ceil(width * least(256.0 / width, 256.0 / height, 1.0))::BIGINT AS out_width,
       ceil(height * least(256.0 / width, 256.0 / height, 1.0))::BIGINT AS out_height
FROM m
""",
)
def media_resize_plan(spark, sf_dir):
    """Aspect-preserving resize planning (JVM-side arithmetic; pixel
    transform itself is the stubbed decode step)."""
    from .datapipe.multimodal import media_from_docs, resize_images

    media = media_from_docs(_t(spark, sf_dir, "documents"))
    out = resize_images(media, max_side=256)
    return out.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("out_width").cast("bigint").alias("out_width"),
        F.col("out_height").cast("bigint").alias("out_height"),
    )


@_register(
    "media_frame_sample",
    """
WITH v AS (
  SELECT doc_id AS media_id, (n_chars * 10)::INT AS duration_ms
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id::BIGINT AS media_id, duration_ms::BIGINT AS duration_ms,
       unnest(range(0, greatest(duration_ms - 1, 0) + 1, 1000))::BIGINT AS frame_ts_ms
FROM v
""",
)
def media_frame_sample(spark, sf_dir):
    """Video frame-sampling plan: one row per sampled timestamp (JVM
    sequence+explode; the frame decode itself is the stub)."""
    from .datapipe.multimodal import frame_sample_plan, media_from_docs

    media = media_from_docs(_t(spark, sf_dir, "documents"))
    out = frame_sample_plan(media, every_ms=1000)
    return out.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("duration_ms").cast("bigint").alias("duration_ms"),
        F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms"),
    )


def _sampling_oracles():
    from .datapipe.sampling import residue_sql, unit_sql

    return {
        "u_strata": unit_sql("doc_id", "strata"),
        "r_split": residue_sql("doc_id", "split"),
        "u_up": unit_sql("doc_id", "upsample"),
    }


_SAMPLING_U = _sampling_oracles()


def _split_cuts():
    # integer ppm cut points shared with assign_split — the oracle
    # compares the integer residue against the exact same literals
    from .datapipe.sampling import split_thresholds

    return dict(split_thresholds({"train": 0.1, "val": 0.1, "test": 0.8}))


_SPLIT_CUTS = _split_cuts()


@_register(
    "sample_stratified",
    f"""
SELECT doc_id::BIGINT AS doc_id, lang
FROM documents
WHERE ({_SAMPLING_U['u_strata']}) <
      CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END
""",
)
def sample_stratified(spark, sf_dir):
    """Per-stratum deterministic sampling (hash-uniform, rerun- and
    partitioning-stable — unlike df.sampleBy)."""
    from .datapipe.sampling import stratified_sample

    out = stratified_sample(
        _t(spark, sf_dir, "documents"),
        {"en": 0.5, "de": 0.25},
        strata_col="lang",
        default_fraction=0.1,
    )
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang")


@_register(
    "split_assign",
    f"""
SELECT doc_id::BIGINT AS doc_id,
       CASE WHEN ({_SAMPLING_U['r_split']}) < {_SPLIT_CUTS['test']} THEN 'test'
            WHEN ({_SAMPLING_U['r_split']}) < {_SPLIT_CUTS['train']} THEN 'train'
            ELSE 'val' END AS split
FROM documents
""",
)
def split_assign(spark, sf_dir):
    """Disjoint exhaustive train/val/test assignment — a pure function of
    (salt, id): stable under reruns, repartitioning, and corpus growth.
    (Interval order follows sorted split names: test, train, val.)"""
    from .datapipe.sampling import assign_split

    out = assign_split(
        _t(spark, sf_dir, "documents"),
        {"train": 0.1, "val": 0.1, "test": 0.8},
    )
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"), "split")


@_register(
    "upsample_mix",
    f"""
SELECT doc_id::BIGINT AS doc_id, unnest(range(n))::BIGINT AS copy
FROM (
  SELECT doc_id, 2 + (({_SAMPLING_U['u_up']}) < 0.5)::INT AS n
  FROM documents WHERE lang = 'de'
)
""",
)
def upsample_mix(spark, sf_dir):
    """Deterministic fractional upsampling (weight 2.5: every row twice,
    half the rows a third time) — zero-shuffle explode fan-out."""
    from .datapipe.sampling import upsample

    docs = _t(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    out = upsample(docs, 2.5)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("copy").cast("bigint").alias("copy"),
    )


def _shuffle_h_sql():
    from .datapipe.hashes import h60_salted_sql

    return h60_salted_sql("doc_id", "'shuffle-0'")


@_register(
    "shuffle_rank",
    f"""
SELECT doc_id::BIGINT AS doc_id,
       (row_number() OVER (ORDER BY h, doc_id) - 1)::BIGINT AS shuffle_rank
FROM (SELECT doc_id, {_shuffle_h_sql()} AS h FROM documents)
""",
)
def shuffle_rank_q(spark, sf_dir):
    """Epoch-0 deterministic corpus shuffle: dense rank under the hash
    permutation, computed with the distributed range-partition rank (no
    single-partition sort — same machinery as the multinomial
    bootstrap's sample indexing)."""
    from .datapipe.sampling import shuffle_order

    out = shuffle_order(_t(spark, sf_dir, "documents"), epoch=0)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("shuffle_rank").cast("bigint").alias("shuffle_rank"),
    )


@_register(
    "curation_pipeline",
    f"""
WITH q AS (
  SELECT doc_id, text, lang,
         (CASE WHEN len(string_split_regex(text, '\\s+')) >= 20 THEN 0.25
               ELSE len(string_split_regex(text, '\\s+')) / 80.0 END)
         + (CASE WHEN round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
                            / greatest(length(text), 1), 6) <= 0.1 THEN 0.25
                 ELSE greatest(0.0, 0.25 - round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
                            / greatest(length(text), 1), 6)) END)
         + least(round(len(list_filter(list_transform(string_split_regex(text, '\\s+'), x -> lower(x)),
                         x -> list_contains(['the','and','of','a','to','in','is','that','for','with'], x)))::DOUBLE
                 / greatest(len(string_split_regex(text, '\\s+')), 1), 6) * 3.0, 0.25)
         + (CASE WHEN round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                            / greatest(len(string_split_regex(text, '\\s+')), 1), 6) BETWEEN 3 AND 10
                 THEN 0.25 ELSE 0.0 END) AS qscore
  FROM documents
),
gated AS (SELECT * FROM q WHERE lang = 'en' AND round(qscore, 6) >= 0.5),
keep AS (SELECT md5(text) AS h, min(doc_id) AS keep_id FROM gated GROUP BY 1)
SELECT g.doc_id::BIGINT AS doc_id,
       round(g.qscore, 6) AS quality_score,
       CASE WHEN ({_SAMPLING_U['r_split']}) < {_SPLIT_CUTS['test']} THEN 'test'
            WHEN ({_SAMPLING_U['r_split']}) < {_SPLIT_CUTS['train']} THEN 'train'
            ELSE 'val' END AS split
FROM gated g JOIN keep k ON md5(g.text) = k.h AND g.doc_id = k.keep_id
""",
)
def curation_pipeline(spark, sf_dir):
    """End-to-end curation composition — the operators chained the way a
    training-data run uses them: quality gate (quality_features) → lang
    gate → exact dedup (first-id-per-hash survivor) → deterministic
    train/val/test assignment. Everything row-local or one hash-groupBy;
    the quality/lang predicates sit below the dedup shuffle so Catalyst
    prunes before the only wide stage."""
    from .datapipe.sampling import assign_split
    from .datapipe.textstats import quality_features

    docs = _t(spark, sf_dir, "documents")
    q = quality_features(docs).select("doc_id", "quality_score")
    gated = (
        docs.join(q, "doc_id")
        .filter((F.col("lang") == "en") & (F.col("quality_score") >= 0.5))
    )
    keep = (
        gated.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .drop("_h")
    )
    survivors = gated.join(keep, "doc_id")
    out = assign_split(survivors, {"train": 0.1, "val": 0.1, "test": 0.8})
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "quality_score",
        "split",
    )


@_register(
    "token_windows",
    """
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
),
w AS (
  SELECT doc_id, toks,
         unnest(range(0, CASE WHEN len(toks) = 0 THEN 0 ELSE len(toks) END, 30)) AS win_start
  FROM t
)
SELECT doc_id::BIGINT AS doc_id,
       (win_start / 30)::BIGINT AS win_idx,
       win_start::BIGINT AS win_start,
       least(len(toks) - win_start, 40)::BIGINT AS n_win_tokens,
       array_to_string(list_slice(toks, win_start + 1, win_start + 40), ' ') AS window
FROM w
""",
)
def token_windows_q(spark, sf_dir):
    """Context-window packing prep: overlapping max-40-token windows at
    stride 30, one row per window — row-local HOFs, no Python."""
    from .datapipe.sampling import token_windows

    return token_windows(
        _t(spark, sf_dir, "documents"), max_tokens=40, stride=30
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "win_idx", "win_start", "n_win_tokens", "window",
    )


# ---------------------------------------------------------------------------
# decode-path operators: not static SQL — __spark_entry__.oracle_sql()
# installs VALUES-literal oracles generated by the pure-Python twin
# (genie_spark.oracle_twin), so the driver's hash gate covers them too.
# ---------------------------------------------------------------------------


_FLAGSHIP_CACHE: Dict[tuple, tuple] = {}
_CATALOG_DF_CACHE: Dict[tuple, tuple] = {}


def _flagship_extraction(spark, sf_dir, constrained=True):
    """Shared flagship run: (extractor, per-sentence output DataFrame).
    The extractor (catalog collect + trie broadcast) is cached per
    (sf_dir, constrained) — graph_extract_triples, graph_materialize and
    extraction_confidence all start from the same constrained run, and
    free_extract_triples shares the pages/catalog derivation with its own
    trie-free extractor; rebuilding the broadcast per query would triple
    the catalog cost in the suite and the driver gate. The output plan is
    rebuilt per call (plans are cheap; the broadcast is not)."""
    import __spark_entry__ as entry_mod

    from .pipeline import GenieExtractor, extract_pipeline

    docs = _t(spark, sf_dir, "documents")
    # keyed by (app id, sf_dir): a broadcast from a stopped session must
    # never be served to a new one
    base_key = (spark.sparkContext.applicationId, sf_dir)
    base = _FLAGSHIP_CACHE.get(base_key)
    if base is None:
        pages = entry_mod._docs_as_pages(docs)
        ents, rels = entry_mod._corpus_catalogs(docs)
        base = (pages, ents, rels, {})
        _FLAGSHIP_CACHE.clear()  # one corpus/session at a time
        _FLAGSHIP_CACHE[base_key] = base
    pages, ents, rels, extractors = base
    ex = extractors.get(constrained)
    if ex is None:
        ex = GenieExtractor(
            spark, ents, rels, num_beams=2, constrained=constrained
        )
        extractors[constrained] = ex
    out = extract_pipeline(
        spark, pages, ents, rels, lang="en", num_beams=2, extractor=ex
    )
    return ex, out


@_register("graph_extract_triples")
def graph_extract_triples(spark, sf_dir):
    """Flagship constrained generation over the documents corpus
    (twin oracle: oracle_twin.flagship_oracle_sql)."""
    _, out = _flagship_extraction(spark, sf_dir)
    return out.select(
        "url", "sent_idx",
        F.explode_outer("pred_triples").alias("t"),
    ).select(
        "url", F.col("sent_idx").cast("bigint").alias("sent_idx"),
        "t.s", "t.r", "t.o",
    )


@_register("graph_materialize")
def graph_materialize_q(spark, sf_dir):
    """The north-star downstream stage under the hash gate: flagship
    extraction → explode → surface→id canonicalization (broadcast joins)
    → SALTED global triple dedup (salt_buckets=8 — the two-phase skew
    form runs in the gated plan, not only in its parity test) → one
    shuffle-sharing groupBy for dedup + provenance (n_sources,
    first_url). Ids are internal (corpus-catalog positions); the gated
    projection is the name triple + provenance, which the twin oracle
    reproduces as plain SQL over the flagship VALUES literal
    (oracle_twin.graph_oracle_sql)."""
    from .canonicalize import materialize_graph

    ex, out = _flagship_extraction(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    _, ents, rels, _ = _FLAGSHIP_CACHE[key]
    cat_key = key + ("catalog_dfs",)
    cached = _CATALOG_DF_CACHE.get(cat_key)
    if cached is None:
        # building a ~6k-row DataFrame from python tuples costs seconds;
        # the catalogs are fixed per corpus, so build once per session
        cached = tuple(
            spark.createDataFrame(
                [(i, n, "corpus") for i, n in enumerate(names)],
                ["id", "name", "provenance"],
            ).cache()
            for names in (ents, rels)
        )
        _CATALOG_DF_CACHE.clear()
        _CATALOG_DF_CACHE[cat_key] = cached
    ents_df, rels_df = cached
    g = materialize_graph(out, ents_df, rels_df, salt_buckets=8)
    return g.select(
        "subj_name", "pred_name", "obj_name",
        F.col("n_sources").cast("bigint").alias("n_sources"),
        "first_url",
    )


@_register("free_extract_triples")
def free_extract_triples(spark, sf_dir):
    """Unconstrained generation baseline — the reference's
    ``free_generation=true`` run mode (genie_base_pl.py:92-94: tries only
    load when constrained; genie_base_hf.py:1-36): the same decode stack
    with the full non-special vocabulary allowed at every step. Output is
    the raw prediction surface plus how many WELL-FORMED triples it
    parses into — with an untrained heuristic scorer the emitted names
    are typically ungrounded (not catalog entries), the failure mode the
    paper's constrained-vs-free comparison quantifies (twin oracle:
    oracle_twin.free_oracle_sql)."""
    _, out = _flagship_extraction(spark, sf_dir, constrained=False)
    return out.select(
        "url",
        F.col("sent_idx").cast("bigint").alias("sent_idx"),
        "prediction",
        F.size("pred_triples").cast("bigint").alias("n_triples"),
    )


@_register("extraction_confidence")
def extraction_confidence(spark, sf_dir):
    """A9 per-sample form — forced scoring of each emitted prediction
    (label-smoothed NLL, reference validation_step genie_base_pl.py:
    168-192 + utils.py:6-54, lifted into the scorer protocol) as a
    sequence-confidence column (twin oracle:
    oracle_twin.confidence_oracle_sql)."""
    ex, out = _flagship_extraction(spark, sf_dir)
    scored = ex.score_targets(out.filter(F.col("prediction").isNotNull()))
    return scored.select(
        "url",
        F.col("sent_idx").cast("bigint").alias("sent_idx"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("nll_sum", 6).alias("nll"),
        F.round("loss", 6).alias("loss"),
    )


@_register("val_nll")
def val_nll(spark, sf_dir):
    """A9 aggregation — epoch-level mean NLL / loss per token (the
    reference's on_epoch val-nll_loss log). The distributed sum runs in
    exact integer micro-units of the 6dp-rounded per-row values, so the
    result is invariant to Spark's reduction order and hash-comparable
    against the SQL aggregate over the twin rows
    (oracle_twin.val_nll_oracle_sql)."""
    per = extraction_confidence(spark, sf_dir)
    nll_u = F.round(F.col("nll") * 1_000_000, 0).cast("long")
    loss_u = F.round(F.col("loss") * 1_000_000, 0).cast("long")
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(
            (F.sum(nll_u) / 1_000_000.0) / F.sum("n_tokens"), 6
        ).alias("nll_per_token"),
        F.round(
            (F.sum(loss_u) / 1_000_000.0) / F.count(F.lit(1)), 6
        ).alias("loss_per_seq"),
    )


@_register(
    "multimodal_features",
    """
SELECT doc_id::BIGINT AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes,
       round((('0x' || substr(md5(text || chr(1)), 1, 8))::UBIGINT / 4294967296.0)::REAL::DOUBLE, 6) AS f0
FROM documents
""",
)
def multimodal_features(spark, sf_dir):
    """Binary-column media plumbing with the deterministic fake encoder
    (real decode stubbed). The mapInPandas path runs over real binary
    payloads; the oracle reproduces the md5 feature recipe in SQL because
    the test payloads are utf-8 text bytes and the salt bytes are 1-based
    (no NUL — see datapipe.multimodal._fake_features)."""
    from .datapipe.multimodal import extract_features, media_from_docs

    media = media_from_docs(_t(spark, sf_dir, "documents"))
    feats = extract_features(media, deterministic_fake=True)
    return feats.select(
        "media_id", "media_type",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        # features are float32 (real encoders emit fp32); round the
        # DOUBLE widening of that value — the oracle does ::REAL::DOUBLE
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
    )


# ---------------------------------------------------------------------------
# round-5 additions: reference-LM quality scoring, fuzzy entity linking,
# temporal knowledge fusion, RDF N-Triples export
# ---------------------------------------------------------------------------


def _lm_oracle():
    from .datapipe.textstats import lm_surprisal_sql

    return lm_surprisal_sql("documents", ref_where="doc_id % 13 = 0")


@_register("lm_surprisal", None)
def lm_surprisal_q(spark, sf_dir):
    """CCNet-style LM quality filter (Wenzek et al. 2020): per-document
    cross-entropy in EXACT integer bits against a unigram LM estimated
    from the reference slice (every 13th doc — the 'Wikipedia' stand-in,
    same convention as importance_weights). Count table broadcast;
    groupBy back to doc_id partial-aggregates map-side."""
    from .datapipe.textstats import lm_surprisal_bits

    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 13 == 0)
    return lm_surprisal_bits(docs, ref)


ORACLES["lm_surprisal"] = _lm_oracle()


_FUZZY_BLOCK_DF = 1_000_000  # permissive on the 16-token fixture vocab;
# the df-cut is the hub-token bound that matters at real vocabulary scale


@_register(
    "fuzzy_link",
    f"""
WITH fz_cat AS (SELECT p_partkey AS id, lower(p_name) AS name FROM part),
fz_men AS (
  SELECT p_partkey AS mention_id,
         regexp_replace(lower(p_name), 'a', '', 'g') AS mention
  FROM part WHERE p_partkey % 7 = 0
),
fz_ctok AS (
  SELECT DISTINCT id, tok FROM (
    SELECT id, unnest(string_split(name, ' ')) AS tok FROM fz_cat
  ) WHERE tok <> ''
),
fz_keep AS (
  SELECT tok FROM (SELECT tok, count(*) AS df FROM fz_ctok GROUP BY tok)
  WHERE df <= {_FUZZY_BLOCK_DF}
),
fz_mtok AS (
  SELECT DISTINCT mention_id, tok FROM (
    SELECT mention_id, unnest(string_split(mention, ' ')) AS tok FROM fz_men
  ) WHERE tok <> ''
),
fz_cand AS (
  SELECT DISTINCT m.mention_id, c.id
  FROM fz_mtok m JOIN fz_keep k USING (tok) JOIN fz_ctok c USING (tok)
),
fz_scored AS (
  SELECT n.mention_id, n.mention,
         levenshtein(n.mention, t.name)::BIGINT AS dist,
         t.id, t.name
  FROM fz_cand c
  JOIN fz_men n USING (mention_id)
  JOIN fz_cat t ON c.id = t.id
)
SELECT mention_id, mention, dist,
       id AS entity_id, name AS entity_name
FROM fz_scored
QUALIFY row_number() OVER (PARTITION BY mention_id ORDER BY dist, id) = 1
""",
)
def fuzzy_link_q(spark, sf_dir):
    """Blocked fuzzy entity linking: part names with every 'a' deleted
    (deterministic typo model) linked back to the part catalog via
    token blocking + Levenshtein + min(struct) argmin — the approximate
    fallback for what exact-match canonicalization (J1) cannot resolve.
    Mentions whose tokens all mutated produce no row (honest recall)."""
    from .canonicalize import fuzzy_link

    part = _t(spark, sf_dir, "part")
    catalog = part.select(
        F.col("p_partkey").alias("id"), F.lower("p_name").alias("name")
    )
    mentions = part.filter(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("mention_id"),
        F.regexp_replace(F.lower("p_name"), "a", "").alias("mention"),
    )
    out = fuzzy_link(mentions, catalog, max_block_df=_FUZZY_BLOCK_DF)
    return out.select(
        F.col("mention_id").cast("bigint").alias("mention_id"),
        "mention",
        F.col("dist").cast("bigint").alias("dist"),
        F.col("entity_id").cast("bigint").alias("entity_id"),
        "entity_name",
    )


@_register(
    "kg_fact_intervals",
    f"""
WITH fi AS (
  SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o, l_shipdate AS ts
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
),
fi_chg AS (
  SELECT s, r, o, ts,
         CASE WHEN lag(o) OVER w IS NULL OR o <> lag(o) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM fi WINDOW w AS (PARTITION BY s, r ORDER BY ts, o)
),
fi_ver AS (
  SELECT s, r, o, ts,
         sum(chg) OVER (PARTITION BY s, r ORDER BY ts, o
                        ROWS UNBOUNDED PRECEDING) AS ver
  FROM fi_chg
),
fi_runs AS (
  SELECT s, r, min(o) AS o, ver, min(ts) AS f,
         count(*)::BIGINT AS n_assertions
  FROM fi_ver GROUP BY s, r, ver
)
SELECT s::BIGINT AS s, r, o::BIGINT AS o, ver::BIGINT AS version,
       epoch(f)::BIGINT AS valid_from_epoch,
       epoch(lead(f) OVER (PARTITION BY s, r ORDER BY ver))::BIGINT
         AS valid_to_epoch,
       n_assertions
FROM fi_runs
""",
)
def kg_fact_intervals_q(spark, sf_dir):
    """Temporal fact versioning: the assertion stream collapsed into
    validity intervals per (s, r) — islands construction (lag change
    marks + running sum + one aggregate + lead), all windows partitioned
    on the key, ONE reused hash Exchange, no global sort
    (canonicalize.fact_intervals). The temporal-KG representation
    latest-wins fusion discards."""
    from .canonicalize import fact_intervals

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    assertions = li.select(
        F.col("l_orderkey").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").alias("o"),
        F.col("l_shipdate").alias("ts"),
    )
    out = fact_intervals(assertions)
    return out.select(
        F.col("s").cast("bigint").alias("s"), "r",
        F.col("o").cast("bigint").alias("o"),
        "version", "valid_from_epoch", "valid_to_epoch", "n_assertions",
    )


# mid-1995 instant: inside the assertion window (facts < _CUT) so the
# snapshot mixes closed and still-open versions
_ASOF_EPOCH = 804556800  # 1995-07-01 00:00:00 UTC


@_register(
    "kg_asof_snapshot",
    f"""
WITH fi AS (
  SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o, l_shipdate AS ts
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
),
fi_chg AS (
  SELECT s, r, o, ts,
         CASE WHEN lag(o) OVER w IS NULL OR o <> lag(o) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM fi WINDOW w AS (PARTITION BY s, r ORDER BY ts, o)
),
fi_ver AS (
  SELECT s, r, o, ts,
         sum(chg) OVER (PARTITION BY s, r ORDER BY ts, o
                        ROWS UNBOUNDED PRECEDING) AS ver
  FROM fi_chg
),
fi_runs AS (
  SELECT s, r, min(o) AS o, ver, min(ts) AS f,
         count(*)::BIGINT AS n_assertions
  FROM fi_ver GROUP BY s, r, ver
),
fi_iv AS (
  SELECT s, r, o, epoch(f)::BIGINT AS vf,
         epoch(lead(f) OVER (PARTITION BY s, r ORDER BY ver))::BIGINT AS vt
  FROM fi_runs
)
SELECT s::BIGINT AS s, r, o::BIGINT AS o,
       ({_ASOF_EPOCH} - vf)::BIGINT AS valid_for_s
FROM fi_iv
WHERE vf <= {_ASOF_EPOCH} AND (vt IS NULL OR vt > {_ASOF_EPOCH})
""",
)
def kg_asof_snapshot_q(spark, sf_dir):
    """Time-travel: the KG AS OF 1995-07-01, reconstructed as a pure
    row-local filter over the materialized interval table (one scan —
    never a re-fusion of the assertion log; the reason intervals are
    stored). Composes fact_intervals → asof_snapshot
    (canonicalize.asof_snapshot)."""
    from .canonicalize import asof_snapshot, fact_intervals

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    iv = fact_intervals(
        li.select(
            F.col("l_orderkey").alias("s"),
            F.col("l_returnflag").alias("r"),
            F.col("l_partkey").alias("o"),
            F.col("l_shipdate").alias("ts"),
        )
    )
    out = asof_snapshot(iv, _ASOF_EPOCH)
    return out.select(
        F.col("s").cast("bigint").alias("s"), "r",
        F.col("o").cast("bigint").alias("o"), "valid_for_s",
    )


@_register(
    "kg_fuse_latest",
    f"""
WITH fu AS (
  SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o, l_shipdate AS ts
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
),
fused AS (
  SELECT s, r,
         max(struct_pack(ts := ts, o := o)) AS w,
         count(*)::BIGINT AS n_assertions,
         count(DISTINCT o)::BIGINT AS n_objects
  FROM fu GROUP BY s, r
)
SELECT s::BIGINT AS s, r,
       w.o::BIGINT AS o_latest,
       epoch(w.ts)::BIGINT AS latest_epoch,
       n_assertions, n_objects,
       (CASE WHEN n_objects > 1 THEN 1 ELSE 0 END)::BIGINT AS conflicted
FROM fused
""",
)
def kg_fuse_latest_q(spark, sf_dir):
    """Temporal knowledge fusion over the target triple stream with
    l_shipdate as assertion time: latest-object-wins per (subject,
    relation) via partial-aggregatable max(struct(ts, o)), with conflict
    accounting — the step after graph_materialize when the same fact
    arrives from crawls of different warc_ts. Timestamp surfaces as
    epoch seconds (bigint) for cross-engine value identity."""
    from .canonicalize import fuse_latest

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    assertions = li.select(
        F.col("l_orderkey").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").alias("o"),
        F.col("l_shipdate").alias("ts"),
    )
    out = fuse_latest(assertions)
    return out.select(
        F.col("s").cast("bigint").alias("s"),
        "r",
        F.col("o_latest").cast("bigint").alias("o_latest"),
        F.unix_timestamp("latest_ts").cast("bigint").alias("latest_epoch"),
        "n_assertions",
        "n_objects",
        "conflicted",
    )


@_register(
    "rdf_ntriples",
    f"""
WITH {_TRIPLES_SQL},
nt AS (
  SELECT t.l_orderkey AS s, t.l_returnflag AS r, lower(p.p_name) AS o_name
  FROM trg t JOIN part p ON t.l_partkey = p.p_partkey
)
SELECT s::BIGINT AS s, r, o_name,
       '<http://example.org/entity/' || s || '> <http://example.org/prop/' || r
         || '> "' || replace(replace(o_name, '\\', '\\\\'), '"', '\\"') || '" .'
         AS ntriple
FROM nt
""",
)
def rdf_ntriples_q(spark, sf_dir):
    """RDF N-Triples export of the target graph with part names as
    object literals (backslash/quote escaping exercised in the recipe
    even though the fixture names are clean). Row-local concat — the KG
    sink counterpart of the JSONL sinks, one scan at any graph size.
    The part-name lookup is a broadcast join (dimension-sized right)."""
    from pyspark.sql.functions import broadcast

    from .triples import ntriple_col

    li = _t(spark, sf_dir, "lineitem")
    trg = (
        li.filter(F.col("l_shipdate") < _CUT)
        .select("l_orderkey", "l_returnflag", "l_partkey")
        .distinct()
    )
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", F.lower("p_name").alias("o_name")
    )
    nt = trg.join(broadcast(part), trg.l_partkey == part.p_partkey).select(
        F.col("l_orderkey").cast("bigint").alias("s"),
        F.col("l_returnflag").alias("r"),
        "o_name",
    )
    return nt.select(
        "s", "r", "o_name",
        ntriple_col(F.col("s"), F.col("r"), F.col("o_name")).alias("ntriple"),
    )


_NEG_K = 3


@_register(
    "kg_negative_samples",
    f"""
WITH {_TRIPLES_SQL},
ns_pos AS (SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o FROM trg),
ns_ents AS (SELECT DISTINCT o AS e FROM ns_pos),
ns_idx AS (
  SELECT e, (row_number() OVER (ORDER BY e) - 1)::BIGINT AS idx FROM ns_ents
),
ns_n AS (SELECT count(*)::BIGINT AS n FROM ns_ents),
ns_cand AS (
  SELECT s, r, o, j,
         (('0x' || substr(md5(j::varchar || chr(1) || s::varchar || chr(2)
                              || r || chr(2) || o::varchar), 1, 15))
          ::UBIGINT::BIGINT) % n AS idx
  FROM ns_pos
  CROSS JOIN ns_n
  CROSS JOIN (SELECT unnest(range(1, {_NEG_K} + 1)) AS j)
),
ns_neg AS (
  SELECT c.s, c.r, i.e AS o_neg, c.j
  FROM ns_cand c JOIN ns_idx i USING (idx)
  WHERE i.e <> c.o
)
SELECT n.s::BIGINT AS s, n.r, n.o_neg::BIGINT AS o_neg, n.j::BIGINT AS j
FROM ns_neg n
WHERE NOT EXISTS (
  SELECT 1 FROM ns_pos p WHERE p.s = n.s AND p.r = n.r AND p.o = n.o_neg
)
""",
)
def kg_negative_samples_q(spark, sf_dir):
    """Filtered negative sampling for KG-embedding training (TransE
    corruption, filtered setting): k=3 hash-drawn object corruptions per
    target triple, minus self-corruptions and accidental positives. The
    entity index is a dim-table-only window broadcast to the fact side;
    the draw is h60-deterministic (rerun- and partition-stable)."""
    from .datapipe.graph import negative_samples

    li = _t(spark, sf_dir, "lineitem")
    trg = (
        li.filter(F.col("l_shipdate") < _CUT)
        .select(
            F.col("l_orderkey").alias("s"),
            F.col("l_returnflag").alias("r"),
            F.col("l_partkey").alias("o"),
        )
        .distinct()
    )
    out = negative_samples(trg, k=_NEG_K, side="o")
    return out.select(
        F.col("s").cast("bigint").alias("s"),
        "r",
        F.col("o_neg").cast("bigint").alias("o_neg"),
        F.col("j").cast("bigint").alias("j"),
    )


@_register(
    "kg_relation_profile",
    f"""
WITH {_TRIPLES_SQL},
rp AS (SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o FROM trg)
SELECT r,
       count(*)::BIGINT AS n_triples,
       count(DISTINCT s)::BIGINT AS n_subjects,
       count(DISTINCT o)::BIGINT AS n_objects,
       (count(DISTINCT s) * 1000000 // count(*))::BIGINT AS functionality_ppm,
       (count(DISTINCT o) * 1000000 // count(*))::BIGINT AS inv_functionality_ppm
FROM rp GROUP BY r
""",
)
def kg_relation_profile_q(spark, sf_dir):
    """Ontology-grade relation statistics over the target graph:
    functionality / inverse functionality in integer ppm (the AMIE PCA
    ingredient) — one partial-aggregatable groupBy on relation."""
    from .datapipe.graph import relation_profile

    li = _t(spark, sf_dir, "lineitem")
    trg = (
        li.filter(F.col("l_shipdate") < _CUT)
        .select(
            F.col("l_orderkey").alias("s"),
            F.col("l_returnflag").alias("r"),
            F.col("l_partkey").alias("o"),
        )
        .distinct()
    )
    return relation_profile(trg)


@_register(
    "kg_rule_confidence",
    f"""
WITH rc AS (
  SELECT DISTINCT s, o, r FROM (
    SELECT l_orderkey AS s, l_partkey AS o, 'rf_' || l_returnflag AS r
    FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
    UNION ALL
    SELECT l_orderkey AS s, l_partkey AS o, 'ls_' || l_linestatus AS r
    FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
  )
),
rc_body AS (SELECT r AS r_body, count(*)::BIGINT AS n_body FROM rc GROUP BY r),
rc_sup AS (
  SELECT a.r AS r_body, b.r AS r_head, count(*)::BIGINT AS support
  FROM rc a JOIN rc b ON a.s = b.s AND a.o = b.o AND a.r <> b.r
  GROUP BY 1, 2
)
SELECT r_body, r_head, support, n_body,
       (support * 1000000 // n_body)::BIGINT AS confidence_ppm
FROM rc_sup JOIN rc_body USING (r_body)
""",
)
def kg_rule_confidence_q(spark, sf_dir):
    """1-hop Horn-rule mining (AMIE confidence): for every ordered
    relation pair, support and confidence of r_body(x,y) => r_head(x,y)
    in integer ppm. Self-join keyed on the (s, o) entity pair — per-key
    fan-out is the relation multiplicity of that pair, never quadratic
    in entities. Two relation families (returnflag + linestatus) give the
    miner genuine cross-family implications to find."""
    from .datapipe.graph import rule_confidence

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    rf = li.select(
        F.col("l_orderkey").alias("s"),
        F.concat(F.lit("rf_"), F.col("l_returnflag")).alias("r"),
        F.col("l_partkey").alias("o"),
    )
    ls = li.select(
        F.col("l_orderkey").alias("s"),
        F.concat(F.lit("ls_"), F.col("l_linestatus")).alias("r"),
        F.col("l_partkey").alias("o"),
    )
    return rule_confidence(rf.unionByName(ls))


def _align_sql() -> str:
    from .datapipe.align import pseudo_kb_sql

    return pseudo_kb_sql("documents", "text", n_relations=3, keep_mod=5)


@_register(
    "distant_supervision",
    f"""
WITH {{ALIGN_CTES}},
al_nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
al_subj AS (
  SELECT t.doc_id, k.s_name, k.r, k.o_name
  FROM al_tok t JOIN al_kb k ON t.tok = k.s_name
),
al_hit AS (
  SELECT DISTINCT h.doc_id, h.s_name, h.r, h.o_name
  FROM al_subj h
  JOIN al_tok t2 ON h.doc_id = t2.doc_id AND h.o_name = t2.tok
),
al_sup AS (
  SELECT s_name, r, o_name, count(DISTINCT doc_id)::BIGINT AS n_support
  FROM al_hit GROUP BY 1, 2, 3
)
SELECT s_name, r, o_name, n_support,
       (n_support * 1000000 // (SELECT n_docs FROM al_nd))::BIGINT
         AS support_ppm
FROM al_sup
""",
)
def distant_supervision_q(spark, sf_dir):
    """Distant-supervision alignment (the REBEL/GenIE training-data
    construction step, reference genie/datamodule/datasets/rebel.py
    consumes its output): KB triples aligned to every document that
    mentions both endpoint entities, aggregated to per-triple support
    counts + ppm. The KB is the deterministic corpus-vocabulary
    pseudo-KB (h60-kept pairs); alignment is two inverted-index joins
    off ONE distinct (doc_id, token) mention table — the corpus text is
    scanned exactly once and never crossed with the KB."""
    from .datapipe.align import (
        distant_supervision,
        distant_support,
        doc_tokens,
        pseudo_kb,
    )

    docs = _t(spark, sf_dir, "documents")
    tokens = doc_tokens(docs)
    kb = pseudo_kb(tokens, n_relations=3, keep_mod=5)
    n_docs_df = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return distant_support(distant_supervision(tokens, kb), n_docs_df)


ORACLES["distant_supervision"] = ORACLES["distant_supervision"].replace(
    "{ALIGN_CTES}", _align_sql().strip()
)


@_register(
    "kg_cooccurrence",
    f"""
WITH {{ALIGN_TOK}},
al_nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
co_pairs AS (
  SELECT a.tok AS a, b.tok AS b, count(*)::BIGINT AS n_ab
  FROM al_tok a JOIN al_tok b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
),
co_marg AS (SELECT tok, count(*)::BIGINT AS n_tok FROM al_tok GROUP BY tok)
SELECT p.a, p.b, p.n_ab, ma.n_tok AS n_a, mb.n_tok AS n_b,
       (p.n_ab * (SELECT n_docs FROM al_nd) * 1000000
          // (ma.n_tok * mb.n_tok))::BIGINT AS lift_ppm
FROM co_pairs p
JOIN co_marg ma ON p.a = ma.tok
JOIN co_marg mb ON p.b = mb.tok
""",
)
def kg_cooccurrence_q(spark, sf_dir):
    """Entity-pair co-occurrence with exact integer PMI lift over the
    document corpus — the distant-supervision prior for proposing NEW
    relation candidates between entities that co-occur above chance
    (lift_ppm > 1_000_000). Pair fan-out is per-document and bounded by
    distinct catalog mentions; marginals and corpus size join in as
    broadcasts."""
    from .datapipe.align import doc_tokens, entity_cooccurrence

    docs = _t(spark, sf_dir, "documents")
    tokens = doc_tokens(docs)
    n_docs_df = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return entity_cooccurrence(tokens, n_docs_df)


ORACLES["kg_cooccurrence"] = ORACLES["kg_cooccurrence"].replace(
    "{ALIGN_TOK}",
    """al_tok AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
)""",
)


@_register(
    "kg_fuse_vote",
    f"""
WITH fv AS (
  SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
),
fv_votes AS (
  SELECT s, r, o, count(*)::BIGINT AS n_votes FROM fv GROUP BY 1, 2, 3
),
fv_w AS (
  SELECT s, r, max(struct_pack(n_votes := n_votes, o := o)) AS w,
         sum(n_votes)::BIGINT AS n_total, count(*)::BIGINT AS n_objects
  FROM fv_votes GROUP BY s, r
)
SELECT s::BIGINT AS s, r, w.o::BIGINT AS o_winner, w.n_votes AS n_votes,
       n_total, n_objects,
       (w.n_votes * 1000000 // n_total)::BIGINT AS margin_ppm
FROM fv_w
""",
)
def kg_fuse_vote_q(spark, sf_dir):
    """Majority-vote knowledge fusion over the target triple stream:
    per (subject, relation) the most-asserted object wins, with margin
    in integer ppm — the timestamp-free complement of kg_fuse_latest.
    Two cascaded aggregations; the second shuffles only one row per
    distinct object, never the fact table."""
    from .canonicalize import fuse_vote

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    assertions = li.select(
        F.col("l_orderkey").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").alias("o"),
    )
    out = fuse_vote(assertions)
    return out.select(
        F.col("s").cast("bigint").alias("s"),
        "r",
        F.col("o_winner").cast("bigint").alias("o_winner"),
        "n_votes",
        "n_total",
        "n_objects",
        "margin_ppm",
    )


_SD_OLD_END = "1999-01-01"
_SD_NEW_START = "1997-01-01"


@_register(
    "kg_snapshot_diff",
    f"""
WITH sd_base AS (
  SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o, l_shipdate AS ts
  FROM lineitem
),
sd_old_w AS (
  SELECT s, r, max(struct_pack(ts := ts, o := o)) AS w
  FROM sd_base WHERE ts < TIMESTAMP '{_SD_OLD_END}' GROUP BY s, r
),
sd_new_w AS (
  SELECT s, r, max(struct_pack(ts := ts, o := o)) AS w
  FROM sd_base WHERE ts >= TIMESTAMP '{_SD_NEW_START}' GROUP BY s, r
),
sd_old AS (SELECT s, r, w.o AS o_old FROM sd_old_w),
sd_new AS (SELECT s, r, w.o AS o_new FROM sd_new_w),
sd_diff AS (
  SELECT coalesce(o.s, n.s) AS s, coalesce(o.r, n.r) AS r,
         o.o_old, n.o_new,
         CASE WHEN o.s IS NULL THEN 'added'
              WHEN n.s IS NULL THEN 'removed'
              WHEN o.o_old <> n.o_new THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM sd_old o FULL OUTER JOIN sd_new n ON o.s = n.s AND o.r = n.r
)
SELECT s::BIGINT AS s, r, o_old::BIGINT AS o_old, o_new::BIGINT AS o_new,
       status
FROM sd_diff WHERE status <> 'unchanged'
""",
)
def kg_snapshot_diff_q(spark, sf_dir):
    """Incremental KG maintenance: diff the fused graph between two
    overlapping crawl windows (old = assertions before {_SD_OLD_END},
    new = assertions from {_SD_NEW_START} on) — keys fused only from
    pre-window assertions surface as 'removed', new keys as 'added',
    winner flips as 'changed'; 'unchanged' is filtered (the diff is
    what a downstream consumer applies incrementally). One full outer
    join of two one-row-per-key snapshots."""
    from .canonicalize import fuse_latest, snapshot_diff

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").alias("o"),
        F.col("l_shipdate").alias("ts"),
    )
    old = fuse_latest(base.filter(F.col("ts") < _SD_OLD_END))
    new = fuse_latest(base.filter(F.col("ts") >= _SD_NEW_START))
    out = snapshot_diff(old, new).filter(F.col("status") != "unchanged")
    return out.select(
        F.col("s").cast("bigint").alias("s"),
        "r",
        F.col("o_old").cast("bigint").alias("o_old"),
        F.col("o_new").cast("bigint").alias("o_new"),
        "status",
    )


_ER_MAX_DIST = 1


@_register(
    "er_clusters",
    f"""
WITH RECURSIVE
er_cat AS (SELECT p_partkey AS id, lower(p_name) AS name FROM part),
er_men AS (
  SELECT p_partkey AS mention_id,
         regexp_replace(lower(p_name), 'a', '', 'g') AS mention
  FROM part WHERE p_partkey % 7 = 0
),
er_ctok AS (
  SELECT DISTINCT id, tok FROM (
    SELECT id, unnest(string_split(name, ' ')) AS tok FROM er_cat
  ) WHERE tok <> ''
),
er_keep AS (
  SELECT tok FROM (SELECT tok, count(*) AS df FROM er_ctok GROUP BY tok)
  WHERE df <= {_FUZZY_BLOCK_DF}
),
er_mtok AS (
  SELECT DISTINCT mention_id, tok FROM (
    SELECT mention_id, unnest(string_split(mention, ' ')) AS tok FROM er_men
  ) WHERE tok <> ''
),
er_cand AS (
  SELECT DISTINCT m.mention_id, c.id
  FROM er_mtok m JOIN er_keep k USING (tok) JOIN er_ctok c USING (tok)
),
er_edge0 AS (
  SELECT 'M' || n.mention_id AS u, 'E' || t.id AS w
  FROM er_cand c
  JOIN er_men n USING (mention_id)
  JOIN er_cat t ON c.id = t.id
  WHERE levenshtein(n.mention, t.name) <= {_ER_MAX_DIST}
),
er_edges AS (SELECT u, w FROM er_edge0 UNION ALL SELECT w, u FROM er_edge0),
er_reach(v, rt) AS (
  SELECT u, u FROM er_edges
  UNION
  SELECT e.w, er_reach.rt FROM er_reach JOIN er_edges e ON e.u = er_reach.v
),
er_comp AS (SELECT v, min(rt) AS cluster FROM er_reach GROUP BY v),
er_verts AS (
  SELECT 'M' || mention_id AS node FROM er_men
  UNION
  SELECT 'E' || id FROM er_cat
)
SELECT node, coalesce(c.cluster, node) AS cluster
FROM er_verts v LEFT JOIN er_comp c ON c.v = v.node
""",
)
def er_clusters_q(spark, sf_dir):
    """Collective entity resolution over the part catalog: mutated
    mentions (every 'a' deleted) edge to EVERY catalog entry within
    Levenshtein {_ER_MAX_DIST} (thresholded fuzzy candidates, not the
    fuzzy_link argmin), then distributed connected components merge
    duplicate/near-duplicate catalog listings transitively — the
    cluster step fuzzy_link alone cannot do (A~B~C chains). Oracle:
    DuckDB recursive CTE over the identical edge SQL."""
    from .canonicalize import resolve_entities

    part = _t(spark, sf_dir, "part")
    catalog = part.select(
        F.col("p_partkey").alias("id"), F.lower("p_name").alias("name")
    )
    mentions = part.filter(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("mention_id"),
        F.regexp_replace(F.lower("p_name"), "a", "").alias("mention"),
    )
    out = resolve_entities(
        mentions, catalog, max_dist=_ER_MAX_DIST, max_block_df=_FUZZY_BLOCK_DF
    )
    return out.select("node", F.col("component").alias("cluster"))


@_register(
    "distant_supervision_spans",
    f"""
WITH {{ALIGN_CTES}},
al_pos AS (
  SELECT doc_id, tok, min(pos)::BIGINT AS pos FROM (
    SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents)
  ) WHERE tok <> '' GROUP BY doc_id, tok
),
sp_subj AS (
  SELECT p.doc_id, k.s_name, k.r, k.o_name, p.pos AS s_pos
  FROM al_pos p JOIN al_kb k ON p.tok = k.s_name
)
SELECT s.doc_id, s.s_name, s.r, s.o_name, s.s_pos, p2.pos AS o_pos
FROM sp_subj s
JOIN al_pos p2 ON s.doc_id = p2.doc_id AND s.o_name = p2.tok
""",
)
def distant_supervision_spans_q(spark, sf_dir):
    """Span-anchored distant supervision — the REBEL-style training-
    example emitter: per (document, aligned KB triple) the 1-based
    token position of each endpoint's first mention. Same two-join
    inverted-index plan as distant_supervision; positions ride along in
    the mention-dedup aggregation (posexplode ↔ generate_subscripts,
    min(pos) per (doc, token) on both engines)."""
    from .datapipe.align import (
        distant_supervision_spans,
        doc_token_positions,
        doc_tokens,
        pseudo_kb,
    )

    docs = _t(spark, sf_dir, "documents")
    kb = pseudo_kb(doc_tokens(docs), n_relations=3, keep_mod=5)
    positions = doc_token_positions(docs)
    return distant_supervision_spans(positions, kb)


ORACLES["distant_supervision_spans"] = ORACLES[
    "distant_supervision_spans"
].replace("{ALIGN_CTES}", _align_sql().strip())


_TRANSE_DIM = 8
_TRANSE_MOD = 1000
_TRANSE_NEG_MOD = 100_000


def _transe_emb_sql(kind: str, name_expr: str) -> str:
    from .datapipe.hashes import h60_sql

    inner = f"'{kind}' || chr(1) || ({name_expr}) || chr(1) || d::varchar"
    return f"({h60_sql(inner)} % {_TRANSE_MOD})"


def _transe_energy_sql(
    obj_expr: str, s_expr: str = "s::varchar", r_expr: str = "r"
) -> str:
    e_s = _transe_emb_sql("e", s_expr)
    e_r = _transe_emb_sql("r", r_expr)
    e_o = _transe_emb_sql("e", obj_expr)
    return (
        f"list_sum(list_transform(range(0, {_TRANSE_DIM}), d -> "
        f"abs({e_s} + {e_r} - {e_o})))::BIGINT"
    )


@_register("kg_transe_energy", None)
def kg_transe_energy_q(spark, sf_dir):
    """TransE L1 energy + corrupted-object margin over the distinct
    target graph, with exact-integer hash-embeddings (bit-identical in
    DuckDB) — the KG-embedding scoring primitive downstream of
    kg_negative_samples. Entirely row-local Column expressions: zero
    shuffle beyond the input DISTINCT, full whole-stage codegen."""
    from .datapipe.graph import transe_energy

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    # repartition: the downstream scoring is compute-bound (4·dim md5 per
    # row in interpreted HOFs); AQE coalesces the byte-light distinct to
    # 1-2 partitions and would serialize it on one core. Partition count
    # tracks cores (defaultParallelism), not bytes.
    triples = li.select(
        F.col("l_orderkey").cast("string").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").cast("string").alias("o"),
    ).distinct().repartition(spark.sparkContext.defaultParallelism)
    out = transe_energy(
        triples, dim=_TRANSE_DIM, mod=_TRANSE_MOD, neg_mod=_TRANSE_NEG_MOD
    )
    return out.select(
        F.col("s").cast("bigint").alias("s"),
        "r",
        F.col("o").cast("bigint").alias("o"),
        "energy",
        "energy_neg",
        "margin",
    )


ORACLES["kg_transe_energy"] = f"""
WITH te AS (
  SELECT DISTINCT l_orderkey AS s, l_returnflag AS r, l_partkey AS o
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
),
te_named AS (
  SELECT s, r, o,
         'neg_' || ({{H_NEG}} % {_TRANSE_NEG_MOD})::varchar AS o_neg
  FROM te
)
SELECT s::BIGINT AS s, r, o::BIGINT AS o,
       {_transe_energy_sql("o::varchar")} AS energy,
       {_transe_energy_sql("o_neg")} AS energy_neg,
       ({_transe_energy_sql("o_neg")} - {_transe_energy_sql("o::varchar")})::BIGINT
         AS margin
FROM te_named
"""


def _transe_neg_hash_sql() -> str:
    from .datapipe.hashes import h60_sql

    return h60_sql(
        "s::varchar || chr(1) || r || chr(1) || o::varchar"
    )


ORACLES["kg_transe_energy"] = ORACLES["kg_transe_energy"].replace(
    "{H_NEG}", _transe_neg_hash_sql()
)


_LP_TEST_MOD = 200


def _lp_oracle_sql() -> str:
    from .datapipe.hashes import h60_sql

    def E(s_expr, r_expr, obj_expr):
        return _transe_energy_sql(obj_expr, s_expr=s_expr, r_expr=r_expr)

    def beat(s_expr, r_expr, obj_expr):
        e = E(s_expr, r_expr, obj_expr)
        return (
            f"CASE WHEN ({e} < t.e_true) OR ({e} = t.e_true AND"
            f" {obj_expr} < t.o) THEN 1 ELSE 0 END"
        )

    tkey = h60_sql("s || chr(1) || r || chr(1) || o")
    return f"""
WITH lp_te AS (
  SELECT DISTINCT l_orderkey::varchar AS s, l_returnflag AS r,
         l_partkey::varchar AS o
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
),
lp_test AS (
  SELECT s, r, o, {_transe_energy_sql("o", s_expr="s")}::BIGINT AS e_true
  FROM lp_te
  WHERE {tkey} % {_LP_TEST_MOD} = 0
),
lp_ents AS (SELECT DISTINCT o AS e FROM lp_te),
lp_all AS (
  SELECT t.s, t.r, t.o, sum({beat("t.s", "t.r", "c.e")})::BIGINT AS n_all
  FROM lp_test t CROSS JOIN lp_ents c
  WHERE c.e <> t.o
  GROUP BY t.s, t.r, t.o
),
lp_known AS (
  SELECT t.s, t.r, t.o, sum({beat("t.s", "t.r", "p.o")})::BIGINT AS n_known
  FROM lp_test t JOIN lp_te p ON p.s = t.s AND p.r = t.r AND p.o <> t.o
  GROUP BY t.s, t.r, t.o
),
lp_ranks AS (
  SELECT t.r,
         (1 + coalesce(a.n_all, 0) - coalesce(k.n_known, 0))::BIGINT AS rnk
  FROM lp_test t
  LEFT JOIN lp_all a ON a.s = t.s AND a.r = t.r AND a.o = t.o
  LEFT JOIN lp_known k ON k.s = t.s AND k.r = t.r AND k.o = t.o
)
SELECT r, count(*)::BIGINT AS n_test,
       (sum(1000000 // rnk) // count(*))::BIGINT AS mrr_ppm,
       (1000000 * sum(CASE WHEN rnk <= 1 THEN 1 ELSE 0 END)
          // count(*))::BIGINT AS hits1_ppm,
       (1000000 * sum(CASE WHEN rnk <= 3 THEN 1 ELSE 0 END)
          // count(*))::BIGINT AS hits3_ppm,
       (1000000 * sum(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END)
          // count(*))::BIGINT AS hits10_ppm,
       sum(rnk)::BIGINT AS sum_rank
FROM lp_ranks GROUP BY r
"""


@_register("kg_link_prediction", None)
def kg_link_prediction_q(spark, sf_dir):
    """Filtered link-prediction evaluation (Bordes et al. 2013 ranking
    protocol, filtered setting of Sun et al. 2019) over the target
    graph with exact-integer hash embeddings: per-relation MRR and
    Hits@{{1,3,10}} in integer ppm, deterministic (energy, entity-id)
    tiebreak. Completes the KG-embedding chain kg_negative_samples →
    kg_transe_energy → eval. Scale shape: candidate universe broadcast,
    beat counts partial-aggregate map-side (the shuffle never carries
    the |test|×|E| product), filtered correction via a fact-bounded
    (s, r) join — no anti-join over the candidate cross product."""
    from .datapipe.graph import link_prediction

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    triples = li.select(
        F.col("l_orderkey").cast("string").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").cast("string").alias("o"),
    )
    return link_prediction(
        triples, dim=_TRANSE_DIM, mod=_TRANSE_MOD, test_mod=_LP_TEST_MOD
    )


ORACLES["kg_link_prediction"] = _lp_oracle_sql()


@_register(
    "calibration_bins",
    f"""
WITH cb_pred AS (
  SELECT l_orderkey AS id, l_returnflag AS r, l_partkey AS o,
         max(l_quantity::INTEGER) AS qty
  FROM lineitem WHERE l_quantity > {_QTY} GROUP BY 1, 2, 3
),
cb_trg AS (
  SELECT DISTINCT l_orderkey AS id, l_returnflag AS r, l_partkey AS o
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
),
cb_s AS (
  SELECT p.id,
         count(*)::BIGINT AS n_pred,
         sum(CASE WHEN t.id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_correct,
         (sum(least(p.qty - {_QTY}, {_QTY})) * 1000000
            // (count(*) * {_QTY}))::BIGINT AS conf_ppm
  FROM cb_pred p
  LEFT JOIN cb_trg t ON t.id = p.id AND t.r = p.r AND t.o = p.o
  GROUP BY p.id
),
cb_b AS (
  SELECT least(9, conf_ppm // 100000)::BIGINT AS bin, conf_ppm,
         (1000000 * n_correct // n_pred)::BIGINT AS acc_ppm
  FROM cb_s
)
SELECT bin, count(*)::BIGINT AS n_samples,
       (sum(conf_ppm) // count(*))::BIGINT AS mean_conf_ppm,
       (sum(acc_ppm) // count(*))::BIGINT AS mean_acc_ppm,
       abs((sum(conf_ppm) // count(*))
           - (sum(acc_ppm) // count(*)))::BIGINT AS gap_ppm
FROM cb_b GROUP BY bin
""",
)
def calibration_bins_q(spark, sf_dir):
    """Extraction-confidence calibration: per-sample confidence (how far
    predicted items clear the decision threshold, integer ppm) vs
    per-sample precision, binned into a 10-bin reliability diagram
    (Guo et al. 2017) — the evaluation-side counterpart of
    extraction_confidence. All floor-integer arithmetic; one row-local
    pass to per-sample stats, one counter-sized groupBy to bins."""
    from .metrics import calibration_bins

    li = _t(spark, sf_dir, "lineitem")
    pred = (
        li.filter(F.col("l_quantity") > _QTY)
        .groupBy(
            F.col("l_orderkey").alias("id"),
            F.col("l_returnflag").alias("r"),
            F.col("l_partkey").alias("o"),
        )
        .agg(F.max(F.col("l_quantity").cast("int")).alias("qty"))
    )
    trg = (
        li.filter(F.col("l_shipdate") < _CUT)
        .select(
            F.col("l_orderkey").alias("id"),
            F.col("l_returnflag").alias("r"),
            F.col("l_partkey").alias("o"),
        )
        .distinct()
        .withColumn("_hit", F.lit(1).cast("long"))
    )
    per_sample = (
        pred.join(trg, ["id", "r", "o"], "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pred"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0).cast("long")))
            .cast("long")
            .alias("n_correct"),
            F.expr(
                f"sum(least(qty - {_QTY}, {_QTY})) * 1000000L"
                f" div (count(1) * {_QTY}L)"
            ).cast("long").alias("conf_ppm"),
        )
        .select(
            "conf_ppm",
            F.expr("1000000L * n_correct div n_pred")
            .cast("long")
            .alias("acc_ppm"),
        )
    )
    return calibration_bins(per_sample, bins=10)


@_register(
    "kg_constraint_violations",
    f"""
WITH cv AS (
  SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
)
SELECT s::BIGINT AS s, r, count(DISTINCT o)::BIGINT AS n_objects,
       min(o)::BIGINT AS min_o, max(o)::BIGINT AS max_o
FROM cv WHERE r IN ('N', 'R') GROUP BY s, r
HAVING count(DISTINCT o) > 1
""",
)
def kg_constraint_violations_q(spark, sf_dir):
    """Wikidata-style single-value property-constraint checking over
    the target graph: relations 'N' and 'R' are declared functional;
    every subject holding >1 distinct object under them is a violation
    row. Relation filter pushes to the scan; ONE partial-agg groupBy;
    violation-sized output."""
    from .datapipe.graph import constraint_violations

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    triples = li.select(
        F.col("l_orderkey").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").alias("o"),
    )
    out = constraint_violations(triples, ["N", "R"])
    return out.select(
        F.col("s").cast("bigint").alias("s"),
        "r",
        "n_objects",
        F.col("min_o").cast("bigint").alias("min_o"),
        F.col("max_o").cast("bigint").alias("max_o"),
    )


@_register(
    "link_prior",
    f"""
WITH lpr_cat AS (
  SELECT p_partkey AS id,
         array_to_string((string_split(p_name, ' '))[1:2], ' ') AS name
  FROM part
),
lpr_sup AS (
  SELECT l_partkey AS id, count(*)::BIGINT AS support
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}' GROUP BY 1
),
lpr_cand AS (
  SELECT c.name, c.id, coalesce(s.support, 0)::BIGINT AS support
  FROM lpr_cat c LEFT JOIN lpr_sup s USING (id)
),
lpr_rank AS (
  SELECT name, id, support,
         row_number() OVER (PARTITION BY name ORDER BY support DESC, id) AS rn,
         count(*) OVER (PARTITION BY name) AS nc
  FROM lpr_cand
)
SELECT name, nc::BIGINT AS n_candidates, id::BIGINT AS entity_id, support
FROM lpr_rank WHERE rn = 1
""",
)
def link_prior_q(spark, sf_dir):
    """Commonness-prior entity disambiguation: two-word part-name
    surface forms (genuinely ambiguous) resolved to the candidate with
    the most target-graph support, ties to lowest id. The prior-based
    alternative to J6's drop-ambiguous policy; one dimension join + one
    min(struct) groupBy, no window over facts."""
    from .canonicalize import link_prior

    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    catalog = part.select(
        F.col("p_partkey").alias("id"),
        F.concat_ws(" ", F.slice(F.split(F.col("p_name"), " "), 1, 2)).alias(
            "name"
        ),
    )
    support = (
        li.filter(F.col("l_shipdate") < _CUT)
        .groupBy(F.col("l_partkey").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    return link_prior(catalog, support)



@_register(
    "kg_evidence",
    f"""
WITH ev AS (
  SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o,
         l_shipdate AS ts, 'sup_' || l_suppkey AS src
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
)
SELECT s::BIGINT AS s, r, o::BIGINT AS o,
       count(*)::BIGINT AS n_assertions,
       count(DISTINCT src)::BIGINT AS n_sources,
       epoch(min(ts))::BIGINT AS first_epoch,
       epoch(max(ts))::BIGINT AS last_epoch,
       min(src) AS src_sample
FROM ev GROUP BY s, r, o
""",
)
def kg_evidence_q(spark, sf_dir):
    """Per-triple evidence/provenance aggregation over the assertion
    stream: assertion + distinct-source counts, first/last sighting
    (epoch seconds for cross-engine identity), deterministic sample
    source — the trust signal a constructed KG publishes next to each
    fact. ONE partial-aggregatable groupBy; every aggregate map-side
    combines."""
    from .canonicalize import triple_evidence

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    assertions = li.select(
        F.col("l_orderkey").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").alias("o"),
        F.col("l_shipdate").alias("ts"),
        F.concat(F.lit("sup_"), F.col("l_suppkey").cast("string")).alias("src"),
    )
    out = triple_evidence(assertions)
    return out.select(
        F.col("s").cast("bigint").alias("s"),
        "r",
        F.col("o").cast("bigint").alias("o"),
        "n_assertions",
        "n_sources",
        F.unix_timestamp("first_ts").cast("bigint").alias("first_epoch"),
        F.unix_timestamp("last_ts").cast("bigint").alias("last_epoch"),
        "src_sample",
    )


@_register(
    "kg_fuse_weighted",
    f"""
WITH fw AS (
  SELECT l_orderkey AS s, l_returnflag AS r, l_partkey AS o,
         l_quantity::BIGINT AS w
  FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUT}'
),
fw_sums AS (
  SELECT s, r, o, sum(w)::BIGINT AS w_sum FROM fw GROUP BY s, r, o
),
fw_w AS (
  SELECT s, r, max(struct_pack(w_sum := w_sum, o := o)) AS w,
         sum(w_sum)::BIGINT AS w_total, count(*)::BIGINT AS n_objects
  FROM fw_sums GROUP BY s, r
)
SELECT s::BIGINT AS s, r, w.o::BIGINT AS o_winner, w.w_sum AS w_winner,
       w_total, n_objects,
       (w.w_sum * 1000000 // w_total)::BIGINT AS margin_ppm
FROM fw_w
""",
)
def kg_fuse_weighted_q(spark, sf_dir):
    """Weight-aware knowledge fusion: per (subject, relation) the
    object with the greatest total integer weight wins (source-trust
    voting; weight = l_quantity as the stand-in trust score). Same
    two-cascade plan as kg_fuse_vote — second shuffle moves one row per
    distinct object."""
    from .canonicalize import fuse_weighted

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < _CUT)
    assertions = li.select(
        F.col("l_orderkey").alias("s"),
        F.col("l_returnflag").alias("r"),
        F.col("l_partkey").alias("o"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    out = fuse_weighted(assertions)
    return out.select(
        F.col("s").cast("bigint").alias("s"),
        "r",
        F.col("o_winner").cast("bigint").alias("o_winner"),
        "w_winner",
        "w_total",
        "n_objects",
        "margin_ppm",
    )


_CHAIN_FACTS_SQL = """
  cf AS (
    SELECT 'S' || s_suppkey AS s, 'based_in' AS r, 'N' || s_nationkey AS o
    FROM supplier
    UNION ALL
    SELECT 'N' || n_nationkey, 'part_of', 'R' || n_regionkey FROM nation
    UNION ALL
    SELECT 'S' || s.s_suppkey, 'located_in', 'R' || n.n_regionkey
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey % 3 <> 0
    UNION ALL
    SELECT 'C' || c_custkey, 'cust_in', 'N' || c_nationkey FROM customer
    UNION ALL
    SELECT 'C' || c.c_custkey, 'cust_region', 'R' || n.n_regionkey
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey % 2 = 0
  )
"""


@_register(
    "kg_chain_rules",
    f"""
WITH {_CHAIN_FACTS_SQL},
cfd AS (SELECT DISTINCT s, r, o FROM cf),
paths AS (
  SELECT DISTINCT a.s AS x, b.o AS y, a.r AS r1, b.r AS r2
  FROM cfd a JOIN cfd b ON a.o = b.s
),
body_n AS (SELECT r1, r2, count(*)::BIGINT AS n_body FROM paths GROUP BY r1, r2),
sup AS (
  SELECT p.r1, p.r2, h.r AS r_head, count(*)::BIGINT AS support
  FROM paths p JOIN cfd h ON p.x = h.s AND p.y = h.o
  GROUP BY 1, 2, 3
)
SELECT s.r1, s.r2, s.r_head, s.support, b.n_body,
       (s.support * 1000000 // b.n_body)::BIGINT AS confidence_ppm
FROM sup s JOIN body_n b USING (r1, r2)
""",
)
def kg_chain_rules_q(spark, sf_dir):
    """AMIE-style 2-hop chain-rule mining over a 5-relation fact set
    with engineered partial implications: based_in(x,z) ∧ part_of(z,y)
    ⇒ located_in(x,y) holds for ~2/3 of suppliers, cust_in ∧ part_of ⇒
    cust_region for ~1/2 of customers — CWA confidence in integer ppm.
    Body join keyed on the shared variable z (the AMIE hub-skew point,
    documented in chain_rule_confidence); paths dedup before the head
    join."""
    from .datapipe.graph import chain_rule_confidence

    return chain_rule_confidence(_chain_facts_df(spark, sf_dir), min_support=1)


def _chain_facts_df(spark, sf_dir):
    """Spark twin of _CHAIN_FACTS_SQL (the 5-relation engineered fact
    universe shared by the rule-mining and rule-application queries)."""
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")

    def fact(df, s_expr, r_name, o_expr):
        return df.select(
            s_expr.alias("s"), F.lit(r_name).alias("r"), o_expr.alias("o")
        )

    sn = F.concat(F.lit("S"), F.col("s_suppkey").cast("string"))
    nn = F.concat(F.lit("N"), F.col("s_nationkey").cast("string"))
    facts = fact(sup, sn, "based_in", nn)
    facts = facts.unionByName(
        fact(
            nat,
            F.concat(F.lit("N"), F.col("n_nationkey").cast("string")),
            "part_of",
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")),
        )
    )
    sj = sup.join(nat, sup.s_nationkey == nat.n_nationkey).filter(
        F.col("s_suppkey") % 3 != 0
    )
    facts = facts.unionByName(
        fact(
            sj,
            F.concat(F.lit("S"), F.col("s_suppkey").cast("string")),
            "located_in",
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")),
        )
    )
    facts = facts.unionByName(
        fact(
            cust,
            F.concat(F.lit("C"), F.col("c_custkey").cast("string")),
            "cust_in",
            F.concat(F.lit("N"), F.col("c_nationkey").cast("string")),
        )
    )
    cj = cust.join(nat, cust.c_nationkey == nat.n_nationkey).filter(
        F.col("c_custkey") % 2 == 0
    )
    facts = facts.unionByName(
        fact(
            cj,
            F.concat(F.lit("C"), F.col("c_custkey").cast("string")),
            "cust_region",
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")),
        )
    )
    return facts


_RULE_MIN_CONF = 300_000
_RULE_MIN_SUP = 5


@_register(
    "kg_rule_infer",
    f"""
WITH {_CHAIN_FACTS_SQL},
ri_f AS (SELECT DISTINCT s, r, o FROM cf),
ri_paths AS (
  SELECT DISTINCT a.s AS x, b.o AS y, a.r AS r1, b.r AS r2
  FROM ri_f a JOIN ri_f b ON a.o = b.s),
ri_body AS (SELECT r1, r2, count(*)::BIGINT AS n_body FROM ri_paths GROUP BY 1, 2),
ri_sup AS (
  SELECT p.r1, p.r2, h.r AS r_head, count(*)::BIGINT AS support
  FROM ri_paths p JOIN ri_f h ON p.x = h.s AND p.y = h.o
  GROUP BY 1, 2, 3),
ri_rules AS (
  SELECT s.r1, s.r2, s.r_head,
         (s.support * 1000000 // b.n_body)::BIGINT AS confidence_ppm
  FROM ri_sup s JOIN ri_body b USING (r1, r2)
  WHERE s.support >= {_RULE_MIN_SUP}
    AND (s.support * 1000000 // b.n_body) >= {_RULE_MIN_CONF}),
ri_cand AS (
  SELECT p.x, r.r_head, p.y, r.r1, r.r2, r.confidence_ppm
  FROM ri_paths p JOIN ri_rules r USING (r1, r2)
  WHERE NOT EXISTS (SELECT 1 FROM ri_f f
                    WHERE f.s = p.x AND f.r = r.r_head AND f.o = p.y)),
ri_best AS (
  SELECT x, r_head, y,
         min(struct_pack(nc := -confidence_ppm, a := r1, b := r2)) AS k
  FROM ri_cand GROUP BY 1, 2, 3)
SELECT x AS s, r_head AS r, y AS o, k['a'] AS r1, k['b'] AS r2,
       (-k['nc'])::BIGINT AS confidence_ppm
FROM ri_best
""",
)
def kg_rule_infer_q(spark, sf_dir):
    """KB completion by mined rules — the application half of the AMIE
    loop: confident chain rules (≥0.3 conf, ≥5 support) propose head
    facts from body paths, known facts anti-join away, each new fact
    keeps its best supporting rule. On the engineered universe this
    reconstructs exactly the located_in/cust_region facts the fixture
    withheld (suppkey%3=0, odd custkeys) — mining completes the KG
    where evidence was dropped. Rules broadcast; candidate anti-join
    and best-rule groupBy keyed on the fact
    (datapipe/graph.py rule_based_inference)."""
    from .datapipe.graph import rule_based_inference

    return rule_based_inference(
        _chain_facts_df(spark, sf_dir),
        min_confidence_ppm=_RULE_MIN_CONF,
        min_support=_RULE_MIN_SUP,
    )


@_register(
    "distant_supervision_sentences",
    f"""
WITH {{ALIGN_CTES}},
sd_seed AS (
  SELECT doc_id, replace(text, ' the ', '. the ') AS text FROM documents
),
sd_paras AS (
  SELECT doc_id, p, pidx
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS p,
               generate_subscripts(string_split(text, chr(10)), 1) AS pidx
        FROM sd_seed)
  WHERE length(p) > 0
),
sd_sents AS (
  SELECT doc_id, pidx, s, sidx
  FROM (SELECT doc_id, pidx,
               unnest(string_split(replace(p, '. ', '.' || chr(1)), chr(1))) AS s,
               generate_subscripts(string_split(replace(p, '. ', '.' || chr(1)), chr(1)), 1) AS sidx
        FROM sd_paras)
  WHERE trim(s) <> ''
),
sd_ordered AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY pidx, sidx) - 1 AS sent_idx,
         regexp_replace(s || ' ', '\\s{{2,}}', ' ', 'g') AS sent
  FROM sd_sents
),
sd_tok AS (
  SELECT DISTINCT doc_id, sent_idx, replace(tok0, '.', '') AS tok FROM (
    SELECT doc_id, sent_idx,
           unnest(string_split(lower(sent), ' ')) AS tok0
    FROM sd_ordered
  ) WHERE replace(tok0, '.', '') <> ''
),
sd_subj AS (
  SELECT t.doc_id, t.sent_idx, k.s_name, k.r, k.o_name
  FROM sd_tok t JOIN al_kb k ON t.tok = k.s_name
),
sd_hits AS (
  SELECT DISTINCT h.doc_id, h.sent_idx, h.s_name, h.r, h.o_name
  FROM sd_subj h
  JOIN sd_tok t2 ON h.doc_id = t2.doc_id AND h.sent_idx = t2.sent_idx
             AND h.o_name = t2.tok
)
SELECT s_name, r, o_name,
       count(*)::BIGINT AS n_sent_support,
       count(DISTINCT doc_id)::BIGINT AS n_doc_support
FROM sd_hits GROUP BY 1, 2, 3
""",
)
def distant_supervision_sentences_q(spark, sf_dir):
    """Sentence-bounded distant supervision — the REBEL construction
    grain: a KB triple counts as supported only where both endpoints
    share a SENTENCE (Riedel et al. 2010 at-least-one semantics).
    Composes the byte-identical sentence splitter (extract.sentences_df,
    with the seeded '. the ' boundary the sentence_split oracle uses)
    with the alignment tier's inverted-index joins; aggregates to
    per-triple sentence + document support."""
    from .datapipe.align import (
        distant_supervision_sentences,
        doc_tokens,
        pseudo_kb,
        sentence_tokens,
    )
    from .extract import sentences_df

    docs = _t(spark, sf_dir, "documents")
    kb = pseudo_kb(doc_tokens(docs), n_relations=3, keep_mod=5)
    seeded = docs.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" the "), F.lit(". the ")).alias("text"),
    )
    stoks = sentence_tokens(sentences_df(seeded))
    return distant_supervision_sentences(stoks, kb)


ORACLES["distant_supervision_sentences"] = ORACLES[
    "distant_supervision_sentences"
].replace("{ALIGN_CTES}", _align_sql().strip())


# -- Sketches: the approximate-query tier (datapipe/sketches.py) -------------
#
# At 100 TB, exact distinct-counts, full key-frequency tables, and raw
# eval-set broadcasts are the scale bottlenecks these three classic
# sketches exist to remove. Each query materializes the sketch AND the
# exact answer side-by-side so the error the approximation trades away
# is itself part of the audited output; every number is integer
# arithmetic over the cross-engine h60/affine_mix hash family, so the
# DuckDB oracle reproduces the sketch contents bit-for-bit.

_DSK_BUCKETS = 256


def _tok_sql() -> str:
    return (
        "tokx AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),\n"
        "tk AS (SELECT t FROM tokx WHERE t <> '')"
    )


def _tok_df(spark, sf_dir) -> DataFrame:
    from .datapipe.dedup import spread_for_compute

    docs = spread_for_compute(_t(spark, sf_dir, "documents"))
    return docs.select(F.explode(F.split("text", " ")).alias("t")).filter(
        F.col("t") != ""
    )


def _sketch_distinct_sql() -> str:
    from .datapipe.sketches import distinct_sketch_sql

    return f"""
WITH {_tok_sql()},
{distinct_sketch_sql('tk', 't', _DSK_BUCKETS)},
ex AS (SELECT count(DISTINCT t)::BIGINT AS exact_distinct FROM tk)
SELECT est_distinct, exact_distinct,
       ((abs(est_distinct - exact_distinct) * 1000000) // exact_distinct)::BIGINT AS err_ppm,
       {_DSK_BUCKETS}::BIGINT AS n_buckets
FROM dsk_e, ex
"""


@_register("sketch_distinct", None)
def sketch_distinct_q(spark, sf_dir):
    """Corpus vocabulary size by min-hash sketch vs exact, one row with
    the realized error in ppm. The sketch side is ONE partial-agg
    groupBy down to 256 (bucket, min) rows — the distinct-count shape
    that survives 100 TB (count-distinct shuffles every distinct value;
    the sketch is duplication-insensitive and mergeable). The exact
    side rides along as the audit (datapipe/sketches.py
    minhash_distinct_sketch)."""
    from .datapipe.sketches import distinct_estimate, minhash_distinct_sketch

    tok = _tok_df(spark, sf_dir)
    est = distinct_estimate(
        minhash_distinct_sketch(tok, "t", _DSK_BUCKETS), _DSK_BUCKETS
    )
    exact = tok.agg(F.count_distinct("t").cast("bigint").alias("exact_distinct"))
    return est.crossJoin(exact).select(
        "est_distinct",
        "exact_distinct",
        F.expr(
            "(abs(est_distinct - exact_distinct) * 1000000L) div exact_distinct"
        ).alias("err_ppm"),
        F.lit(_DSK_BUCKETS).cast("bigint").alias("n_buckets"),
    )


ORACLES["sketch_distinct"] = _sketch_distinct_sql()


_CMS_DEPTH, _CMS_WIDTH, _CMS_TOP = 4, 1024, 20


def _cms_heavy_hitters_sql() -> str:
    from .datapipe.hashes import affine_mix_sql, h60_sql
    from .datapipe.sketches import cms_sql_chain

    mix = affine_mix_sql("(" + h60_sql("t") + ")", "j")
    return f"""
WITH {_tok_sql()},
{cms_sql_chain('tk', 't', _CMS_DEPTH, _CMS_WIDTH)},
top AS (SELECT t, count(*)::BIGINT AS exact_cnt FROM tk GROUP BY t
        ORDER BY exact_cnt DESC, t LIMIT {_CMS_TOP}),
pc AS (SELECT top.t, top.exact_cnt, j::INT AS j, ({mix}) % {_CMS_WIDTH} AS b
       FROM top, range({_CMS_DEPTH}) r(j))
SELECT pc.t AS token, pc.exact_cnt,
       min(c.cnt)::BIGINT AS cms_cnt,
       (min(c.cnt) - pc.exact_cnt)::BIGINT AS overcount
FROM pc JOIN cms_cells c ON c.j = pc.j AND c.b = pc.b
GROUP BY 1, 2
"""


@_register("cms_heavy_hitters", None)
def cms_heavy_hitters_q(spark, sf_dir):
    """Count-min-sketch frequency estimates for the exact top-20 tokens,
    with the realized one-sided overcount per token. The sketch is a
    4x1024-cell table built by one partial-agg groupBy (mergeable by
    cellwise sum) and broadcast to the probe join — the hot-key answer
    whose state never grows with key cardinality (datapipe/sketches.py
    cms_sketch/cms_estimate). The exact top-20 rides along as audit;
    ties broken by token so both engines pick the same set."""
    from .datapipe.sketches import cms_estimate, cms_sketch

    tok = _tok_df(spark, sf_dir)
    sk = cms_sketch(tok, "t", _CMS_DEPTH, _CMS_WIDTH)
    top = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("t"))
        .limit(_CMS_TOP)
    )
    est = cms_estimate(sk, top.select("t"), "t", _CMS_DEPTH, _CMS_WIDTH)
    return top.join(est, "t").select(
        F.col("t").alias("token"),
        "exact_cnt",
        "cms_cnt",
        (F.col("cms_cnt") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
    )


ORACLES["cms_heavy_hitters"] = _cms_heavy_hitters_sql()


_BLOOM_BITS, _BLOOM_K = 1 << 16, 5


def _bloom_decontaminate_sql() -> str:
    from .datapipe.sketches import bloom_probe_sql, bloom_sql_chain

    return f"""
WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
cg AS (SELECT DISTINCT unnest({_grams_sql(_DECONTAM_N)}) AS gram FROM tw),
ev AS (SELECT list_slice(w, 1, 12) AS w FROM tw WHERE doc_id % 37 = 0),
eg AS (SELECT DISTINCT unnest({_grams_sql(_DECONTAM_N)}) AS gram FROM ev),
{bloom_sql_chain('eg', 'gram', _BLOOM_BITS, _BLOOM_K)},
{bloom_probe_sql('cg', 'gram', _BLOOM_BITS, _BLOOM_K)},
tot AS (SELECT count(*)::BIGINT AS n_probe_grams FROM cg),
bh AS (SELECT count(*)::BIGINT AS n_bloom_hits FROM bl_hits),
th AS (SELECT count(*)::BIGINT AS n_true_hits FROM cg JOIN eg USING (gram))
SELECT n_probe_grams, n_bloom_hits, n_true_hits,
       (n_bloom_hits - n_true_hits)::BIGINT AS n_false_pos,
       (((n_bloom_hits - n_true_hits) * 1000000)
        // (n_probe_grams - n_true_hits))::BIGINT AS fp_ppm
FROM tot, bh, th
"""


@_register("bloom_decontaminate", None)
def bloom_decontaminate_q(spark, sf_dir):
    """Bloom-filter decontamination audit: the eval set (the
    decontaminate fixture — first-12-word slices of every 37th doc,
    8-grams) is packed into a 2^16-bit / k=5 Bloom bitmap of ~1k
    62-bit words, and every distinct corpus 8-gram is probed against
    it. One summary row: probe volume, Bloom hits, exact hits, and the
    realized false-positive count/rate — no false negatives by
    construction (asserted in tests). At 100 TB the bitmap's broadcast
    size is fixed by `bits` alone, vs `decontaminate`'s raw-gram
    broadcast growing with the eval set (datapipe/sketches.py
    bloom_bitmap/bloom_hits)."""
    from .datapipe.dedup import shingles_col
    from .datapipe.sketches import bloom_bitmap, bloom_hits

    docs = _t(spark, sf_dir, "documents")
    cg = docs.select(
        F.explode(shingles_col(F.col("text"), _DECONTAM_N)).alias("gram")
    ).distinct()
    eval_docs = docs.filter(F.pmod("doc_id", F.lit(37)) == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("text")
    )
    eg = eval_docs.select(
        F.explode(shingles_col(F.col("text"), _DECONTAM_N)).alias("gram")
    ).distinct()
    bm = bloom_bitmap(eg, "gram", _BLOOM_BITS, _BLOOM_K)
    hits = bloom_hits(cg, "gram", bm, _BLOOM_BITS, _BLOOM_K)
    tot = cg.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe_grams"))
    bh = hits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bloom_hits"))
    th = cg.join(eg, "gram", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_hits")
    )
    return (
        tot.crossJoin(bh)
        .crossJoin(th)
        .select(
            "n_probe_grams",
            "n_bloom_hits",
            "n_true_hits",
            (F.col("n_bloom_hits") - F.col("n_true_hits"))
            .cast("bigint")
            .alias("n_false_pos"),
            F.expr(
                "((n_bloom_hits - n_true_hits) * 1000000L)"
                " div (n_probe_grams - n_true_hits)"
            ).alias("fp_ppm"),
        )
    )


ORACLES["bloom_decontaminate"] = _bloom_decontaminate_sql()


# -- Graph completions: k-core trim, relational SSSP, walk corpus ------------

_KCORE_K, _KCORE_ROUNDS = 2, 8


def _kg_kcore_sql() -> str:
    from .datapipe.graph import kcore_sql_chain

    r = _KCORE_ROUNDS
    return f"""
WITH {_KG_EDGES_SQL},
{kcore_sql_chain('kg_edges', _KCORE_K, r)}
SELECT v AS entity, count(*)::BIGINT AS core_deg FROM (
  SELECT a AS v FROM ku{r} UNION ALL SELECT b FROM ku{r}) GROUP BY v
"""


@_register("kg_kcore", None)
def kg_kcore_q(spark, sf_dir):
    """2-core of the constructed KG by fixed-round peeling — the
    standard pre-embedding quality trim (drop weakly-attached crawl
    debris). Fixed 8 rounds in BOTH engines (no-op past the fixpoint)
    so no driver-side convergence count; per round one partial-agg
    degree groupBy + two left-semi survivor joins
    (datapipe/graph.py kcore_fixed)."""
    from .datapipe.graph import kcore_fixed

    return kcore_fixed(
        _kg_edges_df(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS
    )


ORACLES["kg_kcore"] = _kg_kcore_sql()


_SSSP_ROUNDS = 6


def _kg_sssp_sql() -> str:
    from .datapipe.graph import bellman_ford_sql_chain
    from .datapipe.hashes import h60_sql

    w = f"1 + ({h60_sql('src || chr(124) || dst')}) % 5"
    return f"""
WITH {_KG_EDGES_SQL},
seeds AS (SELECT DISTINCT 'O' || l_orderkey AS v FROM lineitem
          WHERE l_orderkey % {_KG_SEED_MOD} = 0),
{bellman_ford_sql_chain('kg_edges', 'seeds', _SSSP_ROUNDS, w)}
SELECT v AS entity, d AS dist FROM bf{_SSSP_ROUNDS}
"""


@_register("kg_sssp", None)
def kg_sssp_q(spark, sf_dir):
    """Multi-source shortest paths (relational Bellman-Ford, 6 fixed
    relaxation rounds) with deterministic integer edge weights
    ``1 + h60(src|dst) % 5`` from the order seed set. Integer mins are
    exact and associative — partition order can never move a distance.
    Per round: one edges⋈dist join + one partial-agg min groupBy
    (datapipe/graph.py bellman_ford_fixed)."""
    from .datapipe.graph import bellman_ford_fixed
    from .datapipe.hashes import h60

    li = _t(spark, sf_dir, "lineitem")
    seeds = (
        li.filter(F.col("l_orderkey") % _KG_SEED_MOD == 0)
        .select(
            F.concat(F.lit("O"), F.col("l_orderkey").cast("string")).alias("v")
        )
        .distinct()
    )
    e = _kg_edges_df(spark, sf_dir).withColumn(
        "w",
        F.lit(1).cast("long")
        + F.pmod(h60(F.concat("src", F.lit("|"), "dst")), F.lit(5)),
    )
    return bellman_ford_fixed(e, seeds, rounds=_SSSP_ROUNDS, weight="w")


ORACLES["kg_sssp"] = _kg_sssp_sql()


_WALK_STEPS = 4


def _kg_walks_sql() -> str:
    from .datapipe.graph import random_walks_sql_chain

    return f"""
WITH {_KG_EDGES_SQL},
seeds AS (SELECT DISTINCT 'O' || l_orderkey AS v FROM lineitem
          WHERE l_orderkey % {_KG_SEED_MOD} = 0),
{random_walks_sql_chain('kg_edges', 'seeds', _WALK_STEPS)}
SELECT walk_id, step, entity FROM rwall
"""


@_register("kg_random_walks", None)
def kg_random_walks_q(spark, sf_dir):
    """Deterministic random-walk corpus over the KG (the
    DeepWalk/node2vec training-data generator, p=q=1): one 4-step walk
    per order seed, transition = out-neighbor number
    ``affine_mix(h60(walk_id), step) mod out_deg`` in dst-sorted order.
    No RNG — walks are reproducible and re-runnable per shard, and the
    DuckDB oracle replays them exactly. Adjacency ranked once and
    reused each step; positions, not paths, flow between steps
    (datapipe/graph.py random_walks_fixed)."""
    from .datapipe.graph import random_walks_fixed

    li = _t(spark, sf_dir, "lineitem")
    seeds = (
        li.filter(F.col("l_orderkey") % _KG_SEED_MOD == 0)
        .select(
            F.concat(F.lit("O"), F.col("l_orderkey").cast("string")).alias("v")
        )
        .distinct()
    )
    return random_walks_fixed(
        _kg_edges_df(spark, sf_dir), seeds, steps=_WALK_STEPS
    )


ORACLES["kg_random_walks"] = _kg_walks_sql()


# -- Entity cards, pairwise link scoring, collocations -----------------------


@_register(
    "kg_entity_summary",
    f"""
WITH {_CHAIN_FACTS_SQL},
cfd AS (SELECT DISTINCT s, r, o FROM cf),
rel_n AS (SELECT r, count(*)::BIGINT AS rel_n FROM cfd GROUP BY r),
rk AS (
  SELECT s, r, o, rel_n,
         row_number() OVER (PARTITION BY s ORDER BY rel_n, r, o) AS rank
  FROM cfd JOIN rel_n USING (r))
SELECT s, r, o, rel_n, rank::INT AS rank FROM rk WHERE rank <= 2
""",
)
def kg_entity_summary_q(spark, sf_dir):
    """Entity summarization over the 5-relation fact universe: per
    subject the 2 most informative facts, informativeness = relation
    rarity (IDF intuition), deterministic (r, o) tiebreak. Broadcast
    relation-frequency annotate + ONE subject-keyed window — bounded
    top-k output, no global sort (datapipe/graph.py entity_summary)."""
    from .datapipe.graph import entity_summary

    return entity_summary(_chain_facts_df(spark, sf_dir), top_k=2)


@_register(
    "kg_resource_alloc",
    f"""
WITH {_CHAIN_FACTS_SQL},
cfd AS (SELECT DISTINCT s, o FROM cf),
deg AS (SELECT o AS z, count(*)::BIGINT AS dz FROM cfd GROUP BY o),
panel AS (
  SELECT 'S' || s.s_suppkey AS x, 'C' || min(c.c_custkey) AS y
  FROM supplier s JOIN customer c ON c.c_nationkey = s.s_nationkey
  WHERE s.s_suppkey % 3 = 1
  GROUP BY s.s_suppkey),
wedge AS (
  SELECT p.x, p.y, fx.o AS z
  FROM panel p
  JOIN cfd fx ON fx.s = p.x
  JOIN cfd fy ON fy.s = p.y AND fy.o = fx.o)
SELECT w.x, w.y, count(*)::BIGINT AS n_common,
       sum(1000000 // d.dz)::BIGINT AS ra_fp
FROM wedge w JOIN deg d ON d.z = w.z
GROUP BY 1, 2
""",
)
def kg_resource_alloc_q(spark, sf_dir):
    """Resource-Allocation link-prediction index (the integer-exact
    member of the Adamic-Adar family — 1/deg instead of float
    1/log deg) for a blocking-style candidate panel: each supplier
    (k%3=1, the located_in-covered stratum) paired with the min-key
    customer of its nation — the shape upstream ER candidate
    generation produces, with >=1 guaranteed common neighbor. All-pairs
    RA explodes d^2 on hub objects, so the operator scores a candidate
    panel — the ANN/LSH-candidates serving shape
    (datapipe/graph.py resource_allocation_index)."""
    from .datapipe.graph import resource_allocation_index

    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    panel = (
        sup.filter(F.col("s_suppkey") % 3 == 1)
        .join(cust, sup.s_nationkey == cust.c_nationkey)
        .groupBy("s_suppkey")
        .agg(F.min("c_custkey").alias("minc"))
        .select(
            F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("x"),
            F.concat(F.lit("C"), F.col("minc").cast("string")).alias("y"),
        )
    )
    return resource_allocation_index(_chain_facts_df(spark, sf_dir), panel)


@_register(
    "collocations",
    """
WITH tw AS (SELECT string_split(lower(text), ' ') AS w0 FROM documents),
wf AS (SELECT list_filter(w0, t -> t <> '') AS w FROM tw),
tok AS (SELECT unnest(w) AS t FROM wf),
uc AS (SELECT t, count(*)::BIGINT AS c FROM tok GROUP BY t),
nt AS (SELECT count(*)::BIGINT AS n FROM tok),
pr AS (
  SELECT unnest(CASE WHEN len(w) >= 2
    THEN list_transform(range(1, len(w)), i -> {'w1': w[i], 'w2': w[i + 1]})
    ELSE [] END) AS p
  FROM wf),
pc AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*)::BIGINT AS c_xy
       FROM pr GROUP BY 1, 2 HAVING count(*) >= 5),
j AS (
  SELECT w1 || ' ' || w2 AS bigram, c_xy, ux.c AS c_x, uy.c AS c_y,
         (((c_xy * 1000000) // ux.c) * (SELECT n FROM nt) // uy.c)::BIGINT
           AS lift_ppm
  FROM pc JOIN uc ux ON ux.t = pc.w1 JOIN uc uy ON uy.t = pc.w2)
SELECT bigram, c_xy, c_x, c_y, lift_ppm FROM j
ORDER BY lift_ppm DESC, bigram LIMIT 20
""",
)
def collocations_q(spark, sf_dir):
    """Collocation mining: top-20 adjacent bigrams by integer PMI-lift
    (observed/expected in ppm; log-free so engine-exact), min count 5
    against hapax noise. Row-local pair generation, two partial-agg
    count groupBys, lazy 1-row total, TakeOrderedAndProject top-k
    (datapipe/textstats.py collocation_lift)."""
    from .datapipe.textstats import collocation_lift

    return collocation_lift(
        _t(spark, sf_dir, "documents"), top_n=20, min_count=5
    )


# -- Tokenizer vocabulary induction (distributed BPE) ------------------------

_BPE_MERGES = 6


def _bpe_sql() -> str:
    from .datapipe.vocab import bpe_sql_chain

    return f"""
WITH {bpe_sql_chain('documents', _BPE_MERGES)}
SELECT step, "left", "right", merged, pair_cnt FROM bmerges
"""


@_register("bpe_merges", None)
def bpe_merges_q(spark, sf_dir):
    """Distributed BPE vocabulary induction: learn 6 merges over the
    corpus word-frequency table. Each round is a pure distributed plan
    — vocabulary-sized row-local pair generation, ONE partial-agg
    count groupBy, a 1-row TakeOrderedAndProject argmax broadcast into
    the merge application — no driver loop over data, no collect; the
    merge table (step, left, right, merged, pair_cnt) is the artifact
    a tokenizer ships (datapipe/vocab.py bpe_learn_merges)."""
    from .datapipe.vocab import bpe_learn_merges

    return bpe_learn_merges(
        _t(spark, sf_dir, "documents"), merges=_BPE_MERGES
    )


ORACLES["bpe_merges"] = _bpe_sql()


def _bpe_encode_sql() -> str:
    from .datapipe.vocab import bpe_encode_sql, bpe_sql_chain

    return f"""
WITH {bpe_sql_chain('documents', _BPE_MERGES)},
{bpe_encode_sql('documents', _BPE_MERGES)}
SELECT n_docs, n_symbols_before, n_symbols_after,
       ((n_symbols_after * 1000000) // n_symbols_before)::BIGINT
         AS compression_ppm
FROM bstat
"""


@_register("bpe_encode_stats", None)
def bpe_encode_stats_q(spark, sf_dir):
    """Apply the learned BPE merge table back to the corpus (row-local
    6-replace map, word boundaries kept as a '|' sentinel no merge can
    cross) and audit the encoding: symbols before/after + compression
    ppm, one row. The train→apply composition is the full tokenizer
    lifecycle as distributed plans (datapipe/vocab.py
    bpe_encode_stats)."""
    from .datapipe.vocab import bpe_encode_stats, bpe_learn_merges

    docs = _t(spark, sf_dir, "documents")
    mt = bpe_learn_merges(docs, merges=_BPE_MERGES)
    return bpe_encode_stats(docs, mt, merges=_BPE_MERGES)


ORACLES["bpe_encode_stats"] = _bpe_encode_sql()


_DSKG_BUCKETS = 64


def _sketch_distinct_by_source_sql() -> str:
    from .datapipe.sketches import distinct_sketch_grouped_sql

    return f"""
WITH tokx AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
tks AS (SELECT source, t FROM tokx WHERE t <> ''),
{distinct_sketch_grouped_sql('tks', 't', 'source', _DSKG_BUCKETS)},
ex AS (SELECT source AS k, count(DISTINCT t)::BIGINT AS exact_distinct
       FROM tks GROUP BY source)
SELECT e.k AS source, e.est_distinct, x.exact_distinct,
       ((abs(e.est_distinct - x.exact_distinct) * 1000000)
        // x.exact_distinct)::BIGINT AS err_ppm
FROM dskg_e e JOIN ex x ON x.k = e.k
"""


@_register("sketch_distinct_by_source", None)
def sketch_distinct_by_source_q(spark, sf_dir):
    """Per-source distinct-vocabulary estimation — the GROUP BY form of
    sketch_distinct (distinct tokens per crawl domain, 64 buckets per
    group). State is 64 rows per group vs the per-group distinct-value
    shuffle of exact count-distinct; the exact answer rides along as
    the per-group error audit (datapipe/sketches.py
    minhash_distinct_sketch_grouped)."""
    from .datapipe.sketches import (
        distinct_estimate_grouped,
        minhash_distinct_sketch_grouped,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    est = distinct_estimate_grouped(
        minhash_distinct_sketch_grouped(toks, "t", ["source"], _DSKG_BUCKETS),
        ["source"],
        _DSKG_BUCKETS,
    )
    exact = toks.groupBy("source").agg(
        F.count_distinct("t").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "source").select(
        "source",
        "est_distinct",
        "exact_distinct",
        F.expr(
            "(abs(est_distinct - exact_distinct) * 1000000L)"
            " div exact_distinct"
        ).alias("err_ppm"),
    )


ORACLES["sketch_distinct_by_source"] = _sketch_distinct_by_source_sql()


# -- BM25 retrieval -----------------------------------------------------------

# CTE chain shared by the BM25 oracle and the RRF-fusion oracle: defines
# post/dl/st/qp/qt/dfr/sc/rk (rk = per-query BM25 ranking).
_BM25_CHAIN = """tw AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS t
  FROM documents),
post AS (SELECT t, doc_id, count(*)::BIGINT AS tf FROM tw GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM post GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
              ((SELECT sum(dl) FROM dl)
               // (SELECT count(*) FROM documents))::BIGINT AS avgdl),
qp AS (SELECT doc_id AS qid,
              array_to_string(
                (list_filter(string_split(lower(text), ' '),
                             t -> t <> ''))[1:3], ' ') AS qtext
       FROM documents WHERE doc_id % 50 = 7),
qt AS (SELECT DISTINCT qid, t FROM (
         SELECT qid,
                unnest(list_filter(string_split(lower(qtext), ' '),
                                   t -> t <> '')) AS t
         FROM qp)),
dfr AS (SELECT t, count(*)::BIGINT AS df FROM post
        WHERE t IN (SELECT t FROM qt) GROUP BY 1),
sc AS (SELECT qt.qid, post.doc_id,
              sum((least((st.n_docs * 1000000) // dfr.df, 1000000000)
                   * 44 * post.tf * st.avgdl)
                  // (20 * st.avgdl * post.tf + 6 * st.avgdl
                      + 18 * dl.dl))::BIGINT AS score_ppm
       FROM post JOIN qt ON qt.t = post.t
       JOIN dl ON dl.doc_id = post.doc_id
       JOIN dfr ON dfr.t = post.t
       CROSS JOIN st
       GROUP BY 1, 2),
rk AS (SELECT qid, doc_id, score_ppm,
              row_number() OVER (PARTITION BY qid
                                 ORDER BY score_ppm DESC, doc_id ASC) AS rank
       FROM sc)"""

_BM25_SQL = f"""
WITH {_BM25_CHAIN}
SELECT qid, doc_id, score_ppm, rank FROM rk WHERE rank <= 5
"""


@_register("bm25_topk", _BM25_SQL)
def bm25_topk_q(spark, sf_dir):
    """BM25 top-5 retrieval over a deterministic query panel (every
    50th doc's first 3 tokens — self-contained, no external data).
    Integer-exact scoring: rational k1=6/5, b=3/4 cleared of
    denominators, inverse-df rarity weight saturated at 1e9 in place
    of log-IDF (log is engine-divergent float; documented deviation).
    Postings/doc-length/df all derive from ONE corpus explosion; df is
    computed only for panel terms so every dimension broadcast stays
    panel-sized at web scale (datapipe/textstats.py bm25_topk)."""
    from .datapipe.textstats import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    wq = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    panel = docs.filter(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("qid"),
        F.array_join(F.slice(wq, 1, 3), " ").alias("qtext"),
    )
    return bm25_topk(docs, panel, top_k=5)


_PHRASE_SQL = """
WITH wf AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS w
  FROM documents),
pox AS (SELECT doc_id,
               unnest(list_transform(range(1, len(w) + 1),
                                     i -> {'pos': i - 1, 't': w[i]})) AS p
        FROM wf),
po AS (SELECT doc_id, p.pos AS pos, p.t AS t FROM pox),
qp AS (SELECT DISTINCT w[1] || ' ' || w[2] AS phrase, w[1] AS w1, w[2] AS w2
       FROM wf WHERE doc_id % 101 = 13 AND len(w) >= 2),
lft AS (SELECT qp.phrase, qp.w2, po.doc_id, po.pos + 1 AS pos2
        FROM po JOIN qp ON po.t = qp.w1),
hits AS (SELECT lft.phrase, lft.doc_id
         FROM lft JOIN po b
           ON b.doc_id = lft.doc_id AND b.pos = lft.pos2 AND b.t = lft.w2)
SELECT phrase, count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_occurrences
FROM hits GROUP BY phrase
"""


@_register("phrase_search", _PHRASE_SQL)
def phrase_search_q(spark, sf_dir):
    """Exact 2-gram phrase search over a corpus-derived panel (every
    101st doc's leading bigram): positional inverted index from ONE
    posexplode, both adjacency sides pruned to panel terms by broadcast
    semi-join BEFORE any shuffle, adjacency as a pure equi-join on
    (doc_id, next_pos, token) (datapipe/textstats.py phrase_search)."""
    from .datapipe.textstats import phrase_search

    docs = _t(spark, sf_dir, "documents")
    wq = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    panel = (
        docs.filter(F.col("doc_id") % 101 == 13)
        .select(wq.alias("w"))
        .filter(F.size("w") >= 2)
        .select(F.array_join(F.slice("w", 1, 2), " ").alias("phrase"))
    )
    return phrase_search(docs, panel)


def _hist_quantiles_sql() -> str:
    from .datapipe.sketches import histogram_quantiles_grouped_sql

    return f"""
WITH dv AS (SELECT source, n_chars FROM documents),
{histogram_quantiles_grouped_sql('dv', 'n_chars', 'source', 64, (50, 90))},
xr AS (
  SELECT source AS k, n_chars::BIGINT AS v,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY source)::BIGINT AS n
  FROM dv),
xe AS (
  SELECT k,
         min(CASE WHEN rn = ((50 * n + 99) // 100) THEN v END)::BIGINT
           AS exact_p50,
         min(CASE WHEN rn = ((90 * n + 99) // 100) THEN v END)::BIGINT
           AS exact_p90
  FROM xr GROUP BY k)
SELECT e.k AS source, e.est_p50, e.est_p90, x.exact_p50, x.exact_p90,
       ((abs(e.est_p50 - x.exact_p50) * 1000000) // x.exact_p50)::BIGINT
         AS err50_ppm,
       ((abs(e.est_p90 - x.exact_p90) * 1000000) // x.exact_p90)::BIGINT
         AS err90_ppm
FROM hq_e e JOIN xe x ON x.k = e.k
"""


@_register("sketch_quantiles_by_source", None)
def sketch_quantiles_by_source_q(spark, sf_dir):
    """Per-source approximate p50/p90 document length from a 64-wide
    integer histogram (bounded state: occupied buckets per group, ONE
    partial-agg groupBy — no per-group sort of the fact table), with
    the exact disc-percentile audit riding along
    (datapipe/sketches.py histogram_quantiles_grouped)."""
    from pyspark.sql import Window

    from .datapipe.sketches import histogram_quantiles_grouped

    docs = _t(spark, sf_dir, "documents")
    est = histogram_quantiles_grouped(
        docs, "n_chars", ["source"], width=64, percentiles=(50, 90)
    )
    xr = docs.select(
        "source",
        F.col("n_chars").cast("long").alias("v"),
    ).select(
        "source",
        "v",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("v"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("n"),
    )
    exact = xr.groupBy("source").agg(
        F.min(
            F.expr("CASE WHEN rn = ((50L * n + 99L) div 100L) THEN v END")
        ).cast("long").alias("exact_p50"),
        F.min(
            F.expr("CASE WHEN rn = ((90L * n + 99L) div 100L) THEN v END")
        ).cast("long").alias("exact_p90"),
    )
    return est.join(exact, "source").select(
        "source",
        "est_p50",
        "est_p90",
        "exact_p50",
        "exact_p90",
        F.expr(
            "(abs(est_p50 - exact_p50) * 1000000L) div exact_p50"
        ).alias("err50_ppm"),
        F.expr(
            "(abs(est_p90 - exact_p90) * 1000000L) div exact_p90"
        ).alias("err90_ppm"),
    )


ORACLES["sketch_quantiles_by_source"] = _hist_quantiles_sql()


_CUBE_SQL = """
SELECT coalesce(source, '<all>') AS source,
       coalesce(lang, '<all>') AS lang,
       GROUPING(source, lang)::BIGINT AS gid,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       (sum(n_chars) // count(*))::BIGINT AS mean_chars
FROM documents
GROUP BY CUBE(source, lang)
"""


@_register("corpus_cube", _CUBE_SQL)
def corpus_cube_q(spark, sf_dir):
    """OLAP CUBE over (source, lang): all four grouping levels of the
    corpus census (doc count, total/mean chars) in ONE pass —
    grouping-set expansion happens inside the aggregate's partial
    phase, so at 100 TB this costs one scan + one shuffle instead of
    four separate groupBys; grouping_id disambiguates the levels and
    NULL group keys are folded to '<all>' so the output is
    join-friendly."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.cube("source", "lang")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("sum(n_chars) div count(1)").cast("long").alias(
                "mean_chars"
            ),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            "gid",
            "n_docs",
            "total_chars",
            "mean_chars",
        )
    )


# ONE string, two engines: runs verbatim on Spark SQL (the query) and
# DuckDB (the oracle) — the ad-hoc SQL surface's parity demonstration.
_SQL_REGION_ORDERS = """
SELECT r_name, n_name,
       count(DISTINCT o_orderkey) AS n_orders,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name, n_name
"""


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                           * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
         AS sum_charge_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@_register("sql_pricing_summary", _SQL_PRICING)
def sql_pricing_summary_q(spark, sf_dir):
    """TPC-H Q1 pricing summary on the ad-hoc SQL surface, made
    engine-exact by flooring each money expression to integer CENTS
    per row before summing (double sums are order-divergent; per-row
    IEEE products are identical in both engines, and
    CAST(floor(x) AS BIGINT) sidesteps the Spark-truncates/DuckDB-
    rounds cast trap). One scan, map-side partial aggregation, the
    shipdate filter pushed to the parquet scan — the same ANSI string
    runs verbatim in both engines (genie_spark/sql.py)."""
    from .sql import sql

    return sql(spark, sf_dir, _SQL_PRICING)


@_register("sql_region_orders", _SQL_REGION_ORDERS)
def sql_region_orders_q(spark, sf_dir):
    """Ad-hoc SQL surface: the same ANSI string runs verbatim as the
    Spark query AND the DuckDB oracle. Catalyst gets the full
    declarative plan (dims broadcast, fact-side partial aggregation,
    column pruning to 5 of 11 lineitem columns) from plain SQL text
    over registered parquet views (genie_spark/sql.py)."""
    from .sql import sql

    return sql(spark, sf_dir, _SQL_REGION_ORDERS)


def _prefix_jaccard_sql() -> str:
    # the oracle is the EXHAUSTIVE exact-Jaccard join — deliberately NOT a
    # mirror of the prefix-filtered plan, so a wrong prefix bound (lost
    # candidate pairs) fails the hash gate instead of reproducing itself.
    return f"""
WITH {_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS nc
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ((nc * 1000000) // (sa.n + sb.n - nc))::BIGINT AS jaccard_ppm
FROM common JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE nc * (1000000 + 500000) >= 500000 * (sa.n + sb.n)
"""


@_register("dedup_jaccard_prefix", None)
def dedup_jaccard_prefix_q(spark, sf_dir):
    """AllPairs/PPJoin prefix-filtered exact-Jaccard near-dup pairs
    (threshold 0.5): per-doc rarest-shingle prefixes generate the
    candidates (no global rank — only a doc-partitioned window), full
    intersection verifies. Oracle is the EXHAUSTIVE join: the gate
    proves the prefix filter is lossless
    (datapipe/dedup.py prefix_jaccard_pairs)."""
    from .datapipe.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold_ppm=500000
    )


ORACLES["dedup_jaccard_prefix"] = _prefix_jaccard_sql()


_TFIDF_COS_SQL = f"""
WITH {_SHINGLES_SQL},
post AS (SELECT shingle AS t, doc_id, count(*)::BIGINT AS tf
         FROM sh GROUP BY 1, 2),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
dfr AS (SELECT t, count(*)::BIGINT AS df FROM post GROUP BY 1
        HAVING count(*) <= 50),
wt AS (SELECT post.t, post.doc_id,
             (post.tf * least(nd.n_docs // dfr.df, 100))::BIGINT AS w
      FROM post JOIN dfr ON dfr.t = post.t CROSS JOIN nd),
ss AS (SELECT doc_id, sum(w * w)::BIGINT AS ss FROM wt GROUP BY 1),
dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                sum(a.w * b.w)::BIGINT AS dot
         FROM wt a JOIN wt b ON a.t = b.t AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT id_a, id_b,
       ((((dot * 1000000) // sa.ss) * dot) // sb.ss)::BIGINT AS cos2_ppm
FROM dots JOIN ss sa ON sa.doc_id = id_a JOIN ss sb ON sb.doc_id = id_b
WHERE (((dot * 1000000) // sa.ss) * dot) // sb.ss >= 250000
"""


@_register("dedup_tfidf_cosine", _TFIDF_COS_SQL)
def dedup_tfidf_cosine_q(spark, sf_dir):
    """TF-IDF-weighted sparse cosine similarity join (cos^2 >= 0.25)
    over 3-shingle features: capped linear rarity weights (engine-exact
    stand-in for log-IDF), df-cut blocking bounds the posting
    self-join's hottest key, squared cosine via two staged integer
    floor-divides — no floats anywhere (datapipe/dedup.py
    tfidf_cosine_pairs)."""
    from .datapipe.dedup import tfidf_cosine_pairs

    return tfidf_cosine_pairs(_t(spark, sf_dir, "documents"), shingle_k=3)


# -- Event-log analytics ------------------------------------------------------

_COHORT_SQL = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY 1)
SELECT f.cohort_day,
       date_diff('day', f.cohort_day, CAST(e.ts AS DATE))::BIGINT
         AS day_offset,
       count(DISTINCT e.user_id)::BIGINT AS n_users
FROM events e JOIN first f ON f.user_id = e.user_id
GROUP BY 1, 2
"""


@_register("cohort_retention", _COHORT_SQL)
def cohort_retention_q(spark, sf_dir):
    """Cohort retention census: users grouped by first-seen day,
    distinct-active counted per integer day offset. One user-keyed
    partial-agg min + one user-keyed join + one partial-aggregatable
    count-distinct — no event x event self-join, integer day math
    (datapipe/events.py cohort_retention)."""
    from .datapipe.events import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


_FUNNEL_SQL = """
WITH anchors AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1),
conv AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN anchors a ON a.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts >= a.t1 AND e.ts <= a.t1 + INTERVAL 7 DAY)
SELECT (SELECT count(DISTINCT user_id) FROM events)::BIGINT AS n_users,
       (SELECT count(*) FROM anchors)::BIGINT AS n_step1,
       (SELECT count(*) FROM conv)::BIGINT AS n_converted,
       (CASE WHEN (SELECT count(*) FROM anchors) = 0 THEN 0
             ELSE ((SELECT count(*) FROM conv) * 1000000)
                  // (SELECT count(*) FROM anchors) END)::BIGINT
         AS conversion_ppm
"""


@_register("funnel_conversion", _FUNNEL_SQL)
def funnel_conversion_q(spark, sf_dir):
    """Funnel conversion signup -> purchase within 7 days: per-user
    step-1 anchor is a partial-agg min; step-2 events join the
    users-sized anchor table (never an event x event self-join) with
    the window as a residual range predicate
    (datapipe/events.py funnel_conversion)."""
    from .datapipe.events import funnel_conversion

    return funnel_conversion(_t(spark, sf_dir, "events"))


_PROPS_SQL = """
SELECT event_type,
       count(*)::BIGINT AS n_events,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT
         AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT
         AS max_k
FROM events GROUP BY 1
"""


@_register("json_props_stats", _PROPS_SQL)
def json_props_stats_q(spark, sf_dir):
    """Semi-structured column extraction: pull an integer field out of
    the JSON props string (get_json_object — row-local, codegen'd, no
    UDF) and aggregate per event type. The path expression stays in the
    scan stage, so at 100 TB this is one pass with column pruning to
    (event_type, props)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
    )


_RRF_SQL = f"""
WITH {_BM25_CHAIN},
bm AS (SELECT qid, doc_id, rank FROM rk WHERE rank <= 10),
tdx AS (SELECT DISTINCT doc_id, t FROM tw),
cov AS (SELECT qt.qid, tdx.doc_id, count(*)::BIGINT AS n_hit
        FROM tdx JOIN qt ON qt.t = tdx.t GROUP BY 1, 2),
cvr AS (SELECT qid, doc_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY n_hit DESC, doc_id ASC) AS rank
        FROM cov),
cv AS (SELECT qid, doc_id, rank FROM cvr WHERE rank <= 10),
fused AS (
  SELECT coalesce(bm.qid, cv.qid) AS qid,
         coalesce(bm.doc_id, cv.doc_id) AS doc_id,
         (coalesce(1000000 // (60 + bm.rank), 0)
          + coalesce(1000000 // (60 + cv.rank), 0))::BIGINT AS rrf_ppm
  FROM bm FULL OUTER JOIN cv
    ON bm.qid = cv.qid AND bm.doc_id = cv.doc_id),
frk AS (SELECT qid, doc_id, rrf_ppm,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY rrf_ppm DESC, doc_id ASC) AS rank
        FROM fused)
SELECT qid, doc_id, rrf_ppm, rank FROM frk WHERE rank <= 5
"""


@_register("retrieval_rrf", _RRF_SQL)
def retrieval_rrf_q(spark, sf_dir):
    """Reciprocal-rank fusion of two retrieval signals over the shared
    query panel: BM25 top-10 (precision-oriented) + distinct-term
    coverage top-10 (recall-oriented), fused as 1e6 div (60+rank) with
    absent-from-list = 0 — the standard integer-exact RRF. Fusion
    itself is panel-sized row-local math + one qid window
    (datapipe/textstats.py rrf_fuse, coverage_topk, bm25_topk)."""
    from .datapipe.textstats import bm25_topk, coverage_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    wq = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    panel = docs.filter(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("qid"),
        F.array_join(F.slice(wq, 1, 3), " ").alias("qtext"),
    )
    bm = bm25_topk(docs, panel, top_k=10).select("qid", "doc_id", "rank")
    cv = coverage_topk(docs, panel, top_k=10).select("qid", "doc_id", "rank")
    return rrf_fuse(bm, cv, top_k=5, k=60)


def _retrieval_quality_sql() -> str:
    # the discount/IDCG literals come from the SAME Python constants the
    # Spark plan embeds — cross-engine identity by construction
    from .datapipe.textstats import NDCG_DISC_PPM, NDCG_IDCG_PPM

    disc = ", ".join(str(d) for d in NDCG_DISC_PPM)
    idcg = ", ".join(str(s) for s in NDCG_IDCG_PPM[1:11])
    return f"""
WITH {_BM25_CHAIN},
tdx AS (SELECT DISTINCT doc_id, t FROM tw),
nq AS (SELECT qid, count(*)::BIGINT AS n_terms FROM qt GROUP BY 1),
hit AS (SELECT qt.qid, tdx.doc_id, count(*)::BIGINT AS n_hit
        FROM tdx JOIN qt ON qt.t = tdx.t GROUP BY 1, 2),
qr AS (SELECT hit.qid, hit.doc_id FROM hit JOIN nq ON nq.qid = hit.qid
       WHERE n_hit = n_terms),
nrel AS (SELECT qid, count(*)::BIGINT AS n_rel FROM qr GROUP BY 1),
j AS (SELECT rk.qid, rk.rank,
             CASE WHEN qr.doc_id IS NULL THEN 0 ELSE 1 END AS rel
      FROM rk LEFT JOIN qr ON qr.qid = rk.qid AND qr.doc_id = rk.doc_id
      WHERE rk.rank <= 10),
per AS (SELECT qid,
               min(CASE WHEN rel = 1 THEN rank END) AS fr,
               sum(CASE WHEN rank <= 5 THEN rel ELSE 0 END)::BIGINT AS hits5,
               sum(rel * ([{disc}])[rank])::BIGINT AS dcg,
               sum(rel)::BIGINT AS hitsk
        FROM j GROUP BY 1)
SELECT per.qid, nrel.n_rel,
       coalesce(1000000 // fr, 0)::BIGINT AS rr_ppm,
       ((hits5 * 1000000) // 5)::BIGINT AS p_at_5_ppm,
       ((hitsk * 1000000) // n_rel)::BIGINT AS recall_ppm,
       ((dcg * 1000000) // ([{idcg}])[least(n_rel, 10)])::BIGINT AS ndcg_ppm
FROM per JOIN nrel ON nrel.qid = per.qid
"""


@_register("retrieval_quality", _retrieval_quality_sql())
def retrieval_quality_q(spark, sf_dir):
    """Ranking-quality evaluation of the BM25 run against conjunctive
    exact-match qrels (docs containing ALL query terms — the
    self-contained ground truth): per-query reciprocal rank, P@5,
    recall@10, and nDCG@10, all integer ppm. The nDCG discount table is
    round(1e6/log2(r+1)) computed ONCE in Python and embedded as the
    same literals in both engines, so no float log is evaluated in
    either (datapipe/textstats.py retrieval_quality,
    conjunctive_matches; cf. reference metric surface
    /root/reference/genie/utils/evaluation.py which stops at set
    P/R/F1 — rank-aware eval is the retrieval-grade extension)."""
    from .datapipe.textstats import (
        bm25_topk,
        conjunctive_matches,
        retrieval_quality,
    )

    docs = _t(spark, sf_dir, "documents")
    wq = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    panel = docs.filter(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("qid"),
        F.array_join(F.slice(wq, 1, 3), " ").alias("qtext"),
    )
    bm = bm25_topk(docs, panel, top_k=10).select("qid", "doc_id", "rank")
    qrels = conjunctive_matches(docs, panel)
    return retrieval_quality(bm, qrels, k=10, cut=5)


_SEQPAT_SQL = """
WITH ev AS (SELECT user_id AS u, event_type AS t, ts, event_id AS i
            FROM events),
fa AS (SELECT u, t AS a, min(struct_pack(ts := ts, i := i)) AS ka
       FROM ev GROUP BY 1, 2),
fb AS (SELECT ev.u, fa.a, ev.t AS b,
              min(struct_pack(ts := ev.ts, i := ev.i)) AS kb
       FROM ev JOIN fa ON fa.u = ev.u
       WHERE struct_pack(ts := ev.ts, i := ev.i) > ka
       GROUP BY 1, 2, 3),
fc AS (SELECT DISTINCT ev.u, fb.a, fb.b, ev.t AS c
       FROM ev JOIN fb ON fb.u = ev.u
       WHERE struct_pack(ts := ev.ts, i := ev.i) > kb),
nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n_total FROM events)
SELECT a, b, c, count(*)::BIGINT AS n_users,
       ((count(*) * 1000000) // n_total)::BIGINT AS support_ppm
FROM fc CROSS JOIN nu
GROUP BY a, b, c, n_total
"""


@_register("event_seq_patterns", _SEQPAT_SQL)
def event_seq_patterns_q(spark, sf_dir):
    """Length-3 sequential-pattern user support over the event log —
    PrefixSpan's 3-item tier with existence semantics, computed via
    greedy-earliest chains (three user-keyed min(struct) stages bounded
    by users × type-domain², never the cubic event-triple join)
    (datapipe/events.py sequential_patterns)."""
    from .datapipe.events import sequential_patterns

    return sequential_patterns(_t(spark, sf_dir, "events"))


_CADENCE_SQL = """
WITH g AS (
  SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         lead(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT u AS user_id, count(*)::BIGINT AS n_events,
       (max(t) - min(t))::BIGINT AS span_s,
       coalesce(min(nxt - t), 0)::BIGINT AS min_gap_s,
       ((max(t) - min(t)) // greatest(count(*) - 1, 1))::BIGINT AS avg_gap_s,
       coalesce(max(nxt - t), 0)::BIGINT AS max_gap_s
FROM g GROUP BY u
"""


@_register("user_cadence", _CADENCE_SQL)
def user_cadence_q(spark, sf_dir):
    """Per-user inter-event cadence: count, active span, min/avg/max
    gap in integer seconds — one user-partitioned lead() window (sort
    bounded per user) + one partial aggregate
    (datapipe/events.py user_cadence)."""
    from .datapipe.events import user_cadence

    return user_cadence(_t(spark, sf_dir, "events"))


_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events),
pairs AS (SELECT from_type, to_type, count(*)::BIGINT AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, sum(n)::BIGINT AS n_from FROM pairs GROUP BY 1)
SELECT p.from_type, p.to_type, p.n,
       ((p.n * 1000000) // t.n_from)::BIGINT AS p_ppm
FROM pairs p JOIN tot t ON t.from_type = p.from_type
"""


@_register("event_transitions", _TRANSITIONS_SQL)
def event_transitions_q(spark, sf_dir):
    """First-order Markov transitions over per-user event sequences
    with integer transition probabilities; event_id tiebreak makes the
    sequence partition-invariant; one user-keyed window, no global
    sort (datapipe/events.py event_transitions)."""
    from .datapipe.events import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


def _profile_sql() -> str:
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    aggs = ["count(*)::BIGINT AS n"]
    for c in cols:
        aggs += [
            f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT"
            f" AS {c}_nulls",
            f"count(DISTINCT {c})::BIGINT AS {c}_nd",
            f"CAST(min({c}) AS VARCHAR) AS {c}_min",
            f"CAST(max({c}) AS VARCHAR) AS {c}_max",
        ]
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, n AS n_rows, {c}_nulls AS n_null,"
        f" {c}_nd AS n_distinct, {c}_min AS min_str, {c}_max AS max_str"
        f" FROM agg"
        for c in cols
    )
    return f"WITH agg AS (SELECT {', '.join(aggs)} FROM documents) {rows}"


@_register("table_profile", None)
def table_profile_q(spark, sf_dir):
    """Deequ-style table profile of the documents table: per-column
    row/null/distinct counts + stringified min/max, ALL columns in ONE
    aggregation pass (single scan, single partial+final agg), pivoted
    long row-locally with stack() — no per-column scans
    (datapipe/profile.py table_profile)."""
    from .datapipe.profile import table_profile

    return table_profile(_t(spark, sf_dir, "documents"))


ORACLES["table_profile"] = _profile_sql()


_OUTLIERS_SQL = """
WITH st AS (
  SELECT source,
         (sum(n_chars) // count(*))::BIGINT AS mean,
         ((sum(n_chars * n_chars) // count(*))
          - (sum(n_chars) // count(*)) * (sum(n_chars) // count(*)))::BIGINT
           AS var
  FROM documents GROUP BY 1)
SELECT d.source, d.doc_id, d.n_chars::BIGINT AS value, st.mean, st.var
FROM documents d JOIN st ON st.source = d.source
WHERE (d.n_chars - st.mean) * (d.n_chars - st.mean)
      > 2 * greatest(st.var, 1)
"""


@_register("length_outliers", _OUTLIERS_SQL)
def length_outliers_q(spark, sf_dir):
    """Per-source length outliers by integer-moment z^2 test
    ((x-mean)^2 > 2*var, floor-arithmetic moments — engine-exact, no
    float): group moments are one partial-agg groupBy broadcast back
    onto the scan; centered form keeps squares in signed-64 at any
    group size (datapipe/textstats.py length_outliers)."""
    from .datapipe.textstats import length_outliers

    return length_outliers(_t(spark, sf_dir, "documents"), k_sigma2=2)


_ATTRIB_SQL = """
WITH tch AS (
  SELECT event_type AS et,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM events),
cr AS (SELECT touch_type, count(*)::BIGINT AS n_conversions
       FROM tch WHERE et = 'purchase' AND touch_type IS NOT NULL
       GROUP BY 1),
tot AS (SELECT sum(n_conversions)::BIGINT AS n_total FROM cr)
SELECT cr.touch_type, cr.n_conversions,
       ((cr.n_conversions * 1000000) // tot.n_total)::BIGINT AS share_ppm
FROM cr CROSS JOIN tot
"""


@_register("attribution_last_touch", _ATTRIB_SQL)
def attribution_last_touch_q(spark, sf_dir):
    """Last-touch conversion attribution: fill-forward of the most
    recent non-conversion event per user (one ordered window with
    ignore-nulls last_value, event_id tiebreak → partition-invariant),
    credit tallies + integer shares
    (datapipe/events.py attribution_last_touch)."""
    from .datapipe.events import attribution_last_touch

    return attribution_last_touch(_t(spark, sf_dir, "events"))


_DRIFT_SQL = """
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
dt AS (SELECT day, sum(n)::BIGINT AS n_day FROM base GROUP BY 1),
tt AS (SELECT event_type, sum(n)::BIGINT AS n_type FROM base GROUP BY 1),
tot AS (SELECT sum(n)::BIGINT AS n_total FROM base)
SELECT b.event_type, b.day, b.n,
       ((b.n * 1000000) // dt.n_day)::BIGINT AS daily_share_ppm,
       ((tt.n_type * 1000000) // tot.n_total)::BIGINT AS overall_share_ppm,
       abs((b.n * 1000000) // dt.n_day
           - (tt.n_type * 1000000) // tot.n_total)::BIGINT AS drift_ppm
FROM base b JOIN dt ON dt.day = b.day
JOIN tt ON tt.event_type = b.event_type
CROSS JOIN tot
"""


@_register("event_type_drift", _DRIFT_SQL)
def event_type_drift_q(spark, sf_dir):
    """Event-mix drift monitor: per-type daily share vs overall share
    in integer ppm. One log scan feeds a (type x day) census; all
    totals are aggregates of the census, broadcast back
    (datapipe/events.py type_share_drift)."""
    from .datapipe.events import type_share_drift

    return type_share_drift(_t(spark, sf_dir, "events"))


# second shared-string SQL-surface query: a selective date predicate that
# must reach the parquet scan as a pushed filter from plain SQL text.
_SQL_PRIORITY_CENSUS = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS total_price_units,
       count(DISTINCT o_custkey) AS n_customers
FROM orders
WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@_register("sql_priority_census", _SQL_PRIORITY_CENSUS)
def sql_priority_census_q(spark, sf_dir):
    """SQL-surface query #2: a one-year order census whose date range
    predicate Catalyst pushes into the parquet scan (PushedFilters,
    plan-asserted) straight from ANSI text — the same string is the
    DuckDB oracle (genie_spark/sql.py)."""
    from .sql import sql

    return sql(spark, sf_dir, _SQL_PRIORITY_CENSUS)


@_register(
    "kg_bgp_match",
    f"""
WITH {_CHAIN_FACTS_SQL}
SELECT DISTINCT c.s AS cust, b.o AS n, p.o AS reg, b.s AS sup
FROM cf b
JOIN cf p ON p.r = 'part_of' AND p.s = b.o
JOIN cf c ON c.r = 'cust_in' AND c.o = b.o
WHERE b.r = 'based_in'
""",
)
def kg_bgp_match_q(spark, sf_dir):
    """SPARQL-style BGP query over the fact universe: the pattern
    [(?sup based_in ?n), (?n part_of ?reg), (?cust cust_in ?n)] —
    suppliers and customers co-located in a nation, with its region —
    compiled to a join plan by ~30 lines of pattern compiler; Catalyst
    picks the join order and broadcasts the selective constant-bound
    sides (datapipe/graph.py bgp_match)."""
    from .datapipe.graph import bgp_match

    return bgp_match(
        _chain_facts_df(spark, sf_dir),
        [
            ("?sup", "based_in", "?n"),
            ("?n", "part_of", "?reg"),
            ("?cust", "cust_in", "?n"),
        ],
    )


@_register(
    "kg_bgp_optional",
    f"""
WITH {_CHAIN_FACTS_SQL},
req AS (SELECT DISTINCT s AS cust, o AS n FROM cf WHERE r = 'cust_in'),
opt AS (SELECT DISTINCT s AS cust, o AS cr FROM cf WHERE r = 'cust_region')
SELECT DISTINCT req.cust, opt.cr, req.n
FROM req LEFT JOIN opt ON opt.cust = req.cust
""",
)
def kg_bgp_optional_q(spark, sf_dir):
    """SPARQL OPTIONAL through the BGP compiler: (?cust cust_in ?n)
    OPTIONAL (?cust cust_region ?cr) — the left join keeps customers
    with null region bindings (cust_region exists only for even keys,
    so half the bindings are genuinely null)
    (datapipe/graph.py bgp_match optionals=)."""
    from .datapipe.graph import bgp_match

    return bgp_match(
        _chain_facts_df(spark, sf_dir),
        [("?cust", "cust_in", "?n")],
        optionals=[("?cust", "cust_region", "?cr")],
    )


@_register(
    "kg_bgp_negation",
    f"""
WITH {_CHAIN_FACTS_SQL},
req AS (SELECT DISTINCT s AS sup, o AS n FROM cf WHERE r = 'based_in')
SELECT DISTINCT sup, n FROM req
WHERE NOT EXISTS (
  SELECT 1 FROM cf x WHERE x.r = 'located_in' AND x.s = req.sup)
""",
)
def kg_bgp_negation_q(spark, sf_dir):
    """SPARQL FILTER NOT EXISTS through the BGP compiler: suppliers
    based in a nation with NO located_in fact (every third supplier by
    construction) — compiles to a left-anti join on the shared variable
    (datapipe/graph.py bgp_match negations=)."""
    from .datapipe.graph import bgp_match

    return bgp_match(
        _chain_facts_df(spark, sf_dir),
        [("?sup", "based_in", "?n")],
        negations=[("?sup", "located_in", "?r2")],
    )


def _zorder_sql() -> str:
    top = (1 << 16) - 1
    inter = " + ".join(
        f"((a16 >> {i}) & 1) * {1 << (2 * i)}"
        f" + ((b16 >> {i}) & 1) * {1 << (2 * i + 1)}"
        for i in range(16)
    )
    cell = (1 << 32) // 64
    return f"""
WITH src AS (
  SELECT o_custkey AS ck,
         date_diff('day', DATE '1995-01-01',
                   CAST(o_orderdate AS DATE))::BIGINT AS d
  FROM orders),
bounds AS (SELECT min(ck)::BIGINT AS min_a, max(ck)::BIGINT AS max_a,
                  min(d)::BIGINT AS min_b, max(d)::BIGINT AS max_b
           FROM src),
scaled AS (
  SELECT ck, d,
         ((ck - min_a) * {top}) // greatest(max_a - min_a, 1) AS a16,
         ((d - min_b) * {top}) // greatest(max_b - min_b, 1) AS b16
  FROM src CROSS JOIN bounds),
z AS (SELECT ck, d, ({inter})::BIGINT AS zkey FROM scaled)
SELECT (zkey // {cell})::BIGINT AS zbucket,
       count(*)::BIGINT AS n,
       min(ck)::BIGINT AS min_ck, max(ck)::BIGINT AS max_ck,
       min(d)::BIGINT AS min_day, max(d)::BIGINT AS max_day
FROM z GROUP BY 1
"""


@_register("zorder_layout", None)
def zorder_layout_q(spark, sf_dir):
    """Z-order (Morton) layout assignment over orders (custkey x
    order-day): min-max integer scaling + unrolled bit interleave, all
    row-local codegen'd column math; the per-zbucket census shows each
    write bucket covering a tight rectangle in BOTH dimensions — the
    multi-dimensional clustering that makes either-dimension range
    predicates prune files at 100 TB
    (datapipe/sampling.py zorder_key)."""
    from .datapipe.sampling import zorder_key

    src = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("ck"),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("d"),
    )
    z = zorder_key(src, "ck", "d", bits=16, buckets=64)
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("ck").cast("long").alias("min_ck"),
        F.max("ck").cast("long").alias("max_ck"),
        F.min("d").cast("long").alias("min_day"),
        F.max("d").cast("long").alias("max_day"),
    )


ORACLES["zorder_layout"] = _zorder_sql()


@_register("bloom_join_prune", None)
def bloom_join_prune_q(spark, sf_dir):
    """Bloom runtime-filter join: dim = small parts (p_size <= 12),
    fact = lineitem pre-filtered row-locally against the broadcast
    ~260-row bloom bitmap before the exact join. The oracle is the
    PLAIN join — the gate proves the bloom cut loses no true match
    (no false negatives by construction)
    (datapipe/sketches.py bloom_pruned_join)."""
    from .datapipe.sketches import bloom_pruned_join

    li = _t(spark, sf_dir, "lineitem")
    dim = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 12).select(
        "p_partkey", "p_size"
    )
    j = bloom_pruned_join(li, dim, "l_partkey", "p_partkey", bits=1 << 14)
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_joined"),
        F.sum(F.expr("cast(floor(l_quantity) as bigint)"))
        .cast("long")
        .alias("sum_qty"),
        F.count_distinct("l_partkey").cast("long").alias("n_keys"),
    )


ORACLES["bloom_join_prune"] = """
WITH dim AS (SELECT p_partkey FROM part WHERE p_size <= 12),
joined AS (
  SELECT l.l_partkey, CAST(floor(l.l_quantity) AS BIGINT) AS q
  FROM lineitem l JOIN dim d ON d.p_partkey = l.l_partkey)
SELECT count(*)::BIGINT AS n_joined,
       sum(q)::BIGINT AS sum_qty,
       count(DISTINCT l_partkey)::BIGINT AS n_keys
FROM joined
"""


_CDC_SRC_SQL = """
snap AS (SELECT o_orderkey AS k, o_orderstatus AS pay
         FROM orders WHERE o_orderkey % 4 <> 3),
chg AS (
  SELECT o_orderkey AS k, 'upsert' AS op,
         'U' || o_orderpriority AS pay, o_orderdate AS ts,
         o_orderkey AS cid
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 'delete', NULL,
         o_orderdate + INTERVAL 1 DAY, o_orderkey + 1000000
  FROM orders WHERE o_orderkey % 7 = 0),
win AS (SELECT k, max(struct_pack(ts := ts, cid := cid,
                                  op := op, pay := pay)) AS w
        FROM chg GROUP BY k),
wf AS (SELECT k, w.op AS op, w.pay AS cpay FROM win),
mrg AS (SELECT coalesce(s.k, c.k) AS k, s.pay AS spay, c.op, c.cpay,
               s.k IS NOT NULL AS snap_present
        FROM snap s FULL OUTER JOIN wf c ON c.k = s.k),
res AS (SELECT k, CASE WHEN op = 'upsert' THEN cpay ELSE spay END AS pay
        FROM mrg WHERE (op IS NULL AND snap_present) OR op = 'upsert')
"""


def _cdc_changes(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    snap = o.filter(F.col("o_orderkey") % 4 != 3).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("pay")
    )
    up = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("upsert").alias("op"),
        F.concat(F.lit("U"), F.col("o_orderpriority")).alias("pay"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("change_id"),
    )
    dl = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("string").alias("pay"),
        F.expr("o_orderdate + INTERVAL 1 DAY").alias("ts"),
        (F.col("o_orderkey") + 1000000).alias("change_id"),
    )
    return snap, up.unionByName(dl)


@_register("cdc_apply", f"WITH {_CDC_SRC_SQL} SELECT k, pay FROM res")
def cdc_apply_q(spark, sf_dir):
    """MERGE INTO semantics: snapshot + change log (upserts + deletes,
    deletes stamped later so they win overlaps) reconciled in one plan
    — partial-agg struct-max fold to the winning change per key (no
    per-key history sort), ONE full-outer join, row-local fate CASE
    (datapipe/cdc.py apply_changes)."""
    from .datapipe.cdc import apply_changes

    snap, chg = _cdc_changes(spark, sf_dir)
    return apply_changes(snap, chg, "k", "pay")


@_register(
    "cdc_audit",
    f"""
WITH {_CDC_SRC_SQL}
SELECT (SELECT count(*) FROM snap)::BIGINT AS n_snapshot,
       (SELECT count(*) FROM chg)::BIGINT AS n_changes,
       (SELECT count(*) FROM res)::BIGINT AS n_result,
       (SELECT count(*) FROM res
        WHERE k NOT IN (SELECT k FROM snap))::BIGINT AS n_inserted,
       (SELECT count(*) FROM snap
        WHERE k NOT IN (SELECT k FROM res))::BIGINT AS n_deleted
""",
)
def cdc_audit_q(spark, sf_dir):
    """The MERGE INTO report row: snapshot/changes/result sizes plus
    inserted and deleted key counts (anti-joins against the merged
    result) (datapipe/cdc.py apply_changes_audit)."""
    from .datapipe.cdc import apply_changes_audit

    snap, chg = _cdc_changes(spark, sf_dir)
    return apply_changes_audit(snap, chg, "k", "pay")


_ASSOC_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
keep AS (SELECT o FROM b GROUP BY o HAVING count(*) <= 64),
bc AS (SELECT b.o, b.i FROM b JOIN keep ON keep.o = b.o),
pr AS (SELECT x.i AS ia, y.i AS ib
       FROM bc x JOIN bc y ON x.o = y.o AND x.i < y.i),
c AS (SELECT ia, ib, count(*)::BIGINT AS n_ab FROM pr GROUP BY 1, 2
      HAVING count(*) >= 2),
itn AS (SELECT i, count(*)::BIGINT AS n_i FROM bc GROUP BY 1),
nb AS (SELECT count(DISTINCT o)::BIGINT AS n_baskets FROM bc),
dirs AS (SELECT ia AS ante, ib AS cons, n_ab FROM c
         UNION ALL
         SELECT ib, ia, n_ab FROM c)
SELECT ante::BIGINT AS ante, cons::BIGINT AS cons, n_ab,
       a.n_i AS n_ante, d.n_i AS n_cons,
       ((n_ab * 1000000) // n_baskets)::BIGINT AS support_ppm,
       ((n_ab * 1000000) // a.n_i)::BIGINT AS conf_ppm,
       (((n_ab * 1000000) // a.n_i) * n_baskets // d.n_i)::BIGINT
         AS lift_ppm
FROM dirs JOIN itn a ON a.i = dirs.ante
JOIN itn d ON d.i = dirs.cons
CROSS JOIN nb
"""


@_register("assoc_rules", _ASSOC_SQL)
def assoc_rules_q(spark, sf_dir):
    """A-priori 2-itemset association rules over order baskets
    (basket = order, item = part): directional support/confidence/lift
    in integer ppm for every co-purchased pair with support >= 2.
    Mega-baskets (> 64 items) drop before the quadratic pair self-join;
    pair generation is a basket-keyed equi-join; rule assembly joins
    are item-dimension-sized (datapipe/assoc.py association_rules)."""
    from .datapipe.assoc import association_rules

    return association_rules(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        min_pair_support=2, basket_cap=64,
    )


_KN_SQL = """
WITH wf AS (
  SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS w
  FROM documents),
bgx AS (SELECT unnest(list_transform(range(1, len(w)),
                                     i -> {'w1': w[i], 'w2': w[i + 1]})) AS b
        FROM wf),
c12 AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*)::BIGINT AS n12
        FROM bgx GROUP BY 1, 2),
lft AS (SELECT w1, sum(n12)::BIGINT AS c1, count(*)::BIGINT AS n1p
        FROM c12 GROUP BY 1),
rgt AS (SELECT w2, count(*)::BIGINT AS n1pc FROM c12 GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS nall FROM c12)
SELECT c12.w1, c12.w2, c12.n12,
       (((2 * n12 - 1) * 1000000) // (2 * c1)
        + ((n1p * n1pc * 1000000) // (2 * c1)) // nall)::BIGINT AS pkn_ppm
FROM c12 JOIN lft ON lft.w1 = c12.w1
JOIN rgt ON rgt.w2 = c12.w2
CROSS JOIN tot
WHERE n12 >= 3
"""


@_register("kneser_ney_bigram", _KN_SQL)
def kneser_ney_bigram_q(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM estimation with d = 1/2,
    integer ppm: discounted bigram term + continuation-count backoff
    (the novel-context statistic), both floors computed by the
    identical split formula in Spark and DuckDB. One corpus scan to
    bigram occurrences; all count tables are partial-agg groupBys over
    the bigram-TYPE table (datapipe/vocab.py kneser_ney_bigrams)."""
    from .datapipe.vocab import kneser_ney_bigrams

    return kneser_ney_bigrams(_t(spark, sf_dir, "documents"), min_count=3)


_IVM_CHAIN = """
snap AS (SELECT o_orderkey AS k, o_orderpriority AS grp,
                CAST(floor(o_totalprice) AS BIGINT) AS val
         FROM orders WHERE o_orderkey % 4 <> 3),
chg AS (
  SELECT o_orderkey AS k, 'upsert' AS op, 'P-' || o_orderstatus AS grp,
         CAST(floor(o_totalprice / 2) AS BIGINT) AS val,
         o_orderdate AS ts, o_orderkey AS cid
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 'delete', NULL, NULL,
         o_orderdate + INTERVAL 1 DAY, o_orderkey + 1000000
  FROM orders WHERE o_orderkey % 7 = 0),
win AS (SELECT k, max(struct_pack(ts := ts, cid := cid, op := op,
                                  grp := grp, val := val)) AS w
        FROM chg GROUP BY k),
wf AS (SELECT k, w.op AS op, w.grp AS cgrp, w.val AS cval FROM win),
mrg AS (SELECT s.grp AS sgrp, s.val AS sval, c.op, c.cgrp, c.cval,
               s.k IS NOT NULL AS snap_present
        FROM snap s FULL OUTER JOIN wf c ON c.k = s.k),
res AS (SELECT CASE WHEN op = 'upsert' THEN cgrp ELSE sgrp END AS grp,
               CASE WHEN op = 'upsert' THEN cval ELSE sval END AS val
        FROM mrg WHERE (op IS NULL AND snap_present) OR op = 'upsert')
"""

_IVM_SQL = f"""
WITH {_IVM_CHAIN}
SELECT grp, count(*)::BIGINT AS n_rows, sum(val)::BIGINT AS sum_val
FROM res GROUP BY 1
"""


def _ivm_inputs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    snap = o.filter(F.col("o_orderkey") % 4 != 3).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(floor(o_totalprice) AS BIGINT)").alias("val"),
    )
    up = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("upsert").alias("op"),
        F.concat(F.lit("P-"), F.col("o_orderstatus")).alias("grp"),
        F.expr("CAST(floor(o_totalprice / 2) AS BIGINT)").alias("val"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("change_id"),
    )
    dl = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("string").alias("grp"),
        F.lit(None).cast("long").alias("val"),
        F.expr("o_orderdate + INTERVAL 1 DAY").alias("ts"),
        (F.col("o_orderkey") + 1000000).alias("change_id"),
    )
    return snap, up.unionByName(dl)


@_register("ivm_refresh", _IVM_SQL)
def ivm_refresh_q(spark, sf_dir):
    """Incremental materialized-view maintenance: the per-group
    (count, sum) view refreshed from a CDC change log WITHOUT
    re-aggregating the base table — winning change per key via the
    partial-agg struct-max fold, old values via ONE changed-keys-sized
    equi-join, row-local retract/add delta rows, per-group delta
    partial-agg, one group-keyed patch join (zero-count groups drop).
    The DuckDB oracle is the FULL recompute over the merged table, so
    the hash match proves incremental == full
    (datapipe/cdc.py incremental_view_refresh)."""
    from .datapipe.cdc import incremental_view_refresh

    snap, chg = _ivm_inputs(spark, sf_dir)
    return incremental_view_refresh(snap, chg, "k", "grp", "val")


_TERM_LIFT_SQL = """
WITH tw AS (
  SELECT lang AS cls,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS t
  FROM documents),
ct AS (SELECT cls, t, count(*)::BIGINT AS tf_c FROM tw GROUP BY 1, 2),
tt AS (SELECT t, sum(tf_c)::BIGINT AS tf FROM ct GROUP BY 1
       HAVING sum(tf_c) >= 5),
nc AS (SELECT cls, sum(tf_c)::BIGINT AS n_c FROM ct GROUP BY 1),
na AS (SELECT sum(tf)::BIGINT AS n_all FROM tt),
lf AS (SELECT ct.cls, ct.t, tf_c, tf,
              (((tf_c * 1000000) // tf) * n_all // n_c)::BIGINT AS lift_ppm
       FROM ct JOIN tt ON tt.t = ct.t
       JOIN nc ON nc.cls = ct.cls
       CROSS JOIN na),
rk AS (SELECT *, row_number() OVER (PARTITION BY cls
                                    ORDER BY lift_ppm DESC, t ASC) AS rank
       FROM lf)
SELECT cls, t, tf_c, tf, lift_ppm, rank FROM rk WHERE rank <= 10
"""


@_register("class_term_lift", _TERM_LIFT_SQL)
def class_term_lift_q(spark, sf_dir):
    """Discriminative vocabulary per language class: top-10 terms per
    class by in-class-rate / corpus-rate lift (integer ppm, two-step
    floor), min corpus df 5. One corpus explosion feeds both censuses;
    the ranking window runs over the (class × vocab)-bounded term
    census (datapipe/textstats.py class_term_lift)."""
    from .datapipe.textstats import class_term_lift

    return class_term_lift(
        _t(spark, sf_dir, "documents"), "lang", min_df=5, top_k=10
    )


_NOVELTY_SQL = f"""
WITH {{shingles}},
ref AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
newg AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 2 = 1),
per AS (SELECT doc_id, count(*)::BIGINT AS n_grams,
               sum(CASE WHEN ref.shingle IS NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_novel
        FROM newg LEFT JOIN ref ON ref.shingle = newg.shingle
        GROUP BY 1)
SELECT doc_id, n_grams, n_novel,
       ((n_novel * 1000000) // n_grams)::BIGINT AS novelty_ppm
FROM per
""".format(shingles=_SHINGLES_SQL)


@_register("novelty_rate", _NOVELTY_SQL)
def novelty_rate_q(spark, sf_dir):
    """Per-document n-gram novelty of the odd-id corpus half against
    the even-id reference half — the ingest-freshness audit: distinct
    reference shingles once, ONE gram-keyed equi-join membership test
    (no broadcast assumption — the reference side is corpus-sized),
    per-doc partial-agg tallies (datapipe/dedup.py ngram_novelty)."""
    from .datapipe.dedup import ngram_novelty

    docs = _t(spark, sf_dir, "documents")
    return ngram_novelty(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )


_VOCAB_GROWTH_SQL = f"""
WITH {{shingles}},
fs AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1),
mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
dg AS (SELECT (first_doc * 10) // m AS decile, count(*)::BIGINT AS n_new
       FROM fs CROSS JOIN mx GROUP BY 1)
SELECT decile::BIGINT AS decile, n_new AS n_new_grams,
       (sum(n_new) OVER (ORDER BY decile))::BIGINT AS cum_grams
FROM dg
""".format(shingles=_SHINGLES_SQL)


@_register("vocab_growth", _VOCAB_GROWTH_SQL)
def vocab_growth_q(spark, sf_dir):
    """Heaps'-law vocabulary-saturation curve: new distinct 3-shingles
    contributed by each corpus decile (deterministic doc_id order) plus
    the cumulative count — one partial-agg first-occurrence groupBy, a
    row-local decile label against the broadcast max id, and a
    bucket-sized cumulative window (datapipe/dedup.py vocab_growth)."""
    from .datapipe.dedup import vocab_growth

    return vocab_growth(_t(spark, sf_dir, "documents"))


_SCD2_CHG_SQL = """
chg2 AS (
  SELECT o_orderkey AS k, 'upsert' AS op, 'V1-' || o_orderpriority AS pay,
         o_orderdate AS ts, o_orderkey AS cid
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 'upsert', 'V2-' || o_orderstatus,
         o_orderdate + INTERVAL 30 DAY, o_orderkey + 1000000
  FROM orders WHERE o_orderkey % 6 = 0
  UNION ALL
  SELECT o_orderkey, 'delete', NULL,
         o_orderdate + INTERVAL 60 DAY, o_orderkey + 2000000
  FROM orders WHERE o_orderkey % 7 = 0)
"""

_SCD2_SQL = f"""
WITH {_SCD2_CHG_SQL},
led AS (SELECT k, op, pay, ts,
               lead(ts) OVER (PARTITION BY k ORDER BY ts, cid) AS next_ts
        FROM chg2)
SELECT k, pay, ts AS valid_from, next_ts AS valid_to,
       (next_ts IS NULL)::BIGINT AS is_current
FROM led WHERE op = 'upsert'
"""


def _scd2_changes(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("upsert").alias("op"),
        F.concat(F.lit("V1-"), F.col("o_orderpriority")).alias("pay"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("change_id"),
    )
    v2 = o.filter(F.col("o_orderkey") % 6 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("upsert").alias("op"),
        F.concat(F.lit("V2-"), F.col("o_orderstatus")).alias("pay"),
        F.expr("o_orderdate + INTERVAL 30 DAY").alias("ts"),
        (F.col("o_orderkey") + 1000000).alias("change_id"),
    )
    dl = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("string").alias("pay"),
        F.expr("o_orderdate + INTERVAL 60 DAY").alias("ts"),
        (F.col("o_orderkey") + 2000000).alias("change_id"),
    )
    return v1.unionByName(v2).unionByName(dl)


@_register("scd2_build", _SCD2_SQL)
def scd2_build_q(spark, sf_dir):
    """Type-2 slowly-changing dimension build: version rows with
    [valid_from, valid_to) intervals from a multi-generation change
    log (two upsert generations + deletes that close intervals) — one
    key-partitioned lead() window bounded by per-key history length,
    deterministic under ties via the (ts, change_id) total order
    (datapipe/cdc.py scd2_build)."""
    from .datapipe.cdc import scd2_build

    return scd2_build(_scd2_changes(spark, sf_dir), "k", "pay")


@_register(
    "scd2_lookup",
    f"""
WITH {_SCD2_CHG_SQL},
led AS (SELECT k, op, pay, ts,
               lead(ts) OVER (PARTITION BY k ORDER BY ts, cid) AS next_ts
        FROM chg2),
dim AS (SELECT k, pay, ts AS valid_from, next_ts AS valid_to
        FROM led WHERE op = 'upsert'),
pr AS (SELECT o_orderkey AS k, o_orderdate + INTERVAL 45 DAY AS probe_ts
       FROM orders WHERE o_orderkey % 3 = 0)
SELECT pr.k, probe_ts, pay, valid_from, valid_to
FROM pr JOIN dim ON dim.k = pr.k
WHERE probe_ts >= valid_from
  AND (valid_to IS NULL OR probe_ts < valid_to)
""",
)
def scd2_lookup_q(spark, sf_dir):
    """Point-in-time lookup against the SCD2 dimension: each probe
    (key, ts at +45 days) lands in exactly one version's
    [valid_from, valid_to) interval — probes whose key's generation-2
    upsert already superseded v1 resolve to v2; probes after a delete
    (gap) drop. One key-partitioned equi-join + row-local interval
    predicate; SCD2 disjointness means no post-join dedup
    (datapipe/cdc.py scd2_lookup, scd2_build)."""
    from .datapipe.cdc import scd2_build, scd2_lookup

    dim = scd2_build(_scd2_changes(spark, sf_dir), "k", "pay").drop(
        "is_current"
    )
    o = _t(spark, sf_dir, "orders")
    probes = o.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.expr("o_orderdate + INTERVAL 45 DAY").alias("probe_ts"),
    )
    return scd2_lookup(dim, probes, "k").select(
        "k", "probe_ts", "pay", "valid_from", "valid_to"
    )


@_register(
    "view_drift",
    f"""
WITH {_IVM_CHAIN},
new_v AS (SELECT grp, count(*)::BIGINT AS n_rows, sum(val)::BIGINT AS sum_val
          FROM res GROUP BY 1),
old_v AS (SELECT grp, count(*)::BIGINT AS n_rows, sum(val)::BIGINT AS sum_val
          FROM snap GROUP BY 1)
SELECT coalesce(o.grp, n.grp) AS grp,
       coalesce(o.n_rows, 0)::BIGINT AS old_rows,
       coalesce(n.n_rows, 0)::BIGINT AS new_rows,
       coalesce(o.sum_val, 0)::BIGINT AS old_sum,
       coalesce(n.sum_val, 0)::BIGINT AS new_sum,
       ((coalesce(n.n_rows, 0) - coalesce(o.n_rows, 0)) * 1000000
        // greatest(coalesce(o.n_rows, 0), 1))::BIGINT AS rows_delta_ppm
FROM old_v o FULL OUTER JOIN new_v n ON n.grp = o.grp
""",
)
def view_drift_q(spark, sf_dir):
    """Materialized-view drift report across a CDC refresh — the
    data-diff a pipeline logs per batch: per group, before/after row
    and sum totals plus the signed row-count delta in ppm of the old
    size (new/vanished groups included via the full-outer diff). The
    new side is the INCREMENTAL refresh (cdc.incremental_view_refresh),
    so this also continuously exercises IVM == full-recompute; the diff
    itself is one group-keyed full-outer join of two view-sized
    tables."""
    from .datapipe.cdc import incremental_view_refresh

    snap, chg = _ivm_inputs(spark, sf_dir)
    new_v = incremental_view_refresh(snap, chg, "k", "grp", "val")
    old_v = snap.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").cast("long").alias("sum_val"),
    )
    z = F.lit(0).cast("long")
    o = old_v.select(
        "grp", F.col("n_rows").alias("old_rows"),
        F.col("sum_val").alias("old_sum"),
    )
    n = new_v.select(
        "grp", F.col("n_rows").alias("new_rows"),
        F.col("sum_val").alias("new_sum"),
    )
    return (
        o.join(n, "grp", "full_outer")
        .select(
            "grp",
            F.coalesce("old_rows", z).alias("old_rows"),
            F.coalesce("new_rows", z).alias("new_rows"),
            F.coalesce("old_sum", z).alias("old_sum"),
            F.coalesce("new_sum", z).alias("new_sum"),
        )
        .withColumn(
            "rows_delta_ppm",
            F.expr(
                "((new_rows - old_rows) * 1000000L)"
                " div greatest(old_rows, 1L)"
            ),
        )
    )


# --- training-sequence packing census -------------------------------------

_PACK_LEN = 256


def _pack_oracle() -> str:
    from .datapipe.sampling import pack_sequences_sql

    return pack_sequences_sql(_PACK_LEN, "documents", "pack")


@_register("pack_sequences", None)
def pack_sequences_q(spark, sf_dir):
    """GPT-style pretraining packer census: the corpus token stream in
    the deterministic epoch order, cut every 256 tokens; per training
    sequence the docs starting there, their token mass, and how many
    spill across the boundary (packing efficiency / attention
    fragmentation). Prefix sum is fully distributed — range-partition
    + per-partition running sum + broadcast offsets, no
    SinglePartition exchange (datapipe/sampling.py pack_sequences)."""
    from .datapipe.sampling import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), _PACK_LEN)


ORACLES["pack_sequences"] = _pack_oracle()


# --- event-volume anomaly monitor ------------------------------------------

_ANOM_W = 3
_ANOM_K = 4

_ANOM_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
tr AS (
  SELECT event_type, day, n,
         sum(n) OVER w AS s, sum(n * n) OVER w AS s2, count(*) OVER w AS c
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {_ANOM_W} PRECEDING AND 1 PRECEDING))
SELECT event_type, day, n,
       (s // c)::BIGINT AS trail_mean,
       (s2 // c - (s // c) * (s // c))::BIGINT AS trail_var,
       ((n - s // c) * (n - s // c))::BIGINT AS dev2,
       (n - s // c) * (n - s // c)
         > {_ANOM_K} * greatest(s2 // c - (s // c) * (s // c), 1) AS is_anomaly
FROM tr WHERE c = {_ANOM_W}
"""


@_register("event_volume_anomaly", _ANOM_SQL)
def event_volume_anomaly_q(spark, sf_dir):
    """Ingest health-check: per (type, day) event counts tested against
    the trailing-3-day integer moving moments ((n-mean)^2 > 4*var,
    floor-arithmetic — engine-exact); the window runs over the tiny
    (type x day) census partitioned by type, never the raw log
    (datapipe/events.py volume_anomaly)."""
    from .datapipe.events import volume_anomaly

    return volume_anomaly(
        _t(spark, sf_dir, "events"), window_days=_ANOM_W, k_sigma2=_ANOM_K
    )


# --- incremental (nightly-batch) near-dup check -----------------------------


def _incr_oracle() -> str:
    from .datapipe.hashes import h60_salted_sql

    memb = f"({h60_salted_sql('doc_id::VARCHAR', chr(39) + 'incr' + chr(39))} % 1000) < 800"
    return f"""
WITH {_minhash_banded_sql("documents")},
memb AS (SELECT doc_id, {memb} AS is_old FROM documents),
cand AS (
  SELECT DISTINCT bn.doc_id AS new_id, bo.doc_id AS old_id
  FROM banded bn JOIN memb mn ON mn.doc_id = bn.doc_id AND NOT mn.is_old
  JOIN banded bo ON bo.band = bn.band AND bo.bkey = bn.bkey
  JOIN memb mo ON mo.doc_id = bo.doc_id AND mo.is_old),
est AS (
  SELECT c.new_id,
         len(list_filter(list_zip(sn.sig, so.sig),
                         p -> p[1] = p[2]))::DOUBLE / {_MINHASH_N} AS ej
  FROM cand c JOIN sig sn ON c.new_id = sn.doc_id
              JOIN sig so ON c.old_id = so.doc_id),
m AS (SELECT new_id, count(*)::BIGINT AS n_index_matches,
             round(max(ej), 6) AS best_est_jaccard
      FROM est WHERE ej >= {_MINHASH_T} GROUP BY 1)
SELECT d.doc_id,
       coalesce(m.n_index_matches, 0)::BIGINT AS n_index_matches,
       m.best_est_jaccard
FROM documents d JOIN memb ON memb.doc_id = d.doc_id AND NOT memb.is_old
LEFT JOIN m ON m.new_id = d.doc_id
"""


@_register("dedup_incremental", None)
def dedup_incremental_q(spark, sf_dir):
    """Nightly-batch near-dup check: the corpus split 80/20 by id hash
    into standing index vs tonight's batch; batch band keys collide
    against the index's banded_keys table (the materialized form a
    production pipeline keeps between runs), candidates verified by
    signature-estimated Jaccard. One row per batch doc with its index
    match count — ``n_index_matches = 0`` is the append set
    (datapipe/dedup.py incremental_lsh_matches)."""
    from .datapipe.dedup import incremental_lsh_matches
    from .datapipe.hashes import h60_salted

    docs = _t(spark, sf_dir, "documents")
    is_old = (
        F.pmod(h60_salted(F.col("doc_id").cast("string"), F.lit("incr")), F.lit(1000))
        < 800
    )
    return incremental_lsh_matches(
        docs.filter(is_old),
        docs.filter(~is_old),
        num_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        threshold=_MINHASH_T,
    )


ORACLES["dedup_incremental"] = _incr_oracle()


# --- data-governance audits --------------------------------------------------

_KANON_K = 5

_KANON_SQL = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n
  FROM customer GROUP BY 1, 2),
a AS (
  SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_groups,
         sum(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END)::BIGINT AS n_small_groups,
         sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END)::BIGINT AS n_rows_at_risk,
         min(n)::BIGINT AS min_group_size
  FROM g)
SELECT *, (n_rows_at_risk * 1000000 // n_rows)::BIGINT AS risk_ppm FROM a
"""


@_register("k_anonymity", _KANON_SQL)
def k_anonymity_q(spark, sf_dir):
    """k-anonymity governance audit: equivalence classes of the
    (c_nationkey, c_mktsegment) quasi-identifier pair with fewer than
    k=5 members, and the rows at re-identification risk inside them.
    One partial-agg groupBy to the QI census (bounded by the QI domain,
    never the row count) + one tiny aggregate
    (datapipe/profile.py k_anonymity)."""
    from .datapipe.profile import k_anonymity

    return k_anonymity(
        _t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=_KANON_K
    )


_FK_SQL = """
WITH
ok AS (SELECT DISTINCT o_orderkey AS k FROM orders),
pk AS (SELECT DISTINCT p_partkey AS k FROM part),
ck AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal >= 0),
a AS (
  SELECT 'lineitem.l_orderkey->orders' AS relation,
         count(*)::BIGINT AS n_child,
         sum(CASE WHEN ok.k IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphans
  FROM lineitem LEFT JOIN ok ON l_orderkey = ok.k
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         count(*)::BIGINT,
         sum(CASE WHEN pk.k IS NULL THEN 1 ELSE 0 END)::BIGINT
  FROM lineitem LEFT JOIN pk ON l_partkey = pk.k
  UNION ALL
  SELECT 'orders.o_custkey->customer_in_good_standing',
         count(*)::BIGINT,
         sum(CASE WHEN ck.k IS NULL THEN 1 ELSE 0 END)::BIGINT
  FROM orders LEFT JOIN ck ON o_custkey = ck.k)
SELECT *, (n_orphans * 1000000 // n_child)::BIGINT AS orphan_ppm FROM a
"""


@_register("fk_integrity", _FK_SQL)
def fk_integrity_q(spark, sf_dir):
    """Referential-integrity audit across the star schema: orphan-row
    counts/ppm for lineitem->orders, lineitem->part, and
    orders->customer where the customer dimension is cut to accounts in
    good standing (c_acctbal >= 0) — the corrupted-dimension simulation
    that makes the audit exercise nonzero orphans. Each edge is ONE
    child scan with a broadcast DISTINCT-parent-keys left join + one
    conditional count (datapipe/profile.py fk_orphans)."""
    from .datapipe.profile import fk_orphans

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    a = fk_orphans(li, "l_orderkey", orders, "o_orderkey",
                   "lineitem.l_orderkey->orders")
    b = fk_orphans(li, "l_partkey", _t(spark, sf_dir, "part"), "p_partkey",
                   "lineitem.l_partkey->part")
    c = fk_orphans(
        orders, "o_custkey",
        _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0),
        "c_custkey", "orders.o_custkey->customer_in_good_standing")
    return a.unionByName(b).unionByName(c)


# --- ROC-AUC evaluation ------------------------------------------------------

_MAD_SQL = """
WITH cen AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c
             FROM documents GROUP BY 1, 2),
tot AS (SELECT source, sum(c)::BIGINT AS n FROM cen GROUP BY 1),
cum AS (SELECT source, v, c,
               sum(c) OVER (PARTITION BY source ORDER BY v) AS cum
        FROM cen),
med AS (SELECT cum.source, min(v)::BIGINT AS med
        FROM cum JOIN tot ON tot.source = cum.source
        WHERE 2 * cum >= n GROUP BY 1),
dev AS (SELECT d.source, d.doc_id, d.n_chars AS v,
               abs(d.n_chars - med)::BIGINT AS ad, med
        FROM documents d JOIN med ON med.source = d.source),
dc AS (SELECT source, ad, count(*)::BIGINT AS c FROM dev GROUP BY 1, 2),
dt AS (SELECT source, sum(c)::BIGINT AS n FROM dc GROUP BY 1),
dcum AS (SELECT source, ad,
                sum(c) OVER (PARTITION BY source ORDER BY ad) AS cum
         FROM dc),
mad AS (SELECT dcum.source, min(ad)::BIGINT AS mad
        FROM dcum JOIN dt ON dt.source = dcum.source
        WHERE 2 * cum >= n GROUP BY 1)
SELECT dev.source, doc_id, v::BIGINT AS value, dev.med, mad.mad
FROM dev JOIN mad ON mad.source = dev.source
WHERE ad > 3 * greatest(mad, 1)
"""


@_register("mad_outliers", _MAD_SQL)
def mad_outliers_q(spark, sf_dir):
    """Robust per-source length outliers via median absolute deviation
    (|x − median| > 3·max(MAD,1)) — the breakdown-point-0.5 complement
    to the integer-moment z² test (length_outliers): a handful of
    extreme docs cannot drag the cutoff the way they inflate a
    variance. Both medians are exact census disc-percentiles (windows
    over the per-group value DOMAIN, never raw rows); med/mad broadcast
    back onto the scan (datapipe/profile.py mad_outliers)."""
    from .datapipe.profile import mad_outliers

    return mad_outliers(
        _t(spark, sf_dir, "documents"), "source", "n_chars", "doc_id", k=3
    )


_FD_SQL = """
WITH a AS (
  SELECT 'part.p_partkey->p_brand' AS fd,
         count(*)::BIGINT AS n_groups,
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating
  FROM (SELECT p_partkey, count(DISTINCT p_brand) AS nd
        FROM part GROUP BY 1)
  UNION ALL
  SELECT 'part.p_brand->p_type', count(*)::BIGINT,
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT
  FROM (SELECT p_brand, count(DISTINCT p_type) AS nd FROM part GROUP BY 1)
  UNION ALL
  SELECT 'orders.o_custkey->o_orderpriority', count(*)::BIGINT,
         sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT
  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
        FROM orders GROUP BY 1))
SELECT fd, n_groups, n_violating,
       ((n_violating * 1000000) // n_groups)::BIGINT AS violation_ppm
FROM a
"""


@_register("fd_violations", _FD_SQL)
def fd_violations_q(spark, sf_dir):
    """Functional-dependency discovery audit across three candidate
    FDs — a holding key FD (partkey→brand), a broken attribute FD
    (brand→type), and a non-FD control (custkey→orderpriority):
    violating-determinant counts and ppm, each ONE determinant-domain-
    bounded groupBy + a 1-row aggregate, never a self-join
    (datapipe/profile.py fd_violations)."""
    from .datapipe.profile import fd_violations

    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    a = fd_violations(part, "p_partkey", "p_brand",
                      "part.p_partkey->p_brand")
    b = fd_violations(part, "p_brand", "p_type", "part.p_brand->p_type")
    c = fd_violations(orders, "o_custkey", "o_orderpriority",
                      "orders.o_custkey->o_orderpriority")
    return a.unionByName(b).unionByName(c)


_KS_SQL = """
WITH ca AS (SELECT n_chars AS value, count(*)::BIGINT AS c_a
            FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
cb AS (SELECT n_chars AS value, count(*)::BIGINT AS c_b
       FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
cen AS (SELECT coalesce(ca.value, cb.value) AS value,
               coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
        FROM ca FULL OUTER JOIN cb ON cb.value = ca.value),
cum AS (SELECT value,
               sum(c_a) OVER (ORDER BY value) AS cum_a,
               sum(c_b) OVER (ORDER BY value) AS cum_b
        FROM cen),
tot AS (SELECT sum(c_a)::BIGINT AS n_a, sum(c_b)::BIGINT AS n_b FROM cen),
d AS (SELECT value, n_a, n_b,
             abs(cum_a * n_b - cum_b * n_a) AS diff
      FROM cum CROSS JOIN tot),
mx AS (SELECT max(diff) AS max_diff FROM d)
SELECT n_a, n_b,
       (max_diff // greatest((n_a * n_b) // 1000000, 1))::BIGINT AS d_ppm,
       min(value)::BIGINT AS at_value
FROM d JOIN mx ON d.diff = mx.max_diff
GROUP BY n_a, n_b, max_diff
"""


@_register("ks_drift", _KS_SQL)
def ks_drift_q(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift between the even- and
    odd-id corpus halves on document length — integer-exact via the
    cleared |cum_a·n_b − cum_b·n_a| form over the merged value census
    (domain-bounded window, raw rows never sort), with the
    deterministic smallest argmax value
    (datapipe/profile.py ks_drift)."""
    from .datapipe.profile import ks_drift

    docs = _t(spark, sf_dir, "documents")
    return ks_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "n_chars",
    )


_LBAL_SQL = """
WITH cen AS (SELECT source AS grp, lang AS lbl, count(*)::BIGINT AS c
             FROM documents GROUP BY 1, 2),
agg AS (SELECT grp, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_labels,
               max(c)::BIGINT AS top_c, sum(c * c)::BIGINT AS ss
        FROM cen GROUP BY 1)
SELECT grp AS source, n, n_labels,
       ((top_c * 1000000) // n)::BIGINT AS top_share_ppm,
       (1000000 - ss // greatest((n * n) // 1000000, 1))::BIGINT
         AS simpson_ppm
FROM agg
"""


@_register("label_balance", _LBAL_SQL)
def label_balance_q(spark, sf_dir):
    """Per-source language-balance audit: label count, top-label share,
    and Simpson diversity (1 − Σ share², the entropy-free diversity
    index) in integer ppm — two domain-bounded partial aggregations
    (datapipe/profile.py label_balance)."""
    from .datapipe.profile import label_balance

    return label_balance(_t(spark, sf_dir, "documents"), "source", "lang")


_RANKNORM_SQL = """
WITH cen AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c
             FROM documents GROUP BY 1, 2),
cum AS (SELECT source, v, c,
               sum(c) OVER (PARTITION BY source ORDER BY v) - c AS below
        FROM cen),
tot AS (SELECT source, sum(c)::BIGINT AS n FROM cen GROUP BY 1)
SELECT d.source, d.doc_id, d.n_chars::BIGINT AS value,
       ((below * 1000000) // greatest(n - 1, 1))::BIGINT AS pct_ppm
FROM documents d
JOIN cum ON cum.source = d.source AND cum.v = d.n_chars
JOIN tot ON tot.source = d.source
"""


@_register("rank_normalize", _RANKNORM_SQL)
def rank_normalize_q(spark, sf_dir):
    """Per-source percent-rank normalization of document lengths — the
    quantile-feature transform, integer ppm with shared ties. The
    ranking window runs over the per-source VALUE CENSUS (domain-
    bounded, skew-safe) and joins back onto the scan; raw rows are
    never sorted (datapipe/profile.py rank_normalize)."""
    from .datapipe.profile import rank_normalize

    return rank_normalize(
        _t(spark, sf_dir, "documents"), "source", "n_chars", "doc_id"
    )


_WINSOR_SQL = """
WITH cen AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c
             FROM documents GROUP BY 1, 2),
tot AS (SELECT source, sum(c)::BIGINT AS n FROM cen GROUP BY 1),
cum AS (SELECT source, v, c,
               sum(c) OVER (PARTITION BY source ORDER BY v) AS cum
        FROM cen),
lo AS (SELECT cum.source, min(v)::BIGINT AS p_lo
       FROM cum JOIN tot ON tot.source = cum.source
       WHERE 100 * cum >= 10 * n GROUP BY 1),
hi AS (SELECT cum.source, min(v)::BIGINT AS p_hi
       FROM cum JOIN tot ON tot.source = cum.source
       WHERE 100 * cum >= 90 * n GROUP BY 1),
cl AS (SELECT d.source, lo.p_lo, hi.p_hi,
              least(greatest(d.n_chars, p_lo), p_hi) AS cv
       FROM documents d
       JOIN lo ON lo.source = d.source
       JOIN hi ON hi.source = d.source)
SELECT source, count(*)::BIGINT AS n, p_lo, p_hi,
       (sum(cv) // count(*))::BIGINT AS wins_mean
FROM cl GROUP BY source, p_lo, p_hi
"""


@_register("winsorized_stats", _WINSOR_SQL)
def winsorized_stats_q(spark, sf_dir):
    """Per-source winsorized length summary: exact census p10/p90 cut
    values + the clipped mean — the heavy-tail-tolerant location
    estimate; two domain-bounded census percentiles, broadcast cuts,
    one row-local clip + partial-agg sum
    (datapipe/profile.py winsorized_stats, _disc_percentile)."""
    from .datapipe.profile import winsorized_stats

    return winsorized_stats(
        _t(spark, sf_dir, "documents"), "source", "n_chars",
        lo_pct=10, hi_pct=90,
    )


_TENC_SQL = """
WITH base AS (SELECT o_orderpriority AS cat,
                     CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
              FROM orders),
cen AS (SELECT cat, count(*)::BIGINT AS n, sum(y)::BIGINT AS sum_y
        FROM base GROUP BY 1),
g AS (SELECT ((sum(y) * 1000000) // count(*))::BIGINT AS prior_ppm
      FROM base)
SELECT cat AS o_orderpriority, n, sum_y, prior_ppm,
       ((sum_y * 1000000 + 10 * prior_ppm) // (n + 10))::BIGINT AS enc_ppm
FROM cen CROSS JOIN g
"""


@_register("target_encode", _TENC_SQL)
def target_encode_q(spark, sf_dir):
    """Smoothed target encoding of order priority against the
    fulfilled-order label: per-category (Σy·1e6 + m·prior_ppm)/(n+m)
    with m = 10 and the broadcast global rate as prior — one category
    census + one global aggregate, integer ppm
    (datapipe/profile.py target_encode)."""
    from .datapipe.profile import target_encode

    o = _t(spark, sf_dir, "orders")
    return target_encode(
        o, "o_orderpriority",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0),
        smoothing=10,
    )


_AUC_SQL = """
WITH s AS (
  SELECT l_returnflag AS grp,
         (year(l_shipdate) - 1992) * 4
           + CAST(floor(l_quantity) AS BIGINT) // 5 AS score,
         CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END AS y
  FROM lineitem),
cen AS (
  SELECT grp, score, count(*)::BIGINT AS c, sum(y)::BIGINT AS p
  FROM s GROUP BY 1, 2),
r AS (
  SELECT grp, c, p,
         coalesce(sum(c) OVER (PARTITION BY grp ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM cen),
a AS (
  SELECT grp, sum(p * (2 * cum + c + 1))::BIGINT AS r2,
         sum(p)::BIGINT AS n_pos, sum(c - p)::BIGINT AS n_neg
  FROM r GROUP BY 1)
SELECT grp, n_pos, n_neg,
       ((r2 - n_pos * (n_pos + 1)) * 1000000 // (2 * n_pos * n_neg))::BIGINT
         AS auc_ppm
FROM a
"""


@_register("auc_eval", _AUC_SQL)
def auc_eval_q(spark, sf_dir):
    """Per-group ROC-AUC via the tie-corrected Mann-Whitney rank sum —
    the classifier-evaluation primitive, integer-exact in ppm. The
    "model" is a deterministic weak scorer over lineitem (shipyear
    signal + quantity noise, heavy ties exercising the midrank math);
    label = shipped on/after 1996. The ranking window runs over the
    (group, score) census, never the 60k raw rows
    (genie_spark/metrics.py auc_by_group)."""
    from .metrics import auc_by_group

    li = _t(spark, sf_dir, "lineitem")
    samples = li.select(
        F.col("l_returnflag").alias("grp"),
        (
            (F.year("l_shipdate") - F.lit(1992)) * F.lit(4)
            + F.expr("CAST(floor(l_quantity) AS BIGINT) div 5L")
        ).cast("long").alias("score"),
        F.when(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"), 1)
        .otherwise(0)
        .cast("long")
        .alias("y"),
    )
    return auc_by_group(samples, "grp", "score", "y")
