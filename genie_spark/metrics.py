"""Triple-set evaluation metrics as DataFrame aggregations.

The reference implements micro P/R/F1 as three torchmetrics counters
all-reduced over DDP ranks (reference: genie/metrics/triplet_set_f1.py,
triplet_set_precision.py, triplet_set_recall.py) and the macro / bucket /
zero-shot evaluators as Python loops over the full prediction list
(genie/utils/evaluators.py:20-263). In Spark every one of these is a
groupBy + sum — partial aggregation, shuffle of a handful of counters,
final merge — i.e. the metric computation is O(rows/cores) with a
few-KB shuffle regardless of dataset size.

Input convention: an eval DataFrame with one row per sample and two
array<struct<s,r,o>> columns (``pred`` and ``target``). Per-sample
intersection counts come from ``array_intersect`` on the normalized key
form — no join, no shuffle, whole-stage codegen.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .triples import triple_key_col



def _counts(
    df: DataFrame, pred: str = "pred", target: str = "target"
) -> DataFrame:
    """Per-sample n_correct / n_pred / n_target (reference
    triplet_set_f1.py:14-20). Set semantics via array_distinct +
    array_intersect on flat s␞r␞o string keys: string element type takes
    Spark's fast hash-set intersect path, while struct elements fall back
    to interpreted ordering (~2× slower measured at sf0.1)."""
    p = F.array_distinct(triple_key_col(F.col(pred)))
    t = F.array_distinct(triple_key_col(F.col(target)))
    return df.withColumn("n_correct", F.size(F.array_intersect(p, t))).withColumn(
        "n_pred", F.size(p)
    ).withColumn("n_target", F.size(t))


def _prf(correct: Column, pred: Column, target: Column):
    """Zero-division semantics of the reference (triplet_set_recall.py:48-52,
    triplet_set_precision.py / triplet_set_f1.py compute): an empty
    denominator yields 0.0, and F1 is 0.0 when P+R == 0."""
    precision = F.when(pred == 0, 0.0).otherwise(correct / pred)
    recall = F.when(target == 0, 0.0).otherwise(correct / target)
    f1 = F.when(
        (precision + recall) == 0, 0.0
    ).otherwise(2 * precision * recall / (precision + recall))
    return precision, recall, f1


def micro_metrics(
    df: DataFrame,
    pred: str = "pred",
    target: str = "target",
    recall_only: bool = False,
) -> DataFrame:
    """A1 — global micro precision / recall / F1: one row
    (precision, recall, f1, n_correct, n_pred, n_target).

    ``recall_only`` is the FewRel evaluation mode (reference
    configs/evaluation/results_full.yaml:76-80): FewRel annotates exactly
    one gold triple per sample, so extra predicted facts cannot be judged
    — precision and F1 are suppressed and only (recall, n_correct,
    n_target) is reported."""
    agg = _counts(df, pred, target).agg(
        F.sum("n_correct").alias("n_correct"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_target").alias("n_target"),
    )
    p, r, f1 = _prf(F.col("n_correct"), F.col("n_pred"), F.col("n_target"))
    if recall_only:
        return agg.select(r.alias("recall"), "n_correct", "n_target")
    return agg.select(
        p.alias("precision"), r.alias("recall"), f1.alias("f1"),
        "n_correct", "n_pred", "n_target",
    )


def _per_relation_counts(
    df: DataFrame, pred: str = "pred", target: str = "target"
) -> DataFrame:
    """Per-relation micro counts: restrict both sets to each relation that
    appears in either side of a sample, then count (reference
    MacroMetricsEvaluator, evaluators.py:65-147).

    Shape: per row, emit one (rel, is_correct, is_pred, is_target)
    contribution per triple occurrence — the row-local intersect does the
    set logic, then a SINGLE explode + groupBy(rel) aggregates. Map-side
    partial agg means the shuffle carries |distinct rels| × partitions
    counter rows, independent of data size. (An earlier form re-filtered
    both arrays per candidate relation — O(rels × |arrays|) interpreted
    HOF work per row, ~15× slower at sf0.1.) The intersect runs on flat
    string keys (fast path, see _counts). All THREE contributions derive
    rel from the struct field itself — the intersection is the pred
    structs whose key appears in the target keys, so a rel recovered by
    re-splitting the joined key (which disagrees with x['r'] when a field
    contains the separator or is NULL) can never split one relation's
    counts across groups."""
    p = F.array_distinct(F.col(pred))
    t = F.array_distinct(F.col(target))
    t_keys = triple_key_col(t)
    one_key = lambda x: F.element_at(triple_key_col(F.array(x)), 1)
    both = F.filter(p, lambda x: F.array_contains(t_keys, one_key(x)))

    def tagged(rel_col):
        def make(c, np_, nt):
            return F.struct(
                rel_col.alias("rel"),
                F.lit(c).alias("c"),
                F.lit(np_).alias("np"),
                F.lit(nt).alias("nt"),
            )
        return make

    # the intersect + triple-key HOFs below are interpreted and
    # compute-bound; spread the (byte-light, AQE-coalesced) eval frame to
    # the core count so the per-row set logic parallelizes
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    contrib = df.select(
        F.explode(
            F.concat(
                F.transform(both, lambda x: tagged(x["r"])(1, 0, 0)),
                F.transform(p, lambda x: tagged(x["r"])(0, 1, 0)),
                F.transform(t, lambda x: tagged(x["r"])(0, 0, 1)),
            )
        ).alias("e")
    )
    return contrib.groupBy(F.col("e.rel").alias("rel")).agg(
        F.sum("e.c").alias("n_correct"),
        F.sum("e.np").alias("n_pred"),
        F.sum("e.nt").alias("n_target"),
    )


def macro_metrics(
    df: DataFrame,
    pred: str = "pred",
    target: str = "target",
    recall_only: bool = False,
    target_relations_only: bool = False,
) -> DataFrame:
    """A2 — per-relation micro scores + unweighted macro mean
    (evaluation.py:67-78). Returns one row: (macro_precision,
    macro_recall, macro_f1, n_relations); with ``recall_only`` (FewRel
    mode, results_full.yaml:76-80) just (macro_recall, n_relations).

    ``target_relations_only`` selects the reference's averaging set —
    MacroMetricsEvaluator restricts to relations with ≥1 TARGET
    occurrence (evaluators.py:84-87: all_relations = unq_target_rels), so
    a hallucinated pred-only relation does not add a zero-F1 group to the
    mean. The default (False) averages over relations appearing on either
    side — stricter, and the semantics the round-1 oracles pinned."""
    per_rel = _per_relation_counts(df, pred, target)
    if target_relations_only:
        per_rel = per_rel.filter(F.col("n_target") > 0)
    p, r, f1 = _prf(F.col("n_correct"), F.col("n_pred"), F.col("n_target"))
    scored = per_rel.select(
        "rel", p.alias("precision"), r.alias("recall"), f1.alias("f1")
    )
    if recall_only:
        return scored.agg(
            F.avg("recall").alias("macro_recall"),
            F.count("*").alias("n_relations"),
        )
    return scored.agg(
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
        F.count("*").alias("n_relations"),
    )


def per_relation_metrics(
    df: DataFrame, pred: str = "pred", target: str = "target"
) -> DataFrame:
    """Per-relation micro P/R/F1 table (the rows A2 averages)."""
    per_rel = _per_relation_counts(df, pred, target)
    p, r, f1 = _prf(F.col("n_correct"), F.col("n_pred"), F.col("n_target"))
    return per_rel.select(
        "rel", p.alias("precision"), r.alias("recall"), f1.alias("f1"),
        "n_correct", "n_pred", "n_target",
    )


def bucket_metrics(
    df: DataFrame,
    train_rel_counts: DataFrame,
    pred: str = "pred",
    target: str = "target",
) -> DataFrame:
    """A3 — micro metrics per log2-bucket of each relation's train-set
    occurrence count (reference BucketEvaluator, evaluators.py:153-203;
    bucket id = floor(log2(count)), plot_helpers.py:50-56). Relations
    absent from training fall in bucket -1.

    ``train_rel_counts``: DataFrame(rel, count) — typically
    ``train.select(explode(...)).groupBy(rel).count()`` (A6).
    """
    per_rel = _per_relation_counts(df, pred, target)
    buckets = train_rel_counts.select(
        F.col("rel"),
        F.floor(F.log2(F.col("count"))).cast("long").alias("bucket"),
    )
    joined = per_rel.join(F.broadcast(buckets), "rel", "left").fillna(
        {"bucket": -1}
    )
    agg = joined.groupBy("bucket").agg(
        F.sum("n_correct").alias("n_correct"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_target").alias("n_target"),
        F.count("*").alias("n_relations"),
    )
    p, r, f1 = _prf(F.col("n_correct"), F.col("n_pred"), F.col("n_target"))
    return agg.select(
        "bucket", p.alias("precision"), r.alias("recall"), f1.alias("f1"),
        "n_relations", "n_correct", "n_pred", "n_target",
    )


def zero_shot_metrics(
    df: DataFrame,
    rel_groups: DataFrame,
    pred: str = "pred",
    target: str = "target",
) -> DataFrame:
    """A4 — micro metrics per relation group (reference
    MicroMetricsZSEvaluator, evaluators.py:206-263: groups like
    dropped / ignored / seen). ``rel_groups``: DataFrame(rel, group);
    relations missing from the mapping score under group 'seen'."""
    per_rel = _per_relation_counts(df, pred, target)
    joined = per_rel.join(F.broadcast(rel_groups), "rel", "left").fillna(
        {"group": "seen"}
    )
    agg = joined.groupBy("group").agg(
        F.sum("n_correct").alias("n_correct"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_target").alias("n_target"),
    )
    p, r, f1 = _prf(F.col("n_correct"), F.col("n_pred"), F.col("n_target"))
    return agg.select(
        "group", p.alias("precision"), r.alias("recall"), f1.alias("f1"),
        "n_correct", "n_pred", "n_target",
    )


import math as _math

# Poisson(1) inverse-CDF thresholds for the one-pass bootstrap (k ≤ 4
# covers 99.6% of mass; the tail clamps to 5). Module-level so the DuckDB
# oracle SQL can inline the exact same literals.
POISSON1_CDF = []
_acc = 0.0
for _k in range(5):
    _acc += _math.exp(-1.0) / _math.factorial(_k)
    POISSON1_CDF.append(_acc)


def bootstrap_micro(
    df: DataFrame,
    n_runs: int = 50,
    id_col: str = "id",
    pred: str = "pred",
    target: str = "target",
    hash_mode: str = "xxhash",
) -> DataFrame:
    """A5 — bootstrap CI over samples (reference get_bootstrap_score,
    evaluation.py:12-26, 50 resamples). One-pass deterministic
    poissonization: each (sample, run) gets weight ~ Poisson(1) derived
    from a hash of (id, run) — no Python RNG, no repeated scans, identical
    across parallelism levels. Returns (metric, mean, std).

    hash_mode='xxhash' is the production path (JVM intrinsic);
    'md5' derives the uniform from the DuckDB-reproducible h60 so the
    whole query is oracle-checkable."""
    counts = _counts(df, pred, target).select(id_col, "n_correct", "n_pred", "n_target")
    # row-local run fan-out (explode of a literal sequence) — no crossJoin
    # stage, the partial agg under groupBy(run) still bounds the shuffle at
    # n_runs × partitions counter rows. The fan-out stage is compute-bound
    # (n_runs hashes per sample), so spread it to the core count first:
    # AQE coalesces the byte-light upstream join output to a few
    # partitions and would run the n×n_runs hashing nearly single-task.
    counts = counts.repartition(df.sparkSession.sparkContext.defaultParallelism)
    runs = counts.withColumn(
        "run", F.explode(F.sequence(F.lit(0), F.lit(n_runs - 1)))
    )
    if hash_mode == "md5":
        from .datapipe.hashes import h60_salted

        h = h60_salted(F.col(id_col).cast("string"), F.col("run"))
    else:
        h = F.xxhash64(F.col(id_col), F.col("run"))
    u = F.pmod(h, F.lit(1_000_000)) / 1_000_000.0
    cdf = POISSON1_CDF
    w = F.when(u < cdf[0], 0)
    for k in range(1, 5):
        w = w.when(u < cdf[k], k)
    w = w.otherwise(5)
    per_run = runs.withColumn("w", w).groupBy("run").agg(
        F.sum(F.col("n_correct") * F.col("w")).alias("c"),
        F.sum(F.col("n_pred") * F.col("w")).alias("p"),
        F.sum(F.col("n_target") * F.col("w")).alias("t"),
    )
    p, r, f1 = _prf(F.col("c"), F.col("p"), F.col("t"))
    scored = per_run.select(p.alias("precision"), r.alias("recall"), f1.alias("f1"))
    # single aggregation over the n_runs rows, then unpivot — an earlier
    # form unioned three separate agg plans, recomputing the whole
    # upstream (fan-out + groupBy) once per metric
    stats = scored.agg(
        F.avg("precision").alias("ap"), F.stddev_pop("precision").alias("sp"),
        F.avg("recall").alias("ar"), F.stddev_pop("recall").alias("sr"),
        F.avg("f1").alias("af"), F.stddev_pop("f1").alias("sf"),
    )
    return stats.select(
        F.expr(
            "stack(3, 'precision', ap, sp, 'recall', ar, sr, 'f1', af, sf)"
            " as (metric, mean, std)"
        )
    )


def _distributed_rank(df: DataFrame, id_col, out_col: str = "j"):
    """Global 0-based rank by ``id_col`` with NO single-partition sort and
    no driver-side action: range-repartition by id (disjoint, ordered key
    ranges across partitions), rank locally within each range, then add
    per-partition offsets via a broadcast join over the tiny
    partition-size table. The final rank equals the global sorted rank
    regardless of where the (sampled) range boundaries fall, so the result
    is parallelism-invariant for unique ids. Returns (ranked_df,
    total_df) where total_df is a broadcastable 1-row (_n bigint) frame
    derived from the same tiny partition-size table (no second scan of
    the input subtree). ``id_col`` may be a single column name or a list
    (composite ordering key — must be unique per row for a well-defined
    rank)."""
    from pyspark.sql import Window

    cols = [id_col] if isinstance(id_col, str) else list(id_col)
    parts = df.repartitionByRange(*[F.col(c) for c in cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    parts = parts.withColumn(
        "_local", F.row_number().over(Window.partitionBy("_pid").orderBy(*cols))
    )
    sizes = parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # prefix-sum over ≤ shuffle-partitions rows: a broadcast non-equi
    # self-join instead of a global-orderBy window, so the plan carries no
    # SinglePartition exchange anywhere
    offs = (
        sizes.alias("a")
        .join(F.broadcast(sizes.alias("b")), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    ranked = (
        parts.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_local") - 1).cast("long"))
        .drop("_pid", "_local", "_off")
    )
    total = sizes.agg(F.sum("_cnt").cast("long").alias("_n"))
    return ranked, total


def bootstrap_micro_multinomial(
    df: DataFrame,
    n_runs: int = 50,
    id_col: str = "id",
    pred: str = "pred",
    target: str = "target",
    hash_mode: str = "md5",
) -> DataFrame:
    """A5 exact mode — the reference's estimator
    (get_bootstrap_score, evaluation.py:12-26): each run resamples exactly
    n datapoints WITH replacement (`random.choices(range(n), k=n)` ⇒ a
    multinomial weight vector summing to n), scores micro P/R/F1 per run,
    and reports mean + SAMPLE std (torch.Tensor.std is Bessel-corrected).
    The Poisson path (:func:`bootstrap_micro`) approximates the weights
    independently per sample; this one preserves the exact per-run total.

    Deterministic seeding without a Python RNG: draw j of run r picks
    sample index affine_mix(h60(j), r) mod n — one md5 per SAMPLE plus
    cheap per-run arithmetic (not one md5 per draw), parallelism-invariant
    and DuckDB-reproducible, replacing the reference's seeded Mersenne
    Twister. Sample indexing is the fully distributed
    :func:`_distributed_rank` (range partition + local rank + broadcast
    offsets — no global sort, no driver action), and n reaches the modulo
    as a broadcast 1-row scalar, so the whole query is one Spark plan that
    scales past eval-table inputs."""
    counts = _counts(df, pred, target).select(
        id_col, "n_correct", "n_pred", "n_target"
    )
    # NOTE: the plan references this frame several times (rank, partition
    # sizes, total, broadcast join side). .persist() was tried and
    # measured SLOWER end-to-end (10.4s vs 6.3s min-of-N at sf0.1):
    # AQE's runtime exchange reuse already deduplicates the heavy
    # subtrees, so the cache only added build + memory-store overhead.
    indexed, total = _distributed_rank(counts, id_col)
    # the draw fan-out below is compute-bound (one md5 per sample + the
    # affine remix per draw, then an n×n_runs-row partial agg); spread it
    # to the core count — AQE coalesces the byte-light rank output to a
    # few partitions otherwise. 8-byte rows, so the shuffle is a sliver.
    src = indexed.select("j").repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    if hash_mode == "md5":
        from .datapipe.hashes import affine_mix, h60

        # base hash BEFORE the run fan-out: one md5 per sample, then only
        # the cheap salt-keyed remix per (sample, run) draw
        src = src.withColumn("_h", h60(F.col("j").cast("string")))
        h = affine_mix(F.col("_h"), F.col("run"))
    else:
        h = F.xxhash64(F.col("j"), F.col("run"))
    draws = src.withColumn(
        "run", F.explode(F.sequence(F.lit(0), F.lit(n_runs - 1)))
    ).crossJoin(F.broadcast(total))
    picks = draws.select("run", F.pmod(h, F.col("_n")).alias("pick"))
    w = picks.groupBy("run", "pick").agg(F.count("*").alias("wt"))
    # counts is eval-table-sized (one row per sample) — broadcast it so
    # the n_runs × n draw-weight side never shuffles for the join
    weighted = w.join(F.broadcast(indexed), w["pick"] == indexed["j"])
    per_run = weighted.groupBy("run").agg(
        F.sum(F.col("n_correct") * F.col("wt")).alias("c"),
        F.sum(F.col("n_pred") * F.col("wt")).alias("p"),
        F.sum(F.col("n_target") * F.col("wt")).alias("t"),
    )
    p, r, f1 = _prf(F.col("c"), F.col("p"), F.col("t"))
    scored = per_run.select(p.alias("precision"), r.alias("recall"), f1.alias("f1"))
    stats = scored.agg(
        F.avg("precision").alias("ap"), F.stddev_samp("precision").alias("sp"),
        F.avg("recall").alias("ar"), F.stddev_samp("recall").alias("sr"),
        F.avg("f1").alias("af"), F.stddev_samp("f1").alias("sf"),
    )
    return stats.select(
        F.expr(
            "stack(3, 'precision', ap, sp, 'recall', ar, sr, 'f1', af, sf)"
            " as (metric, mean, std)"
        )
    )


def relation_occurrences(
    df: DataFrame, triples_col: str = "target"
) -> DataFrame:
    """A6 — relation occurrence counts (reference
    KiltDataset.get_rel_occurrence_stats, datasets.py:78-90)."""
    return (
        df.select(F.explode(F.col(triples_col)).alias("t"))
        .select(F.col("t.r").alias("rel"))
        .groupBy("rel")
        .count()
    )


def relation_coverage(
    df: DataFrame, pred: str = "pred", target: str = "target"
) -> DataFrame:
    """A8 — distinct target relations never predicted (reference
    evaluators.py:31-37): left-anti join of distinct sets."""
    trg = df.select(F.explode(F.col(target)).alias("t")).select(
        F.col("t.r").alias("rel")
    ).distinct()
    prd = df.select(F.explode(F.col(pred)).alias("t")).select(
        F.col("t.r").alias("rel")
    ).distinct()
    return trg.join(prd, "rel", "left_anti")


def calibration_bins(
    samples: DataFrame,
    conf_col: str = "conf_ppm",
    acc_col: str = "acc_ppm",
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram binning — the per-bin ingredients of Expected
    Calibration Error (Naeini et al. 2015; Guo et al. 2017): samples
    carry an integer-ppm confidence and an integer-ppm accuracy; each
    falls into one of ``bins`` equal-width confidence bins, and the bin
    reports its size, mean confidence, mean accuracy, and |gap| — all in
    floor-integer ppm so the DuckDB oracle is bit-exact. The scalar ECE
    is sum(n_samples * gap_ppm) / sum(n_samples) over the output.

    Scale shape: one partial-aggregatable groupBy on a row-local bin id
    — the shuffle carries ``bins`` counter rows per task, nothing else.
    """
    if bins < 1 or 1_000_000 % bins:
        raise ValueError(f"bins must divide 1000000, got {bins}")
    width = 1_000_000 // bins
    b = F.expr(f"least({bins - 1}L, {conf_col} div {width}L)")
    return (
        samples.select(
            b.cast("long").alias("bin"),
            F.col(conf_col).cast("long").alias("_c"),
            F.col(acc_col).cast("long").alias("_a"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.expr("sum(_c) div count(1)").cast("long").alias("mean_conf_ppm"),
            F.expr("sum(_a) div count(1)").cast("long").alias("mean_acc_ppm"),
            F.abs(
                F.expr("sum(_c) div count(1)") - F.expr("sum(_a) div count(1)")
            ).cast("long").alias("gap_ppm"),
        )
    )


def auc_by_group(
    samples: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Tie-corrected ROC-AUC per group, integer-exact: the Mann-Whitney
    rank-sum formulation over the (group, score) census. With midranks
    doubled to stay integral, 2*midrank(s) = 2*cum_before(s) + c(s) + 1
    and AUC = (2*sum_pos(midrank) - n_pos*(n_pos+1)) / (2*n_pos*n_neg);
    reported as floor ppm so the DuckDB oracle is bit-exact. Scores must
    be integral (floor/scale floats first — the repo-wide determinism
    discipline).

    Scale shape: ONE partial-aggregated groupBy folds the fact table to
    the (group, score) census; the ranking window runs over that census
    (bounded by |groups| x |score domain|), never the raw rows — the
    same census-window shape as the drift/anomaly monitors. Signed-64
    bounds: n_pos*n_neg < 2^62/2e6 ~ 2.3e12 per group for the ppm step
    (sample or pre-aggregate groups beyond ~1.5e6^2 pairs)."""
    from pyspark.sql import Window

    cen = (
        samples.select(
            F.col(group_col).alias("grp"),
            F.col(score_col).cast("long").alias("score"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("grp", "score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_c"),
            F.sum("_y").cast("long").alias("_p"),
        )
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cen = cen.withColumn("_cum", F.coalesce(F.sum("_c").over(w), F.lit(0)))
    agg = cen.groupBy("grp").agg(
        F.sum(F.col("_p") * (2 * F.col("_cum") + F.col("_c") + 1))
        .cast("long")
        .alias("_r2"),
        F.sum("_p").cast("long").alias("n_pos"),
        F.sum(F.col("_c") - F.col("_p")).cast("long").alias("n_neg"),
    )
    return agg.select(
        "grp",
        "n_pos",
        "n_neg",
        F.expr(
            "(_r2 - n_pos * (n_pos + 1)) * 1000000L"
            " div (2L * n_pos * n_neg)"
        ).cast("long").alias("auc_ppm"),
    )


# --- multiclass classifier evaluation ---------------------------------------

def confusion_matrix(
    df: DataFrame, true_col: str, pred_col: str
) -> DataFrame:
    """Multiclass confusion census ``(true, pred, n)`` — ONE partial-agg
    groupBy bounded by the class-domain square, never the row count."""
    return df.groupBy(
        F.col(true_col).alias("true_cls"), F.col(pred_col).alias("pred_cls")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def classification_report(
    df: DataFrame, true_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision/recall/F1 in integer ppm, keyed on the TRUE
    class domain: (cls, n_true, n_pred, tp, precision_ppm, recall_ppm,
    f1_ppm). F1 folds exactly to ``2·tp / (n_true + n_pred)`` so it
    stays a single integer division — no float harmonic mean. All
    inputs come from the confusion census, so every join here is
    class-domain-sized (broadcast) regardless of corpus size."""
    cm = confusion_matrix(df, true_col, pred_col)
    tt = cm.groupBy(F.col("true_cls").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    pp = cm.groupBy(F.col("pred_cls").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    tp = cm.filter(F.col("true_cls") == F.col("pred_cls")).select(
        F.col("true_cls").alias("cls"), F.col("n").alias("tp")
    )
    z = F.lit(0).cast("long")
    return (
        tt.join(F.broadcast(pp), "cls", "left")
        .join(F.broadcast(tp), "cls", "left")
        .select(
            "cls",
            "n_true",
            F.coalesce("n_pred", z).alias("n_pred"),
            F.coalesce("tp", z).alias("tp"),
        )
        .select(
            "cls",
            "n_true",
            "n_pred",
            "tp",
            F.expr(
                "CASE WHEN n_pred = 0 THEN 0L"
                " ELSE (tp * 1000000L) div n_pred END"
            ).alias("precision_ppm"),
            F.expr("(tp * 1000000L) div n_true").alias("recall_ppm"),
            F.expr(
                "(2L * tp * 1000000L) div (n_true + n_pred)"
            ).alias("f1_ppm"),
        )
    )


def cohen_kappa(df: DataFrame, true_col: str, pred_col: str) -> DataFrame:
    """Cohen's kappa (inter-annotator / classifier-vs-gold chance-
    corrected agreement) as ONE row: (n, agree, po_ppm, pe_ppm,
    kappa_ppm). Integer-exact via the cleared form
    ``kappa = (agree·N − Σ t_k·p_k) / (N² − Σ t_k·p_k)``; the ppm
    scaling divides the DENOMINATOR by 1e6 first (identical formula in
    the DuckDB twin) so no intermediate exceeds N² — signed-64-safe to
    N ≈ 3e9 rows. Everything derives from the class-domain-sized
    confusion census."""
    cm = confusion_matrix(df, true_col, pred_col)
    tt = cm.groupBy(F.col("true_cls").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    pp = cm.groupBy(F.col("pred_cls").alias("cls")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    s = (
        tt.join(pp, "cls", "full_outer")
        .select(
            (
                F.coalesce("n_true", F.lit(0).cast("long"))
                * F.coalesce("n_pred", F.lit(0).cast("long"))
            ).alias("txp")
        )
        .agg(F.sum("txp").cast("long").alias("s"))
    )
    tot = cm.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(
            F.when(F.col("true_cls") == F.col("pred_cls"), F.col("n"))
            .otherwise(F.lit(0))
        ).cast("long").alias("agree"),
    )
    return tot.crossJoin(F.broadcast(s)).select(
        "n",
        "agree",
        F.expr("(agree * 1000000L) div n").alias("po_ppm"),
        F.expr("s div greatest((n * n) div 1000000L, 1L)").alias("pe_ppm"),
        F.expr(
            "(agree * n - s) div greatest((n * n - s) div 1000000L, 1L)"
        ).alias("kappa_ppm"),
    )
