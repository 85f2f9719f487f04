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


def k_anonymity(df: DataFrame, qi_cols: list, k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set: how many
    equivalence classes (distinct QI combinations) have fewer than ``k``
    members, and how many rows sit in them (re-identification risk).
    Returns ONE row: (n_rows, n_groups, n_small_groups, n_rows_at_risk,
    min_group_size, risk_ppm).

    Scale shape: one partial-aggregated groupBy to the QI census
    (bounded by the QI domain product, not the row count), then one
    tiny aggregate — the fact table is scanned once and shuffles only
    its QI census."""
    if k <= 0:
        raise ValueError("k must be > 0")
    g = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).cast("long").alias("_n"))
    out = g.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
        .cast("long")
        .alias("n_small_groups"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("_n").cast("long").alias("min_group_size"),
    )
    return out.withColumn(
        "risk_ppm", F.expr("n_rows_at_risk * 1000000L div n_rows")
    )


def fk_orphans(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity audit for one FK edge: ONE row
    (relation, n_child, n_orphans, orphan_ppm) where an orphan is a
    child row whose FK value has no parent row (NULL FKs count as
    orphans — they too cannot join).

    Scale shape: parent keys DISTINCT then broadcast (dimension-sized);
    the child table is scanned once with a broadcast left join + one
    conditional count — no child-side shuffle. For fact-sized parents
    drop the explicit broadcast and let AQE pick the join."""
    keys = (
        parent.select(F.col(pk_col).alias("_k"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    j = child.select(F.col(fk_col).alias("_k")).join(
        F.broadcast(keys), "_k", "left"
    )
    out = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_child"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphans"),
    )
    return out.select(
        F.lit(relation).alias("relation"),
        "n_child",
        "n_orphans",
        F.expr("n_orphans * 1000000L div n_child").alias("orphan_ppm"),
    )


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


def _disc_median(df: DataFrame, grp: str, vcol: str, out: str) -> DataFrame:
    """Exact per-group discrete median (percentile_disc(0.5): smallest
    value whose cumulative count reaches half, even n → lower middle —
    the deterministic integer rule shared with the SQL twin). The
    ordering window runs over the (group, value) CENSUS, bounded by the
    per-group value domain, never the raw row count — the same
    skew-safety discipline as metrics.auc_by_group."""
    from pyspark.sql import Window

    cen = df.groupBy(grp, vcol).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    tot = cen.groupBy(grp).agg(F.sum("__c").cast("long").alias("__n"))
    w = Window.partitionBy(grp).orderBy(vcol)
    cum = cen.withColumn("__cum", F.sum("__c").over(w))
    return (
        cum.join(tot, grp)
        .filter(2 * F.col("__cum") >= F.col("__n"))
        .groupBy(grp)
        .agg(F.min(vcol).cast("long").alias(out))
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Robust per-group outlier detection via the median absolute
    deviation: flag rows with ``|x − median| > k·max(MAD, 1)`` —
    breakdown-point-0.5 robust where the z-score test is wrecked by the
    very outliers it hunts. Returns (group, id, value, med, mad) for
    flagged rows, all integer-exact.

    Scale shape: two census medians (value census, then absolute-
    deviation census — windows bounded by the value DOMAIN per group);
    the group-sized med/mad tables broadcast back onto the fact scan;
    the flag itself is a row-local integer predicate."""
    v = F.col(value_col).cast("long")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        v.alias("value"),
    )
    med = _disc_median(base, "grp", "value", "med")
    dev = base.join(F.broadcast(med), "grp").withColumn(
        "ad", F.abs(F.col("value") - F.col("med")).cast("long")
    )
    mad = _disc_median(dev.select("grp", "ad"), "grp", "ad", "mad")
    return (
        dev.join(F.broadcast(mad), "grp")
        .filter(
            F.col("ad") > int(k) * F.greatest(F.col("mad"), F.lit(1).cast("long"))
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("id").alias(id_col),
            "value",
            "med",
            "mad",
        )
    )


def rank_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group percent-rank normalization (the quantile-feature
    transform): each row's value maps to the fraction of its group
    strictly below it, integer ppm — (group, id, value, pct_ppm) with
    ``pct_ppm = strictly_below · 1e6 div max(n − 1, 1)`` (ties share a
    rank; min 0, max 1e6).

    Scale shape: the ranking window runs over the (group, value)
    CENSUS — bounded by the per-group value domain, never row counts —
    and the census joins back onto the fact scan on (group, value) with
    the group totals broadcast; the raw rows are never sorted."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        v.alias("value"),
    )
    cen = base.groupBy("grp", "value").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    w = Window.partitionBy("grp").orderBy("value")
    cen = cen.withColumn(
        "__below", F.sum("__c").over(w) - F.col("__c")
    )
    tot = cen.groupBy("grp").agg(F.sum("__c").cast("long").alias("__n"))
    return (
        base.join(cen.select("grp", "value", "__below"), ["grp", "value"])
        .join(F.broadcast(tot), "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("id").alias(id_col),
            "value",
            F.expr(
                "(__below * 1000000L) div greatest(__n - 1L, 1L)"
            ).alias("pct_ppm"),
        )
    )


def _disc_percentile(
    df: DataFrame, grp: str, vcol: str, p_pct: int, out: str
) -> DataFrame:
    """Exact per-group discrete percentile (percentile_disc(p):
    smallest value whose cumulative count reaches p% — the integer rule
    ``100·cum >= p·n`` shared with the SQL twin). Census-windowed like
    :func:`_disc_median` (which is the p=50 special case)."""
    from pyspark.sql import Window

    cen = df.groupBy(grp, vcol).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    tot = cen.groupBy(grp).agg(F.sum("__c").cast("long").alias("__n"))
    w = Window.partitionBy(grp).orderBy(vcol)
    cum = cen.withColumn("__cum", F.sum("__c").over(w))
    return (
        cum.join(tot, grp)
        .filter(100 * F.col("__cum") >= int(p_pct) * F.col("__n"))
        .groupBy(grp)
        .agg(F.min(vcol).cast("long").alias(out))
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: int = 10,
    hi_pct: int = 90,
) -> DataFrame:
    """Per-group winsorized summary: exact census p_lo/p_hi cut values
    and the mean after clipping every value into [p_lo, p_hi] — the
    robust location estimate that tolerates heavy crawl-data tails
    without discarding rows. Returns (group, n, p_lo, p_hi, wins_mean),
    integer-exact (mean = integer div).

    Scale shape: two census disc-percentiles (domain-bounded windows),
    broadcast cut values back onto the scan, one row-local clip + one
    partial-agg sum — the raw rows never sort."""
    v = F.col(value_col).cast("long")
    base = df.select(F.col(group_col).alias("grp"), v.alias("value"))
    lo = _disc_percentile(base, "grp", "value", lo_pct, "p_lo")
    hi = _disc_percentile(base, "grp", "value", hi_pct, "p_hi")
    cuts = lo.join(hi, "grp")
    return (
        base.join(F.broadcast(cuts), "grp")
        .select(
            "grp",
            "p_lo",
            "p_hi",
            F.least(F.greatest(F.col("value"), F.col("p_lo")),
                    F.col("p_hi")).alias("cv"),
        )
        .groupBy("grp", "p_lo", "p_hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cv").cast("long").alias("__s"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "p_lo",
            "p_hi",
            F.expr("__s div n").alias("wins_mean"),
        )
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col,
    smoothing: int = 10,
) -> DataFrame:
    """Smoothed target encoding of a categorical column (the classic
    high-cardinality-feature trick): per category,
    ``enc = (Σy + m·prior) / (n + m)`` with the global rate as prior —
    integer-exact in ppm via ``(Σy·1e6 + m·prior_ppm) div (n + m)``.
    Returns (category, n, sum_y, prior_ppm, enc_ppm).

    Scale shape: one partial-agg groupBy to the category census plus
    one broadcast global rate — never a second pass over the rows; the
    smoothing keeps rare categories from memorizing their few labels
    (the leakage-control knob)."""
    y = target_col if not isinstance(target_col, str) else F.col(target_col)
    base = df.select(F.col(cat_col).alias("cat"), y.cast("long").alias("y"))
    cen = base.groupBy("cat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    g = base.agg(
        F.expr("(sum(y) * 1000000L) div count(1)").alias("prior_ppm")
    )
    m = int(smoothing)
    return cen.crossJoin(F.broadcast(g)).select(
        F.col("cat").alias(cat_col),
        "n",
        "sum_y",
        "prior_ppm",
        F.expr(
            f"(sum_y * 1000000L + {m}L * prior_ppm) div (n + {m}L)"
        ).alias("enc_ppm"),
    )


def ks_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between two slices
    of a metric, integer-exact: D = max over the merged value census of
    |cdf_a − cdf_b|, reported as (n_a, n_b, d_ppm, at_value) where
    ``at_value`` is the smallest value attaining the max (deterministic
    argmax). The cleared form compares ``|cum_a·n_b − cum_b·n_a|``, so
    no float cdf enters either engine; the ppm scale divides the
    denominator first (signed-64-safe at ~3e9×3e9 rows).

    Scale shape: per-side counts collapse to ONE merged (value, c_a,
    c_b) census (partial-agg); the cumulative window runs over the
    census, bounded by the value DOMAIN; the final argmax is a 1-row
    aggregate. The raw rows never sort."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    ca = a.select(v.alias("value")).groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("c_a")
    )
    cb = b.select(v.alias("value")).groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("c_b")
    )
    z = F.lit(0).cast("long")
    cen = ca.join(cb, "value", "full_outer").select(
        "value",
        F.coalesce("c_a", z).alias("c_a"),
        F.coalesce("c_b", z).alias("c_b"),
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cen.select(
        "value",
        F.sum("c_a").over(w).alias("cum_a"),
        F.sum("c_b").over(w).alias("cum_b"),
    )
    tot = cen.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "value", "n_a", "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("diff"),
    )
    mx = d.agg(F.max("diff").alias("max_diff"))
    return (
        d.join(F.broadcast(mx), F.col("diff") == F.col("max_diff"))
        .groupBy("n_a", "n_b", "max_diff")
        .agg(F.min("value").alias("at_value"))
        .select(
            "n_a",
            "n_b",
            F.expr(
                "max_diff div greatest((n_a * n_b) div 1000000L, 1L)"
            ).alias("d_ppm"),
            "at_value",
        )
    )


def label_balance(
    df: DataFrame,
    group_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group label-balance audit via the Simpson diversity index
    (1 − Σ share², the collision probability complement — the
    entropy-free diversity number, integer-exact): (group, n, n_labels,
    top_share_ppm, simpson_ppm). ``Σ share²`` is computed as
    ``Σ c_i² · 1e6 div n²`` with the denominator shift shared with the
    twin. One (group, label) census + one group aggregate — both
    domain-bounded partial aggregations."""
    cen = df.groupBy(
        F.col(group_col).alias("grp"), F.col(label_col).alias("lbl")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return (
        cen.groupBy("grp")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_labels"),
            F.max("c").cast("long").alias("top_c"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "n_labels",
            F.expr("(top_c * 1000000L) div n").alias("top_share_ppm"),
            F.expr(
                "1000000L - ss div greatest((n * n) div 1000000L, 1L)"
            ).alias("simpson_ppm"),
        )
    )


def fd_violations(
    df: DataFrame,
    determinant: str,
    dependent: str,
    fd_name: str,
) -> DataFrame:
    """Functional-dependency discovery audit (the data-profiling
    primitive behind key detection and normalization advice): does
    ``determinant → dependent`` hold? One row:
    (fd, n_groups, n_violating, violation_ppm) where a violating group
    is a determinant value mapped to more than one distinct dependent
    value. ONE partial-agg groupBy bounded by the determinant domain +
    a 1-row aggregate — never a self-join."""
    g = df.groupBy(F.col(determinant).alias("d")).agg(
        F.count_distinct(F.col(dependent)).cast("long").alias("nd")
    )
    return g.agg(
        F.lit(fd_name).alias("fd"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_violating"),
    ).select(
        "fd",
        "n_groups",
        "n_violating",
        F.expr("(n_violating * 1000000L) div n_groups").alias(
            "violation_ppm"
        ),
    )
